"""Corpus curation operators for training-data pipelines (SURVEY.md §2.D).

Two standard curation passes large-scale LLM data prep runs after dedup:

- **Benchmark decontamination** (``text_decontaminate``): flag corpus
  documents sharing any word n-gram with a held-out benchmark set, the
  overlap check used to keep eval sets out of training data. The benchmark
  side here is a stand-in slice of the corpus (doc_id < ``BENCH_DOCS``);
  production swaps in the real eval suite. n-gram generation is pure
  higher-order array ops (no UDF): tokenize → ``sequence``/``slice``
  windows → ``explode``; the benchmark gram set is DISTINCT'd and
  broadcast, so the corpus side is one map pass + one semi-ish join with
  no corpus shuffle. N=4 is calibrated to the synthetic corpus's tiny
  vocabulary; real pipelines use 8-13 (one constant).
- **Domain capping** (``cap_per_source``): keep at most ``CAP_PER_SOURCE``
  documents per source/domain, preferring the longest — the per-domain
  quota that stops any single crawl domain from dominating a mixture.
  Window rank + filter compiles to Spark's two-phase ``WindowGroupLimit``,
  so each map task keeps only its local top-K per domain before the
  shuffle: shuffle volume is bounded by K·|domains| at any corpus size.

Both are exact relational plans, so both are DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table, rebalance_for_fanout

#: word n-gram width for overlap detection (real pipelines: 8-13).
NGRAM = 4
#: doc_id < BENCH_DOCS plays the held-out benchmark set.
BENCH_DOCS = 10
#: max documents retained per source/domain.
CAP_PER_SOURCE = 20

_DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS words
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(words) - {NGRAM - 1}, 0)),
                i -> array_to_string(words[i:i+{NGRAM - 1}], ' '))) AS gram
  FROM toks
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id < {BENCH_DOCS}
)
SELECT c.doc_id, COUNT(DISTINCT c.gram) AS n_hits
FROM grams c JOIN bench b USING (gram)
WHERE c.doc_id >= {BENCH_DOCS}
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


@query("text_decontaminate", _DECON_ORACLE, tag="llm-text")
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark n-gram decontamination: corpus documents that share at
    least one word {NGRAM}-gram with the benchmark slice, with the count of
    distinct overlapping grams. The benchmark gram set DISTINCTs down to a
    broadcastable dictionary; corpus grams stream past it map-side, and the
    only corpus-sized shuffle is the final per-doc count."""
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", r"\s+"), lambda w: w != "")

    def grams(df: DataFrame) -> DataFrame:
        # sequence(1, 0) would generate a DESCENDING [1,0] — guard short docs
        idx = F.when(
            F.size("words") >= NGRAM,
            F.sequence(F.lit(1), F.size("words") - (NGRAM - 1)),
        ).otherwise(F.array().cast("array<int>"))
        gram_arr = F.transform(
            idx, lambda i: F.array_join(F.slice("words", i, NGRAM), " ")
        )
        return df.select("doc_id", F.explode(gram_arr).alias("gram"))

    toks = d.select("doc_id", words.alias("words"))
    bench = (
        grams(toks.where(F.col("doc_id") < BENCH_DOCS)).select("gram").distinct()
    )
    # rebalance BEFORE the gram fan-out (the dedup._normalized move): the
    # corpus arrives in however few splits the input file has — a compact
    # single-row-group file means the whole gram build + broadcast probe,
    # the dominant stage, runs on one core. Conditional: when the scan
    # already has session-width splits (any real corpus) no round-robin
    # exchange of the token arrays enters the plan at all.
    corp = grams(rebalance_for_fanout(toks.where(F.col("doc_id") >= BENCH_DOCS)))
    return (
        corp.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_hits"))
        .orderBy("doc_id")
    )


_CAP_ORACLE = f"""
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) ranked
WHERE rn <= {CAP_PER_SOURCE}
ORDER BY source, doc_id
"""


@query("cap_per_source", _CAP_ORACLE, tag="llm-text")
def cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota: keep the {CAP_PER_SOURCE} longest documents per
    source. ``rn <= K`` over a window compiles to two-phase
    WindowGroupLimit (local top-K before the exchange), so the shuffle
    carries at most K rows per domain per map task."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= CAP_PER_SOURCE)
        .select("doc_id", "source", "n_chars")
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Quality-ordered token-budget curriculum (round-2 fourth wave)
# ---------------------------------------------------------------------------

#: per-source token budget for the curriculum cut.
CURRICULUM_BUDGET = 700

_CURRICULUM_ORACLE = rf"""
WITH scored AS (
  SELECT doc_id, source,
         len(list_filter(regexp_split_to_array(lower(text), '\W+'),
                         t -> t <> '')) AS n_tok,
         len(list_distinct(list_filter(regexp_split_to_array(lower(text),
                                                             '\W+'),
                                       t -> t <> ''))) AS n_uniq
  FROM documents
), ranked AS (
  SELECT doc_id, source, n_tok,
         n_uniq * 1000000 // GREATEST(n_tok, 1) AS score,
         SUM(n_tok) OVER (
           PARTITION BY source
           ORDER BY n_uniq * 1000000 // GREATEST(n_tok, 1) DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
  FROM scored
)
SELECT doc_id, source, CAST(score AS BIGINT) AS score,
       CAST(n_tok AS BIGINT) AS n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
FROM ranked WHERE cum_tok - n_tok < {CURRICULUM_BUDGET}
"""


@query("curriculum_quality_budget", _CURRICULUM_ORACLE, tag="llm-text")
def curriculum_quality_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-first curriculum cut: rank each source's documents by lexical
    diversity (distinct/total token ratio in integer micro-units — exact, no
    float ordering) and keep documents until the running token count crosses
    the per-source budget; a document is kept iff it *starts* inside the
    budget, mirroring ``pack_token_budget``'s chunk rule. This is the
    "spend the token budget on the highest-quality slice of each domain"
    selection step of data curation.

    Plan: ``source`` is a bounded-cardinality partition key, so a single
    full window degrades to |sources|-way parallelism and an
    every-row-per-source sort — the round-6 1000× probe measured exactly
    that (18.3× for the last 10× of rows). Instead, positive-token docs
    are rank-pruned first: a doc with ``row_number > CURRICULUM_BUDGET``
    has ≥ BUDGET positive-token predecessors, hence ≥ BUDGET preceding
    tokens, hence can never start inside the budget — and a literal
    rank-≤-N filter is rewritten by Spark into WindowGroupLimit, a
    map-side per-partition top-N before the one (now small) window
    shuffle. The running sum then touches ≤ BUDGET rows per source.
    Zero-token docs (they consume no budget, so the full-window semantics
    keep them at ANY rank while the budget lasts) resolve against the
    kept-positive boundary table — ≤ BUDGET rows per source by
    construction, broadcastable at any corpus size: a zero-token doc is
    kept iff no kept positive doc sorting before it has already crossed
    the budget, and its cum_tok equals the last preceding kept-positive
    cum_tok (every positive predecessor of a kept zero-token doc is
    itself kept, so the boundary table is sufficient — the first positive
    doc to reach cum ≥ BUDGET always starts inside the budget)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")
    scored = d.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
    ).select(
        "doc_id",
        "source",
        "n_tok",
        F.floor(
            F.col("n_uniq") * 1000000 / F.greatest(F.col("n_tok"), F.lit(1))
        ).cast("long").alias("score"),
    ).persist()  # 4 narrow columns; 3 consumers (pos, zero, boundary
    # broadcast) would each re-run the dominant tokenize+distinct scoring.
    # Deliberately not unpersisted: the returned DF is lazy (the caller
    # collects later), so an eager unpersist would force the recompute this
    # cache exists to avoid. Repeated invocations stay bounded because
    # Spark's CacheManager canonicalizes and dedupes identical logical
    # plans — re-running the key re-uses the one cached table per sf_dir
    # rather than stacking new ones (verified r6; LRU evicts under pressure)
    pos = scored.where(F.col("n_tok") >= 1)
    zero = scored.where(F.col("n_tok") == 0)
    w_rank = Window.partitionBy("source").orderBy(
        F.col("score").desc(), "doc_id"
    )
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pos_kept = (
        pos.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= CURRICULUM_BUDGET)
        .withColumn("cum_tok", F.sum("n_tok").over(w_cum))
        .where(F.col("cum_tok") - F.col("n_tok") < CURRICULUM_BUDGET)
        .select("doc_id", "source", "score", "n_tok", "cum_tok")
    )
    boundary = pos_kept.select(
        F.col("source").alias("b_source"),
        F.col("score").alias("b_score"),
        F.col("doc_id").alias("b_doc"),
        F.col("cum_tok").alias("b_cum"),
    )
    sorts_before = (F.col("b_score") > F.col("score")) | (
        (F.col("b_score") == F.col("score"))
        & (F.col("b_doc") < F.col("doc_id"))
    )
    zero_kept = (
        zero.join(
            F.broadcast(boundary),
            (F.col("b_source") == F.col("source")) & sorts_before,
            "left",
        )
        .groupBy("doc_id", "source", "score", "n_tok")
        .agg(F.max("b_cum").alias("pre_cum"))
        .where(
            F.col("pre_cum").isNull()
            | (F.col("pre_cum") < CURRICULUM_BUDGET)
        )
        .select(
            "doc_id",
            "source",
            "score",
            "n_tok",
            F.coalesce("pre_cum", F.lit(0)).cast("long").alias("cum_tok"),
        )
    )
    return pos_kept.unionByName(zero_kept)


# ---------------------------------------------------------------------------
# Corpus novelty — per-document contribution of first-seen n-grams
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS words
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(words) - {NGRAM - 1}, 0)),
                i -> array_to_string(words[i:i+{NGRAM - 1}], ' '))) AS gram
  FROM toks
), per_doc_gram AS (
  SELECT DISTINCT doc_id, gram FROM grams
), first_seen AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM per_doc_gram GROUP BY gram
)
SELECT p.doc_id,
       COUNT(*) AS n_grams,
       COUNT(*) FILTER (WHERE f.first_doc = p.doc_id) AS n_novel,
       ROUND(CAST(COUNT(*) FILTER (WHERE f.first_doc = p.doc_id) AS DOUBLE)
             / COUNT(*), 6) AS novelty_rate
FROM per_doc_gram p JOIN first_seen f ON p.gram = f.gram
GROUP BY p.doc_id
"""


@query("text_novelty", _NOVELTY_ORACLE, tag="llm-text")
def text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-novelty score: the fraction of a document's distinct word
    n-grams that it INTRODUCES to the corpus (doc_id order as ingestion
    order) — the data-valuation signal behind "does this source add
    anything new" pruning decisions: near-zero novelty marks templated or
    duplicated feeds long before a full dedup pass runs.

    Plan: within-document gram dedup is ``array_distinct`` on the gram
    array (map-side, replacing a corpus-gram-sized ``distinct()`` shuffle),
    ``n_grams`` is the array size (free in the same projection), so the
    exploded gram table crosses the wire exactly once — the (gram → min
    doc_id) reduce with map-side partial min. ``n_novel`` comes from
    re-grouping that gram-count-sized result by its winning doc, and the
    only join left is doc-level (doc ids × small novel-count table, AQE
    broadcasts it). The round-6 1000× probe caught the previous shape —
    distinct + join-back + final group all on the full gram table — going
    super-linear (15.6× for the last 10× of rows) from triple-shuffling
    ~500M grams; this shape shuffles them once."""
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", r"\s+"), lambda w: w != "")
    idx = F.when(
        F.size("words") >= NGRAM,
        F.sequence(F.lit(1), F.size("words") - (NGRAM - 1)),
    ).otherwise(F.array().cast("array<int>"))
    gram_arr = F.transform(
        idx, lambda i: F.array_join(F.slice("words", i, NGRAM), " ")
    )
    # persist: gram generation (regex split + gram-string build + distinct)
    # dominates this key's cost, and both consumers below would re-run it —
    # the old shape's distinct() exchange doubled as a materialization, so
    # dropping the shuffle without persisting would double the CPU instead
    doc_grams = (
        d.select("doc_id", words.alias("words"))
        .select("doc_id", F.array_distinct(gram_arr).alias("grams"))
        .where(F.size("grams") > 0)
    ).persist()  # not unpersisted (returned DF is lazy); bounded across
    # reruns by CacheManager plan-dedup — see curriculum_quality_budget note
    doc_level = doc_grams.select(
        "doc_id", F.size("grams").cast("long").alias("n_grams")
    )
    first_seen = (
        doc_grams.select("doc_id", F.explode("grams").alias("gram"))
        .groupBy("gram")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    novel = first_seen.groupBy("first_doc").agg(
        F.count(F.lit(1)).alias("n_novel_raw")
    )
    n_novel = F.coalesce(F.col("n_novel_raw"), F.lit(0)).cast("long")
    return (
        doc_level.join(
            novel, doc_level["doc_id"] == novel["first_doc"], "left"
        )
        .select(
            "doc_id",
            "n_grams",
            n_novel.alias("n_novel"),
            F.round(
                n_novel.cast("double") / F.col("n_grams"), 6
            ).alias("novelty_rate"),
        )
    )


_URL_CANON_ORACLE = """
WITH variants AS (
  SELECT doc_id,
         'HTTPS://WWW.' || upper(source) || '.Example.COM/docs/'
           || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&lang=' || lang
           || '&utm_medium=rss#frag' AS url
  FROM documents
  UNION ALL
  SELECT doc_id,
         'https://' || source || '.example.com/docs/'
           || CAST(doc_id AS VARCHAR) || '?lang=' || lang
  FROM documents),
parts AS (
  SELECT doc_id,
         replace(lower(regexp_extract(url, '^([a-zA-Z]+://[^/?#]+)', 1)),
                 '://www.', '://') AS sh,
         regexp_replace(regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1),
                        '/$', '') AS path,
         array_to_string(list_sort(list_filter(
           string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
           p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS q
  FROM variants)
SELECT sh || path || CASE WHEN q <> '' THEN '?' || q ELSE '' END
         AS canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM parts GROUP BY 1
"""


@query("text_url_canonicalize", _URL_CANON_ORACLE, tag="llm-text")
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the step BEFORE any content dedup in a
    web-crawl pipeline (most crawl duplicates are the same page under
    cosmetic URL variants). Canonical form: lowercase scheme+host, leading
    ``www.`` stripped, fragment dropped, query parsed into params with
    ``utm_*`` tracking removed and the survivors SORTED (param order is not
    identity), trailing slash normalized — then group by canonical URL with
    keep-first.

    The fixture synthesizes two provably-different spellings per document
    (uppercase host + tracking params + fragment + trailing slash vs the
    clean form), so every canonical group must collapse to exactly 2
    variants. Pure codegen regex/array chain (one map pass, one groupBy on
    the canonical key) — at crawl scale this is the cheapest dedup tier and
    runs first precisely because it needs no content reads."""
    d = load_table(spark, sf_dir, "documents")
    v1 = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW."), F.upper("source"), F.lit(".Example.COM/docs/"),
            F.col("doc_id").cast("string"), F.lit("/?utm_source=feed&lang="),
            F.col("lang"), F.lit("&utm_medium=rss#frag"),
        ).alias("url"),
    )
    v2 = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        ).alias("url"),
    )
    sh = F.replace(
        F.lower(F.regexp_extract("url", r"^([a-zA-Z]+://[^/?#]+)", 1)),
        F.lit("://www."), F.lit("://"),
    )
    path = F.regexp_replace(
        F.regexp_extract("url", r"^[a-zA-Z]+://[^/?#]+([^?#]*)", 1), r"/$", ""
    )
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    q = F.array_join(params, "&")
    canonical = F.concat(
        sh, path, F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    )
    return (
        v1.unionAll(v2)
        .select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        )
    )
