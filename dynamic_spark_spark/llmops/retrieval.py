"""Retrieval / indexing operators for LLM data pipelines: TF-IDF keyword
extraction, BM25 ranked search, fixed-size token chunking with overlap, and
PMI collocation mining — all over the ``documents`` table with exact DuckDB
oracles.

These extend the reference's text-processing surface (string functions +
wordcount pipelines, ``ScalaSparkTest.java:105-167``) to the retrieval
primitives a training-data/RAG pipeline needs. Everything below is pure
DataFrame codegen: the only shuffles are the (doc, term) / term aggregations,
and every per-document step (tokenize, chunk, bigram build) is a map-side
expression with zero fan-in.

Float determinism: scores that involve ``ln`` are emitted as fixed-point
micro-units (``floor(x * 1e6 + 0.5)`` as BIGINT) and ranked on that integer,
so Spark/DuckDB last-ulp differences cannot reorder top-k cuts (same device
as functions/collections.py's ``_fp_join``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

#: corpus tokenization shared with llmops/text.py vocabulary keys
_TOK_SPARK = r"\W+"
_TOK_SQL = r"list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> '')"

#: fixed-point scale for float scores (micro-units)
_FP = 1_000_000


def _words(col: str = "text") -> Column:
    return F.filter(F.split(F.lower(col), _TOK_SPARK), lambda t: t != "")


def _fp(col: Column) -> Column:
    return F.floor(col * _FP + F.lit(0.5)).cast("long")


_TFIDF_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
)
SELECT tf.doc_id, tf.tok, CAST(tf.tf AS BIGINT) AS tf,
       CAST(FLOOR(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) * {_FP} + 0.5)
            AS BIGINT) AS score_fp
FROM tf JOIN dfreq USING (tok) CROSS JOIN n
QUALIFY ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                           ORDER BY score_fp DESC, tf.tok) <= 5
"""


@query("text_tfidf_topk", _TFIDF_ORACLE, tag="llm-retrieval")
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF terms (keyword extraction).

    Scale shape: one explode feeds a (doc_id, tok) partial-aggregated count
    (the only corpus-sized shuffle); document frequency is a vocabulary-sized
    rollup of that same table (no second pass over the corpus); idf joins
    back on ``tok`` where AQE picks broadcast vs shuffle by the measured
    vocabulary size. The per-document top-5 is a rank window that compiles
    to two-phase WindowGroupLimit, so each shuffle partition forwards at
    most 5 rows per document. Ranking happens on the fixed-point integer
    score — float ulp noise cannot flip the cut."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_words()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "tf",
            _fp(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            ).alias("score_fp"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_fp").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("doc_id", "tok", "tf", "score_fp")
    )


#: fixed search query for the BM25 key (terms present in the synthetic corpus)
BM25_QUERY_TERMS = ["vector", "query", "merge"]
BM25_K1 = 1.2
BM25_B = 0.75

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

_BM25_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), avgdl AS (
  SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM tok
  WHERE tok IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (avgdl.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / avgdl.avgdl))
           AS s
  FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN avgdl
)
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_terms,
       CAST(FLOOR(SUM(s) * {_FP} + 0.5) AS BIGINT) AS score_fp
FROM scored GROUP BY doc_id
QUALIFY ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id) <= 20
"""


@query("text_bm25_search", _BM25_ORACLE, tag="llm-retrieval")
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed query (k1=1.2, b=0.75): top-20
    documents with per-document matched-term counts.

    Scale shape: nothing corpus-sized ever crosses the wire. Document
    length is the token ARRAY length (map-side `size`, no explode — the
    round-6 1000× probe caught the exploded-dl shape at 14.0× for the last
    10× of rows: two full 500M-token explodes plus a corpus-wide groupBy),
    and the term-frequency explode happens AFTER an array-level filter to
    the query's terms, so the exploded stream scales with the posting
    lists of the query terms, not the corpus. avgdl/n_docs is one scalar
    aggregation whose result is broadcast. The final top-20 is a
    single-partition window over the already-reduced per-doc score table
    — at cluster scale that table is |matching docs| rows, and a two-level
    top-k (per-partition limit then merge) is what AQE's WindowGroupLimit
    emits for exactly this rank-filter shape."""
    d = load_table(spark, sf_dir, "documents")
    words = _words()
    # oracle's dl CTE counts tokens per doc FROM the exploded stream, which
    # drops zero-token docs — mirror that with the >= 1 filter
    dl = d.select(
        "doc_id", F.size(words).cast("long").alias("dl")
    ).where(F.col("dl") >= 1).persist()  # two narrow columns; consumed by
    # both stats and the score join — unpersisted it re-tokenizes the corpus.
    # Not unpersisted on exit (returned DF is lazy); reruns stay bounded via
    # CacheManager plan-dedup — see curation.curriculum_quality_budget note
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    matching = F.filter(
        words, lambda t: t.isin(*BM25_QUERY_TERMS)
    )
    tf = (
        d.select("doc_id", F.explode(matching).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    s = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1
            * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s.alias("s"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_terms"),
        _fp(F.sum("s")).alias("score_fp"),
    )
    w = Window.orderBy(F.col("score_fp").desc(), "doc_id")
    return (
        per_doc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("doc_id", "n_terms", "score_fp")
    )


#: context-window chunking parameters (tokens)
CHUNK_SIZE = 64
CHUNK_STRIDE = 48

_CHUNK_ORACLE = rf"""
WITH arrs AS (
  SELECT doc_id, {_TOK_SQL} AS arr FROM documents
)
SELECT doc_id,
       CAST((g.s - 1) / {CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(LEAST({CHUNK_SIZE}, len(arr) - g.s + 1) AS INT) AS chunk_len,
       arr[g.s] AS first_tok
FROM arrs,
     LATERAL (SELECT unnest(generate_series(1, len(arr), {CHUNK_STRIDE})) AS s) g
WHERE len(arr) >= 1
"""


@query("text_chunk_overlap", _CHUNK_ORACLE, tag="llm-retrieval")
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window context chunking: size-64 token chunks every 48 tokens
    (16-token overlap), the standard long-document → training-sample split.

    Scale shape: zero shuffles — chunk starts are a per-row ``sequence``
    and the fan-out is a generator explode, all inside whole-stage codegen.
    Output order/content is deterministic (no RNG, no timestamps), so chunk
    ids are stable across retries — the property that makes a 100 TB
    chunking pass restartable and its downstream dedup incremental."""
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(F.lit(1), F.size("arr"), F.lit(CHUNK_STRIDE))
    return (
        d.select("doc_id", _words().alias("arr"))
        .where(F.size("arr") >= 1)
        .select("doc_id", "arr", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.least(
                F.lit(CHUNK_SIZE), F.size("arr") - F.col("s") + 1
            ).cast("int").alias("chunk_len"),
            F.element_at("arr", F.col("s")).alias("first_tok"),
        )
    )


#: PMI collocation mining: minimum pair count to suppress noise
PMI_MIN_COUNT = 25

_PMI_ORACLE = rf"""
WITH arrs AS (
  SELECT {_TOK_SQL} AS arr FROM documents
), grams AS (
  SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
                               i -> struct_pack(w1 := arr[i], w2 := arr[i + 1]))) AS g
  FROM arrs
), pair AS (
  SELECT g.w1 AS w1, g.w2 AS w2, COUNT(*) AS c12 FROM grams GROUP BY g.w1, g.w2
), uni AS (
  SELECT tok, COUNT(*) AS c FROM (
    SELECT unnest({_TOK_SQL}) AS tok FROM documents
  ) GROUP BY tok
), tot AS (
  SELECT SUM(c) AS n FROM uni
)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
       CAST(FLOOR(ln(c12 * tot.n / (u1.c * CAST(u2.c AS DOUBLE))) * {_FP} + 0.5)
            AS BIGINT) AS pmi_fp
FROM pair
JOIN uni u1 ON pair.w1 = u1.tok
JOIN uni u2 ON pair.w2 = u2.tok
CROSS JOIN tot
WHERE c12 >= {PMI_MIN_COUNT}
QUALIFY ROW_NUMBER() OVER (ORDER BY pmi_fp DESC, w1, w2) <= 50
"""


@query("text_pmi_bigrams", _PMI_ORACLE, tag="llm-retrieval")
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 adjacent word pairs by pointwise mutual
    information, ``PMI = ln(c12 * N / (c1 * c2))``, with a minimum pair
    count — the classic phrase-detection pass (e.g. word2vec phrase merge)
    run before tokenizer training.

    Scale shape: bigram and unigram counts are two partial-aggregated
    shuffles over per-row arrays; the PMI join runs on the
    vocabulary-sized count tables, never the corpus; the min-count filter
    cuts the pair table before the join; ranking uses fixed-point integers
    (see module docstring). The token array is materialized as a column
    before the ``transform`` lambda touches it — HOF lambdas re-evaluate
    non-attribute child expressions per element, so an inline ``_words()``
    split inside ``element_at`` makes bigram construction O(n²) per doc
    (measured 15× on sf0.1)."""
    d = load_table(spark, sf_dir, "documents")
    dw = d.select(_words().alias("words"))
    words = F.col("words")
    n = F.size(words)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(words, i).alias("w1"),
                F.element_at(words, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pair = (
        dw.select(F.explode(bigrams).alias("g"))
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= PMI_MIN_COUNT)
    )
    uni = (
        dw.select(F.explode(words).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("n"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    scored = (
        pair.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            _fp(
                F.log(
                    F.col("c12")
                    * F.col("n")
                    / (F.col("c1") * F.col("c2").cast("double"))
                )
            ).alias("pmi_fp"),
        )
    )
    w = Window.orderBy(F.col("pmi_fp").desc(), "w1", "w2")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .select("w1", "w2", "c12", "pmi_fp")
    )
