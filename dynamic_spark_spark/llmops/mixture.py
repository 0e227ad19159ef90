"""Training-mixture construction: weighted sampling + context packing.

Two more steps a large-scale LLM data pipeline runs between curation and
tokenization (SURVEY.md §2.D posture):

- ``sample_mixture`` — per-source mixture sampling at declared rates
  ("upsample wiki, downsample crawl"). The keep/drop decision is a
  **deterministic hash gate**: ``(doc_id * KNUTH) % 1000 < rate‰`` — pure
  int64 arithmetic, identical in any engine, needs no RNG state, and is
  reproducible row-locally at 100 TB (a map-only pass, no shuffle, no
  seed-distribution problem). The same idiom DuckDB evaluates bit-identically,
  so the sample is oracle-checked exactly — unlike ``rand(seed)`` whose
  sequence is engine-private (cf. the rows-only ``sample_split``).
- ``pack_token_budget`` — greedy sequence packing: stream documents per
  language in doc_id order, cut a new context chunk whenever the running
  token count would cross ``PACK_BUDGET``. chunk_id falls out of a window
  cumulative sum: ``floor((cumsum - tok)/budget)`` assigns each doc to the
  chunk where it starts. One shuffle (the per-lang window sort); at scale
  the partition key would widen to (lang, shard) to bound sort size.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

#: Knuth multiplicative-hash constant (public domain folklore).
_KNUTH = 2654435761
#: per-source keep rates in permil: wiki-ish sources kept whole, the rest cut.
MIX_RATES = {"src0": 1000, "src1": 750, "src2": 500, "src3": 250}
DEFAULT_RATE = 100
#: context window budget in whitespace tokens.
PACK_BUDGET = 2048

_RATE_CASE_SQL = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {r}" for s, r in MIX_RATES.items())
    + f" ELSE {DEFAULT_RATE} END"
)

# Gate arithmetic reduces doc_id mod 1000 BEFORE multiplying: the naive
# ``doc_id * KNUTH`` overflows int64 for doc_id >= ~3.5e9 (real at 100 TB row
# counts) — Spark would silently wrap while DuckDB raises, breaking both the
# sample and oracle parity. ``((doc_id % 1000) * (KNUTH % 1000)) % 1000`` is
# bit-identical to the full product's residue with no overflow. Note the gate
# uses only the low decimal digits of doc_id — a fixed bijection of
# ``doc_id % 1000``, i.e. *stratified* deterministic sampling, which is the
# intent (reproducible, restartable); swap in a xor-shift mix of the full id
# if pseudorandomness across the id space ever matters.
_KNUTH_RED = _KNUTH % 1000

_MIXTURE_ORACLE = f"""
SELECT doc_id, source
FROM documents
WHERE ((doc_id % 1000) * {_KNUTH_RED}) % 1000 < ({_RATE_CASE_SQL})
"""


@query("sample_mixture", _MIXTURE_ORACLE, tag="llm-text")
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source mixture sampling. The hash gate is a single
    codegen'd integer expression per row: map-only, shuffle-free, and the
    keep decision for any doc is reproducible on any executor — the property
    that makes 100 TB sampling restartable. Overflow-safe modular form (see
    module comment)."""
    d = load_table(spark, sf_dir, "documents")
    rate = None
    for s, r in MIX_RATES.items():
        cond = F.col("source") == s
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = rate.otherwise(F.lit(DEFAULT_RATE))
    gate = (
        F.pmod(F.pmod(F.col("doc_id"), F.lit(1000)) * F.lit(_KNUTH_RED), F.lit(1000))
        < rate
    )
    return d.where(gate).select("doc_id", "source")


_TOK_SQL = "len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> ''))"

_PACK_ORACLE = f"""
SELECT doc_id, lang, n_tok,
       CAST(FLOOR(CAST(cum_tok - n_tok AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS chunk_id
FROM (
  SELECT doc_id, lang, {_TOK_SQL} AS n_tok,
         SUM({_TOK_SQL}) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
  FROM documents
) t
"""


@query("pack_token_budget", _PACK_ORACLE, tag="llm-text")
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy context packing: per-language running token sum; a document
    lands in the chunk where its first token falls. The window is the only
    shuffle, and the arithmetic (int64 sums, one float division at the end)
    is engine-exact for the oracle."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda w: w != "")).cast("long")
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.select("doc_id", "lang", n_tok.alias("n_tok"))
        .withColumn("cum_tok", F.sum("n_tok").over(w))
        .select(
            "doc_id",
            "lang",
            "n_tok",
            F.floor((F.col("cum_tok") - F.col("n_tok")).cast("double") / PACK_BUDGET)
            .cast("long")
            .alias("chunk_id"),
        )
    )


#: per-group deterministic sample size
RESERVOIR_K = 5

_RESERVOIR_ORACLE = f"""
WITH ranked AS (
  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT source, doc_id, h FROM ranked WHERE rn <= {RESERVOIR_K}
"""


@query("sample_reservoir_per_group", _RESERVOIR_ORACLE, tag="llm-text")
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-group sampling via hash ranking: exactly K docs per
    source, chosen by ordering on ``md5(doc_id)`` — a content-addressed
    stand-in for reservoir sampling that is deterministic, restartable, and
    oracle-checkable (classic RNG reservoirs are none of the three).

    Scale shape: rank-then-filter compiles to WindowGroupLimit (each map
    task forwards at most K rows per group before the shuffle), so the
    exchange carries ~K·|groups| rows — not the corpus. Same device as
    ``topk_per_group``, keyed by hash instead of a metric."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        d.select("source", "doc_id", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= RESERVOIR_K)
        .select("source", "doc_id", "h")
    )


#: FFD bin capacity in tokens (context-window budget per packed sequence)
FFD_CAPACITY = 256
#: deterministic shard fan-out — bounds the per-group state any one Python
#: worker materializes, independent of corpus size
FFD_SHARDS = 8


@query("pack_sequences_ffd", tag="llm-text")  # rows-only: FFD is not SQL-expressible
def pack_sequences_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing sequence packing via ``applyInPandas``: pack
    documents into fixed-capacity token bins (the training-data step that
    turns a shuffled corpus into dense context windows with minimal padding).

    FFD needs sequential bin state, so it runs as a grouped-map Pandas UDF —
    but the group key is (lang, shard) with shard = doc_id mod FFD_SHARDS,
    so no worker ever materializes more than 1/shards of a language: the
    packing is embarrassingly parallel across shards and the token counting
    stays JVM-side codegen. Classic first-fit guarantee (at most one bin
    ≤ half-full per group) is pinned by a property test. Deterministic:
    sort by (n_tokens desc, doc_id) — no RNG, restartable at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda w: w != "")).cast("long")
    base = d.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(FFD_SHARDS)).cast("int").alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # First-fit via a segment tree over per-bin remaining capacity:
        # leftmost-bin-with-room lookup is O(log n) instead of the naive
        # linear scan, which measured quadratic (21× time for 10× rows at
        # the 100× probe) once groups hold >10k docs. Same assignment as
        # the linear scan — first-fit is defined by bin index order, which
        # the leftmost-descent preserves.
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        n = len(pdf)
        size = 1
        while size < max(n, 1):
            size *= 2
        tree = [0] * (2 * size)  # max remaining capacity per subtree; 0 = unopened
        n_bins = 0

        def update(leaf: int, value: int) -> None:
            i = size + leaf
            tree[i] = value
            i //= 2
            while i:
                tree[i] = max(tree[2 * i], tree[2 * i + 1])
                i //= 2

        assign: list[int] = []
        for t in pdf["n_tokens"]:
            t = int(t)
            if tree[1] >= t:  # leftmost bin with remaining >= t
                i = 1
                while i < size:
                    i = 2 * i if tree[2 * i] >= t else 2 * i + 1
                b = i - size
                update(b, tree[i] - t)
            else:
                b = n_bins
                n_bins += 1
                update(b, max(FFD_CAPACITY - t, 0))
            assign.append(b)
        out = pdf.copy()
        out["bin_id"] = assign
        return out

    return base.groupBy("lang", "shard").applyInPandas(
        pack,
        schema="doc_id long, lang string, n_tokens long, shard int, bin_id int",
    )


# ---------------------------------------------------------------------------
# Weighted sampling + mixture QC (round-2 second wave)
# ---------------------------------------------------------------------------

#: MINSTD LCG over the Mersenne prime — deterministic per-doc uniform.
_WP = 2147483647
_WA = 48271
_WB = 11
#: weighted-sample size.
WEIGHTED_K = 200

_WEIGHTED_ORACLE = f"""
SELECT doc_id, source, n_chars, priority
FROM (
  SELECT doc_id, source, n_chars,
         (((((doc_id % {_WP}) * {_WA} + {_WB}) % {_WP}) * {_WA} + {_WB})
            % {_WP}) * 1000000
           // GREATEST(n_chars, 1) AS priority
  FROM documents
) t
ORDER BY priority, doc_id
LIMIT {WEIGHTED_K}
"""


@query("sample_weighted", _WEIGHTED_ORACLE, tag="llm-text")
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (sequential Poisson / priority
    sampling, Ohlsson): each doc draws a deterministic uniform ``u`` —
    MINSTD seeded with doc_id and advanced TWICE; a single step is monotone
    in doc_id for small ids (no modular wrap before doc_id ≈ 44k), which
    would degenerate the sample to "lowest doc_ids win"; the second step
    wraps thousands of times, scattering consecutive ids across the full
    range — and is ranked by ``u / weight``, weight = ``n_chars``, so long
    documents are proportionally more likely to make the cut. The priority
    is pure int64 arithmetic (no float RNG state): ``u < 2^31`` keeps every
    intermediate below 2^47 and the ``u*1e6`` numerator below 2^53 (float
    floor-division exact), and DuckDB computes it bit-identically, which
    makes a *weighted random sample* oracle-checkable exactly. Map-only
    scoring; the global top-K is a TakeOrdered (per-partition heap + driver
    merge of K rows), not a full sort — the same plan at 100 TB moves only
    K rows per partition."""
    d = load_table(spark, sf_dir, "documents")
    u1 = F.pmod(F.pmod(F.col("doc_id"), F.lit(_WP)) * _WA + _WB, F.lit(_WP))
    u = F.pmod(u1 * _WA + _WB, F.lit(_WP))
    # GREATEST guard: a zero-length doc must not fault the whole job
    # (Spark yields NULL on x/0 while ANSI engines raise — both wrong here)
    priority = F.floor(
        u * F.lit(1000000) / F.greatest(F.col("n_chars"), F.lit(1))
    ).cast("long")
    return (
        d.select("doc_id", "source", "n_chars", priority.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(WEIGHTED_K)
    )


_KL_ORACLE = r"""
WITH tok AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                            t -> t <> '')) AS tok
  FROM documents
), src_counts AS (
  SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok
), src_totals AS (
  SELECT source, SUM(c) AS n FROM src_counts GROUP BY source
), corpus AS (
  SELECT tok, SUM(c) AS cc FROM src_counts GROUP BY tok
), corpus_total AS (
  SELECT SUM(cc) AS nn FROM corpus
)
SELECT s.source,
       ROUND(SUM((s.c / t.n) * LN((s.c / t.n) / (g.cc / ct.nn))), 6) AS kl_nats
FROM src_counts s
JOIN src_totals t USING (source)
JOIN corpus g USING (tok)
CROSS JOIN corpus_total ct
GROUP BY s.source
"""


@query("mix_kl_divergence", _KL_ORACLE, tag="llm-text")
def mix_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture QC: KL(P_source || P_corpus) over unigram distributions — the
    standard "how far does each source drift from the blend" diagnostic run
    before fixing mixture weights (the quantity LLM data ablations report).
    Plan shape: one explode + one (source, tok) count shuffle; everything
    after operates on the counts table (vocab-sized, not corpus-sized), and
    the corpus marginal is derived from the same counts — the raw text is
    read exactly once. KL >= 0 with equality iff the source matches the
    corpus blend (value in NATS — natural log on both sides); no smoothing needed because every source term appears in
    the corpus marginal by construction."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")
        ).alias("tok"),
    )
    sc = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").alias("n"))
    corpus = sc.groupBy("tok").agg(F.sum("c").alias("cc"))
    nn = corpus.agg(F.sum("cc").alias("nn"))
    p = F.col("c") / F.col("n")
    q = F.col("cc") / F.col("nn")
    return (
        sc.join(st, "source")
        .join(corpus, "tok")
        .crossJoin(F.broadcast(nn))
        .groupBy("source")
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl_nats"))
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (round-2 fourth wave)
# ---------------------------------------------------------------------------

_TEMP_ORACLE = f"""
WITH n AS (
  SELECT source,
         SUM({_TOK_SQL}) AS n_tokens
  FROM documents GROUP BY source
), s AS (
  SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
           AS sqrt_micro
  FROM n
)
SELECT source, n_tokens,
       ROUND(CAST(sqrt_micro AS DOUBLE) / SUM(sqrt_micro) OVER (), 6)
         AS weight_temp
FROM s
"""


@query("mix_temperature_weights", _TEMP_ORACLE, tag="llm-text")
def mix_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights, ``w_i ∝ n_i^(1/T)`` with
    T = 2 (α = 0.5) — the multilingual/multi-source rebalancing rule
    (upweight small sources, damp the crawl) every LLM mixture spec applies
    before sampling. Determinism device: each source's ``sqrt(n_tokens)`` is
    **floored to integer micro-units before normalizing**, so the
    denominator is an exact integer sum (float Σ over sources would be
    order-dependent and break the oracle hash). One token-count reduce per
    source; the normalization window runs over |sources| rows."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda w: w != "")).cast(
        "long"
    )
    n = d.select("source", n_tok.alias("t")).groupBy("source").agg(
        F.sum("t").alias("n_tokens")
    )
    s = n.withColumn(
        "sqrt_micro",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000).cast("long"),
    )
    w = Window.partitionBy()
    return s.select(
        "source",
        "n_tokens",
        F.round(
            F.col("sqrt_micro").cast("double") / F.sum("sqrt_micro").over(w), 6
        ).alias("weight_temp"),
    )


#: shuffle geometry: output shards and the run's shuffle seed (a new seed
#: is a new deterministic permutation; same seed reproduces bit-exactly)
SHUFFLE_SHARDS = 8
SHUFFLE_SEED = 42

_SHUFFLE_ORACLE = f"""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)
              || ':{SHUFFLE_SEED}'), doc_id) - 1 AS BIGINT) AS position,
       CAST((ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)
              || ':{SHUFFLE_SEED}'), doc_id) - 1) % {SHUFFLE_SHARDS} AS BIGINT)
         AS shard
FROM documents
"""


#: parallelism of the global-rank assignment (range partitions over the
#: salted hash; each holds a contiguous slice of the permutation)
SHUFFLE_RANK_PARTS = 16


@query("corpus_shuffle", _SHUFFLE_ORACLE, tag="llm-text")
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle — the training-order permutation
    every pretraining run needs, WITHOUT RNG state: order by a salted
    content hash (md5 of doc_id + seed, portable to the oracle engine),
    assign a dense position and a round-robin shard. Same seed → identical
    permutation on any cluster; new seed → fresh permutation.

    The dense global rank is assigned DISTRIBUTED, zipWithIndex-style:
    range-partition on (hash, doc_id) so partition i holds a contiguous
    slice of the total order, rank locally per partition, then add each
    partition's starting offset. The offsets come from one
    partition-count-sized collect (a model-sized scalar list, like the PCA
    sufficient stats) turned into a literal lookup map — so no row ever
    funnels through a single task, unlike a naive
    ``row_number() OVER (ORDER BY ...)``. Positions are exact and
    boundary-independent: whatever range boundaries the sampler picks, the
    concatenation of sorted slices IS the global order. At 100 TB the
    permutation usually stops at the shard level (hash to shard, shuffle
    within shard), dropping the dense rank — same plan minus the offsets."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{SHUFFLE_SEED}")))
    ranked = (
        d.select("doc_id", h.alias("h"))
        .repartitionByRange(SHUFFLE_RANK_PARTS, "h", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        # pin partition membership: the size job and the rank job must see
        # the SAME partitions (zipWithIndex's contract; at 100 TB this is a
        # persist(DISK_ONLY) of (doc_id, hash) — two narrow columns, not the
        # corpus text)
        .localCheckpoint()
    )
    # partition sizes -> starting offsets (one tiny job; |result| = #partitions)
    sizes = {
        r["pid"]: r["n"]
        for r in ranked.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    local = Window.partitionBy("pid").orderBy("h", "doc_id")
    pos = F.row_number().over(local) - 1 + off_map[F.col("pid")]
    return ranked.select(
        "doc_id",
        pos.cast("bigint").alias("position"),
        (pos % SHUFFLE_SHARDS).cast("bigint").alias("shard"),
    )


#: epoch solver: target mixture weights per source and the repeat ceiling
#: (LLaMA-style data recipes upsample small high-quality sources a bounded
#: number of epochs rather than matching weights exactly)
EPOCH_TARGETS = {"src0": 0.40, "src1": 0.30, "src2": 0.20, "src3": 0.10}
MAX_EPOCHS = 4

_EPOCH_TARGET_SQL = " UNION ALL ".join(
    f"SELECT '{s}' AS source, {w} AS target_w" for s, w in EPOCH_TARGETS.items()
)

_EPOCHS_ORACLE = f"""
WITH tok AS (
  SELECT source,
         CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  w -> w <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total FROM tok),
t AS ({_EPOCH_TARGET_SQL})
SELECT k.source, k.n_tokens, t.target_w,
       ROUND(k.n_tokens / tot.total, 6) AS natural_w,
       LEAST(CAST({MAX_EPOCHS} AS DOUBLE),
             ROUND(t.target_w * tot.total / k.n_tokens, 6)) AS epochs,
       CAST(FLOOR(LEAST(CAST({MAX_EPOCHS} AS DOUBLE),
             ROUND(t.target_w * tot.total / k.n_tokens, 6))
             * k.n_tokens) AS BIGINT) AS effective_tokens
FROM tok k JOIN t ON t.source = k.source CROSS JOIN tot
"""


@query("mix_upsample_epochs", _EPOCHS_ORACLE, tag="llm-text")
def mix_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch/repeat-factor solver for a target data mixture: given desired
    per-source weights, compute how many EPOCHS of each source the training
    run should see (`target_share · total / source_tokens`), clamped at
    ``MAX_EPOCHS`` — the bounded-upsampling recipe (small high-quality
    sources repeat a few epochs; nothing repeats unboundedly). Emits the
    natural share, the solved epoch factor, and the effective token count
    the clamp actually yields, so the gap between asked-for and achievable
    mixture is explicit. One aggregate over the corpus + a 4-row broadcast
    of targets."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    tok = d.select("source", n_tok.alias("t")).groupBy("source").agg(
        F.sum("t").cast("bigint").alias("n_tokens")
    )
    # JVM-literal target table (explode of a literal struct array):
    # createDataFrame over a Python list is a pickled-row RDD whose every
    # scan spawns defaultParallelism Python workers for 4 rows
    targets = d.sparkSession.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("source"),
                        F.lit(float(w)).alias("target_w"),
                    )
                    for s, w in EPOCH_TARGETS.items()
                ]
            )
        ).alias("kv")
    ).select("kv.source", "kv.target_w")
    epochs = F.least(
        F.lit(float(MAX_EPOCHS)),
        F.round(F.col("target_w") * F.col("total") / F.col("n_tokens"), 6),
    )
    # the denominator is the WHOLE corpus — materialize it before the
    # target join narrows the frame to the 4 targeted sources
    tok = tok.withColumn(
        "total", F.sum("n_tokens").over(Window.partitionBy()).cast("double")
    )
    return (
        tok.join(F.broadcast(targets), "source")
        .select(
            "source",
            "n_tokens",
            "target_w",
            F.round(F.col("n_tokens") / F.col("total"), 6).alias("natural_w"),
            epochs.alias("epochs"),
            F.floor(epochs * F.col("n_tokens")).cast("bigint").alias(
                "effective_tokens"
            ),
        )
    )
