"""Frequency-sketch operators built as pure DataFrame aggregations.

The count-min sketch here is *not* Spark's opaque ``count_min_sketch`` binary
(which can't be probed cross-engine): the d×w counter matrix is materialized
as ordinary (depth, bucket, count) rows, so building it is one map-side
array expansion plus a single groupBy shuffle of at most d·w rows, and
probing is a broadcast join — every step stays in codegen and is
oracle-checkable in ANSI SQL. This is the standard distributed-CMS
construction: merge of per-partition sketches is exactly the partial
aggregation Catalyst already does.

Reference parity: aggregation surface of the delegated Spark compute
(docs/ScalaSparkCompute-sparkcompute.md:10-12); sketching itself is a
training-data-pipeline extension (SURVEY.md §2.D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

#: universal-hash family h_i(k) = ((a_i·k + b_i) mod P) mod W over Z_P
_CMS_P = 1_000_003  # prime > any key after `k mod P` reduction
_CMS_W = 512  # buckets per row
_CMS_ROWS = [(131, 7), (1031, 101), (8191, 359), (524287, 911)]  # (a_i, b_i)
_CMS_PROBES = [1, 3, 7, 42, 99]


def _cms_bucket_sql(expr: str, a: int, b: int) -> str:
    return f"(({a} * ({expr} % {_CMS_P}) + {b}) % {_CMS_P}) % {_CMS_W}"


def _cms_bucket_col(key, a: int, b: int):
    reduced = F.pmod(key, F.lit(_CMS_P))
    return F.pmod(F.pmod(F.lit(a) * reduced + F.lit(b), F.lit(_CMS_P)), F.lit(_CMS_W))


def _cms_oracle() -> str:
    pair_selects = " UNION ALL ".join(
        f"SELECT {i} AS depth, {_cms_bucket_sql('l_suppkey', a, b)} AS bucket"
        " FROM lineitem"
        for i, (a, b) in enumerate(_CMS_ROWS)
    )
    probe_selects = " UNION ALL ".join(
        f"SELECT probe_key, {i} AS depth,"
        f" {_cms_bucket_sql('probe_key', a, b)} AS bucket FROM probes"
        for i, (a, b) in enumerate(_CMS_ROWS)
    )
    probe_values = ", ".join(f"({k})" for k in _CMS_PROBES)
    return (
        f"WITH pairs AS ({pair_selects}),"
        " counters AS (SELECT depth, bucket, COUNT(*) AS c"
        "   FROM pairs GROUP BY depth, bucket),"
        f" probes AS (SELECT CAST(probe_key AS BIGINT) AS probe_key"
        f"   FROM (VALUES {probe_values}) AS t(probe_key)),"
        f" probe_pairs AS ({probe_selects}),"
        " est AS (SELECT probe_key, MIN(COALESCE(c, 0)) AS est_count"
        "   FROM probe_pairs LEFT JOIN counters USING (depth, bucket)"
        "   GROUP BY probe_key),"
        " truth AS (SELECT l_suppkey AS probe_key, COUNT(*) AS true_count"
        "   FROM lineitem GROUP BY l_suppkey)"
        " SELECT probe_key, CAST(est_count AS BIGINT) AS est_count,"
        " CAST(COALESCE(true_count, 0) AS BIGINT) AS true_count"
        " FROM est LEFT JOIN truth USING (probe_key)"
    )


@query("agg_countmin_estimate", _cms_oracle(), tag="sketch")
def agg_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation over ``l_suppkey``.

    Build: each fact row expands to d=4 (depth, bucket) pairs
    (``posexplode`` of a 4-element array — map-side, ×4 fan-out of a
    2-column projection), then ONE groupBy shuffle whose output is bounded
    by d·w = 2048 rows regardless of fact size — the partial aggregation
    does the classic per-partition-sketch merge for free. Probe: the 5-key
    probe set broadcast-joins the 2048-row counter table; the estimate is
    the min over depths (CMS guarantee: est ≥ true, overestimates only from
    hash collisions). True counts joined alongside so the error is visible
    in the result itself."""
    l = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    key = F.col("l_suppkey")
    buckets = F.array(*[_cms_bucket_col(key, a, b) for a, b in _CMS_ROWS])
    counters = (
        l.select(F.posexplode(buckets).alias("depth", "bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # JVM-literal probe set (explode of a literal array): createDataFrame
    # over a Python list is a pickled-row RDD whose every scan spawns
    # defaultParallelism Python workers for a handful of rows
    probes = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(int(k)).cast("long") for k in _CMS_PROBES])
        ).alias("probe_key")
    )
    pkey = F.col("probe_key")
    probe_buckets = F.array(*[_cms_bucket_col(pkey, a, b) for a, b in _CMS_ROWS])
    probe_pairs = probes.select(
        "probe_key", F.posexplode(probe_buckets).alias("depth", "bucket")
    )
    est = (
        F.broadcast(probe_pairs)
        .join(counters, ["depth", "bucket"], "left")
        .groupBy("probe_key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )
    truth = (
        l.filter(key.isin(_CMS_PROBES))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return (
        est.join(truth, est.probe_key == truth.l_suppkey, "left")
        .select(
            "probe_key",
            F.col("est_count").cast("bigint").alias("est_count"),
            F.coalesce(F.col("true_count"), F.lit(0)).cast("bigint").alias("true_count"),
        )
    )


#: Bloom parameters: m bits, k hash functions (reusing the CMS hash family)
_BLOOM_M = 4096
_BLOOM_K = 4
#: probe mix: present keys + absent keys far outside the domain
_BLOOM_PROBES = [1, 2, 777, 19_999, 10_000_000_000, 424_242_424_242]


def _bloom_bit_sql(expr: str, i: int) -> str:
    a, b = _CMS_ROWS[i]
    return f"(({a} * ({expr} % {_CMS_P}) + {b}) % {_CMS_P}) % {_BLOOM_M}"


def _bloom_bit_col(key, i: int):
    a, b = _CMS_ROWS[i]
    reduced = F.pmod(key, F.lit(_CMS_P))
    return F.pmod(F.pmod(F.lit(a) * reduced + F.lit(b), F.lit(_CMS_P)), F.lit(_BLOOM_M))


def _bloom_oracle() -> str:
    bit_selects = " UNION ALL ".join(
        f"SELECT {_bloom_bit_sql('l_partkey', i)} AS pos FROM lineitem"
        for i in range(_BLOOM_K)
    )
    probe_selects = " UNION ALL ".join(
        f"SELECT probe_key, {_bloom_bit_sql('probe_key', i)} AS pos FROM probes"
        for i in range(_BLOOM_K)
    )
    probe_values = ", ".join(f"({k})" for k in _BLOOM_PROBES)
    return (
        f"WITH bits AS (SELECT DISTINCT pos, 1 AS set_bit FROM ({bit_selects})),"
        f" probes AS (SELECT CAST(probe_key AS BIGINT) AS probe_key"
        f"   FROM (VALUES {probe_values}) AS t(probe_key)),"
        f" probe_bits AS ({probe_selects}),"
        " hits AS (SELECT probe_key, COUNT(set_bit) AS n_set"
        "   FROM probe_bits LEFT JOIN bits USING (pos) GROUP BY probe_key),"
        " truth AS (SELECT DISTINCT l_partkey FROM lineitem)"
        f" SELECT probe_key, (n_set = {_BLOOM_K}) AS bloom_member,"
        " (l_partkey IS NOT NULL) AS actually_present"
        " FROM hits LEFT JOIN truth ON probe_key = l_partkey"
    )


@query("agg_bloom_membership", _bloom_oracle(), tag="sketch")
def agg_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership over ``l_partkey``, materialized as a bit-
    position table instead of an opaque bitset so the sketch is probe-able
    cross-engine. Build: k=4 positions per row (map-side array expansion),
    then DISTINCT — the shuffle output is bounded by m=4096 rows regardless
    of fact size; the per-partition partial-distinct is the classic
    per-partition-bloom OR-merge. Probe: broadcast the probe set against the
    bit table; a key is reported present iff all k bits are set — zero false
    negatives by construction (pinned against the exact truth column in the
    result), false positives possible and visible. This bit-table shape is
    exactly what Spark's runtime-filter bloom pushdown builds internally
    (see tests/test_scale_patterns.py)."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    key = F.col("l_partkey")
    bits = (
        l.select(
            F.explode(F.array(*[_bloom_bit_col(key, i) for i in range(_BLOOM_K)]))
            .alias("pos")
        )
        .distinct()
    )
    # JVM-literal probe set — same rationale as the count-min probes above
    probes = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(int(k)).cast("long") for k in _BLOOM_PROBES])
        ).alias("probe_key")
    )
    pkey = F.col("probe_key")
    probe_bits = probes.select(
        "probe_key",
        F.explode(F.array(*[_bloom_bit_col(pkey, i) for i in range(_BLOOM_K)]))
        .alias("pos"),
    )
    hits = (
        F.broadcast(probe_bits)
        .join(bits.withColumn("set_bit", F.lit(1)), "pos", "left")
        .groupBy("probe_key")
        .agg(F.count("set_bit").alias("n_set"))
    )
    truth = l.filter(key.isin(_BLOOM_PROBES)).select("l_partkey").distinct()
    return hits.join(truth, hits.probe_key == truth.l_partkey, "left").select(
        "probe_key",
        (F.col("n_set") == _BLOOM_K).alias("bloom_member"),
        F.col("l_partkey").isNotNull().alias("actually_present"),
    )


# ---------------------------------------------------------------------------
# Heavy hitters: distributed Misra-Gries candidates + exact recount
# ---------------------------------------------------------------------------

#: Misra-Gries capacity. Guarantee: any token with global frequency
#: > N/HH_K survives *some* partition's summary (averaging argument:
#: if count_p <= n_p/K for every partition p, then summing gives
#: count <= N/K). The candidate union is therefore a superset of the true
#: heavy hitters, and the exact recount removes false positives — so the
#: final answer is EXACT, which is what makes the key oracle-checkable.
HH_K = 50

_HH_ORACLE = f"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'),
                            t -> t <> '')) AS tok
  FROM documents
), counts AS (
  SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
), total AS (
  SELECT SUM(cnt) AS n FROM counts
)
SELECT tok, CAST(cnt AS BIGINT) AS cnt
FROM counts, total
WHERE cnt > n / {HH_K}
"""


@query("agg_heavy_hitters", _HH_ORACLE, tag="sketch")
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items (heavy hitters) over corpus tokens: tokens with
    frequency > N/K (K = ``HH_K``).

    Two-phase plan built for 100 TB: (1) per-partition Misra-Gries with K
    counters inside ``mapInPandas`` — each task emits at most K candidate
    rows no matter how many tokens it saw, so the candidate shuffle is
    #partitions x K rows, not vocabulary-sized; (2) exact recount of the
    (tiny, broadcast) candidate set over the token stream plus one scalar
    total, then the > N/K threshold cut. The MG averaging argument makes
    phase 1 lossless for true heavy hitters, so unlike a sketch estimate the
    output is exact — no approximation leaves the operator.

    Reference parity: arbitrary aggregation surface
    (docs/ScalaSparkCompute-sparkcompute.md:10-12); the sketch tier itself is
    a training-data extension (SURVEY.md §2.D frequency analysis).
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")
        ).alias("tok")
    )

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["tok"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < HH_K:
                    counters[t] = 1
                else:  # decrement-all step, drop zeros
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({"tok": list(counters.keys())})

    candidates = toks.mapInPandas(mg_partition, schema="tok string").distinct()
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    recount = (
        toks.join(F.broadcast(candidates), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        recount.crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.col("n") / HH_K)
        .select("tok", "cnt")
    )


@query("agg_hll_union", tag="sketch")  # rows-only: sketch estimates
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup — the answer to "you cannot sum
    distinct counts": build one HLL sketch of customers per nation
    (``hll_sketch_agg``), then UNION the nation sketches up to region level
    (``hll_union_agg``) and estimate. This is the pre-aggregation pattern
    that makes distinct-count dashboards affordable at 100 TB: the fact
    table is touched once to build |nations| fixed-size sketches; every
    rollup after that merges kilobyte summaries, never re-scans. Rows-only
    (HLL estimates are engine-specific); the <5% relative-error contract vs
    exact distinct counts is pinned in tests/test_operators_misc."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_regionkey")
    )
    per_nation = c.groupBy("c_nationkey").agg(
        F.expr("hll_sketch_agg(c_custkey)").alias("sk")
    )
    return (
        per_nation.join(
            F.broadcast(n), per_nation.c_nationkey == n.n_nationkey
        )
        .groupBy("n_regionkey")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias(
                "approx_customers"
            )
        )
        .select("n_regionkey", F.col("approx_customers").cast("long").alias("approx_customers"))
    )
