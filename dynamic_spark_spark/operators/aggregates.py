"""Aggregation operators (SURVEY.md §2.B B8-B9, §2.C "Aggregations").

The reference demonstrates group-by aggregation via SQL
(``SELECT word, count(*) FROM splitted GROUP BY word``,
``ScalaSparkTest.java:280``) and RDD ``reduceByKey`` (``:126,297``), and
declares the full Spark agg surface (``docs/ScalaSparkCompute-sparkcompute.md:5-6``).
Here each form is a native ``groupBy().agg()`` — Tungsten hash aggregation with
automatic partial (map-side) aggregation, the scalable replacement for
``reduceByKey``. At 100 TB the partial-agg + AQE-coalesced exchange is the
right shape: one shuffle keyed by the group columns, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.functions.deterministic import (
    davg,
    dsum,
    dsum_wide,
    o_davg,
    o_dsum,
    o_dsum_wide,
)
from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan → filter → hash-agg → sort).
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {o_dsum('l_quantity')} AS sum_qty,
  {o_dsum('l_extendedprice')} AS sum_base_price,
  {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {o_davg('l_quantity')} AS avg_qty,
  {o_davg('l_extendedprice')} AS avg_price,
  {o_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query: filter → groupBy → multi-agg over the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


query("agg_groupby_multi", _FLAGSHIP_ORACLE, tag="aggregate")(pricing_summary)


@query(
    "agg_groupby_count",
    "SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders GROUP BY o_orderpriority",
    tag="aggregate",
)
def agg_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash group-by count (reference SQL GROUP BY, ``ScalaSparkTest.java:280``)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "agg_global",
    f"SELECT COUNT(*) AS n, {o_dsum('o_totalprice')} AS total,"
    " MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key FROM orders",
    tag="aggregate",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-key) reduce — analog of RDD ``.reduce(_ + _)``
    (``ScalaSparkTest.java:190``) as a declarative aggregate."""
    return load_table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "agg_distinct",
    "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,"
    " COUNT(DISTINCT o_orderpriority) AS n_prio FROM orders GROUP BY o_orderstatus",
    tag="aggregate",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.countDistinct("o_orderpriority").alias("n_prio"),
        )
    )


@query("agg_approx_distinct", tag="aggregate")  # rows-only: HLL++ is engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++). No oracle: sketch estimates
    are engine-specific; the driver records a rows-only check."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey").alias("approx_orders"))
    )


@query(
    "agg_rollup",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n,"
    f" {o_dsum('l_quantity')} AS sum_qty"
    " FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
    tag="aggregate",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty"))
    )


@query(
    "agg_cube",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n"
    " FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)",
    tag="aggregate",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_stats",
    "SELECT l_returnflag,"
    " ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,"
    " ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,"
    " ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,"
    " ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price"
    " FROM lineitem GROUP BY l_returnflag",
    tag="aggregate",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. Rounded: streaming-moment accumulation order
    differs across engines, so agreement is only to ~1e-10 relative."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
    )


@query(
    "agg_percentile",
    "SELECT l_linestatus,"
    " ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,"
    " ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90"
    " FROM lineitem GROUP BY l_linestatus",
    tag="aggregate",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). ``percentile_approx`` stays available for the 100 TB
    path where a single-pass sketch is preferable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
    )


@query(
    "agg_collect",
    "SELECT n_regionkey,"
    " array_to_string(list_sort(list(n_name)), '|') AS names"
    " FROM nation GROUP BY n_regionkey",
    tag="aggregate",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list, sorted for order-determinism and joined to a string so
    the compared frame is scalar-typed (r1 driver harness could not
    canonicalize raw array columns; ``agg_collect_array`` exercises the
    array-typed intermediate and flattens the same way)."""
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("names"))
    )


@query(
    "agg_collect_array",
    "SELECT n_regionkey,"
    " CAST(len(list(n_name)) AS BIGINT) AS n_names,"
    " array_to_string(list_sort(list(n_name)), '|') AS names_joined"
    " FROM nation GROUP BY n_regionkey",
    tag="aggregate",
)
def agg_collect_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list in its native array form, exercised through genuine
    array-typed intermediate state (``sort_array`` over the collected
    array), then flattened to scalar outputs for the driver harness — array
    columns are outside its pandas canonicalizer (the r1 ``agg_collect``
    lesson, re-learned on the r4 multimodal keys). Size + ordered join
    pin both the cardinality and the exact element sequence."""
    arr = (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.sort_array(F.collect_list("n_name")).alias("names"))
    )
    return arr.select(
        "n_regionkey",
        F.size("names").cast("long").alias("n_names"),
        F.array_join("names", "|").alias("names_joined"),
    )


_GROUPING_SETS_SQL = (
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem"
    " GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
)


@query("agg_grouping_sets", _GROUPING_SETS_SQL, tag="aggregate")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL entry point (same ANSI text both
    engines)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "agg_pivot",
    "SELECT o_orderpriority,"
    " COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f,"
    " COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o,"
    " COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p"
    " FROM orders GROUP BY o_orderpriority",
    tag="aggregate",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — the explicit list avoids the extra
    distinct-values job, which matters at scale. Missing cells filled with 0
    to match relational COUNT FILTER semantics."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"F": "f", "O": "o", "P": "p"})
        .na.fill(0, ["f", "o", "p"])
    )


@query(
    "agg_mode_median",
    "SELECT m.med_qty, mo.mode_prio FROM"
    " (SELECT median(l_quantity) AS med_qty FROM lineitem) m CROSS JOIN"
    " (SELECT o_orderpriority AS mode_prio FROM"
    "   (SELECT o_orderpriority, COUNT(*) AS c FROM orders"
    "    GROUP BY 1 ORDER BY c DESC, o_orderpriority LIMIT 1)) mo",
    tag="aggregate",
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median and deterministic mode (``F.median``; ``F.mode`` with
    ``deterministic=True`` breaks ties toward the lowest value, which the
    oracle reproduces with an explicit count-then-order form since DuckDB's
    ``mode()`` tie-break is unspecified)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    med = li.agg(F.median("l_quantity").alias("med_qty"))
    mode = orders.agg(F.mode("o_orderpriority", True).alias("mode_prio"))
    return med.crossJoin(mode)


@query("agg_hll_sketch", tag="aggregate")  # rows-only: sketch bytes are engine-specific
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL, built in
    as ``hll_sketch_agg``/``hll_union_agg``): per-group sketches merge into a
    global estimate WITHOUT rescanning — the re-aggregatable form that makes
    distinct counts work in rollups and streaming at 100 TB (exact distinct
    cannot merge). Emits per-status estimates plus the union estimate."""
    orders = load_table(spark, sf_dir, "orders")
    per_group = orders.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    merged = per_group.agg(
        F.lit("ALL").alias("o_orderstatus"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    )
    return per_group.select(
        "o_orderstatus",
        F.hll_sketch_estimate("sk").alias("n_distinct_est"),
        "n_rows",
    ).unionByName(merged)


@query(
    "agg_bool",
    "SELECT o_orderpriority,"
    " bool_and(o_totalprice > 1000) AS all_over_1k,"
    " bool_or(o_orderstatus = 'F') AS any_f,"
    " CAST(COUNT(CASE WHEN o_totalprice > 150000 THEN 1 END) AS BIGINT)"
    "   AS n_big"
    " FROM orders GROUP BY o_orderpriority",
    tag="aggregate",
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (``bool_and``/``bool_or``) + conditional count."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_f"),
        F.count(F.when(F.col("o_totalprice") > 150000, 1)).alias("n_big"),
    )


_HIST_ORACLE = f"""
SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       {o_dsum('l_extendedprice')} AS total
FROM lineitem
GROUP BY bucket
ORDER BY bucket
"""


@query("agg_histogram", _HIST_ORACLE, tag="aggregate")
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram by arithmetic bucketing (no ``width_bucket``
    dependency — ``floor(x/step)`` is engine-portable and codegen-friendly).
    The bucket key is computed map-side, so the histogram is one partial+final
    hash agg at any scale; bucket count is bounded by the value range, not
    the row count."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000.0).cast("long")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "total"))
        .orderBy("bucket")
    )


# Regression aggregates from EXACT sums: engine-native corr()/regr_slope()
# accumulate floats in engine-specific order (hash-mismatch), so the five
# sufficient statistics are taken as exact DECIMAL sums and the identical
# rational expressions are evaluated on both engines — bit-equal doubles.
_REGR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
       ROUND((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_xy
FROM s
"""


@query("agg_regression", _REGR_ORACLE, tag="aggregate")
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope/intercept and Pearson correlation per group,
    computed from the five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    taken as EXACT decimal sums — one shuffle with full map-side partial
    aggregation, and unlike the engine-native ``corr``/``regr_*`` the result
    is order-independent, so it oracle-checks exactly. This is also the
    100 TB form: sums compose across partitions, where a per-partition
    Pearson would not."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(18,6)"
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast(dec)).cast("double").alias("sx"),
        F.sum(y.cast(dec)).cast("double").alias("sy"),
        F.sum((x * y).cast(dec)).cast("double").alias("sxy"),
        F.sum((x * x).cast(dec)).cast("double").alias("sxx"),
        F.sum((y * y).cast(dec)).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
        ).alias("corr_xy"),
    )


@query(
    "agg_weighted_avg",
    "SELECT l_returnflag,"
    f" ROUND({o_dsum_wide('l_extendedprice * l_quantity')} / SUM(l_quantity), 6)"
    "   AS qty_weighted_price,"
    f" ROUND({o_dsum_wide('l_extendedprice * (1 - l_discount)')} /"
    f"       {o_dsum('1 - l_discount')}, 6) AS disc_weighted_price"
    " FROM lineitem GROUP BY l_returnflag",
    tag="aggregate",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted means as ratio-of-sums aggregates — both numerator and
    denominator are map-side-combinable SUMs, so the weighted average costs
    exactly one shuffle (no second pass, no window).

    The NUMERATORS sum a product expression (price · qty is ~50× a bare
    price per row), which shrinks the scaled-int64 ``dsum`` envelope from
    ~sf1000 to ~sf10 — the round-6 100× probe crashed it with
    ARITHMETIC_OVERFLOW at 60M rows (ANSI mode; non-ANSI would have
    wrapped SILENTLY). Numerators therefore use the hi/lo two-long
    ``dsum_wide`` path (exact and order-independent to ~500 TB for this
    expression, at plain-sum speed — the DECIMAL accumulator alternative
    measured 6× slower at 600M rows); the denominator sums values ≤ 1
    and stays on the single-int64 fast path."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            dsum_wide(F.col("l_extendedprice") * F.col("l_quantity"), "_num_q")
            / F.sum("l_quantity"),
            6,
        ).alias("qty_weighted_price"),
        F.round(
            dsum_wide(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "_num_d"
            )
            / dsum(1 - F.col("l_discount"), "_den_d"),
            6,
        ).alias("disc_weighted_price"),
    )


@query("agg_percentile_approx", tag="aggregate")  # rows-only: sketch estimate
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via ``percentile_approx`` (KLL-style
    mergeable quantile sketch, accuracy=1000 → rank error <= 1/1000 of the
    group) — the sketch tier of ``agg_percentile``: at 100 TB the exact
    interpolated percentile needs a per-group sort, while the sketch is a
    bounded-size mergeable summary that rides normal partial aggregation.
    Rows-only by contract (a sketch estimate has no SQL-exact oracle);
    tests/test_operators_misc pins the rank-error contract against the
    exact percentiles."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.9, 1000).alias("p90_approx"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("p99_approx"),
    )


_TOPK_ORACLE = """
SELECT o_orderpriority AS item, COUNT(*) AS est_count
FROM orders GROUP BY o_orderpriority
"""


@query("agg_approx_top_k", _TOPK_ORACLE, tag="aggregate")
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based frequent-items top-K (``approx_top_k``, Spark 4): one
    pass, mergeable per-partition sketches, no exact group-by shuffle — the
    heavy-hitter primitive for high-cardinality columns where an exact count
    would shuffle the world (the exact twin is ``agg_heavy_hitters``).
    Oracle-checkable because K (5) covers the column's full cardinality and
    the default 10k tracked items exceed it, making the sketch counts exact
    here; at real cardinality the key's contract degrades to the sketch's
    frequency guarantee (pinned in tests for CMS, same family)."""
    o = load_table(spark, sf_dir, "orders")
    topk = o.agg(F.expr("approx_top_k(o_orderpriority, 5)").alias("tk"))
    return topk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"),
        F.col("e.count").cast("long").alias("est_count"),
    )


_LISTAGG_ORACLE = """
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
         AS priorities,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
"""


@query("agg_listagg", _LISTAGG_ORACLE, tag="aggregate")
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``LISTAGG(DISTINCT ... ) WITHIN GROUP (ORDER BY ...)`` (Spark
    4): ordered string aggregation — the standard's spelling of the
    collect-and-join idiom ``agg_collect`` builds by hand. DISTINCT + the
    WITHIN GROUP order make the concatenation deterministic, so the key is
    hash-checked (a bare LISTAGG would concatenate in partition arrival
    order — never oracle-safe distributed)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_la")
    return spark.sql(
        "SELECT o_orderstatus,"
        " listagg(DISTINCT o_orderpriority, '|')"
        "   WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,"
        " COUNT(*) AS n"
        " FROM orders_la GROUP BY o_orderstatus"
    )


_PCT_EXACT_POINTS = (25, 50, 75, 95)

_PCT_EXACT_ORACLE = f"""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       {", ".join(
         f"MAX(CASE WHEN rn = CAST(CEIL(n * 0.{p:02d}) AS BIGINT)"
         f" THEN l_extendedprice END) AS p{p}"
         for p in _PCT_EXACT_POINTS)}
FROM ranked GROUP BY l_returnflag
"""


@query("agg_percentile_exact", _PCT_EXACT_ORACLE, tag="aggregate")
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete (type-1) quantiles per group — the element at rank
    ``ceil(p·n)`` — complementing the sketch tier (``agg_percentile``,
    ``agg_percentile_approx``) when the report must be reproducible to the
    bit: a rank-selected value is read from storage, so any engine returns
    the identical number, while interpolated percentiles differ by an ulp
    across engines and approx sketches by design.

    Plan: aggregate-then-rank. The value at rank ``ceil(p·n)`` in the
    sorted multiset is the smallest value whose cumulative count reaches
    the rank, so the per-group sort only needs the (group, value) COUNT
    table, not the rows — duplicates collapse in the map-side partial agg
    and the window's input is bounded by the value domain (price cents),
    not the row count. The previous shape windowed the full fact table by
    ``l_returnflag`` — a 3-value partition key, so 3-way parallelism and a
    20M-row sort per partition at the 100× probe (5.3 → 75.9 s, 14.2× for
    10× rows); this shape is 3 small exchanges past the one real shuffle."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = counts.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    # smallest value whose cumulative count reaches rank ceil(p·n) ==
    # the element at that rank in the sorted multiset (type-1 quantile)
    return ranked.groupBy("l_returnflag").agg(
        *[
            F.min(
                F.when(
                    F.col("cum")
                    >= F.ceil(F.col("n") * (p / 100.0)).cast("long"),
                    F.col("l_extendedprice"),
                )
            ).alias(f"p{p}")
            for p in _PCT_EXACT_POINTS
        ]
    )


_BITMAP_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS grp,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct
FROM customer GROUP BY c_nationkey
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
FROM customer
"""


@query("agg_bitmap_distinct", _BITMAP_ORACLE, tag="aggregate")
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via Spark 4 bitmap aggregates
    (``bitmap_bucket_number`` / ``bitmap_construct_agg`` / ``bitmap_count``
    / ``bitmap_or_agg``): keys are partitioned into 32768-bit buckets, each
    bucket aggregates to one bitmap BLOB, and counts come from popcount.

    This is the mergeable-exact tier between plain ``COUNT(DISTINCT)``
    (exact, but re-shuffles raw keys on every query) and HLL sketches
    (mergeable, but approximate — ``agg_hll_union``): bitmap state is
    ~4 KiB per bucket regardless of row count, and the SAME per-group
    bitmaps roll up to the global count via ``bitmap_or_agg`` without
    touching raw keys again — demonstrated here by computing the global row
    FROM the per-nation bucket bitmaps, exactly how a 100 TB pipeline
    maintains pre-aggregated distinct-count cubes."""
    c = load_table(spark, sf_dir, "customer")
    buckets = (
        c.select(
            F.col("c_nationkey").cast("bigint").alias("grp"),
            F.expr("bitmap_bucket_number(c_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(c_custkey)").alias("pos"),
        )
        .groupBy("grp", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    per_group = buckets.groupBy("grp").agg(
        F.expr("sum(bitmap_count(bm))").alias("n_distinct")
    )
    merged = (
        buckets.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.expr("sum(bitmap_count(bm))").alias("n_distinct"))
        .select(F.lit(-1).cast("bigint").alias("grp"), "n_distinct")
    )
    return per_group.unionByName(merged)
