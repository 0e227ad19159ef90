"""Window functions (SURVEY.md §2.C "Window functions").

Granted to user code by the reference's full-Spark surface
(``ScalaSparkCodeExecutor.java:216-224`` auto-imports; declared capability
``docs/ScalaSparkCompute-sparkcompute.md:5-6``). Each window below carries a
unique tiebreak column so rankings are deterministic across engines.

Scale note: a window spec is one shuffle on its partition keys; chained
windows that share partitioning reuse the exchange. Running sums cast to
DECIMAL inside the frame so segment-tree (DuckDB) vs streaming (Spark)
accumulation orders cannot produce last-ulp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query(
    "win_rank",
    "SELECT o_orderkey, o_orderstatus, o_totalprice,"
    " ROW_NUMBER() OVER w AS rn,"
    " RANK() OVER w AS rnk,"
    " DENSE_RANK() OVER w AS drnk,"
    " NTILE(4) OVER w AS quartile"
    " FROM orders"
    " WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)",
    tag="window",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    "SELECT event_id, user_id, ts, value,"
    " LAG(value) OVER w AS prev_value,"
    " LEAD(value) OVER w AS next_value,"
    " FIRST_VALUE(value) OVER w AS first_value"
    " FROM events"
    " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
    tag="window",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
    )


@query(
    "win_running_sum",
    "SELECT event_id, user_id, ts,"
    " CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER"
    "   (PARTITION BY user_id ORDER BY ts, event_id"
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
    "   AS running_value,"
    " CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER"
    "   (PARTITION BY user_id ORDER BY ts, event_id"
    "    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)"
    "   AS sliding_value_3"
    " FROM events",
    tag="window",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running + sliding frame aggregates (``rowsBetween``)."""
    ev = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.col("value").cast("decimal(28,6)")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(dec)
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.sum(dec)
        .over(base.rowsBetween(-2, Window.currentRow))
        .cast("double")
        .alias("sliding_value_3"),
    )


@query(
    "topk_per_group",
    "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
    "  SELECT o_custkey, o_orderkey, o_totalprice,"
    "  ROW_NUMBER() OVER (PARTITION BY o_custkey"
    "                     ORDER BY o_totalprice DESC, o_orderkey) AS rn"
    "  FROM orders) WHERE rn <= 3",
    tag="sort",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: window rank + filter. Catalyst compiles the
    ``rn <= k`` filter into a two-phase ``WindowGroupLimit`` (Partial before
    the exchange, Final after — visible in PLANS.md): each map task keeps only
    its local top-3 per group before shuffling, so shuffle volume is bounded
    by k·|groups| regardless of fact size — exactly the hand-written
    local-then-global pattern, for free."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "win_distribution",
    "SELECT c_custkey, c_nationkey,"
    " CAST(FLOOR(PERCENT_RANK() OVER w * 1000000) AS BIGINT) AS pr_micro,"
    " CAST(FLOOR(CUME_DIST() OVER w * 1000000) AS BIGINT) AS cd_micro,"
    " NTH_VALUE(c_acctbal, 2) OVER"
    "   (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey"
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_bal"
    " FROM customer"
    " WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)",
    tag="window",
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank, cume_dist, nth_value
    (full-frame). Deterministic ordering via the (c_acctbal, c_custkey)
    tie-break. The distribution values are emitted as FLOOR fixed-point
    micros, not decimal ROUND: ``k/n`` can land exactly on a
    ``x.xxxxxx5`` boundary (e.g. 333/640) where Spark rounds half-up and
    DuckDB half-even — FLOOR over the identical IEEE quotient is
    engine-exact."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.percent_rank().over(w) * 1000000).alias("pr_micro"),
        F.floor(F.cume_dist().over(w) * 1000000).alias("cd_micro"),
        F.nth_value("c_acctbal", 2).over(wf).alias("second_bal"),
    )


@query(
    "win_first_last_ignore_nulls",
    "SELECT event_id, user_id,"
    " first_value(v IGNORE NULLS) OVER w AS first_big,"
    " last_value(v IGNORE NULLS) OVER w AS last_big_so_far"
    " FROM (SELECT event_id, user_id, ts,"
    "       CASE WHEN value >= 50 THEN value END AS v FROM events)"
    " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id"
    "              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
    tag="window",
)
def win_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``first_value``/``last_value`` with IGNORE NULLS over a running
    frame — the 'carry the last known good reading' idiom (sibling of
    ts_gapfill_locf, here as plain window functions on a derived nullable
    measure). One shuffle on user_id, running-frame evaluation is O(1) per
    row."""
    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") >= 50, F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select("event_id", "user_id", "ts", v.alias("v")).select(
        "event_id",
        "user_id",
        F.first("v", ignorenulls=True).over(w).alias("first_big"),
        F.last("v", ignorenulls=True).over(w).alias("last_big_so_far"),
    )


@query(
    "win_range_interval",
    "SELECT o_orderkey, o_custkey,"
    " CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_day,"
    " CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER w AS DOUBLE) AS rev_7d,"
    " COUNT(*) OVER w AS n_7d"
    " FROM orders"
    " WINDOW w AS (PARTITION BY o_custkey"
    "   ORDER BY date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    "   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)",
    tag="window",
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame (``rangeBetween`` on a day number): trailing
    7-day revenue per customer. RANGE frames bound by *value distance*, not
    row count — same-day peer rows all enter the frame, and gaps in the
    calendar shrink it — which ROWS frames cannot express. One shuffle on
    o_custkey; the frame is evaluated with a sliding two-pointer pass per
    partition, O(1) amortized per row, no per-row rescans. Decimal
    accumulation keeps the sum order-independent (fp addition is not
    associative); cast back to double only for the final projection.
    Reference parity: windowed aggs are part of the delegated Spark surface
    (docs/ScalaSparkCompute-sparkcompute.md:10-12)."""
    o = load_table(spark, sf_dir, "orders")
    day_no = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    )
    w = Window.partitionBy("o_custkey").orderBy(day_no).rangeBetween(-6, 0)
    dec = F.col("o_totalprice").cast("decimal(28,2)")
    return o.select(
        "o_orderkey",
        "o_custkey",
        # string projection: the only hash-stable cross-engine date shape
        F.col("o_orderdate").cast("date").cast("string").alias("order_day"),
        F.sum(dec).over(w).cast("double").alias("rev_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )
