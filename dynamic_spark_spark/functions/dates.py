"""Date/time functions (SURVEY.md §2.C Scalar functions / Date-time).

All sessions run UTC (session.py) so Spark's TZ-aware TIMESTAMP renders
identically to DuckDB's naive timestamps. Cross-engine type traps: DuckDB
``year()``/``datediff`` return BIGINT where Spark returns INT — the oracle
casts to match Spark's types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query(
    "fn_date",
    "SELECT o_orderkey,"
    " CAST(year(o_orderdate) AS INT) AS yr,"
    " CAST(month(o_orderdate) AS INT) AS mo,"
    " CAST(dayofmonth(o_orderdate) AS INT) AS dom,"
    " CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,"
    " CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,"
    " CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)"
    "   AS days_to_eoy,"
    " CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s"
    " FROM orders",
    tag="function",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        # date-typed results rendered ISO: pandas/Arrow represent DATE as
        # midnight timestamps on one engine and datetime.date on the other,
        # so a string projection is the only hash-stable cross-engine shape
        F.date_trunc("month", F.col("o_orderdate")).cast("date").cast("string").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "fn_date_events",
    "SELECT event_id,"
    " CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,"
    " CAST(hour(ts) AS INT) AS hr,"
    " CAST(minute(ts) AS INT) AS mi,"
    " strftime(ts, '%Y-%m-%d') AS day_str"
    " FROM events",
    tag="function",
)
def fn_date_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-day extraction + formatting on the microsecond event timestamps."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("mi"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
    )


@query(
    "fn_sequence_dates",
    "SELECT o_orderkey,"
    " CAST(CAST(unnest(generate_series(CAST(o_orderdate AS DATE),"
    "   CAST(o_orderdate AS DATE) + 6, INTERVAL 1 DAY)) AS DATE) AS VARCHAR)"
    "   AS service_day"
    " FROM orders WHERE o_orderkey % 97 = 0",
    tag="function",
)
def fn_sequence_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-series densification: ``F.sequence`` + ``explode`` turns each
    order row into its 7-day service calendar — the standard idiom for
    joining sparse facts against a dense calendar without a calendar table.
    Map-side only (generator, no shuffle); output size is a static 7× of the
    filtered input, so the fan-out is bounded and predictable at any scale."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    start = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.explode(F.sequence(start, F.date_add(start, 6))).alias("d"),
    ).select(
        "o_orderkey",
        # string projection: the only hash-stable cross-engine date shape
        F.col("d").cast("string").alias("service_day"),
    )


_TZ_ORACLE = """
SELECT event_id,
       CAST(ts + INTERVAL 5 HOUR + INTERVAL 30 MINUTE AS VARCHAR) AS ist,
       CAST(ts - INTERVAL 8 HOUR AS VARCHAR) AS pst_fixed,
       CAST(ts AS VARCHAR) AS utc
FROM events WHERE event_id % 50 = 0
"""


@query("fn_timezone_offset", _TZ_ORACLE, tag="function")
def fn_timezone_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-zone conversion via ``from_utc_timestamp`` with fixed-offset
    zones (+05:30 IST, -08:00 PST-without-DST). Fixed offsets make the
    conversion pure timestamp arithmetic, so the oracle is plain INTERVAL
    addition — engine-exact — while the Spark side still exercises the real
    timezone API (the same code path named zones take; named-zone DST
    rules live in the JVM's tzdb and are deliberately not oracle-compared).
    String-cast output is the only hash-stable cross-engine timestamp
    shape. Map-only; the %50 slice bounds compared rows."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 50 == 0)
    return e.select(
        "event_id",
        F.from_utc_timestamp("ts", "+05:30").cast("string").alias("ist"),
        F.from_utc_timestamp("ts", "-08:00").cast("string").alias("pst_fixed"),
        F.col("ts").cast("string").alias("utc"),
    )
