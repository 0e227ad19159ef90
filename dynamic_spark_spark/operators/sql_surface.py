"""Modern SQL-surface parity keys (SURVEY.md §2.C SQL-on-view row, extended).

The reference's SQL entry point is ``registerTempTable`` + ``sqlContext.sql``
(``ScalaSparkTest.java:279-280``); beyond the classic SELECT shape a current
engine is expected to expose the newer SQL ergonomics users actually write:

- ``sql_parameterized``  — named-parameter SQL (``spark.sql(text, args=...)``)
  — the injection-safe templating API (the reference templated via ``${...}``
  macro substitution, ``plans/spec.py``; this is the engine-level analog).
- ``sql_tvf_range``      — table-valued function in FROM (``range(...)``):
  generate data relationally, no driver-side list.
- ``sql_group_by_all``   — ``GROUP BY ALL`` sugar: identical SQL text runs on
  Spark and the oracle engine.
- ``set_union_by_name``  — positional-blind union (``unionByName``): schema
  evolution across branches resolved by column NAME, the union users want
  when two pipelines emit the same columns in different orders.

All four are thin by construction — the point is API-surface proof with exact
oracle hashes, not new plan shapes (each compiles to scans/aggregates already
pinned elsewhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table, register_views

_PARAM_SQL_SPARK = """
SELECT o_orderpriority, COUNT(*) AS n, SUM(CAST(round(o_totalprice * 100, 0)
       AS BIGINT)) AS total_cents
FROM orders
WHERE o_orderstatus = :status AND o_totalprice >= :minprice
GROUP BY o_orderpriority
"""

_PARAM_STATUS = "F"
_PARAM_MINPRICE = 50_000.0

_PARAM_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderstatus = '{_PARAM_STATUS}' AND o_totalprice >= {_PARAM_MINPRICE}
GROUP BY o_orderpriority
"""


@query("sql_parameterized", _PARAM_ORACLE, tag="scan")
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL: the statement text carries ``:status`` /
    ``:minprice`` markers and values bind at execution — no string
    interpolation, no injection surface, plan-cacheable by text. Catalyst
    folds the bound literals before optimization, so pushdown still sees
    concrete predicates."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        _PARAM_SQL_SPARK,
        args={"status": _PARAM_STATUS, "minprice": _PARAM_MINPRICE},
    )


_TVF_SQL = """
SELECT id % 7 AS bucket, COUNT(*) AS n, CAST(SUM(id * id) AS BIGINT) AS sum_sq
FROM range(0, 10000) AS t(id)
GROUP BY id % 7
"""


@query("sql_tvf_range", _TVF_SQL, tag="scan")
def sql_tvf_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-valued function in FROM: ``range(0, 10000)`` generates rows
    relationally (distributed, no driver-side materialized list — Spark
    splits the range across partitions). Same SQL text runs on the oracle
    verbatim."""
    return spark.sql(_TVF_SQL)


_GBA_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY ALL
"""


@query("sql_group_by_all", _GBA_SQL, tag="scan")
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL``: every non-aggregate select item becomes a grouping
    key — the de-facto-standard sugar (Spark 3.4+, DuckDB, Snowflake).
    Identical statement text on both engines."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_GBA_SQL)


_UBN_ORACLE = """
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
"""


@query("set_union_by_name", _UBN_ORACLE, tag="setop")
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union resolved by column NAME, not position: the two branches emit
    the same columns in *different orders* and ``unionByName`` aligns them —
    a positional ``unionAll`` here would scramble keys into the status
    column. The schema-evolution-safe union for multi-pipeline merges."""
    o = load_table(spark, sf_dir, "orders")
    left = o.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderstatus"
    )
    right = o.where(F.col("o_orderstatus") == "F").select(
        "o_orderstatus", "o_orderkey"
    )
    return left.unionByName(right)


_PIVOT_SQL_SPARK = """
SELECT * FROM (SELECT o_orderstatus, o_orderpriority,
                      CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
               FROM orders)
PIVOT (SUM(cents) AS s, COUNT(*) AS n
       FOR o_orderpriority IN ('1-URGENT' AS urgent, '5-LOW' AS low))
"""

_PIVOT_ORACLE = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) END)
         AS BIGINT) AS urgent_s,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
         AS urgent_n,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) END)
         AS BIGINT) AS low_s,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT)
         AS low_n
FROM orders GROUP BY o_orderstatus
"""


@query("sql_pivot_stmt", _PIVOT_ORACLE, tag="scan")
def sql_pivot_stmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``PIVOT`` clause (multi-aggregate, aliased pivot columns) — the
    statement-level form of ``groupBy().pivot()`` (``agg_pivot`` /
    ``stat_crosstab`` are the DataFrame twins). The IN list is literal, so
    like the DataFrame path with explicit values there is NO hidden
    domain-discovery scan and the output schema is static. Compiles to the
    same single-shuffle conditional aggregation the oracle spells out with
    FILTER/CASE."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_PIVOT_SQL_SPARK)


_UNPIVOT_SQL_SPARK = """
SELECT n_nationkey, metric, val
FROM (SELECT n_nationkey, CAST(n_regionkey AS BIGINT) AS region_key,
             CAST(length(n_name) AS BIGINT) AS name_len
      FROM nation)
UNPIVOT (val FOR metric IN (region_key, name_len))
"""

_UNPIVOT_ORACLE = """
SELECT n_nationkey, 'region_key' AS metric, CAST(n_regionkey AS BIGINT) AS val
FROM nation
UNION ALL
SELECT n_nationkey, 'name_len', CAST(length(n_name) AS BIGINT)
FROM nation
"""


@query("sql_unpivot_stmt", _UNPIVOT_ORACLE, tag="reshape")
def sql_unpivot_stmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``UNPIVOT`` clause — wide-to-long at the statement level
    (``reshape_unpivot`` is the DataFrame ``melt`` twin). Pure map-side
    fan-out (k output rows per input row, no shuffle); the oracle spells the
    same reshape as a UNION ALL of per-metric projections."""
    register_views(spark, sf_dir, ("nation",))
    return spark.sql(_UNPIVOT_SQL_SPARK)
