"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``dynamic_spark_spark`` package; this module is
the thin adapter (the analog of the reference's program entry resolution,
``ScalaSparkProgram.java:108-141``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dynamic_spark_spark import registry
from dynamic_spark_spark.session import tune

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    tune(spark)
    registry.load_all_queries()
    return registry.QUERIES["agg_groupby_multi"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.load_all_queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-comparable query key, in the
    same verification-priority order as ``queries()``."""
    registry.load_all_queries()
    order = registry.verification_order(list(registry.ORACLE))
    return {k: registry.ORACLE[k] for k in order}
