"""Sorts / limits (SURVEY.md §2.C "Sorts / limits / top-k").

Scale note: ``orderBy`` is a range-partitioned global sort (sampling pass +
shuffle); ``limit`` after ``orderBy`` collapses to TakeOrderedAndProject —
per-partition top-N then a single merge, no global sort materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query(
    "sort_multi",
    "SELECT c_custkey, c_mktsegment, c_acctbal FROM customer"
    " ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey",
    tag="sort",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with explicit null ordering (Spark's asc default
    is NULLS FIRST like DuckDB's default — made explicit anyway)."""
    c = load_table(spark, sf_dir, "customer")
    return c.orderBy(
        F.col("c_mktsegment").asc_nulls_first(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey"),
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


@query(
    "limit_n",
    "SELECT o_orderkey, o_totalprice FROM orders"
    " ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    tag="sort",
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic limit (ordered): plans as TakeOrderedAndProject."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@query(
    "sort_within_partitions",
    # the operator changes physical layout, never the row multiset — the
    # order-insensitive hash compare proves values survive the reshuffle
    "SELECT * FROM orders",
    tag="sort",
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local sort — no global exchange; the write-side pattern for
    producing clustered parquet files."""
    o = load_table(spark, sf_dir, "orders")
    return o.repartition(8, "o_custkey").sortWithinPartitions("o_custkey", "o_orderdate")
