"""Set operations (SURVEY.md §2.C "Set operations").

Spark 2.1's ``unionAll`` (bag) maps to ``union`` in 3.x/4.x — bag semantics
retained (SURVEY §7 semantics-delta note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query(
    "set_union",
    "SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer"
    " UNION ALL"
    " SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier",
    tag="setop",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (``unionAll``); ``unionByName`` exercised in unit tests."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return c.unionAll(s)


@query(
    "set_intersect",
    "SELECT c_nationkey AS nationkey FROM customer"
    " INTERSECT"
    " SELECT s_nationkey AS nationkey FROM supplier",
    tag="setop",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — nation keys having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    "SELECT c_nationkey AS nationkey FROM customer"
    " EXCEPT"
    " SELECT s_nationkey AS nationkey FROM supplier",
    tag="setop",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — nation keys with customers but no suppliers.
    ``subtract`` is Spark's distinct EXCEPT; ``exceptAll`` (bag) is covered in
    unit tests."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "set_except_all",
    "SELECT o_orderpriority FROM orders WHERE o_orderstatus <> 'F'"
    " EXCEPT ALL"
    " SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'",
    tag="setop",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (``exceptAll``): multiset difference keeps
    surplus multiplicity — the form that survives re-aggregation, unlike
    distinct EXCEPT."""
    o = load_table(spark, sf_dir, "orders")
    left = o.where(F.col("o_orderstatus") != "F").select("o_orderpriority")
    right = o.where(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return left.exceptAll(right)


@query(
    "set_intersect_all",
    "SELECT o_orderpriority FROM orders WHERE o_orderstatus <> 'F'"
    " INTERSECT ALL"
    " SELECT o_orderpriority FROM orders WHERE o_orderstatus <> 'O'",
    tag="setop",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (``intersectAll``): min-multiplicity
    intersection."""
    o = load_table(spark, sf_dir, "orders")
    left = o.where(F.col("o_orderstatus") != "F").select("o_orderpriority")
    right = o.where(F.col("o_orderstatus") != "O").select("o_orderpriority")
    return left.intersectAll(right)
