"""Subquery forms (SURVEY.md §4.2 "Subquery handling / decorrelation").

Delegated wholesale by the reference ("full access to all Spark features");
natively these exercise Catalyst's subquery rewrite rules: scalar subqueries
become joins, IN-subqueries become semi joins, correlated predicates
decorrelate — no per-row re-execution anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import register_views

_SCALAR_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
"""


@query("subquery_scalar", _SCALAR_SQL, tag="subquery")
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — planned as a one-row broadcast, the
    fact scan stays a single pass."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_SCALAR_SQL)


_CORRELATED_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
"""


@query("subquery_correlated", _CORRELATED_SQL, tag="subquery")
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates to an aggregate +
    join on the correlation key (one shuffle, no nested-loop re-execution)."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_CORRELATED_SQL)


_IN_SQL = """
SELECT p_partkey, p_name
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
"""


@query("subquery_in", _IN_SQL, tag="subquery")
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — planned as a left semi join."""
    register_views(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(_IN_SQL)


_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) t
"""


@query("join_lateral", _LATERAL_SQL, tag="subquery")
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table (SQL:1999 / Spark 4 LATERAL
    subquery): top-2 customers per nation, expressed as a per-row dependent
    subquery. Catalyst decorrelates the LIMIT-per-group into a window
    rank + filter (DomainJoin rewrite) — no nested-loop re-execution per
    nation row; identical oracle text runs on DuckDB's LATERAL."""
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_LATERAL_SQL)
