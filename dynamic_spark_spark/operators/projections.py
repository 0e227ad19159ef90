"""Projection / filter / predicate operators (SURVEY.md §2.B B5-B7, §2.C).

Reference evidence: null-predicate filter config example
(``ScalaSparkCompute.java:138-141``), map/projection (``ScalaSparkTest.java:123``),
explode (``ScalaSparkTest.java:276-278`` — Spark 2.1's removed ``df.explode``
replicated as ``explode(split(...))``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query(
    "project_select",
    "SELECT c_custkey, upper(c_name) AS name_uc, c_acctbal,"
    " c_acctbal * 1.1 AS bal_adj FROM customer",
    tag="projection",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with aliasing and computed columns (B6)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_uc"),
        "c_acctbal",
        (F.col("c_acctbal") * 1.1).alias("bal_adj"),
    )


@query(
    "filter_pred",
    "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders"
    " WHERE o_totalprice BETWEEN 1000 AND 50000"
    " AND o_orderpriority IN ('1-URGENT', '2-HIGH')"
    " AND o_orderstatus <> 'P'",
    tag="filter",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate filter: comparison + boolean algebra + IN + BETWEEN (B5)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderstatus") != "P")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@query(
    "filter_null",
    "SELECT c_custkey, c_acctbal FROM customer"
    " WHERE c_acctbal IS NOT NULL AND NOT (c_acctbal IS NULL)"
    " AND (c_mktsegment IS NOT DISTINCT FROM c_mktsegment)",
    tag="filter",
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics: IS NULL / null-safe equality ``<=>`` (the reference's
    canonical config example filters ``_.get("gender") == null``,
    ``ScalaSparkCompute.java:138-141``)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_acctbal").isNotNull()
        & ~F.col("c_acctbal").isNull()
        & F.col("c_mktsegment").eqNullSafe(F.col("c_mktsegment"))
    ).select("c_custkey", "c_acctbal")


@query(
    "fn_conditional",
    "SELECT c_custkey,"
    " CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'mid'"
    "      ELSE 'high' END AS tier,"
    " COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg"
    " FROM customer",
    tag="filter",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions: when/otherwise, coalesce, nullif."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg"
        ),
    )


@query(
    "distinct_rows",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tag="filter",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct projection — a shuffle keyed on all columns; at scale prefer
    ``dropDuplicates(subset)`` so the exchange keys stay narrow."""
    return load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "fn_cast",
    "SELECT o_orderkey, CAST(TRUNC(o_totalprice) AS BIGINT) AS price_int,"
    " CAST(o_orderkey AS VARCHAR) AS key_str,"
    " CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str"
    " FROM orders",
    tag="filter",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casting across numeric/string/temporal types. Spark's double→bigint
    cast truncates toward zero while DuckDB's rounds, so the oracle TRUNCs
    explicitly."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
    )


@query(
    "explode_split",
    "SELECT word, COUNT(*) AS cnt FROM ("
    "  SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents"
    ") WHERE word <> '' GROUP BY word",
    tag="projection",
)
def explode_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-style flatten: the reference's wordcount explode
    (``df.explode("body", "word"){line => line.split("\\\\s+")}``,
    ``ScalaSparkTest.java:276-278``) as ``explode(split(...))`` + count."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
