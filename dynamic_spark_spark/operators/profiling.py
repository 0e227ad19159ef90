"""Data-quality and profiling operators: column profiles, constraint
checks, referential-integrity audits, and a rule-classifier confusion
matrix — the validation layer a pipeline runs before (and after) every
large transform.

Extends the reference's schema-compat validation (the deploy-time
``configurePipeline`` schema checks, ``docs/ScalaSparkCompute-sparkcompute.md``)
from schema-level to data-level: the same "fail fast, fail loud" posture
applied to the rows themselves.

Scale shape shared by every key here: each check is a single aggregation
pass with map-side partials (counts, min/max), so profiling 100 TB costs one
scan — checks are NEVER per-rule scans. Rule outputs are unioned as rows,
not columns, so adding a rule doesn't change the schema.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate"]

_PROFILE_ORACLE = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,"
    f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,"
    f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,"
    f" CAST(MIN({c}) AS VARCHAR) AS min_val,"
    f" CAST(MAX({c}) AS VARCHAR) AS max_val"
    f" FROM orders"
    for c in _PROFILE_COLS
)


@query("profile_columns", _PROFILE_ORACLE, tag="quality")
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null count, exact distinct count, min/max) for a
    set of columns, output long-form (one row per column).

    The distinct counts force one aggregation per column, but all profiled
    columns ride the SAME single scan (Spark plans the union's branches over
    a shared relation; at extreme scale switch exact COUNT DISTINCT to
    ``approx_count_distinct`` and the whole profile collapses to one
    pass). Min/max stringified so heterogeneous column types share one
    output schema."""
    o = load_table(spark, sf_dir, "orders")
    profiles = [
        o.agg(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_val"),
            F.max(c).cast("string").alias("max_val"),
        )
        for c in _PROFILE_COLS
    ]
    return reduce(DataFrame.unionAll, profiles)


_RANGE_ORACLE = """
SELECT 'lineitem.discount_in_0_1' AS rule,
       CAST(COUNT(*) FILTER (l_discount < 0 OR l_discount > 1) AS BIGINT)
         AS n_violations, CAST(COUNT(*) AS BIGINT) AS n_checked
FROM lineitem
UNION ALL
SELECT 'lineitem.quantity_positive',
       CAST(COUNT(*) FILTER (l_quantity <= 0) AS BIGINT), CAST(COUNT(*) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem.tax_in_0_1',
       CAST(COUNT(*) FILTER (l_tax < 0 OR l_tax > 1) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders.totalprice_positive',
       CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT), CAST(COUNT(*) AS BIGINT)
FROM orders
"""


@query("quality_range_checks", _RANGE_ORACLE, tag="quality")
def quality_range_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative row-constraint audit: each rule is a conditional count
    (``count_if``), all lineitem rules fused into aggregates over one scan —
    a violation report costs one pass however many rules are registered."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def rule(df: DataFrame, name: str, bad) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.count_if(bad).alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )

    return reduce(
        DataFrame.unionAll,
        [
            rule(li, "lineitem.discount_in_0_1",
                 (F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            rule(li, "lineitem.quantity_positive", F.col("l_quantity") <= 0),
            rule(li, "lineitem.tax_in_0_1",
                 (F.col("l_tax") < 0) | (F.col("l_tax") > 1)),
            rule(o, "orders.totalprice_positive", F.col("o_totalprice") <= 0),
        ],
    )


_FK_ORACLE = """
SELECT 'orders.custkey->customer' AS fk,
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
         AS n_orphans
UNION ALL
SELECT 'lineitem.orderkey->orders',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
UNION ALL
SELECT 'lineitem.partkey->part',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
"""


@query("quality_fk_orphans", _FK_ORACLE, tag="quality")
def quality_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts per declared foreign key,
    each a LEFT ANTI join (the natural 'NOT EXISTS' physical shape —
    broadcast when the parent's key column fits, shuffled hash otherwise;
    never a subquery-per-row). A healthy warehouse reports zeros — the
    zeros are the point, this is the check that catches a bad backfill."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")

    def orphans(child: DataFrame, ck: str, parent: DataFrame, pk: str, name: str) -> DataFrame:
        return (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )

    return reduce(
        DataFrame.unionAll,
        [
            orphans(o, "o_custkey", c, "c_custkey", "orders.custkey->customer"),
            orphans(li, "l_orderkey", o, "o_orderkey", "lineitem.orderkey->orders"),
            orphans(li, "l_partkey", p, "p_partkey", "lineitem.partkey->part"),
        ],
    )


_CONFUSION_ORACLE = """
SELECT label,
       CAST(abs(CAST(FLOOR(embedding[1] * 100) AS BIGINT)) % 10 AS INT) AS pred,
       CAST(COUNT(*) AS BIGINT) AS n
FROM embeddings GROUP BY 1, 2
"""


@query("ml_confusion_matrix", _CONFUSION_ORACLE, tag="ml")
def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix (long form) between the stored label and a
    deterministic rule classifier over the embedding — the evaluation
    aggregate every model-QA pipeline ends with. One shuffle on the
    (label, pred) pair; at scale the matrix is |classes|² rows regardless
    of input size. (The rule stands in for a model score column so the
    key stays oracle-checkable; ``ml_train_predict`` covers real Spark-ML
    inference as rows-only.)"""
    e = load_table(spark, sf_dir, "embeddings")
    pred = (
        F.abs(F.floor(F.element_at("embedding", 1) * 100).cast("long")) % 10
    ).cast("int")
    return e.groupBy("label", pred.alias("pred")).agg(
        F.count(F.lit(1)).alias("n")
    )


_WINSOR_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
), bounds AS (
  SELECT l_returnflag,
         MAX(CASE WHEN rn = CAST(CEIL(n * 0.05) AS BIGINT)
                  THEN l_extendedprice END) AS lo,
         MAX(CASE WHEN rn = CAST(CEIL(n * 0.95) AS BIGINT)
                  THEN l_extendedprice END) AS hi
  FROM ranked GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
       ROUND(AVG(LEAST(GREATEST(l_extendedprice, lo), hi)), 4) AS winsor_mean
FROM lineitem l JOIN bounds b USING (l_returnflag)
GROUP BY l.l_returnflag
"""


@query("agg_winsorize", _WINSOR_ORACLE, tag="profiling")
def agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-capped) group statistics: clamp each price to its
    group's [p05, p95] band, then aggregate — the robust-mean preprocessing
    step feature pipelines run before standardization. Two passes over the
    fact: a per-group window sort to rank-select the bounds (tiny result,
    broadcast back), then a clamp + map-partial aggregate — the bounds pass
    costs one sort shuffle, the price of engine-exact discrete quantiles;
    a production run trading exactness for speed would swap in
    ``percentile_approx`` (see ``agg_percentile_approx``) and skip the
    sort. The bounds are DISCRETE (type-1) quantiles
    — the actual element at rank ceil(p*n) — not interpolated ones: Spark
    interpolates percentiles as (1-f)*a + f*b while DuckDB computes
    a + f*(b-a), formulas that disagree by 1 ulp on real data, and a
    1-ulp gap survives any decimal rounding when it straddles the rounding
    boundary. A rank-selected element is a value read from parquet —
    bit-identical in both engines by construction."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bounds = ranked.groupBy("l_returnflag").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.05).cast("long"),
                F.col("l_extendedprice"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.95).cast("long"),
                F.col("l_extendedprice"),
            )
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    out_of_band = (F.col("l_extendedprice") < F.col("lo")) | (
        F.col("l_extendedprice") > F.col("hi")
    )
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(out_of_band.cast("bigint")).alias("n_clamped"),
            F.round(F.avg(clamped), 4).alias("winsor_mean"),
        )
    )
