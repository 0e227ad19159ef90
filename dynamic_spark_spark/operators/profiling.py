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


# ---------------------------------------------------------------------------
# ML evaluation family: exact ROC / AUC / calibration (round-2 fourth wave)
# ---------------------------------------------------------------------------

# Deterministic stand-ins so the metrics are oracle-checkable: the "score"
# is the first embedding component (fixed data, no model RNG) and the
# "positive" class is odd labels. Swap in a real model-score column and the
# plans are unchanged.
_ROC_BUCKET = 250_000  # score_micro bucket width for the distributed prefix sum

_ROC_ORACLE = """
WITH s AS (
  SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS score_micro,
         CAST(label % 2 AS INT) AS pos
  FROM embeddings
), per_score AS (
  SELECT score_micro, SUM(pos) AS p, SUM(1 - pos) AS q
  FROM s GROUP BY score_micro
), cum AS (
  SELECT score_micro,
         SUM(p) OVER (ORDER BY score_micro DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tp,
         SUM(q) OVER (ORDER BY score_micro DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_fp
  FROM per_score
), t AS (SELECT SUM(pos) AS np, SUM(1 - pos) AS nq FROM s)
SELECT c.score_micro, CAST(c.cum_tp AS BIGINT) AS cum_tp,
       CAST(c.cum_fp AS BIGINT) AS cum_fp,
       ROUND(CAST(c.cum_tp AS DOUBLE) / t.np, 6) AS tpr,
       ROUND(CAST(c.cum_fp AS DOUBLE) / t.nq, 6) AS fpr
FROM cum c CROSS JOIN t
"""


@query("ml_roc_points", _ROC_ORACLE, tag="ml")
def ml_roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC curve points — cumulative TP/FP counts at every distinct
    score threshold (descending), the curve every classifier eval plots.
    Counts are exact integers; TPR/FPR are single rounded divisions. The
    threshold-ordered cumulative runs as a distributed prefix sum (bucketed
    per-score cumsums + broadcast bucket offsets, ``quality_ks_statistic``'s
    device) — never a single-reducer global window over the score domain."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    s = e.select(
        F.floor(F.element_at("embedding", 1).cast("double") * 1_000_000)
        .cast("long")
        .alias("score_micro"),
        (F.col("label") % 2).cast("int").alias("pos"),
    )
    per_score = s.groupBy("score_micro").agg(
        F.sum("pos").alias("p"), F.sum(1 - F.col("pos")).alias("q")
    ).withColumn(
        # descending prefix sum: bucket ids negated so ascending bucket
        # order == descending score order
        "bucket", -F.floor(F.col("score_micro") / _ROC_BUCKET)
    )
    bt = per_score.groupBy("bucket").agg(
        F.sum("p").alias("bp"), F.sum("q").alias("bq")
    )
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = bt.select(
        "bucket",
        (F.sum("bp").over(w_off) - F.col("bp")).alias("off_p"),
        (F.sum("bq").over(w_off) - F.col("bq")).alias("off_q"),
    )
    w_local = Window.partitionBy("bucket").orderBy(
        F.col("score_micro").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totals = s.agg(
        F.sum("pos").alias("np"), F.sum(1 - F.col("pos")).alias("nq")
    )
    return (
        per_score.join(F.broadcast(offsets), "bucket")
        .select(
            "score_micro",
            (F.col("off_p") + F.sum("p").over(w_local)).cast("long").alias("cum_tp"),
            (F.col("off_q") + F.sum("q").over(w_local)).cast("long").alias("cum_fp"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "score_micro",
            "cum_tp",
            "cum_fp",
            F.round(F.col("cum_tp").cast("double") / F.col("np"), 6).alias("tpr"),
            F.round(F.col("cum_fp").cast("double") / F.col("nq"), 6).alias("fpr"),
        )
    )


_AUC_ORACLE = """
WITH s AS (
  SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS score_micro,
         CAST(label % 2 AS INT) AS pos
  FROM embeddings
), per_score AS (
  SELECT score_micro, SUM(pos) AS p, SUM(1 - pos) AS q
  FROM s GROUP BY score_micro
), cum AS (
  SELECT p, q,
         SUM(p + q) OVER (ORDER BY score_micro
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (p + q) AS cum_before
  FROM per_score
), sums AS (
  SELECT CAST(SUM(p) AS BIGINT) AS n_pos, CAST(SUM(q) AS BIGINT) AS n_neg,
         CAST(SUM(p * (2 * cum_before + (p + q) + 1)) AS BIGINT) AS r1_2
  FROM cum
)
SELECT n_pos, n_neg,
       ROUND((r1_2 - n_pos * (n_pos + 1))
             / (2.0 * n_pos * n_neg), 6) AS auc
FROM sums
"""


@query("ml_auc_exact", _AUC_ORACLE, tag="ml")
def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC in one rank-sum pass: AUC equals the Mann–Whitney U
    statistic normalized by n_pos·n_neg, so the tie-averaged doubled-rank
    machinery of ``stat_mannwhitney_u`` computes it with integer-exact
    arithmetic — no curve interpolation, no per-threshold loop, one
    (score)-keyed shuffle. This is THE scalable way to evaluate a
    classifier on 10^11 rows: the engine never materializes the curve."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    s = e.select(
        F.floor(F.element_at("embedding", 1).cast("double") * 1_000_000)
        .cast("long")
        .alias("score_micro"),
        (F.col("label") % 2).cast("int").alias("pos"),
    )
    per_score = s.groupBy("score_micro").agg(
        F.sum("pos").alias("p"), F.sum(1 - F.col("pos")).alias("q")
    ).withColumn("bucket", F.floor(F.col("score_micro") / _ROC_BUCKET))
    bt = per_score.groupBy("bucket").agg(F.sum(F.col("p") + F.col("q")).alias("bt"))
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = bt.select(
        "bucket", (F.sum("bt").over(w_off) - F.col("bt")).alias("off")
    )
    w_local = Window.partitionBy("bucket").orderBy("score_micro").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.join(F.broadcast(offsets), "bucket").select(
        "p",
        "q",
        (
            F.col("off")
            + F.sum(F.col("p") + F.col("q")).over(w_local)
            - (F.col("p") + F.col("q"))
        ).alias("cum_before"),
    )
    rank2 = 2 * F.col("cum_before") + (F.col("p") + F.col("q")) + 1
    sums = cum.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("q").cast("long").alias("n_neg"),
        F.sum(F.col("p") * rank2).cast("long").alias("r1_2"),
    )
    return sums.select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("r1_2") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


_CALIB_ORACLE = """
WITH s AS (
  SELECT LEAST(9, GREATEST(0,
           CAST(FLOOR((CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 10)
                AS BIGINT))) AS bin,
         CAST(FLOOR((CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000)
              AS BIGINT) AS prob_micro,
         CAST(label % 2 AS INT) AS pos
  FROM embeddings
)
SELECT bin, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(FLOOR(CAST(SUM(prob_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
         AS mean_prob_micro,
       ROUND(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 6) AS obs_rate
FROM s GROUP BY bin
"""


@query("ml_calibration_bins", _CALIB_ORACLE, tag="ml")
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins: decile-bucketed predicted probability vs
    observed positive rate — the calibration table behind ECE and Platt
    scaling decisions. Per-value probabilities quantize to integer micro
    BEFORE the sum (order-independent mean); one |bins|-group aggregate."""
    e = load_table(spark, sf_dir, "embeddings")
    prob = (F.element_at("embedding", 1).cast("double") + 1.0) / 2.0
    s = e.select(
        F.least(
            F.lit(9), F.greatest(F.lit(0), F.floor(prob * 10).cast("long"))
        ).alias("bin"),
        F.floor(prob * 1_000_000).cast("long").alias("prob_micro"),
        (F.col("label") % 2).cast("int").alias("pos"),
    )
    return s.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.floor(F.sum("prob_micro").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_prob_micro"),
        F.round(F.sum("pos").cast("double") / F.count(F.lit(1)), 6).alias(
            "obs_rate"
        ),
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_P_ALIASES = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]

_CROSSTAB_ORACLE = (
    "SELECT o_orderstatus, "
    + ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE o_orderpriority = '{v}') AS BIGINT) AS {a}"
        for v, a in zip(_PRIORITIES, _P_ALIASES)
    )
    + " FROM orders GROUP BY o_orderstatus"
)


@query("stat_crosstab", _CROSSTAB_ORACLE, tag="profiling")
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table (``df.stat.crosstab`` semantics) — pairwise
    frequency of two categorical columns, wide-form. Built as
    ``groupBy().pivot(values=...).count()`` with the pivot values passed
    EXPLICITLY: without them Spark runs an extra distinct-collect job to
    discover the domain, a hidden scan that matters at 100 TB (and makes the
    output schema data-dependent). ``fillna(0)`` matches the crosstab
    contract of dense zero cells. One shuffle on the row key; the pivot
    itself is a map-side conditional aggregation."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
        .na.fill(0)
    )
    return wide.select(
        "o_orderstatus",
        *[F.col(f"`{v}`").alias(a) for v, a in zip(_PRIORITIES, _P_ALIASES)],
    )
