"""TPC-H completion batch (third composite set): the six classic patterns the
first two batches skip because the driver's star schema lacks their native
columns (no partsupp table, no shipmode/commitdate/receiptdate). Each query
keeps the ORIGINAL's planner pattern — the thing that exercises the engine —
re-keyed onto columns the corpus has:

- Q2  min-cost supplier: per-group argmin + join-back (correlated MIN)
- Q11 important parts: aggregate vs global scalar threshold (HAVING > Σ·f)
- Q12 ship latency: conditional two-way counts over a derived bucket
- Q16 supplier count: COUNT(DISTINCT) per attribute triple with NOT IN
- Q20 promotion candidates: nested semi-join chain gated by a HAVING sum
- Q21 waiting orders: EXISTS + NOT EXISTS co-correlation on the same fact

Reference basis: whole-query planning is delegated to Spark (``docs/
ScalaSparkCompute-sparkcompute.md:5-12``); composites prove it. All money
sums use the order-independent fixed-point helpers
(``functions/deterministic.py``) for bit-exact oracle hashes. Scale posture:
dims broadcast, fact shuffles once per agg, argmin via window not self-join
where the window's partition key is the shuffle key anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.functions.deterministic import dsum, o_dsum
from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

_Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(unit_cost) AS best_cost FROM cost GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_type, s.s_name, ROUND(c.unit_cost, 6) AS unit_cost
FROM cost c
JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cost = b.best_cost
JOIN part p ON p.p_partkey = c.l_partkey
JOIN supplier s ON s.s_suppkey = c.l_suppkey
WHERE p.p_type = 'SMALL' AND p.p_size <= 15
"""


@query("tpch_q2_min_cost_supplier", _Q2_ORACLE, tag="composite")
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated-MIN argmin,
    re-keyed from partsupp to observed lineitem unit prices. Spark form: one
    groupBy to per-(part,supplier) cost, then a window MIN over partkey and
    an equality filter. The fact table is explicitly repartitioned on
    ``l_partkey`` FIRST: hash partitioning on a subset of the grouping keys
    satisfies both the (partkey, suppkey) aggregate and the window's
    partitionBy(partkey), so the whole argmin costs ONE shuffle (verified in
    tests/test_plan_hygiene.py) — the oracle's self-join form would shuffle
    the aggregate twice more. The double equality is engine-safe: both sides
    compute identical IEEE division and MIN is order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    )
    s = load_table(spark, sf_dir, "supplier")
    cost = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.withColumn("best_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_partkey",
            "p_type",
            "s_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
    )


_Q11_ORACLE = f"""
WITH v AS (
  SELECT l_partkey, {o_dsum('l_extendedprice * (1 - l_discount)')} AS part_value
  FROM lineitem GROUP BY l_partkey
), total AS (
  SELECT {o_dsum('l_extendedprice * (1 - l_discount)')} AS total_value FROM lineitem
)
SELECT v.l_partkey, v.part_value
FROM v, total
WHERE v.part_value > total.total_value * 0.0006
"""


@query("tpch_q11_important_parts", _Q11_ORACLE, tag="composite")
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-key aggregate filtered against
    a global-scalar threshold. The global total is a one-row broadcast joined
    to the per-part aggregate — no driver collect, no second fact shuffle
    (the total reuses its own scan; at 100 TB both aggregates come off one
    shared scan stage). Fixed-point sums keep the threshold comparison
    bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(dsum(value, "part_value"))
    total = li.agg(dsum(value, "total_value"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("total_value") * 0.0006)
        .select("l_partkey", "part_value")
    )


_Q12_ORACLE = """
SELECT CASE WHEN CAST(FLOOR((epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 86400) AS BIGINT) > 30
            THEN 'slow' ELSE 'fast' END AS latency_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate
GROUP BY 1
"""


@query("tpch_q12_ship_latency", _Q12_ORACLE, tag="composite")
def tpch_q12_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority counts): the two conditional
    sums over a derived category, with shipmode replaced by a ship-latency
    bucket computed from epoch arithmetic (integer day difference — exact in
    both engines). One fact-fact shuffle on orderkey, then a 2-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    days = F.floor(
        (F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")) / 86400
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .withColumn(
            "latency_bucket", F.when(days > 30, "slow").otherwise("fast")
        )
        .groupBy("latency_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#2'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query("tpch_q16_supplier_count", _Q16_ORACLE, tag="composite")
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT) per
    attribute triple with a NOT IN exclusion subquery (complaint suppliers →
    negative-balance suppliers). The exclusion is a broadcast anti join (the
    excluded set is tiny by construction); part attributes ride a broadcast
    dim join, so the only fact shuffle is the distinct-count agg."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 11, 17, 23, 29, 35, 41, 47)
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q20_ORACLE = """
SELECT s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'red%'
  GROUP BY l.l_suppkey
  HAVING SUM(l_quantity) > 400
)
ORDER BY s.s_name
"""


@query("tpch_q20_promotion_suppliers", _Q20_ORACLE, tag="composite")
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): the nested semi-join chain
    — suppliers IN (aggregated fact filtered by a part-name pattern, gated by
    a HAVING sum). The inner aggregate runs first (part dim broadcast into
    the fact scan), its qualifying supplier set is small, and the outer IN
    becomes a broadcast left-semi join. l_quantity sums are integral doubles,
    exact in both engines."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    qual = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 400)
    )
    return (
        s.join(F.broadcast(qual), s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


_Q21_ORACLE = """
WITH order_stats AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_supp_r
  FROM lineitem GROUP BY l_orderkey
)
SELECT s.s_name, COUNT(DISTINCT l.l_orderkey) AS numwait
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN order_stats st ON st.l_orderkey = l.l_orderkey
WHERE l.l_returnflag = 'R' AND st.n_supp >= 2 AND st.n_supp_r = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


@query("tpch_q21_waiting_orders", _Q21_ORACLE, tag="composite")
def tpch_q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the famous
    EXISTS + NOT EXISTS pair on the same fact, decorrelated into one
    order-level stats aggregate — EXISTS(other supplier) ⇔ n_supp >= 2,
    NOT EXISTS(other 'R' supplier) ⇔ n_supp_r = 1 (the candidate itself).
    One extra fact aggregate replaces two correlated fact self-joins; the
    stats join reuses the orderkey shuffle. Top-20 by a deterministic
    (numwait DESC, s_name) order — s_name is unique, so no tie ambiguity."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    stats = li.groupBy(F.col("l_orderkey").alias("st_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(stats, li.l_orderkey == stats.st_orderkey)
        .where((F.col("n_supp") >= 2) & (F.col("n_supp_r") == 1))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
