"""Deep TPC-H-shaped composites (second batch) — planner-pattern coverage.

The reference delegates whole-query planning to Spark ("full access to all
Spark features", ``docs/ScalaSparkCompute-sparkcompute.md:5-6``;
join-then-SQL use case ``docs/ScalaSparkCompute-sparkcompute.md:10-12``), so
the proof of query capability is composite plans, not single operators. This
module adds the classic TPC-H patterns the first batch (Q1/Q3/Q5/Q6/Q10/Q14
in ``composite.py``) doesn't cover, adapted to the driver's star schema
(no partsupp/commitdate/shipmode columns):

- existential semi join aggregated by category        (Q4)
- two-nation volume matrix with a disjunctive pair predicate (Q7)
- market-share ratio of conditional over total revenue (Q8)
- multi-dim profit rollup from a name-pattern part filter (Q9)
- two-level aggregation: per-customer counts → histogram (Q13)
- argmax via global window over an aggregate           (Q15)
- per-group average threshold join-back                (Q17)
- HAVING-filtered IN-subquery over the fact table      (Q18)
- disjunction of conjunctive range predicates          (Q19)
- scalar-subquery threshold + anti join               (Q22)

All money sums use the order-independent fixed-point helpers
(``functions/deterministic.py``) so Spark and DuckDB hash-match bit-exactly.
Every plan is scale-posture-checked: dimension sides broadcast, the fact
table shuffles at most once per agg, and no driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.functions.deterministic import davg, dsum, o_davg, o_dsum
from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

_Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("tpch_q4_priority_check", _Q4_ORACLE, tag="composite")
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): EXISTS over the fact table
    expressed as a left-semi join, then a tiny agg on priority. The semi join
    shuffles both sides on orderkey but emits at most one row per order, so
    the agg input is bounded by |orders| regardless of lineitem fan-out."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
       {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("tpch_q7_volume_shipping", _Q7_ORACLE, tag="composite")
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): 6-way join with
    a disjunctive cross-nation pair predicate. supplier+nation and
    customer+nation collapse to two broadcast maps keyed by suppkey/custkey,
    so the fact table shuffles only for the orders join; the pair filter
    applies after both nations are attached (can't be pushed to either side
    alone without losing the OR's cross terms)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cn), o.o_custkey == cn.c_custkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q8_NATION_CASE = (
    "CASE WHEN n1.n_name = 'NATION_3'"
    " THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END"
)

_Q8_ORACLE = f"""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
       CAST({o_dsum(_Q8_NATION_CASE)}
            / {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS DOUBLE)
       AS mkt_share
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n2.n_regionkey
WHERE r.r_name = 'AMERICA'
GROUP BY o_year
ORDER BY o_year
"""


@query("tpch_q8_market_share", _Q8_ORACLE, tag="composite")
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): conditional-over-total revenue
    ratio per order year, customers restricted to one region. Both the
    numerator CASE and the denominator fold into one aggregation pass; all
    dimension joins broadcast, so the fact shuffles once for orders and once
    for the ~7-group agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cr = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    scale = 1_000_000
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cr), o.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                (F.sum(F.floor(nat * scale + F.lit(0.5))).cast("double") / F.lit(float(scale)))
                / (F.sum(F.floor(rev * scale + F.lit(0.5))).cast("double") / F.lit(float(scale)))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
       {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("tpch_q9_product_profit", _Q9_ORACLE, tag="composite")
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product type profit): part-name pattern filter drives
    a nation × year profit rollup. The LIKE filter prunes the broadcast part
    side before the fact join (a semi-join reduction: only matching partkeys
    reach the shuffle); supplier→nation is a second broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(sn), F.col("l_suppkey") == sn.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
) counts
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("tpch_q13_custdist", _Q13_ORACLE, tag="composite")
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): two-level agg.
    Level 1 counts orders per customer through an outer join (so zero-order
    customers survive with count 0); level 2 histograms those counts. The
    second shuffle is tiny (distinct counts ≤ a few dozen keys) — the plan's
    cost is one fact shuffle plus a map-side-combined re-agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q15_ORACLE = f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           {o_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@query("tpch_q15_top_supplier", _Q15_ORACLE, tag="composite")
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): argmax over an aggregate. The per-
    supplier revenue agg shrinks the fact table to |suppliers| rows, after
    which the global max is a single-partition window over that tiny set —
    the empty-partition window is safe precisely because it runs post-agg,
    never on fact-table cardinality."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    top = rev.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).where(F.col("total_revenue") == F.col("max_rev"))
    return (
        F.broadcast(s)
        .join(top, s.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q17_ORACLE = f"""
SELECT CAST({o_dsum('l.l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
    SELECT l_partkey, {o_davg('l_quantity')} AS avg_qty
    FROM lineitem GROUP BY l_partkey
) pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < 0.2 * pa.avg_qty
"""


@query("tpch_q17_small_qty_revenue", _Q17_ORACLE, tag="composite")
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): per-part average
    quantity joined back against each lineitem (the classic correlated-
    subquery decorrelation). The per-part agg output is dimension-sized, so
    it broadcasts; the brand filter also broadcasts — the fact table is
    never shuffled at all in this plan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        davg("l_quantity", "avg_qty")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(pa), F.col("l_partkey") == F.col("pa_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.floor(F.col("l_extendedprice") * 1_000_000 + F.lit(0.5))).cast("double")
                / F.lit(1_000_000.0)
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


_Q18_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate,
       o.o_totalprice,
       {o_dsum('l.l_quantity')} AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING {o_dsum('l_quantity')} > 300.0
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@query("tpch_q18_large_volume", _Q18_ORACLE, tag="composite")
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): HAVING-filtered aggregate
    subquery gating the main join. The qualifying-orderkey set is tiny
    (>300 units ≈ top percentile), so it broadcasts into a semi join that
    prunes the fact scan before the wide customer⋈orders join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .where(F.col("total_qty") > 300.0)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity", "total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


_Q19_ORACLE = f"""
SELECT {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("tpch_q19_disjunctive", _Q19_ORACLE, tag="composite")
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): OR of
    three conjunctive brand/size/quantity branches across the join. Catalyst
    extracts the common part-side disjunction (brand ∈ {12,23,34}) below the
    join as a pushed filter, so the broadcast side ships only candidate
    parts; the full mixed predicate evaluates post-join in codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(branch).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


_Q22_ORACLE = f"""
SELECT c.c_nationkey,
       COUNT(*) AS numcust,
       {o_dsum('c.c_acctbal')} AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT {o_davg('c2.c_acctbal')}
    FROM customer c2 WHERE c2.c_acctbal > 0.0
)
AND NOT EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@query("tpch_q22_sales_opportunity", _Q22_ORACLE, tag="composite")
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar-subquery threshold
    (average positive balance) + anti join against urgent orders (the corpus
    assigns every customer ≥1 order, so the classic no-orders predicate is
    vacuous — "no urgent orders" keeps Q22's plan shape selective), rolled up
    by nation. The scalar aggregate is a one-row broadcast cross join — no
    driver collect; the anti join needs only the o_custkey column, which
    column pruning reduces to a slim shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    thresh = c.where(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal", "avg_bal"))
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )
