"""Math functions (SURVEY.md §2.C Scalar functions / Math).

Per-row +,-,*,/ and sqrt are IEEE-exact and identical across engines;
transcendentals (exp/ln/pow) are libm-dependent and may differ in the last
ulp, so those are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table, sf_scaled_bound


@query(
    "fn_math",
    "SELECT s_suppkey,"
    " abs(s_acctbal) AS abs_bal,"
    " round(s_acctbal, 1) AS bal_r1,"
    " CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,"
    " CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil,"
    " sqrt(abs(s_acctbal)) AS bal_sqrt,"
    " round(exp(s_acctbal / 10000), 6) AS bal_exp,"
    " round(ln(abs(s_acctbal) + 1), 6) AS bal_ln,"
    " round(pow(s_acctbal, 2), 6) AS bal_sq,"
    " CAST(s_suppkey % 7 AS BIGINT) AS key_mod"
    " FROM supplier",
    tag="function",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.abs(bal).alias("abs_bal"),
        F.round(bal, 1).alias("bal_r1"),
        F.floor(bal).alias("bal_floor"),
        F.ceil(bal).alias("bal_ceil"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        F.round(F.exp(bal / 10000), 6).alias("bal_exp"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("bal_ln"),
        F.round(F.pow(bal, 2), 6).alias("bal_sq"),
        (F.col("s_suppkey") % 7).alias("key_mod"),
    )


@query(
    "fn_bitwise",
    "SELECT o_orderkey,"
    " o_orderkey & 255 AS k_and,"
    " o_orderkey | 15 AS k_or,"
    " xor(o_orderkey, 85) AS k_xor,"
    " o_orderkey << 2 AS k_shl,"
    " o_orderkey >> 3 AS k_shr,"
    " bit_count(o_orderkey) AS k_bits"
    " FROM orders WHERE o_orderkey < 1000",
    tag="function",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (&, |, xor, shifts, bit_count) — the primitive
    layer under the engine's banding/bucketing tricks (SimHash bands, LSH
    signatures)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(15)).alias("k_or"),
        k.bitwiseXOR(F.lit(85)).alias("k_xor"),
        F.shiftleft(k, 2).alias("k_shl"),
        F.shiftright(k, 3).alias("k_shr"),
        F.bit_count(k).cast("bigint").alias("k_bits"),
    )


_Z_BITS = 16

_Z_TERMS_SQL = " | ".join(
    f"(((l_partkey >> {i}) & 1) << {2 * i})"
    f" | (((l_suppkey >> {i}) & 1) << {2 * i + 1})"
    for i in range(_Z_BITS)
)


def _z_terms_col():
    from functools import reduce

    x, y = F.col("l_partkey"), F.col("l_suppkey")
    terms = []
    for i in range(_Z_BITS):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


@query(
    "fn_zorder_curve",
    "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,"
    f" CAST({_Z_TERMS_SQL} AS BIGINT) AS zval"
    " FROM lineitem WHERE l_orderkey < 3750",
    tag="function",
)
def fn_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve index over (l_partkey, l_suppkey): interleave
    the low 16 bits of each key so rows close in BOTH dimensions get close
    z-values. Pure codegen bit arithmetic (32 shift/mask terms OR-ed, no UDF).

    Why it matters at 100 TB: sorting a table by ``zval`` before writing
    parquet clusters the row groups in both dimensions at once, so min/max
    data skipping prunes scans filtered on either key (or both) — the
    standard multi-dimensional layout trick (Delta/Iceberg OPTIMIZE ZORDER)
    expressed as a plain projection any writer can apply via
    ``df.repartitionByRange(zval).sortWithinPartitions(zval)``.

    The l_orderkey bound is a verification-budget trim (quarter of the rows
    through the 32-term expression and the differential hash) — it reaches
    the scan as a pushed filter and changes nothing about the curve. The
    bound SCALES with the SF (``sf_scaled_bound``) but is FLOORED at 3750
    for sf ≤ 0.01, so every verification fixture (driver sf0.01, pytest
    sf0.001) matches the static oracle SQL exactly; at bench/scale SFs it
    keeps selecting the same quarter of the table rather than a
    constant-row subset."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") < sf_scaled_bound(sf_dir, 3750)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        _z_terms_col().cast("bigint").alias("zval"),
    )


@query(
    "fn_try_arithmetic",
    "SELECT o_orderkey,"
    " o_totalprice / NULLIF(CAST(o_orderkey % 7 AS DOUBLE), 0) AS per_slot,"
    " TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS pri_num,"
    " CAST(o_orderkey AS BIGINT) + 1 AS next_key"
    " FROM orders",
    tag="function",
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic (``try_divide`` / ``try_cast`` / ``try_add``):
    under Spark 4's default ANSI mode, a single divide-by-zero or bad cast
    FAILS the whole job — on 100 TB that's hours lost to one malformed row.
    The try_ family yields NULL instead, per-row, while keeping ANSI's
    overflow protection everywhere else. Oracle maps to NULLIF-guarded
    division and TRY_CAST."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 7).cast("double")
        ).alias("per_slot"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("pri_num"),
        F.try_add(F.col("o_orderkey"), F.lit(1)).alias("next_key"),
    )
