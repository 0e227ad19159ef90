"""Skew-handling utilities (SURVEY.md §4.2 scale posture).

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew at
runtime; :func:`salted_join` is the explicit fallback for the cases AQE can't
fix — e.g. a skewed aggregation key, or a broadcast-ineligible dimension with
a hot key. Pattern: explode the small side ``salt_factor`` ways, scatter the
big side's hot keys across the same salt range, join on (key, salt) — the hot
partition splits into ``salt_factor`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with key salting.

    ``big`` gets a random-but-deterministic salt in [0, salt_factor) derived
    from a hash of its whole row (xxhash64 — no RNG state, reproducible);
    ``small`` is exploded once per salt value. Result equals the plain join,
    but a hot key's rows spread over ``salt_factor`` reducers.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor))
    big_salted = big.withColumn("__salt", salt.cast("int"))
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = big_salted.join(small_salted, [on, "__salt"], how)
    return out.drop("__salt")


def salted_group_count(df: DataFrame, key: Column | str, *, salt_factor: int = 8) -> DataFrame:
    """Two-phase aggregation for a skewed group key: partial count on
    (key, salt), then final sum on key — the classic map-side scatter that
    keeps any single reducer from owning a hot key's entire partition."""
    key_col = F.col(key) if isinstance(key, str) else key
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor)).cast("int")
    )
    partial = salted.groupBy(key_col.alias("key"), F.col("__salt")).agg(
        F.count(F.lit(1)).alias("partial_n")
    )
    return partial.groupBy("key").agg(F.sum("partial_n").alias("n"))


@query(
    "join_salted",
    "SELECT e.event_id, e.user_id, e.event_type, n.n_name AS nation"
    " FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey",
    tag="join",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join, oracle-checked against the plain join it must equal
    (salting is a physical rewrite, not a semantic one)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "nk", (F.col("user_id") % 25).cast("int")
    )
    n = load_table(spark, sf_dir, "nation")
    out = salted_join(ev, n.withColumnRenamed("n_nationkey", "nk"), "nk", salt_factor=4)
    return out.select("event_id", "user_id", "event_type", F.col("n_name").alias("nation"))
