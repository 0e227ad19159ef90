"""Hash / misc functions (SURVEY.md §2.C Scalar functions / Hash-misc).

md5 and sha256 are standard and compared against the oracle; Spark-specific
hashes (murmur ``hash``, ``xxhash64``, ``monotonically_increasing_id``) are
engine-defined and covered by the rows-only key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query(
    "fn_hash",
    "SELECT c_custkey,"
    " md5(c_name) AS name_md5,"
    " sha256(c_name) AS name_sha256"
    " FROM customer",
    tag="function",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
    )


@query("fn_hash_engine", tag="function")  # rows-only: engine-defined hashes
def fn_hash_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native hashes used by the llmops operators (murmur3 ``hash``,
    ``xxhash64``) plus ``monotonically_increasing_id`` — deterministic within
    Spark, not portable to the oracle."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.hash("c_name").alias("name_murmur3"),
        F.xxhash64("c_name").alias("name_xxhash64"),
        F.crc32(F.col("c_name").cast("binary")).alias("name_crc32"),
        F.monotonically_increasing_id().alias("row_id"),
    )
