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


#: 128-bit demo key (NOT a secret — parity/roundtrip demonstration only).
_AES_KEY = "0123456789abcdef"


@query(
    "fn_aes_roundtrip",
    "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey < 1000",
    tag="function",
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: ``aes_encrypt`` → ``aes_decrypt``
    must reproduce the plaintext byte-for-byte (the oracle compares against
    the untouched source rows). ECB mode keeps the ciphertext deterministic
    for the roundtrip demo; production uses GCM (random IV, AEAD) where
    only the roundtrip — never the ciphertext — is comparable. Both
    directions are JVM codegen expressions: encrypt-at-rest projections add
    no shuffle at any scale."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.expr(
            f"cast(aes_decrypt(aes_encrypt(o_orderpriority, '{_AES_KEY}', 'ECB'),"
            f" '{_AES_KEY}', 'ECB') as string)"
        ).alias("o_orderpriority"),
    )
