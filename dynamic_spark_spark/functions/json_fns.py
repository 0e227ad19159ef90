"""JSON functions (SURVEY.md §2.C Scalar functions / JSON).

Drives the ``events.props`` JSON column (FIXTURES.md). Spark's
``get_json_object``/``from_json`` map to DuckDB's ``json_extract_string``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query(
    "fn_json",
    "SELECT event_id,"
    " json_extract_string(props, '$.k') AS k_str,"
    " CAST(json_extract_string(props, '$.k') AS INT) AS k_int"
    " FROM events",
    tag="function",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path extraction (``get_json_object``) + typed parse (``from_json`` with
    an explicit schema — the scalable form: one parse, vectorized, no schema
    inference job)."""
    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", IntegerType(), True)])
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", schema).getField("k").alias("k_int"),
    )


@query(
    "fn_variant",
    "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k,"
    " CAST(json_extract(props, '$.missing') AS INT) AS missing_field"
    " FROM events",
    tag="function",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` ingests the
    payload once into the binary Variant encoding, then ``try_variant_get``
    extracts typed fields without re-parsing per access — the modern
    replacement for repeated ``get_json_object`` string scans (one parse vs
    k parses for k fields, and the Variant bytes shred into columnar storage
    at scale). Missing paths yield NULL (try_ semantics) instead of failing
    a 100 TB job on one malformed record."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_field"),
    )
