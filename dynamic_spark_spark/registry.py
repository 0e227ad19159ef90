"""Query-key registry.

Every operator from SURVEY.md §2 registers a named query here, optionally with
an equivalent ANSI-SQL oracle string runnable by DuckDB on the same parquet
tables. ``__spark_entry__.py`` exposes these to the driver's correctness gate.

This is the new engine's analog of the reference's test corpus
(``ScalaSparkTest.java:105-407``): instead of six golden pipeline tests, every
operator is proven by a differential oracle.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark, sf_dir) -> DataFrame
QUERIES: dict[str, QueryFn] = {}
#: name -> DuckDB-compatible ANSI SQL (absent ⇒ rows-only check)
ORACLE: dict[str, str] = {}
#: name -> SURVEY §2 category tag (for coverage reporting)
TAGS: dict[str, str] = {}

# Modules whose import populates the registry.
_QUERY_MODULES = [
    "dynamic_spark_spark.operators.scans",
    "dynamic_spark_spark.operators.projections",
    "dynamic_spark_spark.operators.joins",
    "dynamic_spark_spark.operators.aggregates",
    "dynamic_spark_spark.operators.windows",
    "dynamic_spark_spark.operators.sorts",
    "dynamic_spark_spark.operators.setops",
    "dynamic_spark_spark.operators.udfs",
    "dynamic_spark_spark.operators.ml",
    "dynamic_spark_spark.operators.composite",
    "dynamic_spark_spark.operators.composite2",
    "dynamic_spark_spark.operators.subqueries",
    "dynamic_spark_spark.operators.skew",
    "dynamic_spark_spark.operators.reshape",
    "dynamic_spark_spark.operators.behavior",
    "dynamic_spark_spark.functions.strings",
    "dynamic_spark_spark.functions.dates",
    "dynamic_spark_spark.functions.math_fns",
    "dynamic_spark_spark.functions.collections",
    "dynamic_spark_spark.functions.json_fns",
    "dynamic_spark_spark.functions.hashes",
    "dynamic_spark_spark.plans.pipeline_queries",
    "dynamic_spark_spark.streaming.batch_equiv",
    "dynamic_spark_spark.llmops.dedup",
    "dynamic_spark_spark.llmops.similarity",
    "dynamic_spark_spark.llmops.text",
    "dynamic_spark_spark.llmops.prep",
    "dynamic_spark_spark.llmops.multimodal",
    "dynamic_spark_spark.llmops.curation",
    "dynamic_spark_spark.llmops.mixture",
]


def query(name: str, oracle: str | None = None, tag: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        if tag:
            TAGS[name] = tag
        return fn

    return deco


def load_all_queries() -> dict[str, QueryFn]:
    """Import every operator module (populating the registry) and return it."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return QUERIES
