"""dynamic_spark_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capability surface of the CDAP
``dynamic-spark`` plugin suite (reference: ``data-integrations/dynamic-spark``),
re-expressed as idiomatic PySpark 3.x/4.x:

- the reference's pipeline machinery (compute/sink/program stages, schema
  propagation, dynamic user code, lineage — reference
  ``ScalaSparkCompute.java``, ``ScalaSparkSink.java``, ``ScalaSparkProgram.java``,
  ``PySparkProgram.java``) becomes a declarative DataFrame pipeline framework
  (:mod:`dynamic_spark_spark.plans`);
- the *delegated* Spark operator surface ("full access to all Spark features",
  reference ``docs/ScalaSparkCompute-sparkcompute.md:5-6``) becomes a native,
  oracle-checked operator inventory (:mod:`dynamic_spark_spark.operators`,
  :mod:`dynamic_spark_spark.functions`);
- streaming micro-batch parity (reference ``pom.xml:30`` data-streams parent)
  becomes Structured Streaming (:mod:`dynamic_spark_spark.streaming`);
- north-star LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal columns) live in :mod:`dynamic_spark_spark.llmops`.

Everything is DataFrame-first: no RDDs, no driver-side collect loops, and the
whole pipeline composes into a single Catalyst plan.
"""

from dynamic_spark_spark.session import get_spark, tune
from dynamic_spark_spark.sources.readers import TABLES, load_table, register_views
from dynamic_spark_spark.registry import QUERIES, ORACLE, query, load_all_queries

__all__ = [
    "get_spark",
    "tune",
    "TABLES",
    "load_table",
    "register_views",
    "QUERIES",
    "ORACLE",
    "query",
    "load_all_queries",
]
