from dynamic_spark_spark.plans.pipeline import Pipeline, PipelineContext
from dynamic_spark_spark.plans.spec import PipelineSpec, StageSpec, substitute_macros
from dynamic_spark_spark.plans.validation import SchemaIncompatibility, check_schema_compatible

__all__ = [
    "Pipeline",
    "PipelineContext",
    "PipelineSpec",
    "StageSpec",
    "substitute_macros",
    "SchemaIncompatibility",
    "check_schema_compatible",
]
