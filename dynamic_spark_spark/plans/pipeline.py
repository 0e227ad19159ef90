"""Pipeline executor: ordered stages over ONE lazily-composed DataFrame.

The reference's execution model forces a row-oriented RDD<StructuredRecord>
bridge between every stage (``ScalaSparkCompute.java:123``,
``ScalaSparkCodeExecutor.java:200-203``) — its single biggest performance
liability (SURVEY §4.1): it breaks whole-stage codegen, column pruning and
predicate pushdown at every stage boundary. This engine's headline design
delta: stages compose into one DataFrame, so Catalyst optimizes across the
whole pipeline and nothing materializes until a sink acts.

Lifecycle (mirrors §3.1):
1. ``Pipeline(spec)`` — parse + macro substitution (A14) + structural checks;
2. ``validate(spark)`` — deploy-time phase (A8): compile user code, dry-run
   transforms over empty frames, collect schema incompatibilities (A6);
3. ``run(spark)`` — compose and execute; lineage records accumulate (A13).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dynamic_spark_spark.plans.lineage import LineageRecord
from dynamic_spark_spark.plans.spec import PipelineSpec, StageSpec
from dynamic_spark_spark.plans.usercode import UserCodeError, compile_user_code, dry_run
from dynamic_spark_spark.plans.validation import SchemaIncompatibility, check_schema_compatible
from dynamic_spark_spark.registry import QUERIES
from dynamic_spark_spark.session import tune
from dynamic_spark_spark.sources.readers import load_table


@dataclass
class PipelineContext:
    """Per-stage execution context — the analog of CDAP's
    ``SparkExecutionPluginContext`` handed to user code
    (``ScalaSparkCompute.java:99``)."""

    spark: SparkSession
    pipeline_name: str
    stage_name: str
    runtime_args: dict[str, str] = field(default_factory=dict)

    def arg(self, name: str, default: str | None = None) -> str | None:
        return self.runtime_args.get(name, default)


class PipelineValidationError(ValueError):
    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__("; ".join(errors))


class Pipeline:
    def __init__(
        self,
        spec: PipelineSpec | dict,
        runtime_args: dict[str, str] | None = None,
        *,
        deploy_compile: bool = True,
    ):
        self.runtime_args = dict(runtime_args or {})
        if isinstance(spec, dict):
            spec = PipelineSpec.from_dict(spec, self.runtime_args)
        self.spec = spec
        self.deploy_compile = deploy_compile
        self.lineage: list[LineageRecord] = []
        #: stage name -> Observation (single-pass metrics, see metrics())
        self._observations: dict = {}
        shape_errors = spec.validate_shape()
        if shape_errors:
            raise PipelineValidationError(shape_errors)

    # -- deploy-time ------------------------------------------------------

    def validate(self, spark: SparkSession) -> list[SchemaIncompatibility]:
        """A8 deploy-compile phase: compile every user-code stage, dry-run
        transforms on empty frames, check declared output schemas (A6).
        Returns collected incompatibilities (empty == valid)."""
        tune(spark)
        problems: list[SchemaIncompatibility] = []
        schema: T.StructType | None = None
        for stage in self.spec.stages:
            ctx = PipelineContext(spark, self.spec.name, stage.name, self.runtime_args)
            if stage.type == "source":
                schema = self._source_df(spark, stage).schema
            elif stage.type == "transform" and "code" in stage.params:
                fn, takes_ctx = compile_user_code(
                    stage.params["code"],
                    stage_name=stage.name,
                    entry_point="transform",
                    spark=spark,
                )
                if self.deploy_compile and schema is not None:
                    schema = dry_run(
                        fn, takes_ctx, spark, schema, ctx,
                        stage_name=stage.name, is_sink=False,
                    )
            elif stage.type == "transform" and "sql" in stage.params:
                if self.deploy_compile and schema is not None:
                    empty = spark.createDataFrame([], schema)
                    empty.createOrReplaceTempView(stage.params.get("view", "input"))
                    schema = spark.sql(stage.params["sql"]).schema
            elif stage.type == "sink" and "code" in stage.params:
                compile_user_code(
                    stage.params["code"],
                    stage_name=stage.name,
                    entry_point="sink",
                    spark=spark,
                )
            if stage.output_schema and schema is not None:
                declared = T.StructType.fromDDL(stage.output_schema)
                problems.extend(
                    check_schema_compatible(declared, schema, stage=stage.name)
                )
        return problems

    # -- run-time ---------------------------------------------------------

    def run(self, spark: SparkSession) -> DataFrame | None:
        """Compose all stages into one DataFrame; sinks trigger the action.
        Returns the final DataFrame (or None if the pipeline ends in a
        terminal sink)."""
        tune(spark)
        df: DataFrame | None = None
        for stage in self.spec.stages:
            ctx = PipelineContext(spark, self.spec.name, stage.name, self.runtime_args)
            in_fields = list(df.columns) if df is not None else []
            if stage.type == "source":
                df = self._source_df(spark, stage)
                self._record(stage, "source", [], df.columns)
            elif stage.type == "transform":
                df = self._apply_transform(spark, stage, df, ctx)
                df = self._attach_observation(stage, df)
                self._record(stage, self._op_name(stage, "transform"), in_fields, df.columns)
            elif stage.type == "sink":
                result = self._apply_sink(stage, df, ctx)
                self._record(
                    stage,
                    self._op_name(stage, "sink"),
                    in_fields,
                    [],
                    reference_name=stage.params.get("reference_name", stage.params.get("path")),
                )
                df = result
        return df

    # -- stage implementations -------------------------------------------

    def _source_df(self, spark: SparkSession, stage: StageSpec) -> DataFrame:
        p = stage.params
        if "view" in p:
            return spark.table(p["view"])
        if "table" in p:
            return load_table(spark, p.get("sf_dir", ""), p["table"])
        if "query_key" in p:
            return QUERIES[p["query_key"]](spark, p.get("sf_dir", ""))
        fmt = p.get("format", "parquet")
        reader = spark.read.format(fmt).options(**p.get("options", {}))
        if "schema" in p:
            reader = reader.schema(p["schema"])
        return reader.load(p["path"])

    def _apply_transform(
        self, spark: SparkSession, stage: StageSpec, df: DataFrame, ctx: PipelineContext
    ) -> DataFrame:
        if df is None:
            raise PipelineValidationError([f"transform '{stage.name}' has no input"])
        p = stage.params
        if "code" in p:
            fn, takes_ctx = compile_user_code(
                p["code"], stage_name=stage.name, entry_point="transform", spark=spark
            )
            out = fn(df, ctx) if takes_ctx else fn(df)
            if not isinstance(out, DataFrame):
                raise UserCodeError(
                    f"stage '{stage.name}': transform returned "
                    f"{type(out).__name__}, expected DataFrame"
                )
            return out
        if "sql" in p:
            df.createOrReplaceTempView(p.get("view", "input"))
            return spark.sql(p["sql"])
        raise PipelineValidationError(
            [f"transform '{stage.name}' needs 'code' or 'sql'"]
        )

    def _apply_sink(
        self, stage: StageSpec, df: DataFrame, ctx: PipelineContext
    ) -> DataFrame | None:
        if df is None:
            raise PipelineValidationError([f"sink '{stage.name}' has no input"])
        p = stage.params
        if "code" in p:
            fn, takes_ctx = compile_user_code(
                p["code"], stage_name=stage.name, entry_point="sink", spark=ctx.spark
            )
            fn(df, ctx) if takes_ctx else fn(df)
            return None
        writer = df.write.mode(p.get("mode", "overwrite"))
        if p.get("partition_by"):
            writer = writer.partitionBy(*p["partition_by"])
        writer.format(p.get("format", "parquet")).options(**p.get("options", {})).save(
            p["path"]
        )
        return df

    # -- observed metrics -------------------------------------------------

    def _attach_observation(self, stage: StageSpec, df: DataFrame) -> DataFrame:
        """Stage-level metrics via ``df.observe`` (``observe: true`` or a
        list of ``'null:<col>'``/``'sum:<col>'`` specs in stage params):
        accumulator-style counters evaluated DURING the sink action — zero
        extra passes over the data, which at 100 TB is the difference
        between monitoring and doubling the bill. The analog of the
        reference's stage metrics (CDAP StageMetrics recorded per plugin);
        here they ride the same job instead of a second count()."""
        spec = stage.params.get("observe")
        if not spec:
            return df
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        metrics = [F.count(F.lit(1)).alias("rows")]
        if isinstance(spec, list):
            for m in spec:
                kind, _, col = m.partition(":")
                if kind == "null":
                    metrics.append(
                        F.count_if(F.col(col).isNull()).alias(f"null_{col}")
                    )
                elif kind == "sum":
                    metrics.append(
                        F.sum(F.col(col).cast("double")).alias(f"sum_{col}")
                    )
        obs = Observation(stage.name)
        self._observations[stage.name] = obs
        return df.observe(obs, *metrics)

    def metrics(self) -> dict[str, dict[str, float]]:
        """Observed per-stage metrics; available after a sink action ran."""
        return {name: dict(obs.get) for name, obs in self._observations.items()}

    # -- lineage ----------------------------------------------------------

    def _op_name(self, stage: StageSpec, kind: str) -> str:
        if "code" in stage.params:
            return f"{kind}:user_code"
        if "sql" in stage.params:
            return f"{kind}:sql"
        return f"{kind}:{stage.params.get('format', 'parquet')}"

    def _record(
        self,
        stage: StageSpec,
        operation: str,
        inputs: list[str],
        outputs: list[str],
        reference_name: str | None = None,
    ) -> None:
        self.lineage.append(
            LineageRecord(
                pipeline=self.spec.name,
                stage=stage.name,
                operation=operation,
                input_fields=inputs,
                output_fields=outputs,
                reference_name=reference_name,
            )
        )
