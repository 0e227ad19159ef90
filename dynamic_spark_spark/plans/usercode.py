"""Dynamic user-code stages — the heart of the reference's capability.

The reference compiles user Scala per stage (``ScalaSparkCodeExecutor.java``):
wraps the snippet in a generated object with auto-imports (``:210-231``),
compiles it (``:156``), validates the method signature reflectively against
the accepted forms (``:56-61``, checks ``:267-335``), and invokes it per
batch. The PySpark-native analog:

- user code is a Python snippet defining ``transform(df[, ctx])`` (compute)
  or ``sink(df[, ctx])`` (terminal, A2);
- it is ``compile()``d + ``exec``'d into a namespace pre-seeded with
  ``spark``, ``F`` (pyspark.sql.functions), ``Window``, and ``types``
  (the auto-import analog of ``ScalaSparkCodeExecutor.java:216-224``);
- the signature is validated with ``inspect`` and errors carry the stage
  name and the accepted-signatures table, mirroring the careful messages at
  ``ScalaSparkCodeExecutor.java:283-292``;
- ``deploy_compile=True`` (A8: ``deployCompile`` flag, default true,
  ``widgets/ScalaSparkCompute-sparkcompute.json:24-31``) additionally
  dry-runs the callable on an empty DataFrame with the declared input
  schema, so schema bugs surface at build time, not mid-job.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ACCEPTED_SIGNATURES = (
    "transform(df: DataFrame) -> DataFrame",
    "transform(df: DataFrame, ctx: PipelineContext) -> DataFrame",
    "sink(df: DataFrame) -> None",
    "sink(df: DataFrame, ctx: PipelineContext) -> None",
)


class UserCodeError(ValueError):
    """User snippet failed to compile or has a bad entry-point signature."""


def compile_user_code(
    code: str,
    *,
    stage_name: str,
    entry_point: str,
    spark: SparkSession | None = None,
    extra_namespace: dict[str, Any] | None = None,
) -> tuple[Callable, bool]:
    """Compile + exec a user snippet and bind its entry point.

    Returns ``(callable, takes_context)`` — the analog of the reference
    recording ``isDataFrame``/``takeContext`` after reflection
    (``ScalaSparkCodeExecutor.java:159-160``).
    """
    try:
        compiled = compile(code, f"<stage:{stage_name}>", "exec")
    except SyntaxError as e:
        raise UserCodeError(
            f"stage '{stage_name}': user code failed to compile: {e}"
        ) from e

    namespace: dict[str, Any] = {
        "spark": spark,
        "F": F,
        "Window": Window,
        "T": T,
        "DataFrame": DataFrame,
    }
    if extra_namespace:
        namespace.update(extra_namespace)
    exec(compiled, namespace)  # noqa: S102 — dynamic user code is the feature (A1/A7)

    fn = namespace.get(entry_point)
    if not callable(fn):
        raise UserCodeError(
            f"stage '{stage_name}': user code must define a function named "
            f"'{entry_point}'. Accepted signatures: {ACCEPTED_SIGNATURES}"
        )
    params = [
        p
        for p in inspect.signature(fn).parameters.values()
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    ]
    if len(params) not in (1, 2):
        raise UserCodeError(
            f"stage '{stage_name}': '{entry_point}' takes {len(params)} "
            f"positional parameters; accepted: {ACCEPTED_SIGNATURES}"
        )
    return fn, len(params) == 2


def dry_run(
    fn: Callable,
    takes_context: bool,
    spark: SparkSession,
    input_schema: T.StructType,
    ctx: Any,
    *,
    stage_name: str,
    is_sink: bool,
) -> T.StructType | None:
    """Deploy-time validation (A8): invoke on an empty DataFrame with the
    declared input schema; returns the (lazily computed) output schema.
    Sinks are only signature-checked — executing a sink writes side effects.
    """
    empty = spark.createDataFrame([], input_schema)
    if is_sink:
        return None
    result = fn(empty, ctx) if takes_context else fn(empty)
    if not isinstance(result, DataFrame):
        raise UserCodeError(
            f"stage '{stage_name}': transform returned "
            f"{type(result).__name__}, expected DataFrame"
        )
    return result.schema
