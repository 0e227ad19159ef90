"""Schema compatibility validation (A6).

The reference checks a configured output schema against the actual DataFrame
schema and collects a validation failure on mismatch
(``ScalaSparkCompute.java:115-120`` → ``FailureCollector``). Same semantics
here: name-wise field match, type equality, and nullability *widening*
allowed (a non-nullable actual may satisfy a nullable declaration — CDAP
schemas are nullable-by-default, ``ScalaSparkTest.java:308``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass
class SchemaIncompatibility:
    stage: str
    field: str
    problem: str


def check_schema_compatible(
    declared: T.StructType, actual: T.StructType, *, stage: str
) -> list[SchemaIncompatibility]:
    """Collect (not raise) incompatibilities between declared and actual."""
    problems: list[SchemaIncompatibility] = []
    actual_by_name = {f.name: f for f in actual.fields}
    for want in declared.fields:
        got = actual_by_name.get(want.name)
        if got is None:
            problems.append(SchemaIncompatibility(stage, want.name, "missing in actual schema"))
            continue
        if got.dataType != want.dataType:
            problems.append(
                SchemaIncompatibility(
                    stage,
                    want.name,
                    f"type {got.dataType.simpleString()} != declared "
                    f"{want.dataType.simpleString()}",
                )
            )
        if got.nullable and not want.nullable:
            problems.append(
                SchemaIncompatibility(
                    stage, want.name, "actual is nullable but declared non-nullable"
                )
            )
    extra = set(actual_by_name) - {f.name for f in declared.fields}
    for name in sorted(extra):
        problems.append(SchemaIncompatibility(stage, name, "unexpected extra field"))
    return problems
