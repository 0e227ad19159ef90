"""Pipeline specification: the declarative stage graph.

Replaces CDAP's ETLBatchConfig JSON (reference ``ScalaSparkTest.java:320-330``:
source → compute → sink) with a plain Python/JSON spec. Stage types:

- ``source``: a driver table (``table``) or a format reader (``format`` +
  ``path`` + ``options``);
- ``transform``: built-in op by name (``op`` + params) or dynamic user code
  (``code`` — the A1/A7 analog, see plans/usercode.py);
- ``sink``: format writer (``format``/``path``/``mode``/``partition_by``) or
  user code (terminal, returns None — the A2 analog,
  ``ScalaSparkSink.java:89-99``).

Macro substitution (the A14 analog: ``@Macro`` fields substituted from
runtime args, ``ScalaSparkCompute.java:143,152,159``;
``docs/PySparkProgram-sparkprogram.md:45-47`` ``${input.path}``): every string
field may contain ``${name}`` placeholders resolved from a runtime-args dict
before stage construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

_MACRO_RE = re.compile(r"\$\{([^}]+)\}")


class MacroError(KeyError):
    """A ``${...}`` placeholder had no value in the runtime args."""


def substitute_macros(value: Any, runtime_args: dict[str, str]) -> Any:
    """Recursively substitute ``${name}`` in strings (A14 analog)."""
    if isinstance(value, str):

        def repl(m: re.Match) -> str:
            key = m.group(1)
            if key not in runtime_args:
                raise MacroError(f"macro ${{{key}}} has no runtime value")
            return str(runtime_args[key])

        return _MACRO_RE.sub(repl, value)
    if isinstance(value, dict):
        return {k: substitute_macros(v, runtime_args) for k, v in value.items()}
    if isinstance(value, list):
        return [substitute_macros(v, runtime_args) for v in value]
    return value


@dataclass
class StageSpec:
    """One pipeline stage.

    ``output_schema`` is an optional Spark DDL string (``"a INT, b STRING"``)
    — the analog of the reference's per-stage CDAP Schema JSON
    (``ScalaSparkCompute.java:67``). When omitted, the stage's output schema
    propagates from the input / is inferred from the result DataFrame
    (``ScalaSparkCompute.java:66-68,110-113`` behavior).
    """

    name: str
    type: str  # source | transform | sink
    params: dict[str, Any] = field(default_factory=dict)
    output_schema: str | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "StageSpec":
        known = {"name", "type", "output_schema"}
        params = d.get("params") or {k: v for k, v in d.items() if k not in known}
        return cls(
            name=d["name"],
            type=d["type"],
            params=params,
            output_schema=d.get("output_schema"),
        )


@dataclass
class PipelineSpec:
    """Ordered stage list over a single lazily-composed DataFrame."""

    stages: list[StageSpec]
    name: str = "pipeline"

    @classmethod
    def from_dict(cls, d: dict[str, Any], runtime_args: dict[str, str] | None = None) -> "PipelineSpec":
        d = substitute_macros(d, runtime_args or {})
        return cls(
            name=d.get("name", "pipeline"),
            stages=[StageSpec.from_dict(s) for s in d["stages"]],
        )

    def validate_shape(self) -> list[str]:
        """Structural errors (collected, not raised — FailureCollector style,
        ``ScalaSparkCompute.java:115-120``)."""
        errors: list[str] = []
        if not self.stages:
            return ["pipeline has no stages"]
        if self.stages[0].type != "source":
            errors.append(f"first stage '{self.stages[0].name}' must be a source")
        for s in self.stages[1:-1]:
            if s.type != "transform":
                errors.append(f"middle stage '{s.name}' must be a transform, got {s.type}")
        for s in self.stages:
            if s.type not in ("source", "transform", "sink"):
                errors.append(f"stage '{s.name}' has unknown type {s.type!r}")
        seen: set[str] = set()
        for s in self.stages:
            if s.name in seen:
                errors.append(f"duplicate stage name '{s.name}'")
            seen.add(s.name)
        return errors
