"""Field-level lineage records (A13).

The reference records a many-to-many input-fields→output-fields operation per
compute stage (``ScalaSparkCompute.java:89-96``) and an external-dataset write
op per field for sinks (``ScalaSparkSink.java:70-75,150-158``, with a
``referenceName`` identifying the external system,
``ScalaSparkSink.java:119-121``). Here each stage emits one JSON-serializable
record; the pipeline accumulates them so callers can export/inspect.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class LineageRecord:
    pipeline: str
    stage: str
    operation: str  # e.g. "source:parquet", "transform:user_code", "sink:parquet"
    input_fields: list[str] = field(default_factory=list)
    output_fields: list[str] = field(default_factory=list)
    reference_name: str | None = None  # sinks: external target identity

    def to_dict(self) -> dict:
        return asdict(self)
