#!/usr/bin/env python
"""Driver-canon hazard scan: build EVERY registered key's DataFrame and
report any top-level complex-typed (array/map/struct) output column — the
one output shape the per-round driver harness cannot canonicalize (its
pandas ``sort_values`` over all columns crashes on unhashable cells; see
the r1 ``agg_collect`` and r4 ``text_fingerprint``/``multimodal_*``
failures). Run before each round so the NEXT round's verification window
is pre-cleared, not just the current one.

Usage: PYTHONPATH=. python scripts/schema_scan.py [sf_dir]

Exit non-zero if any hazard is found. Note: building a DataFrame executes
eager work for a few keys (streaming drains, model fits), so this costs
minutes, not seconds — it is a pre-flight tool, not a unit test.
"""

from __future__ import annotations

import json
import sys
import traceback

from pyspark.sql.types import ArrayType, MapType, StructType

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    from dynamic_spark_spark.registry import load_all_queries
    from dynamic_spark_spark.session import get_spark

    spark = get_spark("dss-schema-scan")
    spark.sparkContext.setLogLevel("ERROR")
    hazards: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, fn in load_all_queries().items():
        try:
            df = fn(spark, SF_DIR)
        except Exception:
            errors[name] = traceback.format_exc(limit=1).splitlines()[-1]
            continue
        bad = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            hazards[name] = bad
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "keys_scanned": "all-registered",
                "complex_typed_outputs": hazards,
                "build_errors": errors,
            },
            indent=2,
        )
    )
    spark.stop()
    return 1 if (hazards or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
