"""CLI entry point: run / validate JSON pipeline specs, list query keys.

The reference engine is entirely config-driven — a user authors a JSON
pipeline (stages with inline user code / SQL / sink configs) and the
platform deploy-validates then runs it (``ScalaSparkCompute.java:60-120``
configurePipeline vs run lifecycle). This module is that lifecycle as a
command line:

    python -m dynamic_spark_spark validate pipeline.json --arg run_date=...
    python -m dynamic_spark_spark run pipeline.json --arg run_date=...
    python -m dynamic_spark_spark list-keys [--tag llm-text]

``validate`` is the deploy-time contract: macro substitution + shape check +
user-code compile + schema-compatibility propagation WITHOUT reading data
(`Pipeline.validate`), exit 1 on any collected problem. ``run`` executes and
prints per-stage observed metrics (rows, nulls, sums) as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_args(pairs: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"--arg expects k=v, got {p!r}")
        k, _, v = p.partition("=")
        out[k] = v
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dynamic_spark_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for cmd in ("run", "validate"):
        p = sub.add_parser(cmd)
        p.add_argument("spec", help="path to pipeline spec JSON")
        p.add_argument(
            "--arg",
            action="append",
            default=[],
            metavar="K=V",
            help="runtime macro value for ${K} placeholders (repeatable)",
        )
        p.add_argument(
            "--explain",
            action="store_true",
            help="print the composed plan's formatted physical explain to"
            " stderr before executing (run) or after validating (validate)",
        )

    lk = sub.add_parser("list-keys")
    lk.add_argument("--tag", default=None, help="filter by SURVEY category tag")

    ns = ap.parse_args(argv)

    if ns.cmd == "list-keys":
        from dynamic_spark_spark.registry import ORACLE, TAGS, load_all_queries

        for name in sorted(load_all_queries()):
            if ns.tag and TAGS.get(name) != ns.tag:
                continue
            kind = "oracle" if name in ORACLE else "rows-only"
            print(f"{name}\t{TAGS.get(name, 'other')}\t{kind}")
        return 0

    with open(ns.spec) as f:
        spec = json.load(f)
    runtime_args = _parse_args(ns.arg)

    from dynamic_spark_spark.plans.pipeline import Pipeline, PipelineValidationError
    from dynamic_spark_spark.session import get_spark

    try:
        pipe = Pipeline(spec, runtime_args=runtime_args)
    except PipelineValidationError as e:
        print(json.dumps({"ok": False, "errors": e.errors}))
        return 1

    spark = get_spark(f"dss-cli-{pipe.spec.name}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        problems = pipe.validate(spark)
        if problems:
            print(
                json.dumps(
                    {
                        "ok": False,
                        "errors": [
                            f"{p.stage}.{p.field}: {p.problem}" for p in problems
                        ],
                    }
                )
            )
            return 1
        if ns.cmd == "validate":
            print(json.dumps({"ok": True, "stages": len(pipe.spec.stages)}))
            return 0
        result = pipe.run(spark)
        if ns.explain and result is not None:
            # debugging surface: the composed single-DataFrame plan (the
            # design stance — stages fuse into ONE Catalyst plan)
            print(
                result._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ),
                file=sys.stderr,
            )
        print(
            json.dumps(
                {
                    "ok": True,
                    "pipeline": pipe.spec.name,
                    "metrics": pipe.metrics(),
                    "lineage": [
                        r.operation
                        + (f":{r.reference_name}" if r.reference_name else "")
                        for r in pipe.lineage
                    ],
                }
            )
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
