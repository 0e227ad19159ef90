#!/usr/bin/env python
"""Static pre-flight: flag higher-order-function lambdas that reference an
EXPRESSION-valued outer variable.

Spark evaluates HOF lambdas (``transform``/``filter``/``aggregate``/
``zip_with``/``exists``/``forall``/...) in interpreted expression mode with
no common-subexpression elimination: any non-attribute child expression the
lambda body references is re-evaluated PER ELEMENT. A lambda that touches an
inline tokenizer (``F.split``/``F.filter`` bound to a Python variable) turns
a linear pass quadratic — the round-5 probe measured 15-24× on
``text_repetition``/``text_ngram_counts``/``text_pmi_bigrams``/
``dedup_passage_chunks`` before the fix (SCALE.md, "HOF-lambda
re-evaluation pathology"). The fix is always the same: materialize the
array as a COLUMN in a prior projection so the lambda binds an attribute.

Rule: inside a ``F.<hof>(..., lambda ...)`` body, an outer name is a hazard
when the enclosing function assigns it from an ``F.<builder>(...)`` call
other than ``F.col``/``F.lit`` (an unbound expression). Constants,
enclosing-lambda parameters, ``F.col`` handles, and names this scanner
cannot resolve are fine.

Usage: python scripts/hof_lambda_scan.py   # exits 1 on any hazard
Also run by pytest (tests/test_hof_lambda_scan.py) so the gate stays green.
"""

from __future__ import annotations

import ast
import glob
import os
import sys

HOFS = {
    "transform", "filter", "aggregate", "reduce", "zip_with", "exists",
    "forall", "map_filter", "transform_keys", "transform_values",
    "map_zip_with",
}
#: F.<attr> builders whose result is safe to touch per element
SAFE_BUILDERS = {"col", "lit"}

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dynamic_spark_spark",
)


def _expression_assignments(scope: ast.AST) -> dict[str, int]:
    """name -> lineno for names assigned from F.<builder>(...) calls that
    build unbound expressions (anything but F.col/F.lit)."""
    out: dict[str, int] = {}
    for node in ast.walk(scope):
        if not isinstance(node, ast.Assign) or len(node.targets) != 1:
            continue
        tgt = node.targets[0]
        if not isinstance(tgt, ast.Name):
            continue
        val = node.value
        if (
            isinstance(val, ast.Call)
            and isinstance(val.func, ast.Attribute)
            and isinstance(val.func.value, ast.Name)
            and val.func.value.id == "F"
            and val.func.attr not in SAFE_BUILDERS
        ):
            out[tgt.id] = node.lineno
    return out


def scan_file(path: str) -> list[str]:
    src = open(path).read()
    tree = ast.parse(src)
    findings: list[str] = []
    for scope in ast.walk(tree):
        if not isinstance(scope, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        expr_vars = _expression_assignments(scope)
        if not expr_vars:
            continue
        # collect params of every lambda so nested-lambda refs are excused
        lambda_params: set[str] = set()
        for n in ast.walk(scope):
            if isinstance(n, ast.Lambda):
                lambda_params |= {a.arg for a in n.args.args}
        for call in ast.walk(scope):
            if not (
                isinstance(call, ast.Call)
                and isinstance(call.func, ast.Attribute)
                and call.func.attr in HOFS
                and isinstance(call.func.value, ast.Name)
                and call.func.value.id == "F"
            ):
                continue
            for arg in call.args:
                if not isinstance(arg, ast.Lambda):
                    continue
                params = {a.arg for a in arg.args.args}
                flagged: set[str] = set()
                for name_node in ast.walk(arg.body):
                    if (
                        isinstance(name_node, ast.Name)
                        and name_node.id in expr_vars
                        and name_node.id not in params
                        and name_node.id not in lambda_params
                        and name_node.id not in flagged
                    ):
                        flagged.add(name_node.id)
                        rel = os.path.relpath(path, os.path.dirname(PKG))
                        findings.append(
                            f"{rel}:{call.lineno} F.{call.func.attr} lambda "
                            f"references expression-valued '{name_node.id}' "
                            f"(assigned at line {expr_vars[name_node.id]}) — "
                            "materialize it as a column first"
                        )
    return findings


def main() -> int:
    findings: list[str] = []
    for path in sorted(glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True)):
        findings.extend(scan_file(path))
    for f in findings:
        print(f)
    print(f"hof_lambda_scan: {len(findings)} hazard(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
