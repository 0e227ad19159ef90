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

    def visit(node: ast.AST, expr_vars: dict[str, int], enclosing: frozenset[str]) -> None:
        """Walk with the stack of ENCLOSING lambda params — only params of
        lambdas the HOF lambda is nested inside excuse a name (a same-named
        param of an unrelated lambda elsewhere in the function must not)."""
        if isinstance(node, ast.Lambda):
            enclosing = enclosing | {a.arg for a in node.args.args}
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in HOFS
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "F"
        ):
            # lambdas may arrive positionally or as keywords (f=..., merge=...)
            lambdas = [a for a in node.args if isinstance(a, ast.Lambda)]
            lambdas += [k.value for k in node.keywords if isinstance(k.value, ast.Lambda)]
            for lam in lambdas:
                params = enclosing | {a.arg for a in lam.args.args}
                flagged: set[str] = set()
                for name_node in ast.walk(lam.body):
                    if (
                        isinstance(name_node, ast.Name)
                        and name_node.id in expr_vars
                        and name_node.id not in params
                        and name_node.id not in flagged
                    ):
                        flagged.add(name_node.id)
                        rel = os.path.relpath(path, os.path.dirname(PKG))
                        findings.append(
                            f"{rel}:{node.lineno} F.{node.func.attr} lambda "
                            f"references expression-valued '{name_node.id}' "
                            f"(assigned at line {expr_vars[name_node.id]}) — "
                            "materialize it as a column first"
                        )
        for child in ast.iter_child_nodes(node):
            visit(child, expr_vars, enclosing)

    for scope in ast.walk(tree):
        if not isinstance(scope, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        expr_vars = _expression_assignments(scope)
        if expr_vars:
            visit(scope, expr_vars, frozenset())
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
