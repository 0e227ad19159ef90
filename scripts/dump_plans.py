#!/usr/bin/env python
"""Dump .explain("formatted") for named query keys into plans/<dir>/.

Usage: PYTHONPATH=. python scripts/dump_plans.py <dir> <suffix> <key> [<key>...]
e.g.   PYTHONPATH=. python scripts/dump_plans.py r14 before dedup_containment

Writes plans/<dir>/<key>_<suffix>.txt for each key — the per-round
before/after plan evidence the optimization rounds commit.
"""

from __future__ import annotations

import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    from dynamic_spark_spark.registry import load_all_queries
    from dynamic_spark_spark.session import get_spark

    spark = get_spark("dss-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all_queries()
    jvm = spark.sparkContext._jvm
    os.makedirs(os.path.join("plans", out_dir), exist_ok=True)
    for name in keys:
        df = queries[name](spark, SF_DIR)
        txt = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join("plans", out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{path}: {n_ex} Exchange mentions")
    spark.stop()


if __name__ == "__main__":
    main()
