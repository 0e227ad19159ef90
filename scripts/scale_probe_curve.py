#!/usr/bin/env python
"""Round-5 follow-up probe: the dedup threshold-calibration sweep, blocked
vs production form, at replica scale.

The round-5 relational wave caught `dedup_threshold_curve` going
2.8 s → 277 s for 10× data — quadratic, because the registered key uses
the label-blocked all-pairs join (the oracle-expressible, bit-exact form)
and the label vocabulary is fixed, so blocks grow linearly with the
corpus and pairs quadratically. That is the key's declared contract, not
a plan bug; this probe measures the PRODUCTION form
(`dedup_threshold_curve_lsh`: capped LSH buckets → Arrow-batched exact
cosine → same sweep) next to it to show the rollout path is linear.

Usage: PYTHONPATH=. python scripts/scale_probe_curve.py [replicas ...]
Stages key-shifted replicas of embeddings only (labels intentionally NOT
shifted — a bigger real corpus reuses the same label vocabulary, which is
exactly what makes the blocked form quadratic).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
SHIFT = 1_000_000_000


def main() -> None:
    replicas_list = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    from dynamic_spark_spark.llmops.similarity import dedup_threshold_curve_lsh
    from dynamic_spark_spark.registry import load_all_queries
    from dynamic_spark_spark.session import get_spark

    spark = get_spark("dss-curve-probe")
    spark.sparkContext.setLogLevel("ERROR")
    blocked = load_all_queries()["dedup_threshold_curve"]
    for replicas in replicas_list:
        out = tempfile.mkdtemp(prefix="dss_curve_")
        try:
            base = spark.read.parquet(f"{SRC}/embeddings.parquet")
            scaled = base.crossJoin(
                spark.range(replicas).select(F.col("id").alias("__rep"))
            ).withColumn("vec_id", F.col("vec_id") + F.col("__rep") * SHIFT)
            scaled.drop("__rep").write.mode("overwrite").parquet(
                f"{out}/embeddings.parquet"
            )
            n = spark.read.parquet(f"{out}/embeddings.parquet").count()
            timings = {}
            for name, fn in (("lsh_production", dedup_threshold_curve_lsh),) + (
                # blocked form only at small multipliers — it is the
                # measured quadratic; 100x would be ~hours by extrapolation
                (("blocked_oracle_form", blocked),) if replicas <= 10 else ()
            ):
                fn(spark, out).write.mode("overwrite").format("noop").save()  # warm
                t0 = time.perf_counter()
                fn(spark, out).write.mode("overwrite").format("noop").save()
                timings[name] = round(time.perf_counter() - t0, 2)
            print(
                json.dumps(
                    {"replicas": replicas, "embedding_rows": n, "sec": timings}
                )
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
