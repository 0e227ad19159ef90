"""SparkSession construction and tuning.

The reference caches a per-thread ``SQLContext``
(``ScalaSparkCodeExecutor.java:250-265``); in PySpark this collapses to
``SparkSession.builder.getOrCreate()`` plus a set of runtime configs applied
idempotently by :func:`tune`.

Scale posture (100 TB target): AQE on (runtime shuffle-partition coalescing +
skew-join splitting), UTC session time zone (oracle parity), Arrow for any
Python interchange, and shuffle partitions sized for the local test harness
but safe at cluster scale because AQE re-coalesces.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to any session we are handed (the driver
# constructs its own SparkSession for verification, so everything here must be
# settable post-creation).
RUNTIME_CONF = {
    # Deterministic timestamp rendering; matches DuckDB's naive-UTC timestamps.
    "spark.sql.session.timeZone": "UTC",
    # The events table stores TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects; read as long nanos and convert explicitly (sources/readers.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Adaptive execution: coalesce shuffle partitions + split skewed joins at
    # runtime — the key knob for the 100 TB posture.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDF / toPandas interchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Smaller scan splits: the test tables are compact single files and the
    # default 128 MB split gives a near-sequential scan; 8 MB spreads the
    # scan across cores. At cluster scale AQE coalesces any over-split reads.
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply engine runtime configs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable on this build — keep going; defaults are sane.
            pass
    return spark


from contextlib import contextmanager


@contextmanager
def scoped_conf(spark: SparkSession, **confs: str):
    """Temporarily override runtime SQL confs (restored on exit). Used by
    operators whose working set is structurally tiny regardless of input
    scale — e.g. iterative algorithms on a domain²-bounded edge table, or a
    stream-stream join at verification volume — where the session-wide
    shuffle-partition count only buys scheduler overhead per round. Keys are
    passed python-style (``sql_shuffle_partitions``) and mapped to dotted
    conf names."""
    mapped = {k.replace("_", "."): v for k, v in confs.items()}
    saved = {}
    for k, v in mapped.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                # conf was unset before we touched it — restore that state,
                # otherwise the scoped override leaks into subsequent keys
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass


def get_spark(app_name: str = "dynamic-spark-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a tuned local session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) else all cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(32, cpus)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return tune(builder.getOrCreate())
