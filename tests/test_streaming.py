"""Structured Streaming smoke tests (M4): the micro-batch transform contract,
watermarked window aggregation, and stateful dedup — run on bounded file
streams with ``availableNow`` triggers so they terminate deterministically.
"""

from __future__ import annotations

import os
from tests.conftest import dss_mkdtemp

import pytest

from pyspark.sql import functions as F

from dynamic_spark_spark.sources.readers import load_table
from dynamic_spark_spark.streaming.core import (
    file_stream,
    kafka_stream,
    micro_batch_transform,
    sessionized,
    stateful_dedup,
    windowed_counts,
)


def _await_drained(q, timeout: int = 120, total: int = 900) -> None:
    """Wait for an ``availableNow`` drain to actually terminate before the
    test reads the sink. ``awaitTermination(timeout)`` returns False on
    timeout without raising; the old unchecked form silently read a partial
    memory table on a degraded box (the r13 driver gate failure). Keep
    waiting up to ``total`` seconds and fail loudly otherwise."""
    import time

    deadline = time.monotonic() + total
    while not q.awaitTermination(timeout):
        if time.monotonic() >= deadline:
            q.stop()
            raise AssertionError(
                f"stream query {q.name!r} did not terminate within {total}s"
            )


def _events_stream(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    staged = dss_mkdtemp("dss_stream_src_")
    batch.write.mode("overwrite").parquet(staged)
    return batch, file_stream(spark, staged, batch.schema)


def test_micro_batch_transform_contract(spark, sf_dir):
    """The same batch transform runs per micro-batch (reference data-streams
    parity): results collected via foreachBatch equal the batch run."""
    batch, stream = _events_stream(spark, sf_dir)

    def transform(df):
        return df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    seen: dict[str, int] = {}

    def sink(df, batch_id):
        for r in df.collect():
            seen[r["event_type"]] = seen.get(r["event_type"], 0) + r["n"]

    q = micro_batch_transform(stream, transform, sink=sink)
    _await_drained(q, 120)
    expected = {r["event_type"]: r["n"] for r in transform(batch).collect()}
    assert seen == expected


def test_windowed_counts_stream(spark, sf_dir):
    batch, stream = _events_stream(spark, sf_dir)
    out = windowed_counts(stream, ts_col="ts", window="10 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, 120)
    got = spark.table("win_counts")
    # watermark finalizes all but the trailing windows; compare totals loosely
    batch_windows = (
        batch.groupBy(F.window("ts", "10 minutes")).count().count()
    )
    assert 0 < got.count() <= batch_windows


def test_stateful_dedup_stream(spark, sf_dir):
    batch, stream = _events_stream(spark, sf_dir)
    out = stateful_dedup(stream, ["user_id"], ts_col="ts", watermark="10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, 120)
    got = spark.table("dedup_out")
    n_users = batch.select("user_id").distinct().count()
    assert got.count() == n_users


def test_sessionized_stream_runs(spark, sf_dir):
    batch, stream = _events_stream(spark, sf_dir)
    out = sessionized(stream, "user_id", ts_col="ts", gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, 120)
    assert spark.table("sessions_out").columns == ["user_id", "session_start", "n_events"]


def test_stateful_running_totals_stream(spark, sf_dir, tmp_path):
    """applyInPandasWithState accumulates per-key state across micro-batches:
    two input files arrive as separate batches; the final update per key must
    equal the full-batch aggregate."""
    from dynamic_spark_spark.streaming.core import file_stream, stateful_running_totals

    ev = load_table(spark, sf_dir, "events").select("event_type", "value").limit(2000)
    src = str(tmp_path / "src")
    ev.limit(1000).write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)  # second file → second micro-batch

    stream = file_stream(spark, src, ev.schema, maxFilesPerTrigger="1")
    out = stateful_running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    _await_drained(q, 120)

    batch = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # last update per key holds the cumulative state
    final = {
        r["key"]: r["n"]
        for r in spark.sql(
            "SELECT key, MAX(n) AS n FROM running_totals GROUP BY key"
        ).collect()
    }
    assert final == batch


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="no Kafka broker / spark-sql-kafka connector in this environment",
)
def test_kafka_stream_live(spark):
    """Live Kafka subscribe — runs only where KAFKA_BOOTSTRAP points at a
    reachable broker with the connector on the classpath."""
    df = kafka_stream(spark, os.environ["KAFKA_BOOTSTRAP"], "dss-test-topic")
    q = df.writeStream.format("memory").queryName("kafka_smoke").start()
    q.awaitTermination(30)
    q.stop()


def test_kafka_stream_plan_shape(spark):
    """Without a broker the reader still CONSTRUCTS: the declarative wrapper
    must produce the typed projection plan (connector resolution happens at
    load, so absence of the package raises — acceptable proof of shape is the
    options/projection code path up to that error)."""
    try:
        df = kafka_stream(spark, "localhost:9092", "t", maxOffsetsPerTrigger="100")
    except Exception as e:  # connector jar absent in sandbox
        assert "kafka" in str(e).lower()
        return
    assert set(df.columns) >= {"key", "value", "topic", "partition", "offset", "timestamp"}


def test_stream_dedup_live_key(spark, sf_dir):
    """The registered live dedup key: per-key uniqueness must match the batch
    distinct over the same columns."""
    from dynamic_spark_spark.registry import load_all_queries

    qs = load_all_queries()
    got = {
        r["event_type"]: r["n_unique_users"]
        for r in qs["stream_dedup_live"](spark, sf_dir).collect()
    }
    expected = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_stateful_sessions_event_time_timer(spark, sf_dir, tmp_path):
    """Arbitrary-state SESSIONS with an event-time timer, live and
    un-skipped: two micro-batches of real events flow through
    applyInPandasWithState (EventTimeTimeout); every emitted session must
    exactly match batch gap-session truth, and every truth session whose
    horizon the final watermark passed must have been emitted (the trailing
    open session per key may legitimately still be in state — a session is
    only final when late data can no longer reopen it)."""
    from dynamic_spark_spark.streaming.core import file_stream, stateful_sessions

    gap_s, wm_s = 1800, 1800
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 40)
        .select("user_id", "ts", "value")
    )
    pdf = ev.toPandas().sort_values(["user_id", "ts"])
    # two micro-batches split by TIME so the watermark genuinely advances
    cut = pdf["ts"].quantile(0.5)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf[pdf["ts"] <= cut], ev.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(pdf[pdf["ts"] > cut], ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = stateful_sessions(
        file_stream(spark, src, ev.schema, maxFilesPerTrigger="1"),
        gap_seconds=gap_s,
        watermark=f"{wm_s} seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dss_custom_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    _await_drained(q, 300)
    q.stop()
    got = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"], r["value_sum"])
        for r in spark.table("dss_custom_sessions").collect()
    }

    # batch truth: pandas gap-split per user
    truth = set()
    for uid, g in pdf.groupby("user_id"):
        cur = None
        for ts, val in zip(g["ts"], g["value"]):
            t = ts.to_pydatetime()
            if cur is None:
                cur = [t, t, 1, float(val)]
            elif (t - cur[1]).total_seconds() <= gap_s:
                cur = [cur[0], max(cur[1], t), cur[2] + 1, cur[3] + float(val)]
            else:
                truth.add((uid, cur[0], cur[1], cur[2], round(cur[3], 6)))
                cur = [t, t, 1, float(val)]
        if cur is not None:
            truth.add((uid, cur[0], cur[1], cur[2], round(cur[3], 6)))

    got_r = {(k, s, e, n, round(v, 6)) for k, s, e, n, v in got}
    assert got_r <= truth, f"spurious sessions: {sorted(got_r - truth)[:3]}"
    # sessions whose gap horizon the final watermark passed MUST be emitted
    final_wm = pdf["ts"].max().to_pydatetime()
    import datetime

    must_emit = {
        s
        for s in truth
        if s[2] + datetime.timedelta(seconds=gap_s + wm_s) < final_wm
    }
    assert must_emit <= got_r, f"missing finalized: {sorted(must_emit - got_r)[:3]}"
    assert len(got_r) > 0


def test_transform_with_state_totals(spark, sf_dir):
    """Arbitrary-state v2 (transformWithStateInPandas): runs live when the
    protobuf wheel is present, else skips naming the missing dependency —
    the declared-surface closure test, like the Kafka wrapper's."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    import shutil

    from dynamic_spark_spark.sources.readers import load_table
    from dynamic_spark_spark.streaming.core import (
        file_stream,
        transform_with_state_totals,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    src = dss_mkdtemp("dss_tws_src_")
    ckpt = dss_mkdtemp("dss_tws_ckpt_")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev.write.mode("overwrite").parquet(src)
        q = (
            transform_with_state_totals(file_stream(spark, src, ev.schema))
            .writeStream.format("memory")
            .queryName("dss_tws_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        _await_drained(q, 300)
        q.stop()
        got = {
            r["key"]: r["n"]
            for r in spark.sql(
                "SELECT key, MAX(n) AS n FROM dss_tws_totals GROUP BY key"
            ).collect()
        }
        want = {
            r["event_type"]: r["count"]
            for r in ev.groupBy("event_type").count().collect()
        }
        assert got == want
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart from the same checkpoint must not double-count:
    batch 1 streams through a windowed aggregate, the query stops, MORE
    files land in the source, and a NEW query object resumes from the same
    checkpoint — final per-type counts equal the batch ground truth over
    both file sets (no reprocessing of batch 1, no loss of batch 2). This is
    the recovery contract a 1000-executor job relies on after any failure."""
    from pyspark.sql import functions as F

    from dynamic_spark_spark.sources.readers import load_table
    from dynamic_spark_spark.streaming.core import file_stream

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    first = ev.filter(F.col("value") < 50)
    second = ev.filter(F.col("value") >= 50)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    first.write.mode("overwrite").parquet(src)

    def run_round() -> None:
        q = (
            file_stream(spark, src, ev.schema)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("dss_restart_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        _await_drained(q, 300)
        q.stop()

    run_round()
    # more data lands after the first query is gone; resume from checkpoint
    second.write.mode("append").parquet(src)
    run_round()

    got = {
        r["event_type"]: r["n"]
        for r in spark.sql("SELECT event_type, n FROM dss_restart_counts").collect()
    }
    want = {
        r["event_type"]: r["count"] for r in ev.groupBy("event_type").count().collect()
    }
    assert got == want


def test_session_window_merges_across_batches(spark, tmp_path):
    """Cross-batch session MERGE: two events land in batch 1, a third event
    inside the 30-minute gap lands in batch 2 — the live engine must merge
    the open session across micro-batches into one (3-event) session. The
    oracle-checked key ``stream_session_live`` drains in a single batch by
    design; this pins the multi-batch state-merge path it documents."""
    import datetime as dt

    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_file(name, rows):
        spark.createDataFrame(rows, "user_id bigint, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    write_file("f1", [(1, t0), (1, t0 + dt.timedelta(minutes=10))])
    write_file(
        "f2",
        [
            (1, t0 + dt.timedelta(minutes=20)),  # merges into f1's session
            (2, t0 + dt.timedelta(hours=3)),  # separate user, separate session
        ],
    )
    os.utime(src / "f2")  # newer mtime => file source orders f1 before f2
    q = (
        file_stream(
            spark,
            str(src / "*"),
            "user_id bigint, ts timestamp",
            maxFilesPerTrigger="1",
        )
        .withWatermark("ts", "10 days")  # nothing is ever late in this test
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s"),
            F.col("session_window.end").alias("e"),
            "n_events",
        )
        .writeStream.format("memory")
        .queryName("dss_session_merge")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    _await_drained(q, 300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    got = {
        (r["user_id"], r["s"], r["e"]): r["n_events"]
        for r in spark.table("dss_session_merge").collect()
    }
    assert n_batches >= 2, "merge must span micro-batches"
    assert got == {
        (1, t0, t0 + dt.timedelta(minutes=50)): 3,
        (
            2,
            t0 + dt.timedelta(hours=3),
            t0 + dt.timedelta(hours=3, minutes=30),
        ): 1,
    }


def test_stateful_total_merge_null_semantics(spark, tmp_path):
    """The mapInPandas combiner in stream_stateful_totals must keep Spark
    GROUP BY semantics on nullable input: NULL keys form a group (pandas
    groupby drops them by default), n counts ROWS (the oracle's COUNT(*)),
    and sum skips NULL values like Spark's SUM — pinned differentially
    against DuckDB on a synthetic events table the fixtures can't cover."""
    import duckdb

    from dynamic_spark_spark.streaming.batch_equiv import stream_stateful_totals

    rows = [
        ("click", 1.0), ("click", None), ("view", 2.5),
        (None, 3.0), (None, None), ("view", None), ("click", 4.0),
    ]
    spark.createDataFrame(
        rows, "event_type string, value double"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_type"]: r["n_events"]
        for r in stream_stateful_totals(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = dict(
        con.execute(
            "SELECT event_type, COUNT(*) FROM events GROUP BY event_type"
        ).fetchall()
    )
    assert got == want, (got, want)


def test_stateful_total_merge_nonstring_key_schema(spark):
    """stateful_total_merge derives the key field's type from the input
    schema (r6 advice) — a long key must round-trip as long in both the
    combiner partials and the merged output, not coerce to string. Schema
    derivation is plan-time, so a never-started rate stream suffices."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from dynamic_spark_spark.streaming.core import stateful_total_merge

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            (F.col("value") % 5).alias("bucket_id"),
            F.col("value").cast("double").alias("value"),
        )
    )
    out = stateful_total_merge(stream, key_col="bucket_id", val_col="value")
    assert isinstance(out.schema["key"].dataType, LongType), out.schema
    assert [f.name for f in out.schema.fields] == ["key", "n", "total"]


def test_drain_parallelism_sizes_to_staged_bytes(spark, tmp_path):
    """r8 review hardening: the drain width derives from the staged source
    size — kilobyte verification drains get the floor (4), scale-probe-
    sized staging gets the full session width, an explicit n wins, and the
    previous setting is restored even on failure."""
    from dynamic_spark_spark.streaming.core import (
        DRAIN_BYTES_PER_PARTITION,
        drain_parallelism,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    small = tmp_path / "small"
    small.mkdir()
    (small / "part-0").write_bytes(b"x" * 1024)
    with drain_parallelism(spark, src=str(small)):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev

    big = tmp_path / "big"
    big.mkdir()
    # (cores + 8) partitions' worth of staged bytes -> capped at the
    # session core count whatever SPARK_GRAFT_CPUS the session runs with
    cores = spark.sparkContext.defaultParallelism
    (big / "part-0").write_bytes(b"\0" * ((cores + 8) * DRAIN_BYTES_PER_PARTITION))
    with drain_parallelism(spark, src=str(big)):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(cores)

    with drain_parallelism(spark, n=7):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"

    try:
        with drain_parallelism(spark, src=str(small)):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
