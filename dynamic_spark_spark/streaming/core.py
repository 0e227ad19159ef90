"""Structured Streaming parity (SURVEY.md §2.C Streaming; M4).

The reference registers its plugins into the ``cdap-data-streams`` parent
(``pom.xml:30``): the same ``transform(df)`` contract applied per micro-batch.
Native analog: a streaming source + the SAME user/transform callable applied
either directly on the unbounded DataFrame (fully incremental when the ops
are streaming-compatible) or per micro-batch via ``foreachBatch`` (exact
batch semantics, the closest match to the reference's model).

Helpers cover the declared streaming surface: tumbling/sliding/session
window aggs, watermark + late-data policy, stateful dedup.
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


#: staged bytes per state partition, floored at 4 (state-machinery cost
#: amortizes) and capped at the session core count: verification drains
#: (≤1 MB staged) get 4 partitions, a 10× probe (~10 MB) gets ~10, a 100×
#: probe (~100 MB) the full width. Width-sensitivity was probed at 100×
#: (r8): stream_stateful_totals reproduced its r6 number under the sized
#: drain (4.97 s vs 4.6), and stream_session_live measured the SAME
#: 102-164 s band at width 21 and width 32 — its cost is the documented
#: driver-side complete-mode sink materialization, not state parallelism.
DRAIN_BYTES_PER_PARTITION = 1 << 20


def _dir_bytes(path: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


@contextmanager
def drain_parallelism(spark: SparkSession, n: int | None = None, src: str | None = None):
    """Scope ``spark.sql.shuffle.partitions`` around a bounded drain,
    SIZED TO THE STAGED DATA. A stateful streaming query instantiates one
    state store (plus its checkpoint tree, commit files, and maintenance
    thread) per shuffle partition, fixed at the query's FIRST micro-batch
    — so a 32-way drain of a kilobyte file stream spends several times
    longer creating state machinery than processing rows (measured r8 at
    sf0.01: ``stream_session_live`` 5.4 s → 1.6 s,
    ``stream_stateful_totals`` 4.1 s → 1.3 s, identical output). But a
    CONSTANT small width would throttle the same keys under the 10×/100×
    scale probes (review-hardened r8), so when ``src`` (the staged source
    dir) is given the width derives from its byte size: one partition per
    ``DRAIN_BYTES_PER_PARTITION``, floor 4, capped at the session's core
    count — exactly how production sizes state parallelism to stream
    volume before first start. The final state is partition-count-
    invariant, which the oracle-checked live keys prove every round.
    Restores the previous value even when the drain dies; post-drain sink
    reads execute outside the scope at the session default."""
    if n is None:
        width = 4
        if src is not None:
            width = max(4, _dir_bytes(src) // DRAIN_BYTES_PER_PARTITION)
        n = min(spark.sparkContext.defaultParallelism, width)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Built-in rate source — the test stream (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def file_stream(
    spark: SparkSession, path: str, schema, fmt: str = "parquet", **options: str
) -> DataFrame:
    """File-arrival streaming source (the analog of ``sc.fromStream``,
    ``docs/ScalaSparkProgram-sparkprogram.md:32``). ``options`` pass through
    to the reader (e.g. ``maxFilesPerTrigger`` to bound batch size)."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    value_schema=None,
    **options: str,
) -> DataFrame:
    """Kafka streaming source (SURVEY §2.C streaming row: "rate, file,
    kafka"; the reference rides the micro-batch streams parent,
    ``pom.xml:30``). Thin declarative wrapper over Spark's built-in
    ``format("kafka")``: subscribes to ``topics``, passes every extra option
    through verbatim (auth, maxOffsetsPerTrigger for batch-size bounding,
    etc.), and projects the payload to typed columns. If ``value_schema`` is
    given the JSON value is parsed into a ``data`` struct column.

    Requires the ``spark-sql-kafka`` connector package on the classpath and a
    reachable broker — neither exists in this sandbox, so the unit test is
    skip-marked; the plan construction below is still the full production
    path (scale note: Kafka partitions map 1:1 to input tasks, so topic
    partition count bounds source parallelism)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load().select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )
    if value_schema is not None:
        df = df.withColumn("data", F.from_json("value", value_schema))
    return df


def micro_batch_transform(
    stream_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    *,
    sink: Callable[[DataFrame, int], None],
    trigger_once: bool = True,
) -> StreamingQuery:
    """Apply a batch transform per micro-batch (``foreachBatch``) — the exact
    semantics of the reference's micro-batch compute stage: each batch is a
    bounded DataFrame, the user callable runs unmodified."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(transform(batch_df), batch_id)

    writer = stream_df.writeStream.foreachBatch(process).outputMode("update")
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "timestamp",
    window: str = "10 seconds",
    slide: str | None = None,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Tumbling/sliding window count with watermark-bounded state."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )


def sessionized(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str = "timestamp",
    gap: str = "30 seconds",
    watermark: str = "1 minute",
) -> DataFrame:
    """Session windows with watermark — state is bounded by the watermark:
    sessions older than (max event time - watermark) finalize and evict."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


def stateful_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of the key within the watermark
    horizon (``dropDuplicates`` + watermark ⇒ bounded state)."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def stateful_running_totals(
    stream_df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
) -> DataFrame:
    """Arbitrary custom state (``applyInPandasWithState``): a per-key running
    (count, total) maintained across micro-batches in engine-managed state —
    the fully general stateful operator beyond what windows/dedup express.
    State is per-key and partition-local (keys hash across the cluster), so
    it scales with distinct keys, not event volume; Arrow moves each batch
    group to Python in one vectorized block, never row-at-a-time."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    def update_totals(key: tuple, pdfs, state: GroupState):
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf[val_col].sum())
            n += int(len(pdf))
        state.update((total, n))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    # key type derived from the input schema (r6 advice, applied to the
    # combined twin first; r7 review: the twins must stay schema-identical)
    key_field = stream_df.schema[key_col]
    return stream_df.groupBy(key_col).applyInPandasWithState(
        update_totals,
        outputStructType=StructType(
            [
                StructField("key", key_field.dataType, key_field.nullable),
                StructField("n", LongType()),
                StructField("total", DoubleType()),
            ]
        ),
        stateStructType="total double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_total_merge(
    stream_df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
) -> DataFrame:
    """:func:`stateful_running_totals` with a COMBINER: the stateful operator
    hashes on the key, so a bounded key domain (|event_type| values) caps
    its parallelism at |keys| no matter the event volume. A stateless
    ``mapInPandas`` partial-reduce runs first at full scan parallelism and
    emits (key, n, total) per input partition; the ``applyInPandasWithState``
    merge then sums PARTIALS — (partitions × keys) rows per batch instead of
    the event stream — keeping the engine-managed state and its final
    totals identical to the uncombined form."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def partial_reduce(pdfs):
        for pdf in pdfs:
            if len(pdf):
                # dropna=False keeps NULL keys (Spark GROUP BY semantics) and
                # "size" counts ROWS (the oracle's COUNT(*)), while "sum"
                # skips null values exactly like Spark's SUM — both match the
                # uncombined form's len(pdf) / pdf[val].sum() accounting.
                g = pdf.groupby(key_col, dropna=False)[val_col].agg(
                    ["size", "sum"]
                )
                yield pd.DataFrame(
                    {
                        key_col: g.index,
                        "n_part": g["size"].astype("int64"),
                        "total_part": g["sum"].astype("float64"),
                    }
                )

    # derive the key field's type from the input schema so a non-string key
    # column round-trips instead of silently coercing to string (r6 advice)
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    key_field = stream_df.schema[key_col]
    partials = stream_df.mapInPandas(
        partial_reduce,
        schema=StructType(
            [
                StructField(key_col, key_field.dataType, key_field.nullable),
                StructField("n_part", LongType()),
                StructField("total_part", DoubleType()),
            ]
        ),
    )

    def merge_partials(key: tuple, pdfs, state: GroupState):
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["total_part"].sum())
            n += int(pdf["n_part"].sum())
        state.update((total, n))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    return partials.groupBy(key_col).applyInPandasWithState(
        merge_partials,
        outputStructType=StructType(
            [
                StructField("key", key_field.dataType, key_field.nullable),
                StructField("n", LongType()),
                StructField("total", DoubleType()),
            ]
        ),
        stateStructType="total double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_sessions(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """CUSTOM session assembly via ``applyInPandasWithState`` with an
    EVENT-TIME TIMER — the arbitrary-state shape ``session_window`` can't
    express (per-session custom payloads, here first/last value and a
    running sum, finalized by a timer). Completes the live arbitrary-state
    row next to :func:`stateful_running_totals` (running totals) with the
    timer/timeout dimension, protobuf-free.

    Per key the state holds the open session (start, last event time, count,
    value sum). A new event either extends it or — if the gap is exceeded
    IN-DATA — closes it (emitted immediately) and opens a new one. The
    event-time timeout closes the trailing session once the WATERMARK passes
    its gap horizon: that's the streaming-correct contract (a session is
    only final when late data can no longer reopen it), and it's why state
    per key is bounded by one open session regardless of stream length."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # state keeps epoch MICROseconds — Spark timestamps are µs-precision and
    # a ms-floored state would emit session bounds off by sub-ms
    gap_us = gap_seconds * 1_000_000

    def assemble(key: tuple, pdfs, state: GroupState):
        def emit(sess):
            start, last, n, vsum = sess
            return pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )

        if state.hasTimedOut:
            if state.exists:
                sess = state.get
                state.remove()
                yield emit(sess)
            return
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        cur = state.get if state.exists else None
        for ts, val in zip(rows[ts_col], rows["value"]):
            t = int(pd.Timestamp(ts).value // 1000)  # epoch µs
            if cur is None:
                cur = (t, t, 1, float(val))
            elif t - cur[1] <= gap_us:
                cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + float(val))
            else:
                yield emit(cur)
                cur = (t, t, 1, float(val))
        if cur is not None:
            state.update(cur)
            # timer: finalize when the watermark passes last_ts + gap (timer
            # API is ms; round the µs horizon UP). If other keys already
            # pushed the watermark beyond it, the session is final NOW — the
            # engine requires a future timestamp, so arm one tick past the
            # watermark.
            state.setTimeoutTimestamp(
                max(-(-(cur[1] + gap_us) // 1000), state.getCurrentWatermarkMs() + 1)
            )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            assemble,
            outputStructType=(
                "key long, session_start timestamp, session_end timestamp,"
                " n_events long, value_sum double"
            ),
            stateStructType="start long, last long, n long, vsum double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def transform_with_state_totals(stream_df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key running counts via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state v2 API (typed state handles, timers, TTL)
    superseding ``applyInPandasWithState`` above. Requires the RocksDB state
    store provider and the ``google.protobuf`` wheel for the streaming
    Python runner; the wheel is absent in this container, so the operator is
    import-gated (the pytest exercising it skips with the dependency named)
    — same closure pattern as :func:`kafka_stream` for absent
    infrastructure. Semantics are pinned by the applyInPandasWithState twin
    (``stream_stateful_totals``), which runs live in this environment."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf (not bundled "
            "in this container); use stateful_running_totals instead"
        ) from exc
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n LONG")

        def handleInputRows(self, key, rows, timer_values):  # noqa: ANN001
            n = self._state.get()[0] if self._state.exists() else 0
            for pdf in rows:
                n += int(len(pdf))
            self._state.update((n,))
            yield pd.DataFrame({"key": [key[0]], "n": [n]})

        def close(self) -> None:
            pass

    from pyspark.sql.types import LongType, StructField, StructType

    key_field = stream_df.schema[key_col]
    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningCounts(),
        outputStructType=StructType(
            [
                StructField("key", key_field.dataType, key_field.nullable),
                StructField("n", LongType()),
            ]
        ),
        outputMode="Update",
        timeMode="None",
    )
