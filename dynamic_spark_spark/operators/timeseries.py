"""Event-stream time-series operators: gap-based sessionization, rolling
statistics, fixed-grid resampling, and robust (median/MAD) anomaly flagging —
the batch analytics counterpart of the streaming windows in
``streaming/batch_equiv.py``, over the ``events`` fixture.

Extends the reference's event-pipeline surface (time-windowed aggregation,
``docs/ScalaSparkProgram-sparkprogram.md:32``) with the session/rolling/
anomaly shapes every product-analytics and telemetry pipeline runs.

All timestamp arithmetic is integer microseconds (``unix_micros`` /
``epoch_us``) on both engines — never float epoch seconds, whose rounding
diverges between Spark (truncating ``unix_timestamp``) and DuckDB
(fractional ``epoch``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.functions.deterministic import dsum, o_dsum
from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

#: DuckDB fragment for the order-independent SUM(value) used in resampling.
_O_DSUM_VALUE = o_dsum("value")

#: session gap threshold (30 minutes, in microseconds)
SESSION_GAP_US = 30 * 60 * 1_000_000

_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS INT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS sess_start, MAX(ts) AS sess_end,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS dur_us
FROM numbered GROUP BY user_id, session_id
"""


@query("sessionize_gap", _SESSION_ORACLE, tag="timeseries")
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity splits a session):
    lag + running-sum window assigns per-user session numbers, then one
    aggregate rolls sessions up to (start, end, duration, event count).

    Scale shape: a single shuffle on ``user_id`` serves both windows AND the
    final group-by (same partitioning, Catalyst reuses the exchange); state
    per key is one row of lag carry — the streaming analog maps to
    ``session_window``/``applyInPandasWithState``, proven separately in
    streaming keys. Tie-break on ``event_id`` makes session numbering
    deterministic under equal timestamps — at 100 TB, ties WILL happen."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(
        prev_us.isNull() | (F.unix_micros(F.col("ts")) - prev_us > SESSION_GAP_US),
        F.lit(1),
    ).otherwise(F.lit(0))
    numbered = (
        e.select("user_id", "ts", "event_id", new_s.alias("new_s"))
        .withColumn(
            "session_id",
            F.sum("new_s")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("int"),
        )
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )


_MAVG_ORACLE = """
SELECT event_id, user_id, ts,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
         AS mavg4,
       ROUND(MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS cummax
FROM events
"""


@query("ts_moving_avg", _MAVG_ORACLE, tag="timeseries")
def ts_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling statistics: 4-row moving average and running maximum per
    user, ordered by time with an id tie-break. One shuffle on ``user_id``;
    both frames evaluate in a single Window physical operator (same
    partitioning + ordering), streaming through each partition once with
    O(frame) memory."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w.rowsBetween(-3, 0)), 6).alias("mavg4"),
        F.round(
            F.max("value").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            6,
        ).alias("cummax"),
    )


#: resampling grid (5 minutes, in seconds / microseconds)
RESAMPLE_S = 300
_RESAMPLE_US = RESAMPLE_S * 1_000_000

_RESAMPLE_ORACLE = f"""
SELECT make_timestamp((epoch_us(ts) // {_RESAMPLE_US}) * {_RESAMPLE_US})
         AS bucket_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND({_O_DSUM_VALUE}, 4) AS sum_value,
       ROUND(MIN(value), 6) AS min_value,
       ROUND(MAX(value), 6) AS max_value
FROM events GROUP BY 1, 2
"""


@query("ts_resample_5min", _RESAMPLE_ORACLE, tag="timeseries")
def ts_resample_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid downsampling (hypertable rollup shape): events bucketed to
    a 5-minute grid by integer microsecond division — no calendar functions,
    so the bucket edge is engine-exact — with count/sum/min/max per
    (bucket, type). Map-side partial aggregation means the shuffle carries
    one row per (bucket, type) per task regardless of input volume: the
    canonical 100 TB telemetry rollup."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.unix_micros(F.col("ts")) / _RESAMPLE_US).cast("long") * RESAMPLE_S
    )
    return e.groupBy(
        bucket.alias("bucket_start"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # order-independent accumulation: double SUM order differs between
        # Spark partials and the oracle's single pass; dsum makes the 4-dp
        # rounding tie-proof.
        F.round(dsum("value", "_sv"), 4).alias("sum_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


#: robust-outlier multiplier: |x - median| > K * MAD
MAD_K = 3.0

_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, median(abs(e.value - med.med)) AS mad
  FROM events e JOIN med USING (event_type) GROUP BY e.event_type
)
SELECT e.event_id, e.event_type,
       ROUND(e.value, 6) AS value,
       ROUND(med.med, 6) AS med,
       ROUND(mad.mad, 6) AS mad
FROM events e
JOIN med USING (event_type)
JOIN mad USING (event_type)
WHERE abs(e.value - med.med) > {MAD_K} * mad.mad
"""


@query("ts_anomaly_mad", _MAD_ORACLE, tag="timeseries")
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly flagging: events whose value deviates from the
    per-type median by more than 3× the median absolute deviation. Median
    and MAD are exact (``median``), not approximate, so the flag set is
    reproducible — the property an audit pipeline needs.

    Scale shape: two grouped exact medians over the corpus (sort-based
    aggregate; at extreme scale swap for ``approx_percentile`` with a
    documented tolerance), each producing an event_type-sized table that is
    broadcast back — the corpus itself is never shuffled, only scanned."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    return (
        e.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .where(F.abs(F.col("value") - F.col("med")) > MAD_K * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
    )


#: EWMA smoothing factor and truncation window (rows)
EWMA_ALPHA = 0.3
EWMA_WINDOW = 20

_EWMA_ORACLE = f"""
WITH arr AS (
  SELECT event_id, user_id, ts,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING
                           AND CURRENT ROW) AS vals
  FROM events
)
SELECT event_id, user_id,
       CAST(FLOOR(list_reduce(vals,
         (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc)
         * 1000000 + 0.5) AS BIGINT) AS ewma_fp
FROM arr
"""


@query("ts_ewma_window", _EWMA_ORACLE, tag="timeseries")
def ts_ewma_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average: the classic
    monitoring smoother, computed as a sequential fold over the trailing
    20-row window (`acc -> α·x + (1-α)·acc`, seeded with the oldest value —
    identical fold order in both engines, so the doubles are bit-identical
    before fixed-pointing).

    Why truncated: the closed-form weighted-sum EWMA needs `(1-α)^{{-i}}`
    terms that overflow doubles beyond ~700 rows, and the exact recursive
    form isn't expressible as a distributive aggregate. A 20-row tail
    carries `(1-α)^20 ≈ 0.0008` of stale mass — numerically equal to the
    infinite-history EWMA while keeping state bounded, which is also
    exactly the state bound a streaming/stateful port would keep per key."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_WINDOW - 1), 0)
    )
    vals = F.collect_list("value").over(w)
    ewma = F.aggregate(
        F.expr("slice(vals, 2, size(vals) - 1)"),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc,
    )
    return (
        e.select("event_id", "user_id", "ts", vals.alias("vals"))
        .select(
            "event_id",
            "user_id",
            F.floor(ewma * 1_000_000 + F.lit(0.5)).cast("long").alias("ewma_fp"),
        )
    )


_MERGE_IV_WIN = (
    "PARTITION BY o_custkey ORDER BY s, o_orderkey"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
)

_MERGE_IV_ORACLE = f"""
WITH iv AS (
  SELECT o_custkey, o_orderkey,
         CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + 7 AS e
  FROM orders),
flag AS (
  SELECT *, CASE WHEN MAX(e) OVER ({_MERGE_IV_WIN}) IS NULL
                   OR s > MAX(e) OVER ({_MERGE_IV_WIN})
                 THEN 1 ELSE 0 END AS ni
  FROM iv),
isl AS (
  SELECT *, SUM(ni) OVER (PARTITION BY o_custkey ORDER BY s, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS island
  FROM flag)
SELECT o_custkey, CAST(island AS BIGINT) AS island_id,
       CAST(MIN(s) AS VARCHAR) AS island_start,
       CAST(MAX(e) AS VARCHAR) AS island_end,
       COUNT(*) AS n_orders
FROM isl GROUP BY o_custkey, island
"""


@query("ts_merge_intervals", _MERGE_IV_ORACLE, tag="timeseries")
def ts_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands by *interval overlap* (not inactivity gap — that's
    ``sessionize_gap``): each order opens a 7-day service window; overlapping
    windows per customer merge into islands. The classic cummax idiom: a new
    island starts where this interval's start exceeds the running max end of
    all previous intervals — ``max().over(rowsBetween(unboundedPreceding,
    -1))`` — then a running sum of the flags numbers islands. One shuffle on
    o_custkey serves both windows and the final rollup (same partitioning;
    Catalyst reuses the exchange). Deterministic via the o_orderkey
    tie-break."""
    o = load_table(spark, sf_dir, "orders")
    s = F.col("o_orderdate").cast("date")
    iv = o.select(
        "o_custkey", "o_orderkey", s.alias("s"), F.date_add(s, 7).alias("e")
    )
    w = Window.partitionBy("o_custkey").orderBy("s", "o_orderkey")
    prev_max_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    ni = F.when(prev_max_end.isNull() | (F.col("s") > prev_max_end), 1).otherwise(0)
    isl = iv.withColumn("ni", ni).withColumn(
        "island",
        F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return isl.groupBy("o_custkey", "island").agg(
        F.min("s").cast("string").alias("island_start"),
        F.max("e").cast("string").alias("island_end"),
        F.count(F.lit(1)).alias("n_orders"),
    ).select(
        "o_custkey",
        F.col("island").cast("bigint").alias("island_id"),
        "island_start",
        "island_end",
        "n_orders",
    )


#: capped sessionization: inactivity gap + hard session-length ceiling.
#: The ceiling is set BELOW the fixture's longest gap-session (~57 min) so
#: the cap rule provably fires — production trackers run e.g. 30 min/4 h.
CAP_GAP_MIN = 30
CAP_MAX_MIN = 20

_CAPPED_ORACLE = f"""
WITH RECURSIVE seq AS (
  SELECT user_id, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
rec AS (
  SELECT user_id, ts, event_id, rn, ts AS sess_start FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.ts, s.event_id, s.rn,
         CASE WHEN s.ts - r.ts >= INTERVAL {CAP_GAP_MIN} MINUTE
                OR s.ts - r.sess_start >= INTERVAL {CAP_MAX_MIN} MINUTE
              THEN s.ts ELSE r.sess_start END
  FROM seq s JOIN rec r ON s.user_id = r.user_id AND s.rn = r.rn + 1)
SELECT user_id, sess_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(ts) AS last_ts
FROM rec GROUP BY user_id, sess_start
"""


def _fold_sessions(pdf, gap_ns: int, cap_ns: int):
    """Vectorized multi-user session fold of a SORTED (user_id, ts, event_id)
    frame: session bounds from gap breaks (vectorized) + cap breaks
    (searchsorted jumps within each gap segment). Pure pandas/numpy — unit-
    and property-tested without Spark (tests/test_properties.py)."""
    import numpy as np
    import pandas as pd

    t = pdf["ts"].values.astype("datetime64[ns]").astype("int64")
    uid = pdf["user_id"].values
    new_seg = np.concatenate(
        ([True], (np.diff(t) >= gap_ns) | (uid[1:] != uid[:-1]))
    )
    bounds = np.append(np.flatnonzero(new_seg), len(t))
    sess_bounds = []
    for i0, i1 in zip(bounds[:-1], bounds[1:]):
        j = i0
        while j < i1:
            sess_bounds.append(j)
            j = i0 + np.searchsorted(t[i0:i1], t[j] + cap_ns, side="left")
    sb = np.append(np.asarray(sess_bounds, dtype="int64"), len(t))
    return pd.DataFrame(
        {
            "user_id": uid[sb[:-1]],
            "sess_start": pdf["ts"].iloc[sb[:-1]].values,
            "n_events": np.diff(sb),
            "last_ts": pdf["ts"].iloc[sb[1:] - 1].values,
        }
    )


def _fold_session_stream(batches, gap_ns: int, cap_ns: int):
    """Partition-stream fold with an explicit carry of the split user across
    Arrow batch boundaries (a user's rows may straddle batches WITHIN the
    sorted partition; they never straddle partitions)."""
    import pandas as pd

    carry = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if not len(pdf):
            continue
        last_uid = pdf["user_id"].iloc[-1]
        done = pdf[pdf["user_id"] != last_uid]
        carry = pdf[pdf["user_id"] == last_uid]
        if len(done):
            yield _fold_sessions(done, gap_ns, cap_ns)
    if carry is not None and len(carry):
        yield _fold_sessions(carry, gap_ns, cap_ns)


@query("sessionize_capped", _CAPPED_ORACLE, tag="timeseries")
def sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with BOTH break rules production trackers use: a
    30-minute inactivity gap AND a hard session-length ceiling. The
    ceiling makes this fundamentally different from ``sessionize_gap``:
    whether an event starts a new session depends on the RUNNING session
    start — sequential state no window frame or prefix-sum can express
    (the gap rule alone is gaps-and-islands; the cap rule is an iterated
    fold). This is exactly the case SURVEY §2's custom-operator ladder
    reserves for Arrow-batched Python.

    Implementation detail that matters at scale: events have MANY SMALL
    user groups (~67 rows/user in the fixture), so grouped-map
    ``applyInPandas`` pays its per-GROUP pandas overhead thousands of
    times (measured 7.2 s at sf0.1). Instead the stream is repartitioned
    by user, sorted within partitions, and folded by ``mapInPandas`` —
    per-BATCH overhead with an explicit carry of the split user across
    Arrow batch boundaries (measured ~5× faster, same exact result). Gap
    breaks vectorize; only CAP breaks walk sequentially, and they jump
    break-to-break via searchsorted on int64 nanoseconds. One shuffle on
    user_id; the oracle replays the identical fold as a recursive CTE."""
    gap_ns = CAP_GAP_MIN * 60 * 1_000_000_000
    cap_ns = CAP_MAX_MIN * 60 * 1_000_000_000

    def fold_stream(batches):
        yield from _fold_session_stream(batches, gap_ns, cap_ns)

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    n_parts = spark.sparkContext.defaultParallelism
    return (
        e.repartition(n_parts, "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            fold_stream,
            "user_id bigint, sess_start timestamp, n_events bigint, last_ts timestamp",
        )
        .select("user_id", "sess_start", "n_events", "last_ts")
    )
