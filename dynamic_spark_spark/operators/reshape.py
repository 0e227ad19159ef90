"""Reshaping + record-compaction operators.

- ``reshape_unpivot`` — wide→long melt, the inverse of ``agg_pivot``
  (reference grants the full DataFrame surface, `docs/ScalaSparkCompute-
  sparkcompute.md:5-6`; unpivot is the one reshape Spark 2.1 user code had
  to hand-roll with union-all that Spark 3.4+ exposes natively).
- ``cdc_latest_by_key`` — latest-record compaction per key, the standard
  CDC/changelog → snapshot step in incremental pipelines. Implemented as a
  single ``max(struct(ts, ...))`` aggregate — lexicographic struct max is an
  order-independent, map-side-combinable argmax, so the changelog shuffles
  ONCE with partial aggregation (vs. a window rank which must sort every
  partition). Tie-broken by unique event_id, so it's exact and
  oracle-checkable (DuckDB's struct max compares the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_UNPIVOT_ORACLE = f"""
SELECT l_orderkey, l_linenumber, measure, val
FROM (UNPIVOT (SELECT * FROM lineitem WHERE l_orderkey % 10 = 0)
      ON {', '.join(_MEASURES)}
      INTO NAME measure VALUE val)
"""


@query("reshape_unpivot", _UNPIVOT_ORACLE, tag="reshape")
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of the four lineitem measures. ``unpivot`` is a pure
    narrow map (each row fans out to |measures| rows with no shuffle), so
    the 4× row growth never leaves the scan stage's pipeline. Compared on a
    deterministic 1-in-10 orderkey slice to keep the differential gate's
    materialization cost proportionate (semantics identical at any slice)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=_MEASURES,
        variableColumnName="measure",
        valueColumnName="val",
    )


_LATEST_STRUCT = "struct_pack(ts := ts, event_id := event_id, value := value)"

_LATEST_ORACLE = f"""
SELECT user_id, event_type,
       (max({_LATEST_STRUCT})).ts AS last_ts,
       (max({_LATEST_STRUCT})).event_id AS last_event_id,
       (max({_LATEST_STRUCT})).value AS last_value
FROM events
GROUP BY user_id, event_type
"""


@query("cdc_latest_by_key", _LATEST_ORACLE, tag="cdc")
def cdc_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → snapshot: the latest event per (user_id, event_type).
    ``max(struct(ts, event_id, value))`` is a commutative aggregate, so each
    map task pre-compacts its partition before the single shuffle — at 100 TB
    the exchange carries one row per (key, map task), not the changelog.
    A window-rank formulation would instead sort whole partitions."""
    e = load_table(spark, sf_dir, "events")
    last = F.max(F.struct("ts", "event_id", "value")).alias("s")
    return (
        e.groupBy("user_id", "event_type")
        .agg(last)
        .select(
            "user_id",
            "event_type",
            F.col("s")["ts"].alias("last_ts"),
            F.col("s")["event_id"].alias("last_event_id"),
            F.col("s")["value"].alias("last_value"),
        )
    )


_SCD2_ORACLE = """
SELECT user_id, event_type, event_id, value,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
"""


@query("cdc_scd2", _SCD2_ORACLE, tag="cdc")
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → slowly-changing-dimension type 2: every change event
    becomes a versioned row with a [valid_from, valid_to) interval, the open
    interval marking the current version — the standard warehouse history
    table build. One window (a single shuffle on the key) assigns intervals
    via LEAD; ordering is made total with the unique event_id tiebreaker so
    the result is engine-exact. At 100 TB the partition key is the entity
    key, so interval assignment never sees more than one entity's history
    per task."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_type",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


_MERGE_ORACLE = """
WITH delta AS (
  SELECT o_orderkey, o_totalprice * 1.10 AS new_price, 'updated' AS op
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT 9000000000 + r AS o_orderkey, 100.0 + r AS new_price, 'inserted' AS op
  FROM (SELECT unnest(generate_series(1, 5)) AS r)
)
SELECT COALESCE(o.o_orderkey, d.o_orderkey) AS o_orderkey,
       CASE WHEN d.o_orderkey IS NOT NULL THEN d.new_price
            ELSE o.o_totalprice END AS o_totalprice,
       CASE WHEN d.o_orderkey IS NULL THEN 'kept' ELSE d.op END AS merge_op
FROM orders o FULL OUTER JOIN delta d ON o.o_orderkey = d.o_orderkey
"""


@query("merge_upsert_batch", _MERGE_ORACLE, tag="cdc")
def merge_upsert_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (Delta-style ``MERGE INTO`` semantics) as a full-outer
    join + conditional projection: WHEN MATCHED update, WHEN NOT MATCHED
    insert, else keep — the upsert compaction every CDC snapshot needs
    without a table format. The delta side is derived deterministically
    (every 100th order re-priced + 5 synthetic inserts above the key
    space). Scale shape: one shuffle on the merge key; with the target
    bucketed by key (see ``join_bucketed``) even that shuffle disappears on
    the target side. The streaming twin is ``stream_foreachbatch_upsert``."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 1.10).alias("new_price"),
            F.lit("updated").alias("op"),
        )
    )
    inserts = spark.range(1, 6).select(
        (F.lit(9_000_000_000) + F.col("id")).alias("o_orderkey"),
        (F.lit(100.0) + F.col("id")).alias("new_price"),
        F.lit("inserted").alias("op"),
    )
    delta = updates.unionByName(inserts)
    d = delta.alias("d")
    t = o.alias("t")
    joined = t.join(d, F.col("t.o_orderkey") == F.col("d.o_orderkey"), "full_outer")
    return joined.select(
        F.coalesce(F.col("t.o_orderkey"), F.col("d.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("d.o_orderkey").isNotNull(), F.col("d.new_price"))
        .otherwise(F.col("t.o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("d.o_orderkey").isNull(), F.lit("kept"))
        .otherwise(F.col("d.op"))
        .alias("merge_op"),
    )


_SNAPDIFF_ORACLE = """
WITH v1 AS (
  SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 17 <> 0
), v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END) AS digest
  FROM documents WHERE doc_id % 13 <> 0
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM v1 FULL OUTER JOIN v2 USING (doc_id)
WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL
   OR v1.digest IS DISTINCT FROM v2.digest
"""


@query("diff_snapshots", _SNAPDIFF_ORACLE, tag="cdc")
def diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff: compare two corpus snapshots by content digest
    and emit added / removed / changed doc ids — the audit a training-data
    pipeline runs between crawl refreshes before re-tokenizing ("what
    actually changed?"). The two versions are carved deterministically from
    the corpus (v1 drops doc_id%17==0, v2 drops %13==0 and rewrites %11==0)
    so the key is self-contained and oracle-exact.

    Scale shape: rows are reduced to (id, 128-bit digest) BEFORE the join —
    at 100 TB the full-outer join shuffles ~40 bytes/row, not documents —
    and unchanged rows (the overwhelming majority between refreshes) are
    filtered by digest equality so the diff result stays small. Digest
    computation is codegen ``md5``; one shuffle total."""
    d = load_table(spark, sf_dir, "documents")
    # presence is tracked by explicit flags, NOT digest nullness: md5(NULL
    # text) is NULL even though the row exists, and conflating the two would
    # misreport a NULL-text doc present in both snapshots as 'added'
    v1 = d.where(F.col("doc_id") % 17 != 0).select(
        "doc_id", F.md5("text").alias("digest_1"), F.lit(True).alias("in_v1")
    )
    v2 = d.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.md5(
            F.when(F.col("doc_id") % 11 == 0, F.upper("text")).otherwise(
                F.col("text")
            )
        ).alias("digest_2"),
        F.lit(True).alias("in_v2"),
    )
    joined = v1.join(v2, "doc_id", "full_outer")
    status = (
        F.when(F.col("in_v1").isNull(), F.lit("added"))
        .when(F.col("in_v2").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.where(
            F.col("in_v1").isNull()
            | F.col("in_v2").isNull()
            | ~F.col("digest_1").eqNullSafe(F.col("digest_2"))
        )
        .select("doc_id", status.alias("status"))
    )
