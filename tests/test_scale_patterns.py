"""Scale-pattern tests: salting equivalence, two-phase skewed aggregation,
and bucketed co-located joins (shuffle-free fact⋈fact — the pre-partitioning
story for repeated 100 TB joins).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_spark_spark.operators.skew import salted_group_count, salted_join
from dynamic_spark_spark.sources.readers import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "nk", (F.col("user_id") % 25).cast("int")
    )
    n = load_table(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "nk")
    plain = ev.join(n, "nk").select("event_id", "n_name")
    salted = salted_join(ev, n, "nk", salt_factor=4).select("event_id", "n_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_group_count_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r["event_type"]: r["n"]
        for r in ev.groupBy(F.col("event_type")).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {r["key"]: r["n"] for r in salted_group_count(ev, "event_type").collect()}
    assert plain == salted


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Both sides bucketed on the join key → SortMergeJoin without an
    Exchange on either side (co-located partitioning reused)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    try:
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_ann_recall_floor(spark, sf_dir):
    """ANN quality guard: IVF and multi-table LSH must recover a meaningful
    fraction of the exact top-k. The corpus is near-random synthetic
    (true top-5 cosines only 0.26-0.49), so high recall inherently requires
    scanning a large corpus fraction; the floors pin the measured trade-off
    (~25-30% of corpus scored → IVF 0.48 / LSH 0.74 recall, deterministic
    pipelines so the numbers are exact, not statistical)."""
    from dynamic_spark_spark.registry import load_all_queries

    qs = load_all_queries()
    exact = {(r.q_id, r.vec_id) for r in qs["sim_topk"](spark, sf_dir).collect()}
    ivf = {(r.q_id, r.vec_id) for r in qs["sim_topk_ivf"](spark, sf_dir).collect()}
    lsh = {(r.q_id, r.vec_id) for r in qs["sim_topk_lsh"](spark, sf_dir).collect()}
    pq = {(r.q_id, r.vec_id) for r in qs["sim_topk_pq"](spark, sf_dir).collect()}
    assert len(exact & ivf) / len(exact) >= 0.40
    assert len(exact & lsh) / len(exact) >= 0.60
    # PQ (r9): measured 0.56 at sf0.001 / 0.68 at sf0.01 with the
    # 50-candidate ADC shortlist; deterministic (hash-seeded k-means).
    # r10: codebooks now train on L2-normalized subvectors (the same
    # distribution encode()/the LUT see); recall unchanged on this corpus
    # (norms are near-uniform) but the train/encode mismatch is closed.
    assert len(exact & pq) / len(exact) >= 0.48


def test_lsh_batched_buckets_match_jvm_path(spark, sf_dir):
    """The Arrow-batched bucketing (broadcast plane matrix + one GEMM per
    batch) must assign the SAME (vec_id, tbl, key) rows as the pure-JVM
    higher-order-fn reference path — same hash-derived planes, so the only
    possible divergence is a sign flip on a numerically-zero projection,
    which the fixture must not exhibit."""
    from pyspark.sql import functions as F

    from dynamic_spark_spark.llmops.similarity import (
        lsh_bucket_entries,
        lsh_buckets_batched,
    )
    from dynamic_spark_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    jvm = {
        (r.vec_id, r.tbl, r.key)
        for r in e.select(
            "vec_id", F.explode(lsh_bucket_entries(F.col("embedding"))).alias("bk")
        )
        .select("vec_id", "bk.tbl", "bk.key")
        .collect()
    }
    batched = {
        (r.vec_id, r.tbl, r.key)
        for r in lsh_buckets_batched(spark, e).collect()
    }
    assert jvm == batched


def test_sim_join_recall_floor(spark, sf_dir):
    """The production unblocked near-dup pair join must recover most of the
    label-blocked truth set (every blocked pair IS a true pair; the LSH path
    may legitimately add cross-label pairs above the threshold). Deterministic
    pipeline → exact measured floor, not statistical."""
    from dynamic_spark_spark.registry import load_all_queries

    qs = load_all_queries()
    truth = {(r.vec_a, r.vec_b) for r in qs["dedup_embedding"](spark, sf_dir).collect()}
    got = {(r.vec_a, r.vec_b) for r in qs["sim_join_lsh"](spark, sf_dir).collect()}
    assert truth, "calibrated threshold must make the truth set non-empty"
    assert len(truth & got) / len(truth) >= 0.6


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime bloom-filter injection: when a selective filtered side joins
    a large fact over a shuffle, Spark can build a bloom filter from the
    filtered side and apply it to the fact scan — rows that can't join are
    dropped BEFORE the shuffle. At 100 TB this is the difference between
    shuffling the whole fact table and shuffling the ~matching slice; the
    defaults (10 GB application-side threshold) enable it exactly there, so
    this test lowers the threshold to demonstrate the same plan at test
    scale — and pins that the rewrite (a) injects and (b) preserves results."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in optimized, optimized
        got = {r["o_orderstatus"]: r["count"] for r in j.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .count()
    )
    assert got == {r["o_orderstatus"]: r["count"] for r in plain.collect()}


def test_zorder_layout_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """The z-ordered write must produce parquet row groups whose key
    min/max spans are much tighter than a single-key-order write — the
    footer statistics data-skipping actually prunes on. Measured from the
    real parquet footers via pyarrow, on (l_partkey, l_orderkey). Both
    dimensions are NORMALIZED to a common 16-bit range before interleaving
    — with raw keys the wider key monopolizes the high z-bits and the
    curve degenerates to a single-key sort (the classic Morton pitfall)."""
    import glob as _glob
    from functools import reduce

    import pyarrow.parquet as pq

    from dynamic_spark_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_orderkey")
    mx = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_orderkey").alias("mo")
    ).first()
    px = F.floor(F.col("l_partkey") * 65536 / (mx.mp + 1)).cast("long")
    oy = F.floor(F.col("l_orderkey") * 65536 / (mx.mo + 1)).cast("long")
    terms = []
    for i in range(16):
        terms.append(F.shiftleft(F.shiftright(px, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(oy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    zval = reduce(lambda a, b: a.bitwiseOR(b), terms)

    z_dir, nat_dir = str(tmp_path / "z"), str(tmp_path / "nat")
    (
        li.withColumn("zval", zval.cast("bigint"))
        .repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite").parquet(z_dir)
    )
    li.repartitionByRange(8, "l_orderkey").write.mode("overwrite").parquet(nat_dir)

    def span_total(d: str, col: str) -> int:
        total = 0
        for f in _glob.glob(f"{d}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                for ci in range(meta.num_columns):
                    c = meta.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics:
                        total += c.statistics.max - c.statistics.min
        return total

    z_part = span_total(z_dir, "l_partkey")
    nat_part = span_total(nat_dir, "l_partkey")
    assert z_part < 0.7 * nat_part, (z_part, nat_part)


def test_zstd_sink_writes_zstd_chunks(spark, sf_dir, tmp_path):
    """sink_parquet_zstd must emit files whose column chunks really are
    ZSTD-compressed (checked in the parquet footers), not silently fall
    back to the default codec."""
    import glob as _glob

    import pyarrow.parquet as pq

    from dynamic_spark_spark.sources.readers import load_table

    out = str(tmp_path / "zstd")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    o.write.mode("overwrite").option("compression", "zstd").parquet(out)
    files = _glob.glob(f"{out}/*.parquet")
    assert files
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                assert meta.row_group(rg).column(ci).compression == "ZSTD"


def test_digest_flattened_keys_add_no_shuffle(spark, sf_dir):
    """The r5 scalar-digest flattening (driver-canon contract) must stay
    plan-neutral: folding an array column to size + xxhash64 is a pure
    projection, so the narrow keys keep ZERO exchanges and the collect_list
    key keeps exactly its one hash-partitioned exchange with a map-side
    partial aggregate below it. Locks the flatten against a future rewrite
    accidentally materializing or re-shuffling the arrays."""
    from dynamic_spark_spark.registry import load_all_queries

    qs = load_all_queries()
    for name in ("text_fingerprint", "multimodal_frame_sample"):
        plan = (
            qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, f"{name} gained a shuffle:\n{plan}"
        assert "xxhash64" in plan  # digest folds are JVM expressions
    plan = (
        qs["agg_collect_array"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "partial_collect_list" in plan  # map-side combine below the shuffle


def test_threshold_curve_lsh_production_form(spark, sf_dir):
    """The production twin of dedup_threshold_curve (capped LSH candidates
    instead of the label-blocked all-pairs join) — registered as a
    rows-only key ranked LAST in the registry priority list — must keep
    the key's output contract: same schema, one row per swept threshold,
    pair counts monotonically non-increasing in the threshold, and every
    LSH-surfaced pair genuinely above threshold — deterministic across
    calls (same bucket planes, same cap)."""
    from dynamic_spark_spark.llmops.similarity import (
        DEDUP_CURVE_THRESHOLDS,
        dedup_threshold_curve_lsh,
    )
    from dynamic_spark_spark.registry import load_all_queries

    qs = load_all_queries()
    blocked = qs["dedup_threshold_curve"](spark, sf_dir)
    prod = dedup_threshold_curve_lsh(spark, sf_dir)
    assert prod.columns == blocked.columns
    rows = {r["threshold"]: r for r in prod.collect()}
    assert sorted(rows) == sorted(DEDUP_CURVE_THRESHOLDS)
    counts = [rows[t]["n_pairs"] for t in sorted(rows)]
    assert counts == sorted(counts, reverse=True)  # monotone in threshold
    assert all(rows[t]["n_docs_dropped"] <= rows[t]["n_pairs"] for t in rows)
    again = {r["threshold"]: r["n_pairs"] for r in dedup_threshold_curve_lsh(spark, sf_dir).collect()}
    assert again == {t: r["n_pairs"] for t, r in rows.items()}


def test_rebalance_for_fanout_is_scale_conditional(spark):
    """The pre-fan-out rebalance must be a plan-level no-op once the input
    already has session-width splits (r13 verdict: an unconditional
    repartition(defaultParallelism) forces an AQE-unelidable round-robin
    exchange of every row at any scale), and must still widen a
    narrow-split input to the session's width."""
    from pyspark.sql import functions as F

    from dynamic_spark_spark.sources.readers import rebalance_for_fanout

    width = spark.sparkContext.defaultParallelism
    wide = spark.range(10_000, numPartitions=width + 4).select(
        F.col("id").alias("doc_id")
    )
    out = rebalance_for_fanout(wide)
    assert out is wide  # no new plan node at all
    assert "RoundRobinPartitioning" not in out._jdf.queryExecution().executedPlan().toString()

    narrow = spark.range(10_000, numPartitions=1).select(F.col("id").alias("doc_id"))
    out = rebalance_for_fanout(narrow)
    assert out.rdd.getNumPartitions() == width
    # values untouched, only placement changes
    assert out.count() == 10_000
