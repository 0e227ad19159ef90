"""Embedding-column utility operators (SURVEY.md §2.D posture).

Vector hygiene steps a training-data pipeline runs between embedding
generation and ANN indexing / model ingest:

- ``embed_normalize`` — L2 unit-normalization (cosine becomes dot product
  downstream, the precondition most ANN indexes assume);
- ``embed_quantize_int8`` — max-abs symmetric int8 quantization (4× smaller
  vectors for the ANN index / feature store; the standard serving format).

Both are **pure per-row array expressions** — zero shuffles, a single
codegen map pass over the corpus at any scale. Oracle parity strategy: the
driver's comparator can't canonicalize array columns, so vector outputs are
emitted as fixed-point integers joined to a ``|``-string (integers are
engine-exact; the fold/round idioms match ``llmops.similarity`` /
``functions.deterministic``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

#: fixed-point scale for normalized-component output (6 fractional digits).
_UNIT_SCALE = 1_000_000

_NORMALIZE_ORACLE = f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (acc, x) -> acc + x)) AS nrm
  FROM embeddings
)
SELECT vec_id, ROUND(nrm, 6) AS norm,
       CASE WHEN nrm > 0 THEN array_to_string(
         list_transform(embedding,
           x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) / nrm * {_UNIT_SCALE} + 0.5) AS BIGINT) AS VARCHAR)),
         '|')
       END AS unit_fp
FROM n
"""


@query("embed_normalize", _NORMALIZE_ORACLE, tag="llm-similarity")
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize each embedding: one sequential-fold norm per row (same
    fold order as the oracle's ``list_reduce``, so the doubles are
    bit-identical), components emitted fixed-point. Zero-norm vectors yield a
    null unit vector instead of NaNs."""
    from dynamic_spark_spark.llmops.similarity import _norm

    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.col("nrm")
    unit_fp = F.array_join(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") / nrm * _UNIT_SCALE + F.lit(0.5))
            .cast("long")
            .cast("string"),
        ),
        "|",
    )
    return e.withColumn("nrm", _norm(F.col("embedding"))).select(
        "vec_id",
        F.round("nrm", 6).alias("norm"),
        F.when(nrm > 0, unit_fp).alias("unit_fp"),
    )


_QUANTIZE_ORACLE = """
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
  FROM embeddings
)
SELECT vec_id, ROUND(amax, 6) AS amax,
       CASE WHEN amax > 0 THEN array_to_string(
         list_transform(embedding,
           x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT) AS VARCHAR)),
         '|')
       END AS q8
FROM m
"""


@query("embed_quantize_int8", _QUANTIZE_ORACLE, tag="llm-similarity")
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric max-abs int8 quantization: q = floor(x·127/amax + 0.5),
    which lands exactly in [-127, 127] with no clamp (|x| ≤ amax). The
    (amax, q8) pair is the lossless-dequantizable wire format; ``floor(+0.5)``
    is the same IEEE round-half-up both engines compute bit-identically."""
    e = load_table(spark, sf_dir, "embeddings")
    # internal name distinct from the output alias: if the rounded output
    # were also called "amax", projection collapse could rebind the lambda's
    # reference to the ROUNDED value and shift .5-boundary components by one
    amax = F.col("_amax")
    q8 = F.array_join(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 127.0 / amax + F.lit(0.5))
            .cast("long")
            .cast("string"),
        ),
        "|",
    )
    return e.withColumn(
        "_amax", F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    ).select(
        "vec_id",
        F.round("_amax", 6).alias("amax"),
        F.when(amax > 0, q8).alias("q8"),
    )


#: PCA output dimensionality
PCA_K = 2


@query("embed_pca_project", tag="llm-similarity")  # rows-only: eigensolve
def embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of the embedding column to its top-2 principal
    components — the dimensionality-reduction / visualization step of every
    embedding-QA pipeline. Rows-only: the eigendecomposition has no SQL
    oracle (pytest pins variance ordering, centering, and determinism).

    Scale shape — the canonical two-pass distributed PCA:

    1. **Sufficient statistics** via Arrow-batched ``mapInPandas``: each
       batch emits ONE row (n, Σx, flat Σxxᵀ) — a d²-sized partial, so the
       shuffle-to-driver is |batches|·d² regardless of corpus size (the
       treeAggregate pattern). numpy does the per-batch outer-product sum
       at BLAS speed.
    2. The d×d Gram matrix is assembled and eigensolved on the DRIVER
       (d=64 → trivial); components are **sign-normalized** (largest-|w|
       coordinate forced positive) so the output is deterministic across
       eigensolver implementations.
    3. **Projection** is a broadcast of the (mean, W) pair into a second
       vectorized ``mapInPandas`` map pass — zero shuffles.

    The only corpus-sized traffic is the two scans; nothing quadratic in n
    anywhere. (Covariance, not Gram-of-raw: vectors are centered with the
    exact global mean from pass 1.)"""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d = len(e.select("embedding").first()["embedding"])

    def partials(batches):
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    stats = e.mapInPandas(
        partials, schema="n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(r["n"] for r in stats)
    s = np.sum([r["s"] for r in stats], axis=0)
    ss = np.sum([r["ss"] for r in stats], axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :PCA_K]  # top-K columns
    for j in range(PCA_K):  # sign-normalize for determinism
        i = int(np.abs(comps[:, j]).argmax())
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    b = spark.sparkContext.broadcast((mean, comps))

    def project(batches):
        m, w = b.value
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            p = (x - m) @ w
            out = {"vec_id": pdf["vec_id"]}
            for j in range(PCA_K):
                out[f"pc{j + 1}_fp"] = np.floor(
                    p[:, j] * _UNIT_SCALE + 0.5
                ).astype(np.int64)
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(
        f"pc{j + 1}_fp long" for j in range(PCA_K)
    )
    return e.mapInPandas(project, schema=schema)


# ---------------------------------------------------------------------------
# Per-label centroid vectors (round-2 fourth wave)
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
WITH comp AS (
  SELECT label,
         unnest(list_transform(generate_series(1, len(embedding)),
                i -> struct_pack(dim := i,
                                 micro := CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                                                     * 1000000) AS BIGINT)))) AS c
  FROM embeddings
)
SELECT label, CAST(c.dim AS INT) AS dim, COUNT(*) AS n,
       CAST(FLOOR(CAST(SUM(c.micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
         AS mean_micro
FROM comp GROUP BY label, c.dim
"""


@query("embed_label_centroids", _CENTROID_ORACLE, tag="llm-embedding")
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class centroid vectors in long form (label, dim, mean component)
    — the embedding-space summary behind class-prototype classifiers,
    drift monitoring (compare centroids across snapshots), and diversity
    audits. Components are fixed-point-quantized per value BEFORE the sum
    (floor to micro), so the per-cell totals are exact integers and the
    floor-divided mean is order-independent — the float alternative
    accumulates in engine order and can't be hash-checked. Plan: posexplode
    fan-out (rows × dims — map-side, no state) into one (label, dim)
    aggregation; the result is |labels|·|dims| rows at any corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.floor(F.col("val").cast("double") * 1_000_000).cast("long").alias(
            "micro"
        ),
    )
    return comp.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sum("micro").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_micro"),
    )


#: truncation sweep dims (full fixture dim is 64)
TRUNC_DIMS = [32, 16, 8]
TRUNC_K = 5
TRUNC_NQ = 10


def _trunc_topk_sql(d: int | None) -> str:
    emb = f"list_slice(e.embedding, 1, {d})" if d else "e.embedding"
    qemb = f"list_slice(q.q_emb, 1, {d})" if d else "q.q_emb"
    from dynamic_spark_spark.llmops.similarity import _o_cosine

    return f"""
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.q_id
             ORDER BY {_o_cosine(qemb, emb)} DESC, e.vec_id) AS rn
    FROM (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
          WHERE vec_id < {TRUNC_NQ}) q
    JOIN embeddings e ON e.vec_id <> q.q_id) WHERE rn <= {TRUNC_K}"""


_TRUNC_ORACLE = (
    "WITH full_k AS (" + _trunc_topk_sql(None) + ")\n"
    + "\nUNION ALL\n".join(
        f"""SELECT {d} AS dim, t.q_id,
       CAST(COUNT(f.vec_id) AS BIGINT) AS n_overlap,
       ROUND(COUNT(f.vec_id) / CAST({TRUNC_K} AS DOUBLE), 6) AS recall
FROM ({_trunc_topk_sql(d)}) t
LEFT JOIN full_k f ON f.q_id = t.q_id AND f.vec_id = t.vec_id
GROUP BY t.q_id"""
        for d in TRUNC_DIMS
    )
)


@query("embed_truncate_recall", _TRUNC_ORACLE, tag="llm-embedding")
def embed_truncate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation sweep: retrieval recall@K when scoring
    on only the first d dimensions (d = 32/16/8) versus full-dimension
    ground truth — the measurement behind dimension-adaptive retrieval
    (truncated prefixes are cheap first-pass scorers; full vectors rescore
    survivors). Emits (dim, query, overlap, recall) so the cost/quality
    frontier is a table, not a guess.

    One broadcast query set scores the corpus once PER dim on a sliced
    array — each sweep point costs one map pass + one top-K window, linear
    in the corpus, and the slices never materialize as new columns."""
    from dynamic_spark_spark.llmops.similarity import _dot, _norm

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < TRUNC_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )

    def topk(d: int | None) -> DataFrame:
        emb = F.slice("embedding", 1, d) if d else F.col("embedding")
        qemb = F.slice("q_emb", 1, d) if d else F.col("q_emb")
        scored = (
            F.broadcast(q)
            .join(e, F.col("vec_id") != F.col("q_id"))
            .select(
                "q_id",
                "vec_id",
                (_dot(qemb, emb) / (_norm(qemb) * _norm(emb))).alias("cos"),
            )
        )
        w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= TRUNC_K)
            .select("q_id", "vec_id")
        )

    full = topk(None).persist()
    out = None
    for d in TRUNC_DIMS:
        hit = (
            topk(d)
            .join(full.withColumn("hit", F.lit(1)), ["q_id", "vec_id"], "left")
            .groupBy("q_id")
            .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_overlap"))
            .select(
                F.lit(d).alias("dim"),
                "q_id",
                "n_overlap",
                F.round(F.col("n_overlap") / F.lit(float(TRUNC_K)), 6).alias("recall"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out
