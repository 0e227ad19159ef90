"""Multimodal column plumbing (SURVEY.md §2.D).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, batch shape, partitioning,
``mapInPandas`` UDF signatures — is real and tested; the actual media decode
is stubbed (no image/audio libraries in this environment) behind
:func:`decode_stub`, which produces a deterministic fake feature vector so
the pipeline shape is verifiable end-to-end.

``spark.read.format("binaryFile")`` is the ingestion path for real media
files; here the binary payloads are synthesized from ``documents.text`` so
the operators run against driver testdata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

#: Arrow batch size for mapInPandas media decode — bounds worker memory at
#: (batch_size × max_payload) regardless of total corpus size.
DECODE_BATCH_ROWS = 256


def with_media_columns(docs: DataFrame) -> DataFrame:
    """documents → multimodal frame: binary payload + typed metadata struct."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("media"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def decode_stub(payload: bytes) -> list[float]:
    """Deterministic fake media decode (REAL decode needs codec libraries not
    present in this container). Produces an 8-dim byte-histogram feature so
    downstream plumbing is testable. Raise NotImplementedError here when
    swapping in a real codec to catch accidental stub use.
    """
    if payload is None:
        return [0.0] * 8
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    n = max(len(payload), 1)
    return [c / n for c in buckets]


def decode_features(mdf: DataFrame) -> DataFrame:
    """mapInPandas media decode: Arrow-batched, bounded memory, schema-stable.

    This is the canonical shape for 100 TB media processing: each Python
    worker sees ``DECODE_BATCH_ROWS`` rows at a time, produces fixed-width
    features, and the exchange stays columnar end-to-end.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": pdf["media"].map(lambda p: decode_stub(p)),
                }
            )

    mdf = mdf.repartition(max(mdf.sparkSession.sparkContext.defaultParallelism, 4))
    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    mdf.sparkSession.conf.set(conf_key, str(DECODE_BATCH_ROWS))
    return mdf.mapInPandas(decode, schema="doc_id long, features array<double>")


@query(
    "multimodal_meta",
    "SELECT doc_id, 'text/plain' AS mime,"
    " CAST(octet_length(encode(text)) AS INT) AS n_bytes,"
    " source AS origin FROM documents",
    tag="llm-multimodal",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction from the multimodal frame (struct → columns)."""
    docs = load_table(spark, sf_dir, "documents")
    m = with_media_columns(docs)
    return m.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.origin").alias("origin"),
    )


@query("multimodal_decode", tag="llm-multimodal")  # rows-only: stubbed decode
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → feature vector via the Arrow-batched decode stub."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_features(with_media_columns(docs))


RESIZE_DIM = 16
FRAME_BYTES = 64
FRAME_STRIDE = 4


def resize_stub(payload: bytes, dim: int = RESIZE_DIM) -> bytes:
    """Deterministic fake resize (REAL resize needs an image library): nearest-
    neighbor sample of the payload bytes down/up to ``dim × dim``. Swapping in
    a real codec keeps the same bytes→bytes contract."""
    if not payload:
        return bytes(dim * dim)
    n = len(payload)
    return bytes(payload[(i * n) // (dim * dim)] for i in range(dim * dim))


@query("multimodal_resize", tag="llm-multimodal")  # rows-only: stubbed codec
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing: binary → fixed-size binary via Arrow-batched
    ``mapInPandas``. The output width is schema-constant (dim²), so downstream
    feature extractors get fixed-shape tensors regardless of input size."""
    mdf = with_media_columns(load_table(spark, sf_dir, "documents"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": pdf["media"].map(resize_stub),
                    "n_bytes": pdf["media"].map(lambda p: len(p or b"")),
                }
            )

    mdf = mdf.repartition(max(mdf.sparkSession.sparkContext.defaultParallelism, 4))
    return mdf.mapInPandas(resize, schema="doc_id long, thumb binary, n_bytes long")


@query("multimodal_frame_sample", tag="llm-multimodal")  # rows-only: binary payload
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing, entirely JVM-side: treat the payload as
    fixed-width frames and keep every ``FRAME_STRIDE``-th via binary
    ``substring`` over a ``sequence`` — no Python, no fan-out shuffle; each
    row yields its sampled-frame array in codegen. (A real container format
    would swap the fixed stride for codec keyframe offsets produced by a
    mapInPandas demuxer, same shape as :func:`decode_features`.)"""
    m = with_media_columns(load_table(spark, sf_dir, "documents"))
    n_frames = (F.octet_length("media") / FRAME_BYTES).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(FRAME_STRIDE)),
        lambda i: F.substring("media", i * FRAME_BYTES + 1, FRAME_BYTES),
    )
    return m.select(
        "doc_id",
        n_frames.alias("n_frames"),
        frames.alias("sampled_frames"),
        F.transform(frames, lambda fr: F.xxhash64(fr)).alias("frame_hashes"),
    )
