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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: JPEG start-of-frame markers that carry dimensions (baseline, extended
#: sequential, progressive).
_JPEG_SOF = {0xC0, 0xC1, 0xC2}


def png_bytes(width: int, height: int) -> bytes:
    """Minimal REAL PNG byte stream (signature + IHDR chunk with correct
    CRC32) — enough for any standards-compliant header parser; pixel data
    (IDAT) is omitted since only metadata extraction is exercised here."""
    import struct
    import zlib

    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        _PNG_SIG
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def jpeg_bytes(width: int, height: int) -> bytes:
    """Minimal REAL JPEG byte stream: SOI, APP0/JFIF, then an SOF0 frame
    header carrying the dimensions (per ITU T.81 §B.2.2)."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
    )


def parse_image_header(payload: bytes) -> tuple[str, int | None, int | None]:
    """REAL pure-Python image header parse — (mime, width, height) from raw
    bytes, no codec library needed. PNG: big-endian dims at fixed IHDR
    offsets. JPEG: walk the marker segments to the first SOF frame header.
    Unknown formats degrade to ``application/octet-stream`` with null dims
    rather than raising — at 100 TB a malformed file must not kill a stage."""
    import struct

    if payload is None or len(payload) < 4:
        return ("application/octet-stream", None, None)
    if payload[:8] == _PNG_SIG and len(payload) >= 24 and payload[12:16] == b"IHDR":
        width, height = struct.unpack(">II", payload[16:24])
        return ("image/png", width, height)
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF and i + 9 <= len(payload):
                height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
                return ("image/jpeg", width, height)
            i += 2 + seg_len
        return ("image/jpeg", None, None)
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        width, height = struct.unpack("<HH", payload[6:10])
        return ("image/gif", width, height)
    if payload[:2] == b"BM" and len(payload) >= 26:
        width, height = struct.unpack("<ii", payload[18:26])
        return ("image/bmp", width, abs(height))  # negative height = top-down
    return ("application/octet-stream", None, None)


def gif_bytes(width: int, height: int) -> bytes:
    """Minimal REAL GIF89a stream: signature + logical screen descriptor
    (little-endian dims) + trailer."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x70\x00\x00;"


def bmp_bytes(width: int, height: int) -> bytes:
    """Minimal REAL BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (little-endian
    dims, 24 bpp, no pixel array — only metadata extraction is exercised)."""
    import struct

    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + len(info), 0, 0, 14 + len(info))
    return header + info


@query(
    "multimodal_image_meta",
    "SELECT doc_id,"
    " CASE doc_id % 4 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'"
    "   WHEN 2 THEN 'image/gif' ELSE 'image/bmp' END AS mime,"
    " CAST(16 + doc_id % 97 AS INT) AS width,"
    " CAST(16 + doc_id % 89 AS INT) AS height"
    " FROM documents",
    tag="llm-multimodal",
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image metadata extraction: synthesize valid PNG/JPEG/GIF/BMP byte
    streams (dimensions derived from doc_id), then recover (mime, width,
    height) by parsing the raw bytes with :func:`parse_image_header` in an
    Arrow-batched ``mapInPandas`` pass. The oracle computes the dimensions
    arithmetically — a hash match proves the parser extracted exactly what
    the encoder wrote (across four container formats and both endiannesses),
    i.e. this multimodal key computes something real, not stub shape."""

    _ENCODERS = (png_bytes, jpeg_bytes, gif_bytes, bmp_bytes)

    def synth_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _ENCODERS[d % 4](16 + d % 97, 16 + d % 89) for d in pdf["doc_id"]
            ]
            parsed = [parse_image_header(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m for m, _, _ in parsed],
                    "width": [w for _, w, _ in parsed],
                    "height": [h for _, _, h in parsed],
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    docs = docs.repartition(max(docs.sparkSession.sparkContext.defaultParallelism, 4))
    return docs.mapInPandas(
        synth_and_parse, schema="doc_id long, mime string, width int, height int"
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


_WAV_RATES = (8000, 16000, 22050, 44100)


def wav_bytes(sample_rate: int, channels: int, bits: int, n_samples: int) -> bytes:
    """Minimal REAL WAV byte stream: RIFF container with a standards-
    compliant ``fmt `` chunk (PCM) and a ``data`` chunk declaring
    ``n_samples`` frames (frame payload omitted — only header metadata is
    exercised here)."""
    import struct

    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    data_size = n_samples * block_align
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", data_size)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(payload: bytes):
    """REAL pure-Python RIFF/WAV header parse: walk the chunk list, read the
    PCM ``fmt `` fields, derive frame count and duration from the ``data``
    declared size. Malformed input degrades to nulls (a bad file must not
    kill a stage at 100 TB)."""
    import struct

    nulls = (None, None, None, None, None)
    if not payload or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return nulls
    i, rate, channels, bits, block_align, n_samples = 12, None, None, None, None, None
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if tag == b"fmt " and i + 8 + 16 <= len(payload):
            _, channels, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", payload[i + 8 : i + 24]
            )
        elif tag == b"data" and block_align:
            n_samples = size // block_align
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or n_samples is None:
        return nulls
    return (rate, channels, bits, n_samples, n_samples * 1000 // rate)


@query(
    "multimodal_audio_meta",
    "SELECT doc_id, 'audio/wav' AS mime,"
    " CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000"
    "   WHEN 2 THEN 22050 ELSE 44100 END AS INT) AS sample_rate,"
    " CAST(1 + doc_id % 2 AS INT) AS channels,"
    " CAST(16 AS INT) AS bits,"
    " CAST(1000 + doc_id % 881 AS BIGINT) AS n_samples,"
    " CAST((1000 + doc_id % 881) * 1000 //"
    "   (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000"
    "    WHEN 2 THEN 22050 ELSE 44100 END) AS BIGINT) AS duration_ms"
    " FROM documents",
    tag="llm-multimodal",
)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio metadata extraction: synthesize standards-compliant WAV
    headers (rate/channels/frame-count derived from doc_id), then recover
    every field plus integer-exact duration_ms by parsing the raw RIFF bytes
    in an Arrow-batched ``mapInPandas`` pass. The oracle recomputes the
    fields arithmetically — a hash match proves the round trip through real
    bytes. Same bounded-memory batch shape as the image path."""

    def synth_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                wav_bytes(_WAV_RATES[d % 4], 1 + d % 2, 16, 1000 + d % 881)
                for d in pdf["doc_id"]
            ]
            parsed = [parse_wav_header(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": ["audio/wav"] * len(pdf),
                    "sample_rate": [p[0] for p in parsed],
                    "channels": [p[1] for p in parsed],
                    "bits": [p[2] for p in parsed],
                    "n_samples": [p[3] for p in parsed],
                    "duration_ms": [p[4] for p in parsed],
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    docs = docs.repartition(max(docs.sparkSession.sparkContext.defaultParallelism, 4))
    return docs.mapInPandas(
        synth_and_parse,
        schema="doc_id long, mime string, sample_rate int, channels int,"
        " bits int, n_samples long, duration_ms long",
    )


# ---------------------------------------------------------------------------
# Real video-container metadata (ISO BMFF / MP4) — round-2 fourth wave
# ---------------------------------------------------------------------------

_MP4_TIMESCALES = (600, 1000, 24000, 90000)


def mp4_bytes(timescale: int, dur_s: int, width: int, height: int) -> bytes:
    """Minimal standards-shaped ISO-BMFF stream: ``ftyp`` + ``moov`` with
    ``mvhd`` (timescale/duration) and a ``tkhd`` carrying 16.16 fixed-point
    width/height — the boxes every real MP4 probe reads first."""
    import struct

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", timescale, timescale * dur_s)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # predefined
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">IIII", 0, 0, 1, 0)  # ctime mtime track_id reserved
        + struct.pack(">I", timescale * dur_s)  # duration
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


def parse_mp4_header(payload: bytes):
    """Walk top-level and moov-child ISO-BMFF boxes with real byte offsets:
    brand from ``ftyp``, timescale/duration from ``mvhd``, 16.16 dimensions
    from ``tkhd``. Returns (brand, timescale, duration, duration_ms, w, h)."""
    import struct

    nulls = (None, None, None, None, None, None)
    brand = timescale = duration = width = height = None

    def walk(buf: bytes, start: int, end: int):
        nonlocal brand, timescale, duration, width, height
        i = start
        while i + 8 <= end:
            size = struct.unpack(">I", buf[i : i + 4])[0]
            if size < 8:
                return
            tag = buf[i + 4 : i + 8]
            body = buf[i + 8 : i + size]
            if tag == b"ftyp":
                brand = body[:4].decode("ascii", "replace")
            elif tag in (b"moov", b"trak"):
                walk(buf, i + 8, i + size)
            elif tag == b"mvhd" and len(body) >= 20:
                timescale, duration = struct.unpack(">II", body[12:20])
            elif tag == b"tkhd" and len(body) >= 84:
                w, h = struct.unpack(">II", body[76:84])
                width, height = w >> 16, h >> 16
            i += size

    walk(payload, 0, len(payload))
    if brand is None or timescale is None:
        return nulls
    return (
        brand,
        timescale,
        duration,
        duration * 1000 // timescale,
        width,
        height,
    )


@query(
    "multimodal_video_meta",
    "SELECT doc_id, 'video/mp4' AS mime, 'isom' AS brand,"
    " CAST(CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000"
    "   WHEN 2 THEN 24000 ELSE 90000 END AS INT) AS timescale,"
    " CAST((5 + doc_id % 26) * 1000 AS BIGINT) AS duration_ms,"
    " CAST(320 + (doc_id % 8) * 160 AS INT) AS width,"
    " CAST(180 + (doc_id % 8) * 90 AS INT) AS height"
    " FROM documents",
    tag="llm-multimodal",
)
def multimodal_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container metadata: synthesize standards-shaped MP4
    (ISO-BMFF) byte streams — ftyp brand, mvhd timescale/duration, tkhd
    16.16 fixed-point dimensions — and recover every field by walking the
    box structure at real byte offsets in an Arrow-batched ``mapInPandas``
    pass. Completes the modality triple next to the PNG/JPEG/GIF/BMP image
    and RIFF/WAV audio parsers; only the codec payload (which the container
    merely wraps) stays out of scope in this environment. The oracle
    recomputes each field arithmetically, so a hash match proves the full
    synthesize → serialize → parse round trip."""

    def synth_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                ts = _MP4_TIMESCALES[d % 4]
                payload = mp4_bytes(
                    ts, 5 + d % 26, 320 + (d % 8) * 160, 180 + (d % 8) * 90
                )
                brand, timescale, _dur, dur_ms, w, h = parse_mp4_header(payload)
                rows.append((d, "video/mp4", brand, timescale, dur_ms, w, h))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mime", "brand", "timescale",
                    "duration_ms", "width", "height",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    docs = docs.repartition(max(docs.sparkSession.sparkContext.defaultParallelism, 4))
    return docs.mapInPandas(
        synth_and_parse,
        schema="doc_id long, mime string, brand string, timescale int,"
        " duration_ms long, width int, height int",
    )
