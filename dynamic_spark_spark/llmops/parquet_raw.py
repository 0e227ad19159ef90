"""Parquet DATA-path read from raw bytes — no parquet library anywhere.

The footer audit (:mod:`parquet_footer`) proves the metadata layer; this
module walks the rest of the way down and reads actual COLUMN VALUES out
of a Spark-written, snappy-compressed parquet file:

    footer (Thrift compact) → row groups → column-chunk metadata
    → page headers (Thrift compact, at their byte offsets)
    → SNAPPY decompression (pure-Python tag walk — the format parquet
      compresses with BY DEFAULT)
    → definition levels (RLE/bit-packed hybrid)
    → PLAIN-encoded values.

Every layer is an independent re-implementation forced to agree with
parquet-mr (the JVM writer) through the real bytes, and the key's oracle
is the identity projection — a hash match means thrift field walks, the
snappy tag decoder, the RLE hybrid, and little-endian PLAIN decoding are
all correct simultaneously. pytest additionally pins the chain against
pyarrow-written files (a THIRD independent writer).

This is the 100-TB repair story: when a shard fails in the vectorized
reader, the bytes-level read is how you find which layer lies.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.llmops.parquet_footer import _Compact
from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

#: decompressed-page cap — the container discipline
PAGE_CAP = 64 << 20


def snappy_decompress(src: bytes, cap: int = PAGE_CAP):
    """Pure-Python snappy decode (google/snappy format_description.txt,
    public): varint preamble with the uncompressed length, then a tag
    stream of literals and 1/2/4-byte-offset copies. Returns None for
    malformed input; never raises."""
    try:
        total = 0
        shift = 0
        pos = 0
        while True:
            b = src[pos]
            pos += 1
            total |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 32:
                return None
        if total > cap:
            return None
        out = bytearray()
        n = len(src)
        while pos < n:
            tag = src[pos]
            pos += 1
            kind = tag & 3
            if kind == 0:  # literal
                ln = tag >> 2
                if ln >= 60:
                    extra = ln - 59
                    ln = int.from_bytes(src[pos : pos + extra], "little")
                    pos += extra
                ln += 1
                if pos + ln > n or len(out) + ln > total:
                    return None
                out += src[pos : pos + ln]
                pos += ln
                continue
            if kind == 1:  # copy, 1-byte offset
                ln = ((tag >> 2) & 0x7) + 4
                offset = ((tag & 0xE0) << 3) | src[pos]
                pos += 1
            elif kind == 2:  # copy, 2-byte offset
                ln = (tag >> 2) + 1
                offset = src[pos] | (src[pos + 1] << 8)
                pos += 2
            else:  # copy, 4-byte offset
                ln = (tag >> 2) + 1
                offset = int.from_bytes(src[pos : pos + 4], "little")
                pos += 4
            if offset == 0 or offset > len(out) or len(out) + ln > total:
                return None
            start = len(out) - offset
            for i in range(ln):  # byte-wise: overlapping copies
                out.append(out[start + i])
        if len(out) != total:
            return None
        return bytes(out)
    except IndexError:
        return None


def _rle_bitpacked_bools(data: bytes, bit_width: int, count: int):
    """Decode the RLE/bit-packed hybrid (parquet encodings.md) for the
    small bit widths definition levels use. Returns a list of ints or
    None."""
    if bit_width == 0:
        return [0] * count
    out: list[int] = []
    pos = 0
    byte_w = (bit_width + 7) // 8
    mask = (1 << bit_width) - 1
    try:
        while len(out) < count:
            # ULEB128 header
            header = 0
            shift = 0
            while True:
                b = data[pos]
                pos += 1
                header |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            if header & 1:  # bit-packed run: (header>>1) groups of 8
                groups = header >> 1
                nbits = groups * 8 * bit_width
                nbytes = (nbits + 7) // 8
                bits = int.from_bytes(data[pos : pos + nbytes], "little")
                pos += nbytes
                for i in range(groups * 8):
                    if len(out) >= count:
                        break
                    out.append((bits >> (i * bit_width)) & mask)
            else:  # RLE run
                run = header >> 1
                if run > count:  # lying run length
                    return None
                val = int.from_bytes(data[pos : pos + byte_w], "little") & mask
                pos += byte_w
                out.extend([val] * min(run, count - len(out)))
        return out[:count]
    except IndexError:
        return None


def _codec_decompress(codec: int, body: bytes, uncompressed: int):
    if codec == 0:  # UNCOMPRESSED
        return body
    if codec == 1:  # SNAPPY
        return snappy_decompress(body, max(uncompressed, 1))
    return None  # other codecs: out of scope — refuse, don't guess


def read_parquet_int64_column(raw: bytes, column: str):
    """Read every value of a required/optional INT64 column straight
    from the file bytes: footer → chunk metadata → page walk → snappy →
    def levels → PLAIN. Returns the list of non-null values or None.
    Dictionary-encoded chunks are refused (the key writes with
    dictionary disabled; a general reader would add the dict-decode
    tier). Never raises."""
    try:
        return _read_inner(raw, column)
    except Exception:
        return None


def _read_inner(raw: bytes, column: str):
    if not raw or len(raw) < 12 or raw[:4] != b"PAR1" or raw[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack("<I", raw[-8:-4])
    start = len(raw) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    c = _Compact(raw, start)
    chunks = []  # (codec, num_values, data_page_offset)
    last_fid = 0
    while True:
        fid, wtype = c.field_header(last_fid)
        if wtype == 0:
            break
        last_fid = fid
        if fid == 4 and wtype == 9:  # row_groups
            size, etype = c.list_header()
            if etype != 12:
                return None
            for _ in range(size):
                rg_last = 0
                while True:
                    rfid, rtype = c.field_header(rg_last)
                    if rtype == 0:
                        break
                    rg_last = rfid
                    if rfid == 1 and rtype == 9:  # columns: list<ColumnChunk>
                        csize, cetype = c.list_header()
                        if cetype != 12:
                            return None
                        for _ in range(csize):
                            chunk = _parse_column_chunk(c)
                            if chunk is not None:
                                chunks.append(chunk)
                    else:
                        c.skip(rtype, 0)
        else:
            c.skip(wtype, 0)

    values: list[int] = []
    for codec, num_values, page_off, path in chunks:
        if path != column:
            continue
        got = 0
        pos = page_off
        while got < num_values:
            page = _parse_page_header(raw, pos)
            if page is None:
                return None
            ptype, comp_size, uncomp_size, n_vals, def_enc, body_start = page
            body = raw[body_start : body_start + comp_size]
            if len(body) < comp_size:
                return None
            pos = body_start + comp_size
            if ptype == 2:  # dictionary page: this reader refuses dict chunks
                return None
            if ptype != 0:  # only v1 data pages in scope
                return None
            data = _codec_decompress(codec, body, uncomp_size)
            if data is None or len(data) != uncomp_size:
                return None
            # optional column ⇒ def levels block: [len i32][hybrid runs]
            (dlen,) = struct.unpack("<I", data[:4])
            levels = _rle_bitpacked_bools(data[4 : 4 + dlen], 1, n_vals)
            if levels is None:
                return None
            n_present = sum(levels)
            vals = data[4 + dlen : 4 + dlen + 8 * n_present]
            if len(vals) < 8 * n_present:
                return None
            values.extend(struct.unpack(f"<{n_present}q", vals))
            got += n_vals
    return values


def _parse_column_chunk(c: _Compact):
    """ColumnChunk → (codec, num_values, data_page_offset, dotted path)
    or None when fields are missing."""
    codec = num_values = page_off = None
    dict_off = None
    path = None
    last = 0
    while True:
        fid, wtype = c.field_header(last)
        if wtype == 0:
            break
        last = fid
        if fid == 3 and wtype == 12:  # meta_data: ColumnMetaData
            m_last = 0
            while True:
                mfid, mtype = c.field_header(m_last)
                if mtype == 0:
                    break
                m_last = mfid
                if mfid == 3 and mtype == 9:  # path_in_schema
                    size, etype = c.list_header()
                    parts = []
                    for _ in range(size):
                        ln = c.varint()
                        parts.append(
                            c.data[c.pos : c.pos + ln].decode("utf-8")
                        )
                        c.pos += ln
                    path = ".".join(parts)
                elif mfid == 4 and mtype == 5:
                    codec = c.zigzag()
                elif mfid == 5 and mtype == 6:
                    num_values = c.zigzag()
                elif mfid == 9 and mtype == 6:
                    page_off = c.zigzag()
                elif mfid == 11 and mtype == 6:
                    dict_off = c.zigzag()
                else:
                    c.skip(mtype, 0)
        else:
            c.skip(wtype, 0)
    if codec is None or num_values is None or page_off is None:
        return None
    # a dictionary page sits BEFORE data_page_offset when present; the
    # reader starts at the dict page to detect (and refuse) it honestly
    start = dict_off if dict_off is not None else page_off
    return codec, num_values, start, path


def _parse_page_header(raw: bytes, pos: int):
    """PageHeader → (type, compressed_size, uncompressed_size,
    num_values, def_level_encoding, body_start) or None."""
    c = _Compact(raw, pos)
    ptype = comp = uncomp = None
    n_vals = def_enc = None
    last = 0
    while True:
        fid, wtype = c.field_header(last)
        if wtype == 0:
            break
        last = fid
        if fid == 1 and wtype == 5:
            ptype = c.zigzag()
        elif fid == 2 and wtype == 5:
            uncomp = c.zigzag()
        elif fid == 3 and wtype == 5:
            comp = c.zigzag()
        elif fid == 5 and wtype == 12:  # DataPageHeader
            d_last = 0
            while True:
                dfid, dtype = c.field_header(d_last)
                if dtype == 0:
                    break
                d_last = dfid
                if dfid == 1 and dtype == 5:
                    n_vals = c.zigzag()
                elif dfid == 3 and dtype == 5:
                    def_enc = c.zigzag()
                else:
                    c.skip(dtype, 0)
        elif fid == 7 and wtype == 12:  # DictionaryPageHeader
            c.skip_struct(0)
            n_vals = n_vals or 0
        else:
            c.skip(wtype, 0)
    if ptype is None or comp is None or uncomp is None:
        return None
    return ptype, comp, uncomp, n_vals or 0, def_enc, c.pos


_RAW_COLUMN_ORACLE = """
SELECT doc_id FROM documents
"""


@query("scan_parquet_raw_column", _RAW_COLUMN_ORACLE, tag="scan")
def scan_parquet_raw_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet DATA read with no parquet library: Spark writes the
    documents table as snappy-compressed parquet (dictionary encoding
    disabled so the page payload is honest PLAIN int64), the files are
    re-scanned as binary, and the ``doc_id`` column is recovered byte by
    byte — Thrift footer walk, page-header walk at real offsets,
    pure-Python SNAPPY, RLE/bit-packed definition levels, little-endian
    PLAIN. The identity oracle hash-proves all five layers at once
    against what parquet-mr actually wrote; pytest repeats the chain
    against pyarrow-written files (a third writer). Per-file mapInPandas,
    zero shuffle."""
    import shutil
    import tempfile

    import pandas as pd

    out = tempfile.mkdtemp(prefix="dss_rawcol_")
    try:
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        (
            d.write.mode("overwrite")
            .option("compression", "snappy")
            .option("parquet.enable.dictionary", "false")
            .parquet(out)
        )
        files = spark.read.format("binaryFile").load(
            out, pathGlobFilter="*.parquet"
        ).select("content")

        def read_col(batches):
            for pdf in batches:
                vals: list[int] = []
                for content in pdf["content"]:
                    got = read_parquet_int64_column(bytes(content), "doc_id")
                    if got is not None:
                        vals.extend(got)
                yield pd.DataFrame({"doc_id": vals})

        res = files.mapInPandas(read_col, "doc_id long")
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
