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
    Dictionary-encoded chunks are refused by THIS entry point (the
    PLAIN-only tier keeps its refusal semantics under test);
    :func:`read_parquet_int64_column_dict` is the general reader that
    handles them. Never raises."""
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


def read_parquet_int64_column_dict(raw: bytes, column: str):
    """The DICTIONARY tier of the raw reader — what parquet-mr writes BY
    DEFAULT: the chunk opens with a PLAIN dictionary page, and each data
    page encodes indices as [bit-width byte][RLE/bit-packed hybrid].
    Returns non-null values in row order, falling back to the PLAIN
    reader per chunk when no dictionary page exists. Never raises."""
    try:
        return _read_dict_inner(raw, column)
    except Exception:
        return None


def _read_dict_inner(raw: bytes, column: str):
    if not raw or len(raw) < 12 or raw[:4] != b"PAR1" or raw[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack("<I", raw[-8:-4])
    start = len(raw) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    c = _Compact(raw, start)
    chunks = []
    last_fid = 0
    while True:
        fid, wtype = c.field_header(last_fid)
        if wtype == 0:
            break
        last_fid = fid
        if fid == 4 and wtype == 9:
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
                    if rfid == 1 and rtype == 9:
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
        dictionary = None
        got = 0
        pos = page_off
        while got < num_values:
            page = _parse_page_header(raw, pos)
            if page is None:
                return None
            ptype, comp_size, uncomp_size, n_vals, _def_enc, body_start = page
            body = raw[body_start : body_start + comp_size]
            if len(body) < comp_size:
                return None
            pos = body_start + comp_size
            data = _codec_decompress(codec, body, uncomp_size)
            if data is None or len(data) != uncomp_size:
                return None
            if ptype == 2:  # dictionary page: PLAIN int64 entries
                if len(data) % 8:
                    return None
                dictionary = list(
                    struct.unpack(f"<{len(data) // 8}q", data)
                )
                continue
            if ptype != 0:
                return None
            (dlen,) = struct.unpack("<I", data[:4])
            levels = _rle_bitpacked_bools(data[4 : 4 + dlen], 1, n_vals)
            if levels is None:
                return None
            n_present = sum(levels)
            payload = data[4 + dlen :]
            if dictionary is None:
                # PLAIN data page inside a chunk with no dict page
                vals_b = payload[: 8 * n_present]
                if len(vals_b) < 8 * n_present:
                    return None
                values.extend(struct.unpack(f"<{n_present}q", vals_b))
            else:
                if not payload:
                    return None
                bit_width = payload[0]
                if bit_width > 32:
                    return None
                idxs = _rle_bitpacked_bools(payload[1:], bit_width, n_present)
                if idxs is None:
                    return None
                try:
                    values.extend(dictionary[i] for i in idxs)
                except IndexError:
                    return None  # index outside the dictionary: corrupt
            got += n_vals
    return values


def read_parquet_footer_minmax(raw: bytes, column: str):
    """Column Statistics straight from the footer: the (min, max) over
    every row group's ``Statistics.min_value``/``max_value`` (fields
    6/5, int64 PLAIN bytes) for the named column — the metadata a
    pruning reader trusts, read here independently so it can be AUDITED
    against the data. Returns (min, max) or None."""
    try:
        return _minmax_inner(raw, column)
    except Exception:
        return None


def _minmax_inner(raw: bytes, column: str):
    if not raw or len(raw) < 12 or raw[:4] != b"PAR1" or raw[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack("<I", raw[-8:-4])
    start = len(raw) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    c = _Compact(raw, start)
    mn = mx = None
    last_fid = 0
    while True:
        fid, wtype = c.field_header(last_fid)
        if wtype == 0:
            break
        last_fid = fid
        if fid != 4 or wtype != 9:
            c.skip(wtype, 0)
            continue
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
                if rfid != 1 or rtype != 9:
                    c.skip(rtype, 0)
                    continue
                csize, cetype = c.list_header()
                for _ in range(csize):
                    got = _chunk_stats(c)
                    if got is None:
                        continue
                    path, cmn, cmx = got
                    if path != column or cmn is None or cmx is None:
                        continue
                    mn = cmn if mn is None else min(mn, cmn)
                    mx = cmx if mx is None else max(mx, cmx)
    if mn is None:
        return None
    return mn, mx


def _chunk_stats(c: _Compact):
    """One ColumnChunk → (path, stats_min, stats_max); values decoded as
    int64 PLAIN from Statistics.min_value/max_value."""
    path = None
    mn = mx = None
    last = 0
    while True:
        fid, wtype = c.field_header(last)
        if wtype == 0:
            break
        last = fid
        if fid == 3 and wtype == 12:
            m_last = 0
            while True:
                mfid, mtype = c.field_header(m_last)
                if mtype == 0:
                    break
                m_last = mfid
                if mfid == 3 and mtype == 9:
                    size, _etype = c.list_header()
                    parts = []
                    for _ in range(size):
                        ln = c.varint()
                        parts.append(
                            c.data[c.pos : c.pos + ln].decode("utf-8")
                        )
                        c.pos += ln
                    path = ".".join(parts)
                elif mfid == 12 and mtype == 12:  # Statistics
                    s_last = 0
                    while True:
                        sfid, stype = c.field_header(s_last)
                        if stype == 0:
                            break
                        s_last = sfid
                        if sfid in (5, 6) and stype == 8:  # max_value/min_value
                            ln = c.varint()
                            vb = c.data[c.pos : c.pos + ln]
                            c.pos += ln
                            if ln == 8:
                                (v,) = struct.unpack("<q", vb)
                                if sfid == 5:
                                    mx = v
                                else:
                                    mn = v
                        else:
                            c.skip(stype, 0)
                else:
                    c.skip(mtype, 0)
        else:
            c.skip(wtype, 0)
    return path, mn, mx


_RAW_DICT_ORACLE = """
SELECT doc_id,
  CAST((SELECT min(doc_id) FROM documents) AS BIGINT) AS stats_min,
  CAST((SELECT max(doc_id) FROM documents) AS BIGINT) AS stats_max
FROM documents
"""


@query("scan_parquet_raw_dict", _RAW_DICT_ORACLE, tag="scan")
def scan_parquet_raw_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFAULT parquet layout, read raw: Spark writes with
    dictionary encoding ON (no options — exactly what every production
    file looks like), and the reader recovers ``doc_id`` through the
    dictionary tier (PLAIN dict page → bit-width byte → RLE/bit-packed
    indices → gather), plus the footer's Statistics min/max for the same
    column — so the one hash match proves the dictionary decode AND that
    the pruning metadata agrees with the data it describes. Spark may
    legitimately fall back to PLAIN mid-chunk past the dictionary size
    threshold; the reader handles both page forms, which is the point —
    a raw reader that only handles the happy path cannot audit real
    files. Per-file mapInPandas, zero shuffle."""
    import shutil
    import tempfile

    import pandas as pd

    out = tempfile.mkdtemp(prefix="dss_rawdict_")
    try:
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        d.write.mode("overwrite").option("compression", "snappy").parquet(out)
        files = spark.read.format("binaryFile").load(
            out, pathGlobFilter="*.parquet"
        ).select("content")

        def read_col(batches):
            for pdf in batches:
                rows = []
                for content in pdf["content"]:
                    raw = bytes(content)
                    vals = read_parquet_int64_column_dict(raw, "doc_id")
                    stats = read_parquet_footer_minmax(raw, "doc_id")
                    if vals is None or stats is None:
                        continue
                    for v in vals:
                        rows.append((v, stats[0], stats[1]))
                yield pd.DataFrame(
                    rows, columns=["doc_id", "stats_min", "stats_max"]
                )

        res = files.mapInPandas(
            read_col, "doc_id long, stats_min long, stats_max long"
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def read_parquet_binary_column(raw: bytes, column: str):
    """BYTE_ARRAY tier: read every value of a string/binary column from
    raw bytes — PLAIN pages are ``[u32 little-endian length][bytes]``
    repeated; dictionary chunks gather from a PLAIN dict page through
    the same bit-width/RLE index runs as the int64 tier. Returns the
    list of non-null ``bytes`` values in row order, or None. Never
    raises."""
    try:
        return _read_binary_inner(raw, column)
    except Exception:
        return None


def _plain_byte_arrays(buf: bytes, count: int):
    out = []
    pos = 0
    for _ in range(count):
        if pos + 4 > len(buf):
            return None
        (ln,) = struct.unpack("<I", buf[pos : pos + 4])
        pos += 4
        if ln > PAGE_CAP or pos + ln > len(buf):
            return None
        out.append(buf[pos : pos + ln])
        pos += ln
    return out


def _read_binary_inner(raw: bytes, column: str):
    if not raw or len(raw) < 12 or raw[:4] != b"PAR1" or raw[-4:] != b"PAR1":
        return None
    (flen,) = struct.unpack("<I", raw[-8:-4])
    start = len(raw) - 8 - flen
    if flen <= 0 or start < 4:
        return None
    c = _Compact(raw, start)
    chunks = []
    last_fid = 0
    while True:
        fid, wtype = c.field_header(last_fid)
        if wtype == 0:
            break
        last_fid = fid
        if fid == 4 and wtype == 9:
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
                    if rfid == 1 and rtype == 9:
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

    values: list[bytes] = []
    for codec, num_values, page_off, path in chunks:
        if path != column:
            continue
        dictionary = None
        got = 0
        pos = page_off
        while got < num_values:
            page = _parse_page_header(raw, pos)
            if page is None:
                return None
            ptype, comp_size, uncomp_size, n_vals, _def_enc, body_start = page
            body = raw[body_start : body_start + comp_size]
            if len(body) < comp_size:
                return None
            pos = body_start + comp_size
            data = _codec_decompress(codec, body, uncomp_size)
            if data is None or len(data) != uncomp_size:
                return None
            if ptype == 2:  # dictionary page: PLAIN byte arrays
                # count unknown from the page alone: parse until the
                # buffer is exhausted (every entry length-prefixed)
                entries = []
                dpos = 0
                while dpos < len(data):
                    if dpos + 4 > len(data):
                        return None
                    (ln,) = struct.unpack("<I", data[dpos : dpos + 4])
                    dpos += 4
                    if ln > PAGE_CAP or dpos + ln > len(data):
                        return None
                    entries.append(data[dpos : dpos + ln])
                    dpos += ln
                dictionary = entries
                continue
            if ptype != 0:
                return None
            (dlen,) = struct.unpack("<I", data[:4])
            levels = _rle_bitpacked_bools(data[4 : 4 + dlen], 1, n_vals)
            if levels is None:
                return None
            n_present = sum(levels)
            payload = data[4 + dlen :]
            if dictionary is None:
                vals = _plain_byte_arrays(payload, n_present)
                if vals is None:
                    return None
                values.extend(vals)
            else:
                if not payload:
                    return None
                bit_width = payload[0]
                if bit_width > 32:
                    return None
                idxs = _rle_bitpacked_bools(payload[1:], bit_width, n_present)
                if idxs is None:
                    return None
                try:
                    values.extend(dictionary[i] for i in idxs)
                except IndexError:
                    return None
            got += n_vals
    return values


_RAW_TABLE_ORACLE = """
SELECT doc_id, coalesce(text, '') AS text FROM documents
"""


@query("scan_parquet_raw_table", _RAW_TABLE_ORACLE, tag="scan")
def scan_parquet_raw_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw reader reconstructs the WHOLE TABLE: ``doc_id`` through
    the int64 dictionary tier and ``text`` through the BYTE_ARRAY tier
    (length-prefixed PLAIN pages / dictionary gather), zipped back into
    rows and hash-proven against the identity oracle — a user could
    recover this table with no parquet library at all, which is the
    final form of the audit story: metadata, statistics, and now every
    byte of data, all independently re-readable. Default Spark write
    settings (dictionary on, snappy), per-file mapInPandas, zero
    shuffle."""
    import shutil
    import tempfile

    import pandas as pd

    out = tempfile.mkdtemp(prefix="dss_rawtable_")
    try:
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        d.write.mode("overwrite").option("compression", "snappy").parquet(out)
        files = spark.read.format("binaryFile").load(
            out, pathGlobFilter="*.parquet"
        ).select("content")

        def read_table(batches):
            for pdf in batches:
                rows = []
                for content in pdf["content"]:
                    raw = bytes(content)
                    ids = read_parquet_int64_column_dict(raw, "doc_id")
                    texts = read_parquet_binary_column(raw, "text")
                    if ids is None or texts is None or len(ids) != len(texts):
                        continue
                    rows.extend(
                        (i, t.decode("utf-8")) for i, t in zip(ids, texts)
                    )
                yield pd.DataFrame(rows, columns=["doc_id", "text"])

        res = files.mapInPandas(read_table, "doc_id long, text string")
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
