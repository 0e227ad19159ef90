"""ZIP and tar container ingest — dataset archives, walked for real.

Training corpora are routinely distributed as ZIP archives (image sets,
scraped-document dumps, per-shard bundles). This module implements the
reader the way the crawl tier reads WARC: a REAL parser over the raw
bytes (APPNOTE.TXT / ISO 21320 layout, public) rather than a library
call, so malformed archives degrade instead of raising and every
allocation is bounded:

- :func:`zip_member_walk` — locate the end-of-central-directory record
  (bounded tail scan), walk the central directory entries, cross-check
  each against its local file header, inflate (or copy) the member under
  a hard size cap, and CRC-32-verify the content;
- :func:`scan_zip_members` — the registered key: per-document archives
  synthesized with the stdlib writer (one STORED and two DEFLATED
  members whose contents derive from ``documents.text``), walked by the
  real parser, hash-proven against a DuckDB oracle that computes the
  member inventory (names, methods, sizes, CRC validity) from closed
  form without touching ZIP;
- :func:`tar_member_walk` / :func:`scan_tar_members` — the ustar twin
  (octal fields, spaces-substituted header checksum, 512-byte block
  walk), the SEQUENTIAL framing that splits like WARC on a cluster.

Reference basis: the reference engine's source surface is generic
file-format plugins (docs/ScalaSparkCompute-sparkcompute.md:5-6 names
arbitrary Spark-expressible sources); archive ingest is the packaging
variant a dataset user hits first. Synthesis uses ``zipfile`` (writing
is not under test); the PARSER is hand-rolled because the read path is
the 100-TB surface and must obey the degrade-don't-die contract.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

#: per-member decompressed cap — same resource-bomb discipline as the gzip
#: WARC walker; a member claiming/producing more is refused in O(cap).
ZIP_MEMBER_CAP = 4 << 20

_EOCD_SIG = b"PK\x05\x06"
_CDIR_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"


def zip_member_walk(raw: bytes, cap: int = ZIP_MEMBER_CAP):
    """Walk a ZIP archive's central directory and return
    ``(name, method, uncomp_len, crc_ok, content)`` per member, or an
    empty list for anything malformed. Never raises. The walk is
    central-directory-driven (the authoritative index per APPNOTE), each
    entry is cross-checked against its local header, only STORED (0) and
    DEFLATED (8) members are materialized, and both the declared and the
    actual inflated sizes are capped."""
    out = []
    if not raw or len(raw) < 22:
        return out
    # EOCD: scan the last 64 KiB + 22 for the signature (comment may follow)
    tail_start = max(0, len(raw) - (22 + 0xFFFF))
    eocd = raw.rfind(_EOCD_SIG, tail_start)
    if eocd < 0 or eocd + 22 > len(raw):
        return out
    n_entries, cd_size, cd_off = struct.unpack(
        "<HI I", raw[eocd + 10 : eocd + 20]
    )
    if cd_off + cd_size > eocd or n_entries > 65535:
        return out
    pos = cd_off
    for _ in range(n_entries):
        if raw[pos : pos + 4] != _CDIR_SIG or pos + 46 > len(raw):
            return out  # corrupt index: refuse the whole archive
        method = struct.unpack("<H", raw[pos + 10 : pos + 12])[0]
        # +12..+16 are the DOS mod time/date, irrelevant to the walk
        crc, comp_len, uncomp_len, name_len, extra_len, comment_len = (
            struct.unpack("<I I I H H H", raw[pos + 16 : pos + 34])
        )
        local_off = struct.unpack("<I", raw[pos + 42 : pos + 46])[0]
        name_bytes = raw[pos + 46 : pos + 46 + name_len]
        if len(name_bytes) < name_len:
            return out
        pos += 46 + name_len + extra_len + comment_len
        try:
            name = name_bytes.decode("utf-8")
        except UnicodeDecodeError:
            continue  # undecodable name: skip the member, keep walking
        if uncomp_len > cap or comp_len > cap:
            continue  # declared bomb: refuse the member
        # local header cross-check (its name/extra lengths are its own)
        if raw[local_off : local_off + 4] != _LOCAL_SIG or local_off + 30 > len(raw):
            continue
        lname_len, lextra_len = struct.unpack(
            "<HH", raw[local_off + 26 : local_off + 30]
        )
        data_start = local_off + 30 + lname_len + lextra_len
        comp = raw[data_start : data_start + comp_len]
        if len(comp) < comp_len:
            continue
        if method == 0:  # STORED
            content = comp
        elif method == 8:  # DEFLATED
            d = zlib.decompressobj(wbits=-15)
            try:
                content = d.decompress(comp, cap + 1)
            except zlib.error:
                continue
            if len(content) > cap:
                continue  # actual bomb: refuse
        else:
            continue  # unsupported method: skip, don't guess
        crc_ok = (
            len(content) == uncomp_len
            and (zlib.crc32(content) & 0xFFFFFFFF) == crc
        )
        out.append((name, method, uncomp_len, crc_ok, content))
    return out


def zip_archive_bytes(doc_id: int, text: str) -> bytes:
    """One document's synthesized dataset archive: a STORED text member,
    a DEFLATED metadata member, and a DEFLATED half-text member —
    deterministic bytes (fixed timestamp, fixed member order)."""
    import io
    import zipfile

    text = text or ""
    half = text[: (len(text) + 1) // 2]
    meta = f'{{"doc_id": {doc_id}, "n_chars": {len(text)}}}'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data, method in [
            (f"doc_{doc_id}/text.txt", text, zipfile.ZIP_STORED),
            (f"doc_{doc_id}/meta.json", meta, zipfile.ZIP_DEFLATED),
            (f"doc_{doc_id}/half.txt", half, zipfile.ZIP_DEFLATED),
        ]:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = method
            zf.writestr(zi, data)
    return buf.getvalue()


_ZIP_ORACLE = """
WITH members AS (
  SELECT doc_id,
    'doc_' || CAST(doc_id AS VARCHAR) || '/text.txt' AS name,
    0 AS method,
    length(coalesce(text, '')) AS uncomp_len
  FROM documents
  UNION ALL
  SELECT doc_id,
    'doc_' || CAST(doc_id AS VARCHAR) || '/meta.json',
    8,
    length('{"doc_id": ' || CAST(doc_id AS VARCHAR) || ', "n_chars": '
           || CAST(length(coalesce(text, '')) AS VARCHAR) || '}')
  FROM documents
  UNION ALL
  SELECT doc_id,
    'doc_' || CAST(doc_id AS VARCHAR) || '/half.txt',
    8,
    CAST(floor((length(coalesce(text, '')) + 1) / 2) AS BIGINT)
  FROM documents)
SELECT doc_id, name, CAST(method AS INT) AS method,
  CAST(uncomp_len AS BIGINT) AS uncomp_len, TRUE AS crc_ok
FROM members
"""


@query("scan_zip_members", _ZIP_ORACLE, tag="scan")
def scan_zip_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-archive ingest: synthesize each document's ZIP worker-side,
    walk it with the REAL central-directory parser (EOCD tail scan, local
    header cross-check, bounded inflate, CRC-32 verify), and emit the
    member inventory. The DuckDB oracle computes names/methods/sizes from
    closed form and asserts ``crc_ok`` TRUE — so a hash match proves the
    store/deflate round trip AND the checksum chain per member, while the
    oracle itself never touches ZIP. ASCII members mean byte length ==
    char length on both engines. Per-row mapInPandas over the scan, no
    shuffle — archive-per-task is how a real cluster reads ZIP shards
    (ZIP's index-at-end makes whole-archive-per-task the correct split,
    unlike WARC's member streaming)."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def walk(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = zip_archive_bytes(int(doc_id), text)
                for name, method, ulen, crc_ok, _content in zip_member_walk(raw):
                    rows.append((doc_id, name, method, ulen, crc_ok))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "name", "method", "uncomp_len", "crc_ok"],
            )

    return d.mapInPandas(
        walk,
        "doc_id long, name string, method int, uncomp_len long, crc_ok boolean",
    )


# --- tar (ustar): the other archive framing datasets ship in ---------------

#: member-size cap for the tar walker (same discipline as ZIP_MEMBER_CAP;
#: tar sizes are DECLARED, so a lying header is refused before any slice).
TAR_MEMBER_CAP = 4 << 20


def tar_member_walk(raw: bytes, cap: int = TAR_MEMBER_CAP):
    """Walk a ustar archive (POSIX.1-1988 layout, public): 512-byte
    headers with octal size fields and a spaces-substituted checksum,
    data in 512-byte blocks, terminated by two zero blocks. Returns
    ``(name, size, typeflag, chksum_ok, content)`` per regular-file
    member; never raises; stops at the first malformed header (degrade,
    don't guess) and refuses declared sizes past the cap or the buffer."""
    out = []
    if not raw:
        return out
    pos = 0
    n = len(raw)
    while pos + 512 <= n:
        hdr = raw[pos : pos + 512]
        if hdr == b"\x00" * 512:  # end-of-archive marker
            break
        if hdr[257:262] != b"ustar":
            break
        try:
            size = int(hdr[124:135].rstrip(b" \x00") or b"0", 8)
            declared_sum = int(hdr[148:155].rstrip(b" \x00") or b"0", 8)
        except ValueError:
            break
        if size < 0 or size > cap or pos + 512 + size > n:
            break  # lying length: refuse the phantom member
        actual_sum = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        name = hdr[:100].rstrip(b"\x00")
        prefix = hdr[345:500].rstrip(b"\x00")
        if prefix:
            name = prefix + b"/" + name
        try:
            name_s = name.decode("utf-8")
        except UnicodeDecodeError:
            break
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        content = raw[pos + 512 : pos + 512 + size]
        if typeflag in ("0", "\x00"):
            out.append(
                (name_s, size, typeflag, actual_sum == declared_sum, content)
            )
        pos += 512 + ((size + 511) // 512) * 512
    return out


def tar_archive_bytes(doc_id: int, text: str) -> bytes:
    """The tar twin of :func:`zip_archive_bytes`: same three members,
    fixed mtime, strict ustar format — deterministic bytes."""
    import io
    import tarfile

    text = text or ""
    half = text[: (len(text) + 1) // 2]
    meta = f'{{"doc_id": {doc_id}, "n_chars": {len(text)}}}'
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in [
            (f"doc_{doc_id}/text.txt", text),
            (f"doc_{doc_id}/meta.json", meta),
            (f"doc_{doc_id}/half.txt", half),
        ]:
            ti = tarfile.TarInfo(name)
            payload = data.encode("utf-8")
            ti.size = len(payload)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(payload))
    return buf.getvalue()


_TAR_ORACLE = """
WITH members AS (
  SELECT doc_id,
    'doc_' || CAST(doc_id AS VARCHAR) || '/text.txt' AS name,
    length(coalesce(text, '')) AS size
  FROM documents
  UNION ALL
  SELECT doc_id,
    'doc_' || CAST(doc_id AS VARCHAR) || '/meta.json',
    length('{"doc_id": ' || CAST(doc_id AS VARCHAR) || ', "n_chars": '
           || CAST(length(coalesce(text, '')) AS VARCHAR) || '}')
  FROM documents
  UNION ALL
  SELECT doc_id,
    'doc_' || CAST(doc_id AS VARCHAR) || '/half.txt',
    CAST(floor((length(coalesce(text, '')) + 1) / 2) AS BIGINT)
  FROM documents)
SELECT doc_id, name, CAST(size AS BIGINT) AS size, TRUE AS chksum_ok
FROM members
"""


@query("scan_tar_members", _TAR_ORACLE, tag="scan")
def scan_tar_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tar-shard ingest, the sequential-framing twin of
    ``scan_zip_members``: per-document ustar archives walked by the real
    header parser (octal fields, spaces-substituted checksum verify,
    512-block advance, lying-size refusal). The oracle asserts every
    member's name, size, and checksum validity from closed form. Unlike
    ZIP's index-at-end, tar streams — so on a real cluster it splits
    like WARC (sequential member walk per file slice), which is why both
    framings exist here. Per-row mapInPandas, no shuffle."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def walk(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = tar_archive_bytes(int(doc_id), text)
                for name, size, _tf, chksum_ok, _c in tar_member_walk(raw):
                    rows.append((doc_id, name, size, chksum_ok))
            yield pd.DataFrame(
                rows, columns=["doc_id", "name", "size", "chksum_ok"]
            )

    return d.mapInPandas(
        walk, "doc_id long, name string, size long, chksum_ok boolean"
    )


def tgz_archive_bytes(doc_id: int, text: str) -> bytes:
    """``.tar.gz``: the tar archive as ONE gzip stream (unlike WARC's
    per-record members — a .tgz cannot be split without inflating from
    the start, which is exactly the scale caveat the key documents)."""
    import gzip

    return gzip.compress(tar_archive_bytes(doc_id, text), mtime=0)


def tgz_member_walk(raw: bytes, cap: int = TAR_MEMBER_CAP):
    """Inflate the single gzip stream (bomb-capped at 64x the tar cap —
    an archive of capped members can still be legitimately larger than
    one member) and walk the tar inside. Never raises."""
    import zlib

    if not raw or raw[:2] != b"\x1f\x8b":
        return []
    d = zlib.decompressobj(wbits=31)
    stream_cap = cap * 64
    try:
        data = d.decompress(raw, stream_cap + 1)
    except zlib.error:
        return []
    if len(data) > stream_cap or not d.eof:
        return []  # bomb or truncated stream: refuse
    return tar_member_walk(data, cap)


@query("scan_tgz_members", _TAR_ORACLE, tag="scan")
def scan_tgz_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``.tar.gz`` ingest — the composition of the gzip inflate (bounded,
    single-stream) and the checksum-verified ustar walk, under the SAME
    oracle as the plain tar key: a hash match proves compress → inflate →
    header walk lossless per member. The documented scale caveat is the
    key's point: a .tgz is ONE deflate stream, so the parallelism unit is
    the ARCHIVE (one file per task), unlike gzip-member WARC where tasks
    can start at member boundaries — the reason crawl corpora frame
    per-record and dataset bundles ship many shards."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def walk(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = tgz_archive_bytes(int(doc_id), text)
                for name, size, _tf, chksum_ok, _c in tgz_member_walk(raw):
                    rows.append((doc_id, name, size, chksum_ok))
            yield pd.DataFrame(
                rows, columns=["doc_id", "name", "size", "chksum_ok"]
            )

    return d.mapInPandas(
        walk, "doc_id long, name string, size long, chksum_ok boolean"
    )
