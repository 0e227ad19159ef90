"""Non-ASCII corpus robustness (r10 ADVICE): keys whose oracles used to
equate char length with UTF-8 byte length, or encode latin-1
one-sidedly, must stay hash-green on a corpus with multi-byte and
astral codepoints. The fixture stages a unicode documents table and
runs each key's Spark plan AND its registered DuckDB oracle over the
same parquet — the exact driver-gate shape."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dynamic_spark_spark.registry import ORACLE, load_all_queries
from tests.oracle_harness import compare

QUERIES = load_all_queries()

_TEXTS = [
    "plain ascii line",
    "héllo wörld",          # latin-1 range accents
    "naïve café ß",    # more latin-1
    "日本語テキスト",  # CJK
    "mixed русский text",  # cyrillic
    "emoji \U0001f680 astral",        # surrogate-pair / astral plane
    "math ∂ƒ© symbols",
    "",                                # empty survives framing
]


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("unicode_sf")
    table = pa.table({
        "doc_id": pa.array(range(len(_TEXTS)), type=pa.int64()),
        "text": pa.array(_TEXTS, type=pa.string()),
    })
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def unicode_con(unicode_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{unicode_sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    ["scan_tfrecord", "stream_tfrecord_ingest", "scan_pdf_text",
     "scan_text_zst", "scan_warc_http_charsets"],
)
def test_key_green_on_unicode_corpus(name, spark, unicode_sf_dir, unicode_con):
    df = QUERIES[name](spark, unicode_sf_dir)
    oracle_pdf = unicode_con.execute(ORACLE[name]).df()
    compare(name, df, oracle_pdf)


def test_pdf_filter_keeps_latin1_drops_astral(spark, unicode_sf_dir,
                                              unicode_con):
    """The symmetric exclusion keeps the latin-1 rows (PDF can carry
    them) and drops only codepoints above U+00FF — on BOTH engines."""
    got = {
        r["doc_id"]
        for r in QUERIES["scan_pdf_text"](spark, unicode_sf_dir)
        .select("doc_id").collect()
    }
    assert got == {0, 1, 2, 7}
    oracle_ids = set(
        unicode_con.execute(ORACLE["scan_pdf_text"]).df()["doc_id"]
    )
    assert oracle_ids == got
