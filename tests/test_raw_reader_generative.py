"""Generative differential sweeps for the raw parquet/ORC readers:
hypothesis draws random column data and writer knobs, pyarrow writes
the file, and the byte-walking readers must reproduce exactly what
pyarrow itself reads back — the property form of the fixture matrices."""

from __future__ import annotations

import io
import struct

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dynamic_spark_spark.llmops.orc_raw import read_orc_column
from dynamic_spark_spark.llmops.parquet_raw import read_parquet_column

_ints = st.lists(
    st.one_of(st.integers(-(2**63), 2**63 - 1), st.none()),
    min_size=1, max_size=300,
)
_strs = st.lists(
    st.one_of(st.text(max_size=40), st.none()), min_size=1, max_size=300
)
_floats = st.lists(
    st.one_of(
        st.floats(allow_nan=False, width=64),
        st.none(),
    ),
    min_size=1, max_size=300,
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    ints=_ints, strs=_strs,
    use_dict=st.booleans(),
    version=st.sampled_from(["1.0", "2.0"]),
    comp=st.sampled_from(["none", "snappy", "gzip", "zstd", "lz4"]),
)
def test_parquet_reader_matches_pyarrow_generative(
    ints, strs, use_dict, version, comp
):
    n = min(len(ints), len(strs))
    table = pa.table({
        "i": pa.array(ints[:n], type=pa.int64()),
        "s": pa.array(strs[:n], type=pa.string()),
    })
    buf = io.BytesIO()
    pq.write_table(
        table, buf, use_dictionary=use_dict, data_page_version=version,
        compression=comp,
    )
    raw = buf.getvalue()
    assert read_parquet_column(raw, "i") == [
        v for v in ints[:n] if v is not None
    ]
    assert read_parquet_column(raw, "s") == [
        s.encode("utf-8") for s in strs[:n] if s is not None
    ]


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    ints=_ints, strs=_strs, floats=_floats,
    comp=st.sampled_from(["uncompressed", "zlib", "snappy", "zstd", "lz4"]),
)
def test_orc_reader_matches_pyarrow_generative(ints, strs, floats, comp):
    from pyarrow import orc

    n = min(len(ints), len(strs), len(floats))
    table = pa.table({
        "i": pa.array(ints[:n], type=pa.int64()),
        "s": pa.array(strs[:n], type=pa.string()),
        "f": pa.array(floats[:n], type=pa.float64()),
    })
    buf = io.BytesIO()
    orc.write_table(table, buf, compression=comp)
    raw = buf.getvalue()
    assert read_orc_column(raw, "i") == [
        v for v in ints[:n] if v is not None
    ]
    assert read_orc_column(raw, "s") == [
        s.encode("utf-8") for s in strs[:n] if s is not None
    ]
    got_f = read_orc_column(raw, "f")
    want_f = [v for v in floats[:n] if v is not None]
    # exact bit equality for doubles (-0.0 vs 0.0 distinguished)
    assert got_f is not None and len(got_f) == len(want_f)
    for g, w in zip(got_f, want_f):
        assert struct.pack("<d", g) == struct.pack("<d", w)
