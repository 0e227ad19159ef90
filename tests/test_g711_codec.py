"""G.711 companding: exhaustive cross-validation and contract tests.

The strongest possible pin for an 8-bit codec: EVERY 16-bit encode
(65 536 values x 2 laws) and every 8-bit decode (256 x 2) compared
bit-for-bit against stdlib ``audioop`` — an independent C implementation
of the same Sun g711.c arithmetic. The driver key's DuckDB oracle is a
third implementation (closed-form SQL); pytest here is the second."""

import numpy as np
import pytest

from dynamic_spark_spark.llmops.g711 import (
    ALAW_DECODE_TABLE,
    ULAW_DECODE_TABLE,
    alaw_decode,
    alaw_encode,
    ulaw_decode,
    ulaw_encode,
)

audioop = pytest.importorskip("audioop")  # removed in Python 3.13


def test_ulaw_encode_matches_audioop_exhaustively():
    xs = np.arange(-32768, 32768, dtype=np.int16)
    ref = np.frombuffer(audioop.lin2ulaw(xs.astype("<i2").tobytes(), 2), dtype=np.uint8)
    assert np.array_equal(ulaw_encode(xs), ref)


def test_alaw_encode_matches_audioop_exhaustively():
    xs = np.arange(-32768, 32768, dtype=np.int16)
    ref = np.frombuffer(audioop.lin2alaw(xs.astype("<i2").tobytes(), 2), dtype=np.uint8)
    assert np.array_equal(alaw_encode(xs), ref)


def test_decode_tables_match_audioop():
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        ulaw_decode(codes),
        np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), dtype="<i2"),
    )
    assert np.array_equal(
        alaw_decode(codes),
        np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), dtype="<i2"),
    )


def test_compand_is_idempotent_after_one_pass():
    """decode(encode(x)) is a fixed point: re-encoding a decoded signal
    must reproduce the same codes (the quantization lattice property a
    transcoding pipeline relies on)."""
    xs = np.arange(-32768, 32768, 257, dtype=np.int16)
    for enc, dec in ((ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)):
        c1 = enc(xs)
        x1 = dec(c1)
        assert np.array_equal(enc(x1), c1)


def test_companding_error_bounded():
    """µ-law/A-law quantization error grows with the segment step: the
    worst case across the full int16 range is bounded by half the top
    segment's step (~1024 for µ-law at seg 7, 2^8 shift on a 4-bit
    mantissa)."""
    xs = np.arange(-32768, 32768, dtype=np.int16)
    for enc, dec, bound in (
        (ulaw_encode, ulaw_decode, 1024),
        (alaw_encode, alaw_decode, 1024),
    ):
        err = np.abs(xs.astype(np.int64) - dec(enc(xs)).astype(np.int64))
        assert int(err.max()) <= bound


def test_decode_tables_are_symmetric():
    """Both laws decode to sign-symmetric lattices (µ-law: exact negation
    between the two half-tables; A-law: same magnitudes, opposite sign)."""
    u = ULAW_DECODE_TABLE.astype(np.int64)
    a = ALAW_DECODE_TABLE.astype(np.int64)
    # every magnitude appears with both signs (µ-law includes ±0 -> 0)
    assert set((-u[u <= 0]).tolist()) == set(u[u >= 0].tolist())
    assert set((-a[a < 0]).tolist()) == set(a[a > 0].tolist())
