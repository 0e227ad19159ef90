"""G.711 µ-law / A-law audio companding — the telephony codec tier.

G.711 (ITU-T, 1972; public) is the 8-bit logarithmic PCM codec every
telephony/voice corpus ships in (:mod:`wave` files with ``WAVE_FORMAT_MULAW``
/ ``ALAW``, RTP payload types 0 and 8). A 100-TB speech pipeline meets it
before any modern codec. The implementation here is the classic Sun
``g711.c`` segment arithmetic (public domain, the same variant CPython's
``audioop`` wraps): 14-bit domain for µ-law, 13-bit for A-law, 8 log
segments, sign+segment+mantissa byte layout.

Correctness chain, strongest-to-weakest:

- pytest cross-validates EVERY 16-bit encode (65 536 values x 2 laws) and
  every 8-bit decode (256 x 2) against stdlib ``audioop`` — two
  independent implementations agreeing bit-for-bit;
- the ``multimodal_g711_decode`` key re-derives decode(encode(v)) in
  CLOSED-FORM DuckDB SQL (integer segment CASEs — no audio library on the
  oracle side) and hash-compares full decoded-sample statistics per row;
- encode is vectorized numpy (no per-sample Python in the hot path);
  decode is a 256-entry table gather.

Reference basis: the reference engine's format surface is generic Spark
sources (docs/ScalaSparkCompute-sparkcompute.md:5-6); G.711 is the audio
ingest variant of that surface, sitting beside the WAV/FLAC tier in
:mod:`dynamic_spark_spark.llmops.multimodal`.
"""

from __future__ import annotations

import numpy as np

_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF])
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])

_ULAW_BIAS = 0x84  # 132, the µ-law zero offset
_ULAW_CLIP14 = 8159  # max magnitude in the 14-bit domain


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """Vectorized µ-law encode of int16 samples → uint8 codes (Sun g711
    14-bit-domain variant, bit-identical to ``audioop.lin2ulaw``)."""
    p = np.asarray(x, dtype=np.int32) >> 2  # arithmetic: the 14-bit domain
    neg = p < 0
    mag = np.where(neg, -p, p)
    mag = np.minimum(mag, _ULAW_CLIP14) + (_ULAW_BIAS >> 2)
    seg = np.searchsorted(_SEG_UEND, mag)  # first segment end >= mag
    mask = np.where(neg, 0x7F, 0xFF)
    over = seg >= 8  # only mag == 8192 (the clip ceiling + bias)
    seg_c = np.minimum(seg, 7)
    mant = (mag >> (seg_c + 1)) & 0xF
    code = ((seg_c << 4) | mant) ^ mask
    return np.where(over, 0x7F ^ mask, code).astype(np.uint8)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """Vectorized A-law encode of int16 samples → uint8 codes (13-bit
    domain, ``-pcm - 1`` negative fold, even-bit 0x55 inversion —
    bit-identical to ``audioop.lin2alaw``)."""
    p = np.asarray(x, dtype=np.int32) >> 3  # the 13-bit domain
    neg = p < 0
    mag = np.where(neg, -p - 1, p)
    mask = np.where(neg, 0x55, 0xD5)
    seg = np.searchsorted(_SEG_AEND, mag)
    over = seg >= 8
    seg_c = np.minimum(seg, 7)
    shift = np.where(seg_c < 2, 1, seg_c)
    mant = (mag >> shift) & 0xF
    code = ((seg_c << 4) | mant) ^ mask
    return np.where(over, 0x7F ^ mask, code).astype(np.uint8)


def _ulaw_dec_scalar(u: int) -> int:
    u = ~u & 0xFF
    t = ((u & 0xF) << 3) + _ULAW_BIAS
    t <<= (u & 0x70) >> 4
    return (_ULAW_BIAS - t) if (u & 0x80) else (t - _ULAW_BIAS)


def _alaw_dec_scalar(a: int) -> int:
    a ^= 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


#: 256-entry decode tables (built once at import; decode is a gather)
ULAW_DECODE_TABLE = np.array(
    [_ulaw_dec_scalar(c) for c in range(256)], dtype=np.int16
)
ALAW_DECODE_TABLE = np.array(
    [_alaw_dec_scalar(c) for c in range(256)], dtype=np.int16
)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """µ-law decode: uint8 codes → int16 samples (table gather)."""
    return ULAW_DECODE_TABLE[np.asarray(codes, dtype=np.uint8)]


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law decode: uint8 codes → int16 samples (table gather)."""
    return ALAW_DECODE_TABLE[np.asarray(codes, dtype=np.uint8)]
