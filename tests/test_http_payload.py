"""HTTP payload layer (the bytes inside crawl response records):
chunked transfer decoding + content codings, never-raise contract."""

from __future__ import annotations

import gzip
import random
import zlib

from dynamic_spark_spark.llmops.html import (
    HTTP_BODY_CAP,
    http_dechunk,
    http_payload_decode,
)


def _chunk(b: bytes, step: int = 5) -> bytes:
    out = bytearray()
    for i in range(0, len(b), step):
        part = b[i : i + step]
        out += f"{len(part):x}".encode() + b"\r\n" + part + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def test_dechunk_roundtrip_and_extensions():
    body = b"the quick brown fox jumps over the lazy dog" * 20
    assert http_dechunk(_chunk(body)) == body
    assert http_dechunk(_chunk(body, 1)) == body
    # chunk extensions after ';' are ignored per RFC 9112
    ext = b"5;name=value\r\nhello\r\n0\r\n\r\n"
    assert http_dechunk(ext) == b"hello"
    # refusals: truncated chunk, missing CRLF, lying size, size bomb
    assert http_dechunk(b"a\r\nshort\r\n0\r\n\r\n") is None
    assert http_dechunk(b"5\r\nhelloXX0\r\n\r\n") is None
    assert http_dechunk(b"") is None
    assert http_dechunk(f"{HTTP_BODY_CAP + 1:x}\r\n".encode()) is None


def test_payload_decode_all_codings():
    from dynamic_spark_spark.llmops.zstd import zstd_compress_real

    text = ("training corpus document body " * 50).encode()
    cases = [
        ("identity", text),
        ("gzip", gzip.compress(text)),
        ("deflate", zlib.compress(text)),                 # zlib-wrapped
        ("deflate", (lambda co: co.compress(text) + co.flush())(
            zlib.compressobj(wbits=-15))),                # raw form
        ("zstd", zstd_compress_real(text)),
    ]
    for enc, wire in cases:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Encoding: {enc}\r\n".encode()
            + b"Transfer-Encoding: chunked\r\n\r\n"
            + _chunk(wire, 700)
        )
        got = http_payload_decode(payload)
        assert got is not None, enc
        status, ctype, body = got
        assert (status, ctype, body) == (200, "text/html", text), enc
    # content-length framing (no chunking) + trailing garbage trimmed
    payload = (
        b"HTTP/1.1 404 Not Found\r\nContent-Length: 4\r\n\r\nbodyJUNK"
    )
    assert http_payload_decode(payload) == (404, None, b"body")
    # unknown codings refuse
    payload = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxxxx"
    assert http_payload_decode(payload) is None
    # non-HTTP head refuses
    assert http_payload_decode(b"GARBAGE\r\n\r\nbody") is None
    assert http_payload_decode(b"") is None


def test_payload_decode_never_raises():
    base = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        + _chunk(gzip.compress(b"fuzz seed body " * 40), 64)
    )
    rng = random.Random(3)
    for cut in range(0, len(base), 13):
        out = http_payload_decode(base[:cut])
        assert out is None or isinstance(out, tuple)
    for _ in range(400):
        m = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        out = http_payload_decode(bytes(m))
        assert out is None or isinstance(out, tuple)
