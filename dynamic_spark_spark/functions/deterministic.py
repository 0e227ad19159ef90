"""Order-independent floating aggregation helpers.

Shuffle-partitioned aggregation sums doubles in nondeterministic order, so a
Spark ``sum(double)`` and a DuckDB ``SUM(double)`` can differ in the last ulp —
enough to break an exact value-hash comparison. The fix: convert each per-row
double expression (which IS deterministic — same IEEE ops both engines) to an
exact integer at a fixed scale, sum the integers (exact, order-independent in
both engines), and convert the final result back to double.

Two implementations, same semantics at corpus scale:

- **Fast path (default)** — scaled int64: ``sum(floor(x * 1e6 + 0.5))`` as
  BIGINT, divided back at the end. All ops stay primitive inside whole-stage
  codegen; ~4.5x faster than Spark's decimal sum (measured sf0.1: 0.39s vs
  1.70s for 4 sums over 600k rows) because Spark's decimal accumulator above
  precision 18 falls back to BigDecimal allocation per row. Exact while the
  per-group Σ|x·1e6| < 2^63, i.e. Σ|x| < ~9.2e12. THE BOUND IS ON THE
  SUMMED EXPRESSION, NOT THE COLUMN — per-group row budget ≈ 9.2e12 / E[|x|]:
  ~9e12 rows for unit-scale values (discount factors), ~2.5e8 rows (≈ sf250
  per l_returnflag group) for bare prices, and only ~5e6 rows (≈ sf10) for
  price·qty products — the round-6 100× probe crashed exactly there
  (agg_weighted_avg, ARITHMETIC_OVERFLOW under ANSI; non-ANSI wraps
  silently). DuckDB's SUM(BIGINT) accumulates in HUGEINT (int128), so the
  oracle side never overflows first — the Spark side is always the one
  that must switch paths.
- **Exact path** (``dsum_exact``) — DECIMAL(18,6) per-row cast with a
  DECIMAL(28,6) accumulator (exact to ~1e22 — past 100 TB for every corpus
  expression). Use it whenever the expression's per-group row budget above
  is within two decades of the target scale; agg_weighted_avg's numerators
  are the in-repo example. At 100 TB prefer this or a two-level scheme
  (partial int64 sums per partition, decimal merge).

``floor(x + 0.5)`` is round-half-up for the corpus's non-negative measures and
is computed identically (IEEE 754) by Spark and DuckDB, so the per-row integer
is bit-identical across engines; integer summation is then order-free.

Spark-side helpers here; the matching DuckDB SQL fragments come from
``o_dsum``/``o_davg`` so query modules keep both sides textually adjacent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fixed-point scale: 6 fractional digits covers products of 2-decimal
#: measures (price · (1-disc) · (1+tax) has exactly 6).
_SCALE = 1_000_000
_DEC = "decimal(18,6)"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double expression, returned as double.

    Scaled-int64 fast path; see module docstring for the exactness envelope.
    """
    c = _col(col)
    return (
        F.sum(F.floor(c * _SCALE + F.lit(0.5))).cast("double") / F.lit(float(_SCALE))
    ).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact scaled-int sum / non-null count."""
    c = _col(col)
    return (
        (F.sum(F.floor(c * _SCALE + F.lit(0.5))).cast("double") / F.lit(float(_SCALE)))
        / F.count(c).cast("double")
    ).alias(alias)


def o_dsum(expr: str) -> str:
    """DuckDB fragment matching :func:`dsum` for the same inner expression."""
    return f"(CAST(SUM(CAST(FLOOR(({expr}) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)"


def o_davg(expr: str) -> str:
    """DuckDB fragment matching :func:`davg`."""
    return f"({o_dsum(expr)} / CAST(COUNT({expr}) AS DOUBLE))"


def dsum_exact(col: Column | str, alias: str) -> Column:
    """DECIMAL-accumulated SUM: slower, but exact at any scale factor."""
    return F.sum(_col(col).cast(_DEC)).cast("double").alias(alias)


def o_dsum_exact(expr: str) -> str:
    """DuckDB fragment matching :func:`dsum_exact`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


#: hi/lo split point for dsum_wide: low 21 bits summed separately.
_WIDE_SHIFT = 21
_WIDE_BASE = 1 << _WIDE_SHIFT


def dsum_wide(col: Column | str, alias: str) -> Column:
    """Order-independent SUM for NON-NEGATIVE expressions past the single
    int64 envelope, at int64-path speed.

    The scaled per-row int (≤ ~43 bits for corpus products) is split into
    its high and low 21 bits, each summed as a plain long — the int64
    partials don't overflow until ≈ 2^63 / (E[x·1e6] / 2^21), ~3e12 rows
    for price·qty ≈ 500 TB — and every op stays inside whole-stage
    codegen, measured at plain-double-sum speed where the DECIMAL
    accumulator was 6× slower (600M rows: 2.5 s vs 14.9 s).

    Precision contract (r6 advice): the result is ORDER-INDEPENDENT and
    ENGINE-PARITY-EXACT to that ~3e12-row budget — each int64 partial is
    cast to double through the same correctly-rounded int→double conversion
    on both engines, and the hi·2^21 + lo reassembly is the same IEEE ops
    on the same values, so hashes match. It is NUMERICALLY exact only
    while each partial sum stays under 2^53 (~4e11 rows for price·qty —
    a decade below the parity budget); past that the int→double cast
    rounds (relative error ≤ 2^-53, deterministic). For numerically exact
    totals beyond 2^53, use :func:`dsum_exact`. Caller contract: the
    expression is non-negative (shift/mask = divmod only holds without
    sign handling; every corpus measure qualifies)."""
    s = F.floor(_col(col) * _SCALE + F.lit(0.5)).cast("long")
    hi = F.sum(F.shiftright(s, _WIDE_SHIFT)).cast("double")
    lo = F.sum(s.bitwiseAND(F.lit(_WIDE_BASE - 1))).cast("double")
    return ((hi * F.lit(float(_WIDE_BASE)) + lo) / F.lit(float(_SCALE))).alias(
        alias
    )


def o_dsum_wide(expr: str) -> str:
    """DuckDB fragment matching :func:`dsum_wide` (non-negative exprs:
    integer // and % equal the Spark shift/mask pair)."""
    s = f"CAST(FLOOR(({expr}) * 1000000 + 0.5) AS BIGINT)"
    return (
        f"((CAST(SUM({s} // {_WIDE_BASE}) AS DOUBLE) * {float(_WIDE_BASE)}"
        f" + CAST(SUM({s} % {_WIDE_BASE}) AS DOUBLE)) / 1000000.0)"
    )
