"""Order-independent floating aggregation helpers.

Shuffle-partitioned aggregation sums doubles in nondeterministic order, so a
Spark ``sum(double)`` and a DuckDB ``SUM(double)`` can differ in the last ulp —
enough to break an exact value-hash comparison. The fix: cast each input (or
per-row double expression, which IS deterministic) to an exact DECIMAL, sum the
decimals (exact, order-independent in both engines), and cast the final result
back to double. The double→decimal rounding and decimal→double conversion are
both deterministic and identical across engines.

Spark side helpers here; the matching DuckDB SQL fragments are produced by
``o_dsum``/``o_davg`` so query modules keep both sides textually adjacent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decimal(18,6) keeps the compact 64-bit decimal representation (the per-ROW
# cast only needs each value < 1e12; both engines widen the SUM accumulator
# past 18 digits, so overflow cannot occur at any corpus scale).
_DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double expression, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, both as doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(_DEC)).cast("double") / F.count(c).cast("double")
    ).alias(alias)


def o_dsum(expr: str) -> str:
    """DuckDB fragment matching :func:`dsum` for the same inner expression."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def o_davg(expr: str) -> str:
    """DuckDB fragment matching :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE)"
    )
