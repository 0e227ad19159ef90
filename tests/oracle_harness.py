"""Local differential-oracle harness mirroring the driver's correctness gate:
row count + schema-compatibility + order-insensitive exact value comparison
between a Spark DataFrame and DuckDB running the registered oracle SQL on the
same parquet files.

Stricter than the driver (exact value equality after dtype canonicalization),
so passing here implies passing any reasonable hash-based comparison.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

from dynamic_spark_spark.sources.readers import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_scalar(v):
    """Canonicalize one value for order-insensitive comparison."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact: repr of the double bit pattern
        return repr(v)
    if isinstance(v, (np.floating,)):
        return _canon_scalar(float(v))
    if isinstance(v, (np.integer,)):
        return repr(int(v))
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_scalar(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_scalar(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _canon_series(s: pd.Series) -> list:
    """Column-at-a-time canonicalization. Plain numpy int/float/bool columns
    take a fast path (no per-cell isinstance chain — the naive cell loop was
    the dominant cost of verifying wide 60k-row results); extension dtypes,
    datetimes, and object columns fall back to the exact per-value rules."""
    if isinstance(s.dtype, np.dtype):  # plain numpy dtype, no pd.NA possible
        if s.dtype.kind == "b":
            return [repr(v) for v in s.to_list()]
        if s.dtype.kind in "iu":
            return [repr(v) for v in s.to_list()]
        if s.dtype.kind == "f":
            return ["nan" if math.isnan(v) else repr(v) for v in s.to_list()]
    return [_canon_scalar(v) for v in s.to_list()]


def _canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    if not cols or not len(pdf):
        return []
    return sorted(zip(*(_canon_series(pdf[c]) for c in cols)))


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> None:
    spark_pdf = spark_df.toPandas()
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != oracle {sorted(oracle_pdf.columns)}"
    )
    s_rows = _canon_frame(spark_pdf)
    o_rows = _canon_frame(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs oracle):\n"
            + "\n".join(f"  {a}\n  {b}" for a, b in diffs)
        )
