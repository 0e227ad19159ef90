"""Property-based tests (hypothesis) for the engine's pure logic: macro
substitution totality, schema-compatibility soundness, and the cross-engine
determinism of the fixed-point aggregation scheme (checked against DuckDB —
the same independent engine the oracle gate uses — without spinning Spark
per example; the Spark side of the same identity is covered by the oracle
parity suite on every dsum/davg query key).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from dynamic_spark_spark.plans.spec import MacroError, substitute_macros
from dynamic_spark_spark.plans.validation import check_schema_compatible

# ---------------------------------------------------------------------------
# fixed-point determinism: the Python model of sum(floor(x*1e6+0.5)) must
# match DuckDB's evaluation of o_dsum's SQL exactly, for any input order.
# ---------------------------------------------------------------------------

_VALS = st.lists(
    st.floats(min_value=0.0, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=50,
)


def _model_dsum(xs: list[float]) -> float:
    return float(sum(math.floor(x * 1_000_000 + 0.5) for x in xs)) / 1_000_000.0


@settings(max_examples=60, deadline=None)
@given(_VALS)
def test_fixed_point_sum_matches_duckdb_any_order(xs):
    from dynamic_spark_spark.functions.deterministic import o_dsum

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    got = con.execute(f"SELECT {o_dsum('x')} AS s FROM t").fetchone()[0]
    got_rev = con.execute(
        f"SELECT {o_dsum('x')} AS s FROM (SELECT x FROM t ORDER BY x DESC)"
    ).fetchone()[0]
    want = _model_dsum(xs)
    assert got == want == got_rev


# ---------------------------------------------------------------------------
# macro substitution
# ---------------------------------------------------------------------------

_KEYS = st.text(alphabet="abcdefgh_", min_size=1, max_size=8)
_PLAIN = st.text(
    alphabet=st.characters(blacklist_characters="${}"), max_size=30
)


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(_KEYS, _PLAIN, min_size=0, max_size=4), _PLAIN)
def test_macro_free_strings_pass_through(args, s):
    assert substitute_macros(s, args) == s


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(_KEYS, _PLAIN, min_size=1, max_size=4), _PLAIN, _PLAIN)
def test_macro_substitutes_every_known_key(args, prefix, suffix):
    for key, val in args.items():
        template = f"{prefix}${{{key}}}{suffix}"
        assert substitute_macros(template, args) == f"{prefix}{val}{suffix}"
        # nested containers substitute recursively
        assert substitute_macros({"a": [template]}, args) == {"a": [f"{prefix}{val}{suffix}"]}


@settings(max_examples=50, deadline=None)
@given(_KEYS)
def test_macro_unknown_key_raises(key):
    with pytest.raises(MacroError):
        substitute_macros(f"${{{key}}}", {})


# ---------------------------------------------------------------------------
# schema compatibility (A6): soundness — identical schemas never produce
# problems; any single perturbation (type flip, dropped field, extra field,
# nullability narrowing) always produces at least one problem naming it.
# ---------------------------------------------------------------------------

_TYPES = [T.IntegerType(), T.LongType(), T.DoubleType(), T.StringType(), T.BooleanType()]

_FIELDS = st.lists(
    st.tuples(_KEYS, st.sampled_from(range(len(_TYPES))), st.booleans()),
    min_size=1,
    max_size=5,
    unique_by=lambda f: f[0],
)


def _schema(fields) -> T.StructType:
    return T.StructType(
        [T.StructField(n, _TYPES[ti], nullable) for n, ti, nullable in fields]
    )


@settings(max_examples=100, deadline=None)
@given(_FIELDS)
def test_identical_schemas_compatible(fields):
    s = _schema(fields)
    assert check_schema_compatible(s, s, stage="t") == []


@settings(max_examples=100, deadline=None)
@given(_FIELDS, st.data())
def test_any_perturbation_is_flagged(fields, data):
    declared = _schema(fields)
    idx = data.draw(st.integers(0, len(fields) - 1))
    name, ti, nullable = fields[idx]
    kind = data.draw(st.sampled_from(["type", "drop", "extra", "nullability"]))
    mutated = list(fields)
    if kind == "type":
        mutated[idx] = (name, (ti + 1) % len(_TYPES), nullable)
    elif kind == "drop":
        del mutated[idx]
    elif kind == "extra":
        mutated.append(("zz_extra", 0, True))
    else:  # actual nullable, declared non-nullable
        mutated[idx] = (name, ti, True)
        declared = _schema(
            [(n, t, False if n == name else nb) for n, t, nb in fields]
        )
    problems = check_schema_compatible(declared, _schema(mutated), stage="t")
    assert problems, (kind, fields)
    flagged = {p.field for p in problems}
    assert (name in flagged) or ("zz_extra" in flagged)


# ---------------------------------------------------------------------------
# capped sessionization: the vectorized fold must equal a brute-force
# sequential reference for ANY event layout, and the partition-stream form
# must be invariant to WHERE Arrow batch boundaries fall.
# ---------------------------------------------------------------------------

_GAP_NS = 5 * 1_000_000_000
_CAP_NS = 12 * 1_000_000_000

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=60),  # seconds offset
    ),
    min_size=1,
    max_size=40,
)


def _reference_fold(rows):
    """O(n) sequential definition: new session on first event, gap >= GAP,
    or ts - session_start >= CAP."""
    out = {}
    last = {}
    start = {}
    for uid, t in rows:
        if uid not in last or t - last[uid] >= _GAP_NS or t - start[uid] >= _CAP_NS:
            start[uid] = t
        key = (uid, start[uid])
        n, _ = out.get(key, (0, t))
        out[key] = (n + 1, t)
        last[uid] = t
    return {k: v for k, v in out.items()}


def _sorted_frame(events):
    import numpy as np
    import pandas as pd

    rows = sorted(
        ((uid, sec * 1_000_000_000) for uid, sec in events),
        key=lambda r: (r[0], r[1]),
    )
    return rows, pd.DataFrame(
        {
            "user_id": np.array([r[0] for r in rows], dtype="int64"),
            "ts": pd.to_datetime([r[1] for r in rows], unit="ns"),
            "event_id": np.arange(len(rows), dtype="int64"),
        }
    )


@settings(max_examples=80, deadline=None)
@given(_EVENTS)
def test_capped_session_fold_matches_sequential_reference(events):
    from dynamic_spark_spark.operators.timeseries import _fold_sessions

    rows, pdf = _sorted_frame(events)
    got = {
        (r["user_id"], int(r["sess_start"].value)): (
            int(r["n_events"]),
            int(r["last_ts"].value),
        )
        for _, r in _fold_sessions(pdf, _GAP_NS, _CAP_NS).iterrows()
    }
    assert got == _reference_fold(rows)


@settings(max_examples=60, deadline=None)
@given(_EVENTS, st.integers(min_value=1, max_value=7))
def test_capped_session_stream_invariant_to_batch_splits(events, chunk):
    """Chopping the sorted partition into arbitrary Arrow-batch-sized pieces
    (the mapInPandas reality) must not change a single session: the carry
    logic re-joins users split across batch boundaries."""
    from dynamic_spark_spark.operators.timeseries import (
        _fold_session_stream,
        _fold_sessions,
    )

    _, pdf = _sorted_frame(events)
    batches = [pdf.iloc[i : i + chunk] for i in range(0, len(pdf), chunk)]
    import pandas as pd

    streamed = pd.concat(
        list(_fold_session_stream(iter(batches), _GAP_NS, _CAP_NS)),
        ignore_index=True,
    )
    whole = _fold_sessions(pdf, _GAP_NS, _CAP_NS)
    key = ["user_id", "sess_start"]
    assert (
        streamed.sort_values(key).reset_index(drop=True).to_dict("records")
        == whole.sort_values(key).reset_index(drop=True).to_dict("records")
    )
