"""Property tests for the cross-engine fixed-point policy (helpers.py).

The whole correctness gate rests on dsum/o_dsum producing bit-identical
doubles in Spark and DuckDB. These tests pin the DuckDB side (o_dsum SQL)
against a pure-Python model of the Spark side (floor(x*1e6+0.5) as
BIGINT, summed exactly, divided back) over adversarial inputs — the
cheap, no-JVM guard against dialect drift like decimal-literal
promotion.
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from random_forest_using_hadoop_spark.helpers import o_dsum

_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _py_fixed_sum(xs: list[float]) -> float:
    return sum(math.floor(x * 1_000_000.0 + 0.5) for x in xs) / 1_000_000.0


@settings(max_examples=200, deadline=None)
@given(st.lists(_floats, min_size=1, max_size=100))
def test_o_dsum_matches_python_model(xs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    got = con.execute(f"SELECT {o_dsum('x')} AS s FROM t").fetchone()[0]
    assert isinstance(got, float), f"o_dsum must stay DOUBLE, got {type(got)}"
    assert got == _py_fixed_sum(xs)


@settings(max_examples=200, deadline=None)
@given(st.lists(_floats, min_size=2, max_size=100), st.randoms())
def test_fixed_sum_is_order_insensitive(xs, rnd):
    shuffled = list(xs)
    rnd.shuffle(shuffled)
    assert _py_fixed_sum(xs) == _py_fixed_sum(shuffled)


@settings(max_examples=200, deadline=None)
@given(st.lists(_floats, min_size=1, max_size=100))
def test_fixed_sum_error_bound(xs):
    """Quantization moves each value by at most 5e-7, so the fixed-point
    sum stays within n*5e-7 of the exact (math.fsum) result."""
    exact = math.fsum(xs)
    assert abs(_py_fixed_sum(xs) - exact) <= len(xs) * 5e-7 + 1e-9
