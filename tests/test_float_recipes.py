"""Property tests pinning the cross-engine float recipes:

- ``np.cumsum`` last element == DuckDB ``list_sum`` (sequential left fold)
- ``_duck_round6`` == DuckDB ``round(x, 6)`` (half-away on x*1e6)

These are the two primitives every GEMM-backed operator's exact rescore
rests on; if either engine changed summation order or rounding mode, the
oracle gates would become flaky — these tests fail loudly instead.
"""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_in_go_spark.operators.dedup import _duck_round6

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@settings(max_examples=200, deadline=None)
@given(st.lists(finite, min_size=1, max_size=64))
def test_cumsum_matches_list_sum(xs):
    con = duckdb.connect()
    duck = con.execute("SELECT list_sum(?::DOUBLE[])", [xs]).fetchone()[0]
    ours = float(np.cumsum(np.array(xs, dtype=np.float64))[-1])
    assert duck == ours or (np.isnan(duck) and np.isnan(ours))


@settings(max_examples=300, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, min_value=-2.0, max_value=2.0))
def test_duck_round6_matches_duckdb(x):
    con = duckdb.connect()
    duck = con.execute("SELECT round(?::DOUBLE, 6)", [x]).fetchone()[0]
    ours = float(_duck_round6(np.array([x]))[0])
    assert duck == ours


def test_sequential_vs_pairwise_killer_case():
    # the case where np.sum (pairwise) and the sequential fold disagree —
    # guards against silently switching the summation primitive
    x = np.array([1e16, 1.0, -1e16, 1.0] * 16)
    assert float(np.cumsum(x)[-1]) == 1.0
    assert float(np.sum(x)) != 1.0
