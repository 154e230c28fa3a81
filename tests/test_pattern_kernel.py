"""Unit pins for the delta-pattern kernel (`operators/patterns.py`).

The two registry gates (ts_pattern_v_shape, ts_pattern_three_declines)
hash-check full outputs vs DuckDB; these tests pin the kernel's
SEMANTICS on a hand-built series where every match is enumerable:
anchor positioning, overlap counting, flat steps, series-boundary
nulls, and argument validation.
"""

from __future__ import annotations

import pytest

from dbt_slabbing_spark.operators.patterns import pattern_match

#  series (one key): values 10 9 8 9 10 10 7 6 5 4 9
#  deltas (into idx): -  D  D  U  U  F  D  D  D  D  U
_VALUES = [10.0, 9.0, 8.0, 9.0, 10.0, 10.0, 7.0, 6.0, 5.0, 4.0, 9.0]


@pytest.fixture(scope="module")
def series(spark):
    rows = [(1, i, v) for i, v in enumerate(_VALUES)]
    # second key: too short for any pattern — boundary nulls must not fire
    rows += [(2, 0, 5.0), (2, 1, 4.0)]
    return spark.createDataFrame(rows, "k int, t int, v double")


def _hits(df, pattern, anchor):
    out = pattern_match(df, ["k"], "t", "v", pattern, anchor)
    return sorted((r["k"], r["t"]) for r in out.collect())


def test_v_shape_trough_anchor(series):
    # strict V (DDUU) troughs: only idx 2 (10 9 8 9 10); idx 9's rise
    # at 10 has no second up-step
    assert _hits(series, "DDUU", 2) == [(1, 2)]


def test_three_declines_overlap_counting(series):
    # DDD anchored at the run's last event: the 4-decline run 10 7 6 5 4
    # (deltas D at 6,7,8,9) matches at t=8 and t=9; 9 8 (t=1,2) is too
    # short alone but 10 9 8 gives only two declines — no match there
    assert _hits(series, "DDD", 3) == [(1, 8), (1, 9)]


def test_flat_step_matches_f(series):
    # UF: rise into t=4 then flat into t=5, anchored at the flat event
    assert _hits(series, "UF", 2) == [(1, 5)]


def test_anchor_zero_returns_match_start(series):
    # same DDD runs, anchored at the run's FIRST event (position 0):
    # matches report t=5 and t=6 (the events before each 3-delta window)
    assert _hits(series, "DDD", 0) == [(1, 5), (1, 6)]


def test_boundary_partial_matches_never_fire(series):
    # key 2 has one delta (D); any 2+-step pattern needs deltas beyond
    # the series and must not match
    assert all(k != 2 for k, _ in _hits(series, "DD", 2))


def test_validation():
    with pytest.raises(ValueError, match="anchor"):
        pattern_match(None, ["k"], "t", "v", "DD", 3)
    with pytest.raises(ValueError, match="pattern"):
        pattern_match(None, ["k"], "t", "v", "DX", 1)
    # empty pattern used to slip both checks and die later in an opaque
    # py4j error at df.filter(None) (ADVICE r10)
    with pytest.raises(ValueError, match="non-empty"):
        pattern_match(None, ["k"], "t", "v", "", 0)
