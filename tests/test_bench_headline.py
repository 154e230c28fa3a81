"""Headline-series comparability guard for bench.py.

BENCH_r08 recorded a headline that silently summed the new q21_bucketed
extra because the exclusion list was a hand-maintained name list beside
the HEADLINE table (VERDICT r8 "What's wrong #1"). The summed flag now
lives structurally on the HEADLINE tuples; these pins keep the series
8-query comparable as extras come and go.
"""

from __future__ import annotations

import bench


def test_headline_summed_series_is_the_baseline_eight():
    base = [s for s, _, summed in bench.HEADLINE if summed]
    assert base == [
        "q1",
        "q3",
        "q5",
        "window_topk",
        "events_hourly",
        "q9",
        "q21",
        "minhash",
    ]


def test_headline_extras_are_flagged_not_listed():
    # Every non-summed entry must be an explicit False flag on the tuple
    # (3-tuples only — no legacy 2-tuples that would crash the unpack).
    assert all(len(row) == 3 for row in bench.HEADLINE)
    extras = {s for s, _, summed in bench.HEADLINE if not summed}
    assert "q21_bucketed" in extras and "q3_bucketed" in extras and "bitmap_rollup" in extras
