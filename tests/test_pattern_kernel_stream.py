"""Cross-batch contract of the streaming V-shape detector
(`streaming/jobs.py::pattern_v_shape_tail`): replaying the same
event_id-ordered series split at ANY micro-batch boundary must emit
exactly the single-pass trough set, each trough exactly once. The
registry gate (stream_pattern_alert) hash-checks the end-to-end
streaming query against the batch-twin SQL; these tests enumerate the
boundary cases a bounded replay cannot force (the parquet source
delivers one batch)."""

from __future__ import annotations

import itertools
import random

from dbt_slabbing_spark.streaming.jobs import pattern_v_shape_tail


def _single_pass(pairs):
    emitted, _ = pattern_v_shape_tail([], pairs)
    return emitted


def _split_replay(pairs, cuts):
    tail: list = []
    out: list = []
    prev = 0
    for c in list(cuts) + [len(pairs)]:
        emitted, tail = pattern_v_shape_tail(tail, pairs[prev:c])
        out += emitted
        prev = c
    return out


_SERIES = [(i, v) for i, v in enumerate([9.0, 7.0, 5.0, 6.0, 8.0, 8.0, 9.0, 4.0, 3.0, 5.0, 7.0, 1.0])]
# troughs: idx 2 (9 7 5 6 8) and idx 8 (9 4 3 5 7)


def test_single_pass_matches_hand_enumeration():
    assert _single_pass(_SERIES) == [2, 8]


def test_every_single_cut_position():
    for c in range(len(_SERIES) + 1):
        assert _split_replay(_SERIES, [c]) == [2, 8], f"cut at {c}"


def test_every_double_cut_position():
    for c1, c2 in itertools.combinations(range(len(_SERIES) + 1), 2):
        assert _split_replay(_SERIES, [c1, c2]) == [2, 8], (c1, c2)


def test_random_series_random_cuts():
    rng = random.Random(7)
    for _ in range(50):
        n = rng.randrange(5, 40)
        pairs = [(i, float(rng.randrange(0, 8))) for i in range(n)]
        want = _single_pass(pairs)
        cuts = sorted(rng.sample(range(n + 1), rng.randrange(0, 4)))
        assert _split_replay(pairs, cuts) == want


def test_empty_batches_are_noops():
    assert _split_replay(_SERIES, [3, 3, 3]) == [2, 8]
