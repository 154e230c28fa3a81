"""Theta/KMV sketch algebra pins for agg_theta_sketch_setops
(`queries/aggregates.py`).

The gate's 100 TB story rests on two properties of bottom-k sketches:

1. MERGE LEMMA: bottom_k(A ∪ B) == bottom_k(bottom_k(A) ∪ bottom_k(B))
   — per-partition local bottom-k sets merge losslessly, so the
   distributed TakeOrdered is exactly the sketch a single pass would
   build.
2. SET-OP ESTIMATOR: with theta = min(kth_min_A, kth_min_B), the
   union/intersection estimates |{h < theta}| / theta are computable
   from the two k-row sketches ALONE, and converge on the true
   cardinalities (checked against exact sets on deterministic data).
"""

from __future__ import annotations

import hashlib
import random


def _bottom_k(values, k=256):
    return sorted(values)[:k]


def _hash(x: int) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def test_bottom_k_merge_lemma():
    rng = random.Random(10)
    a = {_hash(rng.randrange(10**9)) for _ in range(5000)}
    b = {_hash(rng.randrange(10**9)) for _ in range(3000)}
    direct = _bottom_k(a | b)
    merged = _bottom_k(set(_bottom_k(a)) | set(_bottom_k(b)))
    assert direct == merged


def test_bottom_k_merge_lemma_many_partitions():
    # the actual scale path: P partition-local sketches folded pairwise
    rng = random.Random(11)
    parts = [
        {_hash(rng.randrange(10**9)) for _ in range(700)} for _ in range(16)
    ]
    full = set().union(*parts)
    folded: set[int] = set()
    for p in parts:
        folded = set(_bottom_k(folded | set(_bottom_k(p))))
    assert _bottom_k(full) == sorted(folded)


def test_theta_setop_estimates_converge():
    scale = float(1 << 60)
    rng = random.Random(12)
    universe = [rng.randrange(10**12) for _ in range(60_000)]
    a_keys = set(universe[:40_000])
    b_keys = set(universe[20_000:])  # 20k-wide genuine overlap
    ha = {_hash(x) for x in a_keys}
    hb = {_hash(x) for x in b_keys}
    sa, sb = set(_bottom_k(ha)), set(_bottom_k(hb))
    theta = min(max(sa), max(sb))
    est_u = sum(1 for h in sa | sb if h < theta) * scale / theta
    est_i = sum(1 for h in sa & sb if h < theta) * scale / theta
    exact_u = len(a_keys | b_keys)
    exact_i = len(a_keys & b_keys)
    # k=256 → relative standard error ~1/sqrt(k-1) ≈ 6.3%; allow 4 RSE
    # for the union and a looser bound for the (smaller) intersection
    assert abs(est_u - exact_u) / exact_u < 0.25
    assert abs(est_i - exact_i) / exact_i < 0.40
