"""Dedicated SemDeDup tests (operators/semdedup.py): hand-built ground
truth, 6-dp threshold-boundary behavior, argmin tie-break, injected
(k-means-style) centroids, and an n_cells >> 16 configuration pinned
against an independent pure-Python re-implementation — the same
independent-reference standard as the Hilbert key
(tests/test_layout_zorder.py)."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F  # noqa: F401

from dbt_slabbing_spark.operators.semdedup import seed_centroids, semantic_dedup
from tests.conftest import SF_SMOKE

VEC = "array<double>"


def _round6(x: float) -> float:
    """Spark double round model: shortest-decimal repr, HALF_UP (matches
    BigDecimal.valueOf semantics), plus the +0.0 negative-zero kill."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)) + 0.0


def _dot(a, b) -> float:
    """Left-fold sum in the operator's exact order (F.aggregate)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _cos6(a, b) -> float:
    return _round6(_dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b))))


def _model(rows, centroids, threshold):
    """Independent SemDeDup re-implementation: argmin assignment
    (squared distance written dvv - 2*dvc + dcc, ties -> lowest cell
    id), within-cell lower-id pair scan, min similar id."""
    assign = {}
    for vid, v in rows:
        dvv = _dot(v, v)
        best = min(
            (dvv - 2 * _dot(v, c) + _dot(c, c), cid) for cid, c in centroids
        )
        assign[vid] = best[1]
    out = {}
    for vid, v in rows:
        dup = None
        for oid, o in rows:
            if oid < vid and assign[oid] == assign[vid] and _cos6(o, v) >= threshold:
                dup = oid if dup is None else min(dup, oid)
        out[vid] = (assign[vid], dup is None, dup)
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, f"vec_id long, embedding {VEC}")
    got = semantic_dedup(df, **kw).collect()
    return {r["vec_id"]: (r["cell"], r["keep"], r["dup_of"]) for r in got}


def test_hand_built_two_cell_ground_truth(spark):
    """Injected (k-means-style) centroids with NON-CONTIGUOUS ids, and
    Pythagorean-norm vectors so every cosine is hand-computable:
    cos(1,2)=32/40=0.8, cos(1,5)=8/8=1.0, cos(3,4)=2.5/2.5=1.0."""
    centroids = [(100, [1.0, 0.0]), (200, [0.0, 1.0])]
    rows = [
        (1, [4.0, 0.0]),  # cell 100, first in cell -> kept
        (2, [8.0, 6.0]),  # cell 100 (dist 85 vs 89), cos vs 1 = 0.8 -> dup_of 1
        (3, [0.0, 5.0]),  # cell 200, kept
        (4, [0.0, 0.5]),  # cell 200, cos vs 3 = 1.0 -> dup_of 3
        (5, [2.0, 0.0]),  # cell 100, cos vs 1 = 1.0, vs 2 = 0.8 -> min id 1
        (6, [-5.0, 0.0]),  # cell 200 (dist 37 vs 26... check below), cos vs cellmates
    ]
    # id 6: dist to (1,0) = 36, to (0,1) = 25+1 = 26 -> cell 200;
    # cos vs 3 = 0, vs 4 = 0 -> kept despite being in a populated cell.
    expected = {
        1: (100, True, None),
        2: (100, False, 1),
        3: (200, True, None),
        4: (200, False, 3),
        5: (100, False, 1),
        6: (200, True, None),
    }
    got = _run(spark, rows, threshold=0.30, centroids=centroids)
    assert got == expected
    assert got == _model(rows, centroids, 0.30)


def test_threshold_boundary_rounds_up_to_similar(spark):
    """Raw cosine in (0.2999995, 0.30): BELOW the threshold as a raw
    double, but 6-dp HALF_UP rounding lands it exactly on 0.300000 ->
    the pair IS a duplicate. Pins that the compare happens AFTER
    rounding (the sim_neardup_pairs convention)."""
    c = 0.2999996
    b = [c, math.sqrt(1.0 - c * c)]
    rows = [(1, [4.0, 0.0]), (2, b)]
    raw = _dot(rows[0][1], b) / (math.sqrt(_dot(rows[0][1], rows[0][1])) * math.sqrt(_dot(b, b)))
    assert 0.2999995 < raw < 0.30 and _cos6(rows[0][1], b) == 0.3
    got = _run(spark, rows, threshold=0.30, centroids=[(0, [1.0, 0.0])])
    assert got == {1: (0, True, None), 2: (0, False, 1)}


def test_threshold_boundary_rounds_down_to_distinct(spark):
    """Raw cosine just under 0.2999995 rounds DOWN to 0.299999 -> both
    vectors kept."""
    c = 0.2999993
    b = [c, math.sqrt(1.0 - c * c)]
    rows = [(1, [4.0, 0.0]), (2, b)]
    raw = _dot(rows[0][1], b) / (math.sqrt(_dot(rows[0][1], rows[0][1])) * math.sqrt(_dot(b, b)))
    assert 0.299999 < raw < 0.2999995 and _cos6(rows[0][1], b) == 0.299999
    got = _run(spark, rows, threshold=0.30, centroids=[(0, [1.0, 0.0])])
    assert got == {1: (0, True, None), 2: (0, True, None)}


def test_argmin_tie_breaks_to_lowest_cell_id(spark):
    """[3,3] is exactly equidistant from (1,0) and (0,1) (squared dist
    13 both ways, exact in binary) -> lowest cell id wins, matching
    ivf.py's array_sort struct ordering."""
    centroids = [(20, [0.0, 1.0]), (10, [1.0, 0.0])]
    got = _run(spark, [(1, [3.0, 3.0])], threshold=0.30, centroids=centroids)
    assert got == {1: (10, True, None)}


def test_seeded_centroids_default_path(spark):
    """Default centroids= None path: the n_cells lowest-id vectors seed
    the cells, cell id = seed's own id (works with an id space that
    does NOT start at 0)."""
    rows = [(7, [1.0, 0.0]), (9, [0.0, 1.0]), (11, [10.0, 0.0]), (12, [0.0, 3.0])]
    df = spark.createDataFrame(rows, f"vec_id long, embedding {VEC}")
    cents = seed_centroids(df, "vec_id", "embedding", 2)
    assert cents == [(7, [1.0, 0.0]), (9, [0.0, 1.0])]
    got = _run(spark, rows, threshold=0.30, n_cells=2)
    assert got == {
        7: (7, True, None),
        9: (9, True, None),
        11: (7, False, 7),  # cos = 1.0 with seed 7
        12: (9, False, 9),  # cos = 1.0 with seed 9
    }


def test_embeddings_n_cells_64_matches_independent_model(spark):
    """n_cells >> the gate's 16 on the real embeddings table, pinned
    against the pure-Python model — the configuration a 100 TB run
    would use (n_cells proportional to corpus size bounds Sigma|cell|^2 and
    keeps the pair-join shuffle keys numerous)."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.collect()
    ]
    cents = seed_centroids(emb, "vec_id", "embedding", 64)
    got = {
        r["vec_id"]: (r["cell"], r["keep"], r["dup_of"])
        for r in semantic_dedup(emb, threshold=0.30, n_cells=64).collect()
    }
    assert len(got) == len(rows)
    assert len({c for c, _, _ in got.values()}) > 16  # genuinely spread
    assert got == _model(rows, cents, 0.30)
