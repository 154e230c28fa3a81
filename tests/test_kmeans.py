"""Distributed fixed-iteration Lloyd's k-means (operators/kmeans.py):
bit-exact pin against an independent Python model, empty-cell carry,
per-iteration plan shape, and the trained-centroid rides into
SemDeDup / IVF that the operator exists to feed."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_slabbing_spark.catalog import table
from dbt_slabbing_spark.operators.kmeans import kmeans_fit, seed_centroids_dense
from tests.conftest import SF_SMOKE


def _python_lloyds(points: dict[int, list[float]], k: int, iters: int, dp: int):
    """Independent reference model: plain-Python Lloyd's with the same
    contract (lowest-id seeds, dense cells, argmin ties -> lowest cell,
    per-iteration half-even rounding via the same round(x*p)/p double
    formula, empty cells carry)."""
    p = float(10**dp)
    ids = sorted(points)
    cents = {i: list(points[vid]) for i, vid in enumerate(ids[:k])}
    counts = {i: 0 for i in cents}
    dim = len(next(iter(points.values())))
    for _ in range(iters):
        members: dict[int, list[int]] = {i: [] for i in cents}
        for vid in ids:
            v = points[vid]
            # same association as ivf._cell_distances: dvv - 2*dvc + dcc
            dvv = _dot(v, v)
            best = min(
                (dvv - 2 * _dot(v, c) + _dot(c, c), cid) for cid, c in cents.items()
            )
            members[best[1]].append(vid)
        for cid in cents:
            if not members[cid]:
                counts[cid] = 0
                continue  # carry
            counts[cid] = len(members[cid])
            cents[cid] = [
                _round_like_engine(
                    math.fsum(points[vid][d] for vid in members[cid]) / len(members[cid]), p
                )
                for d in range(dim)
            ]
    return cents, counts


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _round_like_engine(x: float, p: float) -> float:
    # round-half-even on x*p in double space, like Spark F.round(x*p)/p
    # (banker's rounding on the scaled double) and DuckDB round()? No:
    # both engines' round() on a scaled DOUBLE is half-away-from-zero
    # in the observable cases; Python's round() is half-even. The two
    # differ only when x*p lands EXACTLY on .5 — measure-zero for
    # means of random floats, so use Python round and rely on the
    # engine parity gate (sf0.001/0.01/0.1 all green) for the contract.
    return round(x * p) / p + 0.0


def test_kmeans_matches_independent_python_model(spark):
    emb = table(spark, SF_SMOKE, "embeddings")
    cents, counts = kmeans_fit(emb, k=8, iters=3, round_dp=9)
    pts = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding").collect()
    }
    ref_cents, ref_counts = _python_lloyds(pts, k=8, iters=3, dp=9)
    assert counts == ref_counts
    assert sum(counts.values()) == len(pts)  # every vector assigned once
    for cid, vec in cents:
        ref = ref_cents[cid]
        # fsum vs pairwise partial sums: identical after 9-dp rounding
        # unless a mean sits within float-noise of a rounding boundary —
        # assert exact equality (the gate's own hash requires it anyway)
        assert vec == ref, f"cell {cid} diverged"


def test_kmeans_empty_cell_carries_centroid(spark):
    """An injected far-away centroid attracts nothing: its vector must
    come back unchanged with n_members=0, and the real cells must
    partition all the points."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.2]), (4, [0.9, 0.1])],
        "vec_id int, embedding array<double>",
    )
    far = [1e6, 1e6]
    init = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, far)]
    cents, counts = kmeans_fit(df, k=3, iters=2, init=init)
    assert counts[2] == 0
    assert dict(cents)[2] == far
    assert counts[0] + counts[1] == 4


def test_kmeans_iteration_plan_is_one_shuffle(spark):
    """Per-iteration plan shape: assignment is a narrow map (centroid
    literals — no join anywhere), and the update aggregation introduces
    exactly one exchange (the groupBy on cell)."""
    from dbt_slabbing_spark.operators.ivf import _cell_assignment

    emb = table(spark, SF_SMOKE, "embeddings")
    cents = seed_centroids_dense(emb, "vec_id", "embedding", 8)
    assigned = emb.select(
        F.col("embedding"),
        _cell_assignment(emb, cents, "embedding").cast("long").alias("cell"),
    )
    update = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.avg(F.element_at(F.col("embedding"), i + 1)).alias(f"_c{i}") for i in range(4)],
    )
    plan = update._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1


def test_semdedup_rides_trained_centroids(spark):
    """semantic_dedup(centroids=kmeans_fit(...)) — the production shape
    the SemDeDup paper assumes (trained cells): verdicts must match an
    independent Python SemDeDup over the same trained cells."""
    from dbt_slabbing_spark.operators.semdedup import semantic_dedup

    emb = table(spark, SF_SMOKE, "embeddings")
    cents, _counts = kmeans_fit(emb, k=8, iters=2, round_dp=9)
    got = {
        int(r["vec_id"]): (int(r["cell"]), bool(r["keep"]))
        for r in semantic_dedup(emb, threshold=0.30, centroids=cents).collect()
    }

    pts = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding").collect()
    }
    cell_of = {}
    for vid, v in pts.items():
        dvv = _dot(v, v)
        _, cell_of[vid] = min(
            (dvv - 2 * _dot(v, c) + _dot(c, c), cid) for cid, c in cents
        )
    for vid, v in pts.items():
        dup = any(
            cell_of[o] == cell_of[vid]
            and o < vid
            and round(
                _dot(pts[o], v) / (math.sqrt(_dot(pts[o], pts[o])) * math.sqrt(_dot(v, v))) * 1e6
            )
            / 1e6
            >= 0.30
            for o in pts
        )
        assert got[vid] == (cell_of[vid], not dup), f"vec {vid}"


def test_ivf_rides_injected_centroids_without_mllib(spark):
    """ivf_topk(centroids=...) skips MLlib training entirely and still
    finds the brute-force nearest neighbor for most queries (recall
    governed by nprobe, as documented)."""
    from dbt_slabbing_spark.operators.ivf import ivf_topk
    from dbt_slabbing_spark.operators.similarity import brute_force_topk

    emb = table(spark, SF_SMOKE, "embeddings")
    cents, _ = kmeans_fit(emb, k=8, iters=2, round_dp=9)
    queries = emb.orderBy("vec_id").limit(10)
    approx = {
        (int(r["query_id"]), int(r["vec_id"]))
        for r in ivf_topk(emb, queries, k=1, nprobe=3, centroids=cents).collect()
    }
    exact = {
        (int(r["query_id"]), int(r["vec_id"]))
        for r in brute_force_topk(emb, queries, k=1).collect()
    }
    hits = len(approx & exact)
    assert hits >= 7, f"recall@1 too low with trained cells: {hits}/10"
