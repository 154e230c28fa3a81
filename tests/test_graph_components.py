"""connected_components vs a trusted union-find on topologies chosen to
stress the propagation: long chains (diameter = rounds), cycles, stars,
disjoint components, and a seeded random graph."""

from __future__ import annotations

import random

from dbt_slabbing_spark.operators.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: every node -> min node of its component
    comp = {}
    for n in parent:
        comp[n] = find(n)
    return dict(sorted(comp.items()))


def _spark_cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = connected_components(df, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


CASES = {
    "chain": [(i, i + 1) for i in range(12)],  # diameter 12 > default near-dup depth
    "cycle": [(i, (i + 1) % 8) for i in range(8)],
    "star": [(0, i) for i in range(1, 9)],
    "two_components_plus_pair": [(1, 2), (2, 3), (10, 11), (11, 12), (20, 21)],
    "self_loop_and_dup_edges": [(5, 5), (6, 7), (7, 6), (6, 7)],
    "reversed_chain": [(i + 1, i) for i in range(10, 0, -1)],
}

# All cases as ONE disjoint graph (node ids offset per case) — a single
# connected_components run covers every topology, and correctness per
# case is untouched because components can't span the offset gap.
ALL_CASES = [
    (a + i * 1000, b + i * 1000)
    for i, edges in enumerate(CASES.values())
    for a, b in edges
]


def test_topologies(spark):
    assert _spark_cc(spark, ALL_CASES) == _union_find(ALL_CASES)


def test_topologies_star_algorithm(spark):
    assert _spark_cc(spark, ALL_CASES, algorithm="star") == _union_find(ALL_CASES)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    assert _spark_cc(spark, edges) == _union_find(edges)
    assert _spark_cc(spark, edges, algorithm="star") == _union_find(edges)


def test_star_converges_on_deep_path_where_label_cannot(spark):
    """A 60-node path has diameter ≫ the label algorithm's round budget:
    label propagation must now REFUSE (unconverged = RuntimeError, the
    silent-wrong-labels fix), while large-star/small-star converges in
    O(log² n) rounds and returns one component."""
    import pytest

    deep = [(i, i + 1) for i in range(60)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _spark_cc(spark, deep, max_iter=5)

    got = _spark_cc(spark, deep, algorithm="star", max_iter=12)
    assert got == {i: 0 for i in range(61)}


def test_star_giant_component_with_satellites(spark):
    """Giant star-of-chains component (hub 0, four chains of 12) plus
    two satellite pairs — the web-crawl-dedup shape the star algorithm
    exists for."""
    edges = []
    nid = 1
    for _ in range(4):
        prev = 0
        for _ in range(12):
            edges.append((prev, nid))
            prev = nid
            nid += 1
    edges += [(1000, 1001), (2000, 2001)]
    got = _spark_cc(spark, edges, algorithm="star", max_iter=12)
    assert got == _union_find(edges)
