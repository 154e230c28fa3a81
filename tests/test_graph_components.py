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


def _spark_cc(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


CASES = {
    "chain": [(i, i + 1) for i in range(12)],  # diameter 12 > default near-dup depth
    "cycle": [(i, (i + 1) % 8) for i in range(8)],
    "star": [(0, i) for i in range(1, 9)],
    "two_components_plus_pair": [(1, 2), (2, 3), (10, 11), (11, 12), (20, 21)],
    "self_loop_and_dup_edges": [(5, 5), (6, 7), (7, 6), (6, 7)],
    "reversed_chain": [(i + 1, i) for i in range(10, 0, -1)],
}


def test_topologies(spark):
    for name, edges in CASES.items():
        assert _spark_cc(spark, edges) == _union_find(edges), name


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    assert _spark_cc(spark, edges) == _union_find(edges)
