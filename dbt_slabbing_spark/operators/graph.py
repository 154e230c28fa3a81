"""Distributed graph operators (what dedup clustering stands on).

Only one algorithm lives here today: connected components by iterative
min-label propagation. It exists as a standalone operator (rather than
inline in the dedup query) because every pair-producing near-dup
detector — minhash LSH, simhash Hamming, n-gram Jaccard, embedding
cosine — needs the same pairs→groups step before any row can actually
be dropped.

Scale notes: each round is one equi-join + min-groupBy (shuffle on the
node id), lineage is truncated per round with ``localCheckpoint``, and
the driver sees only a 1-row convergence probe. Round count = graph
diameter, which for near-dup clusters is small; for web-scale graphs
with giant components, replace the round body with the large-star /
small-star steps of Kiveris et al., "Connected Components in MapReduce
and Beyond" (SoCC'14) — the harness (symmetrize, iterate, converge)
stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Undirected connected components over an edge list.

    Returns one row per node that appears in ``edges``:
    ``(node, component)`` where component = min node id in the
    component (a deterministic canonical label). Isolated nodes never
    appear in an edge list, so they are the caller's concern.
    """
    sym = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy(F.col("dst").alias("m"))
            .agg(F.min("component").alias("neigh_label"))
        )
        merged = (
            labels.join(neigh, labels["node"] == neigh["m"], "left")
            .select(
                labels["node"],
                F.col("component").alias("old_label"),
                F.least(
                    F.col("component"), F.coalesce("neigh_label", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = merged.filter(F.col("component") < F.col("old_label")).limit(1).count()
        labels = merged.select("node", "component")
        if changed == 0:
            break
    return labels
