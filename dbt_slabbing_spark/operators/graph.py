"""Distributed graph operators (what dedup clustering stands on).

Connected components in two interchangeable algorithms behind one
harness (same input, same ``(node, component)`` output, same oracle):

- ``label``: iterative min-label propagation — one equi-join +
  min-groupBy per round; round count = component DIAMETER. Ideal for
  near-dup clusters (small, shallow components).
- ``star``: alternating large-star/small-star rounds of Kiveris et
  al., "Connected Components in MapReduce and Beyond" (SoCC'14) —
  round count O(log² n) INDEPENDENT of diameter, so a giant or
  path-shaped component (web-crawl dedup graphs) converges where
  label propagation would need diameter rounds.

Both truncate lineage per round with ``localCheckpoint`` and probe
convergence with a 1-row driver fetch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Undirected connected components over an edge list.

    Returns one row per node that appears in ``edges``:
    ``(node, component)`` where component = min node id in the
    component (a deterministic canonical label). Isolated nodes never
    appear in an edge list, so they are the caller's concern.

    ``algorithm='label'`` (default) converges in diameter rounds;
    ``algorithm='star'`` in O(log² n) rounds (use for giant/deep
    components).

    Raises ``RuntimeError`` if the loop exhausts ``max_iter`` while
    labels are still changing (component diameter > max_iter) — silently
    returning partially-propagated labels would hand the caller wrong
    components with no signal.
    """
    both = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).union(
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    )
    # nodes BEFORE dropping self-loops: a (v, v) edge still names a node
    nodes = both.select(F.col("src").alias("node")).distinct().localCheckpoint()
    sym = both.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    if algorithm == "star":
        return _star_components(sym, nodes, max_iter)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}: use 'label' or 'star'")
    labels = nodes.withColumn("component", F.col("node"))
    converged = False
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
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (component diameter exceeds the budget); raise max_iter"
        )
    return labels


def _star_components(sym: DataFrame, nodes: DataFrame, max_iter: int) -> DataFrame:
    """Kiveris et al. (SoCC'14) alternating large-star/small-star.

    ``sym``: symmetric self-loop-free edge list (src, dst). Each round:

    - large-star: every node u sends its strictly-larger neighbors to
      m(u) = min(Γ(u) ∪ {u}) — flattens tall trees;
    - small-star: every node u (over edges dst < src) sends its smaller
      neighbors AND itself to min of that set — halves star depth.

    Both are one groupBy-min + one equi-join (map-side combinable); the
    edge set monotonically contracts toward a star forest rooted at each
    component's min node, in O(log² n) rounds regardless of diameter.
    """

    def large_star(e: DataFrame) -> DataFrame:
        mins = e.groupBy("src").agg(F.min("dst").alias("_mn"))
        m = F.least(F.col("src"), F.col("_mn"))
        return (
            e.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), m.alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        down = e.filter(F.col("dst") < F.col("src"))
        mins = down.groupBy("src").agg(F.min("dst").alias("_mn"))
        leaf_edges = (
            down.join(mins, "src")
            .filter(F.col("dst") != F.col("_mn"))
            .select(F.col("dst").alias("src"), F.col("_mn").alias("dst"))
        )
        center_edges = mins.select(F.col("src"), F.col("_mn").alias("dst"))
        return leaf_edges.union(center_edges).filter(F.col("src") != F.col("dst")).distinct()

    def resym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()

    edges = sym
    converged = False
    for _ in range(max_iter):
        after = small_star(resym(large_star(edges))).localCheckpoint()
        sym_after = resym(after).localCheckpoint()
        # fixpoint ⟺ the undirected edge sets coincide
        grew = sym_after.exceptAll(edges).limit(1).count()
        shrank = edges.exceptAll(sym_after).limit(1).count()
        edges = sym_after
        if grew == 0 and shrank == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"star connected_components did not converge within max_iter={max_iter} rounds"
        )
    # fixpoint edges form star forests: every node's min neighbor is its
    # component min (the center's own min neighbor is larger, so least()
    # keeps the center labeled by itself)
    labels = edges.groupBy(F.col("src").alias("node")).agg(
        F.least(F.col("node"), F.min("dst")).alias("component")
    )
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def pagerank_fixed(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    round_fn=None,
) -> DataFrame:
    """Fixed-iteration PageRank over a SYMMETRIC edge list (src, dst):
    returns (node, outdeg, rank).

    The canonical iterative dataflow: each iteration is one
    contributions join (rank/outdeg shipped along edges) + one
    sum-by-destination — the same shuffle pair as connected_components,
    so at 100 TB the cost is iters × (edge-shuffle + node-aggregate),
    with the node frame orders of magnitude smaller than the edges.
    Fixed iteration count (not convergence detection) keeps the gate
    deterministic; symmetric input means no dangling-mass term.

    ``round_fn`` (e.g. 12-dp dround) is applied to the rank after EVERY
    iteration so cross-engine float-sum-order noise cannot compound —
    the DuckDB oracle applies the identical rounding per iteration.
    """
    sym = edges
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
    # N as ONE scalar job up front, embedded as a literal: a broadcast
    # global-agg subplan referenced per iteration would re-plan a
    # single-partition exchange every round (the corpus invariant caps
    # those at 1/query), and at 100 TB counting the node frame once is
    # how a real PageRank sizes its teleport term. Same IEEE division
    # as the oracle's `0.15 / n` (double / double).
    n_nodes = float(deg.count())
    ranks = deg.select(
        F.col("src").alias("node"), "outdeg", F.lit(1.0 / n_nodes).alias("rank")
    )
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contribs = (
            sym.join(ranks, sym.src == ranks.node)
            .select(F.col("dst"), (F.col("rank") / F.col("outdeg")).alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_inc"))
        )
        new_rank = F.lit(base) + F.lit(damping) * F.col("_inc")
        if round_fn is not None:
            new_rank = round_fn(new_rank)
        ranks = (
            deg.join(contribs, deg.src == contribs.dst)
            .select(F.col("src").alias("node"), "outdeg", new_rank.alias("rank"))
        )
    return ranks
