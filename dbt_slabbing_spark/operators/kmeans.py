"""Distributed fixed-iteration Lloyd's k-means over embedding columns.

The trained coarse quantizer the ANN / semantic-dedup stack was missing:
operators/ivf.py and operators/semdedup.py partition the embedding space
with either MLlib k-means (not SQL-reproducible → rows-only gate) or
deterministic seed vectors (oracle-replayable but data-independent).
This operator is both: real Lloyd's iterations, bit-reproducible by a
SQL oracle, so `ml_kmeans_cells` gets a full value-hash driver gate and
SemDeDup/IVF can ride TRAINED centroids (the SemDeDup paper's n_cells
contract assumes trained cells — Abbas et al. 2023, §3).

Algorithm (k-means as iterated dataflow, the same engineering shape as
operators/graph.py::pagerank_fixed):
- init: the ``k`` lowest-id vectors, dense cell ids 0..k-1 in id order
  (the reconstruct-without-shared-state idiom of semdedup.py /
  hyperplane LSH — an oracle can rebuild the seed set from the table);
- assignment: argmin squared distance to the centroid set, ties →
  lowest cell id, with centroids inlined as plan LITERALS (reuses
  ivf.py::_cell_assignment) — a narrow codegen'd map over the scan,
  no join, no shuffle;
- update: ONE groupBy(cell) aggregation per iteration — count + one
  per-component avg (map-side partial agg, shuffle keyed on cell, ≤ k
  result rows); each component is rounded to ``round_dp`` decimals
  per iteration (rounding.dround) so cross-engine float-summation
  order can't drift the next iteration's argmin — the exact
  per-iteration-rounding trick of graph_pagerank_supplier_part;
- empty cells carry their previous centroid (the standard Lloyd's
  choice, and what the oracle's LEFT JOIN + coalesce replays).

100 TB shape: per iteration, cost = one full scan + one k-row shuffle.
The driver materializes k×dim doubles per iteration (the broadcast-
centroid contract — independent of corpus size; MLlib's own KMeans
broadcasts exactly the same state per iteration). ``iters`` is FIXED,
not convergence-tested: a coarse quantizer needs a Voronoi partition,
not a converged one (see ivf.py's max_iter note), and a fixed count is
what makes the computation replayable as an unrolled-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rounding import sql_round
from .ivf import _cell_assignment


def seed_centroids_dense(
    vectors: DataFrame, id_col: str, vec_col: str, k: int
) -> list[tuple[int, list[float]]]:
    """The ``k`` lowest-id vectors as (dense_cell_id, vector) seeds —
    cell ids 0..k-1 in seed id order. Bounded collect: k rows."""
    rows = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(k)
        .collect()
    )
    return [(i, [float(x) for x in r[1]]) for i, r in enumerate(rows)]


def kmeans_fit(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    round_dp: int = 9,
    init: list[tuple[int, list[float]]] | None = None,
) -> tuple[list[tuple[int, list[float]]], dict[int, int]]:
    """Run ``iters`` Lloyd updates; return ``(centroids, n_members)``.

    ``centroids`` is ``[(cell_id, [components…]), …]`` after the final
    update (components rounded to ``round_dp``; an empty cell carries
    its previous — possibly seed — centroid unchanged). ``n_members``
    maps cell id → member count of the FINAL iteration's assignment
    (0 for empty cells). Pass ``init`` to override the seed set (e.g.
    resuming from previously trained centroids).
    """
    cents = init if init is not None else seed_centroids_dense(vectors, id_col, vec_col, k)
    if not cents:
        return [], {}
    dim = len(cents[0][1])
    counts: dict[int, int] = {cid: 0 for cid, _ in cents}
    # The update aggregation as ONE parsed SQL string (guide §7.3 driver
    # planning cost): the column-object form issued ~5 py4j round-trips
    # per component (element_at/cast/avg/round/alias ≈ 320 per iteration
    # at dim=64), rebuilt with fresh literals every iteration — ~1 s of
    # driver chatter per iteration measured in the r14 sweep. One
    # F.expr(...) is a single round-trip; the parsed tree is the SAME
    # aggregate expression (sql_round spells dround verbatim), so
    # centroids stay bit-identical (pinned by tests/test_kmeans.py).
    comp_aggs = ", ".join(
        sql_round(f"avg(cast(element_at(`{vec_col}`, {i + 1}) as double))", round_dp)
        + f" as _c{i}"
        for i in range(dim)
    )
    update_expr = f"struct(count(1) as _n, {comp_aggs})"
    for _ in range(iters):
        assigned = vectors.select(
            F.col(vec_col),
            _cell_assignment(vectors, cents, vec_col).cast("long").alias("cell"),
        )
        rows = (
            assigned.groupBy("cell").agg(F.expr(update_expr).alias("_s")).collect()
        )  # bounded: ≤ k rows
        by_cell = {int(r["cell"]): r["_s"] for r in rows}
        nxt: list[tuple[int, list[float]]] = []
        counts = {}
        for cid, prev in cents:
            r = by_cell.get(cid)
            if r is None:
                nxt.append((cid, prev))  # empty cell: carry the centroid
                counts[cid] = 0
            else:
                nxt.append((cid, [float(r[f"_c{i}"]) for i in range(dim)]))
                counts[cid] = int(r["_n"])
        cents = nxt
    return cents, counts
