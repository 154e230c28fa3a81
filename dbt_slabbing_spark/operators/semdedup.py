"""SemDeDup-style semantic deduplication over embedding columns.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): cluster the embedding space
with a coarse quantizer, then — WITHIN each cluster only — drop every
vector that has a sufficiently-cosine-similar neighbor, keeping one
representative per near-duplicate group. The clustering is what makes
the method scale: the quadratic pair scan is confined to a cell, never
the corpus.

This implementation completes the engine's dedup modality matrix
(exact / minhash / simhash / containment / line / substring — see
queries/dedup.py — plus SEMANTIC here): unlike the lexical tiers it
catches paraphrases and re-encodings that share no surface n-grams.

Determinism contract: the coarse quantizer here is the same
broadcast-centroid argmin as operators/ivf.py (`_cell_assignment` is
reused directly), but the centroids are DETERMINISTIC SEEDS — by
default the ``n_cells`` lowest-id vectors — instead of MLlib k-means
output, so a SQL oracle can reconstruct the exact assignment
(k-means centroids are Spark-internal; seeded assignment is
bit-reproducible from the table alone). A production deployment at
100 TB would pass k-means centroids via ``centroids=`` — recall/
balance improve, the plan shape is identical.

Keep rule (first-wins greedy, the SemDeDup paper's "keep one point per
epsilon-group" with id order as the deterministic tiebreak): a vector
is KEPT iff no lower-id vector in its cell has cosine ≥ threshold with
it. Greedy-by-id is order-dependent but deterministic, and — unlike
transitive-closure grouping — needs exactly one within-cell pair join.

Scale shape (100 TB):
- assignment: a narrow map over the scan (centroids are literals in the
  codegen'd expression — no join, no shuffle);
- pair scan: an equi-join on cell id — shuffle keyed on cell, cost
  Σ|cell|², which is the SemDeDup contract: n_cells is chosen ∝ corpus
  size to bound cell width (the paper uses ~100k clusters for LAION);
  per-vector norms are precomputed once (n rows), not per pair;
- verdict: one per-vector aggregation (min dup id), one left join back.
No cross join anywhere; tests/test_plan_quality.py pins that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rounding import dround
from .ivf import _cell_assignment
from .similarity import dot, norm


def seed_centroids(
    vectors: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> list[tuple[int, list[float]]]:
    """The ``n_cells`` lowest-id vectors as (cell_id, vector) seeds.

    cell_id is the seed vector's OWN id (not a dense index) so the
    oracle can name cells without replaying enumeration order. The
    collect is bounded at n_cells rows — the same driver-side footprint
    as the IVF centroid list or the LSH hyperplane set.
    """
    rows = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.30,
    n_cells: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """(id, cell, keep, dup_of): per-vector SemDeDup verdict.

    - ``cell``: assigned quantizer cell (argmin squared distance to the
      centroid set; ties → lowest cell id — matches ivf.py).
    - ``keep``: no lower-id same-cell vector with cosine ≥ ``threshold``
      (cosine rounded to 6 dp before the compare, the cross-engine
      convention of sim_neardup_pairs).
    - ``dup_of``: the LOWEST such neighbor id (NULL when kept). Note
      this is the lowest similar lower-id neighbor, which need not
      itself be kept (its own lower-id neighbor need not be similar to
      this row) — chase to the kept root if representative semantics
      are wanted; the greedy keep/drop verdict is unaffected.
    """
    if centroids is None:
        centroids = seed_centroids(vectors, id_col, vec_col, n_cells)

    assigned = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        _cell_assignment(vectors, centroids, vec_col).cast("long").alias("cell"),
    )
    # Norms once per row (n), not per pair (Σ|cell|²) — see
    # sim_neardup_pairs for the bit-identity argument: sqrt(dot(v,v)) is
    # the same double whether computed per row or inside the pair.
    withn = assigned.select(
        id_col, vec_col, "cell", norm(F.col(vec_col)).alias("_n")
    )
    a = withn.select(
        F.col(id_col).alias("_id_a"),
        F.col("cell").alias("_cell_a"),
        F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = withn.select(
        F.col(id_col).alias("_id_b"),
        F.col("cell").alias("_cell_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    cos = dround(dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6)
    dups = (
        a.join(
            b,
            (F.col("_cell_a") == F.col("_cell_b")) & (F.col("_id_a") < F.col("_id_b")),
        )
        .filter(cos >= F.lit(threshold))
        .groupBy(F.col("_id_b").alias(id_col))
        .agg(F.min("_id_a").alias("dup_of"))
    )
    return (
        assigned.join(dups, id_col, "left")
        .select(
            id_col,
            "cell",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )
