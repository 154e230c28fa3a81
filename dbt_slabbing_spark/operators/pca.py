"""Distributed PCA top principal component via power iteration.

The dimensionality-reduction step of an embedding pipeline (whitening,
visualization axes, spectral ordering) reduced to what actually has to
be distributed at 100 TB: ONE pass over the vectors building the d×d
co-moment matrix, after which everything is O(d²) driver arithmetic
and a map-only projection. d = 64 here, so the driver state is 4 KB —
the same bounded-driver-state contract as operators/kmeans.py (k×d)
and operators/bpe.py (one pair string).

Pipeline shape:

- **co-moment pass**: `mapInPandas` partials — each partition folds its
  rows into a d×d product-sum matrix, per-dimension sums, and a count
  (numpy, Arrow-batched; the partial-aggregation state IS the matrix,
  which is why this is one corpus scan and a ≤ d² row shuffle);
  a groupBy(i,j) sum merges partials; means and E[xᵢxⱼ] are rounded
  to ``round_dp`` decimals IN SPARK (rounding.dround) so both engines
  start the iteration from identical doubles.
- **covariance**: C[i][j] = dround(E[xᵢxⱼ] − mᵢ·mⱼ) — the computational
  formula applied to already-rounded inputs, exact arithmetic both
  engines replay bit-for-bit.
- **power iteration**: fixed ``iters`` steps from the exact-dyadic seed
  v₀ = 1/8·𝟙 (unit-norm for d=64), w = C·v, v' = round(w/‖w‖, dp).
  Fixed iteration count, per-step rounding: the unrolled-CTE-oracle
  contract of graph_pagerank_supplier_part / ml_kmeans_cells. The
  64-term dot products differ across engines only in summation order
  (~1e-16), far below the 1e-9 rounding grid.
- **projection**: score = round((x − m)·v, 6) with m, v inlined as plan
  LITERALS — a narrow codegen'd map over the scan, no join, no shuffle.

Python-side rounding (`pyround`) replicates Spark's
``round(x·10ⁿ)/10ⁿ + 0.0`` exactly: decimal HALF_UP on the double
``x·10ⁿ`` (what BigDecimal does) — the same value DuckDB's double
round produces everywhere the corpus convention (rounding.py) holds.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rounding import dround


def pyround(x: float, dp: int) -> float:
    """Driver-side replica of rounding.dround: HALF_UP on x·10^dp in
    exact decimal (= Spark's BigDecimal round of a double), mapped back
    with the same division and -0.0 normalization."""
    p = float(10**dp)
    y = float(Decimal(x * p).quantize(Decimal(1), rounding=ROUND_HALF_UP))
    return y / p + 0.0


def comoment_stats(
    vectors: DataFrame, vec_col: str, dim: int, round_dp: int = 9
) -> tuple[list[float], list[list[float]], int]:
    """One distributed pass → (means, covariance C, n). means[i] and
    the E[xᵢxⱼ] co-moments are rounded to ``round_dp`` in Spark; C is
    the computational-formula covariance over those rounded values."""

    def _partials(batches):
        import numpy as np
        import pandas as pd

        S = np.zeros((dim, dim))
        cs = np.zeros(dim)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            S += X.T @ X
            cs += X.sum(axis=0)
            n += X.shape[0]
        if n == 0:
            return
        ii, jj, ss = [], [], []
        for i in range(dim):
            ii.append(i + 1)
            jj.append(0)  # j=0 marks the per-dimension plain sum
            ss.append(cs[i])
            for j in range(i, dim):
                ii.append(i + 1)
                jj.append(j + 1)
                ss.append(S[i, j])
        yield pd.DataFrame({"i": ii, "j": jj, "s": ss, "n": n})

    merged = (
        vectors.select(F.col(vec_col).alias(vec_col))
        .mapInPandas(_partials, "i int, j int, s double, n long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .select(
            "i", "j", dround(F.col("s") / F.col("n"), round_dp).alias("v"), "n"
        )
        .collect()  # bounded: d + d(d+1)/2 rows
    )
    means = [0.0] * dim
    cxy = [[0.0] * dim for _ in range(dim)]
    n_rows = 0
    for r in merged:
        n_rows = int(r["n"])
        if r["j"] == 0:
            means[r["i"] - 1] = float(r["v"])
        else:
            cxy[r["i"] - 1][r["j"] - 1] = float(r["v"])
            cxy[r["j"] - 1][r["i"] - 1] = float(r["v"])
    cov = [
        [
            pyround(cxy[i][j] - means[i] * means[j], round_dp)
            for j in range(dim)
        ]
        for i in range(dim)
    ]
    return means, cov, n_rows


def power_iteration(
    cov: list[list[float]], iters: int, round_dp: int = 9
) -> tuple[list[float], float]:
    """Fixed-count power iteration from v₀ = 1/√d·𝟙 (exact dyadic for
    d a power of 4); returns (unit eigvec estimate, ‖C·v‖ of the final
    step rounded to round_dp — the eigenvalue estimate)."""
    dim = len(cov)
    seed = 1.0 / math.sqrt(dim)  # exact when dim is a power of 4
    v = [seed] * dim
    lam = 0.0
    for _ in range(iters):
        w = [sum(cov[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        nm = math.sqrt(sum(x * x for x in w))
        if nm == 0.0:
            # degenerate input (e.g. all-constant column → zero
            # covariance): every direction is an eigenvector with
            # eigenvalue 0; return the current v with lam = 0.0 rather
            # than ZeroDivisionError — the defined-result convention of
            # kmeans_fit's empty-cell carry
            return v, 0.0
        v = [pyround(x / nm, round_dp) for x in w]
        lam = pyround(nm, round_dp)
    return v, lam
