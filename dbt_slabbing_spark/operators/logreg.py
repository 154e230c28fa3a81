"""Distributed fixed-iteration logistic-regression training (full-batch
gradient descent) over an embedding column.

The supervised TRAINING counterpart of the engine's inference-side
quality classifier (operators/quality_classifier.py ships frozen
weights; this learns weights) and the third member of the
iterated-dataflow ML family (operators/kmeans.py, operators/pca.py):

- **score pass (map-only)**: z = b + w·x with the current weights
  inlined as plan LITERALS — a narrow codegen'd map over the scan, no
  join (the kmeans centroid-literal / pca projection idiom);
- **gradient (one aggregation)**: ∂/∂wⱼ = avg((σ(z) − y)·xⱼ), ∂/∂b =
  avg(σ(z) − y) — d+1 map-side-combined avgs, each rounded to
  ``round_dp`` decimals (rounding.dround) so cross-engine float
  summation order can't drift the next iteration;
- **update (driver)**: w ← w − lr·g with lr exact-dyadic, so the
  update arithmetic is IEEE-exact on identical operands — the driver
  holds d+1 doubles between iterations, corpus-size-independent.

Fixed iteration count, per-iteration rounding = the unrolled-CTE-oracle
contract of graph_pagerank / ml_kmeans_cells / ml_power_iteration_pc1.
σ uses exp(); its possible last-ulp libm disagreement is washed out by
the gradient rounding, and the DECISION threshold σ(z) > 1/2 is
evaluated as round(z, dp) > 0 on both engines so no exp sits on the
accuracy boundary.

At 100 TB: per iteration = one corpus scan + one (d+1)-value aggregate.
This is exactly MLlib's LogisticRegressionWithSGD full-batch shape; the
point of owning it here is the bit-reproducible oracle replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..rounding import dround


def _z(vec_col: str, weights: list[float], bias: float) -> Column:
    """b + w·x as a chained literal expression (map-only, codegen)."""
    z = F.lit(bias)
    for j, wj in enumerate(weights):
        z = z + F.element_at(F.col(vec_col), j + 1).cast("double") * F.lit(wj)
    return z


def logreg_fit(
    df: DataFrame,
    vec_col: str,
    y_col: Column,
    dim: int,
    iters: int = 3,
    lr: float = 2.0,
    round_dp: int = 9,
) -> tuple[list[float], float]:
    """Run ``iters`` full-batch GD steps from w = 0, b = 0; return
    ``(weights, bias)`` (gradients rounded to ``round_dp`` per step,
    updates exact-dyadic)."""
    w = [0.0] * dim
    b = 0.0
    data = df.select(F.col(vec_col), y_col.cast("double").alias("_y"))
    for _ in range(iters):
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(vec_col, w, b)))
        # project err ONCE: inlining it into all d+1 aggregates would
        # replicate the 64-term score chain per aggregate and blow up
        # Catalyst analysis ~d× (the with_hilbert_key lesson)
        scored = data.select(
            F.col(vec_col), (sig - F.col("_y")).alias("_err")
        )
        aggs = [dround(F.avg("_err"), round_dp).alias("_gb")] + [
            dround(
                F.avg(
                    F.col("_err")
                    * F.element_at(F.col(vec_col), j + 1).cast("double")
                ),
                round_dp,
            ).alias(f"_g{j}")
            for j in range(dim)
        ]
        row = scored.agg(*aggs).collect()[0]  # bounded: d+1 doubles
        b = b - lr * float(row["_gb"])
        w = [w[j] - lr * float(row[f"_g{j}"]) for j in range(dim)]
    return w, b
