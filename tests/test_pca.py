"""Distributed PCA power iteration (operators/pca.py): the one-pass
co-moment matrix against numpy's covariance, recovery of a PLANTED
dominant direction, the eigenvalue estimate against numpy's eigh, and
the driver-side rounding replica against Spark's dround."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.operators.pca import (
    comoment_stats,
    power_iteration,
    pyround,
)
from dbt_slabbing_spark.rounding import dround


def _planted_df(spark, n=400, dim=16, seed=7):
    """Synthetic vectors with one dominant variance direction: x =
    t*u + 0.05*noise, t ~ N(0,1). PC1 must recover ±u."""
    rng = np.random.default_rng(seed)
    u = rng.normal(size=dim)
    u /= np.linalg.norm(u)
    X = np.outer(rng.normal(size=n), u) + 0.05 * rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        X,
        u,
    )


def test_comoment_stats_match_numpy_covariance(spark):
    df, X, _u = _planted_df(spark)
    means, cov, n = comoment_stats(df, "embedding", X.shape[1], round_dp=9)
    assert n == X.shape[0]
    np.testing.assert_allclose(means, X.mean(axis=0), atol=2e-9)
    # engine covariance uses the computational formula over 9-dp-rounded
    # moments; population (ddof=0) covariance, so compare to numpy's
    np.testing.assert_allclose(
        np.array(cov), np.cov(X.T, ddof=0), atol=5e-9
    )


def test_power_iteration_recovers_planted_direction(spark):
    df, X, u = _planted_df(spark)
    _means, cov, _n = comoment_stats(df, "embedding", X.shape[1], round_dp=9)
    v, lam = power_iteration(cov, iters=8, round_dp=9)
    v = np.array(v)
    # direction: |cos(v, u)| ~ 1 (sign depends on the seed's projection)
    assert abs(float(v @ u)) > 0.999
    # eigenvalue estimate vs numpy's exact top eigenvalue
    top = float(np.linalg.eigvalsh(np.cov(X.T, ddof=0)).max())
    assert lam == pytest.approx(top, rel=1e-3)


def test_pyround_matches_spark_dround(spark):
    # includes the documented BigDecimal-vs-double-space case
    # (rounding.py: 28.846249999999998 at 4 dp) and negative-zero
    vals = [28.846249999999998, -28.846249999999998, 1e-12, -1e-12,
            0.0, -0.0, 1.2345678945, -1.2345678945, 123.000000001]
    for dp in (4, 6, 9):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = [r[0] for r in df.select(dround(F.col("x"), dp)).collect()]
        want = [pyround(v, dp) for v in vals]
        assert got == want, (dp, list(zip(vals, got, want)))
        assert all(math.copysign(1.0, w) > 0 for w in want if w == 0.0)


def test_pc1_gate_scores_match_numpy_projection(spark):
    """The registry gate's per-vector scores must equal the numpy
    replica of the same algorithm (co-moments -> 4 power steps ->
    centered projection) to the 6-dp output grid."""
    from dbt_slabbing_spark.queries import registry
    from tests.conftest import SF_SMOKE

    got = {
        r["vec_id"]: r
        for r in registry()["ml_power_iteration_pc1"].fn(spark, SF_SMOKE).collect()
    }
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    X = np.array(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    ids = tbl["vec_id"].to_pylist()
    m = np.array([pyround(x, 9) for x in X.mean(axis=0)])
    cxy = X.T @ X / len(X)
    cxy = np.vectorize(lambda x: pyround(x, 9))(cxy)
    cov = np.vectorize(lambda x: pyround(x, 9))(cxy - np.outer(m, m))
    v = np.full(64, 0.125)
    for _ in range(4):
        w = cov @ v
        nm = float(np.linalg.norm(w))
        v = np.array([pyround(x / nm, 9) for x in w])
        lam = pyround(nm, 9)
    assert len(got) == len(ids) > 0
    for k, vec in zip(ids, X):
        want = pyround(float((vec - m) @ v), 6)
        assert got[k]["pc1_score"] == pytest.approx(want, abs=2e-6)
        assert got[k]["lambda1"] == pytest.approx(lam, abs=1e-8)


def test_power_iteration_zero_covariance_returns_defined_result():
    """Degenerate input (all-constant column → zero covariance matrix)
    must return (current v, lam=0.0) — the kmeans empty-cell-carry
    convention — not ZeroDivisionError."""
    from dbt_slabbing_spark.operators.pca import power_iteration

    v, lam = power_iteration([[0.0, 0.0], [0.0, 0.0]], iters=5)
    assert lam == 0.0
    assert len(v) == 2 and all(x == v[0] for x in v)
