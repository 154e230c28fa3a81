"""Distributed logistic-regression GD (operators/logreg.py): pinned
against a numpy replica of the same rounded full-batch algorithm, plus
learning sanity on linearly separable planted data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbt_slabbing_spark.operators.logreg import logreg_fit
from dbt_slabbing_spark.operators.pca import pyround


def _numpy_gd(X, y, iters, lr, dp):
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(iters):
        z = b + X @ w
        sig = 1.0 / (1.0 + np.exp(-z))
        err = sig - y
        gb = pyround(float(err.mean()), dp)
        g = np.array([pyround(float((err * X[:, j]).mean()), dp) for j in range(X.shape[1])])
        b = b - lr * gb
        w = w - lr * g
    return w, b


def test_logreg_matches_numpy_replica_on_corpus(spark):
    import pyarrow.parquet as pq

    from tests.conftest import SF_SMOKE

    tbl = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    X = np.array([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    y = (np.asarray(tbl["label"].to_pylist()) < 5).astype(np.float64)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    w, b = logreg_fit(
        emb, "embedding", (F.col("label") < 5).cast("double"), X.shape[1],
        iters=3, lr=2.0, round_dp=9,
    )
    wn, bn = _numpy_gd(X, y, iters=3, lr=2.0, dp=9)
    assert b == pytest.approx(bn, abs=1e-12)
    np.testing.assert_allclose(w, wn, atol=1e-12)
    assert np.linalg.norm(wn) > 0  # training actually moved


def test_logreg_learns_separable_planted_data(spark):
    rng = np.random.default_rng(11)
    n, d = 400, 8
    true_w = rng.normal(size=d)
    X = rng.normal(size=(n, d))
    y = (X @ true_w > 0).astype(np.float64)
    df = spark.createDataFrame(
        [(int(yi), [float(x) for x in xi]) for yi, xi in zip(y, X)],
        "label long, embedding array<double>",
    )
    w, b = logreg_fit(
        df, "embedding", (F.col("label") == 1).cast("double"), d,
        iters=10, lr=2.0, round_dp=9,
    )
    pred = (X @ np.array(w) + b) > 0
    acc = float((pred == (y == 1.0)).mean())
    assert acc > 0.9, acc
