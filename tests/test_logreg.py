"""Newton-IRLS logistic regression (X195)."""

import math

import numpy as np
import pytest


def _mirror_irls(X, y, iters=8, ridge=1e-6):
    n, d = X.shape
    Xb = np.hstack([np.ones((n, 1)), X])
    beta = np.zeros(d + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ beta)))
        w = p * (1 - p)
        H = Xb.T @ (Xb * w[:, None]) + ridge * np.eye(d + 1)
        g = Xb.T @ (y - p)
        beta = beta + np.linalg.solve(H, g)
    return beta


def _data():
    rng = np.random.RandomState(7)
    n = 600
    X = rng.randn(n, 3)
    logit = 0.5 + 1.5 * X[:, 0] - 2.0 * X[:, 1] + 0.0 * X[:, 2]
    y = (1.0 / (1.0 + np.exp(-logit)) > rng.rand(n)).astype(float)
    return X, y


def test_irls_matches_numpy_mirror(spark):
    from corpusama_spark.operators.classifier import train_logistic

    X, y = _data()
    rows = [
        (float(a), float(b), float(c), float(t))
        for (a, b, c), t in zip(X, y)
    ]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, y double")
    got = train_logistic(df, ["f1", "f2", "f3"], "y", iters=8)
    want = _mirror_irls(X, y, iters=8)
    assert np.allclose(got, want, rtol=1e-8, atol=1e-10), (got, want)
    # learned signs/magnitudes track the generating process
    assert got[1] > 0.8 and got[2] < -1.2 and abs(got[3]) < 0.4


def test_scoring_is_sigmoid_and_null_safe(spark):
    from corpusama_spark.operators.classifier import score_logistic

    df = spark.createDataFrame(
        [(0.0, 1.0), (2.0, -1.0), (None, 5.0)], "a double, b double"
    )
    beta = [0.1, 1.0, -0.5]
    out = score_logistic(df, ["a", "b"], beta).collect()
    for r in out:
        if r.a is None:
            assert r.p_keep is None
        else:
            eta = 0.1 + r.a - 0.5 * r.b
            assert r.p_keep == pytest.approx(
                1 / (1 + math.exp(-eta)), rel=1e-12
            )


def test_irls_separable_data_stays_finite(spark):
    from corpusama_spark.operators.classifier import train_logistic

    rows = [(float(i), 1.0 if i >= 5 else 0.0) for i in range(10)]
    df = spark.createDataFrame(rows, "f double, y double")
    beta = train_logistic(df, ["f"], "y", iters=8, ridge=1e-6)
    assert all(math.isfinite(b) for b in beta)
    assert beta[1] > 0
