"""IVF index staleness audit (X247): same-distribution batch stays
fresh, a shifted batch trips fill-drift, degraded residuals trip the
growth gate, empty-cell edges."""

import numpy as np
from pyspark.sql import functions as F


def _emb(spark, vecs, prefix="v"):
    rows = [(f"{prefix}{i}", [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id string, embedding array<double>")


def _clusters(rng, centers, n_each, spread):
    out = []
    for c in centers:
        out.extend(np.array(c) + rng.normal(0, spread, (n_each, len(c))))
    return out


def test_fresh_vs_shifted(spark):
    from corpusama_spark.operators.embdiag import (
        assign_to_centroids,
        index_staleness,
    )
    from corpusama_spark.operators.pq import ivf_coarse

    rng = np.random.RandomState(3)
    centers = [(0, 0, 0, 0), (10, 0, 0, 0), (0, 10, 0, 0)]
    train = _emb(spark, _clusters(rng, centers, 30, 0.4), "t")
    cents, assign = ivf_coarse(train, kc=3, citers=2)
    # rebuild train d2 via the extracted primitive (same centroids)
    train_assign = assign_to_centroids(train, cents)

    # fresh batch: same mixture -> balanced shares, no stale cell
    fresh = _emb(spark, _clusters(rng, centers, 20, 0.4), "f")
    rep = index_staleness(train_assign, fresh, cents).collect()
    assert len(rep) == 3
    assert not any(r.stale for r in rep)
    assert all(abs(r.share_ratio - 1.0) < 0.2 for r in rep)

    # shifted batch: everything lands near ONE center -> fill drift
    shifted = _emb(spark, _clusters(rng, centers[:1], 60, 0.4), "s")
    rep2 = {r.cell: r for r in index_staleness(train_assign, shifted, cents).collect()}
    assert any(r.stale for r in rep2.values())
    hot = max(rep2.values(), key=lambda r: r.new_share)
    assert hot.share_ratio > 2.0 and hot.stale
    # starved cells: share_ratio ~0 -> drifted too
    starved = min(rep2.values(), key=lambda r: r.new_share)
    assert starved.n_new == 0 and starved.stale


def test_residual_growth_trips(spark):
    from corpusama_spark.operators.embdiag import (
        assign_to_centroids,
        index_staleness,
    )
    from corpusama_spark.operators.pq import ivf_coarse

    rng = np.random.RandomState(4)
    centers = [(0.0, 0.0), (8.0, 8.0)]
    train = _emb(spark, _clusters(rng, centers, 40, 0.3), "t")
    cents, _ = ivf_coarse(train, kc=2, citers=2)
    train_assign = assign_to_centroids(train, cents)

    # same mixture but much wider spread: shares stay balanced while
    # residuals blow up -> the residual gate, not the fill gate, fires
    loose = _emb(spark, _clusters(rng, centers, 40, 2.5), "l")
    rep = index_staleness(train_assign, loose, cents).collect()
    assert all(abs(r.share_ratio - 1.0) <= 0.5 for r in rep)
    assert all(r.resid_growth > 2.0 and r.stale for r in rep)
