"""Entropic-OT (Sinkhorn) histogram distance (X206)."""

import math

import numpy as np


def _mirror(vals_by_g, nbins=16, width=50.0, eps=0.1, iters=6):
    hists = {}
    for g, vals in vals_by_g.items():
        h = np.zeros(nbins)
        for v in vals:
            b = min(int(v // width), nbins - 1)
            if b >= 0:
                h[b] += 1
        hists[g] = h / h.sum()
    C = np.abs(
        np.arange(nbins)[:, None] - np.arange(nbins)[None, :]
    ) / (nbins - 1)
    K = np.exp(-C / eps)
    out = {}
    for ga in sorted(hists):
        for gb in sorted(hists):
            if ga >= gb:
                continue
            a, b = hists[ga], hists[gb]
            u = np.zeros(nbins)
            v = np.ones(nbins)
            for _ in range(iters):
                kv = K @ v
                u = np.round(
                    np.where((a > 0) & (kv > 0), a / kv, 0.0), 9
                )
                ku = K.T @ u
                v = np.round(
                    np.where((b > 0) & (ku > 0), b / ku, 0.0), 9
                )
            cost = float((u[:, None] * K * v[None, :] * C).sum())
            out[(ga, gb)] = round(cost, 6)
    return out


def test_sinkhorn_matches_numpy_mirror(spark):
    from corpusama_spark.operators.drift import sinkhorn_hist_distance

    rng = np.random.RandomState(4)
    vals = {
        "a": list(50 + 100 * rng.rand(300)),       # bins 1-2
        "b": list(400 + 150 * rng.rand(300)),      # bins 8-10
        "c": list(50 + 100 * rng.rand(300)),       # same as a
    }
    rows = [
        (g, float(v)) for g, vs in vals.items() for v in vs
    ]
    df = spark.createDataFrame(rows, "src string, n double")
    got = {
        (r.src_a, r.src_b): r.sinkhorn_cost
        for r in sinkhorn_hist_distance(df, "src", "n").collect()
    }
    want = _mirror(vals)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=2e-6), k
    # identical distributions cost ~0 up to the entropic blur (~ε·ln);
    # far ones cost much more
    assert got[("a", "c")] < 0.05
    assert got[("a", "b")] > 5 * got[("a", "c")]
    # OT respects geometry: a->b distance tracks the bin gap
    assert got[("a", "b")] > 0.3
