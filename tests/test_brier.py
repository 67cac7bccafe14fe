"""Brier decomposition + ECE/MCE (X216): exact hand-computed calibrated
case, Murphy identity on the binned forecast, python mirror parity."""

import numpy as np


def _mirror(scores, labels, bins):
    s = np.asarray(scores, dtype=float)
    y = np.asarray(labels, dtype=int)
    b = np.minimum(bins - 1, np.floor(s * bins).astype(int))
    n = len(s)
    out = {}
    s_rel = s_ob2 = s_ece = s_sq = 0.0
    m_ce = -1.0
    pos = int(y.sum())
    for bb in sorted(set(b)):
        m = b == bb
        nb = int(m.sum())
        pbar = float(s[m].sum()) / nb
        obar_b = float(y[m].sum()) / nb
        s_rel += nb * (pbar - obar_b) ** 2
        s_ob2 += nb * obar_b**2
        s_ece += nb * abs(pbar - obar_b)
        m_ce = max(m_ce, abs(pbar - obar_b))
        s_sq += float(((s[m] - y[m]) ** 2).sum())
    obar = pos / n
    return {
        "n": n,
        "base_rate": round(obar, 6),
        "brier": round(s_sq / n, 6),
        "reliability": round(s_rel / n, 6),
        "resolution": round(s_ob2 / n - obar * obar, 6),
        "uncertainty": round(obar * (1 - obar), 6),
        "ece": round(s_ece / n, 6),
        "mce": round(m_ce, 6),
    }


def _run(spark, scores, labels, bins=10):
    from corpusama_spark.operators.classifier import brier_decomposition

    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in zip(scores, labels)],
        "score double, label boolean",
    )
    return brier_decomposition(df, "score", "label", bins=bins).collect()[0]


def test_brier_perfectly_calibrated_exact(spark):
    # bin 0.2: 1 of 5 positive; bin 0.8: 4 of 5 positive -> reliability,
    # ece, mce all exactly 0; every other number is hand-computable.
    scores = [0.2] * 5 + [0.8] * 5
    labels = [1, 0, 0, 0, 0] + [1, 1, 1, 1, 0]
    r = _run(spark, scores, labels)
    assert (r.reliability, r.ece, r.mce) == (0.0, 0.0, 0.0)
    assert r.base_rate == 0.5 and r.uncertainty == 0.25
    assert r.resolution == 0.09
    assert r.brier == 0.16
    # Murphy identity for the binned forecast: BS = REL - RES + UNC
    assert round(r.reliability - r.resolution + r.uncertainty, 6) == 0.16


def test_brier_mirror_and_murphy_identity(spark):
    rng = np.random.RandomState(21)
    scores = np.round(rng.rand(400), 3)
    labels = (rng.rand(400) < scores**1.5).astype(int)  # miscalibrated
    r = _run(spark, scores, labels)
    m = _mirror(scores, labels, 10)
    got = {
        k: getattr(r, k)
        for k in (
            "n",
            "base_rate",
            "brier",
            "reliability",
            "resolution",
            "uncertainty",
            "ece",
            "mce",
        )
    }
    assert got == m
    # binned-forecast Brier equals REL - RES + UNC to float precision
    s = np.asarray(scores)
    y = np.asarray(labels)
    b = np.minimum(9, np.floor(s * 10).astype(int))
    pbar = {bb: s[b == bb].mean() for bb in set(b)}
    bs_binned = float(
        np.mean([(pbar[bb] - yy) ** 2 for bb, yy in zip(b, y)])
    )
    assert abs((r.reliability - r.resolution + r.uncertainty) - bs_binned) < 2e-6
    assert r.reliability > 0.0  # the miscalibration is visible
