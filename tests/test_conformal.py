"""Split-conformal threshold calibration + coverage audit (X194)."""

import hashlib
import math


def _is_cal(i):
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2 == 0


def _mirror(rows, alphas):
    cal = sorted((s, i) for i, s in rows if _is_cal(i))
    test = [s for i, s in rows if not _is_cal(i)]
    out = {}
    n = len(cal)
    for a in alphas:
        k = math.ceil((n + 1) * (1 - a) - 1e-9)
        thr = cal[k - 1][0] if k <= n else None
        covered = sum(
            1 for s in test if thr is None or s <= thr
        )
        out[a] = (n, k, thr, round(covered / len(test), 6))
    return out


def test_conformal_matches_mirror_and_covers(spark):
    from corpusama_spark.operators.quantiles import conformal_thresholds

    # deterministic pseudo-random scores, exchangeable by construction
    rows = [
        (i, float(int(hashlib.md5(f"s{i}".encode()).hexdigest()[:4], 16)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    alphas = [0.05, 0.1, 0.2]
    got = {
        r.alpha: (r.n_cal, r.k, r.threshold, r.coverage)
        for r in conformal_thresholds(
            df, "score", "doc_id", alphas
        ).collect()
    }
    want = _mirror([(i, s) for i, s in rows], alphas)
    assert got == want
    for a in alphas:
        # finite-sample guarantee holds on this exchangeable draw
        assert got[a][3] >= 1 - a - 0.05  # small-sample slack


def test_conformal_small_group_null_threshold(spark):
    from corpusama_spark.operators.quantiles import conformal_thresholds

    # a 3-row calibration set cannot support alpha=0.05:
    # k = ceil(4*0.95) = 4 > n_cal -> NULL threshold, coverage 1
    rows = [(i, float(i), "g") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, score double, src string")
    out = {
        (r.src, r.alpha): r
        for r in conformal_thresholds(
            df, "score", "doc_id", [0.05, 0.5], group_col="src"
        ).collect()
    }
    n_cal = out[("g", 0.5)].n_cal
    assert n_cal + 1 < math.ceil((n_cal + 1) * 0.95) + 1  # sanity
    r = out[("g", 0.05)]
    if r.k > r.n_cal:
        assert r.threshold is None and r.coverage == 1.0
    r5 = out[("g", 0.5)]
    assert r5.threshold is not None and 0.0 <= r5.coverage <= 1.0
