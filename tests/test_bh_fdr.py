"""KS asymptotic p-values + Benjamini-Hochberg FDR control (X208)."""

import math


def _ks_p(d, n, m, terms=10):
    lam = d * math.sqrt(n * m / (n + m))
    s = sum(
        (-1) ** (j - 1) * math.exp(-2 * j * j * lam * lam)
        for j in range(1, terms + 1)
    )
    return round(min(max(2 * s, 0.0), 1.0), 9)


def test_ks_asymptotic_p_matches_series(spark):
    from pyspark.sql import functions as F

    from corpusama_spark.operators.drift import ks_asymptotic_p

    rows = [(0.05, 400, 400), (0.15, 400, 400), (0.5, 50, 60), (0.9, 9, 9)]
    df = spark.createDataFrame(rows, "d double, n long, m long")
    got = [
        r.p
        for r in df.select(
            ks_asymptotic_p(F.col("d"), F.col("n"), F.col("m")).alias("p")
        ).collect()
    ]
    want = [_ks_p(*r) for r in rows]
    assert got == want
    assert got[0] > 0.5 > got[1] > got[2]  # bigger D, smaller p


def _bh_mirror(ps, q):
    m = len(ps)
    order = sorted(range(m), key=lambda i: ps[i])
    kstar = 0
    for k, i in enumerate(order, start=1):
        if ps[i] <= k * q / m:
            kstar = k
    rejects = {order[k - 1] for k in range(1, kstar + 1)}
    return rejects


def test_bh_fdr_rejects_exactly_stepup_set(spark):
    from corpusama_spark.operators.stats import bh_fdr

    # 3 strong signals, 1 borderline that only survives via step-up,
    # and uniform-ish nulls
    ps = [0.0001, 0.0004, 0.001, 0.02, 0.3, 0.55, 0.6, 0.75, 0.9, 0.95]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "test_id long, p double"
    )
    out = {r.test_id: r for r in bh_fdr(df, "p", q=0.1).collect()}
    want = _bh_mirror(ps, 0.1)
    got = {i for i, r in out.items() if r.reject}
    assert got == want
    # the step-up property: test 3 (p=.02) is rejected at q=.1 because
    # 4 * 0.1 / 10 = 0.04 >= 0.02, even though 0.02 > 1*q/m
    assert out[3].reject
    assert not out[4].reject
    # crit column is rank*q/m
    for r in out.values():
        assert r.crit == round(r.rank * 0.1 / 10, 9)
