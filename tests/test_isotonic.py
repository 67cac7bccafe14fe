"""Isotonic (PAV) calibration (X218): minimax result equals the classic
pool-adjacent-violators loop, monotonicity, pool-mean preservation,
already-monotone identity."""

import numpy as np


def _pav(ns, ps):
    """Classic weighted PAV over (n_b, pos_b) bin sequences."""
    pools = [[n, p] for n, p in zip(ns, ps)]  # [weight, pos]
    i = 0
    while i < len(pools) - 1:
        if pools[i][1] / pools[i][0] > pools[i + 1][1] / pools[i + 1][0]:
            pools[i][0] += pools[i + 1][0]
            pools[i][1] += pools[i + 1][1]
            del pools[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand pooled values back to one entry per original bin
    vals = []
    pool_idx = 0
    remaining = pools[0][0]
    for n in ns:
        while remaining < n:
            pool_idx += 1
            remaining += pools[pool_idx][0]
        vals.append(pools[pool_idx][1] / pools[pool_idx][0])
        remaining -= n
    return vals


def _run(spark, scores, labels, bins):
    from corpusama_spark.operators.classifier import isotonic_fit

    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in zip(scores, labels)],
        "score double, label boolean",
    )
    return isotonic_fit(df, "score", "label", bins=bins).collect()


def test_isotonic_equals_classic_pav(spark):
    rng = np.random.RandomState(17)
    scores = np.round(rng.rand(600), 3)
    # noisy, partly inverted relationship to force real pooling
    labels = (rng.rand(600) < (0.8 - 0.6 * scores + 0.5 * scores**2)).astype(int)
    rows = _run(spark, scores, labels, bins=12)
    bins = [r.bin for r in rows]
    ns = [r.n_b for r in rows]
    b = np.minimum(11, np.floor(np.asarray(scores) * 12).astype(int))
    ps = [int(labels[b == bb].sum()) for bb in bins]
    assert ns == [int((b == bb).sum()) for bb in bins]
    expect = [round(v, 6) for v in _pav(ns, ps)]
    assert [r.iso_p for r in rows] == expect
    # monotone nondecreasing
    iso = [r.iso_p for r in rows]
    assert all(a <= b_ for a, b_ in zip(iso, iso[1:]))
    # pooled total preserved: sum n_b*iso == total positives (to 6dp slack)
    assert abs(sum(n * v for n, v in zip(ns, iso)) - sum(ps)) < 1e-2


def test_isotonic_identity_when_already_monotone(spark):
    # calibrated staircase: pos rates 0.2 < 0.5 < 0.9 -> PAV is identity
    scores = [0.1] * 10 + [0.5] * 10 + [0.9] * 10
    labels = [1] * 2 + [0] * 8 + [1] * 5 + [0] * 5 + [1] * 9 + [0] * 1
    rows = _run(spark, scores, labels, bins=10)
    got = {r.bin: (r.raw_rate, r.iso_p) for r in rows}
    assert got == {1: (0.2, 0.2), 5: (0.5, 0.5), 9: (0.9, 0.9)}


def test_isotonic_pools_inversion(spark):
    # one inversion: rates 0.8 then 0.2 with equal weight -> both pool to 0.5
    scores = [0.1] * 10 + [0.9] * 10
    labels = [1] * 8 + [0] * 2 + [1] * 2 + [0] * 8
    rows = _run(spark, scores, labels, bins=10)
    got = {r.bin: (r.raw_rate, r.iso_p) for r in rows}
    assert got == {1: (0.8, 0.5), 9: (0.2, 0.5)}
