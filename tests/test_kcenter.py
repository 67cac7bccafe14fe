"""Greedy k-center (farthest-point) coreset selection (X196)."""

import numpy as np


def _mirror(X, ids, k):
    sel = [int(ids[np.argmin(ids)])]
    idx = {v: i for i, v in enumerate(ids)}
    mind = np.round(((X - X[idx[sel[0]]]) ** 2).sum(axis=1), 6)
    rows = [(1, sel[0], 0.0)]
    for rank in range(2, k + 1):
        # max mind, ties to lower id
        best = max(zip(mind, -ids), key=lambda t: (t[0], t[1]))
        sid = int(-best[1])
        rows.append((rank, sid, float(best[0])))
        d = np.round(((X - X[idx[sid]]) ** 2).sum(axis=1), 6)
        mind = np.minimum(mind, d)
    return rows


def test_kcenter_matches_numpy_mirror(spark):
    from corpusama_spark.operators.kmeans import kcenter_select

    rng = np.random.RandomState(3)
    X = rng.randn(120, 8).round(3)
    ids = np.arange(1000, 1120)
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x]) for i, x in zip(ids, X)],
        "vec_id long, embedding array<double>",
    )
    got = [
        (r.rank, r.id, r.radius)
        for r in kcenter_select(df, k=6).orderBy("rank").collect()
    ]
    want = _mirror(X, ids, 6)
    assert got == want
    # radii are the covering-radius curve: non-increasing
    radii = [r[2] for r in got[1:]]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_spreads_over_clusters(spark):
    from corpusama_spark.operators.kmeans import kcenter_select

    # 3 tight clusters far apart: the first 3 picks must hit all 3
    pts = []
    for cx, base in [(0.0, 0), (100.0, 40), (-100.0, 80)]:
        for j in range(40):
            pts.append((base + j, [cx + 0.01 * j, cx - 0.01 * j]))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    picks = [
        r.id for r in kcenter_select(df, k=3).orderBy("rank").collect()
    ]
    clusters = {p // 40 for p in picks}
    assert clusters == {0, 1, 2}
