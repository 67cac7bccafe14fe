"""Local Outlier Factor (X214): python mirror parity, planted-outlier
semantics, duplicate-collapse NULLs, precomputed-graph identity."""

import numpy as np


def _mirror(pool, k):
    """Exact mirror of lof_scores incl. every rounding point."""

    def cos6(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    ids = sorted(pool)
    knn = {}
    for p in ids:
        scored = sorted(
            ((cos6(pool[p], pool[o]), o) for o in ids if o != p),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        knn[p] = [(int(round((1.0 - c) * 1_000_000.0)), o) for c, o in scored]
    kd = {p: max(d for d, _ in lst) for p, lst in knn.items()}
    lrd, lrd_i = {}, {}
    for p, lst in knn.items():
        sr = sum(max(kd[o], d) for d, o in lst)
        if sr > 0:
            lrd[p] = round(len(lst) * 1_000_000.0 / sr, 6)
            lrd_i[p] = int(round(lrd[p] * 1_000_000.0))
        else:
            lrd[p] = None
            lrd_i[p] = None
    rows = {}
    for p, lst in knn.items():
        n = len(lst)
        olrds = [lrd_i[o] for d, o in lst if lrd_i[o] is not None]
        if lrd_i[p] and len(olrds) == n:
            lof = round(sum(olrds) / (n * lrd_i[p]), 6)
        else:
            lof = None
        rows[p] = (lrd[p], lof, None if lof is None else lof >= 1.5)
    return rows


def _df(spark, pool):
    rows = [(int(i), [float(x) for x in v]) for i, v in sorted(pool.items())]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lof_mirror_and_planted_outlier(spark):
    from corpusama_spark.operators.similarity import lof_scores

    rng = np.random.RandomState(5)
    # a tight cluster around one direction + one antipodal outlier
    base = rng.randn(8)
    pool = {i: base + 0.05 * rng.randn(8) for i in range(20)}
    pool[99] = -base
    got = {
        r.vec_id: (r.lrd, r.lof, r.is_outlier)
        for r in lof_scores(_df(spark, pool), k=4).collect()
    }
    assert got == _mirror(pool, 4)
    # the antipodal point's local density is ~1000x sparser than its
    # neighbors' — LOF separates it by orders of magnitude
    assert got[99][1] > 100 and got[99][2] is True
    inlier_lofs = [got[i][1] for i in range(20)]
    assert max(inlier_lofs) < 2.0


def test_lof_duplicate_collapse_nulls(spark):
    from corpusama_spark.operators.similarity import lof_scores

    rng = np.random.RandomState(9)
    v = rng.randn(6)
    pool = {i: v.copy() for i in range(7)}  # 7 exact dups > k
    pool.update({100 + i: rng.randn(6) for i in range(6)})
    got = {
        r.vec_id: (r.lrd, r.lof) for r in lof_scores(_df(spark, pool), k=5).collect()
    }
    for i in range(7):
        assert got[i] == (None, None)
    assert got == {p: (r[0], r[1]) for p, r in _mirror(pool, 5).items()}


def test_lof_graph_input_identity(spark):
    from corpusama_spark.operators.similarity import (
        brute_force_topk,
        lof_scores,
    )

    rng = np.random.RandomState(3)
    pool = {i: rng.randn(10) for i in range(25)}
    df = _df(spark, pool)
    g = brute_force_topk(df, df, k=6)
    a = sorted(map(tuple, lof_scores(df, k=6).collect()))
    b = sorted(map(tuple, lof_scores(df, k=6, graph=g).collect()))
    assert a == b and len(a) == 25
