"""Product quantization (operators/pq.py): numpy-mirror parity for the
deterministic train→encode→ADC pipeline, plus the structural invariants
that make the layout a real 10^12-scale index (m codes per vector,
codes bounded by k, ADC ranking correlates with true distance)."""

import numpy as np
from pyspark.sql import functions as F


def _vectors(n=40, d=8, seed=3):
    rng = np.random.RandomState(seed)
    # two separated blobs so clustering is non-degenerate
    base = rng.randn(n, d) * 0.3
    base[n // 2 :] += 2.0
    return np.round(base, 3)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _np_pq(vecs, m, k, iters):
    """Mirror of pq_codebook/pq_codes: per-subspace Lloyd, lowest-id
    init, 6-dp pins, (d2, cluster) tie-break."""
    n, d = vecs.shape
    dsub = d // m
    X = vecs.astype(np.float64)
    codebooks = []
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        cents = np.round(sub[:k].copy(), 6)
        for _ in range(iters):
            d2 = np.round(
                ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 6
            )
            assign = d2.argmin(axis=1)  # argmin takes lowest index on ties
            # the mirror assumes every cluster survives each update (true
            # for the fixtures below; the Spark side handles death fine)
            assert all((assign == c).any() for c in range(k))
            cents = np.stack(
                [np.round(sub[assign == c].mean(axis=0), 6) for c in range(k)]
            )
        codebooks.append({c: cents[c] for c in range(k)})
    codes = np.zeros((n, m), dtype=int)
    resid = np.zeros((n, m))
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        cids = sorted(codebooks[s])
        C = np.stack([codebooks[s][c] for c in cids])
        d2 = np.round(((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
        best = d2.argmin(axis=1)
        codes[:, s] = [cids[b] for b in best]
        resid[:, s] = d2[np.arange(n), best]
    return codebooks, codes, np.round(resid, 6)


def test_pq_codes_match_numpy_mirror(spark):
    from corpusama_spark.operators.pq import pq_codes

    vecs = _vectors()
    _, codes_np, resid_np = _np_pq(vecs, m=2, k=3, iters=2)
    out = pq_codes(_df(spark, vecs), m=2, k=3, iters=2).collect()
    assert len(out) == len(vecs) * 2  # m rows per vector
    for r in out:
        assert 0 <= r.code < 3
        assert r.code == codes_np[r.vec_id][r.sub]
        # Spark rounds decimal-HALF_UP, numpy half-even: exact .5 at the
        # 6th decimal may differ by one ulp-of-1e-6 — codes stay exact
        assert abs(r.d2 - np.round(resid_np[r.vec_id][r.sub], 6)) < 1.1e-6


def test_pq_topk_ranks_by_lut_sums_and_beats_random(spark):
    from corpusama_spark.operators.pq import pq_topk

    vecs = _vectors(n=60, d=8, seed=7)
    df = _df(spark, vecs)
    out = pq_topk(df, df.where(F.col("vec_id") < 4), m=2, k=4, iters=2, topk=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    X = vecs.astype(np.float64)
    for q, cands in by_q.items():
        cands.sort(key=lambda r: r.rnk)
        # ranks contiguous, distances non-decreasing, never self
        assert [r.rnk for r in cands] == list(range(1, len(cands) + 1))
        d = [r.adc_d2 for r in cands]
        assert d == sorted(d)
        assert all(r.cand_id != q for r in cands)
        # ADC retrieval is meaningful: every returned candidate sits in
        # the query's blob (true squared distance far below cross-blob)
        true_d2 = ((X - X[q]) ** 2).sum(axis=1)
        cross = np.median(true_d2)  # halfway point between blobs
        assert all(true_d2[r.cand_id] < cross for r in cands)


def test_pq_requires_divisible_dim(spark):
    import pytest

    from corpusama_spark.operators.pq import pq_codebook

    df = _df(spark, _vectors(n=10, d=8))
    with pytest.raises(ValueError):
        pq_codebook(df, m=3)
