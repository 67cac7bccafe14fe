"""IVFADC (operators/pq.py ivfpq_topk): full numpy-mirror parity of the
coarse-train -> residual-PQ -> probe -> ADC pipeline, plus the structural
invariants that make it an inverted-list index (candidates only from
probed cells, nprobe monotonicity, cache hygiene)."""

import numpy as np
from pyspark.sql import functions as F

from tests.test_pq import _df, _vectors


def _np_ivfpq(vecs, qids, kc, citers, m, k, iters, nprobe, topk):
    """Mirror of ivf_coarse + ivfpq_topk: 6-dp pins, lowest-index ties."""
    X = vecs.astype(np.float64)
    n, d = X.shape
    dsub = d // m
    # coarse Lloyd, lowest-id init, final re-assignment
    cents = np.round(X[:kc].copy(), 6)
    for _ in range(citers):
        d2 = np.round(((X[:, None, :] - cents[None]) ** 2).sum(2), 6)
        a = d2.argmin(1)
        assert all((a == c).any() for c in range(kc)), "degenerate fixture"
        cents = np.stack([np.round(X[a == c].mean(0), 6) for c in range(kc)])
    d2 = np.round(((X[:, None, :] - cents[None]) ** 2).sum(2), 6)
    cell = d2.argmin(1)
    R = np.round(X - cents[cell], 6)
    # residual PQ per subspace (seeds: lowest ids)
    books = []
    for s in range(m):
        sub = R[:, s * dsub : (s + 1) * dsub]
        C = np.round(sub[:k].copy(), 6)
        for _ in range(iters):
            sd2 = np.round(((sub[:, None, :] - C[None]) ** 2).sum(2), 6)
            sa = sd2.argmin(1)
            assert all((sa == c).any() for c in range(k)), "degenerate fixture"
            C = np.stack([np.round(sub[sa == c].mean(0), 6) for c in range(k)])
        books.append(C)
    codes = np.zeros((n, m), dtype=int)
    for s in range(m):
        sub = R[:, s * dsub : (s + 1) * dsub]
        sd2 = np.round(((sub[:, None, :] - books[s][None]) ** 2).sum(2), 6)
        codes[:, s] = sd2.argmin(1)
    # search
    out = {}
    for q in qids:
        qd2 = np.round(((X[q] - cents) ** 2).sum(1), 6)
        probes = sorted(range(kc), key=lambda c: (qd2[c], c))[:nprobe]
        scored = []
        for i in range(n):
            if i == q or cell[i] not in probes:
                continue
            rq = np.round(X[q] - cents[cell[i]], 6)
            adc = 0.0
            for s in range(m):
                pc = books[s][codes[i, s]]
                rqs = rq[s * dsub : (s + 1) * dsub]
                adc += np.round(((rqs - pc) ** 2).sum(), 6)
            scored.append((np.round(adc, 6), i, int(cell[i])))
        scored.sort()
        out[q] = scored[:topk]
    return out


def test_ivfpq_matches_numpy_mirror(spark):
    from corpusama_spark.operators.pq import ivfpq_topk
    from corpusama_spark.plans.caching import release

    vecs = _vectors(n=40, d=8, seed=3)  # two separated blobs
    df = _df(spark, vecs)
    got = ivfpq_topk(
        df,
        df.where(F.col("vec_id") < 4),
        kc=2,
        citers=2,
        m=2,
        k=3,
        iters=2,
        nprobe=1,
        topk=5,
    )
    rows = got.collect()
    release(got)
    want = _np_ivfpq(
        vecs, range(4), kc=2, citers=2, m=2, k=3, iters=2, nprobe=1, topk=5
    )
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(4))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(want[q]) + 1))
        for r, (adc, cand, cl) in zip(rs, want[q]):
            assert r.cand_id == cand
            assert r.cell == cl
            # Spark decimal HALF_UP vs numpy half-even: ulp-of-1e-6 slack
            assert abs(r.adc_d2 - adc) < 3.1e-6


def test_ivfpq_candidates_only_from_probed_cells(spark):
    from corpusama_spark.operators.pq import ivf_coarse, ivfpq_topk
    from corpusama_spark.plans.caching import release

    vecs = _vectors(n=40, d=8, seed=5)
    df = _df(spark, vecs)
    cents, assign = ivf_coarse(df, kc=2, citers=2)
    cell_of = {r.id: r.cell for r in assign.collect()}
    got = ivfpq_topk(
        df, df.where(F.col("vec_id") < 3), kc=2, citers=2, m=2, k=3,
        iters=2, nprobe=1, topk=50,
    )
    rows = got.collect()
    release(got)
    for r in rows:
        assert r.cand_id != r.query_id
        assert cell_of[r.cand_id] == r.cell
    # nprobe=1: exactly one distinct cell per query
    cells = {}
    for r in rows:
        cells.setdefault(r.query_id, set()).add(r.cell)
    assert all(len(s) == 1 for s in cells.values())


def test_ivfpq_nprobe_widens_candidate_set(spark):
    from corpusama_spark.operators.pq import ivfpq_topk
    from corpusama_spark.plans.caching import release

    vecs = _vectors(n=40, d=8, seed=9)
    df = _df(spark, vecs)
    q = df.where(F.col("vec_id") < 3)
    narrow = ivfpq_topk(df, q, kc=2, citers=2, m=2, k=3, iters=2,
                        nprobe=1, topk=50)
    wide = ivfpq_topk(df, q, kc=2, citers=2, m=2, k=3, iters=2,
                      nprobe=2, topk=50)
    n_rows = {(r.query_id, r.cand_id) for r in narrow.collect()}
    w_rows = {(r.query_id, r.cand_id) for r in wide.collect()}
    release(narrow)
    release(wide)
    assert n_rows < w_rows  # strictly more candidates with more probes
    # nprobe = kc covers every non-self vector
    assert len(w_rows) == 3 * 39


def test_ivfpq_deterministic_across_partitioning(spark):
    from corpusama_spark.operators.pq import ivfpq_topk
    from corpusama_spark.plans.caching import release

    vecs = _vectors(n=30, d=8, seed=11)
    a_df = _df(spark, vecs).repartition(2)
    b_df = _df(spark, vecs).repartition(13)
    outs = []
    for df in (a_df, b_df):
        got = ivfpq_topk(df, df.where(F.col("vec_id") < 2), kc=2, citers=1,
                         m=2, k=2, iters=1, nprobe=2, topk=4)
        outs.append(sorted(map(tuple, got.collect())))
        release(got)
    assert outs[0] == outs[1]
