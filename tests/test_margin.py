"""Margin-based parallel-pair mining (X213): numpy mirror parity,
precomputed-ANN-graph path identity, mutual-nearest flag semantics."""

import numpy as np


def _mirror(src, tgt, k, threshold):
    """Exact python mirror of margin_pairs incl. every rounding point."""

    def cos6(a, b):
        c = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        return round(c, 6)

    def topk(queries, corpus, kk):
        out = {}
        for qid, qv in queries.items():
            scored = sorted(
                ((cos6(qv, cv), cid) for cid, cv in corpus.items()),
                key=lambda t: (-t[0], t[1]),
            )[:kk]
            out[qid] = scored  # list of (cos, cand_id)
        return out

    fwd = topk(src, tgt, k)
    bwd = topk(tgt, src, k)

    def pen(lst):  # integer micro-cos sum, exactly like the operator
        return sum(int(round(c * 1_000_000.0)) for c, _ in lst) / 1_000_000.0 / len(lst)

    fa = {q: pen(lst) for q, lst in fwd.items()}
    ba = {q: pen(lst) for q, lst in bwd.items()}
    back_best = {q: lst[0][1] for q, lst in bwd.items()}
    rows = []
    for sid, lst in fwd.items():
        cands = sorted(
            (
                (round(c / ((fa[sid] + ba[tid]) / 2.0), 6), tid, c)
                for c, tid in lst
            ),
            key=lambda t: (-t[0], t[1]),
        )
        m, tid, c = cands[0]
        if m >= threshold:
            rows.append((sid, tid, c, m, back_best[tid] == sid))
    return sorted(rows)


def _pools(n=32, dim=12, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim)
    src = {i: vecs[i] for i in range(0, n, 2)}
    tgt = {i: vecs[i] for i in range(1, n, 2)}
    return src, tgt


def _df(spark, pool):
    rows = [(int(i), [float(x) for x in v]) for i, v in sorted(pool.items())]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_margin_pairs_numpy_mirror(spark):
    from corpusama_spark.operators.similarity import margin_pairs

    src, tgt = _pools()
    got = sorted(
        tuple(r)
        for r in margin_pairs(
            _df(spark, src), _df(spark, tgt), k=3, threshold=-10.0
        ).collect()
    )
    assert got == _mirror(src, tgt, 3, -10.0)
    # the threshold actually gates: at a high bar, output is the
    # mirror's filtered subset (and strictly smaller here)
    hi = sorted(
        tuple(r)
        for r in margin_pairs(
            _df(spark, src), _df(spark, tgt), k=3, threshold=1.02
        ).collect()
    )
    assert hi == _mirror(src, tgt, 3, 1.02)
    assert len(hi) < len(got)


def test_margin_pairs_graph_input_identity(spark):
    from corpusama_spark.operators.similarity import (
        brute_force_topk,
        margin_pairs,
    )

    src, tgt = _pools(n=24, seed=11)
    sdf, tdf = _df(spark, src), _df(spark, tgt)
    fwd = brute_force_topk(tdf, sdf, k=4)
    bwd = brute_force_topk(sdf, tdf, k=4)
    a = sorted(map(tuple, margin_pairs(sdf, tdf, k=4, threshold=0.0).collect()))
    b = sorted(
        map(
            tuple,
            margin_pairs(
                sdf, tdf, k=4, threshold=0.0, fwd_graph=fwd, bwd_graph=bwd
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_margin_pairs_mutual_flag_and_hub_suppression(spark):
    from corpusama_spark.operators.similarity import margin_pairs

    # src 0 and tgt 1 are near-identical (mutual); tgt 3 is a "hub"
    # pointing halfway between everything so raw cosine likes it but its
    # backward neighborhood mean is high, crushing its margin.
    src = {0: np.array([1.0, 0.0, 0.0]), 2: np.array([0.0, 1.0, 0.0])}
    tgt = {
        1: np.array([0.99, 0.01, 0.0]),
        3: np.array([0.6, 0.6, 0.1]),
        5: np.array([0.0, 0.98, 0.05]),
    }
    out = {
        r.src_id: r
        for r in margin_pairs(
            _df(spark, src), _df(spark, tgt), k=2, threshold=-10.0
        ).collect()
    }
    assert out[0].tgt_id == 1 and out[0].mutual
    assert out[2].tgt_id == 5 and out[2].mutual
    # the hub is never anyone's mined pair despite decent raw cosine
    assert all(r.tgt_id != 3 for r in out.values())
