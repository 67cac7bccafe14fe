"""Dim-truncation retrieval audit (X223): full-width self-check = recall
1.0, monotone-ish degradation, numpy mirror of the recall numbers."""

import numpy as np


def _df(spark, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _topk(vecs, qids, d, k):
    out = {}
    for q in qids:
        qv = vecs[q][:d]
        scored = sorted(
            (
                (
                    -round(
                        float(
                            np.dot(qv, vecs[c][:d])
                            / (
                                np.linalg.norm(qv)
                                * np.linalg.norm(vecs[c][:d])
                            )
                        ),
                        6,
                    ),
                    c,
                )
                for c in range(len(vecs))
                if c != q
            ),
        )[:k]
        out[q] = {c for _, c in scored}
    return out


def test_dim_truncation_audit(spark):
    from corpusama_spark.operators.similarity import dim_truncation_audit

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 24)
    df = _df(spark, vecs)
    q = df.where("vec_id < 20")
    rows = {
        r.d: r
        for r in dim_truncation_audit(
            df, q, dims=(4, 12, 24), k=4
        ).collect()
    }
    assert set(rows) == {4, 12, 24}
    # full width reproduces truth exactly
    assert rows[24].mean_recall == 1.0
    assert rows[24].n_queries == 20 and rows[24].k == 4
    # numpy mirror for each width
    qids = range(20)
    full = _topk(vecs, qids, 24, 4)
    for d in (4, 12):
        tr = _topk(vecs, qids, d, 4)
        exp = round(
            sum(len(full[q] & tr[q]) for q in qids) / (4.0 * 20), 6
        )
        assert rows[d].mean_recall == exp, d
    # a 4-dim prefix of random 24-dim vectors cannot be perfect
    assert rows[4].mean_recall < rows[24].mean_recall
