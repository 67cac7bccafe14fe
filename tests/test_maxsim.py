"""Late-interaction MaxSim retrieval (X256): numpy mirror of the
sum-of-per-term-max-cosine score, self-retrieval wins, tie-break
determinism, zero-vector tolerance, k bound."""

import numpy as np


def _units(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, unit_id long, vec array<double>"
    )


def _mirror(qs, ds):
    """score[q][d] = sum over q terms of max over d units of cosine."""
    out = {}
    for qid, terms in qs.items():
        for did, units in ds.items():
            s = 0.0
            for t in terms:
                tn = np.linalg.norm(t)
                cs = []
                for u in units:
                    un = np.linalg.norm(u)
                    c = float(t @ u / (tn * un)) if tn > 0 and un > 0 else 0.0
                    cs.append(round(c, 6))
                s += max(cs)
            out[(qid, did)] = round(s, 6)
    return out


def test_maxsim_matches_numpy_mirror_and_ranks(spark):
    from corpusama_spark.operators.ranking import maxsim_topk

    rng = np.random.default_rng(7)
    ds = {d: [rng.normal(size=6) for _ in range(3)] for d in range(6)}
    qs = {0: ds[2], 1: [rng.normal(size=6) for _ in range(2)]}
    doc_units = _units(
        spark,
        [(d, i, [float(x) for x in v]) for d, us in ds.items() for i, v in enumerate(us)],
    )
    query_units = spark.createDataFrame(
        [(q, i, [float(x) for x in v]) for q, us in qs.items() for i, v in enumerate(us)],
        "query_id long, term_id long, vec array<double>",
    )
    got = maxsim_topk(doc_units, query_units, k=6).collect()
    mirror = _mirror(qs, ds)
    for r in got:
        assert abs(mirror[(r.query_id, r.doc_id)] - r.maxsim) < 2e-6
    # query 0 IS doc 2's unit set -> doc 2 must rank first (each term's
    # best match is itself, cosine 1)
    top0 = [r for r in got if r.query_id == 0 and r.rank == 1][0]
    assert top0.doc_id == 2 and abs(top0.maxsim - 3.0) < 1e-6
    # ranks are 1..k dense per query
    for q in (0, 1):
        assert [r.rank for r in got if r.query_id == q] == list(range(1, 7))


def test_zero_vectors_and_tie_break(spark):
    from corpusama_spark.operators.ranking import maxsim_topk

    # two identical docs -> tie broken by ascending doc_id
    doc_units = _units(
        spark,
        [(1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.0]), (3, 0, [0.0, 0.0])],
    )
    queries = spark.createDataFrame(
        [(0, 0, [1.0, 0.0])], "query_id long, term_id long, vec array<double>"
    )
    got = maxsim_topk(doc_units, queries, k=3).collect()
    assert [(r.doc_id, r.rank) for r in got] == [(1, 1), (2, 2), (3, 3)]
    # the all-zero doc scores 0, not NaN/NULL
    assert got[-1].maxsim == 0.0
