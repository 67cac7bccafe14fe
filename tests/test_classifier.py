"""Naive-Bayes quality classifier (operators/classifier.py): Python-
recomputed parity, pruning semantics, seed separation, plan shape."""

import math

from pyspark.sql import functions as F

from corpusama_spark.plans.audit import report

GOOD = {1: "clean prose reads well and informs", 2: "clean prose informs readers"}
BAD = {3: "buy buy cheap cheap pills pills", 4: "cheap pills click here"}
MIXED = {
    5: "clean prose with pills",
    6: "totally novel vocabulary entirely",
    7: "",
}


def _expected(k: float = 0.5):
    def toks(d):
        return [t for t in d.lower().split() if t]

    cg: dict[str, int] = {}
    cb: dict[str, int] = {}
    for t in (tok for d in GOOD.values() for tok in toks(d)):
        cg[t] = cg.get(t, 0) + 1
    for t in (tok for d in BAD.values() for tok in toks(d)):
        cb[t] = cb.get(t, 0) + 1
    vocab = set(cg) | set(cb)
    ng, nb, v = sum(cg.values()), sum(cb.values()), len(vocab)

    def w(t):
        return math.log((cg.get(t, 0) + k) / (ng + k * v)) - math.log(
            (cb.get(t, 0) + k) / (nb + k * v)
        )

    out = {}
    for did, d in {**GOOD, **BAD, **MIXED}.items():
        ts = toks(d)
        if not ts:
            continue
        s = round(sum(w(t) for t in ts), 6)
        out[did] = (len(ts), s, s >= 0.0)
    return out


def _docs(spark):
    rows = [(d, t, "g" if d in GOOD else "b" if d in BAD else "m")
            for d, t in {**GOOD, **BAD, **MIXED}.items()]
    return spark.createDataFrame(rows, "doc_id long, text string, grp string")


def test_nb_matches_python_and_separates(spark):
    from corpusama_spark.operators.classifier import quality_classifier

    got = {
        r.doc_id: (r.n_tokens, r.nb_score, r.keep)
        for r in quality_classifier(
            _docs(spark), F.col("grp") == "g", F.col("grp") == "b"
        ).collect()
    }
    assert got == _expected()
    # seeds score on their own side of the gate; all-novel text is neutral
    assert all(got[d][2] for d in GOOD) and not any(got[d][2] for d in BAD)
    assert abs(got[6][1]) < 1e-9  # every-token-unseen -> symmetric floor


def test_nb_pruning_floor_consistency(spark):
    """min_count=1 pruning is a no-op; aggressive pruning only moves
    pruned tokens to the unseen floor (totals computed pre-prune)."""
    from corpusama_spark.operators.classifier import (
        prune_model,
        score_naive_bayes,
        train_token_logodds,
    )

    docs = _docs(spark)
    good, bad = docs.where(F.col("grp") == "g"), docs.where(F.col("grp") == "b")
    model, totals = train_token_logodds(good, bad)
    base = {r.doc_id: r.nb_score
            for r in score_naive_bayes(docs, model, totals).collect()}
    noop = {r.doc_id: r.nb_score
            for r in score_naive_bayes(docs, prune_model(model, 1), totals).collect()}
    assert base == noop
    pruned = {r.doc_id: r.nb_score
              for r in score_naive_bayes(docs, prune_model(model, 2), totals).collect()}
    # repeated seed tokens survive pruning, so seed docs keep a signal
    assert set(pruned) == set(base)
    assert pruned[1] != base[1]  # singletons fell to the floor -> score moved


def test_nb_plan_broadcast_and_jvm(spark):
    from corpusama_spark.operators.classifier import quality_classifier

    out = quality_classifier(
        _docs(spark), F.col("grp") == "g", F.col("grp") == "b"
    )
    rep = report(out)
    rep.assert_no_row_python()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_calibration_bins_rates_and_edges(spark):
    from pyspark.sql import functions as F
    from corpusama_spark.operators.classifier import calibration_bins

    rows = [(0.05, False), (0.05, False), (0.15, True), (0.95, True),
            (1.0, True),  # score exactly 1.0 must clamp into the top bin
            (0.95, False)]
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = {r.bin: r for r in
           calibration_bins(df, "score", "y", bins=10).collect()}
    assert out[0].n == 2 and out[0].pos_rate == 0.0
    assert out[1].n == 1 and out[1].pos_rate == 1.0
    assert out[9].n == 3 and out[9].n_pos == 2
    assert out[9].pos_rate == round(2 / 3, 6)
    assert set(out) == {0, 1, 9}


def test_auc_perfect_random_and_ties(spark):
    from corpusama_spark.operators.classifier import auc_score

    # perfectly separating score -> AUC 1.0
    perfect = spark.createDataFrame(
        [(0.1, False), (0.2, False), (0.8, True), (0.9, True)],
        "score double, y boolean",
    )
    assert auc_score(perfect, "score", "y").collect()[0].auc == 1.0
    # all scores tied -> midranks make AUC exactly 0.5
    tied = spark.createDataFrame(
        [(0.5, lbl) for lbl in (True, False, True, False, False)],
        "score double, y boolean",
    )
    r = auc_score(tied, "score", "y").collect()[0]
    assert r.auc == 0.5 and r.n_pos == 2 and r.n_neg == 3
    # hand-checked mixed case: scores .1(+) .2(-) .3(+) .4(-) ->
    # pos ranks {1,3}, U = 4-... AUC = (1*0 + 1*1)/ (2*2)? compute: 0.5
    mixed = spark.createDataFrame(
        [(0.1, True), (0.2, False), (0.3, True), (0.4, False)],
        "score double, y boolean",
    )
    assert auc_score(mixed, "score", "y").collect()[0].auc == 0.25


def test_pr_curve_monotone_recall_and_vacuous_guard(spark):
    from corpusama_spark.operators.classifier import pr_curve

    rows = [(i / 20.0, i >= 12) for i in range(20)]  # top 8 scores positive
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = pr_curve(df, "score", "y", n_thresholds=9).collect()
    recalls = [r.recall for r in out]
    assert recalls == sorted(recalls, reverse=True)  # recall never rises with t
    # at t=0.5, predicted = scores >= 0.5 (10 rows), tp = 8
    at5 = [r for r in out if abs(r.t - 0.5) < 1e-9][0]
    assert at5.tp == 8 and at5.n_pred == 10 and at5.precision == 0.8
    assert at5.recall == 1.0
    # everything above max score -> vacuous: all-zero, never NULL
    hi = pr_curve(spark.createDataFrame([(0.01, True)], "score double, y boolean"),
                  "score", "y", n_thresholds=3).collect()
    assert all(r.precision == 0.0 and r.f1 == 0.0 for r in hi)
