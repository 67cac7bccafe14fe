"""Inferential-statistics lane: Pearson matrix, Spearman, chi-square,
Welch t, vocabulary richness, Burrows' Delta."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_pearson_matrix_matches_numpy(spark):
    from corpusama_spark.operators.stats import pearson_matrix

    rng = np.random.default_rng(3)
    x = rng.normal(size=200)
    y = 2.0 * x + rng.normal(scale=0.5, size=200)
    z = rng.normal(size=200)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    out = {
        (r.metric_a, r.metric_b): (r.n, r.r)
        for r in pearson_matrix(df, ["x", "y", "z"]).collect()
    }
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    assert all(n == 200 for n, _ in out.values())
    assert abs(out[("x", "y")][1] - np.corrcoef(x, y)[0, 1]) < 1e-5
    assert abs(out[("x", "z")][1] - np.corrcoef(x, z)[0, 1]) < 1e-5
    assert abs(out[("y", "z")][1] - np.corrcoef(y, z)[0, 1]) < 1e-5


def test_pearson_matrix_pairwise_deletion_and_degenerate(spark):
    from corpusama_spark.operators.stats import pearson_matrix

    df = spark.createDataFrame(
        [
            (1.0, 2.0, 5.0),
            (2.0, 4.0, 5.0),
            (3.0, None, 5.0),
            (4.0, 8.0, 5.0),
        ],
        "x double, y double, c double",
    )
    out = {
        (r.metric_a, r.metric_b): r
        for r in pearson_matrix(df, ["x", "y", "c"]).collect()
    }
    # y null row excluded only from y's pairs
    assert out[("x", "y")].n == 3 and out[("x", "y")].r == 1.0
    assert out[("x", "c")].n == 4
    # constant column -> NULL r, not NaN / crash
    assert out[("x", "c")].r is None
    assert out[("y", "c")].r is None


def test_spearman_midranks_with_ties(spark):
    from corpusama_spark.operators.stats import spearman_by_group

    # group g: y is a noisy monotone of x with ties in both
    rows = [
        ("g", 1.0, 10.0),
        ("g", 2.0, 10.0),   # tie in y
        ("g", 2.0, 30.0),   # tie in x
        ("g", 4.0, 40.0),
        ("g", 5.0, 35.0),
        ("h", 1.0, 5.0),
        ("h", 2.0, 4.0),
        ("h", 3.0, 3.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in spearman_by_group(df, "g", "x", "y").collect()}
    assert out["h"].rho == -1.0 and out["h"].n == 3

    # midrank truth for g, computed by hand
    def midranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        ranks = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = avg
            i = j + 1
        return ranks

    xs = [r[1] for r in rows if r[0] == "g"]
    ys = [r[2] for r in rows if r[0] == "g"]
    rx, ry = midranks(xs), midranks(ys)
    want = np.corrcoef(rx, ry)[0, 1]
    assert abs(out["g"].rho - want) < 1e-6


def test_spearman_constant_metric_is_null(spark):
    from corpusama_spark.operators.stats import spearman_by_group

    df = spark.createDataFrame(
        [("g", 1.0, 7.0), ("g", 2.0, 7.0), ("g", 3.0, 7.0)],
        "g string, x double, y double",
    )
    out = spearman_by_group(df, "g", "x", "y").collect()
    assert out[0].rho is None


def test_chi2_independence_known_table(spark):
    from corpusama_spark.operators.stats import chi2_independence

    # 2x2 table: a=(10, 20), b=(20, 10) -> chi2 = 60*((10*10-20*20)^2)/(30*30*30*30)... compute directly
    rows = (
        [("s1", "keep")] * 10
        + [("s1", "drop")] * 20
        + [("s2", "keep")] * 20
        + [("s2", "drop")] * 10
    )
    df = spark.createDataFrame(rows, "src string, gate string")
    out = chi2_independence(df, "src", "gate").collect()[0]
    assert out.n == 60 and out.dof == 1
    # hand formula over the 2x2
    o = {("s1", "keep"): 10, ("s1", "drop"): 20,
         ("s2", "keep"): 20, ("s2", "drop"): 10}
    ra = {"s1": 30, "s2": 30}
    cb = {"keep": 30, "drop": 30}
    chi2 = sum(
        (o[(a, b)] - ra[a] * cb[b] / 60) ** 2 / (ra[a] * cb[b] / 60)
        for a in ra
        for b in cb
    )
    assert abs(out.chi2 - chi2) < 1e-6
    assert abs(out.cramers_v - math.sqrt(chi2 / 60)) < 1e-6


def test_chi2_zero_cells_counted(spark):
    from corpusama_spark.operators.stats import chi2_independence

    # s2 never produces 'keep': the (s2, keep) cell has o=0, e>0 and must
    # contribute e to the statistic
    rows = [("s1", "keep")] * 5 + [("s1", "drop")] * 5 + [("s2", "drop")] * 10
    df = spark.createDataFrame(rows, "src string, gate string")
    out = chi2_independence(df, "src", "gate").collect()[0]
    e = {("s1", "keep"): 10 * 5 / 20, ("s1", "drop"): 10 * 15 / 20,
         ("s2", "keep"): 10 * 5 / 20, ("s2", "drop"): 10 * 15 / 20}
    o = {("s1", "keep"): 5, ("s1", "drop"): 5,
         ("s2", "keep"): 0, ("s2", "drop"): 10}
    chi2 = sum((o[k] - e[k]) ** 2 / e[k] for k in e)
    assert abs(out.chi2 - chi2) < 1e-6


def test_welch_ttest_matches_formula(spark):
    from corpusama_spark.operators.stats import welch_ttest

    rng = np.random.default_rng(11)
    a = rng.normal(loc=5.0, scale=1.0, size=40)
    b = rng.normal(loc=5.8, scale=2.5, size=25)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    out = welch_ttest(df, "g", "v", "a", "b").collect()[0]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / 40 + vb / 25
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    wdf = se2**2 / ((va / 40) ** 2 / 39 + (vb / 25) ** 2 / 24)
    assert out.n_a == 40 and out.n_b == 25
    assert abs(out.t - t) < 1e-5
    assert abs(out.welch_df - wdf) < 1e-4
    assert abs(out.mean_a - a.mean()) < 1e-5
    assert abs(out.var_b - vb) < 1e-4


def test_welch_ttest_degenerate_null(spark):
    from corpusama_spark.operators.stats import welch_ttest

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
    )
    out = welch_ttest(df, "g", "v", "a", "b").collect()[0]
    assert out.n_a == 1 and out.t is None and out.welch_df is None


def test_vocab_richness_counts(spark):
    from corpusama_spark.operators.skew import vocab_richness

    df = spark.createDataFrame(
        [
            (1, "the cat the dog", "a"),
            (2, "the bird", "a"),
            (3, "", "b"),
            (4, None, "b"),
            (5, "one two three", "c"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in vocab_richness(df, "text", "source").collect()}
    # a: tokens [the,cat,the,dog,the,bird] -> 6 tokens, 4 types, hapax {cat,dog,bird}=3
    assert (out["a"].n_tokens, out["a"].n_types, out["a"].n_hapax) == (6, 4, 3)
    assert out["a"].ttr == round(4 / 6, 6)
    assert out["a"].hapax_share == 0.75
    # b: empty-only group still present with zeros and NULL ratios
    assert (out["b"].n_tokens, out["b"].n_types) == (0, 0)
    assert out["b"].ttr is None and out["b"].hapax_share is None
    assert (out["c"].n_tokens, out["c"].n_types, out["c"].n_hapax) == (3, 3, 3)
    assert out["c"].ttr == 1.0


def test_burrows_delta_known_grid(spark):
    from corpusama_spark.operators.colloc import burrows_delta

    # three "authors": a and b share style (similar 'the' rate), c differs
    docs = spark.createDataFrame(
        [
            (1, "a", "the the the cat sat"),
            (2, "b", "the the the dog ran"),
            (3, "c", "cat cat cat cat the"),
        ],
        "doc_id long, g string, text string",
    )
    out = {
        (r.g_a, r.g_b): r for r in burrows_delta(docs, "text", "g", top_n=2).collect()
    }
    # top-2 tokens corpus-wide: 'the' (7) and 'cat' (5)
    # relative freqs per group (5 tokens each):
    f = {"a": {"the": 0.6, "cat": 0.2}, "b": {"the": 0.6, "cat": 0.0},
         "c": {"the": 0.2, "cat": 0.8}}
    import numpy as np

    want = {}
    zs = {}
    for tok in ("the", "cat"):
        vals = np.array([f[g][tok] for g in ("a", "b", "c")])
        mu, sd = vals.mean(), vals.std()  # population
        for i, g in enumerate(("a", "b", "c")):
            zs[(g, tok)] = (vals[i] - mu) / sd
    for pair in (("a", "b"), ("a", "c"), ("b", "c")):
        want[pair] = np.mean(
            [abs(zs[(pair[0], t)] - zs[(pair[1], t)]) for t in ("the", "cat")]
        )
    for pair, r in out.items():
        assert r.n_terms == 2
        assert abs(r.delta - want[pair]) < 1e-6
    # style neighbors: a-b much closer than either to c
    assert out[("a", "b")].delta < out[("a", "c")].delta
    assert out[("a", "b")].delta < out[("b", "c")].delta


def test_burrows_delta_constant_token_excluded(spark):
    from corpusama_spark.operators.colloc import burrows_delta

    # 'x' has identical share in both groups -> sigma 0 -> excluded
    docs = spark.createDataFrame(
        [(1, "a", "x y"), (2, "b", "x z")], "doc_id long, g string, text string"
    )
    out = burrows_delta(docs, "text", "g", top_n=3).collect()
    assert len(out) == 1
    assert out[0].n_terms == 2  # y and z survive, x excluded
