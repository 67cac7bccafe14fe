"""X176-X180: weighted ESS audit, per-batch novelty rate, categorical
mutual information, and embedding covariance / collapse / top-PC
diagnostics — each against a hand-computable or numpy oracle."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from corpusama_spark.operators.drift import novelty_rate
from corpusama_spark.operators.embdiag import (
    embed_collapse,
    embed_covariance,
    top_principal_component,
)
from corpusama_spark.operators.stats import (
    mutual_information,
    weighted_ess,
)


# ---------------------------------------------------------------- ESS
def test_weighted_ess_known_values(spark):
    # group g: weights 1,1,1,1 -> ESS 4, ratio 1; group h: 4,0 -> ESS 4
    rows = (
        [("g", 1.0, 10.0)] * 4
        + [("h", 4.0, 2.0), ("h", 0.0, 99.0)]
        + [("h", None, 1.0), ("h", -3.0, 1.0)]  # bad weights
    )
    df = spark.createDataFrame(rows, "g string, w double, v double")
    out = {
        r["g"]: r
        for r in weighted_ess(df, "g", "w", value_col="v").collect()
    }
    assert out["g"]["n"] == 4 and out["g"]["n_bad"] == 0
    assert out["g"]["ess"] == 4.0 and out["g"]["ess_ratio"] == 1.0
    assert out["g"]["max_w_share"] == 0.25
    assert out["g"]["weighted_mean"] == 10.0
    # h: sum_w=4, sum_w2=16 -> ESS 1; one row holds all the weight
    assert out["h"]["n"] == 2 and out["h"]["n_bad"] == 2
    assert out["h"]["ess"] == 1.0
    assert out["h"]["ess_ratio"] == 0.5
    assert out["h"]["max_w_share"] == 1.0
    assert out["h"]["weighted_mean"] == 2.0


def test_weighted_ess_all_zero_weights_null_ratios(spark):
    df = spark.createDataFrame(
        [("g", 0.0), ("g", 0.0)], "g string, w double"
    )
    r = weighted_ess(df, "g", "w").collect()[0]
    assert r["n"] == 2 and r["sum_w"] == 0.0
    assert r["ess"] is None and r["max_w_share"] is None


# ----------------------------------------------------------- novelty
def test_novelty_rate_first_batch_wins(spark):
    # batch 1: keys a,b (both novel) + one dup of a (re-post)
    # batch 2: a (re-post), c (novel), NULL (excluded)
    rows = [
        (1, 1, "a"),
        (2, 1, "b"),
        (3, 1, "a"),
        (4, 2, "a"),
        (5, 2, "c"),
        (6, 2, None),
    ]
    df = spark.createDataFrame(rows, "id long, b int, k string")
    out = {r["batch"]: r for r in novelty_rate(df, "k", "b", "id").collect()}
    b1, b2 = out[1], out[2]
    assert (b1["n_rows"], b1["n_null"], b1["n_novel"], b1["n_repost"]) == (
        3, 0, 2, 1,
    )
    assert b1["novelty"] == round(2 / 3, 6)
    assert b1["distinct_cum"] == 2
    assert (b2["n_rows"], b2["n_null"], b2["n_novel"], b2["n_repost"]) == (
        3, 1, 1, 1,
    )
    assert b2["novelty"] == 0.5
    assert b2["distinct_cum"] == 3


def test_novelty_rate_all_null_batch(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (2, 2, "x")], "id long, b int, k string"
    )
    out = {r["batch"]: r for r in novelty_rate(df, "k", "b", "id").collect()}
    assert out[1]["n_novel"] == 0 and out[1]["novelty"] is None
    assert out[2]["n_novel"] == 1 and out[2]["distinct_cum"] == 1


# ------------------------------------------------- mutual information
def test_mutual_information_independent_is_zero(spark):
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["n"] == 20
    assert r["mi_nats"] == 0.0
    assert r["entropy_a"] == round(math.log(2), 6)
    assert r["u_a_given_b"] == 0.0


def test_mutual_information_deterministic_equals_entropy(spark):
    # b == a -> MI = H(a); uncertainty coefficients are 1
    rows = [("x", "x")] * 3 + [("y", "y")] * 1
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert r["mi_nats"] == round(h, 6)
    assert r["u_a_given_b"] == 1.0 and r["u_b_given_a"] == 1.0


def test_mutual_information_nulls_excluded(spark):
    rows = [("x", "u"), ("x", None), (None, "u"), ("y", "v")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["n"] == 2
    assert r["mi_nats"] == round(math.log(2), 6)


# ------------------------------------------------- embedding audits
def _emb_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )


def test_embed_covariance_matches_numpy(spark):
    rng = np.random.RandomState(7)
    mat = rng.randn(40, 5).astype("float32")
    df = _emb_df(spark, mat)
    out = embed_covariance(df, "embedding").collect()
    x = mat.astype("float64")
    ref = np.cov(x, rowvar=False, bias=True)
    assert len(out) == 5 * 6 // 2
    for r in out:
        assert r["i"] <= r["j"]
        assert r["cov"] == pytest.approx(ref[r["i"], r["j"]], abs=2e-6)


def test_embed_covariance_skips_ragged_and_null(spark):
    rows = [
        (1, [1.0, 2.0]),
        (2, [3.0, 4.0]),
        (3, None),
        (4, [9.0]),  # ragged
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["i"], r["j"]): r["cov"] for r in
           embed_covariance(df, "embedding", dim=2).collect()}
    # two clean rows [1,2],[3,4]: var=1 each, cov=1
    assert out[(0, 0)] == 1.0 and out[(1, 1)] == 1.0 and out[(0, 1)] == 1.0


def test_embed_collapse_matches_numpy(spark):
    rng = np.random.RandomState(3)
    mat = (rng.randn(60, 4) + np.array([2.0, 0, 0, 0])).astype("float32")
    df = _emb_df(spark, mat)
    r = embed_collapse(df, "embedding").collect()[0]
    x = mat.astype("float64")
    mns = (x**2).sum(axis=1).mean()
    cns = float((x.mean(axis=0) ** 2).sum())
    assert r["n"] == 60 and r["n_bad"] == 0 and r["dim"] == 4
    assert r["mean_norm_sq"] == pytest.approx(mns, abs=2e-6)
    assert r["centroid_norm_sq"] == pytest.approx(cns, abs=2e-6)
    assert r["anisotropy"] == pytest.approx(cns / mns, abs=2e-6)
    assert r["trace_cov"] == pytest.approx(
        np.cov(x, rowvar=False, bias=True).trace(), abs=2e-6
    )


def test_embed_collapse_counts_bad_rows(spark):
    rows = [(1, [1.0, 0.0]), (2, None), (3, [1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embed_collapse(df, "embedding", dim=2).collect()[0]
    assert r["n"] == 1 and r["n_bad"] == 2


def test_top_pc_matches_eigh(spark):
    rng = np.random.RandomState(11)
    # anisotropic: dim 0 has 5x the std
    mat = rng.randn(80, 6)
    mat[:, 0] *= 5
    df = _emb_df(spark, mat.astype("float32"))
    r = top_principal_component(df, "embedding", iters=100).collect()[0]
    cov = np.cov(mat.astype("float32").astype("float64"),
                 rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    lam_ref, vec_ref = w[-1], v[:, -1]
    if vec_ref[np.abs(vec_ref).argmax()] < 0:
        vec_ref = -vec_ref
    assert r["top_eigenvalue"] == pytest.approx(lam_ref, rel=1e-4)
    assert r["top_pc_var_share"] == pytest.approx(
        lam_ref / cov.trace(), rel=1e-4
    )
    assert np.allclose(np.array(r["top_pc"]), vec_ref, atol=1e-3)
    assert r["top_pc_var_share"] > 0.7  # dominated by dim 0


def test_top_pc_no_arrow_row_python_in_cov_plan(spark):
    """The covariance plan must be ArrowEvalPython/mapInPandas, never
    row-at-a-time BatchEvalPython."""
    df = _emb_df(spark, np.eye(3))
    plan = embed_covariance(df, "embedding")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BatchEvalPython" not in plan
