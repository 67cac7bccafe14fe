"""Deterministic sketches (Count-Min, HyperLogLog) and relational
k-means."""

import math

from pyspark.sql import functions as F


def test_cms_never_underestimates_and_matches_exact_when_sparse(spark):
    from corpusama_spark.operators.sketches import cms_heavy_hitters

    # tiny vocabulary in a wide sketch: collisions are unlikely, so the
    # invariant est >= exact holds and most rows have est == exact
    docs = spark.createDataFrame(
        [(i, "alpha beta " * (i % 3 + 1) + "gamma") for i in range(60)],
        "doc_id long, text string",
    )
    out = cms_heavy_hitters(docs, "text", depth=4, width=256, k=10).collect()
    assert len(out) == 3  # alpha, beta, gamma
    by = {r.tok: r for r in out}
    assert by["alpha"].exact == sum(i % 3 + 1 for i in range(60))
    for r in out:
        assert r.est >= r.exact and r.overestimate == r.est - r.exact
    # rows come back ranked by exact desc
    assert [r.exact for r in out] == sorted(
        (r.exact for r in out), reverse=True
    )


def test_cms_collision_overestimates(spark):
    from corpusama_spark.operators.sketches import cms_heavy_hitters

    # width=1: every token collides in every row -> est = total tokens
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "c d")], "doc_id long, text string"
    )
    out = {r.tok: r for r in cms_heavy_hitters(
        docs, "text", depth=2, width=1, k=10).collect()}
    assert all(r.est == 6 for r in out.values())
    assert out["a"].overestimate == 3


def test_hll_small_range_is_exact_linear_counting(spark):
    from corpusama_spark.operators.sketches import hll_distinct

    # 3 distinct keys, m=64 registers -> linear counting regime;
    # m*ln(m/(m-3)) ~ 3.07 -> small relative error
    rows = [(i, "t", i % 3) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, grp string, user long")
    r = hll_distinct(df, "grp", "user", p=6).collect()[0]
    assert r.n_exact == 3
    assert bool(r.linear_counting) is True
    assert abs(r.hll_est - 3.0) < 0.2
    assert r.n_zero_regs >= 61


def test_hll_estimate_within_expected_error(spark):
    from corpusama_spark.operators.sketches import hll_distinct

    # 5000 distinct keys at m=64: 1.04/sqrt(64) = 13% typical error;
    # allow 3 sigma
    rows = [(i, "t", i) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, grp string, user long")
    r = hll_distinct(df, "grp", "user", p=6).collect()[0]
    assert r.n_exact == 5000
    assert r.rel_err < 0.40
    # duplicate-heavy input must give the SAME estimate (set semantics)
    dup = spark.createDataFrame(
        [(j, "t", j % 5000) for j in range(20000)],
        "id long, grp string, user long",
    )
    r2 = hll_distinct(dup, "grp", "user", p=6).collect()[0]
    assert r2.hll_est == r.hll_est


def test_kmeans_separable_clusters_and_determinism(spark):
    from corpusama_spark.operators.kmeans import kmeans_assign

    # two tight blobs in 4-d; k=2 must separate them whatever the init
    rows = []
    for i in range(20):
        rows.append((i, [0.0 + i * 0.001, 0.0, 0.0, 0.0]))
    for i in range(20):
        rows.append((100 + i, [10.0 + i * 0.001, 10.0, 10.0, 10.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(df, k=2, iters=2).collect()
    lo = {r.cluster for r in out if r.vec_id < 100}
    hi = {r.cluster for r in out if r.vec_id >= 100}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi
    # partitioning must not change the result
    out2 = kmeans_assign(df.repartition(7), k=2, iters=2).collect()
    assert sorted((r.vec_id, r.cluster, r.d2) for r in out) == sorted(
        (r.vec_id, r.cluster, r.d2) for r in out2
    )


def test_kmeans_d2_is_distance_to_assigned_centroid(spark):
    from corpusama_spark.operators.kmeans import kmeans_assign

    rows = [
        (1, [0.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [10.0, 10.0]),
        (4, [11.0, 10.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in kmeans_assign(df, k=2, iters=2).collect()}
    # init: c0=(0,0) [vec 1], c1=(1,0) [vec 2]; iter-1 assigns vec 2,3,4
    # to c1, update -> c0=(0,0), c1=(22/3, 20/3) rounded to 6dp; the
    # FINAL assignment and its reported d2 are vs THOSE centroids
    c1 = (7.333333, 6.666667)
    assert out[1].d2 == 0.0
    assert out[2].d2 == 1.0
    assert out[3].d2 == round(
        round((10 - c1[0]) ** 2 + (10 - c1[1]) ** 2, 6), 4
    )
    assert out[4].d2 == round(
        round((11 - c1[0]) ** 2 + (10 - c1[1]) ** 2, 6), 4
    )
    assert out[1].cluster == out[2].cluster
    assert out[3].cluster == out[4].cluster
    assert out[1].cluster != out[3].cluster


def test_sketch_kmeans_queries_plan_clean(spark):
    import __spark_entry__ as e
    from corpusama_spark.session import assert_no_row_python

    for name in ("cms_topk", "hll_audit", "kmeans_clusters"):
        assert_no_row_python(
            e.queries()[name](spark, "/root/testdata/sf0.001")
        )
