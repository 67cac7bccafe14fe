"""k-means quality rollup, label-centroid similarity, Hill diversity."""

import math


def test_kmeans_quality_shares_and_inertia(spark):
    from corpusama_spark.operators.kmeans import kmeans_assign, kmeans_quality

    rows = [(i, [float(i % 2) * 10, 0.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = kmeans_quality(df, k=2, iters=2).collect()
    assert [r.cluster for r in q] == [0, 1]
    assert sum(r.n for r in q) == 40
    assert abs(sum(r.share for r in q) - 1.0) < 1e-9
    # perfect separation: both clusters collapse to their centroid
    assert all(r.inertia == 0.0 and r.mean_d2 == 0.0 for r in q)
    # consistency with the raw assignment
    a = kmeans_assign(df, k=2, iters=2).collect()
    by = {}
    for r in a:
        by[r.cluster] = by.get(r.cluster, 0) + 1
    assert {r.cluster: r.n for r in q} == by


def test_label_centroid_similarity_geometry(spark):
    from corpusama_spark.operators.similarity import (
        label_centroid_similarity,
    )

    rows = (
        [(i, [1.0, 0.0], 0) for i in range(5)]       # centroid (1,0)
        + [(10 + i, [0.0, 1.0], 1) for i in range(5)]  # centroid (0,1)
        + [(20 + i, [2.0, 0.0], 2) for i in range(5)]  # colinear with 0
    )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {(r.lab_a, r.lab_b): r.cosine
           for r in label_centroid_similarity(df).collect()}
    assert out[(0, 1)] == 0.0   # orthogonal
    assert out[(0, 2)] == 1.0   # colinear
    assert out[(1, 2)] == 0.0
    assert len(out) == 3        # each unordered pair once


def test_hill_diversity_uniform_and_skewed(spark):
    from corpusama_spark.operators.skew import hill_diversity

    df = spark.createDataFrame(
        [
            (1, "u", "a b c d"),          # uniform over 4 types
            (2, "s", "x x x x x x x y"),  # 8 tokens: 7 x + 1 y... no: 7+1
        ],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in hill_diversity(df, "source", "text").collect()}
    u = out["u"]
    # uniform: all three Hill numbers equal the type count
    assert u.hill0 == 4 and u.hill1 == 4.0 and u.hill2 == 4.0
    s = out["s"]
    assert s.hill0 == 2 and s.n_tokens == 8
    # skewed: 1 = hill2 <= hill1 <= hill0 strictly ordered here
    p = [7 / 8, 1 / 8]
    h1 = math.exp(-sum(x * math.log(x) for x in p))
    h2 = 1.0 / sum(x * x for x in p)
    assert abs(s.hill1 - round(h1, 6)) < 1e-9
    assert abs(s.hill2 - round(h2, 6)) < 1e-9
    assert s.hill2 < s.hill1 < s.hill0


def test_cartography_queries_plan_clean(spark):
    import __spark_entry__ as e
    from corpusama_spark.session import assert_no_row_python

    for name in ("kmeans_quality", "label_centroid_sim", "hill_diversity"):
        assert_no_row_python(
            e.queries()[name](spark, "/root/testdata/sf0.001")
        )


def test_cooc_triangles_hand_graph(spark):
    from corpusama_spark.operators.components import cooccurrence_triangles

    # 3 docs all containing {a,b,c} -> triangle abc; d attaches to a,b only
    docs = [
        (1, "a b c d"),
        (2, "a b c d"),
        (3, "a b c d"),
        (4, "e f"),  # below min_cooc, never edges
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = cooccurrence_triangles(
        df, "text", "doc_id", top_tokens=10, min_cooc=3
    ).collect()[0]
    # nodes a,b,c,d fully connected (all pairs share 3 docs): K4
    assert r.n_nodes == 4 and r.n_edges == 6
    assert r.n_triangles == 4  # K4 has C(4,3) triangles
    # K4: every open triad closes -> clustering coefficient 1
    assert r.clustering_coeff == 1.0


def test_cooc_triangles_triangle_free(spark):
    from corpusama_spark.operators.components import cooccurrence_triangles

    # star graph: hub h co-occurs with x,y,z pairwise-disjoint docs
    docs = (
        [(i, "h x") for i in range(3)]
        + [(10 + i, "h y") for i in range(3)]
        + [(20 + i, "h z") for i in range(3)]
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = cooccurrence_triangles(
        df, "text", "doc_id", top_tokens=10, min_cooc=3
    ).collect()[0]
    assert r.n_edges == 3 and r.n_triangles == 0
    assert r.clustering_coeff == 0.0


def test_cooc_triangles_query_plan_clean(spark):
    import __spark_entry__ as e
    from corpusama_spark.session import assert_no_row_python

    assert_no_row_python(
        e.queries()["cooc_triangles"](spark, "/root/testdata/sf0.001")
    )
