"""Bucket occupancy histogram, near-dup caption divergence, k-NN
hubness, label cohesion."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_bucket_size_histogram_counts_and_cumulative(spark):
    from corpusama_spark.operators.skew import bucket_size_histogram

    # buckets: a->4 rows, b->2, c->2, d->1, e->1  (10 rows total)
    rows = (["a"] * 4 + ["b"] * 2 + ["c"] * 2 + ["d"] + ["e"])
    df = spark.createDataFrame([(k,) for k in rows], "band string")
    out = {r.bucket_size: r for r in bucket_size_histogram(df, ["band"]).collect()}
    assert out[4].n_buckets == 1 and out[4].n_rows == 4
    assert out[2].n_buckets == 2 and out[2].n_rows == 4
    assert out[1].n_buckets == 2 and out[1].n_rows == 2
    assert out[4].row_share == 0.4
    # cumulative from the LARGEST buckets down
    assert out[4].row_share_cum == 0.4
    assert out[2].row_share_cum == 0.8
    assert out[1].row_share_cum == 1.0


def test_bucket_size_histogram_composite_key(spark):
    from corpusama_spark.operators.skew import bucket_size_histogram

    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "x")], "band int, salt string"
    )
    out = {r.bucket_size: r.n_buckets
           for r in bucket_size_histogram(df, ["band", "salt"]).collect()}
    assert out == {2: 1, 1: 2}


def test_near_dup_caption_divergence_flags(spark):
    from corpusama_spark.operators.dedup import near_dup_caption_divergence

    pop = spark.createDataFrame(
        [
            (1, 0b1010100),
            (2, 0b1010100),      # identical to 1 (hamming 0)
            (3, 0b1110000),
            (4, 0b1110001),      # 1 bit from 3
            (5, 0x0F0F0F0F0F),   # far from everything
        ],
        "id long, code long",
    )
    docs = spark.createDataFrame(
        [
            (1, "a red cat on grass"),
            (2, "totally unrelated caption words"),
            (3, "blue sky over hills"),
            (4, "blue sky over hills"),
            (5, "whatever"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b): r
        for r in near_dup_caption_divergence(
            pop, docs, "text", "doc_id", bands=4, hamming_k=3, tau=0.5
        ).collect()
    }
    assert (1, 2) in out and out[(1, 2)].hamming == 0
    assert out[(1, 2)].caption_jaccard == 0.0 and out[(1, 2)].divergent
    assert (3, 4) in out and out[(3, 4)].hamming == 1
    assert out[(3, 4)].caption_jaccard == 1.0 and not out[(3, 4)].divergent
    assert not any(5 in p for p in out)


def test_knn_hubness_degrees_and_zero(spark):
    from corpusama_spark.operators.similarity import knn_hubness

    # 1D-ish geometry in 2D: hub at origin-ish; vec 9 far away cited by nobody
    vecs = {
        0: [1.0, 0.0],
        1: [0.9, 0.1],
        2: [0.8, 0.2],
        3: [0.7, 0.3],
        9: [-1.0, 0.0],
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = knn_hubness(df, k=1).collect()
    hist = {r.in_degree: r.n_vectors for r in out}
    # each vector cites exactly 1 neighbor -> 5 citations total
    assert sum(d * n for d, n in hist.items()) == 5
    assert sum(hist.values()) == 5
    # vec 9's nearest is someone, but nobody's nearest is 9 -> a zero-degree row exists
    assert hist.get(0, 0) >= 1
    shares = {r.in_degree: r.citation_share for r in out}
    assert shares.get(0, 0.0) == 0.0


def test_knn_hubness_accepts_precomputed_graph(spark):
    from corpusama_spark.operators.similarity import knn_hubness

    emb = spark.createDataFrame(
        [(i, [float(i)]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    graph = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1), (2, 1, 1), (3, 1, 1)],
        "query_id long, cand_id long, rank int",
    )
    out = {r.in_degree: r.n_vectors for r in knn_hubness(emb, k=1, graph=graph).collect()}
    # vec 1 cited 3x; vec 0 once; vecs 2,3 zero
    assert out == {0: 2, 1: 1, 3: 1}


def test_label_cohesion_separated_clusters(spark):
    from corpusama_spark.operators.similarity import label_cohesion

    rng = np.random.default_rng(5)
    rows = []
    vid = 0
    # label 0 tight around +x, label 1 tight around +y, label 2 NEAR label 0
    centers = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.9, 0.1, 0.0]}
    for lab, c in centers.items():
        for _ in range(20):
            v = np.array(c) + rng.normal(scale=0.05, size=3)
            rows.append((vid, lab, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {r.label: r for r in label_cohesion(df, "label", "embedding").collect()}
    assert all(out[lab].n_members == 20 for lab in (0, 1, 2))
    # tight clusters: members hug their centroid
    assert all(out[lab].cohesion > 0.99 for lab in (0, 1, 2))
    # 0 and 2 are each other's confusable neighbors
    assert out[0].nearest_label == 2 and out[2].nearest_label == 0
    assert out[1].nearest_cos < out[0].nearest_cos
    for lab in (0, 1, 2):
        assert abs(out[lab].margin - round(out[lab].cohesion - out[lab].nearest_cos, 6)) < 1e-9


def test_label_cohesion_margin_detects_overlap(spark):
    from corpusama_spark.operators.similarity import label_cohesion

    # two labels sampled from the SAME blob: margin collapses toward zero
    rng = np.random.default_rng(9)
    rows = []
    for i in range(40):
        v = np.array([1.0, 0.0]) + rng.normal(scale=0.05, size=2)
        rows.append((i, i % 2, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {r.label: r for r in label_cohesion(df, "label", "embedding").collect()}
    assert out[0].margin < 0.01 and out[1].margin < 0.01
