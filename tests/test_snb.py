"""Sorted-neighborhood blocking (X271): window adjacency, bounded
volume, multi-pass rescues boundary-split twins, dedup across passes."""

from pyspark.sql import functions as F

from corpusama_spark.operators.fuzzy import sorted_neighborhood_pairs


def test_window_pairs_and_bounded_volume(spark):
    docs = spark.createDataFrame(
        [(i, f"{chr(97 + i)}") for i in range(6)], "doc_id long, key string"
    )
    pairs = sorted_neighborhood_pairs(docs, "key", window=3)
    got = sorted((r.id_a, r.id_b) for r in pairs.collect())
    # sorted order a..f: each id pairs with next 2
    assert got == [
        (0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5),
        (4, 5),
    ]
    # volume bound: <= n*(window-1), flood-proof by construction
    assert len(got) <= 6 * 2


def test_second_pass_rescues_prefix_corruption(spark):
    # twins "kitten photo" vs "xitten photo": the prefix sort key puts
    # them at opposite ends of the sort, a suffix key makes them
    # adjacent — the standard multi-pass rationale
    rows = [
        (0, "kitten photo"),
        (1, "xitten photo"),
        (2, "lemon tartlet"),
        (3, "mango shakes"),
        (4, "nacho platter"),
        (5, "tiger stripes"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    prefix = F.substring("text", 1, 4)
    suffix = F.substring(F.reverse(F.col("text")), 1, 6)
    one_pass = sorted_neighborhood_pairs(docs, prefix, window=2)
    assert (0, 1) not in {(r.id_a, r.id_b) for r in one_pass.collect()}
    two_pass = sorted_neighborhood_pairs(
        docs, prefix, window=2, passes=[suffix]
    )
    pairs2 = {(r.id_a, r.id_b) for r in two_pass.collect()}
    assert (0, 1) in pairs2
    # union dedups: no pair twice
    assert two_pass.count() == two_pass.dropDuplicates(["id_a", "id_b"]).count()
