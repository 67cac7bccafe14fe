"""Distributed Bloom filter: bit_or build, broadcast vectorized probe."""

from pyspark.sql import functions as F


def test_bloom_no_false_negatives_and_fpp(spark):
    from corpusama_spark.operators.bloom import bloom_build, bloom_might_contain

    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(2000)], "v string"
    )
    n_bits, k = 1 << 15, 5  # ~16 bits/member -> theoretical fpp ~1%
    words = bloom_build(members, F.col("v"), n_bits, k)
    # every member must test positive (Bloom's hard guarantee)
    hits = members.select(
        bloom_might_contain(spark, words, F.col("v"), n_bits, k).alias("h")
    )
    assert hits.where(~F.col("h")).count() == 0
    # non-members pass only at ~fpp (allow 5x the theoretical bound)
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(5000)], "v string"
    )
    fp = (
        others.select(
            bloom_might_contain(spark, words, F.col("v"), n_bits, k).alias("h")
        )
        .where("h")
        .count()
    )
    assert fp / 5000 < 0.05


def test_bloom_bitmap_is_the_only_driver_payload(spark):
    """The build collects at most n_bits/64 rows, never the member values:
    10x the members, same bitmap size."""
    from corpusama_spark.operators.bloom import bloom_build

    n_bits = 1 << 12
    small = spark.createDataFrame([(f"x{i}",) for i in range(100)], "v string")
    big = spark.createDataFrame([(f"x{i}",) for i in range(1000)], "v string")
    w1 = bloom_build(small, F.col("v"), n_bits, 3)
    w2 = bloom_build(big, F.col("v"), n_bits, 3)
    assert len(w1) == len(w2) == n_bits // 64


def test_contamination_bloom_prefilter_is_exact(spark):
    """The bloom pre-pass must return byte-identical results to the
    exact-only plan: no false negatives, exact join kills false
    positives."""
    from corpusama_spark.operators.curation import ngram_contamination

    docs = spark.createDataFrame(
        [(i, f"shared prefix tokens {'x' if i % 3 else 'y'} tail {i}")
         for i in range(60)],
        "doc_id long, text string",
    )
    bench = docs.where(F.col("doc_id") % 10 == 0).select("text")
    exact = sorted(
        map(tuple, ngram_contamination(docs, bench, n=3).collect())
    )
    via_bloom = sorted(
        map(
            tuple,
            ngram_contamination(
                docs, bench, n=3, bloom_bits=1 << 14, bloom_k=4
            ).collect(),
        )
    )
    assert exact == via_bloom
    assert any(r[2] for r in exact)  # the fixture genuinely contaminates
