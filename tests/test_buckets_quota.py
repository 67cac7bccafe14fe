"""Round-4 curation additions: aspect-ratio bucketing, hash split,
per-domain quota sampling, and the candidate-distance histogram."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from corpusama_spark.operators.buckets import (
    DEFAULT_BUCKETS,
    aspect_bucket_summary,
    assign_aspect_buckets,
)
from corpusama_spark.operators.curation import hash_split, quota_sample


# ----------------------------------------------------------- aspect buckets


def _dims(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, w=w, h=h) for i, (w, h) in enumerate(rows)]
    )


def test_aspect_bucket_assignment_known_cases(spark):
    out = {
        r["doc_id"]: r
        for r in assign_aspect_buckets(
            _dims(
                spark,
                [
                    (1024, 1024),  # exact square → bucket 4
                    (512, 2048),   # exact extreme portrait → bucket 0
                    (2048, 512),   # exact extreme landscape → bucket 8
                    (1000, 990),   # near-square → bucket 4
                    (640, 0),      # bad dims → NULL bucket
                    (None, 480),   # null dim → NULL bucket
                ],
            )
        ).collect()
    }
    assert out[0]["bucket_id"] == 4 and out[0]["crop_waste"] == 0.0
    assert out[1]["bucket_id"] == 0 and out[1]["crop_waste"] == 0.0
    assert out[2]["bucket_id"] == 8
    assert out[3]["bucket_id"] == 4
    assert out[4]["bucket_id"] is None and out[4]["crop_waste"] is None
    assert out[5]["bucket_id"] is None


def test_aspect_bucket_argmin_matches_python(spark):
    """Every synthetic ratio lands in the bucket plain-Python argmin picks
    (tie-break on bucket_id), and crop_waste matches the formula."""
    rows = [(256 + (i * 37) % 1280, 256 + (i * 53) % 1280) for i in range(200)]
    got = assign_aspect_buckets(_dims(spark, rows)).collect()
    for r in got:
        lnr = math.log(r["w"] / r["h"])
        want = min(
            DEFAULT_BUCKETS,
            key=lambda b: (abs(lnr - math.log(b[1] / b[2])), b[0]),
        )
        assert r["bucket_id"] == want[0], (r["w"], r["h"])
        ratio, bratio = r["w"] / r["h"], want[1] / want[2]
        waste = 1.0 - min(ratio, bratio) / max(ratio, bratio)
        assert r["crop_waste"] == pytest.approx(waste, abs=1e-6)


def test_aspect_bucket_summary_shares_sum_to_one(spark):
    rows = [(640, 480)] * 7 + [(480, 640)] * 3 + [(100, 0)] * 2
    summ = aspect_bucket_summary(_dims(spark, rows)).collect()
    assert sum(r["n"] for r in summ) == 12
    assert sum(r["share"] for r in summ) == pytest.approx(1.0, abs=1e-5)
    null_row = [r for r in summ if r["bucket_id"] is None]
    assert len(null_row) == 1 and null_row[0]["n"] == 2
    assert null_row[0]["mean_waste"] is None


# --------------------------------------------------------------- hash_split


def test_hash_split_deterministic_and_weighted(spark):
    df = spark.range(0, 4000).select(F.col("id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = df.select("id", hash_split(F.col("id"), w).alias("s"))
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 4000 == pytest.approx(0.8, abs=0.03)
    # stable across partitioning
    out2 = (
        spark.range(0, 4000)
        .repartition(13)
        .select("id", hash_split(F.col("id"), w).alias("s"))
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_hash_split_partial_weights_leave_null(spark):
    df = spark.range(0, 1000)
    out = df.select(hash_split(F.col("id"), {"keep": 0.5}).alias("s"))
    n_null = out.where(F.col("s").isNull()).count()
    assert 0 < n_null < 1000  # remainder excluded, not assigned


# ------------------------------------------------------------- quota_sample


def test_quota_sample_caps_and_determinism(spark):
    rows = [Row(doc_id=i, domain=f"d{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows)
    kept = quota_sample(df, "domain", "doc_id", quota=5)
    per = {r["domain"]: r["n"] for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert per == {"d0": 5, "d1": 5, "d2": 5}
    # small groups survive whole
    small = spark.createDataFrame([Row(doc_id=i, domain="solo") for i in range(3)])
    assert quota_sample(small, "domain", "doc_id", quota=5).count() == 3
    # deterministic under repartition
    a = sorted(map(tuple, kept.collect()))
    b = sorted(
        map(tuple, quota_sample(df.repartition(7), "domain", "doc_id", 5).collect())
    )
    assert a == b


# -------------------------------------------------- phash distance histogram


def test_dist_hist_banded_equals_bruteforce(spark):
    """8-band join at k=7 finds the exact distance histogram a brute-force
    O(n²) pass computes (pigeonhole: 7 < 8 bands)."""
    import itertools

    from corpusama_spark.operators.dedup import hamming_band_pairs
    from corpusama_spark.plans.caching import release

    rows = [
        Row(id=i, code=(0x9E3779B97F4A7C15 * (i // 4)) % (1 << 60) ^ (i % 4))
        for i in range(48)
    ]
    df = spark.createDataFrame(rows)
    pairs = hamming_band_pairs(df, "id", "code", bands=8, hamming_k=7)
    hist = {}
    for r in pairs.collect():
        hist[r["hamming"]] = hist.get(r["hamming"], 0) + 1
    release(pairs)
    brute = {}
    by_id = {r.id: r.code for r in rows}
    for a, b in itertools.combinations(sorted(by_id), 2):
        d = bin(by_id[a] ^ by_id[b]).count("1")
        if d <= 7:
            brute[d] = brute.get(d, 0) + 1
    assert hist == brute and len(brute) >= 2


def test_quota_skewsafe_identical_on_hot_group(spark):
    """One group holding 80% of rows: the skew-safe two-phase path must
    return byte-identical rows to the single-window exact path."""
    from corpusama_spark.operators.curation import (
        quota_sample,
        quota_sample_skewsafe,
    )

    rows = [Row(doc_id=i, domain="hot") for i in range(800)] + [
        Row(doc_id=1000 + i, domain=f"d{i % 9}") for i in range(200)
    ]
    df = spark.createDataFrame(rows).repartition(8)
    a = sorted(map(tuple, quota_sample(df, "domain", "doc_id", 7).collect()))
    b = sorted(
        map(tuple, quota_sample_skewsafe(df, "domain", "doc_id", 7).collect())
    )
    assert a == b and len(a) == 7 + 9 * 7


def test_quota_skewsafe_deficit_repair_path(spark):
    """slack < 1 guarantees the threshold cuts below the quota for large
    groups, forcing the deficit re-rank — output must STILL be exact."""
    from corpusama_spark.operators.curation import (
        quota_sample,
        quota_sample_skewsafe,
    )

    rows = [Row(doc_id=i, domain=f"g{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows)
    a = sorted(map(tuple, quota_sample(df, "domain", "doc_id", 10).collect()))
    b = sorted(
        map(
            tuple,
            quota_sample_skewsafe(
                df, "domain", "doc_id", 10, slack=0.2
            ).collect(),
        )
    )
    assert a == b and len(a) == 40
