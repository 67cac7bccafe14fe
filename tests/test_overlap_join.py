"""Interval overlap join (X268): exact pair set vs brute force, single
claim for multi-bucket spans, inclusive endpoints, key scoping."""

import datetime as dt

from pyspark.sql import functions as F

from corpusama_spark.operators.rangejoin import interval_overlap_join

EPOCH = dt.datetime(2024, 1, 1)


def _iv(spark, rows, pre):
    return spark.createDataFrame(
        [
            (i, EPOCH + dt.timedelta(seconds=s), EPOCH + dt.timedelta(seconds=e))
            for i, s, e in rows
        ],
        f"{pre}_id long, {pre}_start timestamp, {pre}_end timestamp",
    )


def test_exact_pairs_and_single_claim(spark):
    # left interval spans 7 buckets at width=10s: must appear ONCE per
    # overlapping right interval, not once per shared bucket
    left = _iv(spark, [(0, 0, 70), (1, 100, 110)], "l")
    right = _iv(
        spark,
        [(10, 5, 8), (11, 65, 80), (12, 71, 90), (13, 109, 120), (14, 200, 210)],
        "r",
    )
    j = interval_overlap_join(left, right, width_us=10_000_000)
    got = sorted((r.l_id, r.r_id) for r in j.collect())
    # (0,12): 71 > 70 -> NO overlap; (1,13): touching at 109..110 -> yes
    assert got == [(0, 10), (0, 11), (1, 13)]
    # overlap lengths exact (inclusive microseconds)
    lens = {(r.l_id, r.r_id): r.overlap_us for r in j.collect()}
    assert lens[(0, 10)] == 3_000_001  # [5s, 8s]
    assert lens[(0, 11)] == 5_000_001  # [65s, 70s]
    assert lens[(1, 13)] == 1_000_001  # [109s, 110s]


def test_touching_endpoint_and_key_scope(spark):
    left = _iv(spark, [(0, 0, 10)], "l").withColumn("k", F.lit("a"))
    right = _iv(spark, [(1, 10, 20), (2, 10, 20)], "r").withColumn(
        "k",
        F.when(F.col("r_id") == 1, F.lit("a")).otherwise(F.lit("b")),
    )
    # endpoint touch (10 == 10) counts as overlap (inclusive)
    j = interval_overlap_join(left, right, width_us=5_000_000, key="k")
    got = [(r.l_id, r.r_id) for r in j.collect()]
    # key scoping drops the cross-key pair
    assert got == [(0, 1)]
