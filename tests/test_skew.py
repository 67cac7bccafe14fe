"""Explicit skew handling (north_rule): salting must spread pathological
key distributions across tasks.

The hazard at 10^12 rows: phash buckets are the storage layout, and a
boilerplate flood (millions of identical/near-identical images or captions)
lands one bucket on one task, serializing the UDF stage. The unfused plan's
repartition keys are (pmod(phash, nbuckets), salt) — the salt must spread a
single hot bucket over many partitions.
"""

from pyspark.sql import functions as F

from corpusama_spark.pipeline import FilterConfig, run_pipeline
from corpusama_spark.sources.synth import captions_df


def _partition_sizes(df):
    return [
        r.n
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def test_salt_spreads_hot_phash_bucket(spark):
    # all rows forced into ONE phash bucket — the worst case
    caps = captions_df(spark, 400, partitions=4).withColumn("phash", F.lit(7))
    salted = caps.repartition(
        16,
        F.pmod(F.col("phash"), F.lit(64)),
        F.pmod(F.xxhash64("image_id"), F.lit(8)),
    )
    sizes = _partition_sizes(salted)
    # without salt this is a single 400-row partition; with salt_buckets=8
    # the hot bucket spreads over ~8 partitions
    assert len(sizes) >= 6, sizes
    assert max(sizes) < 400

    unsalted = caps.repartition(16, F.pmod(F.col("phash"), F.lit(64)))
    assert max(_partition_sizes(unsalted)) == 400


def test_pipeline_correct_under_pathological_skew(spark):
    # decisions must be identical whether or not the input is skew-bucketed
    caps = captions_df(spark, 200, partitions=4)
    skewed = caps.withColumn("phash", F.lit(7))
    cols = ["image_id", "l1", "drop_reason", "keep"]
    a = {
        r["image_id"]: tuple(r)
        for r in run_pipeline(caps, FilterConfig(fused_langid=False))
        .select(*cols)
        .collect()
    }
    b = {
        r["image_id"]: tuple(r)
        for r in run_pipeline(skewed, FilterConfig(fused_langid=False))
        .select(*cols)
        .collect()
    }
    assert a == b
