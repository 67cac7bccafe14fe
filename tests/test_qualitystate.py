"""Differential quality states (X249): the mergeability identity
(full == old ∪ new, bit-for-bit), metric correctness vs direct
computation, HLL distinctness sanity, verification rules."""

from pyspark.sql import functions as F

from corpusama_spark.sources.synth import captions_df


def _states(spark, df):
    from corpusama_spark.operators.qualitystate import quality_states

    return quality_states(
        df, "part", numeric_cols=["w"], string_cols=["caption", "fmt"]
    )


def _with_part(df, n_parts):
    return df.withColumn(
        "part",
        F.pmod(
            F.conv(F.substring("image_id", 1, 4), 16, 10).cast("long"),
            F.lit(n_parts),
        ).cast("int"),
    )


def test_merge_identity_and_metrics(spark):
    from corpusama_spark.operators.qualitystate import (
        merge_quality_metrics,
        quality_states,
    )

    caps = _with_part(captions_df(spark, 600, partitions=8), 6)
    full = merge_quality_metrics(_states(spark, caps)).collect()

    # the differential property: states of A ∪ states of B merge to
    # the IDENTICAL metrics — no rescan of A needed when B arrives
    old = caps.where(F.col("part") < 4)
    new = caps.where(F.col("part") >= 4)
    merged = merge_quality_metrics(
        _states(spark, old).unionByName(_states(spark, new))
    ).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, merged))

    m = {r.column: r for r in full}
    # direct checks vs plain aggregation
    direct_n = caps.count()
    assert m["w"].n == direct_n and m["caption"].n == direct_n
    nulls = caps.where(F.col("caption").isNull()).count()
    assert m["caption"].n_null == nulls
    assert m["caption"].completeness == round(1 - nulls / direct_n, 6)
    mm = caps.agg(F.min("w"), F.max("w"), F.avg("w")).collect()[0]
    assert m["w"].min_num == float(mm[0]) and m["w"].max_num == float(mm[1])
    assert abs(m["w"].mean_num - mm[2]) < 1e-6
    # fmt has 3 distinct values; HLL with m=64 is near-exact down here
    exact = caps.select("fmt").distinct().count()
    assert abs(m["fmt"].distinct_est - exact) <= 1.0


def test_quality_check_rules(spark):
    from corpusama_spark.operators.qualitystate import (
        merge_quality_metrics,
        quality_check,
    )

    caps = _with_part(captions_df(spark, 300, partitions=4), 4)
    metrics = merge_quality_metrics(_states(spark, caps))
    rules = spark.createDataFrame(
        [
            ("caption", "completeness", 0.9, None),
            ("w", "min_num", 1.0, None),
            ("fmt", "distinct_est", 2.0, 10.0),
            ("w", "mean_num", 10_000.0, None),  # deliberately failing
        ],
        "column string, metric string, lo double, hi double",
    )
    out = {(r.column, r.metric): r for r in quality_check(metrics, rules).collect()}
    assert out[("caption", "completeness")].passed
    assert out[("w", "min_num")].passed
    assert out[("fmt", "distinct_est")].passed
    assert not out[("w", "mean_num")].passed
    assert not out[("w", "mean_num")].all_passed
    assert all(not r.all_passed for r in out.values())
