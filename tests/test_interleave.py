"""Low-discrepancy interleave schedule (curation.interleave_schedule):
prefix-proportionality bound, weight monotonicity, and invariance of
the distributed global rank to the partition count."""

from pyspark.sql import functions as F


def _docs(spark, per_source=(("a", 60, 3.0), ("b", 20, 1.0), ("c", 40, 2.0))):
    # doc counts proportional to weights: sources exhaust together, so the
    # within-one-doc proportionality bound holds over the WHOLE schedule
    # (after a source runs dry, later prefixes can't hold its share)
    rows = []
    i = 0
    for src, n, _ in per_source:
        for _j in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_prefix_shares_track_weights_within_one_doc(spark):
    from corpusama_spark.operators.curation import interleave_schedule
    from corpusama_spark.plans.caching import release

    df = _docs(spark)
    w = (
        F.when(F.col("source") == "a", 3.0)
        .when(F.col("source") == "b", 1.0)
        .otherwise(2.0)
    )
    out = interleave_schedule(df, w, "source", "doc_id")
    rows = sorted(out.collect(), key=lambda r: r.global_rank)
    release(out)
    assert [r.global_rank for r in rows] == list(range(1, 121))
    # every source's count in every prefix is within 1 of rank * share
    shares = {"a": 0.5, "b": 1 / 6, "c": 1 / 3}
    seen = {"a": 0, "b": 0, "c": 0}
    for r in rows:
        seen[r.source] += 1
        for s, cnt in seen.items():
            assert abs(cnt - r.global_rank * shares[s]) <= 1.0, (
                r.global_rank,
                s,
            )
    # the audit column matches the running count
    for r in rows:
        assert r.src_rank == sum(
            1
            for x in rows
            if x.source == r.source and x.global_rank <= r.global_rank
        )
        assert abs(r.disc - (r.src_share - r.target_share)) < 2e-6


def test_global_rank_invariant_to_partitioning(spark):
    from corpusama_spark.operators.curation import interleave_schedule
    from corpusama_spark.plans.caching import release

    df = _docs(spark)
    w = (
        F.when(F.col("source") == "a", 3.0)
        .when(F.col("source") == "b", 1.0)
        .otherwise(2.0)
    )
    a = interleave_schedule(df, w, partitions=2)
    b = interleave_schedule(df, w, partitions=7)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    release(a)
    release(b)
    assert ra == rb
