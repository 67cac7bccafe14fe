"""Structured-Streaming incremental ingest (SURVEY.md §2.9 / S2)."""

from pyspark.sql import functions as F

from corpusama_spark.pipeline import FilterConfig, narrow_decisions, run_pipeline
from corpusama_spark.sources.synth import captions_df
from corpusama_spark.streaming.incremental import stream_filter


def test_narrow_decisions_equal_run_pipeline(spark):
    caps = captions_df(spark, 200, partitions=4)
    cols = ["image_id", "l1", "l1_size", "multiling", "drop_reason", "keep"]
    a = {r["image_id"]: tuple(r) for r in narrow_decisions(caps).select(*cols).collect()}
    b = {
        r["image_id"]: tuple(r)
        for r in run_pipeline(caps, FilterConfig()).select(*cols).collect()
    }
    assert a == b


def test_stream_incremental_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    captions_df(spark, 120, partitions=2).write.mode("append").parquet(src)
    q = stream_filter(spark, src, out, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(out)
    assert first.count() == 120

    # draining again with no new files must add nothing (checkpoint offsets)
    q = stream_filter(spark, src, out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 120

    # append a second batch of NEW rows; only those get processed
    extra = captions_df(spark, 160, partitions=2).where(
        ~F.col("image_id").isin(
            [r.image_id for r in captions_df(spark, 120).select("image_id").collect()]
        )
    )
    extra.write.mode("append").parquet(src)
    q = stream_filter(spark, src, out, ckpt)
    q.awaitTermination()
    final = spark.read.parquet(out)
    assert final.count() == 160
    assert final.select("image_id").distinct().count() == 160

    # streamed decisions match the batch plan on the same input
    batch = run_pipeline(spark.read.parquet(src), FilterConfig())
    streamed = {r["image_id"]: (r["keep"], r["drop_reason"]) for r in final.collect()}
    for r in batch.select("image_id", "keep", "drop_reason").collect():
        assert streamed[r["image_id"]] == (r["keep"], r["drop_reason"])


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState dedup: a hash admitted in run 1 must be
    flagged as a duplicate in run 2 (state restored from the checkpoint),
    with dupe_of pointing at the original canonical id."""
    from pyspark.sql.types import StringType, StructField, StructType

    from corpusama_spark.streaming.stateful import streaming_dedup

    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("caption", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    collected = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_dedup(stream)
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch1 = [("a1", "the same text"), ("b1", "something else")]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    drain()
    got1 = {r.image_id: (r.is_first, r.dupe_of) for r in collected}
    assert got1 == {"a1": (True, None), "b1": (True, None)}

    collected.clear()
    # run 2: a2 duplicates a1's text (seen only in the PREVIOUS run),
    # c1 duplicates within its own batch, d1 is new
    batch2 = [
        ("a2", "the same text"),
        ("c1", "fresh text"),
        ("c2", "fresh text"),
        ("d1", "brand new"),
    ]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
    drain()
    got2 = {r.image_id: (r.is_first, r.dupe_of) for r in collected}
    assert got2["a2"] == (False, "a1")  # cross-restart state
    assert got2["c1"] == (True, None)
    assert got2["c2"] == (False, "c1")  # intra-batch dedup
    assert got2["d1"] == (True, None)


def test_streaming_near_dedup_cross_restart(spark, tmp_path):
    """Banded simhash state: a near-duplicate (one token changed) of a doc
    admitted in run 1 must be matched in run 2 in at least one band
    (pigeonhole: hamming <= 3 with 4 bands), across the checkpoint restart;
    unrelated text must match nothing."""
    from pyspark.sql.types import StringType, StructField, StructType

    from corpusama_spark.operators.dedup import simhash_codes
    from corpusama_spark.streaming.stateful import streaming_near_dedup

    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("caption", StringType()),
        ]
    )
    # simhash hamming after a 1-token swap shrinks with doc length (the
    # per-bit vote margin grows as sqrt(T)); at 800 tokens it lands ~2-6,
    # so search replacement tokens for a pair INSIDE the hamming<=3
    # pigeonhole guarantee — a deterministic search, same result every run
    base = " ".join(f"tok{i}" for i in range(800))
    other = "zzz completely unrelated qqq phrase about xxx something else"
    candidates = [
        base.replace("tok13 ", f"swap{j} ", 1) for j in range(60)
    ]
    df = spark.createDataFrame(
        [("a", base)] + [(f"c{j}", t) for j, t in enumerate(candidates)],
        schema,
    )
    codes = {
        r.image_id: r.sim
        for r in simhash_codes(df, "caption", "image_id").collect()
    }
    near, fixture_h = None, None
    for j, t in enumerate(candidates):
        h = bin((codes["a"] ^ codes[f"c{j}"]) & (2**64 - 1)).count("1")
        if 1 <= h <= 3:
            near, fixture_h = t, h
            break
    assert near is not None, "no <=3-hamming perturbation in 60 candidates"

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    collected = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_near_dedup(stream, hamming_k=3)
            .writeStream.foreachBatch(
                lambda d, _i: collected.extend(d.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame([("a1", base)], schema).write.mode("append").parquet(src)
    drain()
    assert all(r.match_id is None for r in collected)  # nothing seen before

    collected.clear()
    spark.createDataFrame(
        [("n1", near), ("u1", other)], schema
    ).write.mode("append").parquet(src)
    drain()
    by_id = {}
    for r in collected:
        by_id.setdefault(r.id, []).append(r)
    # near-dup found in >= 1 band, pointing at the run-1 canonical
    n1_matches = [r for r in by_id["n1"] if r.match_id == "a1"]
    assert n1_matches, (fixture_h, by_id["n1"])
    assert all(r.hamming == fixture_h for r in n1_matches)
    # unrelated doc matches nothing
    assert all(r.match_id is None for r in by_id["u1"])


def test_streaming_near_dedup_flood_cap(spark, tmp_path):
    """max_state caps per-bucket state: identical texts beyond the cap stop
    being admitted but still match against the stored canonical."""
    from pyspark.sql.types import StringType, StructField, StructType

    from corpusama_spark.streaming.stateful import streaming_near_dedup

    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("caption", StringType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    collected = []
    rows = [(f"x{i}", "same text every time") for i in range(8)]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_near_dedup(stream, hamming_k=0, max_state=2)
        .writeStream.foreachBatch(lambda d, _i: collected.extend(d.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    per_band = {}
    for r in collected:
        per_band.setdefault(r.band, []).append(r)
    for band_rows in per_band.values():
        band_rows.sort(key=lambda r: r.id)
        assert band_rows[0].match_id is None  # first admitted
        # every later row matches x0 exactly (hamming 0) despite the cap
        assert all(r.match_id == "x0" and r.hamming == 0 for r in band_rows[1:])


def test_streaming_dedup_ttl_eviction(spark, tmp_path):
    """Bounded-window dedup: a hash whose last occurrence is older than the
    TTL counts as first-seen again, while within-TTL repeats stay dupes.
    Expiry is lazy (timestamp checked in-state when the hash recurs), so
    the two regimes are pinned with separate TTLs: a wide one that each
    ~10 s drain cannot outlive, and a sub-second one that it always does."""
    import time as _time

    from pyspark.sql.types import StringType, StructField, StructType

    from corpusama_spark.streaming.stateful import streaming_dedup

    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("caption", StringType()),
        ]
    )
    collected = []

    def drain(src, ckpt, ttl):
        q = (
            streaming_dedup(
                spark.readStream.schema(schema).parquet(src), ttl_minutes=ttl
            )
            .writeStream.foreachBatch(
                lambda d, _i: collected.extend(d.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # regime 1: wide TTL (30 min) — the repeat lands well inside the window
    src1, ckpt1 = str(tmp_path / "src1"), str(tmp_path / "ckpt1")
    spark.createDataFrame([("a1", "ttl text")], schema).write.mode(
        "append"
    ).parquet(src1)
    drain(src1, ckpt1, 30)
    assert [(r.image_id, r.is_first) for r in collected] == [("a1", True)]
    collected.clear()
    spark.createDataFrame([("a2", "ttl text")], schema).write.mode(
        "append"
    ).parquet(src1)
    drain(src1, ckpt1, 30)
    assert [(r.image_id, r.is_first, r.dupe_of) for r in collected] == [
        ("a2", False, "a1")
    ]

    # regime 2: sub-second TTL — the same repeat is first-seen again
    src2, ckpt2 = str(tmp_path / "src2"), str(tmp_path / "ckpt2")
    collected.clear()
    spark.createDataFrame([("b1", "ttl text")], schema).write.mode(
        "append"
    ).parquet(src2)
    drain(src2, ckpt2, 0.005)  # 0.3 s
    assert [(r.image_id, r.is_first) for r in collected] == [("b1", True)]
    _time.sleep(1.0)
    collected.clear()
    spark.createDataFrame([("b2", "ttl text")], schema).write.mode(
        "append"
    ).parquet(src2)
    drain(src2, ckpt2, 0.005)
    got = [(r.image_id, r.is_first, r.dupe_of) for r in collected]
    assert got == [("b2", True, None)], got
