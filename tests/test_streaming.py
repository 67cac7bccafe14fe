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
