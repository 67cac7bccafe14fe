"""Streaming snapshot sink (X248): per-microbatch atomic commits, time
travel over a live stream's output, replay idempotence, incremental
scans between stream snapshots."""

import shutil

from pyspark.sql import functions as F

from corpusama_spark.pipeline import FilterConfig
from corpusama_spark.sources.synth import captions_df


def _drop_files(spark, df, path, n_files):
    df.repartition(n_files).write.mode("append").parquet(path)


def test_stream_commits_snapshots(spark, tmp_path):
    from corpusama_spark.snapshots import (
        read_as_of,
        read_incremental,
        snapshots,
    )
    from corpusama_spark.streaming.incremental import stream_filter_snapshots

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    snap = str(tmp_path / "snap")
    cfg = FilterConfig(nbuckets=4)

    # first drop: 120 rows -> one availableNow drain
    caps = captions_df(spark, 120, partitions=2)
    _drop_files(spark, caps, inp, 2)
    q = stream_filter_snapshots(spark, inp, out, ckpt, snap, cfg)
    q.awaitTermination()
    chain1 = snapshots(snap)
    assert len(chain1) >= 1
    n1 = read_as_of(spark, out, snap).count()
    assert n1 == 120
    first_head = chain1[-1]["snapshot_id"]

    # second drop: 60 more rows -> new epoch, new snapshot(s)
    more = captions_df(spark, 180, partitions=2).where(F.col("image_id").isNotNull())
    more = more.subtract(caps)
    _drop_files(spark, more, inp, 1)
    q2 = stream_filter_snapshots(spark, inp, out, ckpt, snap, cfg)
    q2.awaitTermination()
    chain2 = snapshots(snap)
    assert len(chain2) > len(chain1)
    assert read_as_of(spark, out, snap).count() == 180
    # time travel to the first drain still sees exactly the old rows
    assert read_as_of(spark, out, snap, first_head).count() == 120
    # incremental scan between the two stream heads = the second drop
    assert read_incremental(spark, out, snap, first_head).count() == 60
    # every snapshot owns a disjoint bucket range
    seen = set()
    for s in chain2:
        assert not (set(s["buckets"]) & seen)
        seen.update(s["buckets"])


def test_replay_is_idempotent(spark, tmp_path):
    from corpusama_spark.snapshots import read_as_of, snapshots
    from corpusama_spark.streaming.incremental import stream_filter_snapshots

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    snap = str(tmp_path / "snap")
    cfg = FilterConfig(nbuckets=4)
    _drop_files(spark, captions_df(spark, 100, partitions=2), inp, 2)
    q = stream_filter_snapshots(spark, inp, out, ckpt, snap, cfg)
    q.awaitTermination()
    before = sorted(
        map(tuple, read_as_of(spark, out, snap).collect())
    )
    n_snaps = len(snapshots(snap))

    # simulate a crash-replay: wipe the stream checkpoint so the same
    # files re-drain as the same epoch ids — the sink must no-op
    shutil.rmtree(ckpt)
    q2 = stream_filter_snapshots(spark, inp, out, ckpt, snap, cfg)
    q2.awaitTermination()
    assert len(snapshots(snap)) == n_snaps
    after = sorted(
        map(tuple, read_as_of(spark, out, snap).collect())
    )
    assert before == after
