"""Streaming per-batch PSI drift monitor (streaming/drift.py)."""

from datetime import datetime


def _mk(spark, vals, start_id=0):
    rows = [
        (start_id + i, datetime(2024, 1, 5), 1, "t", float(v), "{}")
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_stream_drift_scores_batches_and_is_exactly_once(spark, tmp_path):
    from corpusama_spark.streaming.drift import (
        reference_histogram,
        stream_batch_drift,
    )

    src = str(tmp_path / "src")
    metrics = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")

    # reference: uniform over bins 0..4 (values 10,60,...,210)
    ref_vals = [10.0 + 50 * b for b in range(5)] * 40
    ref = reference_histogram(_mk(spark, ref_vals), "value", 50.0, 10)
    assert ref.count() == 5

    # batch 1: same distribution -> psi == 0
    _mk(spark, ref_vals, 10000).write.mode("append").parquet(src)
    q = stream_batch_drift(spark, src, metrics, ckpt, ref, "value", 50.0, 10)
    q.awaitTermination()
    m1 = spark.read.parquet(metrics).collect()
    assert len(m1) == 1
    assert m1[0].psi == 0.0 and m1[0].n_rows == 200
    assert m1[0].cur_cover == 1.0

    # drain again with nothing new: checkpoint prevents re-scoring
    q = stream_batch_drift(spark, src, metrics, ckpt, ref, "value", 50.0, 10)
    q.awaitTermination()
    assert spark.read.parquet(metrics).count() == 1

    # batch 2: mass shifted to a bin the reference barely uses -> big psi
    shifted = [410.0] * 180 + [10.0] * 20
    _mk(spark, shifted, 20000).write.mode("append").parquet(src)
    q = stream_batch_drift(spark, src, metrics, ckpt, ref, "value", 50.0, 10)
    q.awaitTermination()
    m2 = sorted(spark.read.parquet(metrics).collect(), key=lambda r: r.epoch)
    assert len(m2) == 2
    drifted = m2[-1]
    assert drifted.n_rows == 200
    # bin 8 (410.0) is absent in the reference -> excluded from the sum;
    # the quarantine signal is the COVERAGE collapse (0.1), and the
    # residual psi is exactly the included-bin-0 term (0.1 vs 0.2)
    import math

    assert drifted.cur_cover == 0.1
    assert drifted.psi == round((0.1 - 0.2) * math.log(0.5), 6)


def test_stream_drift_matches_batch_psi_operator(spark, tmp_path):
    """The streaming score on a single batch must equal the batch
    psi_report on the equivalent pre/post split."""
    from corpusama_spark.operators.drift import psi_report
    from corpusama_spark.streaming.drift import (
        reference_histogram,
        stream_batch_drift,
    )

    ref_vals = [10.0, 60.0, 110.0] * 30 + [160.0] * 10
    cur_vals = [10.0] * 50 + [110.0] * 30 + [210.0] * 20

    src = str(tmp_path / "src")
    metrics = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")
    ref = reference_histogram(_mk(spark, ref_vals), "value", 50.0, 10)
    _mk(spark, cur_vals, 5000).write.mode("append").parquet(src)
    q = stream_batch_drift(spark, src, metrics, ckpt, ref, "value", 50.0, 10)
    q.awaitTermination()
    streamed = spark.read.parquet(metrics).collect()[0]

    # batch twin: ref rows dated before the split, cur rows after
    pre = [
        (i, datetime(2024, 1, 5), 1, "t", float(v), "{}")
        for i, v in enumerate(ref_vals)
    ]
    post = [
        (9000 + i, datetime(2024, 1, 25), 1, "t", float(v), "{}")
        for i, v in enumerate(cur_vals)
    ]
    both = spark.createDataFrame(
        pre + post,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    batch = psi_report(
        both, "event_type", "value", "ts", "2024-01-16", 50.0, 10
    ).collect()[0]
    assert streamed.psi == batch.psi
    assert streamed.cur_cover == batch.cur_cover
