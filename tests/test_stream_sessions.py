"""Streaming sessionization (streaming/sessions.py): session_window parity
with the batch operator, watermarked production shape, skew report."""

import pandas as pd
from pyspark.sql import functions as F


def _events(spark, tmp_path):
    """Deterministic events with multi-session users; every inter-event gap
    is strictly away from the 30-min boundary (semantics note in the module
    docstring)."""
    rows = []
    eid = 0
    base = 1_700_000_000
    for u in range(1, 6):
        t = base + u * 1000
        for burst in range(3):
            for i in range(4):
                rows.append((eid, u, t, float(u)))
                eid += 1
                t += 300 + 7 * i  # 5-min-ish gaps, inside sessions
            t += 3600 + 11 * burst  # 1h+ gap, new session
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "sec", "value"])
    df = spark.createDataFrame(pdf).selectExpr(
        "event_id", "user_id",
        "cast(timestamp_seconds(sec) as timestamp) as ts", "value",
    )
    path = str(tmp_path / "events_in")
    df.coalesce(2).write.mode("overwrite").parquet(path)
    return df, path


def test_streaming_sessions_match_batch(spark, tmp_path):
    from corpusama_spark.operators.sessions import session_stats
    from corpusama_spark.streaming.sessions import session_windows

    df, path = _events(spark, tmp_path)
    batch = {
        (r.user_id, r.started_us, r.ended_us, r.n_events, r.total_value)
        for r in session_stats(df).collect()
    }
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        ).parquet(path)
    )
    agg = session_windows(stream, gap_minutes=30.0)
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.started_us, r.ended_us, r.n_events, r.total_value)
        for r in spark.sql("select * from sess_t").collect()
    }
    assert got == batch
    assert len(got) == 15  # 5 users x 3 sessions


def test_streaming_sessions_watermarked_append(spark, tmp_path):
    """The production shape: watermark + append mode emits closed sessions
    exactly once across two availableNow drains of a growing directory."""
    from corpusama_spark.streaming.sessions import stream_session_stats

    df, path = _events(spark, tmp_path)
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        ).parquet(path)
    )
    agg = stream_session_stats(stream, gap_minutes=30.0, watermark_delay="1 hour")
    assert agg.isStreaming
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()
    # drain again with no new data: nothing re-emits (exactly-once)
    q2 = (
        stream_session_stats(
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, value double"
            ).parquet(path),
            gap_minutes=30.0,
            watermark_delay="1 hour",
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == first


def test_skew_report_and_salt_suggestion(spark):
    from corpusama_spark.operators.skew import skew_report, suggest_salt

    rows = [(i, "hot") for i in range(80)] + [
        (i, f"cold{i % 8}") for i in range(80, 120)
    ]
    df = spark.createDataFrame(rows, "event_id long, key string")
    rep = skew_report(df, "key", top_n=3).collect()
    assert rep[0].key == "hot" and rep[0].n == 80
    # 9 distinct keys, 120 rows -> mean 13.33; hot skew = 80/13.33 = 6.0
    assert abs(rep[0].skew - 6.0) < 1e-6
    assert rep[0].salt_factor == 6
    assert abs(rep[0].share - round(80 / 120, 6)) < 1e-9
    # cold keys are balanced: 5 rows each, skew < 1
    assert all(r.skew < 1 for r in rep[1:])
    assert suggest_salt(df, "key", target_skew=2.0) == 3
    assert suggest_salt(df.where("key != 'hot'"), "key") == 1
    # the top-N compiles to per-partition heaps (TakeOrderedAndProject),
    # not a global sort, and the totals join is a single-row broadcast
    plan = (
        skew_report(df, "key", top_n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan
