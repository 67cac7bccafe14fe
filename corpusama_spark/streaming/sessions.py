"""Streaming sessionization — the Structured Streaming twin of
operators/sessions.py (X63/X66).

Batch sessionization is two window functions; the STREAMING shape is
Spark's native ``session_window`` aggregation: state-store-backed merging
session windows per user, watermark-bounded so state is dropped once a
session can no longer grow. This is the canonical "custom stateful
operator expressed with the built-in" case — no applyInPandasWithState
needed, the whole thing stays JVM-side.

Semantics vs the batch operator:

- identical session membership for all gaps != threshold; the one edge
  that differs is an EXACT-threshold gap (batch keeps `gap_us >
  threshold` strictly-greater → same session at equality; Spark's
  session_window closes the window at ``last_ts + gap`` exclusive → new
  session at equality). Microsecond event times make equality
  measure-zero on real data; the parity test constructs gaps away from
  the boundary.
- streaming emits (user, window) aggregates, not per-event running
  indices — the batch operator owns index assignment (it needs the
  whole session history); the stream owns arrival-time emission.

Production shape: ``with_watermark`` + append-mode sink emits each
session exactly once when the watermark passes ``session end + gap``;
state per in-flight session is O(aggregates), not O(events). The
drain-everything test shape uses complete mode on a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_windows(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, n_events, started_us, ended_us, duration_us, total_value)
    per merged session window — column-compatible with the batch
    session_stats output minus the index columns. Works on both batch and
    streaming DataFrames (same plan, different sink rules)."""
    gap = f"{int(gap_minutes * 60)} seconds"
    # cast IN PLACE only when needed (parquet TIMESTAMP_NTZ): replacing the
    # column with a derived copy would sever an upstream withWatermark tag
    # and append mode would refuse the aggregation
    if dict(events.dtypes).get(ts_col) != "timestamp":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    ts = F.col(ts_col)
    return (
        events.groupBy(
            F.col(user_col), F.session_window(ts, gap).alias("_w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min(ts)).alias("started_us"),
            F.unix_micros(F.max(ts)).alias("ended_us"),
            (F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts))).alias(
                "duration_us"
            ),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .drop("_w")
    )


def stream_session_stats(
    events_stream: DataFrame,
    gap_minutes: float = 30.0,
    watermark_delay: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The production streaming plan: watermarked event time so the state
    store drops sessions that can no longer merge, append-ready (each
    session emits exactly once, when the watermark passes its close)."""
    ev = events_stream.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark_delay)
    return session_windows(ev, gap_minutes, user_col, ts_col, value_col)
