"""Gap-based sessionization over event streams.

The classic event-time operator every telemetry/interaction table needs
(and the one shape the engine's inventory lacked): assign events to
sessions by inactivity gap — a session ends when the same user is silent
longer than ``gap``. In a training-data pipeline this is how interaction
logs become documents (a session of user events = one training example)
and how crawler logs become per-host fetch episodes.

Relational form (no state machine): within each user's time-ordered
events, a session STARTS where the gap from the previous event exceeds
the threshold; the running count of starts is the session index — two
window functions over one partition-by-user exchange. Batch twin of
Structured Streaming's session_window / flatMapGroupsWithState shape:
same semantics, expressible as plain SQL, so it is DuckDB-oracle-exact.

Scale shape (10^12 events):

- ONE shuffle, on user_id — both windows and the final groupBy share it
  (Catalyst plans a single exchange; the session agg reuses the window
  partitioning);
- per-user data is processed in time order within its partition —
  skewed power users are bounded by per-user event counts, not corpus
  size (salt upstream if one user is a crawler writing 10^9 rows);
- output is session-sized, typically 10-100x smaller than the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Events + (session_idx, session_id): each event tagged with its
    user-local session index (1-based, time order) and a deterministic
    session key. Ordering ties break on ``order_tiebreak`` so replays
    and retries assign identically."""
    w = Window.partitionBy(user_col).orderBy(
        F.asc(ts_col), F.asc(order_tiebreak)
    )
    # integer MICROSECOND epochs: unix_timestamp() truncates to seconds
    # (a 1799.9s gap would misclassify) and float epochs round — micros
    # are exact and portable (DuckDB epoch_us twin). Parquet gives
    # TIMESTAMP_NTZ, which unix_micros rejects; the session timezone is
    # pinned UTC (session.py), so the cast is value-preserving.
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_us = _us(F.col(ts_col)) - _us(prev_ts)
    starts = F.when(
        prev_ts.isNull() | (gap_us > int(gap_minutes * 60 * 1_000_000)), 1
    ).otherwise(0)
    idx = F.sum(starts).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    ).cast("int")
    return events.withColumn("session_idx", idx).withColumn(
        "session_id",
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_idx")),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """(user_id, session_idx, session_id, n_events, started_us, ended_us,
    duration_us, total_value): one row per session, boundaries as integer
    microsecond epochs (pandas-dtype-stable across engines, unlike raw
    timestamps whose ns/us units drift). The groupBy reuses the sessionize
    window's user partitioning — one exchange end to end."""
    tagged = sessionize(events, gap_minutes, user_col, ts_col, order_tiebreak)
    return (
        tagged.groupBy(user_col, "session_idx", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min(ts_col).cast("timestamp")).alias("started_us"),
            F.unix_micros(F.max(ts_col).cast("timestamp")).alias("ended_us"),
            (
                F.unix_micros(F.max(ts_col).cast("timestamp"))
                - F.unix_micros(F.min(ts_col).cast("timestamp"))
            ).alias("duration_us"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
    )
