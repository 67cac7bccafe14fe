"""Distributed as-of (point-in-time) join — the operator Spark lacks.

The reference joins event-ish tables on exact keys only (corpusama's
attribute/export joins); a training-data pipeline over event streams
needs the TEMPORAL variant: for every left row, the single right row
with the largest timestamp <= (backward) or smallest >= (forward) the
left timestamp, per key — pandas.merge_asof / DuckDB ``ASOF JOIN`` /
kdb+ ``aj`` semantics. Spark has no native ASOF join, and the naive
relational encodings are scale traps:

- equi-join on key + ``r.ts <= l.ts`` filter + row_number keeps ONE row
  per left row but first materializes every (left, right) pair within a
  key — O(n_l * n_r) per key, quadratic on hot keys;
- a theta-join ``l.key = r.key AND r.ts BETWEEN ...`` needs a tolerance
  bound and still range-explodes.

This implementation is the union-scan shape (the one-shuffle linear
algorithm): tag both sides, union, ONE window partitioned by key and
ordered by (ts, side) — right rows sort before left rows at equal ts,
making the match inclusive — and take ``last(right_payload,
ignorenulls=True)`` over the unbounded-preceding frame. Each key's
partition is scanned once; cost is O(n_l + n_r) rows through one
exchange, the same frontier sweep a sort-merge ASOF does on a single
node, parallelized by key.

Scale shape (10^12 rows):
- one hash exchange on the key (both sides together), one sort within
  partitions — exactly what any per-key window costs; no pair blowup;
- the right payload rides as ONE struct column, so the window state is a
  single value per frame, not per-column state;
- hot-key skew: same story as sessionization — a key owning 10^9 rows
  serializes one task; pre-split by coarse time bucket and repair the
  boundary (operators/sessions.py:sessionize_presplit shows the
  pattern), or gate with operators/skew.skew_report.

Tolerance (``max_gap_us``) nulls out matches farther than the bound —
pandas.merge_asof(tolerance=...) semantics — applied AFTER the sweep,
so it is a projection, not a join predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_payload: list[str],
    direction: str = "backward",
    max_gap_us: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the nearest ``right`` row
    per ``on`` key (inclusive; backward = latest right.ts <= left.ts,
    forward = earliest right.ts >= left.ts). Unmatched left rows keep
    NULL payload (LEFT join semantics). Right payload columns surface as
    ``{prefix}{col}``, plus ``{prefix}{ts}`` = the matched timestamp.

    Ties: right rows at the same (key, ts) are resolved by payload-struct
    order (deterministic; DuckDB/pandas leave this case unspecified);
    equal-ts left/right pairs match (inclusive) in both directions.
    NULL keys/timestamps are the caller's to filter — a NULL ts sorts
    first and can never match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    # parquet timestamps arrive TIMESTAMP_NTZ, which unix_micros
    # rejects; session tz is UTC (session.py) so the cast is lossless
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))
    rstruct = F.struct(
        F.col(ts).alias(ts), *[F.col(c) for c in right_payload]
    )
    r = right.select(
        F.col(on).alias(on),
        ts_us.alias("_ts_us"),
        F.lit(0).alias("_side"),
        rstruct.alias("_r"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    lrows = left.select(
        F.col(on).alias(on),
        ts_us.alias("_ts_us"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    order = [F.col("_ts_us"), F.col("_side"), F.col("_r")]
    if direction == "forward":
        # reverse time; _side/-struct order flips so right rows at equal
        # ts still precede left rows in scan order and ties take the
        # struct sorting last in ORIGINAL (ascending) order
        order = [F.col("_ts_us").desc(), F.col("_side"), F.col("_r").desc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_r", ignorenulls=True).over(w)
    out = (
        lrows.unionByName(r)
        .withColumn("_m", matched)
        .where(F.col("_side") == 1)
    )
    if max_gap_us is not None:
        gap = F.abs(F.col("_ts_us") - F.unix_micros(F.col(f"_m.{ts}")))
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(int(max_gap_us)), F.col("_m"))
        )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        F.col(f"_m.{ts}").alias(f"{prefix}{ts}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_payload],
    )
