"""Grouped linear-trend profiling: per-group OLS slope/intercept/fit over
any (x, y) pair, as single-pass built-in aggregates.

The corpus-operations signal this feeds: ingest volume drift per source,
quality-score drift per domain over crawl snapshots, event-value trends
per event type — "which sources are degrading" is a regression per
group, not a dashboard eyeball. (Reference analogue: corpusama tracks
per-run API date checkpoints, corpus/utils.py — trend detection over
them is the scale upgrade.)

Scale shape: regr_slope/regr_intercept/regr_r2 are single-pass
commutative aggregates with map-side partial combine — ONE shuffle of
one row per (group, moment) regardless of corpus size. The x offset is
subtracted BEFORE the moments accumulate: with raw unix timestamps
(~1.7e9) the sum-of-squares hits 3e18 per million rows and the
E[x²]−E[x]² cancellation destroys the slope; centering keeps the
moments small enough that engines agree to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_trend"]


def grouped_trend(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
    x_offset: float = 0.0,
) -> DataFrame:
    """Per-group OLS fit of y on (x - x_offset): slope, intercept, r2,
    n. Pass a FIXED x_offset (e.g. a round epoch near the data) so the
    centering is identical on every engine and partition — never a
    data-derived mean, which would add a second pass and an
    order-dependent float."""
    xs = (x.cast("double") - F.lit(float(x_offset))).alias("_x")
    ys = y.cast("double").alias("_y")
    return (
        df.select(F.col(group_col), xs, ys)
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.expr("regr_slope(_y, _x)"), 6).alias("slope"),
            F.round(F.expr("regr_intercept(_y, _x)"), 6).alias("intercept"),
            F.round(F.expr("regr_r2(_y, _x)"), 6).alias("r2"),
        )
    )
