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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_trend", "rate_anomaly", "decayed_mean", "cusum_shift"]


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


def rate_anomaly(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    trailing: int = 7,
    z_thresh: float = 2.0,
) -> DataFrame:
    """Daily-volume anomaly detection per group: each day's event count
    z-scored against the TRAILING `trailing`-day window (current day
    excluded, so a spike can't mask itself). The ingest-monitoring op —
    "source X just doubled / went dark" — and the first thing a crawl
    operator wants automated. Warm-up days (under two prior days: mean
    or stddev undefined) report n_prior so callers can see the stats
    are vacuous, with trail_mean/z pinned to 0.0 and anomaly=false —
    the output carries NO null floats/booleans, so it is dtype-stable
    through every pandas/Arrow handoff. A PERFECTLY FLAT history makes
    sd = 0 and z undefined — and a jump off a flat line is the clearest
    anomaly there is — so with >= 2 prior days and sd = 0, ANY
    deviation from the trailing mean flags (z stays 0.0: it cannot be
    scaled).

    Scale shape: the daily rollup is one (group, day) groupBy with
    map-side combine — output is groups × days, tiny; the window then
    runs over THAT table, so the sort is per-group over day counts,
    not over raw events. Counts are integers, so the window mean/sd
    see exact inputs and engines agree at 6 dp.
    """
    from pyspark.sql.window import Window

    daily = (
        events.groupBy(
            F.col(group_col),
            F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("day")
        .rowsBetween(-int(trailing), -1)
    )
    mu = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    z = (F.col("n") - mu) / sd
    return daily.select(
        group_col,
        "day",
        "n",
        F.count("n").over(w).cast("long").alias("n_prior"),
        F.coalesce(F.round(mu, 6), F.lit(0.0)).alias("trail_mean"),
        F.coalesce(F.when(sd > 0, F.round(z, 6)), F.lit(0.0)).alias("z"),
        F.coalesce(
            F.when(sd > 0, F.abs(z) > F.lit(float(z_thresh))).when(
                (sd == 0) & (F.count("n").over(w) >= 2),
                F.col("n") != mu,
            ),
            F.lit(False),
        ).alias("anomaly"),
    )


def decayed_mean(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    half_life_days: float = 7.0,
    anchor: str = "2024-02-01",
) -> DataFrame:
    """Recency-weighted mean per group: Σ v·w / Σ w with
    w = exp(−ln2 · age_days / half_life), age measured back from a
    FIXED anchor date (never now(): a data-derived or wall-clock
    anchor would make the result irreproducible across runs and
    engines). The freshness-weighted quality metric — "what does this
    source look like lately" — where a plain mean lets a year of
    stale rows drown the last week.

    Scale shape: one map-side-combinable groupBy; weights are computed
    per row in the scan stage from integer day ages, so the only float
    accumulation is the two weighted sums (O(1)-magnitude terms, 6 dp
    rounding robust). Also reports the plain mean so drift is visible
    in one row.
    """
    lam = math.log(2.0) / float(half_life_days)
    age = F.datediff(F.lit(anchor).cast("date"), F.to_date(F.col(ts_col)))
    w = F.exp(F.lit(-lam) * age.cast("double"))
    v = F.col(value_col).cast("double")
    return (
        df.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg(v), 6).alias("plain_mean"),
            F.round(F.sum(v * w) / F.sum(w), 6).alias("decayed_mean"),
        )
    )


def cusum_shift(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """CUSUM change-point estimate per group over daily means: with
    x_d the per-day mean and x̄ the overall mean of the daily means,
    S_d = Σ_{i≤d} (x_i − x̄) and the estimated shift day is
    argmax |S_d| (smallest day on ties) — the classical closed-form
    CUSUM change-point locator (Page 1954 / Pettitt's statistic shape,
    public). The pre/post means around the located day quantify the
    shift; a near-zero cusum_max says the series is level. This is the
    ingest-monitoring question "WHEN did the distribution move?" that
    rate_anomaly (point outliers) and psi/ks (did it move at all)
    don't answer.

    Scale shape: the corpus collapses to one row per (group, day) in a
    map-side-combinable groupBy; every window after that runs over the
    days-per-group table. Deterministic: fixed tie-breaks, no now().
    """
    from pyspark.sql.window import Window

    daily = (
        df.select(
            F.col(group_col).alias("g"),
            F.to_date(F.col(ts_col)).alias("d"),
            F.col(value_col).cast("double").alias("v"),
        )
        .groupBy("g", "d")
        .agg(F.avg("v").alias("x"))
    )
    tot = Window.partitionBy("g")
    cum = (
        Window.partitionBy("g")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = Window.partitionBy("g").orderBy("d")
    scored = daily.select(
        "g",
        "d",
        "x",
        F.count("*").over(tot).alias("n_days"),
        (
            F.sum("x").over(cum)
            - F.row_number().over(seq)
            * (F.sum("x").over(tot) / F.count("*").over(tot))
        ).alias("s"),
        F.sum("x").over(cum).alias("cx"),
        F.row_number().over(seq).alias("i"),
        F.sum("x").over(tot).alias("tx"),
    )
    pick = Window.partitionBy("g").orderBy(
        F.desc(F.abs(F.col("s"))), F.asc("d")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(pick))
        .where(F.col("rnk") == 1)
        .select(
            F.col("g").alias(group_col),
            F.col("n_days").cast("long").alias("n_days"),
            # ISO string, not DATE: dtype-stable across engines/pandas
            F.date_format("d", "yyyy-MM-dd").alias("shift_day"),
            F.round(F.abs(F.col("s")), 6).alias("cusum_max"),
            F.round(F.col("cx") / F.col("i"), 6).alias("mean_before"),
            F.coalesce(
                F.when(
                    F.col("n_days") > F.col("i"),
                    F.round(
                        (F.col("tx") - F.col("cx"))
                        / (F.col("n_days") - F.col("i")).cast("double"),
                        6,
                    ),
                ),
                F.lit(0.0),
            ).alias("mean_after"),
        )
    )


def daily_autocorrelation(
    events: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation of the DAILY event-count series at lags
    1..max_lag — the "does ingest have a weekly pulse?" diagnostic that
    tells a drift monitor which lag to deseasonalize by before its
    thresholds mean anything. r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)²
    over the contiguous day spine from min to max day, MISSING DAYS
    COUNT AS ZERO events (a gap is real signal for an ingest series,
    and without the spine the lag operator would silently compare
    non-adjacent days).

    Output: (lag, n_days, r) with r at 6 dp, NULL when the series is
    constant or shorter than lag+1 days. Scale shape: the corpus
    collapses to (day, n) in one groupBy; the spine, the single-series
    lag window and the final sums all run on the day table (thousands
    of rows for years of data) — the one-partition window is over
    days, never events.
    """
    if max_lag < 1:
        raise ValueError("daily_autocorrelation needs max_lag >= 1")
    from pyspark.sql.window import Window

    daily = events.groupBy(
        F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count("*").cast("double").alias("n"))
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    series = spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0.0)).alias("x")
    )
    mu_tot = series.agg(
        F.avg("x").alias("mu"),
        F.count("*").cast("long").alias("n_days"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("x").alias("sx"),
    )
    w = Window.orderBy("day")
    lagged = series.select(
        "x",
        *[
            F.lag("x", k).over(w).alias(f"x_{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    # numerator sums per lag in one agg over the day table
    num = lagged.agg(
        *[
            F.sum(
                F.when(
                    F.col(f"x_{k}").isNotNull(),
                    F.col("x") * F.col(f"x_{k}"),
                )
            ).alias(f"sxy_{k}")
            for k in range(1, max_lag + 1)
        ],
        *[
            F.sum(F.when(F.col(f"x_{k}").isNotNull(), F.col("x"))).alias(
                f"sa_{k}"
            )
            for k in range(1, max_lag + 1)
        ],
        *[
            F.sum(
                F.when(F.col(f"x_{k}").isNotNull(), F.col(f"x_{k}"))
            ).alias(f"sb_{k}")
            for k in range(1, max_lag + 1)
        ],
        *[
            F.count(F.when(F.col(f"x_{k}").isNotNull(), 1)).alias(
                f"np_{k}"
            )
            for k in range(1, max_lag + 1)
        ],
    )
    rows = []
    for k in range(1, max_lag + 1):
        # Σ(x_t−μ)(x_{t−k}−μ) over the n−k overlapping terms, expanded
        # to sums so both engines do identical algebra
        numer = (
            F.col(f"sxy_{k}")
            - F.col("mu") * F.col(f"sa_{k}")
            - F.col("mu") * F.col(f"sb_{k}")
            + F.col(f"np_{k}") * F.col("mu") * F.col("mu")
        )
        denom = (
            F.col("sxx")
            - F.lit(2.0) * F.col("mu") * F.col("sx")
            + F.col("n_days") * F.col("mu") * F.col("mu")
        )
        rows.append(
            F.struct(
                F.lit(k).alias("lag"),
                F.col("n_days").alias("n_days"),
                F.round(
                    F.when(
                        (F.col(f"np_{k}") >= 1) & (denom > 0),
                        numer / denom,
                    ),
                    6,
                ).alias("r"),
            )
        )
    return (
        num.crossJoin(F.broadcast(mu_tot))
        .select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("lag")
    )
