"""Event-funnel and cohort-retention analytics over the events stream.

The corpus-operations use: ingest pipelines emit (crawl fetched → parsed
→ passed gates → exported) events per document batch, and "where do we
lose documents, and do sources come back" is a funnel + retention
question. The same operators serve product analytics unchanged.
(Reference analogue: corpusama logs per-stage counts, pipeline logging —
funnel/cohort over an event stream is the corpus-level generalization.)

Scale shape, both operators: every join and groupBy is keyed by user
(or cohort day) — linear exchanges, no windows over the global stream,
no per-user state beyond a handful of timestamps. Step chains build
N-1 user-keyed semi-join stages for an N-step funnel; each stage's
input shrinks monotonically (funnels only narrow).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps", "cohort_retention"]


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: per step, how many users reached it IN
    ORDER — step k counts users with an event of type steps[k] STRICTLY
    AFTER their step k-1 arrival (first-touch semantics: min qualifying
    timestamp per user at every step). Returns (step_idx, step, n_users,
    conv_rate) with conv_rate relative to step 1.

    Timestamps compare at full microsecond precision; ties (an event at
    exactly the prior step's instant) do NOT advance the funnel — the
    strict inequality is the deterministic choice and both engines agree
    on it exactly.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    u, t = user_col, ts_col
    reached = []  # per step: DataFrame(user, t_k)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(u)
        .agg(F.min(t).alias("_t"))
    )
    reached.append(cur)
    for st in steps[1:]:
        nxt = (
            events.where(F.col(type_col) == st)
            .join(cur.select(u, F.col("_t").alias("_prev")), u)
            .where(F.col(t) > F.col("_prev"))
            .groupBy(u)
            .agg(F.min(t).alias("_t"))
        )
        reached.append(nxt)
        cur = nxt
    counts = [
        df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i + 1).cast("long").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            "n_users",
        )
        for i, df in enumerate(reached)
    ]
    allc = reduce(lambda a, b: a.unionByName(b), counts)
    first = reached[0].agg(F.count("*").cast("long").alias("_n1"))
    return (
        allc.crossJoin(F.broadcast(first))
        .select(
            "step_idx",
            "step",
            "n_users",
            F.round(F.col("n_users") / F.col("_n1"), 6).alias("conv_rate"),
        )
        .orderBy("step_idx")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-cohort retention triangle: users grouped by their FIRST-event
    day; for every (cohort_day, day_offset) the count of distinct
    cohort users active that day. Cohort day is emitted as an ISO date
    STRING so the result is dtype-stable across engines and writers.

    Scale shape: one user-keyed min-aggregate for cohort assignment
    (map-side combinable), one broadcast-free user-keyed join back, and
    one (cohort, offset) groupBy over (user, day)-distinct rows —
    all linear, no global sort.
    """
    u = user_col
    day = F.to_date(F.col(ts_col)).alias("_day")
    firsts = (
        events.select(u, day)
        .groupBy(u)
        .agg(F.min("_day").alias("_cohort"))
    )
    active = events.select(u, day).distinct()
    return (
        active.join(firsts, u)
        .groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("_day"), F.col("_cohort"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.count_distinct(F.col(u)).cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )
