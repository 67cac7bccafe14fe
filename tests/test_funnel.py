"""Event-funnel and cohort-retention operators."""

from datetime import datetime

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_requires_strict_order(spark):
    from corpusama_spark.operators.funnel import funnel_steps

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1 converts fully in order
        (1, "view", t(1)), (1, "click", t(2)), (1, "buy", t(3)),
        # user 2 clicks BEFORE viewing -> stops at view
        (2, "click", t(1)), (2, "view", t(2)),
        # user 3 views then clicks; no buy
        (3, "view", t(1)), (3, "click", t(5)),
        # user 4 never views -> counted nowhere
        (4, "buy", t(1)),
    ]
    out = funnel_steps(_ev(spark, rows), ["view", "click", "buy"]).collect()
    assert [(r.step_idx, r.step, r.n_users) for r in out] == [
        (1, "view", 3), (2, "click", 2), (3, "buy", 1),
    ]
    assert out[2].conv_rate == round(1 / 3, 6)


def test_funnel_tie_does_not_advance(spark):
    from corpusama_spark.operators.funnel import funnel_steps

    ts = datetime(2024, 1, 1, 12, 0, 0)
    rows = [(1, "view", ts), (1, "click", ts)]  # simultaneous
    out = funnel_steps(_ev(spark, rows), ["view", "click"]).collect()
    assert [(r.step, r.n_users) for r in out] == [("view", 1), ("click", 0)]


def test_cohort_retention_triangle(spark):
    from corpusama_spark.operators.funnel import cohort_retention

    d = lambda day, h=0: datetime(2024, 1, day, h)
    rows = [
        (1, "view", d(1)), (1, "view", d(1, 5)), (1, "view", d(3)),
        (2, "view", d(1)), (2, "view", d(2)),
        (3, "view", d(2)),
    ]
    out = {(r.cohort_day, r.day_offset): r.n_users
           for r in cohort_retention(_ev(spark, rows)).collect()}
    assert out[("2024-01-01", 0)] == 2      # users 1, 2 on their day 0
    assert out[("2024-01-01", 1)] == 1      # user 2 back next day
    assert out[("2024-01-01", 2)] == 1      # user 1 back on day 2
    assert out[("2024-01-02", 0)] == 1      # user 3's own cohort
    assert len(out) == 4                     # same-day dups collapse
