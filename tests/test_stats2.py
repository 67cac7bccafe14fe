"""Benford first-digit audit, McNemar paired gates, template prefix,
daily autocorrelation."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_benford_digits_and_chi2(spark):
    from corpusama_spark.operators.stats import benford_first_digit

    vals = [1.5, 12.0, 19.0, 2.3, 0.04, 999.0, -5.0, None, 0.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r.digit: r for r in benford_first_digit(df, "v").collect()}
    # digits: 1.5->1, 12->1, 19->1, 2.3->2, 0.04->4, 999->9, 100->1
    assert set(out) == set(range(1, 10))
    assert out[1].n == 4 and out[2].n == 1 and out[4].n == 1 and out[9].n == 1
    assert out[3].n == 0 and out[5].n == 0
    total = 7
    for d in range(1, 10):
        e = math.log10(1 + 1 / d)
        assert out[d].benford_share == round(e, 6)
        share = out[d].n / total
        assert abs(out[d].share - share) < 1e-6
        assert abs(out[d].chi2_term - total * (share - e) ** 2 / e) < 1e-4


def test_benford_power_of_ten_boundary(spark):
    from corpusama_spark.operators.stats import benford_first_digit

    df = spark.createDataFrame(
        [(0.1,), (1.0,), (10.0,), (1000.0,), (0.001,)], "v double"
    )
    out = {r.digit: r.n for r in benford_first_digit(df, "v").collect()}
    assert out[1] == 5  # every power of ten has first digit 1


def test_mcnemar_counts_and_chi2(spark):
    from corpusama_spark.operators.stats import mcnemar_gates

    rows = (
        [(True, True)] * 50
        + [(True, False)] * 8
        + [(False, True)] * 2
        + [(False, False)] * 40
        + [(None, True)] * 3
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    out = mcnemar_gates(df, "a", "b").collect()[0]
    assert (out.n_both_keep, out.n_a_only, out.n_b_only, out.n_both_drop) == (
        50, 8, 2, 40,
    )
    assert out.n_null == 3
    assert out.agreement == 0.9
    assert out.mcnemar_chi2 == round((8 - 2) ** 2 / 10, 6)


def test_mcnemar_no_disagreement_null_chi2(spark):
    from corpusama_spark.operators.stats import mcnemar_gates

    df = spark.createDataFrame(
        [(True, True), (False, False)], "a boolean, b boolean"
    )
    out = mcnemar_gates(df, "a", "b").collect()[0]
    assert out.agreement == 1.0 and out.mcnemar_chi2 is None


def test_template_prefix_detects_boilerplate(spark):
    from corpusama_spark.operators.curation import template_prefix

    df = spark.createDataFrame(
        [
            (1, "Stock photo: a cat", "a"),
            (2, "Stock photo: a dog", "a"),
            (3, "Stock photo: zebra", "a"),
            (4, "free text one", "b"),
            (5, "unrelated words", "b"),
            (6, "single doc here", "c"),
            (7, None, "d"),
            (8, "", "d"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in template_prefix(df, "text", "source").collect()}
    assert out["a"].prefix == "Stock photo: " and out["a"].n_docs == 3
    assert out["a"].prefix_len == len("Stock photo: ")
    # b: min="free text one", max="unrelated words" share no prefix
    assert out["b"].prefix == "" and out["b"].prefix_len == 0
    # singleton group: the whole text is the (degenerate) common prefix
    assert out["c"].prefix == "single doc here"
    # all-null/empty group still present with zero docs
    assert out["d"].n_docs == 0 and out["d"].prefix == ""


def test_template_prefix_divergence_inside_minmax(spark):
    """A string lexicographically between min and max must not extend
    the prefix beyond the min/max LCP (correctness of the min/max trick)."""
    from corpusama_spark.operators.curation import template_prefix

    df = spark.createDataFrame(
        [(1, "abcX", "g"), (2, "abcZ", "g"), (3, "abcY suffix", "g")],
        "doc_id long, text string, source string",
    )
    out = template_prefix(df, "text", "source").collect()[0]
    assert out.prefix == "abc"


def _acf_truth(xs, k):
    mu = np.mean(xs)
    num = sum((xs[t] - mu) * (xs[t - k] - mu) for t in range(k, len(xs)))
    den = sum((x - mu) ** 2 for x in xs)
    return num / den


def test_daily_autocorrelation_matches_formula(spark):
    from corpusama_spark.operators.trends import daily_autocorrelation

    # 14 days with a period-7 pulse; event count on day i = counts[i]
    counts = [10, 2, 3, 4, 5, 6, 7, 11, 2, 3, 4, 5, 6, 7]
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        day = dt.datetime(2024, 3, 1) + dt.timedelta(days=i)
        for _ in range(c):
            rows.append((eid, day + dt.timedelta(seconds=eid % 900)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r.lag: r for r in daily_autocorrelation(df, "ts", max_lag=7).collect()}
    assert all(out[k].n_days == 14 for k in out)
    for k in (1, 2, 7):
        assert abs(out[k].r - _acf_truth(counts, k)) < 1e-6
    # the weekly pulse shows: lag-7 autocorrelation dominates
    assert out[7].r > out[1].r and out[7].r > 0.4


def test_daily_autocorrelation_gap_counts_as_zero(spark):
    from corpusama_spark.operators.trends import daily_autocorrelation

    # events on day 0 and day 2 only; spine inserts day 1 with x=0
    rows = [(0, dt.datetime(2024, 1, 1)), (1, dt.datetime(2024, 1, 1)),
            (2, dt.datetime(2024, 1, 3))]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r.lag: r for r in daily_autocorrelation(df, "ts", max_lag=2).collect()}
    assert out[1].n_days == 3
    assert abs(out[1].r - _acf_truth([2.0, 0.0, 1.0], 1)) < 1e-6
    assert abs(out[2].r - _acf_truth([2.0, 0.0, 1.0], 2)) < 1e-6


def test_daily_autocorrelation_constant_series_null(spark):
    from corpusama_spark.operators.trends import daily_autocorrelation

    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(days=i)) for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = daily_autocorrelation(df, "ts", max_lag=1).collect()
    assert out[0].r is None  # one event every day -> zero variance


def test_mannwhitney_u_matches_scipy_formula(spark):
    from corpusama_spark.operators.stats import mannwhitney_u

    rows = [("a", v) for v in [1.0, 2.0, 2.0, 5.0, 7.0]] + [
        ("b", v) for v in [2.0, 3.0, 3.0, 8.0, 9.0, 10.0]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mannwhitney_u(df, "g", "v", "a", "b").first()
    # hand-computed midranks: 1:1, 2:(2+3+4)/3=3, 3:(5+6)/2=5.5, 5:7,
    # 7:8, 8:9, 9:10, 10:11 -> R_a = 1+3+3+7+8 = 22
    assert r.n_a == 5 and r.n_b == 6
    assert r.u_a == 22 - 5 * 6 / 2 == 7.0
    assert r.u_b == 5 * 6 - 7.0
    # z must be negative (group a ranks lower) and tie-corrected
    assert r.z < 0
    import math
    n = 11
    tie = (3**3 - 3) + (2**3 - 2)
    var = 5 * 6 / 12 * ((n + 1) - tie / (n * (n - 1)))
    assert abs(r.z - round((7.0 - 15.0) / math.sqrt(var), 6)) < 1e-9


def test_mannwhitney_u_degenerate_all_ties(spark):
    from corpusama_spark.operators.stats import mannwhitney_u

    df = spark.createDataFrame(
        [("a", 5.0)] * 3 + [("b", 5.0)] * 3, "g string, v double"
    )
    r = mannwhitney_u(df, "g", "v", "a", "b").first()
    # every value identical: U = n_a*n_b/2 exactly, variance 0 -> z NULL
    assert r.u_a == r.u_b == 4.5
    assert r.z is None
