"""Drift / divergence / uncertainty operators (operators/drift.py) plus
cohen_kappa and neyman_allocation — hand-computed small cases."""

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

SPLIT = "2024-01-16"
PRE = datetime(2024, 1, 5)
POST = datetime(2024, 1, 25)


def test_psi_identical_distributions_is_zero(spark):
    from corpusama_spark.operators.drift import psi_report

    rows = []
    for i in range(100):
        v = float((i % 10) * 50 + 1)  # one value per bin, both sides
        rows.append((i, "t", PRE, v))
        rows.append((i + 100, "t", POST, v))
    df = spark.createDataFrame(
        rows, "id long, event_type string, ts timestamp, value double"
    )
    r = psi_report(df, "event_type", "value", "ts", SPLIT).collect()[0]
    assert r.n_ref == 100 and r.n_cur == 100
    assert r.psi == 0.0 and r.n_bins_used == 10
    assert r.ref_cover == 1.0 and r.cur_cover == 1.0


def test_psi_hand_case_and_coverage(spark):
    from corpusama_spark.operators.drift import psi_report

    # ref: 8 rows bin0, 2 rows bin1; cur: 2 rows bin0, 8 rows bin2
    rows = (
        [(i, "t", PRE, 10.0) for i in range(8)]
        + [(8, "t", PRE, 60.0), (9, "t", PRE, 70.0)]
        + [(10, "t", POST, 20.0), (11, "t", POST, 30.0)]
        + [(12 + i, "t", POST, 120.0) for i in range(8)]
    )
    df = spark.createDataFrame(
        rows, "id long, event_type string, ts timestamp, value double"
    )
    r = psi_report(df, "event_type", "value", "ts", SPLIT).collect()[0]
    # only bin0 is populated on both sides: pr=0.8, pc=0.2
    expected = (0.2 - 0.8) * math.log(0.2 / 0.8)
    assert r.n_bins_used == 1
    assert abs(r.psi - round(expected, 6)) < 1e-9
    assert r.ref_cover == 0.8 and r.cur_cover == 0.2


def test_ks_hand_case_matches_brute_force(spark):
    from corpusama_spark.operators.drift import ks_statistic

    ref = [1.0, 2.0, 3.0, 4.0]
    cur = [3.0, 4.0, 5.0, 6.0]
    rows = [(i, "t", PRE, v) for i, v in enumerate(ref)] + [
        (10 + i, "t", POST, v) for i, v in enumerate(cur)
    ]
    df = spark.createDataFrame(
        rows, "id long, event_type string, ts timestamp, value double"
    )
    r = ks_statistic(df, "event_type", "value", "ts", SPLIT).collect()[0]
    support = sorted(set(ref + cur))
    brute = max(
        abs(
            sum(1 for x in ref if x <= v) / len(ref)
            - sum(1 for x in cur if x <= v) / len(cur)
        )
        for v in support
    )
    assert abs(r.ks_d - round(brute, 6)) < 1e-9
    assert r.ks_d == 0.5 and r.ks_at == 2.0  # smallest argmax
    assert r.n_ref == 4 and r.n_cur == 4


def test_ks_identical_is_zero(spark):
    from corpusama_spark.operators.drift import ks_statistic

    rows = [(i, "t", PRE, float(i % 5)) for i in range(50)] + [
        (100 + i, "t", POST, float(i % 5)) for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "id long, event_type string, ts timestamp, value double"
    )
    r = ks_statistic(df, "event_type", "value", "ts", SPLIT).collect()[0]
    assert r.ks_d == 0.0


def test_jsd_disjoint_and_identical(spark):
    from corpusama_spark.operators.drift import js_divergence

    df = spark.createDataFrame(
        [
            ("a", "x x y"),
            ("b", "z z w"),  # disjoint vocab from a
            ("c", "p q"),
            ("d", "p q"),  # identical to rest-of-corpus? no — vs a+b+c
        ],
        "source string, text string",
    )
    out = {r.source: r for r in js_divergence(df, "source", "text").collect()}
    # a's vocab {x,y} appears nowhere else and a sees none of the rest:
    # JSD = ln 2 exactly, jsd_norm = 1
    assert out["a"].jsd_norm == 1.0
    assert abs(out["a"].jsd - round(math.log(2.0), 6)) < 1e-9
    assert out["a"].n_tokens == 3 and out["a"].vocab == 2


def test_jsd_same_distribution_is_zero(spark):
    from corpusama_spark.operators.drift import js_divergence

    # two groups with IDENTICAL unigram distributions -> each vs rest = 0
    df = spark.createDataFrame(
        [("a", "x y x"), ("b", "y x x")], "source string, text string"
    )
    out = js_divergence(df, "source", "text").collect()
    assert all(r.jsd == 0.0 and r.jsd_norm == 0.0 for r in out)


def test_cohen_kappa_hand_confusion(spark):
    from corpusama_spark.operators.classifier import cohen_kappa

    # confusion: n11=20, n10=5, n01=10, n00=15 -> classic worked example
    rows = (
        [(i, True, True) for i in range(20)]
        + [(100 + i, True, False) for i in range(5)]
        + [(200 + i, False, True) for i in range(10)]
        + [(300 + i, False, False) for i in range(15)]
    )
    df = spark.createDataFrame(rows, "id long, a boolean, b boolean")
    r = cohen_kappa(df, F.col("a"), F.col("b")).collect()[0]
    n = 50.0
    po = 35 / n
    pe = (25 * 30 + 25 * 20) / (n * n)
    assert r.n11 == 20 and r.n10 == 5 and r.n01 == 10 and r.n00 == 15
    assert r.po == round(po, 6) and r.pe == round(pe, 6)
    assert abs(r.kappa - round((po - pe) / (1 - pe), 6)) < 1e-9


def test_cohen_kappa_degenerate_constant_gates(spark):
    from corpusama_spark.operators.classifier import cohen_kappa

    df = spark.createDataFrame(
        [(i, True, True) for i in range(10)], "id long, a boolean, b boolean"
    )
    r = cohen_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert r.po == 1.0 and r.pe == 1.0 and r.kappa == 0.0


def test_neyman_allocation_sums_to_budget_and_favors_variance(spark):
    from corpusama_spark.operators.curation import neyman_allocation

    rows = (
        # stratum "flat": 100 rows, constant value -> sh = 0 -> alloc 0-ish
        [(i, "flat", 50) for i in range(100)]
        # stratum "wild": 100 rows alternating 0/100 -> sh = 50
        + [(100 + i, "wild", (i % 2) * 100) for i in range(100)]
        # stratum "mild": 200 rows alternating 40/60 -> sh = 10
        + [(200 + i, "mild", 40 + (i % 2) * 20) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "id long, src string, v long")
    out = {r.src: r for r in neyman_allocation(df, "src", "v", 100).collect()}
    assert sum(r.alloc for r in out.values()) == 100
    # weights: flat 0, wild 5000, mild 2000 -> 0 / ~71.43 / ~28.57
    assert out["flat"].alloc == 0
    assert out["wild"].alloc == 71 and out["mild"].alloc == 29
    assert out["wild"].sh == 50.0 and out["mild"].sh == 10.0


def test_neyman_allocation_degenerate_all_constant(spark):
    from corpusama_spark.operators.curation import neyman_allocation

    rows = [(i, "a", 5) for i in range(30)] + [
        (100 + i, "b", 7) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, src string, v long")
    out = {r.src: r for r in neyman_allocation(df, "src", "v", 20).collect()}
    # falls back to proportional-to-size: 15 / 5
    assert out["a"].alloc == 15 and out["b"].alloc == 5


def test_bootstrap_ci_constant_values_collapse(spark):
    from corpusama_spark.operators.drift import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, "s", 42) for i in range(200)], "doc_id long, src string, v long"
    )
    r = bootstrap_mean_ci(df, "src", "v", "doc_id", b=64).collect()[0]
    # every replicate mean is exactly 42 regardless of weights
    assert r.mean == 42.0 and r.ci_lo == 42.0 and r.ci_hi == 42.0
    assert r.n == 200 and r.n_boot == 64


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from corpusama_spark.operators.drift import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, "s", i % 100) for i in range(500)],
        "doc_id long, src string, v long",
    )
    a = bootstrap_mean_ci(df, "src", "v", "doc_id", b=64).collect()[0]
    b = bootstrap_mean_ci(
        df.repartition(7), "src", "v", "doc_id", b=64
    ).collect()[0]
    assert a.ci_lo <= a.mean <= a.ci_hi
    assert a.ci_lo < a.ci_hi  # non-degenerate data -> real interval
    assert (a.ci_lo, a.ci_hi, a.mean) == (b.ci_lo, b.ci_hi, b.mean)


def test_drift_queries_have_no_row_python(spark):
    import __spark_entry__ as e
    from corpusama_spark.session import assert_no_row_python

    for name in (
        "kappa_agreement",
        "psi_drift",
        "ks_drift",
        "jsd_sources",
        "neyman_alloc",
        "bootstrap_ci",
    ):
        assert_no_row_python(
            e.queries()[name](spark, "/root/testdata/sf0.001")
        )


def test_wasserstein_identical_is_zero_and_shift_is_exact(spark):
    """W1 of identical samples is 0; shifting every value by a constant
    c moves W1 to exactly c (translation property of earth-mover)."""
    from corpusama_spark.operators.drift import wasserstein_1d

    vals = [1.0, 2.0, 5.0, 9.0] * 5
    rows = [("same", v, PRE) for v in vals] + [
        ("same", v, POST) for v in vals
    ]
    rows += [("shift", v, PRE) for v in vals] + [
        ("shift", v + 3.0, POST) for v in vals
    ]
    df = spark.createDataFrame(rows, ["event_type", "value", "ts"])
    out = {
        r["event_type"]: r
        for r in wasserstein_1d(
            df, "event_type", "value", "ts", SPLIT
        ).collect()
    }
    assert out["same"]["w1"] == 0.0
    assert out["shift"]["w1"] == pytest.approx(3.0, abs=1e-6)
    assert out["shift"]["n_ref"] == 20 and out["shift"]["n_cur"] == 20


def test_wasserstein_matches_scipy_formula_brute(spark):
    """Hand case against the sorted-sample closed form: for equal-size
    samples W1 = mean |sorted_a - sorted_b|."""
    from corpusama_spark.operators.drift import wasserstein_1d

    a = [1.0, 4.0, 4.0, 7.0]
    b = [2.0, 3.0, 5.0, 11.0]
    expect = sum(abs(x - y) for x, y in zip(sorted(a), sorted(b))) / 4
    rows = [("g", v, PRE) for v in a] + [("g", v, POST) for v in b]
    df = spark.createDataFrame(rows, ["event_type", "value", "ts"])
    (row,) = wasserstein_1d(
        df, "event_type", "value", "ts", SPLIT
    ).collect()
    assert row["w1"] == pytest.approx(expect, abs=1e-6)


def test_wasserstein_one_sided_group_is_null(spark):
    from corpusama_spark.operators.drift import wasserstein_1d

    df = spark.createDataFrame(
        [("only_ref", 1.0, PRE), ("only_ref", 2.0, PRE)],
        ["event_type", "value", "ts"],
    )
    (row,) = wasserstein_1d(
        df, "event_type", "value", "ts", SPLIT
    ).collect()
    assert row["w1"] is None
