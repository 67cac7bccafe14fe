"""Exact per-group quantiles (operators/quantiles.py): python
recomputation of the type-1 convention, rank-edge q values, ties,
NULL exclusion, and the one-exchange plan pin. Contract query
`group_quantiles` is value-exact vs DuckDB quantile_disc."""

import math

from corpusama_spark.operators.quantiles import group_quantiles_exact
from corpusama_spark.plans.audit import report


def _py_q(vals, q):
    vals = sorted(vals)
    return vals[max(1, math.ceil(q * len(vals))) - 1]


def test_matches_python_type1(spark):
    data = {
        "a": [5.0, 1.0, 3.0, 2.0, 4.0],
        "b": [10.0, 20.0],
        "c": [7.0],
    }
    rows = [(k, v) for k, vs in data.items() for v in vs]
    qs = [0.0, 0.25, 0.5, 0.75, 0.99, 1.0]
    got = {
        (r.k, r.q): r.value
        for r in group_quantiles_exact(
            spark.createDataFrame(rows, "k string, v double"), "k", "v", qs
        ).collect()
    }
    for k, vs in data.items():
        for q in qs:
            assert got[(k, q)] == _py_q(vs, q), (k, q)


def test_ties_are_deterministic(spark):
    rows = [("a", v) for v in [1.0, 2.0, 2.0, 2.0, 9.0]]
    got = {
        r.q: r.value
        for r in group_quantiles_exact(
            spark.createDataFrame(rows, "k string, v double"),
            "k",
            "v",
            [0.25, 0.5, 0.75],
        ).collect()
    }
    assert got == {0.25: 2.0, 0.5: 2.0, 0.75: 2.0}


def test_nulls_excluded(spark):
    rows = [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)]
    got = [
        (r.k, r.q, r.value)
        for r in group_quantiles_exact(
            spark.createDataFrame(rows, "k string, v double"), "k", "v", [1.0]
        ).collect()
    ]
    # b has only NULLs -> no row; a's max over non-nulls is 3
    assert got == [("a", 1.0, 3.0)]


def test_plan_single_exchange(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    out = group_quantiles_exact(df, "k", "v", [0.5])
    report(out).assert_no_row_python().assert_max_shuffles(1)


def test_mad_outliers_flags_extreme_and_handles_degenerate(spark):
    from corpusama_spark.operators.quantiles import mad_outliers

    rows = [("a", i, v) for i, v in enumerate([10, 12, 11, 13, 12, 500])]
    rows += [("b", 100 + i, 7) for i in range(4)]  # constant group: MAD=0
    df = spark.createDataFrame(rows, "src string, rid long, val long")
    out = {r.rid: r for r in mad_outliers(df, "src", "val", 3.5).collect()}
    # group a: sorted [10,11,12,12,13,500] -> type-1 median = 12 (rank 3),
    # deviations [2,1,0,0,1,488] -> MAD = 1 (rank 3 of [0,0,1,1,2,488])
    assert out[5].med == 12 and out[5].mad == 1
    assert out[5].outlier is True and out[5].robust_z > 300
    assert out[0].outlier is False
    # degenerate group: NULL z and NULL flag, never a crash
    assert out[100].mad == 0 and out[100].robust_z is None
    assert out[100].outlier is None
