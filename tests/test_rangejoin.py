"""Bucketed range join (operators/rangejoin.py): python-recomputed
parity, inclusive boundary semantics, bucket-width invariance (the
replication factor must never change results), keyed co-partitioning,
and plan shape (equi-join, no nested loop, no row Python).

The contract query `range_count` is additionally value-exact vs
DuckDB's native BETWEEN range join (scripts/selfcheck.py).
"""

import datetime as dt

from pyspark.sql import functions as F

from corpusama_spark.operators.rangejoin import (
    bucketed_range_join,
    range_count,
)
from corpusama_spark.plans.audit import report


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


LEFT = [(i, _ts(t)) for i, t in enumerate([0, 10, 50, 100, 1000, 500])]
RIGHT = [
    (j, _ts(t), float(j)) for j, t in enumerate([5, 10, 15, 45, 60, 110, 999])
]


def _expected_pairs(lower_s: float, upper_s: float) -> set[tuple[int, int]]:
    out = set()
    for li, lt in LEFT:
        for rj, rt, _ in RIGHT:
            d = (rt - lt).total_seconds()
            if lower_s <= d <= upper_s:
                out.add((li, rj))
    return out


def _dfs(spark):
    left = spark.createDataFrame(LEFT, "lid long, lts timestamp")
    right = spark.createDataFrame(RIGHT, "rid long, rts timestamp, v double")
    return left, right


def test_pairs_match_python_inclusive_bounds(spark):
    left, right = _dfs(spark)
    got = {
        (r.lid, r.rid)
        for r in bucketed_range_join(
            left, right, "lts", "rts", -10_000_000, 10_000_000
        ).collect()
    }
    exp = _expected_pairs(-10, 10)
    assert got == exp
    # boundary rows: (lid=0, t=0) must include rid=1 at exactly +10 s
    assert (0, 1) in got


def test_asymmetric_lookback_only(spark):
    left, right = _dfs(spark)
    got = {
        (r.lid, r.rid)
        for r in bucketed_range_join(
            left, right, "lts", "rts", -15_000_000, 0
        ).collect()
    }
    assert got == _expected_pairs(-15, 0)


def test_bucket_width_invariance(spark):
    """Wider buckets change replication, never results."""
    left, right = _dfs(spark)
    base = None
    for width in (20_000_000, 60_000_000, 1_000_000_000):
        got = sorted(
            (r.lid, r.rid)
            for r in bucketed_range_join(
                left, right, "lts", "rts", -10_000_000, 10_000_000,
                width_us=width,
            ).collect()
        )
        if base is None:
            base = got
        assert got == base


def test_keyed_join_partitions_by_key(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(0)), (2, "b", _ts(0))], "lid long, k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [("a", _ts(5), 1.0), ("b", _ts(50), 2.0)],
        "k string, rts timestamp, v double",
    )
    got = {
        (r.lid, r.k)
        for r in bucketed_range_join(
            left, right, "lts", "rts", -10_000_000, 10_000_000, key="k"
        ).collect()
    }
    # b's only right row is out of range; a matches within its key only
    assert got == {(1, "a")}


def test_range_count_keeps_zero_match_rows(spark):
    left, right = _dfs(spark)
    got = {
        r.error_id: (r.n_matches, r.value_sum)
        for r in range_count(
            left.withColumnRenamed("lid", "error_id"),
            right,
            left_id="error_id",
            left_ts="lts",
            right_ts="rts",
            lower_us=-10_000_000,
            upper_us=10_000_000,
            value_col="v",
        ).collect()
    }
    exp_pairs = _expected_pairs(-10, 10)
    vals = {rj: v for rj, _, v in RIGHT}
    for li, _ in LEFT:
        matches = [rj for (l2, rj) in exp_pairs if l2 == li]
        assert got[li][0] == len(matches)
        assert abs(got[li][1] - round(sum(vals[m] for m in matches), 6)) < 1e-9
    assert got[5] == (0, 0.0)  # t=500: nothing within ±10 s -> kept


def test_plan_equi_join_no_nested_loop(spark):
    left, right = _dfs(spark)
    out = bucketed_range_join(
        left, right, "lts", "rts", -10_000_000, 10_000_000
    )
    report(out).assert_no_row_python()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
