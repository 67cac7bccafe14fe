"""As-of join (operators/asof.py): pandas.merge_asof parity in both
directions, tolerance semantics, LEFT-join NULLs, and the plan shape
(one key exchange, no pair blowup, no row-at-a-time Python).

The contract query `asof_attrib` is additionally checked value-exact
against DuckDB's NATIVE ``ASOF LEFT JOIN`` by scripts/selfcheck.py —
two independent implementations of the same semantics.
"""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from corpusama_spark.operators.asof import asof_join
from corpusama_spark.plans.audit import report


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames():
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "ts": [_ts(10), _ts(20), _ts(5), _ts(7), _ts(100), _ts(50)],
            "lv": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 4],
            "ts": [_ts(8), _ts(10), _ts(15), _ts(30), _ts(1)],
            "rv": [100.0, 200.0, 300.0, 400.0, 500.0],
        }
    )
    return left, right


def _expected(direction: str, tolerance=None) -> pd.DataFrame:
    left, right = _frames()
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "r_ts"}),
        left_on="ts",
        right_on="r_ts",
        by="k",
        direction=direction,
        tolerance=tolerance,
    )
    return exp.sort_values(["k", "ts"]).reset_index(drop=True)


def _got(spark, direction: str, max_gap_us=None) -> pd.DataFrame:
    left, right = _frames()
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    out = asof_join(
        ldf, rdf, on="k", ts="ts", right_payload=["rv"],
        direction=direction, max_gap_us=max_gap_us,
    )
    return (
        out.toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )


def test_backward_matches_pandas(spark):
    got = _got(spark, "backward")
    exp = _expected("backward")
    pd.testing.assert_series_equal(got["r_rv"], exp["rv"], check_names=False)
    pd.testing.assert_series_equal(got["r_ts"], exp["r_ts"], check_names=False)
    # k=3 has no right rows at all -> NULL payload (LEFT semantics)
    assert got[got.k == 3]["r_rv"].isna().all()
    # equal-ts pair (k=1, ts=10) matches inclusively
    assert got[(got.k == 1) & (got.lv == 1.0)]["r_rv"].iloc[0] == 200.0


def test_forward_matches_pandas(spark):
    got = _got(spark, "forward")
    exp = _expected("forward")
    pd.testing.assert_series_equal(got["r_rv"], exp["rv"], check_names=False)
    pd.testing.assert_series_equal(got["r_ts"], exp["r_ts"], check_names=False)


def test_tolerance_matches_pandas(spark):
    tol_s = 6
    got = _got(spark, "backward", max_gap_us=tol_s * 1_000_000)
    exp = _expected("backward", tolerance=pd.Timedelta(seconds=tol_s))
    pd.testing.assert_series_equal(got["r_rv"], exp["rv"], check_names=False)
    # the k=2 ts=100 row had a match at ts=30 -> nulled by the 6 s bound
    assert got[(got.k == 2) & (got.lv == 5.0)]["r_rv"].isna().all()


def test_plan_one_exchange_no_python(spark):
    left, right = _frames()
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        ts="ts",
        right_payload=["rv"],
    )
    rep = report(out).assert_no_row_python()
    # union-scan: exactly ONE shuffle (the key exchange for the window);
    # no join operator at all, hence no pair materialization
    rep.assert_max_shuffles(1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
