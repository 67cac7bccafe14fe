"""Gate-rollout MDE audit (X230): closed-form parity, size/rate
monotonicity, degenerate rates."""

import math


def _mde(n, pos):
    p = pos / n
    return round(
        (1.959963984540054 + 0.8416212335729143)
        * math.sqrt(2.0 * p * (1.0 - p) / n),
        6,
    )


def test_rollout_power(spark):
    from corpusama_spark.operators.stats import rollout_power

    rows = (
        [("big", True)] * 32000 + [("big", False)] * 8000
        + [("small", True)] * 80 + [("small", False)] * 20
        + [("degenerate", False)] * 50
    )
    df = spark.createDataFrame(rows, "source string, keep boolean")
    out = {r.source: r for r in rollout_power(df, "source", "keep").collect()}

    assert out["big"].mde_abs == _mde(40000, 32000)
    assert out["small"].mde_abs == _mde(100, 80)
    assert out["big"].keep_rate == out["small"].keep_rate == 0.8
    # 400x the sample -> 20x finer detection horizon
    assert abs(out["small"].mde_abs / out["big"].mde_abs - 20.0) < 0.01
    assert out["big"].can_detect_1pct and not out["small"].can_detect_1pct
    # all-negative group: p = 0 -> mde 0, relative undefined
    d = out["degenerate"]
    assert (d.keep_rate, d.mde_abs, d.mde_rel) == (0.0, 0.0, None)
