"""X210: differentially-private noisy count release (Laplace mechanism,
deterministic inverse-CDF noise from md5)."""

import math

import pytest

from corpusama_spark.operators.privacy import dp_noisy_counts


def _mk(spark, n_per_group):
    rows = [(g, i) for g, n in n_per_group.items() for i in range(n)]
    return spark.createDataFrame(rows, "g string, i int")


def test_dp_counts_deterministic(spark):
    df = _mk(spark, {"a": 10, "b": 25, "c": 3})
    one = dp_noisy_counts(df, "g", epsilon=1.0).collect()
    two = dp_noisy_counts(df, "g", epsilon=1.0).collect()
    assert one == two
    # repartitioned input -> identical release (retry/layout-invariant)
    three = dp_noisy_counts(df.repartition(7), "g", epsilon=1.0).collect()
    assert sorted(one) == sorted(three)


def test_dp_counts_python_mirror(spark):
    """Noise replays exactly from the md5 inverse-CDF in plain python."""
    import hashlib

    df = _mk(spark, {"a": 10, "b": 25})
    eps = 0.5
    for r in dp_noisy_counts(df, "g", epsilon=eps, seed="dp").collect():
        h = int(hashlib.md5(f"dp:{r['g']}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        t = u - 0.5
        want = round(
            -(1.0 / eps) * math.copysign(1.0, t) * math.log(1 - 2 * abs(t)),
            6,
        )
        assert r["noise"] == pytest.approx(want, abs=1e-9)
        assert r["n_released"] == max(0, round(r["n_exact"] + want))
        assert r["epsilon"] == eps


def test_dp_counts_scale_with_epsilon(spark):
    """Same group, same u: noise scales exactly by the b = 1/eps ratio."""
    df = _mk(spark, {"a": 10})
    n1 = dp_noisy_counts(df, "g", epsilon=1.0).collect()[0]["noise"]
    n4 = dp_noisy_counts(df, "g", epsilon=0.25).collect()[0]["noise"]
    assert n4 == pytest.approx(4.0 * n1, abs=5e-6)


def test_dp_counts_never_negative_and_seed_sensitivity(spark):
    df = _mk(spark, {"tiny": 1})
    out = dp_noisy_counts(df, "g", epsilon=0.05, seed="dp").collect()[0]
    assert out["n_released"] >= 0
    alt = dp_noisy_counts(df, "g", epsilon=0.05, seed="dp2").collect()[0]
    assert alt["noise"] != out["noise"]


def test_dp_counts_mean_abs_noise_near_b(spark):
    """Across many groups the mean |noise| estimates b = 1/eps (Laplace
    mean absolute deviation) — the utility half of the DP contract."""
    df = _mk(spark, {f"g{i:03d}": 5 for i in range(200)})
    rows = dp_noisy_counts(df, "g", epsilon=1.0).collect()
    mad = sum(abs(r["noise"]) for r in rows) / len(rows)
    assert 0.7 <= mad <= 1.4
