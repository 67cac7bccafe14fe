"""Misra-Gries heavy hitters with exact verify (X203)."""

import pytest


def _corpus(spark, n_parts):
    # 'hot' in 30% of rows, 'warm' in 12%, long unique tail
    rows = []
    for i in range(1000):
        toks = [f"tail{i}a", f"tail{i}b"]
        if i % 10 < 3:
            toks += ["hot", "hot"]
        if i % 25 < 3:
            toks.append("warm")
        rows.append((" ".join(toks),))
    return spark.createDataFrame(rows, "text string").repartition(n_parts)


def test_mg_exact_and_partition_invariant(spark):
    from corpusama_spark.operators.sketches import (
        misra_gries_heavy_hitters,
    )

    # exact truth from a plain groupBy
    df = _corpus(spark, 4)
    from pyspark.sql import functions as F

    toks = df.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t")
    ).where(F.length("t") > 0)
    n_total = toks.count()
    truth = {
        (r.t, r.n)
        for r in toks.groupBy("t")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 0.02 * n_total)
        .collect()
    }
    assert truth  # 'hot' qualifies

    for parts in (1, 4, 13):
        got = {
            (r.token, r.n)
            for r in misra_gries_heavy_hitters(
                _corpus(spark, parts), "text", k=64, min_share=0.02
            ).collect()
        }
        assert got == truth, f"parts={parts}"


def test_mg_share_column_and_threshold_guard(spark):
    from corpusama_spark.operators.sketches import (
        misra_gries_heavy_hitters,
    )

    df = _corpus(spark, 3)
    out = misra_gries_heavy_hitters(df, "text", k=64, min_share=0.02)
    rows = out.collect()
    assert rows[0].token == "hot"
    assert abs(rows[0].share - rows[0].n / sum(
        r.n / r.share for r in rows[:1]
    )) < 1e-3  # share consistent with n / n_total
    with pytest.raises(ValueError):
        misra_gries_heavy_hitters(df, "text", k=10, min_share=0.05)
