"""Rendezvous (HRW) shard assignment + minimal-move audit (X193)."""

import hashlib


def _score(key, shard):
    return int(
        hashlib.md5(f"{key}|{shard}".encode()).hexdigest()[:8], 16
    )


def _assign(key, n):
    return max(range(n), key=lambda s: (_score(key, s), -s))


def test_rendezvous_matches_python_mirror_and_is_shuffle_free(spark):
    from corpusama_spark.operators.layout import rendezvous_assign

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    out = {r.k: r.shard for r in rendezvous_assign(df, "k", 8).collect()}
    for k in range(500):
        assert out[k] == _assign(k, 8), k
    plan = rendezvous_assign(df, "k", 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan-stage expression, no shuffle


def test_rendezvous_balance_and_minimal_moves(spark):
    from corpusama_spark.operators.layout import (
        rendezvous_assign,
        rendezvous_moves,
    )

    n_rows, n_old, n_new = 4000, 8, 10
    df = spark.range(0, n_rows).withColumnRenamed("id", "k")
    sizes = (
        rendezvous_assign(df, "k", n_old)
        .groupBy("shard")
        .count()
        .collect()
    )
    assert len(sizes) == n_old
    mean = n_rows / n_old
    assert all(0.7 * mean < r["count"] < 1.3 * mean for r in sizes)

    moves = rendezvous_moves(df, "k", n_old, n_new).collect()
    moved = sum(r.n for r in moves if r.moved)
    # HRW: expected moved share (n_new-n_old)/n_new = 0.2; mod-n would
    # move ~(n_new-1)/n_new = 0.9. Allow generous sampling noise.
    assert moved / n_rows < 0.3
    # every key that moved landed on one of the NEW shards
    assert all(r.new_shard >= n_old for r in moves if r.moved)
    assert abs(sum(r.share for r in moves) - 1.0) < 1e-6
