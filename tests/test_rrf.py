"""X211: reciprocal-rank fusion via range-partitioned global ranks."""

import pytest

from pyspark.sql import functions as F

from corpusama_spark.operators.ranking import rrf_fuse


def _df(spark):
    # id, a, b: signal a ranks 1..4 = d,c,b,a; signal b ranks 1..4 = a,b,c,d
    rows = [("a", 1.0, 9.0), ("b", 2.0, 7.0), ("c", 3.0, 5.0), ("d", 4.0, 1.0)]
    return spark.createDataFrame(rows, "id string, a double, b double")


def test_rrf_known_values(spark):
    out = rrf_fuse(
        _df(spark), "id", {"a": F.col("a"), "b": F.col("b")}, k=60
    ).collect()
    got = {r["id"]: r for r in out}
    assert got["a"]["rank_a"] == 4 and got["a"]["rank_b"] == 1
    assert got["d"]["rank_a"] == 1 and got["d"]["rank_b"] == 4
    for r in out:
        want = round(1 / (60 + r["rank_a"]) + 1 / (60 + r["rank_b"]), 9)
        assert r["rrf_score"] == pytest.approx(want, abs=1e-12)
    # a and d tie on score (ranks {1,4} both) -> id tiebreak puts a first
    assert [r["id"] for r in out[:2]] == ["a", "d"]


def test_rrf_tie_breaks_by_id(spark):
    rows = [("x", 5.0), ("y", 5.0), ("z", 5.0)]
    df = spark.createDataFrame(rows, "id string, s double")
    out = rrf_fuse(df, "id", {"s": F.col("s")}, k=60).collect()
    assert [r["rank_s"] for r in out] == [1, 2, 3]
    assert [r["id"] for r in out] == ["x", "y", "z"]


def test_rrf_layout_invariant(spark):
    rows = [(f"id{i:03d}", float((i * 37) % 101), float((i * 13) % 53))
            for i in range(200)]
    a = spark.createDataFrame(rows, "id string, a double, b double")
    sig = {"a": F.col("a"), "b": F.col("b")}
    r1 = rrf_fuse(a.repartition(3), "id", sig, topn=20).collect()
    r2 = rrf_fuse(a.repartition(17), "id", sig, topn=20).collect()
    assert r1 == r2
    assert len(r1) == 20


def test_rrf_matches_global_window_twin(spark):
    """The offset-trick global ranks equal a plain global row_number."""
    from pyspark.sql.window import Window

    rows = [(f"id{i:03d}", float((i * 7) % 31)) for i in range(120)]
    df = spark.createDataFrame(rows, "id string, s double")
    out = rrf_fuse(df, "id", {"s": F.col("s")}).select("id", "rank_s")
    twin = df.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.desc("s"), F.asc("id")))
        .cast("long")
        .alias("rank_s"),
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, twin.collect())
    )
