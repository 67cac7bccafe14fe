"""MERGE/upsert semantics (S4/S5: INSERT OR REPLACE, database.py:47-83)."""

from pyspark.sql import functions as F

from corpusama_spark.operators.upsert import merge_dataframes, merge_parquet


def test_merge_updates_beat_target(spark):
    target = spark.createDataFrame(
        [(1, "old-1"), (2, "old-2"), (3, "old-3")], ["id", "v"]
    )
    updates = spark.createDataFrame([(2, "new-2"), (4, "new-4")], ["id", "v"])
    got = {r.id: r.v for r in merge_dataframes(target, updates, "id").collect()}
    assert got == {1: "old-1", 2: "new-2", 3: "old-3", 4: "new-4"}


def test_merge_order_col_picks_latest(spark):
    target = spark.createDataFrame([(1, "a", 10)], ["id", "v", "ts"])
    updates = spark.createDataFrame(
        [(1, "mid", 20), (1, "latest", 30)], ["id", "v", "ts"]
    )
    got = merge_dataframes(target, updates, "id", order_col="ts").collect()
    assert len(got) == 1 and got[0].v == "latest"


def test_merge_parquet_idempotent_replay(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(20)], ["id", "v"])
    merge_parquet(spark, path, base, "id")
    updates = spark.createDataFrame([(5, "V5"), (25, "V25")], ["id", "v"])
    merge_parquet(spark, path, updates, "id")
    first = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    # replaying the SAME merge must not change the table (restart safety)
    merge_parquet(spark, path, updates, "id")
    second = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert first == second
    assert dict(first)[5] == "V5" and dict(first)[25] == "V25"
    assert len(first) == 21
