"""Snapshot-log schema evolution (X239): add-column with initial default,
schema-inclusive time travel, inheritance, expiry preserving schema_as_of,
pre-evolution logs untouched."""

from pyspark.sql import functions as F

V1 = [
    {"name": "image_id", "type": "string", "default": None},
    {"name": "keep", "type": "boolean", "default": None},
]
V2 = V1 + [{"name": "lang_conf", "type": "double", "default": 0.0}]


def _write_wave(spark, out, bucket, rows, with_conf):
    df = spark.createDataFrame(
        [(f"img{bucket}-{i}", i % 2 == 0) + ((0.5 + i,) if with_conf else ())
         for i in range(rows)],
        "image_id string, keep boolean" + (", lang_conf double" if with_conf else ""),
    ).withColumn("bucket", F.lit(bucket))
    df.write.mode("append").partitionBy("bucket").parquet(out)


def test_add_column_evolution(spark, tmp_path):
    from corpusama_spark.snapshots import (
        commit_snapshot,
        read_as_of,
        schema_as_of,
    )

    out = str(tmp_path / "table")
    snaps = str(tmp_path / "snaps")

    _write_wave(spark, out, 0, 4, with_conf=False)
    s1 = commit_snapshot(snaps, "r", [0], 4, 2, schema=V1)
    _write_wave(spark, out, 1, 3, with_conf=True)
    s2 = commit_snapshot(snaps, "r", [1], 3, 2, schema=V2)

    assert schema_as_of(snaps, s1) == V1
    assert schema_as_of(snaps) == V2

    # latest read: unified schema, old bucket filled with the default
    cur = read_as_of(spark, out, snaps)
    assert set(cur.columns) == {"image_id", "keep", "lang_conf", "bucket"}
    rows = {r.image_id: r for r in cur.collect()}
    assert len(rows) == 7
    assert all(rows[f"img0-{i}"].lang_conf == 0.0 for i in range(4))
    assert rows["img1-0"].lang_conf == 0.5

    # time travel to s1: the new column does not exist yet
    old = read_as_of(spark, out, snaps, s1)
    assert "lang_conf" not in old.columns
    assert old.count() == 4


def test_schema_inheritance_and_brand_new_column(spark, tmp_path):
    from corpusama_spark.snapshots import (
        commit_snapshot,
        read_as_of,
        schema_as_of,
    )

    out = str(tmp_path / "t")
    snaps = str(tmp_path / "s")
    _write_wave(spark, out, 0, 2, with_conf=False)
    commit_snapshot(snaps, "r", [0], 2, 1, schema=V1)
    _write_wave(spark, out, 1, 2, with_conf=False)
    s2 = commit_snapshot(snaps, "r", [1], 2, 1)  # inherits V1
    assert schema_as_of(snaps, s2) == V1

    # evolve via metadata ONLY (no data written yet carries the column):
    v3 = V1 + [{"name": "score", "type": "bigint", "default": 7}]
    s3 = commit_snapshot(snaps, "r", [], 0, 0, schema=v3)
    cur = read_as_of(spark, out, snaps, s3)
    assert cur.count() == 4
    assert set(r.score for r in cur.collect()) == {7}


def test_expiry_preserves_schema_horizon(spark, tmp_path):
    from corpusama_spark.snapshots import (
        commit_snapshot,
        expire_snapshots,
        read_as_of,
        schema_as_of,
    )

    out = str(tmp_path / "t")
    snaps = str(tmp_path / "s")
    _write_wave(spark, out, 0, 2, with_conf=False)
    commit_snapshot(snaps, "r", [0], 2, 1, schema=V1)
    _write_wave(spark, out, 1, 2, with_conf=True)
    commit_snapshot(snaps, "r", [1], 2, 1, schema=V2)
    for b in (2, 3):
        _write_wave(spark, out, b, 2, with_conf=True)
        commit_snapshot(snaps, "r", [b], 2, 1)

    before = sorted(map(tuple, read_as_of(spark, out, snaps).collect()))
    expire_snapshots(snaps, keep_last=2)
    # the squashed base carries V2 so retained reads see the same schema
    assert schema_as_of(snaps) == V2
    after = sorted(map(tuple, read_as_of(spark, out, snaps).collect()))
    assert before == after


def test_pre_evolution_log_unchanged(spark, tmp_path):
    from corpusama_spark.snapshots import commit_snapshot, read_as_of, schema_as_of

    out = str(tmp_path / "t")
    snaps = str(tmp_path / "s")
    _write_wave(spark, out, 0, 3, with_conf=False)
    commit_snapshot(snaps, "r", [0], 3, 2)
    assert schema_as_of(snaps) is None
    df = read_as_of(spark, out, snaps)
    assert df.count() == 3 and "lang_conf" not in df.columns
