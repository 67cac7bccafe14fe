"""Secondary key index (X266): lookup correctness + partition pruning in
the physical plan, IVM-maintained index == rebuilt index through moves
and retractions."""

from pyspark.sql import functions as F

from corpusama_spark.operators.keyindex import (
    build_key_index,
    indexed_lookup,
    maintain_key_index,
)
from corpusama_spark.operators.upsert import row_changelog


def _tbl(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bucket int, caption string"
    )


def test_lookup_reads_only_indexed_buckets(spark, tmp_path):
    out = str(tmp_path / "tbl")
    _tbl(
        spark,
        [(f"k{i}", i % 8, f"c{i}") for i in range(64)],
    ).write.partitionBy("bucket").mode("overwrite").parquet(out)
    table = spark.read.parquet(out)
    index = build_key_index(table)
    wanted = spark.createDataFrame([("k3",), ("k11",)], "image_id string")
    got = indexed_lookup(table, index, wanted)
    assert sorted(r.image_id for r in got.collect()) == ["k11", "k3"]
    # both keys hash to bucket 3 -> the scan's partition filter proves
    # the other 7 buckets are never read
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert got.where(F.col("bucket") != 3).count() == 0
    # missing key -> empty, no scan of anything
    none = indexed_lookup(
        table, index, spark.createDataFrame([("zzz",)], "image_id string")
    )
    assert none.count() == 0


def test_maintained_index_equals_rebuild(spark):
    before = _tbl(
        spark,
        [("a", 0, "x"), ("b", 1, "y"), ("c", 2, "z"), ("c", 2, "z2")],
    )
    after = _tbl(
        spark,
        [
            ("a", 5, "x"),      # key moved buckets
            ("c", 2, "z"),      # one of c's two rows retracted
            ("d", 3, "new"),    # new key
        ],
    )
    log = row_changelog(
        before, after, ("image_id", "caption"), ["bucket"]
    )
    # changelog keyed by (id, caption) so the bucket ranks as data; the
    # index maintenance regroups by (id, bucket)
    maintained = maintain_key_index(build_key_index(before), log)
    rebuilt = build_key_index(after)
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    m = {(r.image_id, r.bucket): r.n for r in maintained.collect()}
    assert ("a", 0) not in m and m[("a", 5)] == 1
    assert m[("c", 2)] == 1 and m[("d", 3)] == 1
