"""Bucketed-table layout — co-located joins without shuffles.

The Iceberg story at 10^12 rows is `bucket(N, image_id)` partition
transforms + storage-partitioned joins; Spark's managed-table equivalent is
`bucketBy(N, key)`, which this module wraps. Two tables bucketed the same
way join with ZERO Exchange nodes (verified by tests/test_plans.py) — at
scale that converts the decisions⋈metadata / decisions⋈lineage joins from
full-corpus shuffles into local merges.

The reference has no bucketing concept (SQLite is one file); its analogue
is the PK index on `_raw.id` (reliefweb.sql:38-64) that makes its joins
cheap at its scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "image_id",
    nbuckets: int = 16,
    sort: bool = True,
) -> None:
    """Save as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(nbuckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
