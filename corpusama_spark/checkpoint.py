"""Checkpointed, restartable execution (north_rule resumability).

The reference resumes API harvests from `max(date.changed)` and tolerates
abort/restart because writes are PK-idempotent (`INSERT OR REPLACE`,
corpusama/source/reliefweb.py:47-63; database.py:57) and skips already-built
outputs (secondary_pipeline.py:282-287). The Spark equivalent:

- work is partitioned by `bucket = pmod(phash, nbuckets)` (the Iceberg
  `bucket(N, phash)` transform shape);
- each completed bucket appends a manifest row (bucket, run stats, ts) — the
  `_log` analogue;
- output uses dynamic partition overwrite, so re-running a bucket replaces
  its files exactly (idempotent replay);
- on restart, buckets already in the manifest are skipped via partition
  pruning on the bucket column.

With an Iceberg catalog the manifest + overwrite pair collapses into
snapshot commits; the interface below is format-agnostic on purpose.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corpusama_spark.pipeline import FilterConfig, lineage, run_pipeline


def add_bucket(df: DataFrame, nbuckets: int) -> DataFrame:
    if "bucket" in df.columns:
        return df
    return df.withColumn(
        "bucket", F.pmod(F.col("phash"), F.lit(nbuckets)).cast("int")
    )


def completed_buckets(spark: SparkSession, manifest_path: str) -> set[int]:
    if not pathlib.Path(manifest_path).exists():
        return set()
    rows = spark.read.parquet(manifest_path).select("bucket").distinct().collect()
    return {r.bucket for r in rows}


def run_checkpointed(
    spark: SparkSession,
    captions: DataFrame,
    out_path: str,
    manifest_path: str,
    config: FilterConfig = FilterConfig(),
    run_id: str = "run-0",
    fail_after_buckets: int | None = None,
) -> int:
    """Run the filter job bucket-group-wise with mid-run restartability.

    Returns the number of buckets processed this invocation.
    ``fail_after_buckets`` injects a crash for restart tests (the reference's
    abort/restart contract, reliefweb.py:55-56).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df = add_bucket(captions, config.nbuckets)
    done = completed_buckets(spark, manifest_path)
    todo = sorted(
        r.bucket for r in df.select("bucket").distinct().collect() if r.bucket not in done
    )
    if not todo:
        return 0

    # group buckets into waves so a restart loses at most one wave; each wave
    # is a partition-pruned scan + dynamic-partition-overwrite write
    wave_size = max(1, len(todo) // 4)
    processed = 0
    for i in range(0, len(todo), wave_size):
        wave = todo[i : i + wave_size]
        part = df.where(F.col("bucket").isin([int(b) for b in wave]))
        decisions = run_pipeline(part, config)
        (
            decisions.withColumn(
                "bucket", F.pmod(F.col("phash"), F.lit(config.nbuckets)).cast("int")
            )
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out_path)
        )
        lineage(decisions, run_id, config.nbuckets).write.mode("append").parquet(
            manifest_path
        )
        processed += len(wave)
        if fail_after_buckets is not None and processed >= fail_after_buckets:
            raise RuntimeError(f"injected failure after {processed} buckets")
    return processed
