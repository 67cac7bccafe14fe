"""Secondary key index for point lookups on a bucket-partitioned table.

The decisions table is partitioned by phash bucket (the right layout for
the dedup/filter pipeline), which makes the other common access pattern —
"fetch THESE image_ids" (sample audits, takedown verification, label
joins) — a full-table scan: image_id carries no partition information.
The classic fix is a SECONDARY INDEX: a small (key → bucket) postings
table consulted first, so a point lookup reads only the buckets that can
contain its keys. Iceberg tracks per-file key bounds for this; a hashed
partition key defeats bounds, hence the explicit index (the same reason
databases index foreign keys).

Kept fresh WITHOUT rebuilds: the index is exactly an IVM-maintained
COUNT state over (key, bucket) — operators/ivm.py applies the signed
changelog deltas (X253/X258), so index maintenance costs the change,
never the table. Rebuild ≡ maintained is pinned by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from corpusama_spark.operators.ivm import aggregate_state, apply_changelog


def build_key_index(
    df: DataFrame, key: str = "image_id", bucket_col: str = "bucket"
) -> DataFrame:
    """(key, bucket, n): one posting per key per bucket it appears in.
    ``n`` (row count behind the posting) is what lets changelog deltas
    retract postings exactly when the LAST row leaves."""
    return aggregate_state(df.select(key, bucket_col), [key, bucket_col], [])


def maintain_key_index(
    index: DataFrame,
    changelog: DataFrame,
    key: str = "image_id",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Apply a row changelog (which must carry the bucket column) to the
    postings — inserts add weight, deletes retract, a key that moved
    buckets (update with a bucket change) retracts one posting and adds
    the other. Cost ∝ |changelog|."""
    return apply_changelog(index, changelog, [key, bucket_col], [])


def indexed_lookup(
    table: DataFrame,
    index: DataFrame,
    keys: DataFrame,
    key: str = "image_id",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Point lookup through the index: join the wanted keys against the
    postings, collect the (small, bounded-by-|keys|) bucket set on the
    driver, and read the table with a partition-pruning ``bucket IN``
    predicate plus the exact key semi-join. The table scan touches only
    the postings' buckets — the plan shows the partition filter."""
    hits = (
        keys.join(index, key)
        .select(bucket_col)
        .distinct()
        .collect()
    )
    buckets = sorted(r[bucket_col] for r in hits)
    if not buckets:
        return table.where(F.lit(False))
    return table.where(F.col(bucket_col).isin(buckets)).join(
        F.broadcast(keys.select(key).distinct()), key, "left_semi"
    )
