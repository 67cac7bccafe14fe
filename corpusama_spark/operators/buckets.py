"""Aspect-ratio bucketing for image training batches.

Diffusion / vision-language training packs batches from images of ONE
target shape, so the curation pipeline must assign every image to the
aspect bucket whose ratio is nearest in log-space and account for the
pixel waste the center-crop to that ratio costs (SDXL-style bucketing).
The reference pipeline has no image lane; this is the §2.10 extension
family's bucketing prestep over the (w, h) metadata columns — bytes are
never touched.

Shape at 10^12 rows: the bucket ladder is a literal handful of entries,
so the argmin is a pure in-row ``array_min`` over (distance, bucket)
structs — ZERO joins, ZERO shuffles for the assignment; only the
summary pays one constant-width groupBy exchange.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (bucket_id, width, height) — a compact SDXL-like ladder around 1024px².
DEFAULT_BUCKETS: list[tuple[int, int, int]] = [
    (0, 512, 2048),
    (1, 640, 1536),
    (2, 768, 1344),
    (3, 896, 1152),
    (4, 1024, 1024),
    (5, 1152, 896),
    (6, 1344, 768),
    (7, 1536, 640),
    (8, 2048, 512),
]


def assign_aspect_buckets(
    df: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    buckets: list[tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Nearest-aspect bucket per image: argmin over |ln(w/h) − ln(bw/bh)|.

    Adds ``bucket_id``, ``bucket_w``, ``bucket_h`` and ``crop_waste`` (the
    fraction of source pixels a center-crop to the bucket ratio discards:
    1 − min(r, rb)/max(r, rb), 6 dp). The argmin is an in-row
    ``array_min`` over (distance, bucket_id, bw, bh) structs — struct
    ordering is lexicographic, so ties in log-distance break on the
    smaller bucket_id and the assignment is engine-deterministic. Rows
    with non-positive or null dims get bucket_id NULL (surfaced, not
    dropped — the metadata gate upstream owns rejecting them).
    """
    buckets = DEFAULT_BUCKETS if buckets is None else buckets
    lnr = F.log(F.col(w_col).cast("double") / F.col(h_col))
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    F.abs(lnr - F.lit(math.log(bw / bh))).alias("dist"),
                    F.lit(bid).alias("bucket_id"),
                    F.lit(bw).alias("bucket_w"),
                    F.lit(bh).alias("bucket_h"),
                )
                for bid, bw, bh in buckets
            ]
        )
    )
    valid = (
        F.col(w_col).isNotNull()
        & F.col(h_col).isNotNull()
        & (F.col(w_col) > 0)
        & (F.col(h_col) > 0)
    )
    picked = df.withColumn("_best", F.when(valid, best))
    ratio = F.col(w_col) / F.col(h_col)
    bratio = F.col("_best.bucket_w") / F.col("_best.bucket_h")
    waste = F.round(
        F.lit(1.0) - F.least(ratio, bratio) / F.greatest(ratio, bratio), 6
    )
    return picked.select(
        *df.columns,
        F.col("_best.bucket_id").alias("bucket_id"),
        F.col("_best.bucket_w").alias("bucket_w"),
        F.col("_best.bucket_h").alias("bucket_h"),
        F.when(F.col("_best").isNotNull(), waste).alias("crop_waste"),
    )


def aspect_bucket_summary(
    df: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    buckets: list[tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Per-bucket packing table: n images, share, mean crop waste, mean
    source megapixels — the table a batch scheduler sizes shards from.
    NULL-bucket rows (bad dims) surface as their own row."""
    assigned = assign_aspect_buckets(df, w_col, h_col, buckets)
    total = Window.partitionBy()
    return (
        assigned.groupBy("bucket_id", "bucket_w", "bucket_h")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("crop_waste"), 6).alias("mean_waste"),
            F.round(
                F.avg(F.col(w_col).cast("double") * F.col(h_col) / 1e6), 6
            ).alias("mean_mpix"),
        )
        .withColumn(
            "share", F.round(F.col("n") / F.sum("n").over(total), 6)
        )
        .orderBy(F.col("bucket_id").asc_nulls_last())
    )
