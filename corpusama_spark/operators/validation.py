"""Pipeline canary validation (X250).

Continuous end-to-end validation for a deployed filter: inject a small
set of SYNTHETIC rows whose correct keep/drop verdict is known by
construction (clean caption → keep; empty caption → drop; corrupt image
bytes → drop; scrub-bait caption → keep AND must come back scrubbed),
run the normal pipeline over data+canaries together, then (a) verify
every canary got its expected verdict and (b) strip canaries from the
shipped output. A config push that silently flips a gate shows up as a
failed canary in the SAME run that would have shipped the damage —
cheaper and earlier than any downstream eval.

Canary ids are namespaced (``__canary__<name>``) so stripping is an
O(1)-per-row predicate, not a join; the verify side is one broadcast
join of a handful of rows. Deterministic bytes come from the repo's own
codec, so the image path is exercised for real.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["canary_rows", "inject_canaries", "verify_canaries", "strip_canaries"]

_PREFIX = "__canary__"


def canary_rows(spark: SparkSession) -> DataFrame:
    """The standard canary set as a captions-shaped DataFrame with an
    ``expected_keep`` sidecar column (dropped at injection): clean /
    empty-caption / none-string / corrupt-image / scrub-bait rows."""
    from corpusama_spark.io.imagecodec import encode_png

    rng = np.random.RandomState(1234)
    img = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    good = bytearray(encode_png(img))
    rows = [
        (
            f"{_PREFIX}clean",
            good,
            40,
            40,
            "png",
            "a clear photograph of a mountain lake at sunrise with calm "
            "water and pine trees along the shore",
            True,
        ),
        (f"{_PREFIX}empty_caption", good, 40, 40, "png", "", False),
        (f"{_PREFIX}none_string", good, 40, 40, "png", "None", False),
        (
            f"{_PREFIX}corrupt_image",
            bytearray(b"definitely not an image"),
            40,
            40,
            "png",
            "a valid caption attached to unreadable bytes should still drop",
            False,
        ),
        (
            f"{_PREFIX}scrub_bait",
            good,
            40,
            40,
            "png",
            "contact our ranger at ranger.lake@example.com for trail "
            "conditions near the northern campground area today",
            True,
        ),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, expected_keep boolean",
    )
    return df.withColumn(
        "phash",
        F.conv(F.substring(F.md5("image_id"), 1, 15), 16, 10).cast("long"),
    )


def inject_canaries(captions: DataFrame, canaries: DataFrame) -> DataFrame:
    """captions ∪ canaries (expectation column dropped) — run the normal
    pipeline over the result; nothing downstream special-cases them."""
    return captions.unionByName(
        canaries.drop("expected_keep").select(*captions.columns)
    )


def verify_canaries(
    decisions: DataFrame, canaries: DataFrame
) -> DataFrame:
    """(canary, expected_keep, actual_keep, scrubbed_ok, ok) — one row
    per canary. ``scrubbed_ok`` additionally demands the scrub-bait
    canary's output caption no longer contains an email (the scrub
    chain ran, not just the gate). A canary MISSING from decisions
    fails loudly (left join, ok=false)."""
    expect = F.broadcast(
        canaries.select(
            F.col("image_id"), F.col("expected_keep")
        )
    )
    got = decisions.where(F.col("image_id").startswith(_PREFIX)).select(
        "image_id",
        F.col("keep").alias("actual_keep"),
        F.col("caption_scrubbed"),
    )
    joined = expect.join(got, "image_id", "left")
    scrub_ok = F.when(
        F.col("image_id") == f"{_PREFIX}scrub_bait",
        F.col("caption_scrubbed").isNotNull()
        & ~F.col("caption_scrubbed").rlike(r"[\w.+-]+@[\w-]+\.[\w.]+"),
    ).otherwise(F.lit(True))
    ok = (
        F.col("actual_keep").isNotNull()
        & (F.col("actual_keep") == F.col("expected_keep"))
        & scrub_ok
    )
    return joined.select(
        F.regexp_replace("image_id", _PREFIX, "").alias("canary"),
        "expected_keep",
        "actual_keep",
        scrub_ok.alias("scrubbed_ok"),
        ok.alias("ok"),
    ).orderBy("canary")


def strip_canaries(decisions: DataFrame) -> DataFrame:
    """Shipped output = decisions minus canary rows (prefix predicate,
    scan-stage, no join)."""
    return decisions.where(~F.col("image_id").startswith(_PREFIX))
