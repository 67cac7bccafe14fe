"""The flagship quality-filter pipeline.

Spark-first re-expression of the reference's end-to-end flow
(rw_corpora_update.py:36-79): ingest → language-ID → attributes → filtered
export, collapsed into ONE declarative plan over the captions table:

    captions ──(salted repartition)──► prep UDF (normalize+clean, 1 Arrow pass)
        ├─► perplexity UDF, scrub exprs, image-verify UDF      (all narrow)
        └─► posexplode lines ─► langid UDF ─► share agg ─┐     (1 shuffle)
    ◄──────────── join lid on image_id ◄─────────────────┘     (2nd shuffle,
    rules (pure exprs) ─► keep / drop_reason                    bytes pruned)

Scale notes (the 100 TB story):
- Exactly two shuffles: the lid aggregation (partial/final hash agg) and the
  lid join back. The joined side drops `bytes` first, so image payloads never
  cross a shuffle.
- The UDF-heavy stage is preceded by an explicit salted repartition —
  `repartition(pmod(phash, nbuckets), salt)` — because caption-length skew
  concentrates UDF cost; AQE alone cannot rebalance a narrow UDF stage
  (SURVEY.md §4). Salt = pmod(xxhash64(image_id), salt_buckets).
- All predicates are JVM expressions: whole-stage codegen end-to-end except
  the three Arrow UDF exchanges (prep, langid, ppl+image).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from corpusama_spark.functions import langid as L
from corpusama_spark.functions import textrules as T
from corpusama_spark.functions.images import verify_image
from corpusama_spark.functions.perplexity import DEFAULT_PPL_THRESHOLD, perplexity
from corpusama_spark.functions.scrub import scrub_caption


@dataclass(frozen=True)
class FilterConfig:
    """Thresholds; defaults mirror the reference's
    (min_portion export.py:77; min_len corpus/langid.py:105-111; token bound
    secondary_pipeline.py:226-239; threshold corpus/langid.py:98)."""

    target_lang: str | None = None  # None: keep any non-unknown l1
    min_portion: float = 0.8
    min_len: int = 10
    min_caption_chars: int = 10
    min_tokens: int = 4
    threshold: float = 0.6
    max_langs: int = 4
    ppl_threshold: float = DEFAULT_PPL_THRESHOLD
    nbuckets: int = 64
    salt_buckets: int = 8
    repartition: bool = True
    num_partitions: int | None = None  # None: 2x defaultParallelism


def run_pipeline(captions: DataFrame, config: FilterConfig = FilterConfig()) -> DataFrame:
    """captions table → decision table (no bytes column in output)."""
    df = captions
    if config.repartition:
        # explicit partition COUNT, not just keys: a column-only repartition
        # has shuffle origin REPARTITION_BY_COL, which AQE may coalesce down
        # to its advisory size — collapsing the Arrow-UDF-heavy stage to a
        # handful of tasks (observed: 1 task at local[32]). A user-specified
        # number is preserved by AQE, keeping the UDF stage at full fan-out.
        n_parts = config.num_partitions or (
            2 * df.sparkSession.sparkContext.defaultParallelism
        )
        df = df.repartition(
            n_parts,
            F.pmod(F.col("phash"), F.lit(config.nbuckets)),
            F.pmod(F.xxhash64("image_id"), F.lit(config.salt_buckets)),
        )

    enriched = (
        df.withColumn("_p", T.prep_caption("caption"))
        .withColumn("caption_norm", F.col("_p.caption_norm"))
        .withColumn("lines", F.col("_p.lines"))
        .drop("_p")
        .withColumn("ppl", perplexity("caption_norm"))
        .withColumn("caption_scrubbed", scrub_caption("caption_norm"))
        .withColumn("_iv", verify_image())
        .withColumn("image_ok", F.col("_iv.image_ok"))
        .withColumn("image_reason", F.col("_iv.image_reason"))
        .withColumn("image_psnr", F.col("_iv.image_psnr"))
        .drop("_iv", "bytes")
    )

    labeled = L.label_lines(
        L.explode_lines(enriched.select("image_id", "lines")),
        min_len=config.min_len,
        threshold=config.threshold,
    )
    lid = L.aggregate_lid(labeled, max_langs=config.max_langs)

    joined = enriched.drop("lines").join(lid, "image_id", "left")

    total_chars = F.length(T.collapse_ws_col(F.coalesce("caption_norm", F.lit(""))))
    total_tokens = T.token_count_col(
        T.collapse_ws_col(F.coalesce("caption_norm", F.lit("")))
    )
    if config.target_lang:
        # element_at on a missing key is NULL; NULL >= x is NULL and a NULL
        # `when` condition silently falls through — coalesce to False
        lang_ok = F.coalesce(
            L.lid_share("lid", config.target_lang) >= F.lit(config.min_portion),
            F.lit(False),
        )
    else:
        lang_ok = F.col("l1").isNotNull() & ~F.col("l1").isin("unknown", "short")

    drop_reason = (
        F.when(T.is_nanlike(F.col("caption")), "caption_missing")
        .when(F.col("lid").isNull() | (F.size("lid_arr") == 0), "caption_empty_norm")
        .when(total_chars < F.lit(config.min_caption_chars), "caption_too_short")
        .when(total_tokens < F.lit(config.min_tokens), "too_few_tokens")
        .when(~F.col("image_ok"), F.col("image_reason"))
        .when(~lang_ok, "lang_share")
        .when(F.col("ppl") > F.lit(config.ppl_threshold), "perplexity")
        .otherwise(F.lit(None).cast("string"))
    )

    return joined.withColumn("drop_reason", drop_reason).withColumn(
        "keep", F.col("drop_reason").isNull()
    )


def metrics(decisions: DataFrame) -> DataFrame:
    """Per-(fmt, drop_reason) counts + caption-length stats — the engine's
    `_log`-style metrics table (reliefweb.py:139-150; file_stats
    util/langid.py:528-567 / A8)."""
    return decisions.groupBy("fmt", "drop_reason").agg(
        F.count("*").alias("n"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.avg(F.length("caption_norm")).alias("avg_chars"),
        F.percentile_approx(
            F.length("caption_norm"), [0.0, 0.25, 0.5, 0.75, 1.0], 10000
        ).alias("chars_quartiles"),
    )


def lineage(decisions: DataFrame, run_id: str, nbuckets: int = 64) -> DataFrame:
    """Per-partition lineage rows (north_rule): bucket → counts + run stamp."""
    return decisions.groupBy(
        F.pmod(F.col("phash"), F.lit(nbuckets)).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.lit(run_id).alias("run_id"),
        F.date_trunc("second", F.current_timestamp()).alias("committed_at"),
    )
