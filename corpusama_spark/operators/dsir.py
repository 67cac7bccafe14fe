"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023) — as pure relational Spark.

Scores every document by how target-like its hashed unigram distribution is:

    weight(doc) = sum over tokens t of
        ln p_target(bucket(t)) - ln p_raw(bucket(t))

with add-one smoothing over ``k_buckets`` hashed feature buckets. Documents
with the highest weights are the ones importance resampling keeps when
curating a raw crawl toward a target domain (here: a language shard of the
corpus stands in for the target distribution, the whole corpus for raw).

Spark-first layout (no UDFs anywhere):

- one explode → one (doc, bucket) partial count: the ONLY corpus-sized
  shuffle, and it is the word-count shape (map-side combine collapses
  repeated tokens before the exchange);
- bucket statistics reduce from that table (≤ docs × k rows, second
  exchange is bucket-width, i.e. tiny);
- the ≤ k-row log-ratio table broadcasts back onto the per-doc-bucket
  table, so the scoring join moves no corpus data at all;
- the per-(doc, bucket) table is persisted because both the statistics
  and the scoring pass read it — the caller releases it via
  ``plans.caching.release``.

The token hash is portable md5 arithmetic (conv(substr(md5(t),1,6),16,10)
% k), so the entire pipeline is reproducible in any engine with md5 —
which is what makes the DuckDB oracle possible (`dsir_weights` in
__spark_entry__.py). At 10^12 rows you would swap the hash for xxhash64
(same knob as minhash/simhash's hash_family) and keep the identical plan.

Reference anchor: corpusama's corpus curation keeps/drops documents by
per-language heuristics (corpusama/corpus/langid.py) — DSIR is the
learned-distribution upgrade of that gate for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corpusama_spark.plans.caching import own_caches


def _bucket(token: Column, k_buckets: int) -> Column:
    # 24-bit md5 prefix → bucket id; portable across engines
    return (
        F.conv(F.substring(F.md5(token), 1, 6), 16, 10).cast("long")
        % F.lit(k_buckets)
    ).alias("bucket")


def dsir_logratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "is_target",
    k_buckets: int = 256,
    sep: str = " ",
) -> DataFrame:
    """(id, n_tokens, dsir_weight) — importance log-ratio per document.

    ``target_col`` is a boolean column marking the target-distribution
    subset. Every document (including empty ones, weight 0.0) appears in
    the output exactly once.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(target_col).cast("boolean").alias("is_tgt"),
        F.explode(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), sep)
        ).alias("token"),
    ).where(F.length("token") > 0)

    doc_buckets = (
        toks.select("id", "is_tgt", _bucket(F.col("token"), k_buckets))
        .groupBy("id", "is_tgt", "bucket")
        .agg(F.count("*").alias("n"))
        .persist()
    )

    bucket_stats = doc_buckets.groupBy("bucket").agg(
        F.sum("n").alias("raw_c"),
        F.sum(F.when(F.col("is_tgt"), F.col("n")).otherwise(F.lit(0))).alias(
            "tgt_c"
        ),
    )
    totals = bucket_stats.agg(
        F.sum("raw_c").alias("raw_t"), F.sum("tgt_c").alias("tgt_t")
    )
    k = F.lit(float(k_buckets))
    ratios = bucket_stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("tgt_c") + 1.0) / (F.col("tgt_t") + k))
            - F.log((F.col("raw_c") + 1.0) / (F.col("raw_t") + k))
        ).alias("logratio"),
    )

    scored = (
        doc_buckets.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.col("n") * F.col("logratio")).alias("w"),
        )
    )
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.round(F.coalesce(F.col("w"), F.lit(0.0)), 6).alias("dsir_weight"),
        )
    )
    return own_caches(out, doc_buckets)
