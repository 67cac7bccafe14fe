"""Exact duplicate-substring spans via distributed suffix-array ranks.

"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2021) deduplicates at the SUBSTRING level: any span of ≥ L characters
that occurs twice anywhere in the corpus is a duplicate, regardless of
document boundaries. The winnowing tier (operators/dedup.py
repeated_spans) approximates this with fingerprint sampling; this
module computes it EXACTLY, using the prefix-doubling suffix-array
construction (Manber & Myers 1990) expressed as relational algebra:

- round 0 ranks every position by its single character;
- round k joins each position's rank with the rank of the position
  2^(k−1) ahead (−1 beyond the end) and densely re-ranks the pairs, so
  after k rounds equal ranks ⟺ equal 2^k-character prefixes;
- only ⌈log₂ L⌉ rounds are needed to detect duplicates of length ≥ L —
  the full suffix order is never materialized.

Dense re-ranking is NOT a single-partition window: distinct rank pairs
are range-repartitioned, counted per partition (one driver row per
partition), and offset-broadcast back — the same distributed
prefix-sum the interleave scheduler uses (curation.py), so every round
is shuffle-bounded by the distinct-pair table. The per-round join is a
corpus-sized equi-join on (doc, position) — the honest cost of suffix
sorting, log₂ L times.

Span semantics: a FULL position i (i + L ≤ len) whose rank-group has
≥ 2 members anywhere in the corpus marks [i, i+L); overlapping or
touching marks merge into maximal spans per document (gaps-and-islands
window per doc). Positions with a short tail can't start an L-length
duplicate and never join full positions' rank groups (their rank chain
hits the −1 sentinel where full chains hold real ranks).

The whole chain — ranks, groups, island merge — is replayed by the
DuckDB oracle against brute-force substr() grouping, so "exact" is a
checked claim, not a docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["duplicate_spans_exact"]


def _dense_ranks(keys: DataFrame) -> DataFrame:
    """(k1, k2) → + rank: dense rank of the distinct key pairs in
    (k1, k2) order, via range repartition + per-partition counts +
    broadcast offsets (no global window)."""
    spark = keys.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    ranged = (
        keys.repartitionByRange(n_parts, "k1", "k2")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    psums = sorted(
        (r.pid, r.n)
        for r in ranged.groupBy("pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, running = [], 0
    for pid, n in psums:
        offsets.append((pid, running))
        running += n
    off = spark.createDataFrame(offsets or [(0, 0)], "pid int, offset long")
    w = Window.partitionBy("pid").orderBy("k1", "k2")
    out = (
        ranged.join(F.broadcast(off), "pid")
        .withColumn(
            "rank", (F.col("offset") + F.row_number().over(w)).cast("long")
        )
        .drop("pid", "offset")
    )
    return out, ranged


def duplicate_spans_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 16,
) -> DataFrame:
    """(doc_id, start, span_len): maximal spans covered by an exact
    duplicate of length ≥ ``min_len`` (a power of two) occurring ≥ 2
    times anywhere in the corpus — Lee et al. 2021's dedup criterion,
    computed by ⌈log₂ L⌉ prefix-doubling rounds. ``start`` is 0-based.
    """
    L = int(min_len)
    if L < 2 or L & (L - 1):
        raise ValueError("min_len must be a power of two ≥ 2")
    base = docs.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("t")
    ).where(F.col("t").isNotNull() & (F.length("t") > 0))
    # base round at width W = min(8, L): rank positions by their W-char
    # substring DIRECTLY instead of single characters — one dense rank
    # replaces log2(W) corpus-wide join+rank rounds (measured 19.6 s →
    # the joins were the whole cost at sf0.1). Equality is unchanged: a
    # position's substring IS its suffix truncated at W, so two ranks
    # are equal ⟺ the char-chain (with its −1 sentinels) agreed — short
    # tails compare as their true shorter suffixes in both encodings.
    W = min(8, L)
    grams = base.select(
        "doc",
        "t",
        F.length("t").alias("len"),
        F.explode(F.sequence(F.lit(0), F.length("t") - 1)).alias("i"),
    ).select(
        "doc",
        "len",
        "i",
        F.col("t").substr(F.col("i") + 1, F.lit(W)).alias("g"),
    )
    caches = []
    gk, cache0 = _dense_ranks(
        grams.select(F.col("g").alias("k1"), F.lit(-1).alias("k2")).distinct()
    )
    caches.append(cache0)
    # localCheckpoint per round: each round references the previous
    # round's table TWICE (self-join with the shifted copy), so without
    # lineage truncation the logical plan doubles per round — 2^rounds
    # leaf copies blow up the optimizer long before any data moves
    # (the components.py hash-min loop hit the identical trap).
    pos = (
        grams.join(gk.select(F.col("k1").alias("g"), "rank"), "g")
        .select("doc", "len", "i", F.col("rank").alias("r"))
        .localCheckpoint()
    )
    off = W
    while off < L:
        ahead = pos.select(
            F.col("doc").alias("doc2"),
            (F.col("i") - off).alias("i2"),
            F.col("r").alias("r2"),
        )
        paired = pos.join(
            ahead,
            (F.col("doc") == F.col("doc2")) & (F.col("i") == F.col("i2")),
            "left",
        ).select(
            "doc",
            "len",
            "i",
            F.col("r").alias("k1"),
            F.coalesce(F.col("r2"), F.lit(-1)).alias("k2"),
        )
        rk, cache = _dense_ranks(paired.select("k1", "k2").distinct())
        caches.append(cache)
        pos = (
            paired.join(F.broadcast(rk), ["k1", "k2"])
            .select("doc", "len", "i", F.col("rank").alias("r"))
            .localCheckpoint()
        )
        off *= 2
    full = pos.where(F.col("i") + L <= F.col("len"))
    groups = (
        full.groupBy("r")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 2)
        .select("r")
    )
    dup = full.join(groups, "r").select("doc", "i")
    w_doc = Window.partitionBy("doc").orderBy("i")
    isl = dup.withColumn(
        "brk",
        F.when(
            F.lag("i").over(w_doc).isNull()
            | (F.col("i") - F.lag("i").over(w_doc) > L),
            1,
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("brk").over(
            w_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    out = (
        isl.groupBy("doc", "island")
        .agg(
            F.min("i").alias("start"),
            (F.max("i") + L - F.min("i")).alias("span_len"),
        )
        .select(
            F.col("doc").alias(id_col),
            F.col("start").cast("long"),
            F.col("span_len").cast("long"),
        )
        .orderBy(id_col, "start")
    )
    from corpusama_spark.plans.caching import own_caches

    return own_caches(out, *caches)
