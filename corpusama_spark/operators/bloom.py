"""Distributed Bloom filter: build with a bit_or aggregation, probe with a
vectorized Arrow UDF over a broadcast bitmap.

The scale path the curation docstrings point at: when a membership set (eval
n-grams, historical doc hashes, hot boilerplate lines) outgrows a broadcast
HASH JOIN but its BITMAP still fits an executor (10^9 members at 10 bits/item
≈ 1.2 GB; 10^8 ≈ 120 MB), pre-filter with the Bloom filter in the scan stage
and keep the exact join only for the surviving ~fpp fraction. Bloom filters
have NO false negatives, so an exact join after the pre-filter returns
byte-identical results to the exact-only plan — pinned by test.

Construction never collects raw values: each value contributes k bit
positions (JVM xxhash64, seeds 0..k-1), positions fold into (word_idx,
1 << bit) pairs, and ONE bit_or aggregation produces at most n_bits/64 rows —
the only thing the driver ever materializes is the bitmap itself. This is the
same shape Dolma's dedup uses (Soldaini et al. 2024) with the build step made
shuffle-deliberate instead of a driver-side loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

__all__ = [
    "bloom_build",
    "bloom_might_contain",
    "bloom_positions",
    "bloom_shard_index",
    "bloom_pruning_audit",
]


def bloom_positions(col: Column, n_bits: int, k: int) -> Column:
    """array<long> of the k bit positions for a value — pure JVM
    (xxhash64 seeded by slot index via a second hash input), shared by the
    build and probe sides so membership is exact by construction."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits)) for i in range(k)]
    )


def bloom_build(
    df: DataFrame, col: Column, n_bits: int = 1 << 20, k: int = 5
) -> np.ndarray:
    """int64 word array (length n_bits/64) with every member's k bits set.
    One explode + one bit_or aggregation; the driver receives at most
    n_bits/64 rows regardless of member count."""
    if n_bits % 64:
        n_bits += 64 - (n_bits % 64)
    n_words = n_bits // 64
    pos = df.select(
        F.explode(bloom_positions(col, n_bits, k)).alias("pos")
    ).select(
        F.shiftright(F.col("pos"), 6).alias("idx"),
        # F.shiftleft only takes a literal shift amount; the per-row bit
        # index needs the SQL form
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
            "mask"
        ),
    )
    rows = pos.groupBy("idx").agg(F.bit_or("mask").alias("w")).collect()
    words = np.zeros(n_words, dtype=np.int64)
    for r in rows:
        words[r.idx] = r.w
    return words


def bloom_might_contain(
    df_spark_session,
    words: np.ndarray,
    col: Column,
    n_bits: int,
    k: int,
) -> Column:
    """Boolean membership test against a built bitmap. The bitmap rides a
    TorrentBroadcast (once per executor, not per task); positions are
    computed JVM-side and only the k-long position array enters the Arrow
    batch, so the probe is vectorized end to end."""
    if n_bits % 64:
        n_bits += 64 - (n_bits % 64)
    bc = df_spark_session.sparkContext.broadcast(words)
    kk = k

    @F.pandas_udf(BooleanType())
    def _probe(pos: pd.Series) -> pd.Series:
        w = bc.value
        flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in pos])
        hit = (w[flat >> 6] >> (flat & 63)) & 1
        return pd.Series(hit.reshape(-1, kk).all(axis=1))

    return _probe(bloom_positions(col, n_bits, k))


def _md5_positions(col: Column, n_bits: int, k: int) -> Column:
    """array<long> of k bit positions from md5 prefixes — the PORTABLE
    sibling of bloom_positions (xxhash64 is JVM-only; md5 exists in any
    engine, so audits built on these positions are DuckDB-oracle-able)."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), col.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % n_bits
            for i in range(k)
        ]
    )


def bloom_shard_index(
    df: DataFrame,
    shard_col: str,
    key_col: str,
    n_bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Per-shard Bloom index as a TABLE (X222): (shard, word_idx, word)
    rows with every shard member's k md5-derived bits OR-ed in — the
    Iceberg/Parquet per-file bloom-filter shape, kept relational instead
    of driver-side numpy (contrast bloom_build/X48, which materializes
    ONE global bitmap for scan-stage pre-filtering). One explode + one
    map-side-combinable (shard, word) bit_or; at most n_bits/60 rows per
    shard regardless of member count, and raw keys never leave their
    shard's scan."""
    # 60-bit words: bit index never reaches the sign bit, so the mask
    # shift is portable (DuckDB raises on 1::BIGINT << 63; Spark wraps)
    pos = df.select(
        F.col(shard_col).alias("shard"),
        F.explode(_md5_positions(F.col(key_col), n_bits, k)).alias("pos"),
    ).select(
        "shard",
        F.floor(F.col("pos") / 60).cast("long").alias("idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 60 AS INT))").alias(
            "mask"
        ),
    )
    return pos.groupBy("shard", "idx").agg(F.bit_or("mask").alias("word"))


def bloom_pruning_audit(
    df: DataFrame,
    probes: DataFrame,
    shard_col: str,
    key_col: str,
    n_bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Bloom shard-pruning audit (X222) — the point-lookup companion to
    the min/max scan-pruning audit (X202): for each probe key, how many
    shards would a Bloom-indexed reader touch (``n_probed``: every bit
    set) versus how many actually contain the key (``n_actual``), with

        skipped_share    = 1 − n_probed / n_shards     (I/O saved)
        false_probe_rate = (n_probed − n_actual) / (n_shards − n_actual)

    Bloom filters have no false negatives, so probed ⊇ actual always
    (pytest-pinned); false_probe_rate ≈ the filter's fpp and is how you
    size n_bits/k before trusting the index to skip a petabyte of
    shards. This is exactly the decision Iceberg/Parquet per-file bloom
    metadata drives.

    Scale shape (10^12 rows): the corpus collapses once into the
    per-shard index (bounded: shards × n_bits/64 rows) and once into the
    distinct (shard, probe-key) truth table restricted to probe keys
    (broadcast semi-join on the probe set BEFORE the distinct, so the
    exact branch never materializes the full key universe). The probe
    side is |probes| × k × |shards| rows — audit-bounded by
    construction. Everything is JVM bit math; DuckDB-oracle exact.
    """
    idx = bloom_shard_index(df, shard_col, key_col, n_bits, k)
    shards = idx.select("shard").distinct()
    ppos = probes.select(
        F.col(key_col).alias("key"),
        F.posexplode(_md5_positions(F.col(key_col), n_bits, k)).alias(
            "slot", "pos"
        ),
    ).select(
        "key",
        "slot",
        F.floor(F.col("pos") / 60).cast("long").alias("idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 60 AS INT))").alias(
            "mask"
        ),
    )
    combos = ppos.crossJoin(F.broadcast(shards))
    hits = (
        combos.join(F.broadcast(idx), ["shard", "idx"], "left")
        .withColumn(
            "hit",
            F.coalesce(
                (F.col("word").bitwiseAND(F.col("mask")) != 0),
                F.lit(False),
            ).cast("int"),
        )
        .groupBy("key", "shard")
        .agg((F.sum("hit") == F.lit(k)).alias("might"))
    )
    truth = (
        df.select(
            F.col(shard_col).alias("shard"), F.col(key_col).alias("key")
        )
        .join(F.broadcast(probes.select(F.col(key_col).alias("key"))), "key")
        .distinct()
        .withColumn("actual", F.lit(True))
    )
    per = (
        hits.join(truth, ["key", "shard"], "left")
        .groupBy("key")
        .agg(
            F.count("*").cast("long").alias("n_shards"),
            F.sum(F.col("might").cast("int")).cast("long").alias("n_probed"),
            F.sum(F.coalesce(F.col("actual"), F.lit(False)).cast("int"))
            .cast("long")
            .alias("n_actual"),
        )
    )
    return per.select(
        "key",
        "n_shards",
        "n_probed",
        "n_actual",
        F.round(
            F.lit(1.0) - F.col("n_probed") / F.col("n_shards"), 6
        ).alias("skipped_share"),
        F.when(
            F.col("n_shards") > F.col("n_actual"),
            F.round(
                (F.col("n_probed") - F.col("n_actual")).cast("double")
                / (F.col("n_shards") - F.col("n_actual")),
                6,
            ),
        )
        .otherwise(F.lit(0.0))  # every shard owns the key: zero false probes
        .alias("false_probe_rate"),
    ).orderBy("key")
