"""Deduplication operators for training-data pipelines.

The reference dedupes only by primary-key upsert (`INSERT OR REPLACE`,
corpusama/database/database.py:57, P14). A 10^12-row corpus build needs the
full family; each operator here is shuffle-deliberate and deterministic:

- exact: hash-groupBy canonicalization (keeps min id — deterministic, unlike
  dropDuplicates' arbitrary row).
- minhash + LSH: shingle → K permuted min-hashes → B bands → bucket-join.
  One shuffle per band-join, candidate pairs only (never O(n²)).
- simhash: 64-bit sign-aggregated token hashes; exact dups share the value
  (`simhash_dedup`), near-dups meet in a 16-bit band and hamming-verify via
  bit_count(xor) (`simhash_near_dups`).
- n-gram Jaccard verification: exact set overlap on candidate pairs.
- embedding cosine near-dup: see operators/similarity.py.

All hash math uses xxhash64 (JVM-side) with explicit seeds — deterministic
across runs/retries/cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# 2^31-1: keeps a*h+b far below int64 overflow under ANSI arithmetic
MERSENNE = (1 << 31) - 1


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct text: (text_hash, canonical_id, n_dupes)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def shingles(text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingle array from a whitespace-tokenized lowercased text."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
            lambda s: F.length(s) > 0,
        )
    )


def _perm(a: int, b: int):
    # closure, not default-arg lambda: pyspark infers HOF arity from the
    # Python signature, so extra defaulted params break ArrayTransform
    return lambda h: (h * a + b) % F.lit(MERSENNE)


def minhash_signature(shingle_col: F.Column, num_hashes: int = 16) -> F.Column:
    """K min-hash values: min over shingles of (a_k * h + b_k) mod p.

    NOTE: as a single inline expression the hashed-shingle array is
    re-evaluated once per permutation (Catalyst does not CSE inside one
    projection). Prefer ``minhash_signatures`` (the DataFrame version) on
    anything hot — it stages the base array in its own projection so it is
    computed once per row.
    """
    base = F.transform(shingle_col, lambda s: F.abs(F.xxhash64(s)) % F.lit(MERSENNE))
    sigs = [
        F.array_min(F.transform(base, _perm(2 * k + 1, 1_000_003 * (k + 1))))
        for k in range(num_hashes)
    ]
    return F.array(*sigs)


# per-position odd mixing constants for the tokenhash shingle combine
_COMBINE_SEED = 0x9E3779B97F4A7C15  # 2^64 / golden ratio


def _combine_consts(n: int) -> "np.ndarray":
    return np.array(
        [(_COMBINE_SEED * (2 * p + 1)) & 0xFFFFFFFFFFFFFFFF | 1 for p in range(n)],
        dtype=np.uint64,
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
    shingle_kernel: str = "tokenhash",
    hash_family: str = "xxhash",
) -> DataFrame:
    """(id, sig) per row, with the expensive stages each evaluated ONCE.

    ``hash_family``: "xxhash" (default, JVM xxhash64 — fastest) or "md5"
    (conv(substr(md5(shingle),1,8),16,10) — slower but reproducible in any
    engine with md5, which makes the WHOLE LSH pipeline oracle-checkable
    in DuckDB; forces the string kernel since the tokenhash combine is
    uint64-wraparound arithmetic other engines can't express).

    ``shingle_kernel`` picks how shingle hashes are produced:

    - "tokenhash" (default): each TOKEN is xxhash64'd once JVM-side, and
      the word-n-gram shingle hash is a fixed odd-constant linear combine
      of its n token hashes inside the Arrow kernel (uint64 wraparound,
      then mod MERSENNE). Minhash needs any uniform hash family, and this
      one skips materializing shingle STRINGS — the slice+array_join per
      window runs as an interpreted higher-order function and was measured
      at ~8x the cost of the whole token-hash pass (BENCH.md r3).
    - "string": xxhash64 of the joined shingle string — the original
      family, value-parity with the Column twin ``minhash_signature``
      (pinned by test), for callers that must reproduce those signatures.

    Either way the hashed array lands in its own projection;
    CollapseProject will not inline a non-cheap (higher-order-function)
    alias referenced by all K permutation expressions, so each row hashes
    exactly once. If the incoming plan has fewer partitions than the
    cluster's parallelism (one small parquet file), repartition first so
    the CPU-bound signature stage actually fans out.
    """
    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    # unconditional: touching src.rdd just to read the partition count would
    # force a deserialization boundary into the plan, and the signature stage
    # is CPU-bound enough that one narrow-input shuffle always pays for itself
    src = src.repartition(spark.sparkContext.defaultParallelism)
    if hash_family not in ("xxhash", "md5"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    if shingle_kernel == "tokenhash" and hash_family == "xxhash":
        return _minhash_signatures_tokenhash(src, num_hashes, shingle_n)
    if shingle_kernel not in ("string", "tokenhash"):
        raise ValueError(f"unknown shingle_kernel {shingle_kernel!r}")
    if hash_family == "md5":
        def _h(s):
            return (
                F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
                % F.lit(MERSENNE)
            )
    else:
        def _h(s):
            return F.abs(F.xxhash64(s)) % F.lit(MERSENNE)
    hashed = src.withColumn(
        "_hs",
        F.transform(shingles("_t", shingle_n), _h),
    )
    # the K affine permutations + mins run as ONE numpy pass per Arrow
    # batch: Spark executes higher-order-function lambdas interpreted, so
    # K array traversals per row in Column form cost ~100x this matmul-ish
    # kernel. Hashing stays JVM-side (xxhash64) — signatures are identical.
    a_coef = np.array([2 * k + 1 for k in range(num_hashes)], dtype=np.int64)
    b_coef = np.array(
        [1_000_003 * (k + 1) for k in range(num_hashes)], dtype=np.int64
    )

    @F.pandas_udf(ArrayType(LongType()))
    def _sig_udf(hs: pd.Series) -> pd.Series:
        out = []
        lens = np.array([0 if v is None else len(v) for v in hs])
        if lens.sum() == 0:
            return pd.Series([[None] * num_hashes for _ in hs])
        flat = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in hs if v is not None and len(v)]
        )
        # (K, total): h*a+b stays far below int64 overflow (h < 2^31)
        perms = (flat[None, :] * a_coef[:, None] + b_coef[:, None]) % MERSENNE
        starts = np.concatenate(([0], np.cumsum(lens[lens > 0])[:-1]))
        mins = np.minimum.reduceat(perms, starts, axis=1)  # (K, n_nonempty)
        j = 0
        for n in lens:
            if n == 0:
                out.append([None] * num_hashes)
            else:
                out.append(mins[:, j].tolist())
                j += 1
        return pd.Series(out)

    return hashed.select("id", _sig_udf("_hs").alias("sig"))


def _minhash_signatures_tokenhash(
    src: DataFrame, num_hashes: int, shingle_n: int
) -> DataFrame:
    """tokenhash kernel: JVM xxhash64 per TOKEN, sliding-window combine +
    permutations + mins in one numpy pass. Rows with 0 < L < n tokens get
    one shingle combining all L hashes (mirroring shingles()'s short-doc
    behavior); empty/NULL text yields a NULL signature."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("_t"))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    hashed = src.withColumn(
        "_th", F.transform(toks, lambda x: F.abs(F.xxhash64(x)) % F.lit(MERSENNE))
    )
    a_coef = np.array([2 * k + 1 for k in range(num_hashes)], dtype=np.int64)
    b_coef = np.array(
        [1_000_003 * (k + 1) for k in range(num_hashes)], dtype=np.int64
    )
    consts = _combine_consts(shingle_n)
    n = shingle_n

    @F.pandas_udf(ArrayType(LongType()))
    def _sig_udf(th: pd.Series) -> pd.Series:
        lens = np.array([0 if v is None else len(v) for v in th])
        if lens.sum() == 0:
            return pd.Series([[None] * num_hashes for _ in th])
        flat = np.concatenate(
            [np.asarray(v, dtype=np.int64) for v in th if v is not None and len(v)]
        ).astype(np.uint64)
        starts = np.concatenate(([0], np.cumsum(lens[lens > 0])[:-1]))
        # full-width windows over the concatenation; row-crossing windows
        # are simply never selected by the per-row slices below
        if len(flat) >= n:
            g_full = np.zeros(len(flat) - n + 1, dtype=np.uint64)
            for p in range(n):
                g_full += flat[p : len(flat) - n + 1 + p] * consts[p]
        else:
            g_full = np.zeros(0, dtype=np.uint64)
        g_rows = []
        for s, ln in zip(starts, lens[lens > 0]):
            if ln >= n:
                g_rows.append(g_full[s : s + ln - n + 1])
            else:  # short doc: one shingle over all its tokens
                g_rows.append(
                    np.array(
                        [(flat[s : s + ln] * consts[:ln]).sum(dtype=np.uint64)],
                        dtype=np.uint64,
                    )
                )
        g_counts = np.array([len(g) for g in g_rows])
        g_flat = (np.concatenate(g_rows) % np.uint64(MERSENNE)).astype(np.int64)
        perms = (g_flat[None, :] * a_coef[:, None] + b_coef[:, None]) % MERSENNE
        g_starts = np.concatenate(([0], np.cumsum(g_counts)[:-1]))
        mins = np.minimum.reduceat(perms, g_starts, axis=1)
        out, j = [], 0
        for ln in lens:
            if ln == 0:
                out.append([None] * num_hashes)
            else:
                out.append(mins[:, j].tolist())
                j += 1
        return pd.Series(out)

    return hashed.select("id", _sig_udf("_th").alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = None,
    hash_family: str = "xxhash",
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded LSH.

    ``hash_family="md5"`` makes every hash in the pipeline (shingle hash
    AND band key) portable md5 arithmetic, so the whole candidate set is
    reproducible in DuckDB — the oracle-checkable configuration. Default
    xxhash64 is the fast path.

    Scale shape: signatures materialize once (persisted — at 10^12 rows this
    is the signature table you would write to storage anyway), explode to
    (band, band_key, id), self-join per bucket. The shuffle is keyed by band
    hash so only colliding docs meet; without persistence the self-join would
    execute the CPU-heavy signature stage once per side (broadcast + probe
    exchanges do not canonicalize equal, so ReuseExchange cannot help).

    ``max_bucket`` drops flood buckets (boilerplate/empty-text pileups) —
    the standard LSH skew guard; members of a dropped bucket still meet in
    their other bands unless those flood too. Caller owns the persisted
    banded stage: release via plans.caching.release(result).
    """
    from corpusama_spark.plans.caching import own_caches
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_n, hash_family=hash_family
    )

    def _band_key(b):
        joined = F.array_join(
            F.transform(
                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
            ",",
        )
        if hash_family == "md5":
            return F.md5(joined)
        return F.xxhash64(joined).cast("string")

    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), _band_key)
        ).alias("band", "band_key"),
    ).persist()
    banded_persisted = banded
    if max_bucket is not None:
        ok = (
            banded.groupBy("band", "band_key")
            .count()
            .where(F.col("count") <= max_bucket)
            .drop("count")
        )
        banded = banded.join(ok, ["band", "band_key"], "left_semi")
    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
        .distinct()
    )
    return own_caches(pairs, banded_persisted)


def jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, pairs: DataFrame, shingle_n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage)."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    )
    return (
        pairs.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )


def exact_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """ALL pairs with word-shingle Jaccard ≥ threshold, EXACTLY, without an
    all-pairs product: inverted shingle index → co-occurring id pairs →
    intersection counts → |A∪B| = |A|+|B|−|∩|. The ground-truth side of
    LSH quality audits, and the exact tier of near-dup dedup when the
    corpus slice is small enough to afford it.

    Scale shape: the candidate set is bounded by pairs SHARING a shingle
    (the inverted-index join), never |corpus|². The quadratic hazard is
    hot shingles; ``max_df`` drops shingles present in more than that many
    docs — stop-shingles blow up the index while carrying no dedup signal
    (standard df-capping). With a cap, a pair is found iff it shares at
    least one sub-cap shingle; at dedup-grade thresholds near-dup pairs
    always do. None = strictly exact (audit-scale inputs only).

    Shingle arrays are distinct per doc, so count(*) over the index join
    IS the intersection size. Output: (id_a, id_b, jaccard) rounded to 6.
    """
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    sizes = sh.select("id", F.size("sh").alias("sz"))
    inv = sh.select("id", F.explode("sh").alias("g"))
    if max_df is not None:
        ok = inv.groupBy("g").count().where(F.col("count") <= max_df)
        inv = inv.join(ok.select("g"), "g")
    a = inv.select(F.col("id").alias("id_a"), "g")
    b = inv.select(F.col("id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash_bits(text_col: str, bits: int = 64) -> F.Column:
    """SimHash over whitespace tokens as a '0'/'1' string (bit 0 first).

    Single aggregate() pass with an array-of-counters accumulator — one array
    traversal per row regardless of bit width; pure JVM. A string key avoids
    int64 sign gymnastics and substrings directly into LSH bands.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: F.length(t) > 0
    )
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    zero = F.array_repeat(F.lit(0), bits)
    idx = F.sequence(F.lit(0), F.lit(bits - 1))
    counters = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                idx,
                lambda b: F.when(F.getbit(h, b) == 1, F.lit(1)).otherwise(F.lit(-1)),
            ),
            lambda a, x: a + x,
        ),
    )
    return F.array_join(
        F.transform(counters, lambda c: F.when(c > 0, "1").otherwise("0")), ""
    )


def simhash_codes(
    df: DataFrame, text_col: str, id_col: str, hash_family: str = "xxhash"
) -> DataFrame:
    """(id, simhash: '0'/'1' string, sim: int64) with numpy bit-counting.

    Token hashing stays JVM-side; the 64-bit ±1 accumulation (a 64-wide
    zip_with per token when expressed as Columns — interpreted, O(tokens×64)
    lambda evals per row) becomes one sign-sum matmul per Arrow batch.
    The string is bit-0-first and identical to simhash_bits (NULL text →
    NULL, matching the Column version's null propagation; empty text →
    all-zero hash). ``sim`` packs the same bits into an int64 (bit i of the
    string = bit i of the integer) so banding and hamming distance stay in
    64-bit JVM integer ops downstream.

    ``hash_family="md5"`` swaps the token hash to
    conv(substr(md5(t),1,15),16,10) — a 60-bit positive hash any engine
    with md5 reproduces, making the simhash pipeline oracle-checkable in
    DuckDB. Bits 60-63 of the code are then always 0 (an effective 60-bit
    simhash); banding/hamming work unchanged.
    """
    if hash_family == "md5":
        def _th(t):
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    elif hash_family == "xxhash":
        def _th(t):
            return F.xxhash64(t)
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: F.length(t) > 0
    )
    hashed = df.select(
        F.col(id_col), F.transform(toks, _th).alias("_hs")
    )
    shifts = np.arange(64, dtype=np.uint64)
    weights = (np.uint64(1) << shifts).astype(np.uint64)

    @F.pandas_udf(
        StructType(
            [
                StructField("simhash", StringType()),
                StructField("sim", LongType()),
            ]
        )
    )
    def _sim_udf(hs: pd.Series) -> pd.DataFrame:
        strs: list[str | None] = []
        ints: list[int | None] = []
        for v in hs:
            if v is None:
                strs.append(None)
                ints.append(None)
                continue
            if len(v) == 0:
                strs.append("0" * 64)
                ints.append(0)
                continue
            h = np.asarray(v, dtype=np.int64).astype(np.uint64)
            bits = ((h[:, None] >> shifts) & 1).astype(np.int32)  # (n, 64)
            counters = (bits * 2 - 1).sum(axis=0)
            pos = counters > 0
            strs.append("".join("1" if c else "0" for c in pos))
            ints.append(int((weights[pos].sum()).astype(np.uint64).view(np.int64)))
        return pd.DataFrame({"simhash": strs, "sim": ints})

    return hashed.select(id_col, _sim_udf("_hs").alias("_s")).select(
        id_col, F.col("_s.simhash").alias("simhash"), F.col("_s.sim").alias("sim")
    )


def simhash_vectorized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash) string form — see simhash_codes."""
    return simhash_codes(df, text_col, id_col).select(id_col, "simhash")


def simhash_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group by exact simhash value — the EXACT-duplicate tier (null-text
    rows carry a NULL hash and form their own group, as groupBy keeps one
    null key group)."""
    return (
        simhash_vectorized(df, text_col, id_col)
        .groupBy("simhash")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_dupes"))
    )


def hamming_band_pairs(
    codes: DataFrame,
    id_col: str = "id",
    code_col: str = "code",
    bands: int = 4,
    hamming_k: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming <= k) over ANY int64 code column
    — the shared kernel behind simhash text dedup and phash image dedup.

    The 64-bit code splits into ``bands`` equal bit-bands; two codes within
    hamming distance ``k < bands`` agree exactly on at least one band
    (pigeonhole), so banding loses no pair for the default (4, 3). Band keys
    are shiftrightunsigned+mask — pure JVM int ops — and verification is
    bit_count(xor) on the int64 codes, so candidate pairs never touch the
    original payload. ``max_bucket`` drops flood buckets (the all-zero code
    of empty docs / blank images is the classic one) exactly like
    minhash_lsh_pairs. Caller owns the persisted codes: release via
    plans.caching.release(result).
    """
    from corpusama_spark.plans.caching import own_caches

    band_bits = 64 // bands
    mask = (1 << band_bits) - 1
    staged = (
        codes.where(F.col(code_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(code_col).alias("code"))
        .persist()
    )
    banded = staged.select(
        "id",
        "code",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("code", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select(
        "id",
        "code",
        F.col("_b.band").alias("band"),
        F.col("_b.band_key").alias("band_key"),
    )
    if max_bucket is not None:
        ok = (
            banded.groupBy("band", "band_key")
            .count()
            .where(F.col("count") <= max_bucket)
            .drop("count")
        )
        banded = banded.join(ok, ["band", "band_key"], "left_semi")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.code").bitwiseXOR(F.col("b.code"))).alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= hamming_k)
        .distinct()
    )
    return own_caches(pairs, staged)


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bands: int = 4,
    hamming_k: int = 3,
    max_bucket: int | None = None,
    hash_family: str = "xxhash",
) -> DataFrame:
    """Near-dup text pairs via banded simhash LSH (see hamming_band_pairs)."""
    codes = simhash_codes(df, text_col, id_col, hash_family).select(
        id_col, "sim"
    )
    return hamming_band_pairs(
        codes, id_col, "sim", bands, hamming_k, max_bucket
    )


def image_near_dups(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    bands: int = 4,
    hamming_k: int = 3,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate IMAGE pairs: DCT perceptual hash (phash64, computed
    in the scan stage — bytes never shuffle; only the 8-byte code does)
    banded through the same hamming kernel as simhash. The end-to-end image
    dedup a 10^12-image corpus runs before training."""
    from corpusama_spark.functions.imageops import image_features

    codes = df.select(
        F.col(id_col),
        image_features(bytes_col, fmt_col).getField("phash64").alias("phash64"),
    )
    return hamming_band_pairs(
        codes, id_col, "phash64", bands, hamming_k, max_bucket
    )


def winnow_hashes(text_col: str, k: int = 5) -> F.Column:
    """md5-prefix hashes of the char k-grams of lowercased text (the
    winnowing pre-stage). Guarded against sequence()'s descending behavior
    on texts shorter than k."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n_grams = F.length(t) - (k - 1)
    empty = F.array().cast("array<string>")
    grams = F.when(
        n_grams >= 1,
        F.transform(F.sequence(F.lit(1), n_grams), lambda i: F.substring(t, i, k)),
    ).otherwise(empty)
    return F.transform(grams, lambda g: F.substring(F.md5(g), 1, 8))


def winnow_from_hashes(hashes_col: F.Column, window: int = 4) -> F.Column:
    """Sorted distinct window-minima of a MATERIALIZED hash-array column.

    The hash array MUST be a plain column reference (stage it with
    withColumn), not an inline expression: the window lambda references it
    once per window position, and Catalyst does not common-subexpression-
    eliminate within a projection — inlining re-hashes the entire document
    per window, turning O(len) into O(len²) (measured: a 5,000-doc scan
    went from minutes-per-partition to seconds after staging).
    """
    empty = F.array().cast("array<string>")
    n_windows = F.size(hashes_col) - (window - 1)
    mins = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(hashes_col, j, window)),
        ),
    ).otherwise(empty)
    return F.array_sort(F.array_distinct(mins))


def winnow_fingerprints_df(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, public):
    char k-gram hashes, minimum per sliding window, distinct set — the
    rolling-hash fingerprinting a plagiarism/near-dup index stores per doc.

    Hashes are md5-prefix STRINGS (portable across engines — the window
    minimum is lexicographic); the whole chain is pure JVM array
    expressions, no UDF. The hash array is staged in its own projection
    (see winnow_from_hashes) and the scan repartitioned so one small input
    file cannot serialize the CPU-bound stage. Returns (id, fingerprints).
    """
    spark = df.sparkSession
    staged = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("_hs", winnow_hashes("_t", k))
    )
    return staged.select(
        F.col("id").alias(id_col),
        winnow_from_hashes(F.col("_hs"), window).alias("fingerprints"),
    )


def winnow_fingerprints(
    text_col: str, k: int = 5, window: int = 4
) -> F.Column:
    """Inline-Column form of winnowing — SMALL INPUTS ONLY: as one
    expression the hash array is re-evaluated once per window position
    (no CSE within a projection), i.e. O(len²) per document. Use
    winnow_fingerprints_df on anything hot; outputs are identical."""
    return winnow_from_hashes(winnow_hashes(text_col, k), window)


def positional_winnow(
    df: DataFrame, text_col: str, id_col: str, k: int = 5, window: int = 4
) -> DataFrame:
    """Winnow-selected fingerprints WITH their k-gram offsets:
    (id, fp, pos) — pos is the 1-based char index of the k-gram whose hash
    is the minimum of its window (first index on ties, matching
    array_position / numpy argmin). Robust winnowing guarantees any shared
    substring of length >= k + window - 1 yields at least one shared
    selected fingerprint, so positions are exactly what a repeated-REGION
    detector needs (Schleimer et al. 2003, §3).

    Gram hashes are the portable integer family
    conv(substr(md5(gram),1,8),16,10) — JVM-computed, DuckDB-reproducible
    (fixed-width lowercase hex sorts identically as string or integer, so
    this selects the same grams as the md5-prefix-string winnow). The
    window min+argmin runs as a ZERO-COPY numpy sliding_window_view per
    Arrow batch — the Column form costs 4 interpreted slice traversals
    per window (min twice, argmin, struct) and measured ~3.4x slower at
    sf0.1. A selected position determines its fingerprint (fp = h[pos]),
    so dedup is np.unique over positions, done before the explode: row
    volume out is the winnow density, not one row per window.
    """
    spark = df.sparkSession
    t = F.lower(F.coalesce(F.col("_t"), F.lit("")))
    n_grams = F.length(t) - (k - 1)
    grams = F.when(
        n_grams >= 1,
        F.transform(F.sequence(F.lit(1), n_grams), lambda i: F.substring(t, i, k)),
    ).otherwise(F.array().cast("array<string>"))
    staged = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn(
            "_hi",
            F.transform(
                grams,
                lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast(
                    "long"
                ),
            ),
        )
    )
    w = window

    @F.pandas_udf(
        ArrayType(
            StructType(
                [StructField("fp", LongType()), StructField("pos", IntegerType())]
            )
        )
    )
    def _sel_udf(hi: pd.Series) -> pd.Series:
        out = []
        for v in hi:
            if v is None or len(v) < w:
                out.append([])
                continue
            h = np.asarray(v, dtype=np.int64)
            swv = np.lib.stride_tricks.sliding_window_view(h, w)
            pos = np.unique(swv.argmin(axis=1) + np.arange(len(h) - w + 1))
            out.append(
                [(int(h[p]), int(p + 1)) for p in pos]
            )
        return pd.Series(out)

    return (
        staged.select("id", F.explode(_sel_udf("_hi")).alias("s"))
        .select("id", F.col("s.fp").alias("fp"), F.col("s.pos").alias("pos"))
    )


def repeated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    window: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated regions — the distributed shape of
    exact-substring dedup over a training corpus (public method: suffix-
    array substring dedup, Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better"; approximated here with positional
    winnowing instead of a suffix array, which a cluster cannot build
    globally anyway).

    Pipeline: positional fingerprints -> fingerprints present in
    >= min_docs DISTINCT docs -> per-doc char spans [pos, pos+k) ->
    overlapping/adjacent spans merged into islands. Returns
    (id, span_start, span_end): 1-based inclusive start, EXCLUSIVE end —
    the snip-list a corpus build subtracts before training.

    Scale shape: three keyed shuffles (fp count-distinct, fp semi-join,
    per-doc island window) — never a pair join, so a boilerplate
    fingerprint shared by 10^8 docs costs one hot reducer in the count,
    not 10^16 candidate pairs. The island merge is a per-doc running-max
    window: rows per doc are bounded by doc length x winnow density.
    """
    from pyspark.sql import Window

    rows = positional_winnow(df, text_col, id_col, k, window)
    freq = (
        rows.groupBy("fp")
        .agg(F.countDistinct("id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("fp")
    )
    marked = (
        rows.join(freq, "fp", "left_semi")
        .select(
            "id",
            F.col("pos").alias("span_start"),
            (F.col("pos") + k).alias("span_end"),
        )
        .distinct()
    )
    w_prev = (
        Window.partitionBy("id")
        .orderBy("span_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("id")
        .orderBy("span_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max("span_end").over(w_prev)
    flag = F.when(
        prev_end.isNull() | (F.col("span_start") > prev_end), 1
    ).otherwise(0)
    return (
        marked.withColumn("_isl", F.sum(flag).over(w_cum))
        .groupBy("id", "_isl")
        .agg(
            F.min("span_start").alias("span_start"),
            F.max("span_end").alias("span_end"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "span_start",
            F.col("span_end").cast("int").alias("span_end"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    shingle_n: int = 3,
    max_df: int | None = 32,
) -> DataFrame:
    """Directional shingle CONTAINMENT for asymmetric near-dup detection:
    c(A→B) = |sh(A) ∩ sh(B)| / |sh(A)|. Jaccard misses the quote/excerpt
    case — a paragraph wholly embedded in a 100× larger page scores near
    zero on Jaccard but 1.0 on containment — and web-scale corpus builds
    need exactly this to catch syndicated excerpts, quote chains, and
    boilerplate-wrapped reposts. Returns every pair where EITHER
    direction reaches the threshold, with both directions reported.

    Same scale shape as exact_jaccard_pairs (dedup.py:363): inverted
    shingle index bounds candidates to pairs sharing a shingle, df-cap
    kills hot-shingle blowup, intersection counts ride one groupBy.
    Integer count ratios keep both engines bit-identical.
    """
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    sizes = sh.select("id", F.size("sh").alias("sz"))
    inv = sh.select("id", F.explode("sh").alias("g"))
    if max_df is not None:
        ok = inv.groupBy("g").count().where(F.col("count") <= max_df)
        inv = inv.join(ok.select("g"), "g")
    a = inv.select(F.col("id").alias("id_a"), "g")
    b = inv.select(F.col("id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter") / F.col("sz_a"), 6).alias("cont_a_in_b"),
            F.round(F.col("inter") / F.col("sz_b"), 6).alias("cont_b_in_a"),
        )
    )
    t = float(threshold)
    return out.where(
        (F.col("cont_a_in_b") >= t) | (F.col("cont_b_in_a") >= t)
    )


def dedup_cascade(
    catalog: DataFrame,
    content_col: str,
    id_col: str = "id",
    code_col: str = "code",
    bands: int = 4,
    hamming_k: int = 3,
    fixed_iters: int = 12,
) -> DataFrame:
    """Two-stage image-dedup cascade, the production shape: a CHEAP
    exact pass (byte/content hash groupBy, min-id canonical) shrinks
    the catalog before the EXPENSIVE near-dup pass (banded perceptual-
    hash LSH → hamming verify → connected components) runs on survivors
    only. At web scale the exact stage routinely removes 30-50% of
    images (hotlinked/re-uploaded bytes), cutting the LSH stage's
    candidate volume quadratically in the dense buckets.

    Canonicals are TRANSITIVE: an exact duplicate whose canonical later
    merges into a near-dup cluster points at that cluster's canonical,
    so anti-joining `keep` leaves exactly one copy per visual identity.
    Returns (id, stage ∈ exact_dup|near_dup|unique, canonical, keep).

    Scale shape: one content-keyed exchange (hashes, never bytes), then
    the banded pair join + per-round component shuffles on the reduced
    survivor set; the final stitch is two id-keyed joins. All
    arithmetic is integer/hash — bit-identical on any engine.
    """
    from corpusama_spark.operators.components import connected_components

    c = catalog.select(
        F.col(id_col).alias("id"),
        F.col(content_col).alias("_chash"),
        F.col(code_col).alias("code"),
    )
    canon1 = c.groupBy("_chash").agg(F.min("id").alias("_ecanon"))
    s1 = c.join(canon1, "_chash")
    survivors = s1.where(F.col("id") == F.col("_ecanon")).select("id", "code")
    pairs = hamming_band_pairs(
        survivors, "id", "code", bands=bands, hamming_k=hamming_k
    )
    comp = connected_components(pairs, fixed_iters=fixed_iters).select(
        F.col("id").alias("_ecanon"), F.col("component").alias("_comp")
    )
    canonical = F.coalesce(F.col("_comp"), F.col("_ecanon"))
    return (
        s1.join(comp, "_ecanon", "left")
        .select(
            "id",
            F.when(F.col("id") != F.col("_ecanon"), F.lit("exact_dup"))
            .when(canonical != F.col("id"), F.lit("near_dup"))
            .otherwise(F.lit("unique"))
            .alias("stage"),
            canonical.alias("canonical"),
            (canonical == F.col("id")).alias("keep"),
        )
    )


def jaccard_threshold_sweep(
    df: DataFrame,
    text_col: str,
    id_col: str,
    thresholds: list[float],
    shingle_n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Dedup-threshold tuning table: for each candidate Jaccard threshold,
    how many pairs qualify and how many DISTINCT documents are touched —
    the pr_curve idiom applied to near-dup tuning, so the "how aggressive
    should dedup be?" decision reads off one table instead of N reruns.

    ONE exact-pairs pass at min(thresholds) feeds every row: the pair
    table joins a broadcast threshold list (|pairs| × |thresholds| worst
    case, pair-sized not corpus-sized), then per-threshold pair counts
    and distinct-doc counts aggregate map-side. Thresholds with zero
    qualifying pairs still appear (left join), with doc_share against
    the non-null-text corpus size.
    """
    if not thresholds:
        raise ValueError("jaccard_threshold_sweep needs thresholds")
    pairs = exact_jaccard_pairs(
        df,
        text_col,
        id_col,
        threshold=min(thresholds),
        shingle_n=shingle_n,
        max_df=max_df,
    )
    spark = df.sparkSession
    th = spark.createDataFrame(
        [(float(t),) for t in sorted(thresholds)], "threshold double"
    )
    hit = pairs.join(
        F.broadcast(th), F.col("jaccard") >= F.col("threshold")
    )
    n_pairs = hit.groupBy("threshold").agg(
        F.count("*").cast("long").alias("n_pairs")
    )
    n_docs = (
        hit.select(
            "threshold",
            F.explode(F.array("id_a", "id_b")).alias("id"),
        )
        .distinct()
        .groupBy("threshold")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    total = df.where(F.col(text_col).isNotNull()).select(
        F.count("*").cast("long").alias("n_corpus")
    )
    return (
        th.join(n_pairs, "threshold", "left")
        .join(n_docs, "threshold", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            "n_corpus",
            F.round(
                F.coalesce("n_docs", F.lit(0)) / F.col("n_corpus"), 6
            ).alias("doc_share"),
        )
        .orderBy("threshold")
    )


def dedup_burden_by_group(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group exact-duplicate burden: which sources re-post content.
    A row is a duplicate when its md5(text) group's canonical (min id)
    is a DIFFERENT row — global dedup, attributed to the group of the
    DUPLICATE row (the group that would shrink if dedup ran). Reports
    per group: total rows, null/empty-text rows (excluded from dedup),
    duplicate rows, canonical rows, and dup_share (6dp).

    Scale shape: the only corpus exchange is the md5-keyed groupBy that
    exact dedup already pays (16-byte keys, never full text); the min-id
    canonical broadcasts back via the same hash join dedup_exact uses.
    One further groupBy collapses to |groups| rows.
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("g"),
        F.when(
            F.col(text_col).isNotNull()
            & (F.length(F.trim(F.col(text_col))) > 0),
            F.md5(F.col(text_col)),
        ).alias("key"),
    )
    canon = (
        keyed.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.min("id").alias("canon_id"))
    )
    flagged = keyed.join(canon, "key", "left").select(
        "g",
        (F.col("key").isNull()).cast("long").alias("is_null"),
        (
            F.col("key").isNotNull() & (F.col("id") != F.col("canon_id"))
        ).cast("long").alias("is_dup"),
    )
    return (
        flagged.groupBy(F.col("g").alias(group_col))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("is_null").cast("long").alias("n_null"),
            F.sum("is_dup").cast("long").alias("n_dup"),
            (F.count("*") - F.sum("is_null") - F.sum("is_dup"))
            .cast("long")
            .alias("n_canonical"),
            F.round(F.sum("is_dup") / F.count("*"), 6).alias("dup_share"),
        )
        .orderBy(group_col)
    )


def near_dup_caption_divergence(
    pop: DataFrame,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    bands: int = 4,
    hamming_k: int = 3,
    tau: float = 0.5,
) -> DataFrame:
    """Labeling-noise audit for image+caption corpora: visually
    near-identical pairs (phash hamming ≤ k via banded LSH) whose
    CAPTIONS disagree (token Jaccard < tau) — the "same image, different
    caption" set that survives text dedup and phash dedup separately
    because each signal on its own says "keep both". Output per
    candidate pair: hamming distance, caption jaccard, and the
    divergent flag; divergent pairs are the rows a labeling pipeline
    should re-adjudicate rather than train on.

    ``pop`` is the (id, code) phash table; captions come from ``docs``
    joined by id. Scale shape: hamming_band_pairs does the banded
    candidate generation (codes shuffle, not pixels); the caption join
    touches only pair ids (2 joins on the pair table); the Jaccard is
    a JVM array intersection over the two token sets of a PAIR, never
    an all-pairs text comparison.
    """
    pairs = hamming_band_pairs(
        pop, "id", "code", bands=bands, hamming_k=hamming_k
    ).select("id_a", "id_b", "hamming")
    toks = docs.select(
        F.col(id_col).alias("tid"),
        F.array_distinct(
            F.filter(
                F.split(
                    F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                    r"\s+",
                ),
                lambda w: F.length(w) > 0,
            )
        ).alias("toks"),
    )
    a = toks.select(F.col("tid").alias("id_a"), F.col("toks").alias("ta"))
    b = toks.select(F.col("tid").alias("id_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "hamming",
            F.round(jac, 6).alias("caption_jaccard"),
            (F.round(jac, 6) < tau).alias("divergent"),
        )
        .orderBy("id_a", "id_b")
    )


def oph_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """One-permutation MinHash signatures with rotation densification
    (Li, Owen & Zhang 2012; Shrivastava & Li 2014): ONE md5 hash per
    shingle assigns it to bin ``h % k`` and the signature slot is the
    bin's min hash; empty bins borrow circularly from the nearest
    non-empty bin to the right, offset by ``hops · C`` so borrowed
    values stay distinct across hop distances. Classic K-permutation
    minhash hashes every shingle K times (O(dK) per doc — the measured
    hot stage of minhash_signatures); OPH hashes each shingle ONCE and
    still yields an unbiased k-slot Jaccard estimator, which is the
    difference between 16 passes and 1 pass over 10^12 rows of text.

    md5 (not xxhash) so any engine replays the signature bit-exactly:
    h = int(md5(shingle)[:8], 16) % (2³¹−1), the hash family the
    md5-twin LSH tier already pins.

    Scale shape: one explode → (id, bin) groupBy MIN (map-side
    combinable, k·|docs| result rows) → one constant-width conditional
    agg per doc; densification is a k² coalesce lattice of JVM
    expressions, no Python, no second pass over text. Returns
    (id, sig array<long> of length k, nbins_filled).
    """
    k = int(k)
    if k < 2:
        raise ValueError("k must be ≥ 2")
    h = lambda s: (  # noqa: E731 — the md5-family shingle hash
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % F.lit(MERSENNE)
    )
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    bins = (
        sh.select("id", F.explode(F.transform("sh", h)).alias("hv"))
        .groupBy("id", (F.col("hv") % k).alias("b"))
        .agg(F.min("hv").alias("mn"))
    )
    slots = bins.groupBy("id").agg(
        *[
            F.min(F.when(F.col("b") == i, F.col("mn"))).alias(f"m{i}")
            for i in range(k)
        ]
    )
    filled = [
        F.coalesce(
            *[
                F.col(f"m{(i + j) % k}") + F.lit(j * MERSENNE)
                for j in range(k)
            ]
        )
        for i in range(k)
    ]
    return slots.select(
        "id",
        F.array(*filled).alias("sig"),
        sum(
            (F.col(f"m{i}").isNotNull().cast("int") for i in range(k)),
            F.lit(0),
        ).alias("nbins_filled"),
    )


def oph_accuracy_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-pair OPH estimate vs exact Jaccard: (id_a, id_b, est_j,
    exact_j, abs_err). ``pairs`` carries (id_a, id_b). The estimator is
    the share of the k densified slots where the two signatures agree.
    The audit that says what ``k`` buys before a deployment swaps the
    K-permutation tier for the one-pass tier.

    Scale shape: signatures and shingle sets are built once from the
    corpus; both joins are pair-bounded equi-joins.
    """
    sig = oph_signatures(df, text_col, id_col, k=k, shingle_n=shingle_n)
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    ta = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    tb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                lambda x: x,
            )
        )
        / F.lit(float(k))
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(est, 6).alias("est_j"),
            F.round(
                inter
                / (F.size("sh_a") + F.size("sh_b") - inter).cast("double"),
                6,
            ).alias("exact_j"),
        )
        .withColumn("abs_err", F.round(F.abs(F.col("est_j") - F.col("exact_j")), 6))
    )


def lsh_band_plan(
    spark,
    num_hashes: int = 16,
    threshold: float = 0.5,
    grid: int = 500,
    fp_weight: float = 1.0,
    fn_weight: float = 1.0,
) -> DataFrame:
    """(bands, rows_per_band) planning table for a minhash-LSH tier: for
    every exact factorization b·r = ``num_hashes``, the collision curve
    P(s) = 1 − (1 − sʳ)ᵇ is integrated on a ``grid``-point midpoint rule
    to get the expected FALSE-POSITIVE area ∫₀ᵗ P(s) ds (pairs below the
    target Jaccard ``threshold`` that still collide → wasted verifies)
    and FALSE-NEGATIVE area ∫ₜ¹ (1 − P(s)) ds (qualifying pairs the
    banding misses → lost recall), plus s50 — the similarity where
    collision probability crosses ½, (1 − 2^(−1/b))^(1/r) (Leskovec,
    Rajaraman & Ullman, Mining of Massive Datasets ch. 3). ``cost`` is
    the weighted sum; row 1 of the output is the banding the deployment
    should run. Turns the (b, r) folklore into a measured, oracled
    query — at 10^12 rows a mis-set banding either floods the verify
    join (FP) or silently under-dedups (FN), and this is the number
    that says which way.

    Scale shape: |divisors(K)| × grid rows total (a few thousand) —
    driver-free, data-free, pure relational math; joins nothing.
    """
    t = float(threshold)
    g = int(grid)
    facs = (
        spark.range(1, int(num_hashes) + 1)
        .select(F.col("id").cast("int").alias("r"))
        .where(F.lit(int(num_hashes)) % F.col("r") == 0)
        .select("r", (F.lit(int(num_hashes)) / F.col("r")).cast("int").alias("b"))
    )
    pts = facs.select(
        "b", "r", F.explode(F.sequence(F.lit(0), F.lit(g - 1))).alias("i")
    ).select(
        "b",
        "r",
        ((F.col("i") + 0.5) / F.lit(float(g))).alias("s"),
    )
    p = 1.0 - F.pow(1.0 - F.pow(F.col("s"), F.col("r")), F.col("b"))
    areas = (
        pts.select(
            "b",
            "r",
            F.when(F.col("s") < t, p).otherwise(F.lit(0.0)).alias("fp_term"),
            F.when(F.col("s") >= t, 1.0 - p)
            .otherwise(F.lit(0.0))
            .alias("fn_term"),
        )
        .groupBy("b", "r")
        .agg(
            (F.sum("fp_term") / F.lit(float(g))).alias("fp_raw"),
            (F.sum("fn_term") / F.lit(float(g))).alias("fn_raw"),
        )
    )
    cost = F.lit(float(fp_weight)) * F.col("fp_raw") + F.lit(
        float(fn_weight)
    ) * F.col("fn_raw")
    s50 = F.pow(
        1.0 - F.pow(F.lit(2.0), -1.0 / F.col("b")), 1.0 / F.col("r")
    )
    return (
        areas.select(
            "b",
            "r",
            F.round(s50, 6).alias("s50"),
            F.round("fp_raw", 6).alias("fp_area"),
            F.round("fn_raw", 6).alias("fn_area"),
            F.round(cost, 6).alias("cost"),
        )
        .orderBy("cost", "b")
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    mask_bits: int = 5,
) -> DataFrame:
    """Content-defined chunking (X220; the LBFS/rsync/restic family,
    Muthitacharoen et al. 2001): cut a document AFTER position i exactly
    when the hash of the ``window``-char gram ending at i has its low
    ``mask_bits`` bits zero — boundaries depend only on LOCAL content,
    so inserting or deleting a prefix shifts WHERE chunks start but not
    WHAT the downstream chunks hash to (fixed-size blocks lose all
    alignment after one inserted byte). Expected chunk length is
    2^mask_bits chars. This is chunk-level dedup for the storage/
    transfer tier: re-crawled near-identical pages share almost all
    chunks, so an incremental corpus snapshot stores only the changed
    ones — complementing winnowing (X6), which SELECTS fingerprints for
    similarity, where CDC PARTITIONS text for content-addressed storage.

    Stateless gear-style variant: no min/max chunk bounds (production
    CDC adds them to tame the geometric length tail) — boundary
    decisions stay context-free, which is what makes the operator
    exactly relational AND maximally shift-robust.

    Output: (id, chunk_no, start [0-based], clen, chash [md5 hex]).
    Empty texts emit no rows.

    Scale shape (10^12 rows): everything runs scan-stage in the JVM —
    per row one sequence/filter over L positions and one chunk-slice
    transform; only (id, chunk_no, start, clen, 32-char hash) rows
    shuffle, never text. Gram hashes are the portable
    conv(substr(md5(gram),1,8),16,10) integer family (the winnowing
    precedent), so DuckDB reproduces boundaries exactly.
    """
    w = int(window)
    mask = 1 << int(mask_bits)
    t = F.coalesce(F.col(text_col), F.lit(""))
    length = F.length(t)
    gram_hash = lambda i: F.conv(  # noqa: E731
        F.substring(F.md5(F.substring(t, i - (w - 1), w)), 1, 8), 16, 10
    ).cast("long")
    cuts = F.when(
        length - 1 >= w,
        F.filter(
            F.sequence(F.lit(w), length - 1),
            lambda i: gram_hash(i) % mask == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(0).cast("int")), cuts)
    ends = F.concat(cuts, F.array(length.cast("int")))
    chunks = F.when(
        length > 0,
        F.transform(
            F.arrays_zip(starts.alias("s"), ends.alias("e")),
            lambda z, j: F.struct(
                j.cast("long").alias("chunk_no"),
                z["s"].cast("long").alias("start"),
                (z["e"] - z["s"]).cast("long").alias("clen"),
                F.md5(
                    F.substring(t, z["s"] + 1, z["e"] - z["s"])
                ).alias("chash"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_no:bigint,start:bigint,clen:bigint,chash:string>>"
    ))
    return df.select(
        F.col(id_col).alias("id"), F.explode(chunks).alias("c")
    ).select(
        F.col("id").alias(id_col),
        F.col("c.chunk_no").alias("chunk_no"),
        F.col("c.start").alias("start"),
        F.col("c.clen").alias("clen"),
        F.col("c.chash").alias("chash"),
    )


def cdc_dedup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    mask_bits: int = 5,
) -> DataFrame:
    """Per-document chunk-dedup summary over cdc_chunks (X220):
    n_chunks, n_dup_chunks (chunks whose hash occurs more than once
    corpus-wide, within-doc repeats included), and dup_char_share — the
    fraction of the document's characters living in duplicated chunks,
    i.e. what an incremental content-addressed store would NOT have to
    write again. One chunk-hash groupBy + one join back on the chunk
    table's own key; text never shuffles (only hashes do)."""
    ch = cdc_chunks(df, id_col, text_col, window, mask_bits)
    counts = ch.groupBy("chash").agg(
        F.count("*").cast("long").alias("n_copies")
    )
    return (
        ch.join(counts, "chash")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum((F.col("n_copies") > 1).cast("int"))
            .cast("long")
            .alias("n_dup_chunks"),
            F.round(
                F.sum(
                    F.when(F.col("n_copies") > 1, F.col("clen")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("clen"),
                6,
            ).alias("dup_char_share"),
        )
        .orderBy(id_col)
    )


def hamming_band_recall(
    codes: DataFrame,
    id_col: str = "id",
    code_col: str = "code",
    bands: int = 4,
    hamming_k: int = 6,
) -> DataFrame:
    """Per-distance recall audit of the banded Hamming join (X227) —
    the simhash/phash twin of the ANN recall audit (X31) and the
    Jaccard (b,r) S-curve (X192): with ``bands`` bands, pigeonhole
    GUARANTEES every pair at distance < bands is caught; beyond that
    the band join is a recall gamble, and this audit measures exactly
    what it pays. For each hamming distance d ≤ hamming_k:

        (hamming, guaranteed, n_true, n_caught, recall)

    where n_true counts ALL pairs at distance d (brute-force O(n²) —
    audit a bounded sample, the X31 precedent), n_caught counts pairs
    the banded join surfaces, and guaranteed = d < bands must show
    recall = 1.0 exactly (pytest-pinned). Read the d >= bands rows to
    decide whether to add bands/multi-probe before trusting the banded
    image dedup at a looser threshold.

    Integer counts + one division — DuckDB-oracle exact.
    """
    cand = hamming_band_pairs(
        codes, id_col=id_col, code_col=code_col, bands=bands,
        hamming_k=hamming_k,
    )
    c = codes.select(F.col(id_col).alias("id"), F.col(code_col).alias("code"))
    a, b = c.alias("a"), c.alias("b")
    truth = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.bit_count(
                F.col("a.code").bitwiseXOR(F.col("b.code"))
            ).alias("hamming")
        )
        .where(F.col("hamming") <= int(hamming_k))
        .groupBy("hamming")
        .agg(F.count("*").cast("long").alias("n_true"))
    )
    caught = cand.groupBy("hamming").agg(
        F.count("*").cast("long").alias("n_caught")
    )
    return (
        truth.join(caught, "hamming", "left")
        .select(
            F.col("hamming").cast("long").alias("hamming"),
            (F.col("hamming") < int(bands)).alias("guaranteed"),
            "n_true",
            F.coalesce("n_caught", F.lit(0)).cast("long").alias("n_caught"),
            F.round(
                F.coalesce("n_caught", F.lit(0)).cast("double")
                / F.col("n_true"),
                6,
            ).alias("recall"),
        )
        .orderBy("hamming")
    )


def partial_dup_pairs(
    hashes: DataFrame,
    id_col: str = "image_id",
    bands: int = 4,
    hamming_k: int = 3,
    full_gap: int = 16,
    max_bucket: int = 64,
) -> DataFrame:
    """Partial-duplicate image pairs (X237) over quadrant_phashes output:
    a pair reports when ANY quadrant matches within ``hamming_k`` bits —
    catching crop/collage reuse where one region is lifted verbatim into
    an otherwise different image, which the whole-image phash family
    (X14) structurally misses.

    Output (id_a < id_b): matched_quads (sorted list), n_quads_matched,
    min_quad_dist, full_dist, and ``partial_only`` — true when the full
    hashes sit ``> full_gap`` bits apart, i.e. this pair is INVISIBLE to
    full-hash dedup and only the region match found it.

    Scale shape: the X14 kernel per quadrant — band keys are JVM
    shift/mask ints, the equi-join key is (quad, band, band_key), flood
    buckets (blank quadrants: letterbox bars, white backgrounds are the
    classic ones) are dropped at ``max_bucket`` exactly like
    minhash_lsh_pairs, candidates verify on bit_count(xor) and never
    touch pixels. Pigeonhole: hamming_k < bands loses no pair."""
    from pyspark.sql import Window

    band_bits = 64 // bands
    mask = (1 << band_bits) - 1
    quads = hashes.select(
        F.col(id_col).alias("id"),
        "ph_full",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("quad"), F.col(f"ph_q{q}").alias("code")
                    )
                    for q in range(4)
                ]
            )
        ).alias("_q"),
    ).select("id", "ph_full", F.col("_q.quad").alias("quad"), F.col("_q.code").alias("code"))
    banded = quads.select(
        "id",
        "quad",
        "code",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("code", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select(
        "id", "quad", "code", F.col("_b.band").alias("band"), F.col("_b.band_key").alias("band_key")
    )
    if max_bucket is not None:
        w = Window.partitionBy("quad", "band", "band_key")
        banded = banded.withColumn("_n", F.count("*").over(w)).where(
            F.col("_n") <= max_bucket
        ).drop("_n")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.quad") == F.col("b.quad"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.quad").alias("quad"),
            F.bit_count(
                F.col("a.code").bitwiseXOR(F.col("b.code"))
            ).alias("qdist"),
        )
        .where(F.col("qdist") <= hamming_k)
        .groupBy("id_a", "id_b", "quad")
        .agg(F.min("qdist").alias("qdist"))
    )
    fulls = hashes.select(F.col(id_col).alias("id"), "ph_full")
    agg = cand.groupBy("id_a", "id_b").agg(
        F.sort_array(F.collect_set("quad")).alias("matched_quads"),
        F.count("*").cast("long").alias("n_quads_matched"),
        F.min("qdist").alias("min_quad_dist"),
    )
    out = (
        agg.join(fulls.withColumnRenamed("id", "id_a").withColumnRenamed("ph_full", "_fa"), "id_a")
        .join(fulls.withColumnRenamed("id", "id_b").withColumnRenamed("ph_full", "_fb"), "id_b")
        .select(
            "id_a",
            "id_b",
            "matched_quads",
            "n_quads_matched",
            "min_quad_dist",
            F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb"))).alias("full_dist"),
        )
    )
    return out.select(
        "*", (F.col("full_dist") > full_gap).alias("partial_only")
    ).orderBy("id_a", "id_b")
