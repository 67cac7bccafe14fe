"""Corpus-curation operators for LLM training-data pipelines.

The reference curates corpora doc-by-doc (language filters, clean_text,
dedup-by-upsert — corpusama/corpus/*.py); a 10^12-row training-data build
needs the corpus-LEVEL curation family on top. Four operators, each
shuffle-deliberate and deterministic (md5-keyed, never rand()), each with a
DuckDB-oracle-portable contract twin in `__spark_entry__.py`:

- `ngram_contamination`: benchmark-decontamination (GPT-3 appendix C /
  Brown et al. 2020: flag any training doc sharing an n-gram with an eval
  set). Bench grams are DISTINCT + broadcast → the doc-side explode stays
  scan-stage; only hit rows ever shuffle.
- `drop_duplicated_lines`: corpus-level duplicated-line removal (CCNet,
  Wenzek et al. 2020: lines repeated across the corpus are boilerplate).
  Counts flow as 16-byte md5 hashes with map-side partial aggregation; the
  hot set (count >= threshold, at most total_lines/threshold entries) is
  broadcast for the anti-join.
- `stratified_sample`: per-stratum hash sampling for data-mixing weights.
  Pure scan-stage predicate, ZERO shuffle — and retry-safe where
  `df.sample`/rand() is not: a recomputed task re-derives the same md5(key)
  decision, so speculative execution cannot change the sample.
- `semantic_dedup`: SemDeDup-shaped (Abbas et al. 2023) embedding near-dup
  clustering — axis-sign LSH buckets (bit-exact across engines, see
  similarity.axis_sign_buckets) → within-bucket cosine >= tau edges →
  connected components → keep the min-id representative per cluster.
  Candidate work is O(sum bucket²), bounded by `max_bucket`; raise `nbits`
  as the corpus grows to keep buckets small.
- `pack_shards`: token-budget training-shard assignment via a DISTRIBUTED
  prefix sum (range repartition → per-partition subtotals → broadcast
  offsets → per-partition cumsum) — never a global single-partition
  window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from corpusama_spark.operators.dedup import shingles

__all__ = [
    "ngram_contamination",
    "drop_duplicated_lines",
    "stratified_sample",
    "hash_uniform",
    "temperature_fractions",
    "semantic_dedup",
    "pack_shards",
    "hash_split",
    "quota_sample",
    "quota_sample_skewsafe",
    "pps_sample",
    "neighbor_score_stats",
    "boilerplate_share",
    "eb_shrunk_means",
    "cross_reuse_stats",
    "within_group_percentile",
    "weighted_sample_topk",
    "chunk_windows",
    "neyman_allocation",
]


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 6,
    bloom_bits: int | None = None,
    bloom_k: int = 5,
) -> DataFrame:
    """(id, n_hits, contaminated) per doc: n_hits = how many DISTINCT
    benchmark n-grams the doc contains (word n-grams, lowercased,
    whitespace-tokenized — dedup.shingles), contaminated = n_hits > 0.

    Every doc in `docs` appears in the output (left join), so the result
    is a complete keep/drop column, not just the flagged subset.

    Scale shape: the bench side is `array_distinct`-ed per doc, then
    globally distinct, then **broadcast** — eval suites are tiny next to a
    training corpus (even 10^5 docs × 10^3 grams ≈ 10^8 grams is the upper
    end). The doc-side explode never shuffles: explode → broadcast hash
    join runs in the scan stage, and only MATCHING (id, gram) rows reach
    the per-id count shuffle.

    `bloom_bits` engages the documented past-broadcast scale path: a
    distributed-built Bloom filter over the bench grams (operators/bloom)
    pre-filters doc grams in the scan stage, and the exact join only sees
    the surviving ~fpp fraction. Bloom filters have no false negatives and
    the exact join removes the false positives, so results are
    byte-identical to the exact-only plan (test-pinned) — but building the
    bitmap is an eager action, so the default stays lazy/exact-only.
    """
    grams = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("gram")
    )
    bench_grams = (
        bench.select(F.explode(shingles(text_col, n)).alias("gram")).distinct()
    )
    if bloom_bits:
        from corpusama_spark.operators.bloom import (
            bloom_build,
            bloom_might_contain,
        )

        words = bloom_build(bench_grams, F.col("gram"), bloom_bits, bloom_k)
        grams = grams.where(
            bloom_might_contain(
                docs.sparkSession, words, F.col("gram"), bloom_bits, bloom_k
            )
        )
    hits = (
        grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def drop_duplicated_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: int = 2,
) -> DataFrame:
    """(id, text, n_kept, n_dropped): remove every line whose EXACT text
    occurs >= threshold times across the whole corpus (CCNet's duplicated-
    line boilerplate filter), preserving the order of surviving lines.
    Docs whose lines are all boilerplate survive with text = ''.

    Two shuffles, both sized deliberately: (1) the corpus-wide line count
    groups by md5(line) — 16-byte keys with map-side partial aggregation,
    never the line text; (2) the doc reassembly groups kept (pos, line)
    pairs by id — the only place full text moves, and it moves once. The
    hot set has at most total_lines/threshold entries and is broadcast for
    the anti-join; at extreme scale route it through operators/bloom
    (definitely-not-hot lines skip the exact anti-join entirely — Bloom's
    no-false-negative side is the safe side here).
    """
    # NULL text is treated as empty (one empty line): split(NULL) would
    # otherwise drop the doc from the explode AND null out n_dropped
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(txt, "\n")).alias("pos", "line"),
    ).withColumn("lh", F.md5(F.col("line")))
    hot = (
        lines.groupBy("lh")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= threshold)
        .select("lh")
    )
    kept = lines.join(F.broadcast(hot), "lh", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(txt, "\n")).alias("n_lines"),
    )
    return totals.join(rebuilt, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
    )


def hash_uniform(key: Column, seed: str = "strat") -> Column:
    """Deterministic uniform [0, 1) from a key: first 8 md5 hex chars as a
    32-bit int / 2^32. Portable to any engine with md5 (the DuckDB twin is
    ('0x' || substr(md5(seed || ':' || k), 1, 8))::BIGINT / 2^32), and
    retry-safe where rand() is not — a re-executed task re-derives the
    same decision. NULL keys yield NULL (concat propagates, exactly like
    the SQL twin's ||), so a `u < frac` filter drops them — never the
    concat_ws trap of collapsing every NULL key onto one shared hash that
    keeps or drops the whole NULL cohort as a block."""
    k = F.concat(F.lit(seed + ":"), key.cast("string"))
    return F.conv(F.substring(F.md5(k), 1, 8), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "strat",
) -> DataFrame:
    """Keep each row with probability fractions[stratum] (strata absent
    from the dict default to 0.0 — dropped), decided by md5(seed:key).
    This is the data-mixing primitive: express per-source/per-language
    mixture weights as fractions and sample in ONE scan-stage pass — no
    shuffle, no rand() (retry/speculation-safe), no per-stratum jobs like
    DataFrame.sampleBy issues.
    """
    # one FLAT CaseWhen (chained .when on a single Column), not a
    # |fractions|-deep nest of otherwise()-wrapped CaseWhens — a realistic
    # mixing map has hundreds of language x source strata and the nested
    # form recurses the analyzer/codegen that deep
    keys = sorted(fractions)
    frac: Column = F.when(
        F.col(strata_col) == F.lit(keys[0]), F.lit(float(fractions[keys[0]]))
    ) if keys else F.lit(0.0)
    for k in keys[1:]:
        frac = frac.when(F.col(strata_col) == F.lit(k), F.lit(float(fractions[k])))
    if keys:
        frac = frac.otherwise(F.lit(0.0))
    return df.where(hash_uniform(F.col(key_col), seed) < frac)


def temperature_fractions(
    df: DataFrame,
    strata_col: str,
    temperature: float = 2.0,
    target_rows: int | None = None,
) -> dict[str, float]:
    """Per-stratum keep-fractions that re-balance a skewed mixture by
    temperature sampling (multilingual-training convention: sample stratum
    s proportionally to count(s)^(1/T), so T=1 keeps the natural mix and
    T→∞ approaches uniform). Fractions are scaled so the LARGEST resulting
    stratum keeps 100% (no fraction exceeds 1), or — with `target_rows` —
    so the total EXPECTED sample hits the target exactly, waterfilling the
    mass of any stratum that clamps at 1.0 onto the rest (unreachable only
    when target_rows exceeds the corpus). Feed it to `stratified_sample`.

    One aggregate job over the strata column — a driver dict of
    #distinct-strata entries (languages/sources: tiny), the same bounded-
    collect scale as pack_shards' per-partition offsets.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
        if r[0] is not None and r[1] > 0
    }
    if not counts:
        return {}
    weights = {k: c ** (1.0 / temperature) for k, c in counts.items()}
    if target_rows is not None:
        # expected kept rows = sum(frac_s * count_s) = target_rows, with
        # frac <= 1: waterfill — strata whose fraction clamps at 1.0
        # contribute all their rows, and the clamped-off mass is
        # redistributed over the rest (<= #strata rounds) instead of
        # silently undershooting the target
        frac = {k: 0.0 for k in counts}
        free = set(counts)
        remaining = float(target_rows)
        while free and remaining > 0:
            w_free = sum(weights[k] for k in free)
            scale = remaining / w_free
            clamped = {k for k in free if weights[k] * scale >= counts[k]}
            if not clamped:
                for k in free:
                    frac[k] = (weights[k] * scale) / counts[k]
                break
            for k in clamped:
                frac[k] = 1.0
                remaining -= counts[k]
            free -= clamped
        return frac
    # normalize so the stratum with the highest weight-to-count ratio
    # (the rarest one under T>1) keeps everything
    ratios = {k: weights[k] / counts[k] for k in counts}
    top = max(ratios.values())
    return {k: min(1.0, ratios[k] / top) for k in counts}


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.85,
    nbits: int = 6,
    ntables: int = 8,
    max_bucket: int = 10_000,
    fixed_iters: int | None = None,
) -> DataFrame:
    """(id, cluster_id, keep): SemDeDup-shaped semantic dedup. Vectors
    meeting in any axis-sign LSH bucket with round(cosine, 6) >= tau form
    edges; connected components label clusters; keep = (id == min id of
    the cluster). Every input row appears (singletons keep themselves).

    Axis-sign buckets (similarity.axis_sign_buckets) involve no float
    arithmetic, so the candidate set — and with the 6-decimal cosine
    rounding, the edge set — is reproducible bit-exactly in a DuckDB
    oracle; this is the portable tier of the family (the random-plane /
    IVF tiers trade that for better recall). Buckets above `max_bucket`
    are dropped before the self-join (LSH flood guard: a degenerate
    bucket would otherwise cost O(bucket²)).

    Components default to CONVERGENCE mode (fixed_iters=None): near-dup
    clusters have tiny diameter, so hash-min early-exits after ~2 rounds
    — measured 3x faster than 6 fixed rounds at sf0.1 with identical
    output (the fixpoint is the same labeling either way). Pass
    `fixed_iters` only when mid-plan actions are unacceptable.
    """
    from corpusama_spark.operators.components import connected_components
    from corpusama_spark.operators.similarity import infer_dim

    dim = infer_dim(emb, vec_col)
    if dim < nbits * ntables:
        raise ValueError(
            f"semantic_dedup needs dim >= nbits*ntables "
            f"({nbits}*{ntables}={nbits * ntables}), got dim={dim}"
        )
    vec = F.col(vec_col).cast("array<double>")
    ids = emb.select(F.col(id_col).alias("id"), vec.alias("v"))
    # buckets carry ONLY ids: vectors would otherwise be duplicated
    # ntables-fold through the exchange, and near-identical rows share
    # ~all tables, so the same pair surfaces up to ntables times — dedupe
    # id-pairs FIRST, then score each distinct pair exactly once (the
    # cosine fold over 2*dim doubles is the expensive expression here;
    # measured ~8x fewer evaluations on the contract tiers).
    base = ids.select(
        "id", F.explode(axis_keys(F.col("v"), nbits, ntables)).alias("bucket")
    )
    sizes = base.groupBy("bucket").agg(F.count("*").alias("bsz"))
    guarded = base.join(
        F.broadcast(sizes.where(F.col("bsz") <= max_bucket).select("bucket")),
        "bucket",
    )
    cand = (
        guarded.select("bucket", F.col("id").alias("id_a"))
        .join(guarded.select("bucket", F.col("id").alias("id_b")), "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    edges = (
        cand.join(
            ids.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a"
        )
        .join(ids.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .where(F.round(_cos(F.col("va"), F.col("vb")), 6) >= F.lit(float(tau)))
        .select("id_a", "id_b")
    )
    comp = connected_components(edges, fixed_iters=fixed_iters)
    out = (
        emb.select(F.col(id_col).alias("id"))
        .join(comp.withColumnRenamed("component", "cluster_id"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
            (F.coalesce(F.col("cluster_id"), F.col("id")) == F.col("id")).alias(
                "keep"
            ),
        )
    )
    # propagate connected_components' persisted handles: wrapping comp in
    # joins/renames sheds the own_caches attribute, so without this the
    # caller could never release them (plans/caching.py contract)
    from corpusama_spark.plans.caching import own_caches

    return own_caches(out, *getattr(comp, "_owned_caches", []))


def pack_shards(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: Column | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, shard_id): assign docs, in id order, to fixed
    token-budget training shards — shard_id = floor(exclusive-prefix-sum /
    budget), i.e. a doc belongs to the shard its first token falls in; a
    doc larger than the budget owns its starting shard and pushes later
    docs onward. `count_col` defaults to the BPE-ish token estimator
    (textstats.bpe_token_count).

    This is a DISTRIBUTED prefix sum, not a global single-partition
    window (`Window.orderBy` with no partition key funnels 10^12 rows
    through one task): range-repartition on id → per-partition subtotals
    (driver collect of ONE row per partition, the same bounded-manifest
    scale as checkpoint bucket tracking) → broadcast exclusive offsets →
    per-partition window cumsum. The ranged stage is persisted so the
    subtotal job and the cumsum job are guaranteed the SAME partition
    boundaries (range sampling re-executed across jobs may differ);
    caller releases via plans.caching.release. The output is invariant
    to where the boundaries land, since offsets are derived from the
    same partitioning they correct for.
    """
    from corpusama_spark.operators.textstats import bpe_token_count
    from corpusama_spark.plans.caching import own_caches

    spark = df.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    counted = count_col if count_col is not None else bpe_token_count(
        F.col(text_col)
    )
    ranged = (
        df.select(F.col(id_col).alias("id"), counted.cast("long").alias("n_tokens"))
        .repartitionByRange(n_parts, F.col("id"))
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    psums = sorted(
        (r.pid, r.s)
        for r in ranged.groupBy("pid").agg(F.sum("n_tokens").alias("s")).collect()
    )
    offsets, running = [], 0
    for pid, s in psums:
        offsets.append((pid, running))
        running += s or 0
    off = spark.createDataFrame(offsets or [(0, 0)], "pid int, offset long")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("pid")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ranged.join(F.broadcast(off), "pid")
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.floor(
                (F.col("offset") + F.col("_cum") - F.col("n_tokens"))
                / F.lit(int(budget))
            ).alias("shard_id"),
        )
    )
    return own_caches(out, ranged)


def _cos(a: Column, b: Column) -> Column:
    from corpusama_spark.operators.similarity import cosine

    return cosine(a, b)


def axis_keys(vec: Column, nbits: int, ntables: int) -> Column:
    from corpusama_spark.operators.similarity import axis_sign_buckets

    return axis_sign_buckets(vec, nbits, ntables)


def hash_split(
    key: Column, weights: dict[str, float], seed: str = "split"
) -> Column:
    """Deterministic train/val/test assignment from a key: one
    hash_uniform draw cut by cumulative weight thresholds. Retry-safe
    (no rand()), engine-portable (same md5 idiom as hash_uniform), and
    stable under repartition/backfill — the split a 10^12-row corpus can
    recompute from scratch and get byte-identical membership. Weights
    need not sum to 1.0; the remainder maps to NULL (excluded), which
    doubles as a global down-sampling knob. NULL keys yield NULL."""
    u = hash_uniform(key, seed)
    names = sorted(weights)
    expr: Column | None = None
    cum = 0.0
    for name in names:
        cum += float(weights[name])
        branch = u < F.lit(cum)
        expr = F.when(branch, F.lit(name)) if expr is None else expr.when(
            branch, F.lit(name)
        )
    return expr if expr is not None else F.lit(None).cast("string")


def quota_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
    seed: str = "quota",
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen by md5 rank — the
    per-domain cap every crawl-curation pipeline applies so one megasite
    cannot dominate the corpus (C4 caps pages per domain the same way).

    Rank = row_number over (group, ORDER BY hash_uniform(key), key):
    deterministic, retry-safe, and uniformly random-in-expectation per
    group. ONE group-keyed exchange; the window state is a counter, not
    a buffer. A hot group (one domain = 10% of the crawl) serializes its
    single partition — at that skew use quota_sample_skewsafe, which is
    value-identical (test-pinned) but never windows the full hot group.
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_uniform(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= int(quota))
        .drop("_rk")
    )


def quota_sample_skewsafe(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
    seed: str = "quota",
    slack: float = 4.0,
) -> DataFrame:
    """EXACTLY quota_sample's output, without ever funneling a hot group
    through one window partition — the path for a crawl where one domain
    is 10% of the table.

    Three stages, all skew-immune:
    1. Per-group counts (map-side-combinable agg) broadcast back, so the
       corpus side never shuffles for the join.
    2. Threshold prefilter IN THE SCAN STAGE: a row survives when its
       hash_uniform u < slack·quota/n (groups with n ≤ slack·quota keep
       everything). Survivors per group concentrate near E[slack·quota]
       regardless of n, so the exact rank that follows windows a BOUNDED
       set — the hot group contributes ~slack·quota rows, not 10^11.
    3. Exactness repair: a group whose survivor count came up short of
       min(quota, n) (possible, Chernoff-rare, when its quota-th
       smallest u exceeds the threshold) is re-ranked over its FULL rows
       via a broadcast semi-join of the deficit group list. Deficit
       groups are rare and usually small (large n makes a shortfall
       astronomically unlikely), so the fallback window is cheap.

    The union of stage-2 ranked survivors (deficit groups excluded) and
    stage-3 re-ranked deficit groups is byte-identical to quota_sample —
    pinned by the hot-group equivalence test.
    """
    q = int(quota)
    u = hash_uniform(F.col(key_col), seed)
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    thresh = F.least(
        F.lit(1.0), F.lit(float(slack) * q) / F.col("_n").cast("double")
    )
    survivors = (
        df.join(F.broadcast(counts), group_col)
        .where(u < thresh)
        .drop("_n")
    )
    w = Window.partitionBy(group_col).orderBy(
        u.asc(), F.col(key_col).asc()
    )
    ranked = survivors.withColumn("_rk", F.row_number().over(w))
    kept = ranked.where(F.col("_rk") <= q)
    # groups that produced fewer survivors than min(quota, n) must be
    # re-ranked over their full rows; count(*)<n distinguishes "group is
    # genuinely smaller than quota" (fine) from "threshold cut too deep"
    surv_counts = ranked.groupBy(group_col).agg(F.count("*").alias("_s"))
    deficits = (
        counts.join(surv_counts, group_col, "left")
        .where(
            F.coalesce(F.col("_s"), F.lit(0))
            < F.least(F.lit(q), F.col("_n"))
        )
        .select(group_col)
    )
    clean = kept.join(F.broadcast(deficits), group_col, "left_anti").drop(
        "_rk"
    )
    repaired = quota_sample(
        df.join(F.broadcast(deficits), group_col, "left_semi"),
        group_col,
        key_col,
        q,
        seed,
    )
    # the counts join moved group_col first; restore the input order
    return clean.unionByName(repaired).select(*df.columns)


def pps_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    rate: float,
    seed: str = "pps",
) -> DataFrame:
    """Poisson sampling with inclusion probability proportional to size
    (PPS): keep each row with p = min(1, weight * rate), decided by
    md5(seed:key), and attach `ht_weight` = 1/p — the Horvitz-Thompson
    inverse-inclusion weight that makes downstream sums/counts unbiased
    estimates of the full-corpus values. This is the budgeted-subsample
    primitive (sample long docs proportionally more, weight them back
    down) the quality-audit and eval-set-construction paths need.

    Pure scan-stage predicate: ZERO shuffle, retry/speculation-safe
    (a re-executed task re-derives the same md5 decision — `df.sample`
    cannot promise that). Pick `rate` = 1 / 2^k where possible: then
    weight*rate is IEEE-exact and the keep decision is bit-portable to
    any engine with md5 (the DuckDB twin divides by the same power of
    two), so the sample is auditable outside Spark.
    """
    p = F.least(
        F.lit(1.0), F.col(weight_col).cast("double") * F.lit(float(rate))
    )
    return df.where(hash_uniform(F.col(key_col), seed) < p).withColumn(
        "ht_weight", F.round(F.lit(1.0) / p, 6)
    )


def neighbor_score_stats(
    pairs: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """1-hop score smoothing over a near-dup pair graph: for every row
    that HAS near-duplicates, the mean score of its neighbors and the
    divergence own - neighborhood mean. A doc much worse than its
    near-dup cluster is a mutation of good content (spam injection,
    truncated mirror); a doc much better sits in a farm of degraded
    copies — either way the divergence, not the raw score, is the
    curation signal (label-propagation step 1 of SemDeDup-style
    cluster-quality audits).

    `pairs` is any (id_a, id_b) candidate table (phash bands, MinHash
    buckets — already flood-guarded upstream, so edges << corpus).
    Shape at scale: edges symmetrize with a union (no shuffle), ONE
    shuffle joins neighbor scores in, one bounded groupBy averages
    them, and the own-score join is the only corpus-sized exchange.
    Scores stay integer-summable where possible (doc length, token
    count): an integer sum is order-independent, so the mean is
    bit-identical on any engine regardless of partitioning.
    """
    edges = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nb")
    ).unionByName(
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nb"))
    )
    nb_scores = scores.select(
        F.col(id_col).alias("nb"), F.col(score_col).alias("nb_score")
    )
    agg = (
        edges.join(nb_scores, "nb")
        .groupBy("id")
        .agg(
            F.avg("nb_score").alias("nb_mean"),
            F.count("*").alias("n_nb"),
        )
    )
    own = scores.select(
        F.col(id_col).alias("id"), F.col(score_col).alias("own_score")
    )
    return own.join(agg, "id").select(
        "id",
        "own_score",
        F.round(F.col("nb_mean"), 6).alias("nb_mean"),
        F.col("n_nb").cast("long").alias("n_nb"),
        F.round(F.col("own_score") - F.col("nb_mean"), 6).alias(
            "divergence"
        ),
    )


def boilerplate_share(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: int = 2,
) -> DataFrame:
    """Metric-only twin of drop_duplicated_lines: per-doc count and
    share of lines whose exact text repeats >= threshold times across
    the corpus. The SCORE feeds a keep/drop gate or a quality model
    feature without ever rebuilding text — so unlike the removal path,
    full line text never shuffles: lines reduce to md5 keys for the
    corpus count, the hot set broadcasts back, and the per-doc tally
    groups 16-byte hashes. share = boiler/lines is an int/int divide —
    bit-portable across engines.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(txt, "\n")).alias("line"),
    ).select("id", F.md5(F.col("line")).alias("lh"))
    hot = (
        lines.groupBy("lh")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= int(threshold))
        .select("lh")
    )
    boiler = (
        lines.join(F.broadcast(hot), "lh", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_boiler"))
    )
    totals = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(txt, "\n")).cast("long").alias("n_lines"),
    )
    return totals.join(boiler, "id", "left").select(
        F.col("id").alias(id_col),
        F.col("n_lines"),
        F.coalesce(F.col("n_boiler"), F.lit(0)).cast("long").alias(
            "n_boiler"
        ),
        F.round(
            F.coalesce(F.col("n_boiler"), F.lit(0))
            / F.col("n_lines"),
            6,
        ).alias("boiler_share"),
    )


def eb_shrunk_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
    prior_strength: float = 20.0,
) -> DataFrame:
    """Empirical-Bayes shrinkage of per-group mean scores toward the
    corpus mean: shrunk = (sum + k*global_mean) / (n + k). The
    domain-level quality gate (CCNet/RefinedWeb-style "drop bad hosts")
    needs exactly this — a 3-document domain with a perfect raw mean
    must NOT outrank a 10,000-document domain with a good one, and the
    prior strength k is the knob. Output keeps raw and shrunk means so
    the rank changes are auditable.

    Scale shape: one map-side-combinable groupBy produces a
    domains-sized table; the global totals are a broadcast single-row
    join. Nothing downstream touches corpus-sized data. Integer value
    columns keep the group sums exact (order-independent), so the float
    shrinkage expression is evaluated once per group on exact inputs —
    bit-identical on any engine with IEEE doubles.
    """
    k = float(prior_strength)
    g = df.groupBy(group_col).agg(
        F.sum(F.col(value_col)).cast("long").alias("_s"),
        F.count(value_col).cast("long").alias("_n"),
    )
    tot = g.agg(
        F.sum("_s").cast("long").alias("_ts"),
        F.sum("_n").cast("long").alias("_tn"),
    )
    return g.crossJoin(F.broadcast(tot)).select(
        F.col(group_col),
        F.col("_n").alias("n_docs"),
        F.round(F.col("_s") / F.col("_n"), 6).alias("raw_mean"),
        F.round(
            (F.col("_s") + F.lit(k) * (F.col("_ts") / F.col("_tn")))
            / (F.col("_n") + F.lit(k)),
            6,
        ).alias("shrunk_mean"),
    )


def cross_reuse_stats(
    df: DataFrame,
    key_col: str,
    val_col: str,
    min_rows: int = 2,
) -> DataFrame:
    """Key-reuse audit across distinct values: per key, how many rows
    carry it and how many DISTINCT values it co-occurs with. The
    caption-farm detector — a caption string attached to hundreds of
    distinct images is generator boilerplate ("image may contain...")
    and poisons contrastive training even though no single (caption,
    image) pair is a duplicate. Symmetric uses: one image id under many
    captions, one URL under many texts.

    Scale shape: exact count(DISTINCT val) inside a groupBy compiles to
    the standard two-phase plan — partial-aggregate on (key, val), then
    a key-keyed exchange — so no task holds corpus-sized state unless
    one key floods, and min_rows filters OUTPUT rows, never inputs.
    """
    return (
        df.groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct(val_col).cast("long").alias("n_distinct_vals"),
        )
        .where(F.col("n_rows") >= int(min_rows))
        .withColumn(
            "reused", F.col("n_distinct_vals") > F.lit(1)
        )
    )


def within_group_percentile(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Percentile normalization of a quality score WITHIN each group:
    percent_rank over (partition by group order by value). Raw scores
    are not comparable across sources (a wiki dump and a crawl have
    different length distributions); mapping every doc to its
    within-source percentile makes ONE global threshold meaningful —
    the continuous version of the per-group quantile gate. percent_rank
    is rank arithmetic ((rank-1)/(n-1)), deterministic under ties and
    bit-portable.

    Scale shape: one group-keyed exchange + in-partition sort. Hot
    groups (one source = half the corpus) serialize a task; pre-split
    by a coarse hash and merge ranks only if a group exceeds task
    memory — at that point prefer the relational rank-join variant
    (quantiles.py) which shards freely.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(F.col(value_col))
    return df.withColumn(
        "pct", F.round(F.percent_rank().over(w), 6)
    )


def weighted_sample_topk(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int = 5,
    seed: str = "ws",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, one distributed pass:
    Efraimidis-Spirakis (2006) — each row draws u from md5(seed:key)
    and survives if its key ln(u)/w ranks in the group's top k (w =
    weight; ln(u)/w descending is the same order as u^(1/w)). The
    probability a row wins is proportional to its weight, WITHOUT
    replacement — the exact semantics "pick 5 docs per source, long
    docs proportionally likelier, no repeats" needs, where PPS Poisson
    (X101) can't pin the sample size and rand() isn't retry-safe.

    Deterministic end to end: u = (h32 + 0.5) / 2^32 (never 0, so
    ln never sees -inf), md5-derived, identical on any engine and
    under any retry/speculation. Rows with weight <= 0 can never win
    and are filtered explicitly. Scale shape: one group-keyed window
    top-k — the same exchange quota_sample pays; at extreme group
    sizes use the threshold-prefilter trick from quota_sample_skewsafe.
    """
    w = F.col(weight_col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed + ":"), F.col(key_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    es_key = F.log(u) / w
    win = Window.partitionBy(group_col).orderBy(
        F.desc("_es"), F.asc(key_col)
    )
    return (
        df.where(w > 0)
        .withColumn("_es", es_key)
        .withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= int(k))
        .drop("_es")
    )


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-size overlapping token windows per document — the
    context-length chunking every LM training/embedding pipeline runs
    between curation and tokenization (overlap preserves cross-boundary
    context; the final window is allowed to run short rather than
    padding or dropping tail tokens). Returns (id, chunk_idx, n_tokens,
    chunk_text), deterministic and order-stable.

    Pure per-row array arithmetic: split → sequence of window starts →
    posexplode → slice — all scan-stage, ZERO shuffle, no UDF; output
    size is rows × ceil(n_tok/stride), exactly the blowup the caller
    asked for. Docs with no tokens produce no chunks (explicit, not an
    empty-string chunk).
    """
    size = int(size)
    stride = size - int(overlap)
    if stride <= 0:
        raise ValueError("overlap must be smaller than size")
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "",
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("_t")).withColumn(
        "_n", F.size("_t")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride)
    )
    return (
        base.where(F.col("_n") > 0)
        .select(
            "id",
            "_t",
            F.posexplode(starts).alias("chunk_idx", "_start"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(F.slice("_t", F.col("_start") + 1, size))
            .cast("long")
            .alias("n_tokens"),
            F.concat_ws(
                " ", F.slice("_t", F.col("_start") + 1, size)
            ).alias("chunk_text"),
        )
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int,
) -> DataFrame:
    """Optimal (Neyman) sample-size allocation across strata for a
    fixed audit budget: stratum h gets n·(N_h·S_h)/Σ(N_h·S_h) — the
    allocation that minimizes the variance of the stratified mean
    estimator (Neyman 1934, classical survey sampling). This is the
    planning table that says HOW MANY rows from each domain the manual
    quality audit should read: big AND internally-varied strata get
    more; a huge but homogeneous stratum gets few. Fractional seats are
    resolved by largest remainder (Hamilton's method, remainder desc /
    stratum asc) so allocations are integers that sum EXACTLY to the
    budget. Degenerate case Σ N_h·S_h = 0 (every stratum constant)
    falls back to proportional-to-size allocation, same rounding.

    S_h is computed from exact integer moments (Σv, Σv² as longs, the
    value column must be integer-valued), so the only floats are one
    sqrt and one divide per STRATUM — both engines produce identical
    doubles and identical floors. The corpus collapses to one row per
    stratum in a single map-side-combinable groupBy; the ranking window
    and total join run over the strata table only.
    """
    from pyspark.sql.window import Window

    budget = int(budget)
    v = F.col(value_col).cast("long")
    per = df.groupBy(F.col(stratum_col).alias("g")).agg(
        F.count("*").cast("long").alias("nh"),
        F.sum(v).cast("long").alias("s1"),
        F.sum(v * v).cast("long").alias("s2"),
    )
    # population variance from integer moments: (s2 - s1^2/n) / n
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("nh")
    ) / F.col("nh")
    per = per.withColumn("sh", F.sqrt(F.greatest(var, F.lit(0.0))))
    per = per.withColumn("wh", F.col("nh") * F.col("sh"))
    tot = per.agg(
        F.sum("wh").alias("tw"), F.sum("nh").cast("long").alias("tn")
    )
    j = per.crossJoin(F.broadcast(tot))
    raw = F.when(
        F.col("tw") > 0, F.lit(float(budget)) * F.col("wh") / F.col("tw")
    ).otherwise(
        F.lit(float(budget)) * F.col("nh") / F.col("tn").cast("double")
    )
    j = j.select(
        "g",
        "nh",
        F.round(F.col("sh"), 6).alias("sh"),
        F.floor(raw).cast("long").alias("base"),
        (raw - F.floor(raw)).alias("rem"),
    )
    leftover = j.agg(
        (F.lit(budget) - F.sum("base")).cast("long").alias("extra")
    )
    rw = Window.orderBy(F.desc("rem"), F.asc("g"))
    return (
        j.crossJoin(F.broadcast(leftover))
        .withColumn("rnk", F.row_number().over(rw))
        .select(
            F.col("g").alias(stratum_col),
            F.col("nh").alias("n_rows"),
            "sh",
            (
                F.col("base")
                + (F.col("rnk") <= F.col("extra")).cast("long")
            ).alias("alloc"),
        )
    )


def template_prefix(
    df: DataFrame,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group longest common prefix over ALL texts — the template /
    boilerplate-header detector: a crawl source whose every caption
    starts with "Stock photo: " shows up here as a long shared prefix,
    which the line-level dedup (drop_duplicated_lines) misses when the
    boilerplate is glued to real content on one line.

    The trick makes it one aggregation: the common prefix of a SET of
    strings equals the common prefix of its lexicographic min and max
    (any divergence between two members appears between min and max).
    So the corpus collapses to (group, min(text), max(text)) in one
    map-side-combinable groupBy, and the LCP scan runs once per GROUP
    on two strings — prefix matching is monotone, so the scan is
    ``size(filter(sequence(1, L), i -> prefix_i(min) = prefix_i(max)))``
    in pure JVM expression code (O(L²) chars on two strings per group;
    L is caption-scale). NULL/empty texts are excluded; groups with
    none report n_docs=0 and an empty prefix.
    """
    base = df.where(
        F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    ).select(F.col(group_col).alias("g"), F.col(text_col).alias("t"))
    allg = df.select(F.col(group_col).alias("g")).distinct()
    mm = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("t").alias("mn"),
        F.max("t").alias("mx"),
    )
    lcp_len = F.expr(
        "size(filter(sequence(1, int(least(length(mn), length(mx)))), "
        "i -> substring(mn, 1, i) = substring(mx, 1, i)))"
    )
    return (
        allg.join(mm, "g", "left")
        .select(
            F.col("g").alias(group_col),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce(lcp_len, F.lit(0)).cast("long").alias("prefix_len"),
            F.coalesce(
                F.expr("substring(mn, 1, size(filter(sequence(1, "
                       "int(least(length(mn), length(mx)))), "
                       "i -> substring(mn, 1, i) = substring(mx, 1, i))))"),
                F.lit(""),
            ).alias("prefix"),
        )
        .orderBy(group_col)
    )


def interleave_schedule(
    df: DataFrame,
    weight_col: Column,
    group_col: str = "source",
    id_col: str = "doc_id",
    limit: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic low-discrepancy source interleave (X188): the
    GLOBAL TRAINING ORDER a mixture recipe compiles to. The i-th doc of
    source s (id order) gets mix_key = (i − 0.5) / w_s; sorting by
    mix_key interleaves sources so that every prefix of the schedule
    holds each source in proportion to its weight to within one doc —
    the deterministic counterpart of sampling-without-replacement
    mixture draws (same mechanism as weighted round-robin / WFQ's
    virtual finishing times, and the stride schedules used for
    data-mixing in LLM training). temperature_mixing (X47) chooses the
    weights; this operator turns weights into an order.

    Output per scheduled doc: global_rank, source, doc_id, src_rank
    (rank within source), mix_key (6 dp), src_share (source's share of
    the prefix ending here), target_share (w_s/Σw), disc = src_share −
    target_share — the discrepancy audit column; |disc| stays O(1/rank).

    Scale shape (10^12 rows): per-source rank is one source-keyed
    window (a giant source serializes one task — pre-split by coarse id
    bucket and offset, as sessions.presplit does, if one source is 50%
    of the corpus). The GLOBAL rank is NOT a single-partition window:
    range-repartition on (mix_key, source, id) → per-partition counts
    (one driver row per partition) → broadcast exclusive offsets →
    per-partition row_number + offset, the pack_shards prefix-sum
    pattern. The ranged stage is persisted so the count job and the
    rank job see identical boundaries; caller releases via
    plans.caching.release.
    """
    from pyspark.sql.window import Window as W

    from corpusama_spark.plans.caching import own_caches

    spark = df.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    w_src = W.partitionBy(group_col).orderBy(id_col)
    keyed = (
        df.select(
            F.col(group_col).alias("source"),
            F.col(id_col).alias("doc_id"),
            weight_col.cast("double").alias("w"),
        )
        .withColumn("src_rank", F.row_number().over(w_src).cast("long"))
        .withColumn(
            "mix_key", (F.col("src_rank") - F.lit(0.5)) / F.col("w")
        )
    )
    tot = (
        keyed.groupBy("source")
        .agg(F.first("w").alias("w"))
        .agg(F.sum("w").alias("w_total"))
    )
    ranged = (
        keyed.repartitionByRange(n_parts, "mix_key", "source", "doc_id")
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
    w_pid = W.partitionBy("pid").orderBy("mix_key", "source", "doc_id")
    ranked = (
        ranged.join(F.broadcast(off), "pid")
        .withColumn(
            "global_rank",
            (F.col("offset") + F.row_number().over(w_pid)).cast("long"),
        )
    )
    if limit is not None:
        ranked = ranked.where(F.col("global_rank") <= int(limit))
    out = ranked.crossJoin(F.broadcast(tot)).select(
        "global_rank",
        "source",
        "doc_id",
        "src_rank",
        F.round("mix_key", 6).alias("mix_key"),
        F.round(F.col("src_rank") / F.col("global_rank"), 6).alias("src_share"),
        F.round(F.col("w") / F.col("w_total"), 6).alias("target_share"),
        F.round(
            F.col("src_rank") / F.col("global_rank")
            - F.col("w") / F.col("w_total"),
            6,
        ).alias("disc"),
    )
    return own_caches(out, ranged)


def waterfill_allocation(
    df: DataFrame,
    budget: int,
    key_col: str = "source",
    target_col: str = "target_w",
    cap_col: str = "cap",
) -> DataFrame:
    """Water-filling token-budget allocation (X238): given per-source
    integer target weights (the mixture you WANT — e.g. X47 temperature
    fractions scaled to parts-per-million) and integer availability caps
    (tokens that actually exist after dedup/filtering), allocate an
    integer ``budget`` as

        alloc_i = min(cap_i, floor(λ · t_i)),  λ chosen so Σ alloc ≈ budget

    — proportional-to-target everywhere the data suffices, capped where
    it doesn't, with the freed budget re-flowing to uncapped sources.
    This is the reconciliation step between "target mixture" and "what
    the corpus can supply" that a naive pro-rata allocation gets wrong
    the moment one source runs dry.

    EXACTNESS: sources sort by fill ratio cap/t; every boundary test is
    CROSS-MULTIPLIED BIGINT (cap_k·trem_k ≤ (B−capsum_k)·t_k — no float
    λ anywhere), and uncapped allocations are BIGINT floor division
    ((B−capsum)·t_i) DIV trem — bit-identical in any engine. Floors may
    leave a few tokens unallocated; ``leftover`` on every row reports
    it honestly (callers top-up the largest source or ignore).

    Scale shape: this runs on the SOURCE table — thousands of rows at
    most by construction — so the single-partition prefix-sum window is
    fine (the temperature_fractions precedent); the corpus never enters.
    Zero-target rows allocate 0; budget ≥ Σcap degenerates to cap.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(key_col).alias("k"),
        F.col(target_col).cast("long").alias("t"),
        F.col(cap_col).cast("long").alias("cap"),
    ).where(F.col("t").isNotNull() & F.col("cap").isNotNull())
    live = base.where((F.col("t") > 0) & (F.col("cap") > 0))
    dead = base.where((F.col("t") <= 0) | (F.col("cap") <= 0))

    w = Window.orderBy(
        (F.col("cap") / F.col("t")).asc(), F.col("k").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = live.select(
        "k",
        "t",
        "cap",
        F.sum("cap").over(w).alias("capsum"),
        F.sum("t").over(w).alias("tsum"),
        F.sum("t").over(wall).alias("t_all"),
        F.sum("cap").over(wall).alias("totcap"),
        F.row_number().over(
            Window.orderBy((F.col("cap") / F.col("t")).asc(), F.col("k").asc())
        ).alias("rk"),
    )
    B = F.lit(int(budget)).cast("long")
    # prefix k is saturated iff r_k <= lambda_k, cross-multiplied in BIGINT
    trem = F.col("t_all") - F.col("tsum")
    sat = (trem > 0) & (
        F.col("cap") * trem <= (B - F.col("capsum")) * F.col("t")
    )
    kstar = pre.select(
        F.max(F.when(sat, F.col("rk"))).alias("kstar"),
        F.max("totcap").alias("ktotcap"),
        F.max("t_all").alias("kT"),
    )
    boundary = (
        pre.select("rk", "capsum", "tsum")
        .join(
            F.broadcast(kstar),
            F.col("rk") == F.coalesce(F.col("kstar"), F.lit(-1)),
            "right",
        )
        .select(
            F.coalesce(F.col("kstar"), F.lit(0)).alias("kstar"),
            F.coalesce(F.col("capsum"), F.lit(0)).alias("bcapsum"),
            F.coalesce(F.col("tsum"), F.lit(0)).alias("btsum"),
            F.col("ktotcap").alias("totcap"),
            F.col("kT").alias("bT"),
        )
    )
    joined = (
        pre.select("k", "t", "cap", "rk")
        .join(F.broadcast(boundary), how="cross")
        .withColumn("_num", (B - F.col("bcapsum")) * F.col("t"))
        .withColumn("_den", F.col("bT") - F.col("btsum"))
    )
    alloc = (
        F.when(B >= F.col("totcap"), F.col("cap"))
        .when(F.col("rk") <= F.col("kstar"), F.col("cap"))
        .otherwise(
            F.least(
                F.col("cap"),
                # BIGINT `div`, not floor(double /): at 10^12-token
                # budgets the double mantissa would round the allocation
                F.expr("_num div _den"),
            )
        )
    )
    out = joined.select(
        F.col("k").alias(key_col),
        F.col("t").alias(target_col),
        F.col("cap").alias(cap_col),
        alloc.alias("alloc"),
        (alloc >= F.col("cap")).alias("capped"),
    )
    dead_out = dead.select(
        F.col("k").alias(key_col),
        F.col("t").alias(target_col),
        F.col("cap").alias(cap_col),
        F.lit(0).cast("long").alias("alloc"),
        F.lit(False).alias("capped"),
    )
    allrows = out.unionByName(dead_out)
    wsum = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # achievable = min(budget, total cap of LIVE sources); dead rows
    # (zero target or zero cap) can never absorb budget
    achievable = F.least(
        B,
        F.sum(
            F.when(F.col(target_col) > 0, F.col(cap_col)).otherwise(F.lit(0))
        ).over(wsum),
    )
    return allrows.select(
        "*",
        (achievable - F.sum("alloc").over(wsum)).alias("leftover"),
    ).orderBy(key_col)
