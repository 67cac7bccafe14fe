"""Distribution drift, divergence and uncertainty audits.

A continuously-ingesting corpus pipeline (the reference re-runs its
ReliefWeb pulls monthly; any crawl pipeline re-runs forever) needs to
answer "did the data CHANGE?" before it answers anything else — a quality
gate tuned on January's score distribution silently mis-fires on March's.
This module is the drift lane: the three standard monitoring statistics
(PSI, exact two-sample KS, Jensen-Shannon divergence between token
distributions) plus a deterministic multiplier bootstrap for putting a
confidence interval on any per-group mean without replaying the job.

Everything here is oracle-checkable: integer counts until the final
divides wherever possible, fixed split dates (never ``now()``), and
hash-derived bootstrap weights instead of an RNG — two engines, or two
runs months apart, produce identical tables.

Scale shape (10^12 rows): every statistic collapses the corpus with ONE
map-side-combinable groupBy before any window or join runs — PSI windows
over (group × bins), KS over (group × distinct values), JSD joins over
the (group × vocabulary) count table, the bootstrap aggregates
(group × B) partial sums. Nothing here re-reads the corpus twice.

Reference seam: corpusama's monthly re-pull + `_log` tables
(corpusama/database.py) record WHAT ran; this module is the missing
"is the new batch statistically the same corpus?" check on top.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "psi_report",
    "ks_statistic",
    "js_divergence",
    "bootstrap_mean_ci",
    "wasserstein_1d",
    "novelty_rate",
]

_LN2 = math.log(2.0)


def _words(text_col: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(F.coalesce(text_col, F.lit("")))), r"\s+"),
        lambda w: F.length(w) > 0,
    )


def psi_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
    split_date: str,
    bin_width: float = 50.0,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index per group between the rows BEFORE
    ``split_date`` (reference window) and the rows on/after it (current
    window): PSI = Σ_bins (p_cur − p_ref)·ln(p_cur / p_ref) over fixed
    equal-width value bins (top bin open-ended). The standard model-
    monitoring gate: PSI < 0.1 stable, 0.1–0.25 investigate, > 0.25 the
    gate needs re-tuning.

    Bins empty on EITHER side are excluded from the sum (the common
    epsilon-clamp alternative injects an arbitrary constant); the
    excluded mass is visible instead: ``ref_cover``/``cur_cover`` are
    the row fractions falling in the included bins, so a PSI of 0.02
    with cur_cover 0.6 reads as the red flag it is.

    Scale shape: one groupBy over (group, bin, side) with map-side
    combine — the corpus collapses to ≤ group×bins×2 rows before any
    join; totals broadcast back. Fixed split date, never now().
    """
    side_ref = (F.col(ts_col) < F.lit(split_date).cast("timestamp")).cast(
        "int"
    )
    bucket = F.least(
        F.greatest(
            F.floor(F.col(value_col) / F.lit(float(bin_width))), F.lit(0)
        ),
        F.lit(int(n_bins) - 1),
    ).cast("long")
    counts = (
        df.select(
            F.col(group_col).alias("g"),
            bucket.alias("bin"),
            side_ref.alias("is_ref"),
        )
        .groupBy("g", "bin")
        .agg(
            F.sum("is_ref").cast("long").alias("rn"),
            F.sum(1 - F.col("is_ref")).cast("long").alias("cn"),
        )
    )
    totals = counts.groupBy("g").agg(
        F.sum("rn").cast("long").alias("n_ref"),
        F.sum("cn").cast("long").alias("n_cur"),
    )
    joined = counts.join(F.broadcast(totals), "g")
    pr = F.col("rn") / F.col("n_ref")
    pc = F.col("cn") / F.col("n_cur")
    used = (F.col("rn") > 0) & (F.col("cn") > 0)
    term = F.when(used, (pc - pr) * F.log(pc / pr)).otherwise(F.lit(0.0))
    return (
        joined.groupBy("g", "n_ref", "n_cur")
        .agg(
            F.sum(used.cast("long")).cast("long").alias("n_bins_used"),
            F.round(F.sum(term), 6).alias("psi"),
            F.round(
                F.sum(F.when(used, F.col("rn")).otherwise(0))
                / F.max("n_ref"),
                6,
            ).alias("ref_cover"),
            F.round(
                F.sum(F.when(used, F.col("cn")).otherwise(0))
                / F.max("n_cur"),
                6,
            ).alias("cur_cover"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_ref",
            "n_cur",
            "n_bins_used",
            "psi",
            "ref_cover",
            "cur_cover",
        )
    )


def ks_statistic(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
    split_date: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per group between
    the pre-``split_date`` and post-``split_date`` value distributions:
    D = max over the pooled support of |ECDF_ref − ECDF_cur|, computed
    on the FULL data (no sketch, no sampling — the sort-based exact
    statistic scipy.stats.ks_2samp computes, distributed). ``ks_at`` is
    the smallest value achieving the maximum, which is where the two
    CDFs diverge most — the natural place to look when D is large.

    Scale shape: the corpus collapses to one row per (group, DISTINCT
    value) with per-side counts first (map-side combine), so the
    cumulative window runs over the value-domain size, not row count —
    for continuous measurements pre-quantize (round) the value column
    to bound the domain, which only coarsens D by the quantization
    step. Double-precision ECDF differences are deterministic (exact
    integer counts, one IEEE divide per side), so engines agree.
    """
    side_ref = (F.col(ts_col) < F.lit(split_date).cast("timestamp")).cast(
        "int"
    )
    counts = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).alias("v"),
            side_ref.alias("is_ref"),
        )
        .groupBy("g", "v")
        .agg(
            F.sum("is_ref").cast("long").alias("rn"),
            F.sum(1 - F.col("is_ref")).cast("long").alias("cn"),
        )
    )
    totals = counts.groupBy("g").agg(
        F.sum("rn").cast("long").alias("n_ref"),
        F.sum("cn").cast("long").alias("n_cur"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdfs = counts.join(F.broadcast(totals), "g").select(
        "g",
        "v",
        "n_ref",
        "n_cur",
        F.abs(
            F.sum("rn").over(w) / F.col("n_ref")
            - F.sum("cn").over(w) / F.col("n_cur")
        ).alias("d"),
    )
    pick = Window.partitionBy("g").orderBy(F.desc("d"), F.asc("v"))
    return (
        ecdfs.withColumn("rnk", F.row_number().over(pick))
        .where(F.col("rnk") == 1)
        .select(
            F.col("g").alias(group_col),
            "n_ref",
            "n_cur",
            F.round(F.col("d"), 6).alias("ks_d"),
            F.col("v").alias("ks_at"),
        )
    )


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
    split_date: str,
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance per group between
    the pre-``split_date`` and post-``split_date`` value distributions:
    W1 = ∫ |ECDF_ref(v) − ECDF_cur(v)| dv, evaluated exactly as the sum
    of |ΔECDF| × gap over consecutive distinct values of the pooled
    support (scipy.stats.wasserstein_distance's closed form,
    distributed). Complements :func:`ks_statistic`: KS is the WORST
    vertical gap (insensitive to how far mass moved), W1 is the total
    transport COST in value units — a gate threshold shifted by 2×
    doubles W1 but may barely move D.

    Scale shape: identical to KS — the corpus collapses to one row per
    (group, distinct value) with per-side counts (map-side combine);
    the cumulative + lead windows then run over the value-domain size,
    not row count. Pre-quantize continuous values to bound the domain.
    Groups empty on either side get NULL w1 rather than a misleading 0.
    """
    side_ref = (F.col(ts_col) < F.lit(split_date).cast("timestamp")).cast(
        "int"
    )
    counts = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).alias("v"),
            side_ref.alias("is_ref"),
        )
        .groupBy("g", "v")
        .agg(
            F.sum("is_ref").cast("long").alias("rn"),
            F.sum(1 - F.col("is_ref")).cast("long").alias("cn"),
        )
    )
    totals = counts.groupBy("g").agg(
        F.sum("rn").cast("long").alias("n_ref"),
        F.sum("cn").cast("long").alias("n_cur"),
    )
    cum = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = Window.partitionBy("g").orderBy("v")
    steps = counts.join(F.broadcast(totals), "g").select(
        "g",
        "n_ref",
        "n_cur",
        (
            F.abs(
                F.try_divide(F.sum("rn").over(cum), F.col("n_ref"))
                - F.try_divide(F.sum("cn").over(cum), F.col("n_cur"))
            )
            * (F.lead("v").over(nxt) - F.col("v"))
        ).alias("area"),
    )
    return (
        steps.groupBy("g", "n_ref", "n_cur")
        .agg(
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.round(F.coalesce(F.sum("area"), F.lit(0.0)), 6),
            ).alias("w1")
        )
        .select(
            F.col("g").alias(group_col),
            "n_ref",
            "n_cur",
            "w1",
        )
    )


def js_divergence(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence (natural log) between each group's
    unigram distribution and the REST of the corpus — the per-domain
    "how different does this source talk" table that drives mixing
    decisions (a source with jsd_norm ≈ 1 shares no vocabulary with the
    rest; ≈ 0 is interchangeable). ``jsd_norm`` = jsd / ln 2 ∈ [0, 1].

    Algebraic trick that keeps the join group-local: words the group
    NEVER uses contribute exactly 0.5·ln2·q_w each (p=0 ⇒ m=q/2), so
    their total is 0.5·ln2·(1 − Σ_{w∈group} q_w) — computable from the
    group's OWN vocabulary rows. The per-(group, word) count table
    therefore joins only the global word counts; the group×vocabulary
    cross product is never materialized.

    Scale shape: one token explode feeds one (group, word) groupBy; the
    global word table derives from THAT table (second small groupBy,
    never a corpus re-read); the join is per-(group,word) rows against
    a vocabulary-sized side. Windows: none.
    """
    tok = docs.select(
        F.col(group_col).alias("g"),
        F.explode(_words(F.col(text_col))).alias("w"),
    )
    gw = tok.groupBy("g", "w").agg(F.count("*").cast("long").alias("c"))
    wc = gw.groupBy("w").agg(F.sum("c").cast("long").alias("cw"))
    gt = gw.groupBy("g").agg(F.sum("c").cast("long").alias("tg"))
    grand = gt.agg(F.sum("tg").cast("long").alias("tt"))
    j = (
        gw.join(wc, "w")
        .join(F.broadcast(gt), "g")
        .crossJoin(F.broadcast(grand))
    )
    p = F.col("c") / F.col("tg")
    qn = (F.col("cw") - F.col("c")).cast("double")
    qd = (F.col("tt") - F.col("tg")).cast("double")
    q = qn / qd
    m = (p + q) / 2
    term = 0.5 * p * F.log(p / m) + F.when(
        qn > 0, 0.5 * q * F.log(q / m)
    ).otherwise(F.lit(0.0))
    return (
        j.groupBy("g", "tg", "tt")
        .agg(
            F.count("*").cast("long").alias("vocab"),
            F.sum(term).alias("_in"),
            F.sum(q).alias("_qmass"),
        )
        .select(
            F.col("g").alias(group_col),
            F.col("tg").alias("n_tokens"),
            "vocab",
            F.round(
                F.col("_in") + 0.5 * _LN2 * (1.0 - F.col("_qmass")), 6
            ).alias("jsd"),
            F.round(
                (F.col("_in") + 0.5 * _LN2 * (1.0 - F.col("_qmass")))
                / _LN2,
                6,
            ).alias("jsd_norm"),
        )
    )


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    b: int = 64,
) -> DataFrame:
    """Per-group mean with a bootstrap confidence interval, fully
    deterministic: replicate r reweights every row by
    w = 2·bit(md5(id‖':'‖r)) — the double-or-nothing multiplier
    bootstrap (weights are i.i.d. mean 1, variance 1, so replicate
    means have the same asymptotic spread as classical resampling) —
    and the CI is the [1/32, 31/32] type-1 quantile band of the B
    replicate means (dyadic q keeps rank selection float-exact). Same
    table on any engine, any day: no RNG state anywhere.

    The value column should be integer-valued (counts, bytes, chars):
    then every replicate sum is exact integer arithmetic and the only
    floats are B final divides per group, so engines agree bit-for-bit.

    Scale shape: the per-row weight array is scan-stage (B md5 calls
    fused into one projection); posexplode feeds a (group, r) groupBy
    whose partial aggregation collapses each partition to group×B rows
    before the shuffle — the exchanged volume is B× the GROUP count,
    not B× the corpus. Replicates where every sampled weight is 0
    (possible only for tiny groups) are dropped and visible via
    ``n_boot``.
    """
    b = int(b)
    reps = F.sequence(F.lit(0), F.lit(b - 1))
    wcol = F.transform(
        reps,
        lambda r: (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(id_col).cast("string"),
                            F.lit(":"),
                            r.cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 2
        )
        * 2,
    )
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
        F.posexplode(wcol).alias("r", "w"),
    )
    rep_means = (
        base.groupBy("g", "r")
        .agg(
            F.sum(F.col("w") * F.col("v")).cast("long").alias("sv"),
            F.sum("w").cast("long").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select("g", "r", (F.col("sv") / F.col("sw")).alias("mb"))
    )
    rw = Window.partitionBy("g").orderBy(F.asc("mb"), F.asc("r"))
    ranked = rep_means.select(
        "g",
        "mb",
        F.row_number().over(rw).alias("rnk"),
        F.count("*").over(Window.partitionBy("g")).alias("n_boot"),
    )
    lo_rank = F.greatest(F.ceil(F.col("n_boot") / 32), F.lit(1))
    hi_rank = F.ceil(F.col("n_boot") * 31 / 32)
    bands = ranked.groupBy("g", "n_boot").agg(
        F.round(F.min(F.when(F.col("rnk") == lo_rank, F.col("mb"))), 6)
        .alias("ci_lo"),
        F.round(F.min(F.when(F.col("rnk") == hi_rank, F.col("mb"))), 6)
        .alias("ci_hi"),
    )
    point = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.sum(F.col(value_col).cast("long"))
            / F.count("*").cast("double"),
            6,
        ).alias("mean"),
    )
    return point.join(bands, "g").select(
        F.col("g").alias(group_col),
        "n",
        "mean",
        F.col("n_boot").cast("long").alias("n_boot"),
        "ci_lo",
        "ci_hi",
    )


def novelty_rate(
    df: DataFrame,
    key_col: Column | str,
    batch_col: Column | str,
    id_col: str,
) -> DataFrame:
    """Per-batch content novelty: what share of each ingest batch is
    NEW vs a re-post of content first seen in an EARLIER batch — the
    "is this crawl still finding anything?" curve. A key (content hash,
    phash, url) is novel in the batch where its FIRST row (min id)
    lives; later batches carrying the same key count as re-posts.
    Within-batch duplicates beyond the first row count as re-posts too
    (they bring no new content). NULL keys are excluded and counted.

    Output per batch: n_rows, n_null, n_novel, n_repost, novelty (6 dp)
    and the cumulative distinct-content count through that batch.

    Scale shape: ONE groupBy(key) carries (first-batch = min over the
    orderable (batch, id) pair) — key-sized shuffle, the pass exact
    dedup already pays; per-batch rollups and the running total window
    operate on batch-sized tables.
    """
    keyed = df.select(
        F.col(id_col).cast("long").alias("id"),
        (F.col(batch_col) if isinstance(batch_col, str) else batch_col)
        .alias("b"),
        (F.col(key_col) if isinstance(key_col, str) else key_col)
        .alias("k"),
    )
    per_batch = keyed.groupBy("b").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(F.when(F.col("k").isNull(), 1)).cast("long").alias("n_null"),
    )
    first = (
        keyed.where(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.min(F.struct("b", "id")).alias("f"))
        .select(F.col("f.b").alias("b"))
        .groupBy("b")
        .agg(F.count("*").cast("long").alias("n_novel"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_batch.join(first, "b", "left")
        .select(
            F.col("b").alias("batch"),
            "n_rows",
            "n_null",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            (
                F.col("n_rows")
                - F.col("n_null")
                - F.coalesce("n_novel", F.lit(0))
            ).alias("n_repost"),
            F.round(
                F.when(
                    F.col("n_rows") - F.col("n_null") > 0,
                    F.coalesce("n_novel", F.lit(0))
                    / (F.col("n_rows") - F.col("n_null")),
                ),
                6,
            ).alias("novelty"),
            F.sum(F.coalesce("n_novel", F.lit(0)))
            .over(w)
            .cast("long")
            .alias("distinct_cum"),
        )
        .orderBy("batch")
    )


def sinkhorn_hist_distance(
    df: DataFrame,
    group_col: str,
    val_col: str,
    nbins: int = 16,
    bin_width: float = 50.0,
    eps: float = 0.1,
    iters: int = 6,
) -> DataFrame:
    """Entropic-regularized optimal transport (Sinkhorn 1967 matrix
    scaling; Cuturi 2013 for the OT use) between every source pair's
    ``val_col`` histograms: values clip into ``nbins`` equal bins, the
    cost is the normalized bin distance |i−j|/(nbins−1), and ``iters``
    Sinkhorn iterations u ← a/(Kv), v ← b/(Kᵀu) on K = e^(−C/ε) yield
    the transport cost Σᵢⱼ uᵢKᵢⱼvⱼ·Cᵢⱼ. Where exact W1 (wasserstein_1d)
    gives the unregularized cost on one dimension, the Sinkhorn tier is
    the form that scales to multi-dimensional supports and is what
    embedding-distribution comparisons actually run — landing it on the
    shared histogram support keeps it oracle-checkable. Scalings are
    pinned to 9 dp per iteration (the kmeans determinism contract);
    zero-mass bins keep u = v = 0 via ANSI-guarded divides.

    Output per ordered pair (src_a < src_b): sinkhorn_cost (6 dp) and
    mass_a/mass_b row counts. Scale shape: the corpus collapses ONCE to
    (group × nbins) masses; everything after runs on |groups|²·nbins²
    rows of pure relational math — tiny for hundreds of sources, and
    the K/C tables are literal nbins² constants broadcast everywhere.
    """
    nb = int(nbins)
    spark = df.sparkSession
    binc = F.least(
        F.floor(F.col(val_col) / F.lit(float(bin_width))).cast("int"),
        F.lit(nb - 1),
    )
    masses = (
        df.where(F.col(val_col).isNotNull())
        .select(F.col(group_col).alias("g"), binc.alias("b"))
        .where(F.col("b") >= 0)
        .groupBy("g", "b")
        .agg(F.count("*").alias("n"))
    )
    totals = masses.groupBy("g").agg(F.sum("n").alias("tot"))
    # dense (g, bin) grid with normalized mass
    grid = (
        totals.select("g", "tot")
        .select(
            "g", "tot",
            F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("b"),
        )
        .join(masses, ["g", "b"], "left")
        .select(
            "g",
            "b",
            (F.coalesce(F.col("n"), F.lit(0)) / F.col("tot")).alias("m"),
        )
    )
    k_rows = [
        (i, j, abs(i - j) / (nb - 1), float(__import__("math").exp(-(abs(i - j) / (nb - 1)) / eps)))
        for i in range(nb)
        for j in range(nb)
    ]
    K = F.broadcast(
        spark.createDataFrame(k_rows, "i int, j int, c double, k double")
    )
    pairs = (
        totals.select(F.col("g").alias("src_a"))
        .join(totals.select(F.col("g").alias("src_b")))
        .where(F.col("src_a") < F.col("src_b"))
    )
    a = pairs.join(
        grid.withColumnsRenamed({"g": "src_a", "b": "i", "m": "a"}),
        "src_a",
    )
    bm = pairs.join(
        grid.withColumnsRenamed({"g": "src_b", "b": "j", "m": "bm"}),
        "src_b",
    )
    # state tables: (pair, i, u) and (pair, j, v); v starts at 1
    u = a.select("src_a", "src_b", "i", F.lit(0.0).alias("u"))
    v = bm.select("src_a", "src_b", "j", F.lit(1.0).alias("v"))
    for _ in range(int(iters)):
        kv = (
            v.join(K, "j")
            .groupBy("src_a", "src_b", "i")
            .agg(F.sum(F.col("k") * F.col("v")).alias("kv"))
        )
        u = (
            a.join(kv, ["src_a", "src_b", "i"])
            .select(
                "src_a",
                "src_b",
                "i",
                F.round(
                    F.when(
                        (F.col("a") > 0) & (F.col("kv") > 0),
                        F.col("a") / F.col("kv"),
                    ).otherwise(F.lit(0.0)),
                    9,
                ).alias("u"),
            )
            .localCheckpoint()
        )
        ku = (
            u.join(K, "i")
            .groupBy("src_a", "src_b", "j")
            .agg(F.sum(F.col("k") * F.col("u")).alias("ku"))
        )
        v = (
            bm.join(ku, ["src_a", "src_b", "j"])
            .select(
                "src_a",
                "src_b",
                "j",
                F.round(
                    F.when(
                        (F.col("bm") > 0) & (F.col("ku") > 0),
                        F.col("bm") / F.col("ku"),
                    ).otherwise(F.lit(0.0)),
                    9,
                ).alias("v"),
            )
            .localCheckpoint()
        )
    cost = (
        u.join(K, "i")
        .join(v, ["src_a", "src_b", "j"])
        .groupBy("src_a", "src_b")
        .agg(
            F.round(
                F.sum(F.col("u") * F.col("k") * F.col("v") * F.col("c")), 6
            ).alias("sinkhorn_cost")
        )
    )
    return cost.orderBy("src_a", "src_b")


def ks_asymptotic_p(
    d_col: Column, n_ref: Column, n_cur: Column, terms: int = 10
) -> Column:
    """Asymptotic two-sample KS p-value (Kolmogorov limit law,
    Smirnov 1948): λ = D·√(n·m/(n+m)), p ≈ 2Σⱼ(−1)^{j−1}e^{−2j²λ²}
    truncated at ``terms`` and clipped into [0, 1] — the standard
    scipy.stats.distributions.kstwobign tail form, good for the
    moderate-to-large samples a drift monitor sees. Rounded to 9 dp so
    downstream threshold comparisons (BH) are engine-stable. Pure JVM
    expression; pair with ks_statistic's (ks_d, n_ref, n_cur)."""
    lam = d_col * F.sqrt(
        n_ref.cast("double")
        * n_cur.cast("double")
        / (n_ref + n_cur).cast("double")
    )
    s = F.lit(0.0)
    for j in range(1, int(terms) + 1):
        term = F.exp(F.lit(-2.0 * j * j) * lam * lam)
        s = s + (term if j % 2 == 1 else -term)
    return F.round(
        F.least(F.greatest(2.0 * s, F.lit(0.0)), F.lit(1.0)), 9
    )
