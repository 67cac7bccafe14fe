"""Distributed linear quality classifier (naive-Bayes log-odds).

The learned tier of the quality_filter stack: GPT-3 trained a logistic
classifier on WebText-vs-CommonCrawl and kept documents scoring high
(Brown et al. 2020, Appendix A — public); CCNet and fastText's supervised
mode are the same shape — a LINEAR score over token features. This module
re-expresses that tier as pure relational algebra so the whole
train-then-score round trip is DuckDB-oracle-checkable:

    train: per-token occurrence counts in a "good" seed corpus and a "bad"
           seed corpus (two groupBys — map-side partial aggregation makes
           the shuffle carry one row per distinct token per partition);
    model: per-token add-k-smoothed log-odds
           w(t) = ln((cg+k)/(Ng+kV)) - ln((cb+k)/(Nb+kV))
           (multinomial naive Bayes; Chen & Goodman smoothing, public);
    score: each document's token multiset joins the model and sums w —
           exactly the linear layer a fastText supervised classifier
           applies; a learned embedding table slots in by swapping the
           model DataFrame, the join/sum plumbing is identical.

Scale shape (10^12 rows):

- the model is Zipf-headed: ``prune_model`` drops rare tokens so the
  broadcast stays small; pruned tokens fall back to the SAME unseen-token
  floor the scorer applies to genuinely novel tokens (coalesce to c=0),
  so pruning degrades smoothly instead of changing semantics;
- scoring is one explode (scan stage) + one broadcast hash join + one
  doc_id groupBy — the same exchange the downstream keep/drop filter
  consumes, so the classifier adds zero extra shuffles to the pipeline;
- totals (Ng, Nb, V) stay a 1-row DataFrame cross-joined lazily — no
  driver collect anywhere.

Reference seam: corpusama attaches model verdicts as columns the same way
(make_langid -> lid, corpusama/corpus/langid.py); this is that pattern
with a two-class linear scorer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) — one row per token OCCURRENCE (multinomial NB counts
    occurrences, not presence), exploded in the scan stage."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    return docs.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))


def train_token_logodds(
    good: DataFrame,
    bad: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """(model, totals) from two seed corpora.

    model: (tok, cg, cb) — occurrence counts of each token in the good
    and bad seeds, full-outer merged so one-sided tokens keep a 0 on the
    other side; totals: ONE row (ng, nb, v) = total good occurrences,
    total bad occurrences, distinct-token vocabulary of the union — kept
    as a DataFrame so scoring composes lazily (no driver collect).
    """
    cg = _doc_tokens(good, id_col, text_col).groupBy("tok").agg(
        F.count("*").alias("cg")
    )
    cb = _doc_tokens(bad, id_col, text_col).groupBy("tok").agg(
        F.count("*").alias("cb")
    )
    model = cg.join(cb, "tok", "full").select(
        "tok",
        F.coalesce("cg", F.lit(0)).cast("long").alias("cg"),
        F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
    )
    totals = model.agg(
        F.sum("cg").cast("long").alias("ng"),
        F.sum("cb").cast("long").alias("nb"),
        F.count("*").cast("long").alias("v"),
    )
    return model, totals


def prune_model(model: DataFrame, min_count: int = 2) -> DataFrame:
    """Drop tokens with fewer than ``min_count`` total occurrences so the
    broadcast model stays head-sized at web vocabulary. IMPORTANT: prune
    AFTER computing ``totals`` from the full model — pruned tokens must
    still contribute to Ng/Nb/V so the floor probability they fall back
    to is the one they were trained under."""
    return model.where((F.col("cg") + F.col("cb")) >= min_count)


def _logodds(k: float) -> Column:
    num_g = F.coalesce(F.col("cg"), F.lit(0)).cast("double") + F.lit(k)
    num_b = F.coalesce(F.col("cb"), F.lit(0)).cast("double") + F.lit(k)
    den_g = F.col("ng").cast("double") + F.lit(k) * F.col("v").cast("double")
    den_b = F.col("nb").cast("double") + F.lit(k) * F.col("v").cast("double")
    return F.log(num_g / den_g) - F.log(num_b / den_b)


def score_naive_bayes(
    docs: DataFrame,
    model: DataFrame,
    totals: DataFrame,
    k: float = 0.5,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, n_tokens, nb_score, keep): summed per-token log-odds per doc,
    kept when the score clears ``threshold`` (GPT-3 kept score>0 plus a
    Pareto re-admission lottery; the lottery is a sampling policy, not an
    operator, so the deterministic gate is what lives here). Documents
    with no tokens produce no row (nothing to score — same convention as
    operators/lm.py). Unseen tokens hit the add-k floor via the left
    join's coalesce."""
    hint = F.broadcast if broadcast_model else (lambda d: d)
    j = (
        _doc_tokens(docs, id_col, text_col)
        .join(hint(model), ["tok"], "left")
        .crossJoin(hint(totals))
    )
    score = F.round(F.sum(_logodds(k)), 6)
    return (
        j.groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            score.alias("nb_score"),
            (score >= threshold).alias("keep"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "nb_score", "keep")
    )


def quality_classifier(
    docs: DataFrame,
    good_pred: Column,
    bad_pred: Column,
    k: float = 0.5,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Train on two predicate-selected seed slices of ``docs`` and score
    every document — ONE lazy plan end to end (the CCNet composition:
    seed = in-domain reference, candidates = everything)."""
    model, totals = train_token_logodds(
        docs.where(good_pred), docs.where(bad_pred), id_col, text_col
    )
    return score_naive_bayes(
        docs,
        model,
        totals,
        k=k,
        threshold=threshold,
        id_col=id_col,
        text_col=text_col,
        broadcast_model=broadcast_model,
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability-diagram table for a [0,1] quality score against a
    boolean outcome: fixed-width score bins -> (bin, n, mean_score,
    n_pos, pos_rate). A quality filter is only trustworthy at 100 TB if
    its score is CALIBRATED — "0.9 means ~90% keep-worthy" — and this
    is the audit that says so before a threshold deletes a petabyte.
    Fixed-width binning (never ntile) keeps it scan-stage: no global
    sort, one groupBy over at most `bins` keys.

    pos_rate is an int/int divide (exact); mean_score is a float avg
    whose accumulated ulp error (~1e-16 per row) sits nine orders below
    the 6 dp rounding — portable in practice.
    """
    b = int(bins)
    binned = scored.select(
        F.least(
            F.lit(b - 1),
            F.floor(F.col(score_col) * b).cast("int"),
        )
        .cast("long")
        .alias("bin"),
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("_s"), 6).alias("mean_score"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.round(F.sum("_y") / F.count("*"), 6).alias("pos_rate"),
        )
        .orderBy("bin")
    )


def auc_score(
    scored: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC of a score against a boolean outcome via the
    Mann-Whitney rank-sum with PROPER midrank tie handling — the one
    threshold-free number that says whether a quality model ranks
    keep-worthy docs above junk. Kept fully integer until the final
    divide: with S2 = Σ_pos (2·cum_n − n_s + 1) (twice the midrank
    sum), AUC = (S2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg) — every term
    is an exact integer, so engines agree to the last bit before the
    one rounded division.

    Scale shape: one map-side-combinable groupBy collapses the corpus
    to per-DISTINCT-SCORE counts; the cumulative count then runs over
    that table via prefixsum.ranged_cumsum (range exchange + parallel
    per-partition running sums + broadcast offsets) — for CONTINUOUS
    scores distinct ≈ n, so the round-4 single-partition window here
    was the same scale bug as mwu_test's and got the same round-5 fix.
    Counts stay exact integers in doubles below 2^53.
    Returns one row: (n_pos, n_neg, auc).
    """
    per = (
        scored.select(
            F.col(score_col).alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.count("*").cast("long").alias("n_s"),
            F.sum("y").cast("long").alias("pos_s"),
        )
    )
    from corpusama_spark.operators.prefixsum import ranged_cumsum

    ranked = ranged_cumsum(per, ["s"], ["n_s"]).withColumnRenamed(
        "cum_n_s", "cum_n"
    )
    return ranked.agg(
        F.sum("pos_s").cast("long").alias("n_pos"),
        (F.sum("n_s") - F.sum("pos_s")).cast("long").alias("n_neg"),
        F.round(
            (
                F.sum(
                    F.col("pos_s")
                    * (2 * F.col("cum_n") - F.col("n_s") + 1)
                )
                - F.sum("pos_s") * (F.sum("pos_s") + 1)
            )
            / (2.0 * F.sum("pos_s") * (F.sum("n_s") - F.sum("pos_s"))),
            6,
        ).alias("auc"),
    )


def pr_curve(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    n_thresholds: int = 9,
) -> DataFrame:
    """Precision/recall/F1 at evenly spaced thresholds t = i/(n+1) —
    the operating-point table a deployment picks its keep threshold
    from (AUC says the score ranks well; this says what a concrete
    cutoff costs). Conditional integer sums per threshold; vacuous
    points (no predicted positives) report 0.0 with n_pred exposing
    the vacuity — no NULL floats ever leave the operator.

    Scale shape: the threshold table (n rows) broadcasts into one
    crossJoin, so the corpus is read ONCE and every threshold's
    confusion entries accumulate in the same map-side combine.
    """
    n = int(n_thresholds)
    spark = scored.sparkSession
    th = spark.range(1, n + 1).select(
        (F.col("id") / float(n + 1)).alias("t")
    )
    base = scored.select(
        F.col(score_col).alias("s"), F.col(label_col).cast("long").alias("y")
    )
    agg = (
        base.crossJoin(F.broadcast(th))
        .groupBy("t")
        .agg(
            F.sum(F.when((F.col("s") >= F.col("t")) & (F.col("y") == 1), 1).otherwise(0)).cast("long").alias("tp"),
            F.sum(F.when((F.col("s") >= F.col("t")) & (F.col("y") == 0), 1).otherwise(0)).cast("long").alias("fp"),
            F.sum(F.when((F.col("s") < F.col("t")) & (F.col("y") == 1), 1).otherwise(0)).cast("long").alias("fn"),
        )
    )
    prec = F.col("tp") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp") / (F.col("tp") + F.col("fn"))
    return agg.select(
        F.round("t", 6).alias("t"),
        "tp",
        "fp",
        "fn",
        (F.col("tp") + F.col("fp")).cast("long").alias("n_pred"),
        F.coalesce(
            F.when(F.col("tp") + F.col("fp") > 0, F.round(prec, 6)),
            F.lit(0.0),
        ).alias("precision"),
        F.coalesce(
            F.when(F.col("tp") + F.col("fn") > 0, F.round(rec, 6)),
            F.lit(0.0),
        ).alias("recall"),
        F.coalesce(
            F.when(
                (F.col("tp") + F.col("fp") > 0)
                & (F.col("tp") + F.col("fn") > 0)
                & (F.col("tp") > 0),
                F.round(2 * prec * rec / (prec + rec), 6),
            ),
            F.lit(0.0),
        ).alias("f1"),
    ).orderBy("t")


def cohen_kappa(
    df: DataFrame,
    gate_a: Column,
    gate_b: Column,
    group_col: str | None = None,
) -> DataFrame:
    """Cohen's kappa between two boolean keep/drop gates — the
    inter-rater agreement audit every multi-gate quality stack needs:
    raw agreement (po) is inflated whenever both gates keep almost
    everything, kappa subtracts the agreement expected by chance (pe)
    so "my cheap rule agrees with the expensive classifier" is a real
    claim. kappa = (po − pe) / (1 − pe) with
    pe = (a1·b1 + a0·b0) / n²; the full confusion matrix ships
    alongside so the number is auditable.

    All arithmetic is INTEGER until the final divides (counts via
    sum(cast(bool as long))), so both engines agree bit-for-bit; the
    degenerate pe=1 case (both gates constant) is 0.0-coalesced with
    the confusion counts exposing the degeneracy. One map-side
    combinable groupBy — the corpus collapses to one row per group
    before any float exists.
    """
    a = gate_a.cast("boolean")
    b = gate_b.cast("boolean")
    keys = [group_col] if group_col else []
    cnt = df.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.sum((a & b).cast("long")).cast("long").alias("n11"),
        F.sum((a & ~b).cast("long")).cast("long").alias("n10"),
        F.sum((~a & b).cast("long")).cast("long").alias("n01"),
        F.sum((~a & ~b).cast("long")).cast("long").alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / n
    a1 = F.col("n11") + F.col("n10")
    b1 = F.col("n11") + F.col("n01")
    a0 = F.col("n01") + F.col("n00")
    b0 = F.col("n10") + F.col("n00")
    pe = (a1 * b1 + a0 * b0) / (n * n)
    return cnt.select(
        *keys,
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.coalesce(
            F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), 6)),
            F.lit(0.0),
        ).alias("kappa"),
    )


def train_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    ridge: float = 1e-6,
) -> list[float]:
    """Newton-IRLS logistic regression over numeric quality features:
    returns [intercept, coef_0, ..., coef_{d−1}] after ``iters`` exact
    Newton steps from β = 0 (Brown et al. 2020 Appendix A trains this
    exact shape — a logistic quality classifier — over curated-vs-crawl
    labels; McCullagh & Nelder 1989 for IRLS itself).

    Distribution contract: each Newton step needs only XᵀWX (a (d+1)²
    matrix) and Xᵀ(y − p) (a (d+1) vector), both SUMS over rows — so
    the corpus-side work per step is one scan computing (d+1)(d+2)/2 +
    (d+1) scan-stage JVM products (sigmoid included) and ONE
    constant-width agg; the driver solves the (d+1)×(d+1) system
    (numpy) and broadcasts β back as plain literals. No gradient
    descent hyperparameters, no Python on the row path, deterministic
    given fixed ``iters`` (float-sum ordering wiggles ~1e-12 — round
    before pinning). ``ridge`` keeps the Hessian invertible on
    separable data.

    10^12-row shape: ``iters`` scans of the feature columns (column-
    pruned parquet reads), each reducing to ONE row of doubles. The
    d×d solve is nanoseconds. This is the honest big-data logistic
    trainer — no per-executor model state, no parameter server.
    """
    import numpy as np

    d = len(feature_cols) + 1
    xs = [F.lit(1.0)] + [
        F.col(c).cast("double") for c in feature_cols
    ]
    y = F.col(label_col).cast("double")
    beta = np.zeros(d)
    base = df.where(
        F.col(label_col).isNotNull()
        & ~sum(
            (F.col(c).isNull().cast("int") for c in feature_cols), F.lit(0)
        ).cast("boolean")
    )
    for _ in range(int(iters)):
        eta = sum(
            (float(beta[i]) * xs[i] for i in range(1, d)),
            F.lit(float(beta[0])),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = p * (1.0 - p)
        aggs = []
        for i in range(d):
            for j in range(i, d):
                aggs.append(
                    F.sum(w * xs[i] * xs[j]).alias(f"h_{i}_{j}")
                )
            aggs.append(F.sum((y - p) * xs[i]).alias(f"g_{i}"))
        row = base.agg(*aggs).collect()[0].asDict()
        H = np.zeros((d, d))
        g = np.zeros(d)
        for i in range(d):
            g[i] = row[f"g_{i}"]
            for j in range(i, d):
                H[i, j] = H[j, i] = row[f"h_{i}_{j}"]
        H += float(ridge) * np.eye(d)
        beta = beta + np.linalg.solve(H, g)
    return [float(b) for b in beta]


def score_logistic(
    df: DataFrame,
    feature_cols: list[str],
    beta: list[float],
    out_col: str = "p_keep",
) -> DataFrame:
    """``df`` plus σ(β·x) from ``train_logistic``'s coefficients —
    a pure scan-stage JVM expression (the broadcast is d+1 literals);
    rows with any NULL feature get NULL."""
    eta = sum(
        (
            float(beta[i + 1]) * F.col(c).cast("double")
            for i, c in enumerate(feature_cols)
        ),
        F.lit(float(beta[0])),
    )
    return df.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    )


def brier_decomposition(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Brier-score decomposition (X216; Murphy 1973) + expected/maximum
    calibration error over fixed-width score bins — the one-row summary
    behind the reliability diagram (calibration_bins): for a [0,1]
    quality score s and boolean outcome y,

        brier       = mean (s − y)²            (raw accuracy of s)
        reliability = Σ_b (n_b/N)(p̄_b − ō_b)²  (calibration gap; 0 = calibrated)
        resolution  = Σ_b (n_b/N)(ō_b − ō)²    (how much bins separate outcomes)
        uncertainty = ō(1 − ō)                 (outcome entropy floor)
        ece / mce   = Σ_b (n_b/N)|p̄_b − ō_b| / max_b |p̄_b − ō_b|

    with p̄_b the mean score and ō_b the outcome rate in bin b. Murphy's
    identity BS = REL − RES + UNC holds exactly for the BINNED forecast
    (score replaced by its bin mean) — pinned by pytest; the raw brier
    additionally carries the within-bin score variance. A threshold that
    deletes a petabyte wants reliability ≈ 0 AND resolution >> 0:
    calibrated but useless scores exist (resolution 0), as do sharp but
    miscalibrated ones — this row says which failure you have.

    Scale shape (10^12 rows): one scan computes (bin, (s−y)²), one
    map-side-combinable groupBy over ≤bins keys, one ≤bins-row rollup —
    the same shape as calibration_bins; never a sort or window.
    Resolution uses Σ n_b·ō_b² − N·ō² so the rollup needs no second pass
    once totals exist. All outputs round to 6 dp.
    """
    b = int(bins)
    base = scored.select(
        F.least(
            F.lit(b - 1), F.floor(F.col(score_col) * b).cast("int")
        ).alias("bin"),
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
    )
    per = base.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("_s").alias("sum_s"),
        F.sum("_y").cast("long").alias("pos_b"),
        F.sum((F.col("_s") - F.col("_y")) * (F.col("_s") - F.col("_y"))).alias(
            "sum_sq"
        ),
    )
    terms = per.select(
        "n_b",
        "pos_b",
        "sum_sq",
        (F.col("sum_s") / F.col("n_b")).alias("pbar"),
        (F.col("pos_b").cast("double") / F.col("n_b")).alias("obar_b"),
    )
    roll = terms.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.sum("pos_b").cast("long").alias("pos"),
        F.sum(
            F.col("n_b") * (F.col("pbar") - F.col("obar_b"))
            * (F.col("pbar") - F.col("obar_b"))
        ).alias("s_rel"),
        F.sum(F.col("n_b") * F.col("obar_b") * F.col("obar_b")).alias(
            "s_ob2"
        ),
        F.sum(F.col("n_b") * F.abs(F.col("pbar") - F.col("obar_b"))).alias(
            "s_ece"
        ),
        F.max(F.abs(F.col("pbar") - F.col("obar_b"))).alias("m_ce"),
        F.sum("sum_sq").alias("s_sq"),
    )
    obar = F.col("pos").cast("double") / F.col("n")
    return roll.select(
        "n",
        F.round(obar, 6).alias("base_rate"),
        F.round(F.col("s_sq") / F.col("n"), 6).alias("brier"),
        F.round(F.col("s_rel") / F.col("n"), 6).alias("reliability"),
        F.round(F.col("s_ob2") / F.col("n") - obar * obar, 6).alias(
            "resolution"
        ),
        F.round(obar * (F.lit(1.0) - obar), 6).alias("uncertainty"),
        F.round(F.col("s_ece") / F.col("n"), 6).alias("ece"),
        F.round(F.col("m_ce"), 6).alias("mce"),
    )


def isotonic_fit(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 50,
) -> DataFrame:
    """Isotonic (PAV) calibration of a quality score (X218; Ayer et al.
    1955 / Zadrozny & Elkan 2002) — the nonparametric monotone map from
    raw score to P(outcome) that fixes what Platt/logistic can't
    (non-sigmoid miscalibration), fitted over fixed-width score bins:

        iso_p(i) = max_{j<=i} min_{k>=i} pos(j..k) / n(j..k)

    — the minimax identity for weighted isotonic regression, which makes
    the WHOLE fit relational: no pool-merging loop, no driver-side
    state. Output per occupied bin: n_b, raw pos rate, iso_p (6 dp),
    monotone nondecreasing in the bin by construction; apply it to new
    data with a broadcast join on the bin key.

    Scale shape (10^12 rows): the corpus collapses in ONE map-side-
    combinable groupBy to <=bins rows; everything after runs on that
    bounded table — the j<=i<=k triple is <=bins³ rows (50³ = 125k), a
    broadcast nested-loop join over literally kilobytes. The cumulative
    window is a single-partition sort over <=bins rows, not corpus data.

    Determinism: interval rates are ONE exact division of integer
    cumulative sums ((C_k − C_{j−1})/(W_k − W_{j−1})) and min/max are
    order-free, so engines agree to the bit before the final 6-dp round
    — no float accumulation anywhere. DuckDB-oracle exact.
    """
    from pyspark.sql.window import Window

    b = int(bins)
    base = scored.select(
        F.least(
            F.lit(b - 1), F.floor(F.col(score_col) * b).cast("int")
        ).alias("bin"),
        F.col(label_col).cast("int").alias("_y"),
    )
    per = base.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("_y").cast("long").alias("pos_b"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cums = per.select(
        "bin",
        "n_b",
        "pos_b",
        F.sum("n_b").over(w).alias("w1"),
        F.sum("pos_b").over(w).alias("c1"),
    )
    lo = cums.select(
        F.col("bin").alias("j"),
        (F.col("w1") - F.col("n_b")).alias("w0"),
        (F.col("c1") - F.col("pos_b")).alias("c0"),
    )
    hi = cums.select(F.col("bin").alias("k"), "w1", "c1")
    pairs = (
        lo.join(F.broadcast(hi), F.col("k") >= F.col("j"))
        .select(
            "j",
            "k",
            (
                (F.col("c1") - F.col("c0")).cast("double")
                / (F.col("w1") - F.col("w0"))
            ).alias("avg_jk"),
        )
    )
    mins = (
        per.select(F.col("bin").alias("i"))
        .join(
            F.broadcast(pairs),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("avg_jk").alias("m"))
    )
    iso = mins.groupBy("i").agg(F.max("m").alias("iso_raw"))
    return (
        per.join(iso, per["bin"] == iso["i"])
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n_b",
            F.round(F.col("pos_b").cast("double") / F.col("n_b"), 6).alias(
                "raw_rate"
            ),
            F.round(F.col("iso_raw"), 6).alias("iso_p"),
        )
        .orderBy("bin")
    )
