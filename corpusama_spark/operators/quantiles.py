"""Exact distributed per-group quantiles (type-1 / inverse-CDF).

Spark ships approximate quantiles (`percentile_approx`, the
Greenwald-Khanna sketch) — right for dashboards, wrong for contract
gates (CCNet-style perplexity tercile cuts, token-budget planning)
where two runs must agree bit-for-bit. The exact lane is selection by
rank: the q-quantile of a group of n values is the value of rank
``max(1, ceil(q*n))`` in sort order (the inverse empirical CDF —
"type 1" in the Hyndman-Fan taxonomy, what DuckDB's ``quantile_disc``
and Hive's ``percentile`` compute for discrete inputs).

Implementation: ONE window exchange computes both ``row_number`` (rank
in value order) and the partition count; each row then tests, scan-
stage, which requested quantiles its rank hits (an array filter over
the q list) and explodes the hits. No join, no second pass, no
collect; the only shuffle is the per-key sort any exact method needs.

Scale shape (10^12 rows):
- one hash exchange + per-partition sort — the irreducible cost of
  exact selection; AQE skew-split does not apply to windows, so a
  pathologically hot group serializes one task (same caveat and same
  remedies as sessionization: pre-filter, or run per-key two-level
  pre-aggregation ``groupBy(key, val).count()`` first when the value
  domain is small — that variant cuts the sorted volume to distinct
  values and is exactly equivalent);
- emission is O(|qs|) rows per group, a projection.

Tie semantics: equal values fill adjacent ranks, so the value AT a
rank is deterministic regardless of tie order. Float caveat: rank
targets are computed as ``ceil(q * n)`` in double arithmetic — prefer
dyadic q (0.25, 0.5, 0.75) or q·n products away from integers so the
float ceil agrees with exact rational arithmetic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles_exact(
    df: DataFrame,
    key: str,
    val: str,
    qs: list[float],
) -> DataFrame:
    """(key, q, value): the exact type-1 q-quantile of ``val`` per
    ``key`` group for every q in ``qs``. NULL values are excluded (as
    every SQL aggregate does); empty groups emit nothing."""
    base = df.where(F.col(val).isNotNull()).select(key, val)
    part = Window.partitionBy(key)
    ranked = base.select(
        key,
        val,
        F.row_number().over(part.orderBy(F.col(val))).alias("_rn"),
        F.count(val).over(part).alias("_n"),
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    hits = F.filter(
        qarr,
        lambda q: F.greatest(F.ceil(q * F.col("_n")), F.lit(1))
        == F.col("_rn"),
    )
    return ranked.select(
        F.col(key),
        F.explode(hits).alias("q"),
        F.col(val).alias("value"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_thresh: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier gate: median/MAD z-score
    (0.6745·(x−med)/MAD, the standard consistency constant) with
    |z| > z_thresh flagged. Quality filtering needs ROBUST location —
    a handful of 100 MB pathological docs drags a mean/stddev gate far
    enough that real spam passes; the median and MAD don't move.
    Degenerate groups (MAD = 0: over half the group identical) emit
    NULL z/outlier rather than a divide-by-zero — callers decide
    policy for those explicitly.

    Both medians are exact type-1 selections via group_quantiles_exact
    (rank == ceil(n/2)), so integer inputs stay integer through the
    deviation pass and the only float op is the final ratio —
    bit-portable. Scale shape: two group-keyed window passes + two
    broadcast-sized joins (one row per group each); no corpus-sized
    state beyond the sorts.
    """
    med = group_quantiles_exact(
        df.select(group_col, value_col), group_col, value_col, [0.5]
    ).select(F.col(group_col), F.col("value").alias("_med"))
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_ad", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = group_quantiles_exact(
        dev.select(group_col, "_ad"), group_col, "_ad", [0.5]
    ).select(F.col(group_col), F.col("value").alias("_mad"))
    z = F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad")
    return (
        dev.join(F.broadcast(mad), group_col)
        .select(
            *df.columns,
            F.col("_med").cast("long").alias("med"),
            F.col("_mad").cast("long").alias("mad"),
            F.when(F.col("_mad") == 0, F.lit(None)).otherwise(
                F.round(z, 6)
            ).alias("robust_z"),
            F.when(F.col("_mad") == 0, F.lit(None).cast("boolean")).otherwise(
                F.abs(z) > F.lit(float(z_thresh))
            ).alias("outlier"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    ref_group: str,
) -> DataFrame:
    """Map every group's value distribution onto a reference group's —
    quantile normalization (the cross-sample harmonization standard in
    computational biology, public; here: make quality scores computed
    on different domains comparable before one global threshold cuts
    the corpus). Each row's within-group rank r of n maps to the
    reference value at type-1 index ceil(r·n_ref / n), computed in
    INTEGER arithmetic ((r·n_ref + n − 1) div n) so no float ceil can
    disagree between engines. Output keeps the raw value, the quantile
    (r/n) and the mapped value; reference rows map to themselves by
    construction.

    Scale shape: one rank window per group (the irreducible sort), a
    broadcast of the REFERENCE group's (index, value) table (one group,
    not the corpus), and an integer-key join. Ties rank by (value, id)
    so the mapping is deterministic.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.asc(value_col), F.asc(id_col)
    )
    ranked = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).cast("long").alias("_r"),
        F.count("*")
        .over(Window.partitionBy(group_col))
        .cast("long")
        .alias("_n"),
    )
    ref = (
        ranked.where(F.col(group_col) == ref_group)
        .select(
            F.col("_r").alias("_idx"),
            F.col(value_col).alias("mapped"),
            F.col("_n").alias("_nref"),
        )
    )
    nref = ref.select(F.max("_nref").alias("_nref"))
    # (a + n - 1) div n == ceil(a / n) for positives; the double divide
    # under floor is exact while r·n_ref < 2^53 (always, at any scale
    # a single group can reach)
    idx = F.floor(
        (F.col("_r") * F.col("_nref") + F.col("_n") - F.lit(1))
        / F.col("_n")
    ).cast("long")
    return (
        ranked.crossJoin(F.broadcast(nref))
        .withColumn("_idx", idx)
        .join(F.broadcast(ref.drop("_nref")), "_idx")
        .select(
            id_col,
            group_col,
            value_col,
            F.round(F.col("_r") / F.col("_n"), 6).alias("q"),
            "mapped",
        )
    )


def trimmed_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    trim: float = 0.125,
) -> DataFrame:
    """Per-group trimmed AND winsorized means, exactly: drop (trimmed)
    or clamp (winsorized) the k = floor(trim·n) most extreme rows on
    each side, k computed from a DYADIC trim fraction so the float
    floor is integer-exact on any engine. Robust location estimates
    for corpus metrics where mad_outliers-style gating is too blunt —
    a handful of 100 MB documents should not move a source's "typical
    length" (trimmed), and winsorizing is the version that still uses
    their row count. Integer value columns keep every sum exact; the
    only floats are the two final divides.

    One rank window per group (the irreducible exact-selection sort),
    then a single conditional aggregation — no second pass, no join.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.asc(value_col), F.asc(id_col)
    )
    n = F.count("*").over(Window.partitionBy(group_col))
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).cast("long").alias("_v"),
        F.row_number().over(w).cast("long").alias("_r"),
        n.cast("long").alias("_n"),
    ).withColumn("_k", F.floor(F.col("_n") * float(trim)).cast("long"))
    inc = (F.col("_r") > F.col("_k")) & (
        F.col("_r") <= F.col("_n") - F.col("_k")
    )
    agg = ranked.groupBy(group_col).agg(
        F.max("_n").alias("n"),
        F.max("_k").alias("k_trimmed"),
        F.sum(F.when(inc, F.col("_v"))).alias("_s"),
        F.min(F.when(inc, F.col("_v"))).alias("_lo"),
        F.max(F.when(inc, F.col("_v"))).alias("_hi"),
        F.avg("_v").alias("_mean"),
    )
    kept = F.col("n") - 2 * F.col("k_trimmed")
    wins = (
        F.col("_s")
        + F.col("k_trimmed") * F.col("_lo")
        + F.col("k_trimmed") * F.col("_hi")
    ) / F.col("n").cast("double")
    return agg.select(
        group_col,
        "n",
        "k_trimmed",
        F.round(F.col("_mean"), 6).alias("mean"),
        F.round(F.col("_s") / kept.cast("double"), 6).alias("trimmed_mean"),
        F.round(wins, 6).alias("winsorized_mean"),
    )


def conformal_thresholds(
    df: DataFrame,
    score_col: str,
    id_col: str,
    alphas: list[float],
    group_col: str | None = None,
) -> DataFrame:
    """Split-conformal calibration of a keep/drop score threshold
    (Vovk et al. 2005; Angelopoulos & Bates 2023 tutorial form): rows
    are hash-split into a CALIBRATION and a TEST half (md5 parity of
    the id — deterministic, engine-reproducible); for each miscoverage
    target α the threshold is the k-th smallest calibration score with
    k = ⌈(n_cal + 1)(1 − α)⌉, which carries the finite-sample
    guarantee P(new score ≤ threshold) ≥ 1 − α for exchangeable data —
    no distributional assumption on the quality score at all. The TEST
    half then measures realized coverage next to the nominal target,
    so the output is simultaneously the calibrated gate AND its audit:
    (group?, alpha, n_cal, k, threshold, n_test, coverage). k > n_cal
    (tiny calibration sets / aggressive α) yields a NULL threshold =
    "keep everything", coverage 1 by convention.

    Why this belongs in a 10^12-row curation engine: every score-based
    gate here (perplexity buckets, NB quality, caption alignment) needs
    a cut point, and picking it as a plain quantile of TRAINING scores
    silently miscovers new data; the +1 in ⌈(n+1)(1−α)⌉ is the entire
    difference between folklore and a guarantee, and it costs nothing.

    Scale shape: one window exchange on the calibration half (the
    irreducible exact-selection sort, same as group_quantiles_exact),
    one constant-width agg on the test half, and a |groups|·|alphas|
    broadcast join between them. Ties in the score fill adjacent ranks,
    so thresholds are deterministic.
    """
    gcol = group_col or "_g"
    base = df.select(
        (F.col(group_col) if group_col else F.lit("all")).alias(gcol),
        F.col(score_col).alias("_s"),
        F.col(id_col).alias("_id"),
    ).where(F.col("_s").isNotNull())
    # deterministic split: md5 low nibble parity of the id
    is_cal = (
        F.conv(F.substring(F.md5(F.col("_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
        == 0
    )
    cal = base.where(is_cal)
    test = base.where(~is_cal)

    part = Window.partitionBy(gcol)
    ranked = cal.select(
        gcol,
        "_s",
        F.row_number().over(part.orderBy("_s", "_id")).alias("_rn"),
        F.count("*").over(part).alias("_n"),
    )
    aarr = F.array(*[F.lit(float(a)) for a in alphas])
    hits = F.filter(
        aarr,
        lambda a: F.ceil((F.col("_n") + 1) * (1.0 - a) - F.lit(1e-9))
        == F.col("_rn"),
    )
    thr = ranked.select(
        gcol,
        F.explode(hits).alias("alpha"),
        F.col("_n").alias("n_cal"),
        F.col("_rn").alias("k"),
        F.col("_s").alias("threshold"),
    )
    # alphas whose k exceeds n_cal never match a rank: rebuild the full
    # (group, alpha) grid so they surface with a NULL threshold.
    grid = (
        cal.groupBy(gcol)
        .agg(F.count("*").alias("n_cal"))
        .select(
            gcol,
            "n_cal",
            F.explode(F.array(*[F.lit(float(a)) for a in alphas])).alias(
                "alpha"
            ),
        )
        .withColumn(
            "k",
            F.ceil((F.col("n_cal") + 1) * (1.0 - F.col("alpha")) - 1e-9)
            .cast("long"),
        )
    )
    thr_full = grid.join(
        thr.select(gcol, "alpha", F.col("threshold")),
        [gcol, "alpha"],
        "left",
    )
    tstats = test.groupBy(gcol).agg(F.count("*").alias("n_test"))
    cov = (
        test.join(F.broadcast(thr_full), gcol)
        .groupBy(gcol, "alpha", "n_cal", "k", "threshold")
        .agg(
            F.sum(
                F.when(
                    F.col("threshold").isNull()
                    | (F.col("_s") <= F.col("threshold")),
                    1,
                ).otherwise(0)
            ).alias("n_covered")
        )
        .join(tstats, gcol)
        .select(
            F.col(gcol).alias(group_col or "group"),
            "alpha",
            "n_cal",
            "k",
            F.col("threshold").cast("double").alias("threshold"),
            "n_test",
            F.round(F.col("n_covered") / F.col("n_test"), 6).alias(
                "coverage"
            ),
        )
        .orderBy(group_col or "group", "alpha")
    )
    return cov


def weighted_group_quantiles(
    df: DataFrame,
    key: str,
    val: str,
    weight: str,
    qs: list[float],
) -> DataFrame:
    """Exact weighted quantiles per group (X234): (key, q, value) where
    value is the smallest ``val`` whose cumulative ``weight`` reaches
    q·W — the weighted type-1 quantile. The question mixture planning
    actually asks ("the median document *by token mass*, not by count";
    "the byte size below which half the shard volume sits") — unweighted
    quantiles answer a different, usually wrong, question when rows have
    wildly different sizes.

    Exactness: each q is converted to a rational num/den (denominator
    ≤ 1000, covering .5/.95/.999-style grades) and the crossing test is
    pure BIGINT ``cw·den ≥ num·W`` — no float boundary, so a quantile
    landing exactly on a cumulative step decides identically in every
    engine. Rows with NULL or non-positive weight are excluded.

    Scale shape: the (key, val) pre-aggregation collapses the corpus to
    distinct values per group FIRST (ties merge, so the later window
    never depends on intra-tie row order); the cumulative window and the
    per-(key, q) min ride the same key partitioning. qs explode is
    |qs|-fold on the collapsed table, not the corpus.
    """
    from fractions import Fraction

    rats = [
        (q, Fraction(q).limit_denominator(1000)) for q in qs
    ]
    grouped = (
        df.where(
            F.col(val).isNotNull()
            & F.col(weight).isNotNull()
            & (F.col(weight) > 0)
        )
        .groupBy(key, val)
        .agg(F.sum(F.col(weight).cast("long")).alias("_w"))
    )
    part = Window.partitionBy(key)
    cum = grouped.select(
        key,
        val,
        F.sum("_w").over(part.orderBy(F.col(val))).alias("_cw"),
        F.sum("_w").over(part).alias("_W"),
    )
    qrows = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"),
                F.lit(r.numerator).alias("num"),
                F.lit(r.denominator).alias("den"),
            )
            for q, r in rats
        ]
    )
    exploded = cum.select("*", F.explode(qrows).alias("_q")).where(
        F.col("_cw") * F.col("_q.den") >= F.col("_q.num") * F.col("_W")
    )
    return (
        exploded.groupBy(key, F.col("_q.q").alias("q"))
        .agg(F.min(val).alias("value"))
        .orderBy(key, "q")
    )
