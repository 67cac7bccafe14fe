"""Inferential statistics between quality signals and corpus strata.

The release-audit family (drift.py, ablation.py) answers "did the data
change?"; this lane answers "are these signals RELATED?" — the questions
a curation team asks before trusting a gate: is the keep decision
independent of source (chi-square + Cramér's V), do two quality scores
measure the same thing (Pearson matrix, per-source Spearman), did a rule
change move the mean (Welch's t). The reference's analysis notebooks do
these by hand over exported TSVs (corpusama/corpus/ stats exports); here
they are single-pass relational operators over the live table.

Determinism: every statistic is exact algebra over ONE map-side-
combinable aggregate (sums, counts) or a rank window — no RNG, no
approximation — so a DuckDB oracle running the same formulas matches to
the 6-dp rounding used throughout the engine.

Scale shape (10^12 rows): pearson_matrix and welch_ttest collapse the
corpus in one wide agg (a handful of doubles per metric pair / group);
chi2_independence collapses to the (levels_a × levels_b) contingency
table before any join; spearman_by_group is the only sort — two rank
windows partitioned by group, so parallelism is across groups and a
hot group is the documented skew edge (same caveat as any per-group
window; pre-aggregate to distinct values if cardinality allows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pearson_matrix",
    "spearman_by_group",
    "chi2_independence",
    "welch_ttest",
]


def _corr_from_sums(n, sx, sy, sxx, syy, sxy):
    """Pearson r from raw sums; NULL when either variance is 0 or n<2."""
    num = n * sxy - sx * sy
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    return F.when((n >= 2) & (den2 > 0), num / F.sqrt(den2))


def pearson_matrix(df: DataFrame, metric_cols: list[str]) -> DataFrame:
    """Long-form Pearson correlation matrix over per-row metrics:
    one row per unordered pair (metric_a < metric_b by list position)
    with the pairwise-complete n and r (6 dp; NULL when degenerate).

    Pairwise deletion: each pair's sums only include rows where BOTH
    metrics are non-null, so one sparse metric doesn't poison the rest.
    ONE wide aggregate computes every pair's six sums map-side; the
    result is a single row exploded to |pairs| rows — the corpus is
    read exactly once regardless of how many metrics are compared.
    """
    if len(metric_cols) < 2:
        raise ValueError("pearson_matrix needs at least two metrics")
    pairs = [
        (metric_cols[i], metric_cols[j])
        for i in range(len(metric_cols))
        for j in range(i + 1, len(metric_cols))
    ]
    aggs = []
    for a, b in pairs:
        x = F.col(a).cast("double")
        y = F.col(b).cast("double")
        ok = x.isNotNull() & y.isNotNull()
        x0 = F.when(ok, x)
        y0 = F.when(ok, y)
        tag = f"{a}__{b}"
        aggs += [
            F.count(x0).alias(f"n_{tag}"),
            F.sum(x0).alias(f"sx_{tag}"),
            F.sum(y0).alias(f"sy_{tag}"),
            F.sum(x0 * x0).alias(f"sxx_{tag}"),
            F.sum(y0 * y0).alias(f"syy_{tag}"),
            F.sum(x0 * y0).alias(f"sxy_{tag}"),
        ]
    wide = df.agg(*aggs)
    rows = []
    for a, b in pairs:
        tag = f"{a}__{b}"
        rows.append(
            F.struct(
                F.lit(a).alias("metric_a"),
                F.lit(b).alias("metric_b"),
                F.col(f"n_{tag}").cast("long").alias("n"),
                F.round(
                    _corr_from_sums(
                        F.col(f"n_{tag}").cast("double"),
                        F.col(f"sx_{tag}"),
                        F.col(f"sy_{tag}"),
                        F.col(f"sxx_{tag}"),
                        F.col(f"syy_{tag}"),
                        F.col(f"sxy_{tag}"),
                    ),
                    6,
                ).alias("r"),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("metric_a", "metric_b")
    )


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation between two metrics, exact
    average-rank (midrank) tie handling: rank each metric within its
    group, then Pearson over the ranks — the standard tie-robust rho,
    NOT the n(n²−1) shortcut (which is wrong under ties).

    Rows where either metric is NULL are excluded per group. Output:
    (group, n, rho) with rho at 6 dp, NULL when a metric is constant
    within the group or n < 2.
    """
    base = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    # midrank = min-rank + (ties-1)/2, computed per group
    rx = F.rank().over(Window.partitionBy("g").orderBy("x"))
    cx = F.count("*").over(Window.partitionBy("g", "x"))
    ry = F.rank().over(Window.partitionBy("g").orderBy("y"))
    cy = F.count("*").over(Window.partitionBy("g", "y"))
    ranked = base.select(
        "g",
        (rx + (cx - F.lit(1)) / F.lit(2.0)).alias("rx"),
        (ry + (cy - F.lit(1)) / F.lit(2.0)).alias("ry"),
    )
    agg = ranked.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n",
        F.round(
            _corr_from_sums(
                F.col("n").cast("double"),
                F.col("sx"),
                F.col("sy"),
                F.col("sxx"),
                F.col("syy"),
                F.col("sxy"),
            ),
            6,
        ).alias("rho"),
    ).orderBy(group_col)


def chi2_independence(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns (e.g. source × keep decision, source × language), returning
    ONE row: n, level counts, degrees of freedom, the chi2 statistic and
    Cramér's V effect size (both 6 dp).

    Zero-observed cells COUNT: the statistic sums (o−e)²/e over the full
    levels_a × levels_b grid (a cell the data never produced still
    contributes e), built by cross-joining the two marginal tables —
    grid-sized, never corpus-sized. Rows where either column is NULL are
    excluded (a NULL level is not a category).

    Scale shape: one groupBy collapses the corpus to the contingency
    table; marginals derive from it; the cross join is |A|×|B| rows.
    """
    obs = (
        df.where(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("double").alias("o"))
    )
    ra = obs.groupBy("a").agg(F.sum("o").alias("ta"))
    cb = obs.groupBy("b").agg(F.sum("o").alias("tb"))
    tot = obs.agg(F.sum("o").alias("n"))
    grid = (
        ra.crossJoin(F.broadcast(cb))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["a", "b"], "left")
        .select(
            "n",
            (F.col("ta") * F.col("tb") / F.col("n")).alias("e"),
            F.coalesce("o", F.lit(0.0)).alias("o"),
        )
    )
    cell = grid.select(
        "n",
        ((F.col("o") - F.col("e")) ** 2 / F.col("e")).alias("c"),
    )
    out = cell.groupBy("n").agg(F.sum("c").alias("chi2"))
    na = ra.agg(F.count("*").cast("long").alias("levels_a"))
    nb = cb.agg(F.count("*").cast("long").alias("levels_b"))
    return (
        out.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("n").cast("long").alias("n"),
            "levels_a",
            "levels_b",
            ((F.col("levels_a") - 1) * (F.col("levels_b") - 1))
            .cast("long")
            .alias("dof"),
            F.round("chi2", 6).alias("chi2"),
            F.round(
                F.when(
                    F.least(F.col("levels_a"), F.col("levels_b")) > 1,
                    F.sqrt(
                        F.col("chi2")
                        / (
                            F.col("n")
                            * (
                                F.least(
                                    F.col("levels_a"), F.col("levels_b")
                                )
                                - 1
                            )
                        )
                    ),
                ),
                6,
            ).alias("cramers_v"),
        )
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance t-test between two named groups' metric
    means: ONE row with per-group n/mean/sample-variance, the t statistic
    and the Welch–Satterthwaite degrees of freedom (all 6 dp). The "did
    the rule change move caption quality?" test that doesn't assume the
    two sources have equal spread.

    NULL t/df when either group has n<2 or both variances are 0. One
    filtered aggregate collapses the corpus to six doubles; everything
    after is literal algebra on one row.
    """
    v = F.col(value_col).cast("double")
    ga = F.when(
        (F.col(group_col) == group_a) & v.isNotNull(), v
    )
    gb = F.when(
        (F.col(group_col) == group_b) & v.isNotNull(), v
    )
    wide = df.agg(
        F.count(ga).cast("double").alias("na"),
        F.sum(ga).alias("sa"),
        F.sum(ga * ga).alias("saa"),
        F.count(gb).cast("double").alias("nb"),
        F.sum(gb).alias("sb"),
        F.sum(gb * gb).alias("sbb"),
    )
    # every divide is guarded: ANSI mode (the engine default) raises on
    # /0 instead of returning NULL, and n=0 or n=1 groups are legal input
    ma = F.when(F.col("na") > 0, F.col("sa") / F.col("na"))
    mb = F.when(F.col("nb") > 0, F.col("sb") / F.col("nb"))
    va = F.when(
        F.col("na") >= 2,
        (F.col("saa") - F.col("sa") * F.col("sa") / F.col("na"))
        / (F.col("na") - 1),
    )
    vb = F.when(
        F.col("nb") >= 2,
        (F.col("sbb") - F.col("sb") * F.col("sb") / F.col("nb"))
        / (F.col("nb") - 1),
    )
    sea = va / F.col("na")
    seb = vb / F.col("nb")
    se2 = sea + seb
    tstat = F.when(
        (F.col("na") >= 2) & (F.col("nb") >= 2) & (se2 > 0),
        (ma - mb) / F.sqrt(se2),
    )
    wdf = F.when(
        (F.col("na") >= 2) & (F.col("nb") >= 2) & (se2 > 0),
        (se2 * se2)
        / (
            sea * sea / (F.col("na") - 1)
            + seb * seb / (F.col("nb") - 1)
        ),
    )
    return wide.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(va, 6).alias("var_a"),
        F.round(vb, 6).alias("var_b"),
        F.round(tstat, 6).alias("t"),
        F.round(wdf, 6).alias("welch_df"),
    )
