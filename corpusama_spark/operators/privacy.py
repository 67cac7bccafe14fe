"""Re-identification risk audits: k-anonymity and l-diversity.

The scrub lane (functions/scrub.py) removes DIRECT identifiers from
caption text; this module audits the INDIRECT ones — combinations of
innocuous metadata columns (language, source, a coarsened length) that
together single documents out. A released corpus slice is k-anonymous
when every quasi-identifier combination matches at least k rows; the
companion l-diversity check catches the homogeneity failure mode where
a k-anonymous class still leaks a sensitive attribute because all k
rows share one value (Machanavajjhala et al. 2007).

These are audits, not anonymizers: they output the risk table a release
review needs (how many rows sit in classes below k, which classes, what
generalization would fix them), leaving suppression/generalization as an
explicit upstream choice.

Scale shape (10^12 rows): both statistics are one map-side-combinable
groupBy over the quasi-identifier tuple — the corpus collapses to one
row per equivalence class before anything else runs; the summary then
aggregates |classes| rows. l-diversity adds the sensitive column to the
first groupBy key (still one exchange) and rolls up. No windows over
corpus-sized data, no joins back to the corpus.

Reference seam: corpusama exports subcorpora by attribute predicates
(corpusama pipeline 'subcorpus' stage); this is the "is that slice safe
to publish?" gate the reference leaves to the human.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity", "l_diversity"]


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str | Column],
    k: int = 5,
) -> DataFrame:
    """One-row k-anonymity summary over the ``quasi_cols`` equivalence
    classes: ``n_rows``, ``n_classes``, ``min_class`` (the corpus'
    actual anonymity level), ``n_violating_classes`` / ``n_at_risk``
    (classes and rows below ``k``), ``at_risk_share`` (6dp), and
    ``n_singletons`` (classes of size 1 — unique fingerprints, the
    worst case). NULL quasi-identifier values form their own class
    (groupBy semantics), which is what a release audit wants: "lang
    unknown" is itself a matchable attribute.
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("_n")
    )
    return classes.groupBy().agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.min("_n").cast("long").alias("min_class"),
        F.sum((F.col("_n") < k).cast("long"))
        .cast("long")
        .alias("n_violating_classes"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("n_at_risk"),
        F.round(
            F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
            / F.sum("_n"),
            6,
        ).alias("at_risk_share"),
        F.sum((F.col("_n") == 1).cast("long"))
        .cast("long")
        .alias("n_singletons"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str | Column],
    sensitive_col: str,
    l: int = 2,
    k: int = 5,
) -> DataFrame:
    """Per-equivalence-class risk table: for every quasi-identifier
    class, its size ``n``, the number of DISTINCT sensitive values
    ``n_sensitive`` (distinct-l-diversity), the modal sensitive share
    ``top_share`` (6dp — 1.0 means the class is homogeneous and the
    sensitive value is fully disclosed), and boolean ``k_anon`` /
    ``l_diverse`` flags. Only classes failing EITHER gate are returned
    (the actionable worklist), ordered worst-first by (n asc,
    n_sensitive asc).

    Exact distinct + mode per class: one groupBy over (class, sensitive
    value) then a rollup per class — two constant-width exchanges, both
    map-side combinable.
    """
    sel = df.select(*quasi_cols, F.col(sensitive_col).alias("_sv"))
    names = sel.columns[:-1]
    per_val = sel.groupBy(*names, "_sv").agg(
        F.count("*").cast("long").alias("_c")
    )
    per_class = per_val.groupBy(*names).agg(
        F.sum("_c").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_sensitive"),
        F.max("_c").cast("long").alias("_top"),
    )
    return (
        per_class.select(
            *names,
            "n",
            "n_sensitive",
            F.round(F.col("_top") / F.col("n"), 6).alias("top_share"),
            (F.col("n") >= k).alias("k_anon"),
            (F.col("n_sensitive") >= l).alias("l_diverse"),
        )
        .where(~F.col("k_anon") | ~F.col("l_diverse"))
        .orderBy("n", "n_sensitive", *names)
    )
