"""Schema drift handling + attribute-quality profiling.

The reference runs for years against a live API and hits upstream schema
drift constantly: its ingest adds database columns missing from a batch as
NULL (corpusama/database/database.py:85-94, A13) and warns when the API
grows NEW fields (corpusama/source/reliefweb.py:175-186). Its attribute
tooling profiles %NA per attribute (corpusama/corpus/attribute.py:232-264,
A14 — commented-out WIP there) and summarizes grouped diffs between corpus
versions (pipeline/stanza/compare_vert.py:236-245, A12).

Spark shapes:
- reconcile/union: pure projection (narrow, no shuffle) — at 10^12 rows a
  schema merge must not cost anything beyond the scan.
- na_profile: ONE aggregation pass emitting every column's counters, then a
  driver-free unpivot (inline of a struct array) — never one job per column.
- diff_summary: a single full-outer shuffle join on the key; per-column
  change flags are JVM expressions on the joined row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def drift_report(df: DataFrame, target: StructType) -> DataFrame:
    """(column, status) rows: 'missing' = in target but not df (will be
    NULL-filled), 'new' = in df but not target (the reference logs these,
    reliefweb.py:175-186). Metadata-only — no Spark job."""
    have = {f.name for f in df.schema.fields}
    want = {f.name for f in target.fields}
    rows = [(c, "missing") for c in sorted(want - have)] + [
        (c, "new") for c in sorted(have - want)
    ]
    spark = df.sparkSession
    return spark.createDataFrame(rows or [], "column string, status string")


def reconcile_to(
    df: DataFrame, target: StructType, keep_new: bool = True
) -> DataFrame:
    """Align a batch to ``target``: missing columns become typed NULLs
    (database.py:85-94 semantics), matching columns cast to the target type,
    new columns kept at the end (or dropped). Pure projection."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if keep_new:
        target_names = {f.name for f in target.fields}
        cols += [F.col(c) for c in df.columns if c not in target_names]
    return df.select(*cols)


def union_reconciled(dfs: list[DataFrame], target: StructType) -> DataFrame:
    """Loss-free union of batches with drifting schemas: every batch is
    reconciled to target (+its own extras), then unioned by name with
    missing columns NULL-filled."""
    out = None
    for df in dfs:
        aligned = reconcile_to(df, target, keep_new=True)
        out = (
            aligned
            if out is None
            else out.unionByName(aligned, allowMissingColumns=True)
        )
    return out


def na_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A14: one row per attribute — (attribute, n, n_na, pct_na).

    NA follows the reference's nan_to_none semantics for strings (NULL,
    whitespace-only, or a case-insensitive none/null/nan literal,
    convert.py:53-71); non-strings count only SQL NULL. Single wide
    aggregation + inline unpivot: one pass over the data regardless of
    column count.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        is_str = dict(df.dtypes)[c] == "string"
        if is_str:
            # \s (not trim) so tab/newline-only cells count NA, matching the
            # reference's strip()-based nan_to_none (convert.py:53-71)
            na = F.col(c).isNull() | F.regexp_like(
                F.col(c), F.lit(r"(?i)^\s*(none|null|nan)?\s*$")
            )
        else:
            na = F.col(c).isNull()
        aggs.append(F.sum(na.cast("long")).alias(f"_na_{c}"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("attribute"),
                F.col(f"_na_{c}").alias("n_na"),
            )
            for c in cols
        ]
    )
    return wide.select(F.col("_n").alias("n"), F.inline(entries)).select(
        "attribute",
        "n",
        "n_na",
        F.round(F.col("n_na") / F.col("n"), 4).alias("pct_na"),
    )


def diff_rows(
    old: DataFrame, new: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """Row-status table between two corpus versions: (key, status) with
    status in added/removed/changed/same; null-safe per-column compare."""
    o = old.select(F.col(key).alias("_ko"), *[F.col(c).alias(f"_o_{c}") for c in cols])
    n = new.select(F.col(key).alias("_kn"), *[F.col(c).alias(f"_n_{c}") for c in cols])
    j = o.join(n, F.col("_ko") == F.col("_kn"), "full_outer")
    changed = F.lit(False)
    for c in cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_ko").isNull(), "added")
        .when(F.col("_kn").isNull(), "removed")
        .when(changed, "changed")
        .otherwise("same")
    )
    return j.select(
        F.coalesce("_ko", "_kn").alias(key), status.alias("status")
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    key: str,
    cols: list[str],
    group_col: str | None = None,
) -> DataFrame:
    """A12: grouped diff summary (compare_vert.py:236-245 shape) —
    counts per status, optionally per ``group_col`` taken from whichever
    side has the row."""
    o = old.select(
        F.col(key).alias("_ko"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
        *([F.col(group_col).alias("_go")] if group_col else []),
    )
    n = new.select(
        F.col(key).alias("_kn"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
        *([F.col(group_col).alias("_gn")] if group_col else []),
    )
    j = o.join(n, F.col("_ko") == F.col("_kn"), "full_outer")
    changed = F.lit(False)
    for c in cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_ko").isNull(), "added")
        .when(F.col("_kn").isNull(), "removed")
        .when(changed, "changed")
        .otherwise("same")
    )
    keys = [status.alias("status")]
    if group_col:
        keys.insert(0, F.coalesce("_gn", "_go").alias(group_col))
    return j.groupBy(*keys).agg(F.count("*").alias("n"))


def count_invariant(
    spark: SparkSession, stages: dict[str, DataFrame]
) -> DataFrame:
    """S15/A9: cross-stage doc-count invariant — one row per pipeline stage
    with its count and the delta vs the first stage; a verify scan asserts
    delta == 0 where a stage must be loss-free (the reference checks
    len(df) equality after each transform in its tests)."""
    rows = []
    base = None
    for name, df in stages.items():
        c = df.count()
        if base is None:
            base = c
        rows.append((name, c, c - base))
    return spark.createDataFrame(rows, "stage string, n long, delta long")
