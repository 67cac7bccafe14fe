"""Keyed upsert — the reference's `INSERT OR REPLACE` / UPDATE-by-rowid
(S4/S5: corpusama/database/database.py:47-83) as a deterministic MERGE.

With an Iceberg catalog this is literally

    MERGE INTO target t USING updates u ON t.image_id = u.image_id
    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *

and the functions here keep that contract on plain parquet for the sandbox:
last-writer-wins per key, deterministic tie-break, idempotent on replay
(running the same merge twice yields the same table — the property the
reference gets from PK upsert and we need for restartability, SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_dataframes(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    order_col: str | None = None,
) -> DataFrame:
    """MERGE semantics: one row per key; updates beat target rows.

    ``order_col`` (e.g. an updated-at timestamp) picks the winner among
    duplicate update rows; ties and its absence fall back to the update-side
    precedence bit + key order, so the result is deterministic under replay.
    """
    t = target.withColumn("_prec", F.lit(0))
    u = updates.withColumn("_prec", F.lit(1))
    both = t.unionByName(u)
    order = [F.desc("_prec")]
    if order_col is not None:
        order.insert(0, F.desc(order_col))
    w = Window.partitionBy(key).orderBy(*order)
    return (
        both.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_prec")
    )


def row_changelog(
    before: DataFrame,
    after: DataFrame,
    keys: tuple[str, ...] | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level change-data-capture between two table states — the
    Iceberg changelog-scan / Delta CDF shape (both public): emit
    ``insert`` rows (key only in ``after``), ``delete`` rows (key only
    in ``before``) and ``update_before``/``update_after`` image pairs
    (key in both, any compare column differing null-safely). Unchanged
    rows emit nothing — at 10^12 rows the changelog is proportional to
    the CHANGE, which is what makes downstream incremental consumers
    (index refresh, aggregate maintenance, replication) affordable.

    One full outer hash join on the keys plus one generate — no window,
    no second scan. ``compare_cols`` defaults to every non-key column
    shared by both sides. Output schema: *keys, *compare_cols,
    ``change`` string.
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in before.columns if c not in keys and c in after.columns
        ]
    b = before.select(*keys, *compare_cols).alias("b")
    a = after.select(*keys, *compare_cols).alias("a")
    cond = None
    for k in keys:
        e = F.col(f"b.{k}").eqNullSafe(F.col(f"a.{k}"))
        cond = e if cond is None else (cond & e)
    j = b.join(a, cond, "full")
    in_b = F.col(f"b.{keys[0]}").isNotNull()
    in_a = F.col(f"a.{keys[0]}").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"b.{c}").eqNullSafe(F.col(f"a.{c}"))

    def _img(side: str, change: str):
        return F.struct(
            *[F.col(f"{side}.{k}").alias(k) for k in keys],
            *[F.col(f"{side}.{c}").alias(c) for c in compare_cols],
            F.lit(change).alias("change"),
        )

    emit = (
        F.when(in_b & ~in_a, F.array(_img("b", "delete")))
        .when(~in_b & in_a, F.array(_img("a", "insert")))
        .when(
            in_b & in_a & changed,
            F.array(_img("b", "update_before"), _img("a", "update_after")),
        )
        # unchanged: a typed empty array (slice keeps the struct type)
        .otherwise(F.slice(F.array(_img("b", "none")), 1, 0))
    )
    return j.select(F.inline(emit))


def merge_parquet(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    order_col: str | None = None,
) -> None:
    """Upsert `updates` into a parquet table path (creates it if absent).

    NOTE (scale): this parquet emulation rewrites the table, like any
    copy-on-write MERGE without file pruning. On Iceberg the same call is a
    metadata-pruned MERGE INTO touching only matching files/partitions.
    """
    import os
    import pathlib
    import shutil

    if pathlib.Path(target_path).exists():
        target = spark.read.parquet(target_path)
        merged = merge_dataframes(target, updates, key, order_col)
    else:
        merged = updates.dropDuplicates([key])
    # write-then-swap: never overwrite the path still being read (fully
    # distributed — no driver-side collect)
    tmp = target_path.rstrip("/") + "__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if pathlib.Path(target_path).exists():
        shutil.rmtree(target_path)
    os.rename(tmp, target_path)
