"""Merge-on-read delete files — the Iceberg v2 row-level delete shape.

The upsert lane (operators/upsert.py, S4/S5) is COPY-ON-WRITE: a MERGE
rewrites every file that contains a matched row. At 10^12 rows that is the
wrong default for sparse deletes — GDPR erasure of 0.001% of keys, a
moderation takedown list, a retraction of one crawl day — because the
rewrite cost is proportional to the TABLE, not the delete. Iceberg v2
solves this with merge-on-read: deletes land as small DELETE FILES next to
the data and are subtracted at scan time; a background rewrite ("major
compaction") folds them in later. This module implements that contract
relationally (format spec: Apache Iceberg table spec v2, "Row-level
deletes" — public):

- **Positional delete**: ``(file_path, pos)`` — kills the row at ordinal
  ``pos`` of data file ``file_path``. Applies to a data row when
  ``delete_seq >= data_seq`` (a transaction may position-delete rows it
  can see, including rows committed in the same sequence).
- **Equality delete**: values of the key column(s) — kills EVERY matching
  row written STRICTLY BEFORE the delete (``data_seq < delete_seq``), so a
  re-insert of the same key in a later (or the same) sequence survives.
  This asymmetry is the load-bearing part of the spec: it is what lets an
  engine express "delete then insert" without ordering files within a
  commit.

Scale shape: delete sets are aggregated per key BEFORE touching the data
(one small groupBy), then subtracted with two hash anti-joins — the data
table streams through unchanged, no window, no rewrite. Delete files are
normally tiny relative to data, so AQE will broadcast them; nothing here
assumes it. ``compact_mor`` is the rewrite path and is pinned equal to the
merge-on-read view by test.

Reference tie-in: the reference deletes rows only via PK replace
(corpusama/database/database.py:57, P14); this is the scale-native
generalisation the north rule's Iceberg framing asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: columns every MOR data row must carry next to its payload
DATA_META = ("data_seq", "file_path", "pos")


def apply_mor_deletes(
    data: DataFrame,
    pos_deletes: DataFrame | None = None,
    eq_deletes: DataFrame | None = None,
    keys: tuple[str, ...] = ("image_id",),
) -> DataFrame:
    """The merge-on-read scan: ``data`` minus both delete kinds.

    ``data`` carries ``data_seq`` (commit sequence of its data file),
    ``file_path`` and ``pos`` (ordinal within the file) plus payload.
    ``pos_deletes``: (file_path, pos, delete_seq). ``eq_deletes``:
    (*keys, delete_seq). Multiple delete files for the same target are
    collapsed with max(delete_seq) first so the join can never duplicate
    data rows. Either delete side may be None/empty.
    """
    out = data
    if pos_deletes is not None:
        pd_agg = pos_deletes.groupBy("file_path", "pos").agg(
            F.max("delete_seq").alias("_pos_del_seq")
        )
        out = out.join(pd_agg, ["file_path", "pos"], "left").where(
            F.col("_pos_del_seq").isNull()
            | (F.col("_pos_del_seq") < F.col("data_seq"))
        ).drop("_pos_del_seq")
    if eq_deletes is not None:
        ed_agg = eq_deletes.groupBy(*keys).agg(
            F.max("delete_seq").alias("_eq_del_seq")
        )
        out = out.join(ed_agg, list(keys), "left").where(
            F.col("_eq_del_seq").isNull()
            | (F.col("_eq_del_seq") <= F.col("data_seq"))
        ).drop("_eq_del_seq")
    return out


def mor_delete_audit(
    data: DataFrame,
    pos_deletes: DataFrame | None = None,
    eq_deletes: DataFrame | None = None,
    keys: tuple[str, ...] = ("image_id",),
) -> DataFrame:
    """Per-sequence accounting of what a MOR scan would subtract:
    (data_seq, n_input, n_pos_del, n_eq_del, n_live) — the "how much
    delete debt does this table carry" number that decides when to run
    ``compact_mor`` (Iceberg's delete-file ratio maintenance trigger).

    A row hit by both kinds counts once, attributed to the positional
    delete (it is the more specific claim). One pass over the data.
    """
    flagged = data
    if pos_deletes is not None:
        pd_agg = pos_deletes.groupBy("file_path", "pos").agg(
            F.max("delete_seq").alias("_pos_del_seq")
        )
        flagged = flagged.join(pd_agg, ["file_path", "pos"], "left")
    else:
        flagged = flagged.withColumn("_pos_del_seq", F.lit(None).cast("long"))
    if eq_deletes is not None:
        ed_agg = eq_deletes.groupBy(*keys).agg(
            F.max("delete_seq").alias("_eq_del_seq")
        )
        flagged = flagged.join(ed_agg, list(keys), "left")
    else:
        flagged = flagged.withColumn("_eq_del_seq", F.lit(None).cast("long"))
    pos_hit = F.col("_pos_del_seq") >= F.col("data_seq")
    eq_hit = F.col("_eq_del_seq") > F.col("data_seq")
    return (
        flagged.groupBy("data_seq")
        .agg(
            F.count(F.lit(1)).alias("n_input"),
            F.sum(F.coalesce(pos_hit, F.lit(False)).cast("long")).alias(
                "n_pos_del"
            ),
            F.sum(
                (
                    F.coalesce(eq_hit, F.lit(False))
                    & ~F.coalesce(pos_hit, F.lit(False))
                ).cast("long")
            ).alias("n_eq_del"),
            F.sum(
                (
                    ~F.coalesce(pos_hit, F.lit(False))
                    & ~F.coalesce(eq_hit, F.lit(False))
                ).cast("long")
            ).alias("n_live"),
        )
        .orderBy("data_seq")
    )


def compact_mor(
    data: DataFrame,
    pos_deletes: DataFrame | None = None,
    eq_deletes: DataFrame | None = None,
    keys: tuple[str, ...] = ("image_id",),
    new_seq: int | None = None,
) -> DataFrame:
    """The rewrite path: materialise the MOR view as plain data rows so
    the delete files can be dropped (Iceberg rewrite_data_files +
    rewrite_position_delete_files). ``new_seq`` restamps ``data_seq``
    (defaults to keeping the original — callers folding into a new
    snapshot pass its sequence). Pinned by test:
    ``apply_mor_deletes(compact_mor(d, p, e), None, None) ==
    apply_mor_deletes(d, p, e)``.
    """
    live = apply_mor_deletes(data, pos_deletes, eq_deletes, keys)
    if new_seq is not None:
        live = live.withColumn("data_seq", F.lit(int(new_seq)).cast("long"))
    return live


# ---------------------------------------------------------------------------
# file layer: delete files live under <table_dir>/deletes/<kind>/, data
# under <table_dir>/data/ — the minimal honest mapping of the Iceberg
# layout onto plain parquet (same stance as snapshots.py).
# ---------------------------------------------------------------------------


def write_mor_data(df: DataFrame, table_dir: str) -> None:
    """Append data rows (payload + DATA_META) to the table."""
    for c in DATA_META:
        if c not in df.columns:
            raise ValueError(f"data rows need column {c!r}")
    df.write.mode("append").parquet(f"{table_dir.rstrip('/')}/data")


def write_delete_file(df: DataFrame, table_dir: str, kind: str) -> None:
    """Append one delete file. ``kind`` is 'pos' (file_path, pos,
    delete_seq) or 'eq' (*keys, delete_seq)."""
    if kind not in ("pos", "eq"):
        raise ValueError("kind must be 'pos' or 'eq'")
    if "delete_seq" not in df.columns:
        raise ValueError("delete files need column 'delete_seq'")
    df.write.mode("append").parquet(f"{table_dir.rstrip('/')}/deletes/{kind}")


def read_mor(
    spark: SparkSession,
    table_dir: str,
    keys: tuple[str, ...] = ("image_id",),
) -> DataFrame:
    """Scan the table merge-on-read: data minus any delete files present.
    Missing delete directories mean no deletes of that kind."""
    import pathlib

    base = pathlib.Path(table_dir)
    data = spark.read.parquet(str(base / "data"))
    pos = eq = None
    if (base / "deletes" / "pos").exists():
        pos = spark.read.parquet(str(base / "deletes" / "pos"))
    if (base / "deletes" / "eq").exists():
        eq = spark.read.parquet(str(base / "deletes" / "eq"))
    return apply_mor_deletes(data, pos, eq, keys)
