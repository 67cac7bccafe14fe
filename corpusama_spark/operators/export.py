"""Filtered corpus export — the reference's export_text re-expressed.

J1/W1/P3/P4/S10 (corpusama/corpus/export.py:104-131): 3-way left join on id,
language-share >= min_portion, date BETWEEN, ordered output, wrapped in
`<doc …>` tags, batched ~10 000 docs per file.

Spark shape: the side tables join with broadcast hints when small; ordering
is a range-partitioned sort (no single-node funnel); file batching is
`maxRecordsPerFile` so file count scales with data, not with a driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corpusama_spark.functions.langid import lid_share


def export_join(
    lang_df: DataFrame,
    attr_df: DataFrame,
    raw_df: DataFrame,
    lang: str,
    min_portion: float = 0.8,
    start_date: str = "1900-01-01",
    end_date: str = "2100-12-31",
    id_col: str = "id",
    date_col: str = "date_original",
    broadcast_side_tables: bool = True,
) -> DataFrame:
    """The reference's literal export query (export.py:104-110) as a plan:

    SELECT … FROM _lang LEFT JOIN _attr USING(id) LEFT JOIN _raw USING(id)
    WHERE lid share >= min_portion AND date BETWEEN … ORDER BY id, file_id
    """
    attr = F.broadcast(attr_df) if broadcast_side_tables else attr_df
    filtered = lang_df.where(
        F.coalesce(lid_share("lid", lang) >= F.lit(min_portion), F.lit(False))
    )
    joined = filtered.join(attr, id_col, "left").join(raw_df, id_col, "left")
    dated = joined.where(
        F.to_date(F.col(date_col)).between(F.lit(start_date), F.lit(end_date))
    )
    order_cols = [id_col] + (["file_id"] if "file_id" in dated.columns else [])
    return dated.orderBy(*order_cols)


def wrap_doc(doc_tag: Column, text: Column, file_id: Column | None = None) -> Column:
    """doc_tag + "\\n" + text + "\\n</doc>" with the FILE_ID placeholder
    filled (export.py:51-53,64-69); NULL text yields NULL (row skipped)."""
    tag = doc_tag
    if file_id is not None:
        tag = F.replace(doc_tag, F.lit("FILE_ID"), file_id.cast("string"))
    return F.when(
        text.isNotNull(), F.concat(tag, F.lit("\n"), text, F.lit("\n</doc>"))
    )


def vert_doc(
    doc_tag: Column,
    text: Column,
    sent_split: str = r"(?<=[.!?])\s+",
) -> Column:
    """S12: one vertical-format (.vert) document string — pure SQL.

    The reference's `_conll_to_vert` (base_pipeline.py:136-224) emits
    `<doc …>` / `<s id="n">` XML structure with one token per line inside;
    its token annotations come from the Stanza tagger (out of scope per
    SURVEY §2.8 M4), so this writer emits word-only token lines — the
    minimal Sketch-Engine vertical. Sentences renumber from 0 per doc
    (W2, :160-171).
    """
    sentences = F.filter(
        F.transform(
            F.split(F.regexp_replace(text, r"\n", " "), sent_split),
            lambda s: F.trim(s),
        ),
        lambda s: F.length(s) > 0,
    )
    sent_blocks = F.transform(
        sentences,
        lambda s, i: F.concat(
            F.lit('<s id="'),
            i.cast("string"),
            F.lit('">\n'),
            F.array_join(
                F.filter(F.split(s, r"\s+"), lambda t: F.length(t) > 0), "\n"
            ),
            F.lit("\n</s>"),
        ),
    )
    return F.concat(
        doc_tag, F.lit("\n"), F.array_join(sent_blocks, "\n"), F.lit("\n</doc>")
    )


def write_batched_text(
    df: DataFrame,
    text_col: str,
    path: str,
    docs_per_file: int = 10000,
    compression: str | None = None,
) -> None:
    """S10/S11: ceil(n/chunksize) text files of ≤ chunksize docs each —
    partition-parallel, no driver loop (export.py:112-131).

    ``compression``: any Hadoop codec short name — "gzip"/"bzip2" ship with
    Spark; the reference's .xz (base_pipeline.py:278-292) needs an XZCodec
    jar on the cluster classpath (io.sensesecure.hadoop.xz or similar), at
    which point the same call reads/writes .xz transparently."""
    writer = (
        df.select(F.col(text_col).alias("value"))
        .where(F.col("value").isNotNull())
        .write.option("maxRecordsPerFile", docs_per_file)
        .mode("overwrite")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def write_xz_text(
    df: DataFrame, text_col: str, path: str, docs_per_file: int = 10000
) -> list[str]:
    """S11: .txt.xz export without a cluster-side XZ codec jar.

    The reference round-trips `.txt.xz`/`.vert.xz` via Python lzma
    (base_pipeline.py:278-292, convert.py:156-159). Spark ships no XZ Hadoop
    codec, so this writer runs lzma inside ``mapInPandas``: each partition
    streams its rows into chunk files of <= ``docs_per_file`` docs named
    ``part-{partition}-{chunk}.txt.xz`` — partition-parallel, no driver
    loop, no full-partition buffering beyond one chunk. Returns the file
    list (also the return rows of the job, so callers can manifest it):
    the manifest is authoritative — it lists exactly the files whose tasks
    committed.

    DEPLOYMENT REQUIREMENT: ``path`` must be a filesystem shared between
    driver and executors (NFS/Lustre/a fuse-mounted bucket, or local mode).
    Tasks write with POSIX ``open()``; on an object-store-only cluster the
    chunks would land on executor-local disk where the driver can't read
    them — use ``write_batched_text`` with a Hadoop codec there instead.
    Each chunk is written to a ``.tmp`` name and atomically renamed on
    close, so a retried or speculatively-executed task overwrites its own
    chunks idempotently (same pid/chunk names) and never leaves a partial
    ``.txt.xz`` visible.
    """
    import os

    os.makedirs(path, exist_ok=True)

    def _write(batches):
        import lzma

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunk, n_in_chunk, files = 0, 0, []
        out, fname = None, None

        def _commit():
            nonlocal out, fname
            out.close()
            os.replace(fname + ".tmp", fname)  # atomic publish
            files.append(fname)
            out, fname = None, None

        try:
            for pdf_batch in batches:
                for text in pdf_batch[text_col]:
                    if text is None:
                        continue
                    if out is None:
                        fname = os.path.join(
                            path, f"part-{pid:05d}-{chunk:04d}.txt.xz"
                        )
                        out = lzma.open(fname + ".tmp", "wt", encoding="utf-8")
                    out.write(text + "\n")
                    n_in_chunk += 1
                    if n_in_chunk >= docs_per_file:
                        _commit()
                        n_in_chunk = 0
                        chunk += 1
            if out is not None:
                _commit()
        finally:
            if out is not None:  # exception path: leave the .tmp unpublished
                out.close()
        import pandas as pd

        yield pd.DataFrame({"file": files})

    return [
        r.file
        for r in df.select(text_col)
        .mapInPandas(_write, "file string")
        .collect()
    ]


def read_xz_text(spark, path: str) -> DataFrame:
    """S11 read side: .txt.xz files -> one row per line (column ``value``).

    Spark ships no XZ codec, so the decompression runs inside mapInPandas
    over the FILE LIST (one task per file — .xz is not splittable anyway,
    so this matches what a codec jar would give). Mirrors the reference's
    lzma read path (base_pipeline.py:278-292)."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(path, "*.xz")))
    fdf = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        max(len(files), 1)
    )

    def _read(batches):
        import lzma

        import pandas as pd

        for pdf in batches:
            for f in pdf["file"]:
                with lzma.open(f, "rt", encoding="utf-8") as fh:
                    yield pd.DataFrame({"value": fh.read().splitlines()})

    return fdf.mapInPandas(_read, "value string")
