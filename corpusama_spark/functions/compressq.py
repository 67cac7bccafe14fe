"""Compression-ratio text quality signal (zlib, Arrow-batched).

How well a document compresses is a one-number proxy for repetition and
entropy: boilerplate, keyword-stuffed spam and template floods compress
extremely well (ratio → 0), while binary-ish noise and mojibake barely
compress (ratio → 1); natural prose sits in a stable band. Several
public web-corpus pipelines gate on exactly this signal (e.g. content-
defined quality filters in CCNet-descendant stacks) because it needs no
model and no language knowledge.

This is a genuinely non-relational function (DEFLATE), so it is the
slow-path done right: a SCALAR pandas UDF over Arrow batches — bytes
stay in NumPy/C between rows, one Python call per few-thousand-row
batch, never per row. zlib with a FIXED level is deterministic (same
input → same output bytes on any platform; zlib's format + strategy are
fully specified), so runs agree — but there is no DuckDB twin, hence
this family is contract-tested rows-only with an in-process pytest
parity oracle (tests compute zlib directly on the driver).

Scale shape: scan-stage column → column; no shuffle, no state. The
UDF's cost is O(bytes) per row — the same pass any quality gate already
pays to read the text.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["compress_ratio", "compression_gate", "ncd_pairs"]

_LEVEL = 6  # zlib default; FIXED so the signal is reproducible


@pandas_udf("struct<n_bytes: long, n_comp: long>")
def _comp_sizes(texts: pd.Series) -> pd.DataFrame:
    raw = texts.fillna("").str.encode("utf-8")
    n_bytes = raw.str.len().astype("int64")
    n_comp = raw.map(lambda b: len(zlib.compress(b, _LEVEL))).astype("int64")
    return pd.DataFrame({"n_bytes": n_bytes, "n_comp": n_comp})


def compress_ratio(text_col: Column) -> Column:
    """struct(n_bytes, n_comp) for the UTF-8 encoding of the column;
    ratio = n_comp / n_bytes is computed relationally on top so the
    Python boundary ships two integers per row, nothing float."""
    return _comp_sizes(text_col)


def compression_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lo: float = 0.25,
    hi: float = 0.95,
) -> DataFrame:
    """(id, n_bytes, n_comp, ratio, keep): keep iff the compression
    ratio lies in [lo, hi] — below lo is repetition/boilerplate, above
    hi is high-entropy noise. Empty texts are dropped (ratio undefined),
    explicitly, not NaN'd."""
    sized = df.select(
        F.col(id_col),
        compress_ratio(F.col(text_col)).alias("_c"),
    ).select(
        id_col,
        F.col("_c.n_bytes").alias("n_bytes"),
        F.col("_c.n_comp").alias("n_comp"),
    )
    ratio = F.round(F.col("n_comp") / F.col("n_bytes"), 6)
    return sized.where(F.col("n_bytes") > 0).select(
        id_col,
        "n_bytes",
        "n_comp",
        ratio.alias("ratio"),
        ((ratio >= lo) & (ratio <= hi)).alias("keep"),
    )


@pandas_udf("struct<c_a: long, c_b: long, c_ab: long>")
def _pair_sizes(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    ra = a.fillna("").str.encode("utf-8")
    rb = b.fillna("").str.encode("utf-8")
    return pd.DataFrame(
        {
            "c_a": ra.map(lambda x: len(zlib.compress(x, _LEVEL))),
            "c_b": rb.map(lambda x: len(zlib.compress(x, _LEVEL))),
            "c_ab": [
                len(zlib.compress(x + y, _LEVEL)) for x, y in zip(ra, rb)
            ],
        }
    ).astype("int64")


def ncd_pairs(
    pairs: DataFrame,
    a_col: str = "text_a",
    b_col: str = "text_b",
    threshold: float = 0.5,
) -> DataFrame:
    """Normalized compression distance over candidate pairs (X225;
    Cilibrasi & Vitányi 2005, "Clustering by Compression"):

        NCD(x, y) = (C(xy) − min(C(x), C(y))) / max(C(x), C(y))

    with C = zlib-compressed size at a FIXED level. The parameter-free
    similarity: no tokenizer, no shingles, no language assumption —
    near-duplicates compress together (the second copy costs almost
    nothing), so NCD ≈ 0; unrelated texts share no model, NCD → 1. The
    right verify tier for pairs where token-level measures mislead
    (code, numbers, CJK without segmentation, template floods).

    CANDIDATE-PAIRS-ONLY by design — like jaccard_pairs (X4), it runs
    on the flood-guarded output of a banding family (minhash/simhash/
    phash), never all-pairs; the pair join upstream is what ships the
    two texts to one row. zlib at a fixed level is bit-deterministic on
    any platform, but DEFLATE is not SQL — rows-only contract with an
    in-process zlib pytest oracle (the compress_ratio precedent).
    Concatenation order is a_col||b_col (zlib NCD is asymmetric by a
    few bytes; fix the order, as published implementations do).

    Output: input columns + c_a, c_b, c_ab, ncd (6 dp), near_dup.
    """
    sized = pairs.withColumn(
        "_s", _pair_sizes(F.col(a_col), F.col(b_col))
    ).select(
        "*",
        F.col("_s.c_a").alias("c_a"),
        F.col("_s.c_b").alias("c_b"),
        F.col("_s.c_ab").alias("c_ab"),
    ).drop("_s")
    ncd = F.round(
        (F.col("c_ab") - F.least("c_a", "c_b"))
        / F.greatest("c_a", "c_b").cast("double"),
        6,
    )
    return sized.select(
        "*",
        ncd.alias("ncd"),
        (ncd <= F.lit(float(threshold))).alias("near_dup"),
    )
