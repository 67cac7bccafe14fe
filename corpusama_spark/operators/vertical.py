"""Vertical-file (.vert) ingest and CoNLL-U emit.

The reference round-trips corpora through Sketch-Engine vertical files: its
secondary pipeline re-reads an existing .vert line-by-line, collecting token
lines with the regex ``\\d+\\t(\\w+)`` (pipeline/stanza/
secondary_pipeline.py:186-189, F28), and its base pipeline writes
``<doc>``/``<s id="n">`` structure from CoNLL-U (base_pipeline.py:136-224,
S12). This module is the Spark-native version of both directions:

- ``read_vert``: a DISTRIBUTED vert reader — ``lineSep='</doc>'`` makes the
  Hadoop line reader split the file at document boundaries, so one record =
  one document and a 100 TB corpus of .vert shards parallelizes like any
  text scan (no whole-file reads, no driver loop).
- ``parse_vert``: (doc_id, sent_id, token_id, token) rows from a vert-doc
  string column — pure JVM splits/regexps, two explodes, no UDF.
- ``conllu_doc``: minimal 10-column CoNLL-U emit per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# token line of a TAGGED vertical/conllu block: "idx<TAB>word<TAB>..."
# (secondary_pipeline.py:186-189); word-only verticals have no index prefix
VERT_TOKEN_RE = r"^(\d+)\t(\S+)"

SENT_SPLIT = r"(?<=[.!?])\s+"


def read_vert(spark: SparkSession, path: str) -> DataFrame:
    """One row per `<doc>` block from .vert files (column ``vert``).

    ``lineSep='</doc>'`` is the scale trick: records are split at closing
    doc tags by the line reader itself, so files stay splittable and each
    task parses only its slice. Trailing whitespace-only records (after the
    last doc) are dropped.
    """
    raw = spark.read.option("lineSep", "</doc>").text(path)
    return raw.select(F.trim(F.col("value")).alias("vert")).where(
        F.col("vert").contains("<doc")
    )


def _block_tokens(block: Column) -> Column:
    """Token array of one `<s ...>` block: non-markup lines; tagged lines
    (`idx\\tword\\t...`) yield the word column, word-only lines pass as-is."""
    lines = F.filter(
        F.transform(F.split(block, r"\n"), lambda ln: F.trim(ln)),
        lambda ln: (F.length(ln) > 0) & ~ln.startswith("<"),
    )
    return F.transform(
        lines,
        lambda ln: F.when(
            ln.rlike(VERT_TOKEN_RE), F.regexp_extract(ln, VERT_TOKEN_RE, 2)
        ).otherwise(ln),
    )


def parse_vert(
    df: DataFrame, vert_col: str = "vert", doc_id_type: str = "string"
) -> DataFrame:
    """(doc_id, sent_id, token_id, token) rows from vert-doc strings.

    Sentence blocks are the substrings between `<s id="n">` and `</s>`;
    sent ids come from the tag (the writer renumbers from 0 per doc, W2),
    token ids renumber from 0 within the sentence. Everything is JVM
    split/regexp + two posexplodes — whole-stage codegen, no Python.
    """
    doc_id = F.regexp_extract(F.col(vert_col), r'<doc id="([^"]+)"', 1).cast(
        doc_id_type
    )
    blocks = F.filter(
        F.split(F.col(vert_col), r"</s>"), lambda b: b.contains('<s id="')
    )
    per_sent = df.select(
        doc_id.alias("doc_id"), F.explode(blocks).alias("_block")
    ).select(
        "doc_id",
        F.regexp_extract("_block", r'<s id="(\d+)">', 1).cast("long").alias(
            "sent_id"
        ),
        _block_tokens(F.col("_block")).alias("_toks"),
    )
    return per_sent.select(
        "doc_id",
        "sent_id",
        F.posexplode("_toks").alias("token_id", "token"),
    ).select("doc_id", "sent_id", F.col("token_id").cast("long"), "token")


def conllu_doc(
    doc_id: Column, text: Column, sent_split: str = SENT_SPLIT
) -> Column:
    """One minimal CoNLL-U document string (S12's missing half).

    Shape matches what the reference's `_conll_to_vert` consumes
    (base_pipeline.py:136-224): `# newdoc id = X`, per sentence
    `# sent_id = n` + `# text = ...`, then 10-column token lines
    (ID and FORM filled, the other eight `_`), blank line after each
    sentence. Token IDs are 1-based per the CoNLL-U spec; sentence ids
    renumber from 0 per document like the vert writer.
    """
    sentences = F.filter(
        F.transform(
            F.split(F.regexp_replace(text, r"\n", " "), sent_split),
            lambda s: F.trim(s),
        ),
        lambda s: F.length(s) > 0,
    )
    blocks = F.transform(
        sentences,
        lambda s, i: F.concat(
            F.lit("# sent_id = "),
            i.cast("string"),
            F.lit("\n# text = "),
            s,
            F.lit("\n"),
            F.array_join(
                F.transform(
                    F.filter(F.split(s, r"\s+"), lambda t: F.length(t) > 0),
                    lambda t, j: F.concat(
                        (j + 1).cast("string"),
                        F.lit("\t"),
                        t,
                        F.lit("\t_\t_\t_\t_\t_\t_\t_\t_"),
                    ),
                ),
                "\n",
            ),
            F.lit("\n"),
        ),
    )
    return F.concat(
        F.lit("# newdoc id = "),
        doc_id.cast("string"),
        F.lit("\n"),
        F.array_join(blocks, "\n"),
    )
