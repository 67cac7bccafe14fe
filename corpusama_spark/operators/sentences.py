"""Sentence-level language annotation — the reference's secondary pipeline
(pipeline/stanza/secondary_pipeline.py:132-197,220-287; M3/A7 in SURVEY §2).

Reference semantics re-expressed relationally:
- captions split into sentences (the reference walks `<s>` blocks of a
  vertical file; here a punctuation split over the normalized caption);
- sentences under ``short`` tokens (default 4) are skipped (keep original
  annotation — NULL here);
- sentences of ``short <= tokens < long`` (default 500) get one model call;
- sentences of >= ``long`` tokens are chunked into ``long``-token slices,
  each chunk labeled, and the majority label wins
  (Counter.most_common()[0] :175-184 — ties pinned to lang-asc for
  determinism, the reference's tie order being dict-insertion-dependent).

Spark shape: posexplode sentences → explode token chunks (pure JVM slicing)
→ one model UDF pass over chunks → groupBy(sentence) majority via
max_by(struct) — chunk votes never leave the JVM unaggregated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corpusama_spark.functions.langid import predict_line

DEFAULT_SHORT = 4
DEFAULT_LONG = 500

SENT_SPLIT_RE = r"(?<=[.!?])\s+"

# the reference's language set for its split path (base_pipeline.py:46-50
# nltk_langs = {en: english, fr: french, es: spanish}); its NLTK punkt
# models are data-driven, so the engine re-expresses the load-bearing
# behaviors as rules: abbreviation-aware terminator splits per language,
# plus Spanish inverted-punctuation openers as boundaries.
NLTK_LANGS = {"en": "english", "fr": "french", "es": "spanish"}

ABBREVS = {
    "en": ["Mr", "Mrs", "Ms", "Dr", "Prof", "St", "Jr", "Sr", "vs", "etc"],
    "fr": ["M", "MM", "Mme", "Mlle", "Dr", "St", "etc"],
    "es": ["Sr", "Sra", "Srta", "Dr", "Dra", "Ud", "Uds", "etc"],
}

_ABBR_SENTINEL = "\x01"  # protects abbreviation dots through the split


def _lang_split_pattern(lang: str | None) -> str:
    if lang == "es":
        # also break before inverted question/exclamation openers
        return SENT_SPLIT_RE + r"|\s+(?=[¿¡])"
    return SENT_SPLIT_RE


def split_sentences(
    text_col: Column | str, lang: str | None = None
) -> Column:
    """Normalized text → array of sentences (M5: rule-based split;
    ``lang`` in {en, fr, es} enables the language-aware rules — 'Mr.' /
    'M.' / 'Sr.' don't end sentences, Spanish '¿¡' open them). Pure JVM:
    abbreviation dots are swapped to a sentinel, the split runs, the
    sentinel swaps back."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    one_line = F.regexp_replace(col, r"\n", " ")
    if lang in ABBREVS:
        pat = r"\b(" + "|".join(ABBREVS[lang]) + r")\."
        one_line = F.regexp_replace(one_line, pat, "$1" + _ABBR_SENTINEL)
    parts = F.split(one_line, _lang_split_pattern(lang))
    if lang in ABBREVS:
        parts = F.transform(
            parts, lambda s: F.regexp_replace(s, _ABBR_SENTINEL, ".")
        )
    return F.filter(
        F.transform(parts, lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )


def split_sentences_for(text_col: Column | str, lang_col: Column | str) -> Column:
    """Per-row language-aware split: a CASE chain over the supported
    language table, falling back to the language-agnostic rule — the shape
    for a mixed-language corpus where ``lang`` is a column, not a constant."""
    lc = F.col(lang_col) if isinstance(lang_col, str) else lang_col
    out = split_sentences(text_col, None)
    for lg in ABBREVS:
        out = F.when(lc == lg, split_sentences(text_col, lg)).otherwise(out)
    return out


def sentence_rows(
    df: DataFrame, id_col: str = "image_id", text_col: str = "caption_norm"
) -> DataFrame:
    """One row per (doc, sentence) with 0-based sent_id (W2 renumber)."""
    return df.select(
        F.col(id_col),
        F.posexplode(split_sentences(text_col)).alias("sent_id", "sentence"),
    )


def annotate_sentences(
    sentences: DataFrame,
    short: int = DEFAULT_SHORT,
    long: int = DEFAULT_LONG,
    id_col: str = "image_id",
) -> DataFrame:
    """(id, sent_id, sentence) → + sent_lang (NULL when under `short`).

    Chunking is pure JVM array slicing; only the chunk strings cross to the
    model UDF; the majority vote is a JVM aggregation of (count, lang)
    structs — `max_by`-style with deterministic ties.
    """
    toks = F.filter(
        F.split(F.trim(F.col("sentence")), r"\s+"), lambda t: F.length(t) > 0
    )
    with_toks = sentences.withColumn("_toks", toks).withColumn(
        "_nt", F.size("_toks")
    )
    eligible = with_toks.where(F.col("_nt") >= short)
    # chunks of `long` tokens: sentences under `long` yield exactly one chunk
    chunked = eligible.select(
        id_col,
        "sent_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.floor((F.col("_nt") - 1) / F.lit(long)).cast("int")
                ),
                lambda c: F.array_join(
                    F.slice(F.col("_toks"), c * long + 1, long), " "
                ),
            )
        ).alias("chunk"),
    )
    voted = (
        chunked.withColumn("_pred", predict_line("chunk"))
        .groupBy(id_col, "sent_id", F.col("_pred.lang").alias("lang"))
        .agg(F.count("*").alias("votes"))
        .groupBy(id_col, "sent_id")
        .agg(
            # most votes, ties lang-asc: min_by over (-votes, lang)
            F.min_by(
                "lang", F.struct((-F.col("votes")).alias("nv"), F.col("lang"))
            ).alias("sent_lang")
        )
    )
    return sentences.join(voted, [id_col, "sent_id"], "left")
