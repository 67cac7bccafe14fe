"""Obfuscation-folded lexicon gate (X241).

Toxicity/profanity lexicon filters are a standard web-corpus gate (the
C4 "bad words" filter is the public reference shape), and the first
thing spam does is leet-fold past them: "b4dw0rd" sails through a naive
token match. This module folds the common digit/symbol substitutions
BEFORE matching and reports which hits only exist post-fold — the
obfuscated share a naive filter structurally misses.

Everything is scan-stage JVM (lower → translate → split → broadcast
lexicon join): the fold map and tokenizer are engine-portable (DuckDB
has the same `translate`), so the whole gate is DuckDB-oracle-exact.
The repo ships NO slur list — callers supply their lexicon as a
DataFrame (term, severity); tests and the contract query use abstract
placeholder terms, keeping the mechanism real and the repo clean.

Design notes:
- fold map: 4→a 3→e 1→i 0→o 5→s 7→t $→s @→a. '!' is deliberately NOT
  folded to 'i': trailing exclamations ("badword!!!") would glue onto
  the token ("badwordii") and create false NEGATIVES — worse than the
  mid-word '!' wins. Mid-word '!' obfuscation is instead covered by
  splitting on unmapped symbols ("f!lthy" → "f","lthy"… no: '!' splits;
  see the docstring test) — an accepted, documented miss.
- tokens: split the FOLDED lowercase text on runs of anything outside
  [a-z0-9]; matching is exact-term (no stemming — lexicon owns variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fold_obfuscation", "lexicon_hits", "lexicon_gate"]

_FOLD_FROM = "43105 7$@".replace(" ", "")  # 4 3 1 0 5 7 $ @
_FOLD_TO = "aeiost sa".replace(" ", "")


def fold_obfuscation(col):
    """Lowercase + leet-fold a string column (see module docstring for
    the map and the deliberate '!' exclusion)."""
    return F.translate(F.lower(col), _FOLD_FROM, _FOLD_TO)


def _tokens(col):
    return F.filter(
        F.split(col, "[^a-z0-9]+"), lambda t: F.length(t) > 0
    )


def lexicon_hits(
    df: DataFrame,
    lexicon: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc lexicon report: (id, n_hits, n_obfuscated, max_severity,
    terms). ``lexicon`` is (term, severity:int) with terms already
    lowercase-folded. A hit is a FOLDED token equal to a term;
    n_obfuscated counts hits whose raw (lowercased) token differed from
    the folded one — the naive-filter misses. Docs with no hits appear
    with zeros (left join), so the output is a complete gate input.

    Scale shape: token explode stays in the scan stage, the lexicon
    (thousands of terms) broadcasts, and only MATCHING (id, token) rows
    reach the per-id count — the ngram_contamination join shape.
    """
    raw_toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(raw_toks).alias("raw"),
    ).select(
        "id",
        "raw",
        F.explode(_tokens(fold_obfuscation(F.col("raw")))).alias("tok"),
    )
    lex = F.broadcast(
        lexicon.select(
            F.col("term").alias("tok"), F.col("severity").cast("int").alias("sev")
        )
    )
    # obfuscated = the term does NOT appear in the raw token's own
    # unfolded segmentation — "spamterm!!!" is punctuation, not
    # obfuscation; "b4dw0rd" only matches after the fold
    hits = toks.join(lex, "tok").select(
        "id",
        "tok",
        "sev",
        (~F.array_contains(_tokens(F.col("raw")), F.col("tok")))
        .cast("int")
        .alias("obf"),
    )
    per_doc = hits.groupBy("id").agg(
        F.count("*").cast("long").alias("n_hits"),
        F.sum("obf").cast("long").alias("n_obfuscated"),
        F.max("sev").alias("max_severity"),
        F.array_join(F.array_sort(F.collect_set("tok")), ",").alias("terms"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce("n_obfuscated", F.lit(0)).cast("long").alias("n_obfuscated"),
            F.coalesce("max_severity", F.lit(0)).alias("max_severity"),
            F.coalesce("terms", F.lit("")).alias("terms"),
        )
    )


def lexicon_gate(
    df: DataFrame,
    lexicon: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hits: int = 0,
    max_severity: int = 0,
) -> DataFrame:
    """lexicon_hits + keep: drop when hits exceed ``max_hits`` OR any
    hit's severity exceeds ``max_severity`` (defaults: zero tolerance,
    the C4 convention)."""
    rep = lexicon_hits(df, lexicon, text_col, id_col)
    return rep.select(
        "*",
        (
            (F.col("n_hits") <= max_hits)
            & (F.col("max_severity") <= max_severity)
        ).alias("keep"),
    )
