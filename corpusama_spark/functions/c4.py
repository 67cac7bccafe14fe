"""C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning…", §2.2 — public) as scan-stage Catalyst expressions.

The C4 pipeline is the other canonical heuristic web filter next to
Gopher (operators/textstats.py:gopher_rules): line-level retention
followed by page-level gates. Re-expressed here exactly:

line level (applied per newline-split line):
- keep only lines ending in a terminal punctuation mark;
- keep only lines with >= 5 words;
- drop any line containing the word "javascript" (case-insensitive).

page level (applied to the page, with sentences counted on the KEPT
lines):
- drop pages whose cleaned text has < 3 sentences;
- drop pages containing "lorem ipsum" (case-insensitive);
- drop pages containing a curly brace;
- drop pages containing any bad-list word.

Everything is array/regex expressions inside whole-stage codegen — one
scan, no UDF, no shuffle (the per-page verdict is a projection). The
bad-word check is `arrays_overlap` against a literal array, right for
list sizes up to a few thousand; for the full "List of Dirty Naughty
Obscene…" scale, broadcast-join a tokens explode against the list
instead (same shape as operators/urls.py blocklist_filter).

Reference tie-in: corpusama's own per-line cleaners (corpusama/util/
clean.py via functions/textrules.clean_lines) fold whitespace and drop
char classes; C4's rules are the page-level web analogue the
quality_filter tier needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_RE = '[.!?"]$'
SENTENCE_RE = "[.!?]"
DEFAULT_BADWORDS = ("badword1", "badword2")


def _line_ok(line: Column, min_words: int) -> Column:
    words = F.filter(
        F.split(F.trim(line), r"\s+"), lambda w: F.length(w) > 0
    )
    return (
        F.rtrim(line).rlike(TERMINAL_RE)
        & (F.size(words) >= F.lit(min_words))
        & ~F.lower(line).contains("javascript")
    )


def c4_kept_lines(text: Column, min_words: int = 5) -> Column:
    """Array of lines surviving C4's line-level rules."""
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    return F.filter(lines, lambda l: _line_ok(l, min_words))


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
    badwords: tuple[str, ...] = DEFAULT_BADWORDS,
) -> DataFrame:
    """All input columns plus (n_lines, n_lines_kept, n_sentences,
    cleaned, keep, drop_reason). ``cleaned`` is the kept lines re-joined
    with newlines (C4 emits exactly this). ``drop_reason`` reports the
    FIRST failing page gate in a fixed order (lorem_ipsum, brace,
    bad_word, too_few_sentences) or 'kept'."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, "\n")
    kept = c4_kept_lines(F.col(text_col), min_words)
    cleaned = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(cleaned, F.lit(SENTENCE_RE), 0))
    toks = F.filter(
        F.split(F.lower(text), r"\s+"), lambda w: F.length(w) > 0
    )
    has_bad = F.arrays_overlap(
        toks, F.array(*[F.lit(w) for w in badwords])
    )
    reason = (
        F.when(F.lower(text).contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(text.contains("{"), F.lit("brace"))
        .when(has_bad, F.lit("bad_word"))
        .when(n_sent < F.lit(min_sentences), F.lit("too_few_sentences"))
        .otherwise(F.lit("kept"))
    )
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn("n_sentences", n_sent)
        .withColumn("cleaned", cleaned)
        .withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason") == "kept")
    )
