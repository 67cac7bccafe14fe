"""Distributed BPE merge-rule training (Sennrich, Haddow & Birch 2016).

Token counting over a learned subword vocabulary is a first-class
curation primitive (shard packing, token budgets, tokenizer drift
audits all consume it — operators/textstats.py counts with a FIXED
BPE-ish regex). This module learns the merge table itself, the way the
original subword-nmt does: start from characters + an end-of-word
marker, repeatedly merge the most frequent adjacent symbol pair. Each
round is pure relational algebra over the WORD-FREQUENCY table, never
the corpus:

- the corpus collapses ONCE to (word, count) — the only corpus-sized
  groupBy; at 10^12 rows the distinct-word table is Zipf-bounded
  (~10⁷ rows), so every merge round runs on megabytes;
- pair counting per round is one split + adjacent-zip explode + one
  map-side-combinable sum over that word table;
- the argmax pair (count desc, then lexicographic — the deterministic
  tie-break subword-nmt leaves to dict order) is a 1-row collect;
- applying a merge is a space-bounded regexp_replace run TWICE — the
  two-pass contract below.

MERGE-APPLICATION CONTRACT: occurrences are replaced leftmost
non-overlapping with the scan resuming after each match, then the pass
is repeated once (a second pass catches occurrences whose leading
space the first pass consumed, e.g. ``a a a a`` → pass 1 ``aa a a`` →
pass 2 ``aa aa``). For runs of ≥6 identical symbols this yields a
maximal non-overlapping pairing that can differ from subword-nmt's
strict leftmost-greedy (``aa a aa a`` vs ``aa aa aa`` on a 6-run) —
pinned here because BOTH Java regex and RE2 (DuckDB) implement exactly
this replace semantics, so the whole training trajectory is
cross-engine exact; ≥6-runs of one character inside a single word are
lexicon noise. Words are restricted to ``^[a-z0-9]+$`` so symbols are
always regex- and replacement-literal-safe.

Reference seam: corpusama tokenizes with external tools (vert files,
corpusama/corpus/tagset.py); this is the learned-subword analogue the
LLM lane needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_word_counts", "bpe_train", "bpe_apply"]

EOW = "</w>"


def bpe_word_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, wc) over lowercased whitespace tokens matching
    ``[a-z0-9]+`` — the one corpus-sized pass; everything downstream
    runs on this Zipf-bounded table."""
    toks = F.explode(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    ).alias("w")
    return (
        df.select(toks)
        .where(F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )


def _apply_merge(sym: F.Column, left: str, right: str) -> F.Column:
    pat = f" {left} {right} "
    rep = f" {left}{right} "
    padded = F.concat(F.lit(" "), sym, F.lit(" "))
    once = F.regexp_replace(padded, pat, rep)
    return F.trim(F.regexp_replace(once, pat, rep))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules; returns
    [(rank, left, right, pair_count), ...] in learning order. Stops
    early only if the symbol stream runs out of adjacent pairs."""
    words = bpe_word_counts(df, text_col)
    sym0 = F.concat(
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")),
        F.lit(" " + EOW),
    )
    cur = words.select("wc", sym0.alias("s")).persist()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, int(n_merges) + 1):
        arr = F.split(F.col("s"), " ")
        pairs = cur.select(
            "wc",
            F.explode(
                F.arrays_zip(
                    F.slice(
                        arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))
                    ).alias("p1"),
                    F.slice(
                        arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))
                    ).alias("p2"),
                )
            ).alias("z"),
        ).select("wc", F.col("z.p1").alias("p1"), F.col("z.p2").alias("p2"))
        top = (
            pairs.groupBy("p1", "p2")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.desc("cnt"), "p1", "p2")
            .limit(1)
            .collect()
        )
        if not top:
            break
        t = top[0]
        merges.append((rank, t.p1, t.p2, int(t.cnt)))
        nxt = cur.select(
            "wc", _apply_merge(F.col("s"), t.p1, t.p2).alias("s")
        ).persist()
        nxt.count()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """``df`` plus the learned-subword token count per row: each
    ``[a-z0-9]+`` word is symbolized and every merge rule is applied in
    learning order (the standard BPE encode), then tokens are counted.
    One scan-stage expression chain — |merges| regexp passes over each
    row, no Python, no joins."""
    word = F.explode(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    )
    # per-row fast path: apply to the whole text's word stream at once
    # would cross word boundaries, so encode per word then re-aggregate.
    base = df.select(
        F.monotonically_increasing_id().alias("_rid"), "*"
    )
    wtab = base.select("_rid", word.alias("w")).where(
        F.col("w").rlike("^[a-z0-9]+$")
    )
    sym = F.concat(
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")),
        F.lit(" " + EOW),
    )
    enc = sym
    for _, left, right, _cnt in merges:
        enc = _apply_merge(enc, left, right)
    counts = (
        wtab.select("_rid", F.size(F.split(enc, " ")).alias("ntok"))
        .groupBy("_rid")
        .agg(F.sum("ntok").alias(out_col))
    )
    return base.join(counts, "_rid", "left").drop("_rid")
