"""Distributed n-gram language-model training + relational perplexity.

The reference scores text with a PRE-TRAINED model column (Stanza slot,
corpusama pipeline docs; re-expressed in functions/perplexity.py as a
char-bigram LM inside an Arrow UDF). This module closes the other half of
the KenLM story the north_star names: TRAIN the n-gram model ON the
corpus as a distributed aggregation, then score documents by JOINING
their n-grams against the model table — no model weights ever leave the
cluster, no UDF anywhere, and (because every step is relational) the
whole train+score round trip is DuckDB-oracle-checkable, which upgrades
perplexity evidence from rows-only to value-exact.

Model: word-bigram with add-k smoothing (Chen & Goodman 1999, public):

    P(w2 | w1) = (C(w1,w2) + k) / (C(w1,*) + k * V)

Scale shape (10^12 rows):

- training is two groupBy counts — map-side partial aggregation makes the
  shuffle carry one row per DISTINCT bigram per partition, not per token;
- scoring joins doc bigrams to the model on (w1, w2). Zipf skew means a
  handful of bigrams ("of the") dominate: the model's heavy head fits in
  a broadcast (``broadcast_model=True``, default) so the hot keys never
  shuffle; at vocabularies past broadcast size the same plan runs as a
  sort-merge join and AQE's skew-join split handles the head;
- the per-doc logprob sum is a doc_id groupBy — same exchange the
  downstream per-doc filter consumes.

Smoothing floor: bigrams absent from the model (scoring fresh text) get
C=0 and C(w1,*)=0 via left joins + coalesce — the add-k floor keeps the
probability finite, matching the closed-vocabulary convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text_col: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(F.coalesce(text_col, F.lit("")))), r"\s+"),
        lambda w: F.length(w) > 0,
    )


def _doc_bigrams(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, w1, w2) — one row per bigram OCCURRENCE, exploded scan-stage."""
    words = _words(F.col(text_col))
    pairs = F.arrays_zip(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))).alias("w1"),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))).alias("w2"),
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(pairs).alias("p")
    ).select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def train_bigram_lm(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram_counts, context_counts, vocab_size) from the corpus.

    bigram_counts: (w1, w2, c) — occurrences of each bigram;
    context_counts: (w1, ctx) — occurrences of w1 as a bigram left side,
    computed as sum_w2 c(w1, w2) FROM bigram_counts (exactly equal), so
    the corpus is exploded once for both tables — re-aggregating the
    vocabulary²-bounded count table costs nothing next to a second
    10^12-row scan;
    vocab_size: one row (v) — distinct tokens corpus-wide, kept as a
    DataFrame so the scorer composes it lazily (no driver collect). This
    is a genuine second (unigram) pass: single-token documents contribute
    vocabulary but no bigram, so V cannot be derived from bigram_counts.
    """
    bg = _doc_bigrams(docs, id_col, text_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    context_counts = bigram_counts.groupBy("w1").agg(
        F.sum("c").alias("ctx")
    )
    vocab_size = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    return bigram_counts, context_counts, vocab_size


def score_perplexity(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, n_bigrams, ppl): per-document add-k bigram perplexity
    exp(-mean log P(w2|w1)). Documents with fewer than 2 tokens have no
    bigrams and produce no row (nothing to score). ``broadcast_model``
    broadcasts the count tables — right for the pruned/headline model; at
    full web vocabulary switch it off and let AQE handle the Zipf head.
    """
    hint = F.broadcast if broadcast_model else (lambda d: d)
    bg = _doc_bigrams(docs, id_col, text_col)
    j = (
        bg.join(hint(bigram_counts), ["w1", "w2"], "left")
        .join(hint(context_counts), ["w1"], "left")
        .crossJoin(hint(vocab_size))
    )
    logp = F.log(
        (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(k))
        / (
            F.coalesce(F.col("ctx"), F.lit(0)).cast("double")
            + F.lit(k) * F.col("v").cast("double")
        )
    )
    return (
        j.groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.exp(-F.sum(logp) / F.count("*")), 6).alias("ppl"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "ppl")
    )


def corpus_perplexity(
    docs: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Train on the corpus, score the corpus — the CCNet-style self-score
    (Wenzek et al. 2020 train on reference corpus, score candidates; here
    both are the input, the composition callers use to bucket docs by
    in-domain-ness). One lazy plan end to end."""
    bigram_counts, context_counts, vocab_size = train_bigram_lm(
        docs, id_col, text_col
    )
    return score_perplexity(
        docs,
        bigram_counts,
        context_counts,
        vocab_size,
        k=k,
        id_col=id_col,
        text_col=text_col,
        broadcast_model=broadcast_model,
    )


# ---------------------------------------------------------------------------
# Stupid backoff (Brants et al. 2007, "Large Language Models in Machine
# Translation" — the canonical distributed n-gram LM, built for exactly this
# kind of cluster counting; public). Score, not probability:
#
#   S(w3|w1,w2) = c(w1,w2,w3)/c(w1,w2)          if the trigram was seen
#               = a * c(w2,w3)/c(w2)            elif the bigram was seen
#               = a^2 * c(w3)/N                 otherwise  (a = 0.4)
#
# Everything is counts + joins: training is three n-gram count passes
# (lower orders are NOT derivable from the trigram table — a doc's tail
# bigram/unigrams prefix no trigram; see train_stupid_backoff), scoring is
# left joins against broadcast count tables and a CASE — the 10^12-row
# shape Brants et al. ran on MapReduce, as Catalyst relations.
# ---------------------------------------------------------------------------


def _doc_trigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, w3) — one row per trigram occurrence, scan-stage."""
    words = _words(F.col(text_col))
    n = F.greatest(F.size(words) - 2, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(words, 1, n).alias("w1"),
        F.slice(words, 2, n).alias("w2"),
        F.slice(words, 3, n).alias("w3"),
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(pairs).alias("p")
    ).select(
        "id",
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
        F.col("p.w3").alias("w3"),
    )


def train_stupid_backoff(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(tri, bi, uni, total): count tables for stupid-backoff scoring.

    tri (w1,w2,w3,c3) aggregates the one exploded trigram pass; bi and uni
    are separate n-gram passes (a doc's last bigram / last two unigrams
    are not the prefix of any trigram, so they CANNOT be derived from the
    trigram table — correctness over the one-pass trick here, unlike the
    exact bigram-marginal derivation in train_bigram_lm). total is one
    row (n) = corpus token count, composed lazily."""
    tri = (
        _doc_trigrams(docs, id_col, text_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c3"))
    )
    bi = (
        _doc_bigrams(docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    uni = (
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    total = uni.agg(F.sum("c1").cast("double").alias("n"))
    return tri, bi, uni, total


def score_stupid_backoff(
    docs: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
    total: DataFrame,
    alpha: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, n_trigrams, sb_logscore): per-document mean ln(S) over its
    trigrams under stupid backoff. Documents with fewer than 3 tokens
    have no trigram and produce no row. S is a score, not a probability
    (Brants et al. use it unnormalized on purpose — at web scale the
    normalization constant buys nothing for ranking).

    Held-out caveat: a final token absent from the training vocabulary
    makes S=0 for that trigram, and Spark's ln(0) is NULL, which avg()
    skips — when scoring text the model was not trained on, prune OOV
    tokens first or treat missing trigram rows as floor evidence. The
    self-score composition (corpus_stupid_backoff) can never hit this."""
    hint = F.broadcast if broadcast_model else (lambda d: d)
    tg = _doc_trigrams(docs, id_col, text_col)
    j = (
        tg.join(hint(tri), ["w1", "w2", "w3"], "left")
        .join(
            hint(bi.select(F.col("w1"), F.col("w2"), F.col("c2"))),
            ["w1", "w2"],
            "left",
        )
        .join(
            hint(
                bi.select(
                    F.col("w1").alias("w2"),
                    F.col("w2").alias("w3"),
                    F.col("c2").alias("c2_back"),
                )
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            hint(uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1_mid"))),
            ["w2"],
            "left",
        )
        .join(
            hint(uni.select(F.col("w").alias("w3"), F.col("c1").alias("c1_last"))),
            ["w3"],
            "left",
        )
        .crossJoin(hint(total))
    )
    c3 = F.coalesce(F.col("c3"), F.lit(0)).cast("double")
    c2 = F.coalesce(F.col("c2"), F.lit(0)).cast("double")
    c2b = F.coalesce(F.col("c2_back"), F.lit(0)).cast("double")
    c1m = F.coalesce(F.col("c1_mid"), F.lit(0)).cast("double")
    c1l = F.coalesce(F.col("c1_last"), F.lit(0)).cast("double")
    score = (
        F.when(c3 > 0, c3 / c2)
        .when(c2b > 0, F.lit(alpha) * c2b / c1m)
        .otherwise(F.lit(alpha * alpha) * c1l / F.col("n"))
    )
    return (
        j.groupBy("id")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.round(F.avg(F.log(score)), 6).alias("sb_logscore"),
        )
        .select(F.col("id").alias(id_col), "n_trigrams", "sb_logscore")
    )


def corpus_stupid_backoff(
    docs: DataFrame,
    alpha: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Train on the corpus, score the corpus — one lazy plan (the same
    self-score composition as corpus_perplexity)."""
    tri, bi, uni, total = train_stupid_backoff(docs, id_col, text_col)
    return score_stupid_backoff(
        docs, tri, bi, uni, total,
        alpha=alpha, id_col=id_col, text_col=text_col,
        broadcast_model=broadcast_model,
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney (Kneser & Ney 1995; Chen & Goodman 1999 §3 —
# the smoothing KenLM actually ships as its default, which is what the
# north_star's "KenLM-style perplexity scoring" names). Bigram form:
#
#   P(w2|w1) = max(c(w1,w2) - D, 0) / c(w1,.)
#            + D * N1+(w1,.) / c(w1,.) * Pcont(w2)
#   Pcont(w2) = N1+(.,w2) / N1+(.,.)
#
# with the discount estimated from counts-of-counts the way KenLM's
# lmplz does (Chen & Goodman eq. 26): D = n1 / (n1 + 2 * n2), where n_k
# is the number of bigram TYPES seen exactly k times.
#
# The key property making this cheap at 10^12 rows: every statistic —
# continuation counts N1+, the type total, the counts-of-counts n1/n2 —
# is derivable from the ONE bigram-count table (each of its rows IS a
# distinct type), so training explodes the corpus exactly once and then
# re-aggregates a vocabulary²-bounded table three ways. Scoring is the
# same broadcast-join shape as the add-k scorer above.
# ---------------------------------------------------------------------------


def train_kneser_ney(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(bigram_counts, ctx, cont, stats) for interpolated-KN scoring.

    bigram_counts: (w1, w2, c); ctx: (w1, ctx, fwd) with ctx = c(w1,.)
    and fwd = N1+(w1,.) (distinct continuations — count(*) over the type
    table); cont: (w2, rev) with rev = N1+(.,w2); stats: ONE row
    (t, n1, n2) = total bigram types + counts-of-counts, composed lazily
    (no driver collect). All four derive from one corpus explode."""
    bg = _doc_bigrams(docs, id_col, text_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    ctx = bigram_counts.groupBy("w1").agg(
        F.sum("c").alias("ctx"), F.count("*").alias("fwd")
    )
    cont = bigram_counts.groupBy("w2").agg(F.count("*").alias("rev"))
    stats = bigram_counts.agg(
        F.count("*").cast("double").alias("t"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("double")
        .alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("double")
        .alias("n2"),
    )
    return bigram_counts, ctx, cont, stats


def score_kneser_ney(
    docs: DataFrame,
    bigram_counts: DataFrame,
    ctx: DataFrame,
    cont: DataFrame,
    stats: DataFrame,
    discount: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, n_bigrams, kn_ppl): per-document interpolated-KN perplexity
    exp(-mean ln P). ``discount=None`` (default) estimates D from the
    counts-of-counts in ``stats`` (KenLM's lmplz behavior); pass a float
    to pin it. Documents with <2 tokens have no bigram → no row.

    Held-out semantics: an unseen context (c(w1,.)=0) backs off entirely
    to the continuation distribution Pcont(w2); a word unseen even as a
    continuation gets the 1/t floor so ln() stays finite. The self-score
    composition (corpus_kneser_ney) never leaves the first branch."""
    hint = F.broadcast if broadcast_model else (lambda d: d)
    bg = _doc_bigrams(docs, id_col, text_col)
    j = (
        bg.join(hint(bigram_counts), ["w1", "w2"], "left")
        .join(hint(ctx), ["w1"], "left")
        .join(hint(cont), ["w2"], "left")
        .crossJoin(hint(stats))
    )
    if discount is None:
        d = F.when(
            F.col("n1") + F.lit(2.0) * F.col("n2") > 0,
            F.col("n1") / (F.col("n1") + F.lit(2.0) * F.col("n2")),
        ).otherwise(F.lit(0.5))
    else:
        d = F.lit(float(discount))
    c = F.coalesce(F.col("c"), F.lit(0)).cast("double")
    ctxv = F.coalesce(F.col("ctx"), F.lit(0)).cast("double")
    fwd = F.coalesce(F.col("fwd"), F.lit(0)).cast("double")
    rev = F.coalesce(F.col("rev"), F.lit(0)).cast("double")
    pcont = rev / F.col("t")
    p = F.when(
        ctxv > 0,
        (F.greatest(c - d, F.lit(0.0)) + d * fwd * pcont) / ctxv,
    ).otherwise(F.when(pcont > 0, pcont).otherwise(F.lit(1.0) / F.col("t")))
    return (
        j.groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.exp(-F.sum(F.log(p)) / F.count("*")), 6).alias(
                "kn_ppl"
            ),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "kn_ppl")
    )


def corpus_kneser_ney(
    docs: DataFrame,
    discount: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Train interpolated KN on the corpus, score the corpus — one lazy
    plan (the CCNet self-score composition, now under the smoothing the
    north_star actually names)."""
    bigram_counts, ctx, cont, stats = train_kneser_ney(
        docs, id_col, text_col
    )
    return score_kneser_ney(
        docs, bigram_counts, ctx, cont, stats,
        discount=discount, id_col=id_col, text_col=text_col,
        broadcast_model=broadcast_model,
    )
