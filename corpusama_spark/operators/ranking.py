"""BM25 document ranking against a small query-term set.

The retrieval-side companion to the keyword/collocation family
(colloc.py): score every document against a query by Okapi BM25
(Robertson & Zaragoza 2009), the default lexical ranker in Lucene — in a
training-data pipeline this is how benchmark-adjacent or topic-targeted
documents get surfaced/filtered at corpus scale (e.g. quality-boosting a
topical slice, or locating eval-set near-matches that n-gram
decontamination's exact matching misses).

Scale shape (10^12 docs):

- tokens explode in the scan stage and are IMMEDIATELY semi-filtered by
  the broadcast query-term set, so the (doc, term) tf table is
  |q|-bounded per doc, not vocabulary-bounded;
- document length is a scan-stage expression on the SAME pass (no second
  scan, no separate explode);
- df/N/avgdl are one tiny term-level aggregate and one single-row global
  aggregate, broadcast back (the colloc.py/lm.py marginal-join pattern);
- the final score is one groupBy(doc) over ≤|q| rows per doc.

Everything is pure JVM expressions (log/round included) — DuckDB-oracle
exact at 6 decimals, the topk_cosine float-stability precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, score, n_hit) for every document with at least one query term,
    descending-ranked by Okapi BM25 with Lucene's non-negative idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``. N and avgdl count every doc
    with non-empty text (standard corpus statistics, not just hits).
    Scores round to 6 decimals; ties are deterministic via id ordering in
    downstream consumers."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )
    base = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), toks.alias("toks"))
        .where(F.size("toks") > 0)
    )
    # dl rides the same projection; the explode is query-filtered in the
    # scan stage so at most |q| distinct terms survive per doc
    tf = (
        base.select("id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .where(F.col("term").isin(*terms))
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(F.countDistinct("id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.round(F.sum("part"), 6).alias("score"),
            F.count("*").alias("n_hit"),
        )
        .select(F.col("id").alias(id_col), "score", "n_hit")
    )
