"""Blocked edit-distance near-duplicate pairs (record-linkage style).

MinHash/SimHash (operators/dedup.py) catch near-duplicates that share
SHINGLES — they miss short texts that differ by a few character edits
(OCR noise, typo'd re-posts, template fills), where the right metric is
Levenshtein distance. Computing it all-pairs is O(n²); the classical
record-linkage answer (Fellegi-Sunter blocking, public) is: cheap BLOCK
keys gather plausible candidates, the expensive exact verify runs only
inside blocks.

Blocking here is two-pass — normalized PREFIX and normalized SUFFIX —
because a single leading edit evicts a pair from the prefix block but
not the suffix block (and vice versa); a pair is missed only if edits
hit BOTH ends. Candidates from the two passes are unioned and de-duped
BEFORE the Levenshtein verify so no pair is scored twice. Both the
length prefilter (|len_a − len_b| ≤ k, a Levenshtein lower bound) and
the verify run JVM-side (Spark's built-in ``levenshtein``) — no Python
anywhere.

Scale shape (10^12 rows): block self-joins are equi-joins on the block
key; ``max_block`` drops flood blocks (empty/boilerplate pileups — the
same guard every LSH family here uses) so no block goes quadratic;
dropped-block members still meet via their other key. The union+distinct
is keyed by (id_a, id_b) — pair-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_near_pairs"]


def edit_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 3,
    prefix_len: int = 8,
    max_block: int = 200,
) -> DataFrame:
    """(id_a, id_b, dist, sim) for candidate pairs with Levenshtein
    distance ≤ ``max_dist`` on the whitespace-normalized lowercased
    text; ``sim`` = 1 − dist / max(len_a, len_b). id_a < id_b, each
    pair once. See module docstring for the blocking design."""
    max_dist = int(max_dist)
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        )
    )
    base = df.select(
        F.col(id_col).alias("id"), norm.alias("t")
    ).where(F.length("t") > 0)
    keyed = base.select(
        "id",
        "t",
        F.length("t").alias("ln"),
        F.substring("t", 1, prefix_len).alias("pk"),
        F.substring(F.reverse(F.col("t")), 1, prefix_len).alias("sk"),
    )

    def _block(key: str) -> DataFrame:
        side = keyed.select(F.col(key).alias("bk"), "id", "t", "ln")
        ok = (
            side.groupBy("bk")
            .agg(F.count("*").alias("_c"))
            .where(F.col("_c") <= max_block)
            .select("bk")
        )
        side = side.join(ok, "bk")
        a = side.select(
            "bk",
            F.col("id").alias("id_a"),
            F.col("t").alias("t_a"),
            F.col("ln").alias("ln_a"),
        )
        b = side.select(
            "bk",
            F.col("id").alias("id_b"),
            F.col("t").alias("t_b"),
            F.col("ln").alias("ln_b"),
        )
        return a.join(b, "bk").where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(F.col("ln_a") - F.col("ln_b")) <= max_dist
            )
        )

    cands = (
        _block("pk")
        .unionByName(_block("sk"))
        .dropDuplicates(["id_a", "id_b"])
    )
    d = F.levenshtein("t_a", "t_b")
    return (
        cands.select(
            "id_a",
            "id_b",
            d.alias("dist"),
            F.round(
                1.0
                - d / F.greatest(F.col("ln_a"), F.col("ln_b")).cast("double"),
                6,
            ).alias("sim"),
        )
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"), "sim")
    )
