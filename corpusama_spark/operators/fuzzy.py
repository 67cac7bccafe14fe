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

__all__ = ["edit_near_pairs", "bleu_pairs", "ppjoin_pairs"]


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


def bleu_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Clipped n-gram precision (BLEU-2, Papineni et al. 2002) for each
    candidate pair: unigram and bigram precisions of doc ``id_a``
    against reference ``id_b`` with per-gram count clipping, brevity
    penalty, and their geometric mean ``bleu2`` — the graded overlap
    verdict where Jaccard's set semantics are too blunt (Jaccard
    ignores token MULTIPLICITY; template spam that repeats one line 50×
    has high BLEU against its twin but middling Jaccard).

    ``pairs`` carries (id_a, id_b); texts are whitespace-tokenized,
    lowercased. Pairs where either side has no bigram (≤1 token) get
    p2 = 0 (unsmoothed BLEU convention), hence bleu2 = 0.

    Scale shape: per-doc n-gram COUNT tables are built once from one
    corpus explode (map-side combinable, never per pair); the verify is
    two equi-joins — (id_a, n, gram) then (id_b, n, gram) — whose work
    is Σ_pairs |gram-vocab of a|, linear in candidate volume, not
    corpus². The clipped min and all divides run JVM-side.
    """
    toks = F.filter(
        F.split(
            F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
        ),
        lambda w: F.length(w) > 0,
    )
    base = docs.select(F.col(id_col).alias("id"), toks.alias("ws"))
    uni = base.select(
        "id", F.lit(1).alias("n"), F.explode("ws").alias("gram")
    )
    bi = base.select(
        "id",
        F.lit(2).alias("n"),
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                F.slice(F.col("ws"), 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        ).alias("gram"),
    )
    gcounts = (
        uni.unionByName(bi)
        .groupBy("id", "n", "gram")
        .agg(F.count("*").cast("long").alias("c"))
    )
    lens = gcounts.groupBy("id", "n").agg(
        F.sum("c").cast("long").alias("total")
    )
    ga = gcounts.select(
        F.col("id").alias("id_a"), "n", "gram", F.col("c").alias("ca")
    )
    gb = gcounts.select(
        F.col("id").alias("id_b"), "n", "gram", F.col("c").alias("cb")
    )
    clipped = (
        pairs.join(ga, "id_a")
        .join(gb, ["id_b", "n", "gram"], "left")
        .groupBy("id_a", "id_b", "n")
        .agg(
            F.sum(F.least(F.col("ca"), F.coalesce(F.col("cb"), F.lit(0))))
            .cast("long")
            .alias("match")
        )
    )
    la = lens.select(
        F.col("id").alias("id_a"), "n", F.col("total").alias("ta")
    )
    lb = lens.select(
        F.col("id").alias("id_b"), "n", F.col("total").alias("tb")
    )
    pn = (
        clipped.join(la, ["id_a", "n"])
        .join(lb, ["id_b", "n"], "left")
        .select(
            "id_a",
            "id_b",
            "n",
            (F.col("match") / F.col("ta")).alias("p"),
            "ta",
            F.coalesce("tb", F.lit(0)).alias("tb"),
        )
    )
    wide = pn.groupBy("id_a", "id_b").agg(
        F.coalesce(
            F.max(F.when(F.col("n") == 1, F.col("p"))), F.lit(0.0)
        ).alias("p1"),
        F.coalesce(
            F.max(F.when(F.col("n") == 2, F.col("p"))), F.lit(0.0)
        ).alias("p2"),
        F.max(F.when(F.col("n") == 1, F.col("ta"))).alias("len_a"),
        F.max(F.when(F.col("n") == 1, F.col("tb"))).alias("len_b"),
    )
    bp = F.when(F.col("len_a") >= F.col("len_b"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.col("len_b") / F.col("len_a"))
    )
    return wide.select(
        "id_a",
        "id_b",
        F.col("len_a").cast("long").alias("len_a"),
        F.col("len_b").cast("long").alias("len_b"),
        F.round("p1", 6).alias("p1"),
        F.round("p2", 6).alias("p2"),
        F.round(
            F.when(
                (F.col("p1") > 0) & (F.col("p2") > 0),
                bp * F.exp((F.log("p1") + F.log("p2")) / 2),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("bleu2"),
    ).orderBy("id_a", "id_b")


def ppjoin_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT threshold-Jaccard self-join via prefix filtering (PPJoin,
    Xiao et al. 2008, with the AllPairs length filter of Bayardo et al.
    2007): every pair at word-``shingle_n``-gram Jaccard ≥ ``threshold``,
    no df-cap and no approximation. Output (id_a, id_b, jaccard) —
    schema- and value-identical to ``exact_jaccard_pairs(max_df=None)``.

    Why a second exact tier exists: ``exact_jaccard_pairs`` joins the
    FULL inverted index, so it needs ``max_df`` to survive hot shingles —
    which silently trades exactness for safety. PPJoin keeps exactness
    AND bounds the index by construction: shingles are ordered globally
    by ascending document frequency, and only each doc's PREFIX — the
    first |x| − ⌈t·|x|⌉ + 1 shingles under that order — is indexed. The
    prefix-filtering theorem says any pair with J ≥ t shares at least
    one prefix shingle, and because prefixes hold each doc's RAREST
    shingles, hot boilerplate shingles are exactly the ones that never
    reach the index. Two more sound prunes run on the candidate stream:
    the length filter (J ≤ min/max ⇒ min(|x|,|y|) ≥ t·max(|x|,|y|)) and
    the positional filter (1 + min(|x|−pₓ, |y|−p_y) ≥ ⌈t/(1+t)·(|x|+|y|)⌉
    must hold for a shared prefix shingle at 1-based ordered positions
    pₓ/p_y; applied per occurrence then distinct'd, which keeps a
    superset of PPJoin's survivors — the first common prefix shingle
    always passes). All bound arithmetic carries a 1e-9 slack in the
    candidate-KEEPING direction, so float rounding can only admit extra
    candidates; the exact verify decides.

    Scale shape (10^12 rows): index size is Σ prefix lengths — a
    (1−t)-fraction of the full index — and candidate blocks are keyed by
    LOW-df shingles, so no block goes quadratic without a cap. The
    verify joins the full per-doc shingle lists only for surviving
    candidate pairs (Σ_pairs |x| work, never corpus²). Everything is
    JVM relational: one explode, one df groupBy, one array_sort per doc,
    two equi-joins.
    """
    from corpusama_spark.operators.dedup import shingles

    t = float(threshold)
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    inv = sh.select("id", F.explode("sh").alias("g"))
    dfreq = inv.groupBy("g").agg(F.count("*").alias("dfreq"))
    ordered = (
        inv.join(dfreq, "g")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dfreq", "g"))
            ).alias("arr")
        )
        .select(
            "id",
            F.transform("arr", lambda s: s["g"]).alias("ws"),
            F.size("arr").alias("sz"),
        )
    )
    # prefix length |x| − ⌈t·|x|⌉ + 1; the −1e-9 can only LENGTHEN it
    plen = (
        F.col("sz")
        - F.ceil(F.lit(t) * F.col("sz") - F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    prefix = ordered.select(
        "id",
        "sz",
        F.posexplode(F.slice("ws", 1, plen)).alias("pos0", "g"),
    ).select("id", "sz", "g", (F.col("pos0") + 1).alias("p"))
    pa = prefix.select(
        F.col("id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        "g",
        F.col("p").alias("p_a"),
    )
    pb = prefix.select(
        F.col("id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        "g",
        F.col("p").alias("p_b"),
    )
    alpha = F.ceil(
        F.lit(t / (1.0 + t)) * (F.col("sz_a") + F.col("sz_b")) - F.lit(1e-9)
    )
    cand = (
        pa.join(pb, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.least("sz_a", "sz_b")
            >= F.lit(t) * F.greatest("sz_a", "sz_b") - F.lit(1e-9)
        )
        .where(
            F.lit(1)
            + F.least(
                F.col("sz_a") - F.col("p_a"), F.col("sz_b") - F.col("p_b")
            )
            >= alpha
        )
        .select("id_a", "id_b", "sz_a", "sz_b")
        .distinct()
    )
    ia = inv.select(F.col("id").alias("id_a"), "g")
    ib = inv.select(F.col("id").alias("id_b"), "g")
    return (
        cand.join(ia, "id_a")
        .join(ib, ["id_b", "g"])
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
