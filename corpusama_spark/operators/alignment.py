"""Caption-image agreement scoring (CLIP-score shape, engine-exact).

The operator every web-scale image+caption pipeline runs after the
unimodal gates: score how well a caption matches its image and drop pairs
below a threshold (LAION-5B kept pairs with CLIP similarity >= 0.28 —
public paper; DataComp's baseline filter is the same shape). A real CLIP
encoder is a model-weights seam like fastText (functions/langid.py); what
the ENGINE owes is the distributed computation around it:

  caption -> sparse hashed feature vector -> cosine against the image
  embedding column -> keep/drop.

The caption featurizer here is deterministic signed feature hashing
(Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
Learning" — public): token t adds sign(t) into bucket(t), both derived
from md5 prefixes, so ANY engine with md5 reproduces the vector bit-for-
bit and the whole score is DuckDB-oracle-able (same portability trick as
the md5 minhash family, operators/dedup.py). A learned text encoder slots
in by replacing ONE stage (the wt aggregation) with an Arrow-batched
model UDF; the join/cosine/threshold plumbing is identical.

Plan shape (the 10^12-row story):

- tokens explode in the scan stage; the two aggregations share the doc_id
  hash partitioning (bucket-level then doc-level), so Catalyst plans ONE
  exchange for both;
- the doc-level feature row is tiny (<= dim (bucket, weight) pairs), and
  the dot product runs as an ordered JVM ``aggregate`` over the sorted
  pairs — deterministic summation order, no Python anywhere;
- the only join is doc_id = image_id, equi-join between two tables that
  are both id-partitioned in a real deployment (bucketed/Iceberg), i.e.
  shuffle-free there; the image EMBEDDING (dim floats) joins, never the
  image bytes.

Reference seam: corpusama scores each record with a model column the same
way (make_langid -> lid column, corpusama/corpus/langid.py); this is that
pattern with a two-tower score instead of a classifier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corpusama_spark.operators.similarity import infer_dim, l2norm


def hashed_token_parts(tok: Column, dim: int) -> tuple[Column, Column]:
    """(bucket, sign) of one token under md5 feature hashing.

    bucket = first 8 md5 hex chars as an int, mod dim; sign = +-1 from the
    parity of the 9th hex char. Pure JVM, portable to any md5-bearing
    engine (DuckDB twin: ('0x' || substr(md5(t), 1, 8))::BIGINT % dim).
    """
    bucket = F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long"), F.lit(dim)
    )
    sign = F.when(
        F.pmod(F.conv(F.substring(F.md5(tok), 9, 1), 16, 10).cast("long"), F.lit(2))
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return bucket, sign


def caption_features(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse hashed caption features: (id, comps, n2) with ``comps`` a
    bucket-sorted array<struct<bucket,wt>> and ``n2`` the exact integer
    squared L2 norm. Captions with no tokens produce no row (nothing to
    score — same drop the reference's empty-text nullifier applies)."""
    tok = (
        docs.where(
            F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
        )
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: F.length(t) > 0,
                )
            ).alias("tok"),
        )
    )
    bucket, sign = hashed_token_parts(F.col("tok"), dim)
    wt = (
        tok.select("id", bucket.alias("bucket"), sign.alias("sgn"))
        .groupBy("id", "bucket")
        .agg(F.sum("sgn").cast("long").alias("wt"))
    )
    return wt.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("bucket", "wt"))).alias("comps"),
        F.sum(F.col("wt") * F.col("wt")).cast("long").alias("n2"),
    )


def caption_image_agreement(
    docs: DataFrame,
    images: DataFrame,
    threshold: float = 0.05,
    dim: int | None = None,
    doc_id: str = "doc_id",
    text_col: str = "text",
    img_id: str = "vec_id",
    vec_col: str = "embedding",
    ragged: str = "fail",
) -> DataFrame:
    """(doc_id, n2, align_score, keep): cosine between the hashed caption
    features and the image embedding joined on doc_id = img_id, kept when
    score >= threshold. Zero-norm sides are dropped, not divided by.

    The dot product folds the sorted sparse pairs against the dense image
    vector JVM-side (element_at by bucket) — O(nnz) per row, summation
    order fixed by the sort, bytes/text never in the join.

    Embeddings shorter than ``dim`` would make element_at return NULL
    (non-ANSI mode) and silently null the keep decision (ADVICE r3), so
    ragged rows are surfaced explicitly: ``ragged="fail"`` (default)
    raises at execution time, ``ragged="drop"`` filters them out.
    """
    if ragged not in ("fail", "drop"):
        raise ValueError(f"ragged must be 'fail' or 'drop', got {ragged!r}")
    dim = dim if dim is not None else infer_dim(images, vec_col)
    feats = caption_features(docs, dim, doc_id, text_col)
    vec = F.col(vec_col).cast("array<double>")
    if ragged == "drop":
        images = images.where(F.size(vec_col) == dim)
    else:
        vec = F.when(F.size(vec_col) == dim, vec).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"ragged embedding: expected dim {dim}, got "),
                    F.size(vec_col).cast("string"),
                    F.lit(" (id="),
                    F.col(img_id).cast("string"),
                    F.lit(")"),
                )
            )
        )
    img = images.select(
        F.col(img_id).alias("img_id"),
        vec.alias("vec"),
    )
    j = feats.join(img, feats["id"] == img["img_id"])
    dot = F.aggregate(
        F.col("comps"),
        F.lit(0.0),
        lambda acc, c: acc
        + c.getField("wt").cast("double")
        * F.element_at(F.col("vec"), (c.getField("bucket") + 1).cast("int")),
    )
    vnorm = l2norm(F.col("vec"))
    score = F.round(dot / (F.sqrt(F.col("n2").cast("double")) * vnorm), 6)
    return (
        j.where((F.col("n2") > 0) & (vnorm > 0))
        .select(
            F.col("id").alias(doc_id),
            F.col("n2"),
            score.alias("align_score"),
            (score >= threshold).alias("keep"),
        )
    )


def bitext_filter(
    pairs: DataFrame,
    src_col: str = "src_text",
    tgt_col: str = "tgt_text",
    max_len_ratio: float = 2.0,
    max_tokens: int = 500,
) -> DataFrame:
    """Mined-pair cleaning gates (X221) — the filter battery every
    bitext/caption-pair miner (margin_pairs, X213) feeds into before the
    pairs become training data; the Moses clean-corpus-n heuristics plus
    the WMT-era copy and number-fidelity checks, all relational:

    - ``len_ratio``: max/min char length — a faithful translation pair
      sits near 1, alignment errors blow past ``max_len_ratio``;
    - token-count bounds: both sides in [1, max_tokens] (empty or
      runaway segments are alignment failures);
    - ``numbers_match``: the sorted multiset of digit runs must be equal
      — numbers survive translation verbatim, so a mismatch means the
      pair is misaligned (the highest-precision single signal in WMT
      corpus filtering);
    - ``is_copy``: case-folded trimmed equality — untranslated
      passthrough, the classic crawl artifact.

    keep = within ratio AND within token bounds AND numbers_match AND
    NOT is_copy, with the first failing reason reported.

    Scale shape (10^12 pairs): every gate is a scan-stage JVM expression
    on the pair row — no joins, no shuffles, no UDFs; composes directly
    onto the miner's output exchange.
    """
    s = F.coalesce(F.col(src_col), F.lit(""))
    t = F.coalesce(F.col(tgt_col), F.lit(""))
    ls, lt = F.length(s), F.length(t)
    ratio = F.when(
        F.least(ls, lt) > 0,
        F.round(
            F.greatest(ls, lt).cast("double") / F.least(ls, lt), 6
        ),
    )
    ntok = lambda c: F.size(  # noqa: E731
        F.filter(
            F.split(F.lower(F.trim(c)), r"\s+"),
            lambda w: F.length(w) > 0,
        )
    )
    ns, nt = ntok(s), ntok(t)
    nums = lambda c: F.sort_array(  # noqa: E731
        F.regexp_extract_all(c, F.lit(r"\d+"), 0)
    )
    numbers_match = nums(s) == nums(t)
    is_copy = (F.lower(F.trim(s)) == F.lower(F.trim(t))) & (ls > 0)
    ok_ratio = ratio.isNotNull() & (ratio <= F.lit(float(max_len_ratio)))
    ok_tok = (
        (ns >= 1) & (ns <= max_tokens) & (nt >= 1) & (nt <= max_tokens)
    )
    keep = ok_ratio & ok_tok & numbers_match & ~is_copy
    reason = (
        F.when(~ok_ratio, F.lit("len_ratio"))
        .when(~ok_tok, F.lit("token_bounds"))
        .when(~numbers_match, F.lit("number_mismatch"))
        .when(is_copy, F.lit("copy"))
    )
    return pairs.select(
        "*",
        ratio.alias("len_ratio"),
        ns.cast("long").alias("n_tok_src"),
        nt.cast("long").alias("n_tok_tgt"),
        numbers_match.alias("numbers_match"),
        is_copy.alias("is_copy"),
        keep.alias("keep"),
        reason.alias("drop_reason"),
    )


def xmodal_recall(
    docs: DataFrame,
    images: DataFrame,
    k: int = 5,
    dim: int | None = None,
    doc_id: str = "doc_id",
    text_col: str = "text",
    img_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cross-modal retrieval evaluation (X262) — the CLIP-paper eval
    shape (Radford et al. 2021, public): for each query image, rank ALL
    candidate captions by two-tower cosine and ask where the image's OWN
    caption landed. Per image: (img_id, true_rank, hit_at_k, top1_id).
    caption_image_agreement (X50) scores only the PAIRED caption — a
    constant-feeling score can hide an encoder that ranks everyone's
    caption equally high; retrieval recall is the metric that catches
    that collapse.

    Same portable encoders as X50 (md5 feature hashing JVM-side; dense
    image vector), so the whole ranking replays in the oracle. The
    caption side folds sparse (bucket, wt) pairs against the dense
    vector — O(nnz·|queries|) with the query images broadcast: the
    AUDIT tier. At 10^12 the query set is a sample and the candidate
    pool is ANN-shortlisted per image (similarity tiers), exactly like
    maxsim/topk_cosine's documented split.

    ``true_rank`` is -1 when the image's own caption produced no
    features (empty caption) — an honest miss, not an error."""
    from pyspark.sql.window import Window

    dim = dim if dim is not None else infer_dim(images, vec_col)
    feats = caption_features(docs, dim, doc_id, text_col)
    vec = F.col(vec_col).cast("array<double>")
    img = images.select(
        F.col(img_id).alias("img"),
        vec.alias("_v"),
        l2norm(vec).alias("_vn"),
    ).where(F.col("_vn") > 0)
    dot = F.aggregate(
        F.col("comps"),
        F.lit(0.0),
        lambda acc, c: acc
        + c["wt"].cast("double")
        * F.element_at(F.col("_v"), c["bucket"].cast("int") + 1),
    )
    scored = (
        feats.where(F.col("n2") > 0)
        .join(F.broadcast(img))
        .select(
            "img",
            "id",
            F.round(
                dot / (F.sqrt(F.col("n2").cast("double")) * F.col("_vn")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("img").orderBy(F.desc("cos"), F.asc("id"))
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    own = ranked.where(F.col("id") == F.col("img")).select(
        "img", F.col("rnk").alias("true_rank")
    )
    top1 = ranked.where(F.col("rnk") == 1).select(
        "img", F.col("id").alias("top1_id")
    )
    base = img.select("img")
    return (
        base.join(own, "img", "left")
        .join(top1, "img", "left")
        .select(
            F.col("img").alias("img_id"),
            F.coalesce("true_rank", F.lit(-1)).alias("true_rank"),
            (
                F.coalesce("true_rank", F.lit(10**9)) <= F.lit(k)
            ).alias(f"hit_at_{k}"),
            F.coalesce("top1_id", F.lit(-1)).alias("top1_id"),
        )
        .orderBy("img_id")
    )
