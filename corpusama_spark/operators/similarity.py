"""Similarity search over embedding columns (array<float>).

Training-data companion operators (no reference analogue — corpusama has no
embeddings; the slot parallels its langid scoring as "model-derived column
math"). Two tiers:

- brute-force cosine top-k: the correctness baseline. Cross join pruned by a
  broadcast of the (small) query set; dot products via zip_with/aggregate —
  pure JVM, whole-stage codegen.
- LSH-bucketed ANN (random hyperplanes → sign bits → bucket join): a scale
  path needing no training. Hyperplanes derive from blake2b of (table,
  plane, dim) — deterministic, no stored model. At 10^12 rows the bucket
  join replaces the full cross product; recall tunes with nplanes/ntables.
- IVF ANN (trained coarse quantizer → inverted lists → probe join): the
  data-adaptive scale path (FAISS-style); quantizer trains on a bounded
  driver-side sample, assignment is one BLAS pass per Arrow batch.

Plus embedding column utilities: l2_normalize and int8 quantize/dequantize
(4× storage cut for the embedding table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query set broadcast)."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def infer_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Embedding width from the first row (one-row job). Entry points that
    need a plane/centroid width call this when ``dim`` isn't given — a
    768-wide table must never be projected with 64-wide planes."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row.d is None or row.d <= 0:
        raise ValueError(f"cannot infer embedding dim from column {vec_col!r}")
    return int(row.d)


def _plane(table: int, p: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane — driver-side blake2b, zero
    stored state, reproducible on any cluster. Components in [-1, 1)."""
    import hashlib

    out = []
    for d in range(dim):
        h = int.from_bytes(
            hashlib.blake2b(f"{table}_{p}_{d}".encode(), digest_size=8).digest(),
            "big",
        )
        out.append((h % 20_000) / 10_000.0 - 1.0)
    return out


def hyperplane_bits(
    vec_col: Column, nplanes: int = 16, dim: int = 64, table: int = 0
) -> Column:
    """Sign-bit string of projections onto deterministic pseudo-random planes.

    The planes are computed ONCE on the driver and embedded as foldable
    literals — per row only nplanes×dim multiply-adds remain (an earlier
    design derived plane components from xxhash64 *inside* the expression,
    re-hashing nplanes×dim values per row). ``table`` seeds independent hash
    tables for multi-probe LSH.
    """
    bits = [
        F.when(
            dot(F.array(*[F.lit(v) for v in _plane(table, p, dim)]), vec_col) > 0,
            "1",
        ).otherwise("0")
        for p in range(nplanes)
    ]
    return F.concat(*bits)


def lsh_buckets_expr(
    vec_col: Column, nplanes: int = 8, ntables: int = 4, dim: int = 64
) -> Column:
    """Pure-Column variant of lsh_buckets — kept for parity testing.

    Spark evaluates higher-order-function lambdas INTERPRETED (outside
    whole-stage codegen), so the nplanes×ntables×dim fold here costs ~100×
    a vectorized matmul; use `lsh_buckets` (Arrow+numpy) on anything hot.
    """
    return F.array(
        *[
            F.concat(F.lit(f"{t}:"), hyperplane_bits(vec_col, nplanes, dim, t))
            for t in range(ntables)
        ]
    )


def lsh_buckets(
    vec_col: Column, nplanes: int = 8, ntables: int = 4, dim: int = 64
) -> Column:
    """Array of per-table bucket keys (table index prefixed).

    Arrow-batched: the whole batch of vectors multiplies the (ntables*nplanes,
    dim) plane matrix in one BLAS call, then sign bits become key strings.
    Bit semantics identical to lsh_buckets_expr (strict `dot > 0`, same
    blake2b-derived planes).
    """
    planes = np.array(
        [
            _plane(t, p, dim)
            for t in range(ntables)
            for p in range(nplanes)
        ],
        dtype=np.float64,
    )

    @F.pandas_udf(ArrayType(StringType()))
    def _udf(batch: pd.Series) -> pd.Series:
        out = []
        if len(batch) == 0:
            return pd.Series(out, dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch])
        bits = (mat @ planes.T) > 0  # (n, ntables*nplanes)
        for row in bits:
            keys = []
            for t in range(ntables):
                seg = row[t * nplanes : (t + 1) * nplanes]
                keys.append(f"{t}:" + "".join("1" if b else "0" for b in seg))
            out.append(keys)
        return pd.Series(out)

    return _udf(vec_col)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nplanes: int = 8,
    ntables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via multi-table LSH: candidates = union of the
    query's buckets over ``ntables`` independent tables, reranked by exact
    cosine. Equi-join on (table-prefixed) bucket key — never a cross join;
    recall tunes with nplanes (bucket size) x ntables (probes).
    ``dim`` is inferred from the corpus when not given.
    """
    from pyspark.sql.window import Window

    dim = dim if dim is not None else infer_dim(corpus, vec_col)
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        F.explode(lsh_buckets(F.col(vec_col), nplanes, ntables, dim)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(lsh_buckets(F.col(vec_col), nplanes, ntables, dim)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    nplanes: int = 8,
    ntables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 10_000,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold within LSH buckets.

    ``max_bucket`` drops flood buckets before the self-join — one degenerate
    bucket (zero-ish embeddings all hashing to the same sign pattern) would
    otherwise go O(b²); members of a dropped bucket still meet in their
    other tables unless those flood too. Same guard as minhash_lsh_pairs.
    Caller owns the persisted bucket stage: plans.caching.release(result).
    """
    from corpusama_spark.plans.caching import own_caches

    dim = dim if dim is not None else infer_dim(df, vec_col)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(lsh_buckets(F.col(vec_col), nplanes, ntables, dim)).alias("bucket"),
    ).persist()  # self-join sides would otherwise each recompute the buckets
    joinable = b
    if max_bucket is not None:
        ok = (
            b.groupBy("bucket")
            .count()
            .where(F.col("count") <= max_bucket)
            .drop("count")
        )
        joinable = b.join(ok, "bucket", "left_semi")
    a, c = joinable.alias("a"), joinable.alias("b")
    pairs = (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
    return own_caches(pairs, b)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def training_sample_plan(
    df: DataFrame,
    sample: int = 4096,
    vec_col: str = "embedding",
    prefilter_mod: int | None = 64,
) -> DataFrame:
    """The quantizer-training sample as a (lazy) plan: a deterministic
    content-hash pre-filter keeps ~1/``prefilter_mod`` of the corpus, then
    a seeded rank picks ``sample`` vectors from the survivors.

    The pre-filter is the scale fix for the round-2 finding: the rank alone
    compiles to TakeOrderedAndProject (per-partition heaps, no sort
    shuffle) but still md5-serializes EVERY vector — a full corpus pass per
    quantizer (re)train at 10^12 rows. `pmod(xxhash64(vec), K) = 0` is
    evaluated in the scan stage and cuts that pass to ~1/K before any
    string serialization. Both stages hash only vector CONTENT, so the
    sample is identical across runs, partitionings, and cluster sizes.
    """
    base = df.select(F.col(vec_col).alias("v"))
    if prefilter_mod is not None and prefilter_mod > 1:
        key = F.xxhash64(F.concat_ws(",", F.col("v").cast("array<string>")))
        base = base.where(F.pmod(key, F.lit(prefilter_mod)) == 0)
    return base.orderBy(
        F.md5(F.concat_ws(",", F.col("v").cast("array<string>")))
    ).limit(sample)


def train_centroids(
    df: DataFrame,
    k: int = 16,
    sample: int = 4096,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
    prefilter_mod: int | None = 64,
) -> np.ndarray:
    """Deterministic k-means coarse quantizer, trained on a bounded sample.

    The SAMPLE goes to the driver (standard IVF practice — FAISS trains its
    quantizer on ~max(10k, 256*k) vectors regardless of corpus size), the
    corpus never does; Lloyd iterations are numpy on that sample. Sampling
    is seeded + sorted so centroids are identical across runs and cluster
    sizes, and a content-hash pre-filter (``prefilter_mod``) bounds the
    sampling scan to ~1/mod of the corpus (training_sample_plan). If the
    pre-filtered sample is starved (< max(4k, 64) vectors — a small corpus
    or an over-aggressive mod), the sampler falls back to the unfiltered
    rank once; the fallback is itself deterministic. Returns (k, dim)
    float64.
    """
    rows = training_sample_plan(df, sample, vec_col, prefilter_mod).collect()
    if len(rows) < max(4 * k, 64):
        rows = training_sample_plan(df, sample, vec_col, None).collect()
    x = np.array([r.v for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def _assign_udf(cents: np.ndarray, nprobe: int):
    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(batch: pd.Series) -> pd.Series:
        if len(batch) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch])
        # one BLAS pass: argsort of squared distances via the identity
        # |x-c|^2 = |x|^2 - 2x.c + |c|^2 (|x|^2 constant per row)
        scores = -2.0 * (mat @ cents.T) + (cents**2).sum(axis=1)[None, :]
        order = np.argsort(scores, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(int).tolist() for row in order])

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest centroid's
    inverted list; each query probes its ``nprobe`` nearest lists and
    reranks by exact cosine. Complements the hyperplane-LSH tier: IVF
    adapts to the data distribution (trained quantizer), LSH needs no
    training — at 10^12 rows both replace the cross join with an equi-join
    whose right side is ~nprobe/n_centroids of the corpus.
    """
    from pyspark.sql.window import Window

    cents = centroids if centroids is not None else train_centroids(
        corpus, k=n_centroids, vec_col=vec_col
    )
    c_assign = _assign_udf(cents, 1)
    q_assign = _assign_udf(cents, nprobe)
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(q_assign(F.col(vec_col))).alias("list_id"),
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Axis-aligned sign LSH — the engine-exact ANN tier (oracle-able)
# ---------------------------------------------------------------------------


def axis_sign_buckets(
    vec_col: Column, nbits: int = 6, ntables: int = 8
) -> Column:
    """Array of per-table bucket keys from component SIGNS — hyperplane LSH
    with canonical-basis planes. Table t reads components
    [t*nbits, (t+1)*nbits); bit = component > 0.

    No arithmetic is involved (just float comparisons against 0), so the
    bucket assignment is bit-exact across engines — this is the ANN tier a
    DuckDB oracle can reproduce, unlike the random-plane/IVF tiers whose
    float dot products depend on summation order. Pure JVM expressions.
    """
    keys = []
    for t in range(ntables):
        bits = [
            F.when(F.element_at(vec_col, t * nbits + b + 1) > 0, "1").otherwise("0")
            for b in range(nbits)
        ]
        keys.append(F.concat(F.lit(f"{t}:"), *bits))
    return F.array(*keys)


def axis_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nbits: int = 6,
    ntables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via axis-sign LSH buckets, reranked by exact
    cosine (6-decimal-rounded, ties id-asc — the cross-engine-stable
    ordering topk_cosine established). Same bucket-equi-join shape as
    ann_topk; needs dim >= nbits*ntables (checked — out-of-range
    element_at would otherwise yield NULL > 0 = constant '0' bits and
    silently degrade every bucket)."""
    from pyspark.sql.window import Window

    dim = infer_dim(corpus, vec_col)
    if dim < nbits * ntables:
        raise ValueError(
            f"axis_lsh_topk needs dim >= nbits*ntables "
            f"({nbits}*{ntables}={nbits * ntables}), got dim={dim}"
        )
    vec = F.col(vec_col).cast("array<double>")
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        vec.alias("cvec"),
        F.explode(axis_sign_buckets(vec, nbits, ntables)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vec.alias("qvec"),
        F.explode(axis_sign_buckets(vec, nbits, ntables)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def axis_sign_probes(
    vec_col: Column, nbits: int = 6, ntables: int = 8
) -> Column:
    """Multi-probe key set (Lv et al. 2007, "Multi-Probe LSH"): per table,
    the exact axis-sign key PLUS every single-bit flip — (nbits+1)·ntables
    keys. A component near zero flips its sign bit under noise; probing the
    Hamming-1 neighborhood recovers those misses WITHOUT more tables, i.e.
    at constant index memory — at 10^12 rows the corpus side still stores
    one bucket row per (vector, table); only the tiny broadcast query side
    fans out. Same no-arithmetic bit rule as axis_sign_buckets, so the
    probe set is bit-exact across engines."""
    keys = []
    for t in range(ntables):
        for flip in range(-1, nbits):
            bits = []
            for b in range(nbits):
                pred = F.element_at(vec_col, t * nbits + b + 1) > 0
                one, zero = ("0", "1") if b == flip else ("1", "0")
                bits.append(F.when(pred, one).otherwise(zero))
            keys.append(F.concat(F.lit(f"{t}:"), *bits))
    return F.array(*keys)


def multiprobe_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nbits: int = 6,
    ntables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """axis_lsh_topk with the query side probing the Hamming-1 bucket
    neighborhood (multi-probe LSH). Corpus-side layout and traffic are
    IDENTICAL to the single-probe tier — the recall boost is bought with
    (nbits+1)× more rows in the broadcast query table only. Rerank is the
    repo-standard 6-dp cosine, ties id-asc."""
    from pyspark.sql.window import Window

    dim = infer_dim(corpus, vec_col)
    if dim < nbits * ntables:
        raise ValueError(
            f"multiprobe_lsh_topk needs dim >= nbits*ntables "
            f"({nbits * ntables}), got dim={dim}"
        )
    vec = F.col(vec_col).cast("array<double>")
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        vec.alias("cvec"),
        F.explode(axis_sign_buckets(vec, nbits, ntables)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vec.alias("qvec"),
        F.explode(axis_sign_probes(vec, nbits, ntables)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def ann_recall(ann: DataFrame, brute: DataFrame, k: int = 5) -> DataFrame:
    """Per-query recall@k of an ANN result against the brute-force truth:
    (query_id, n_hit, recall_at_k). Pure relational — one broadcast-able
    left join + groupBy; every brute query appears even when the ANN found
    nothing for it."""
    hits = brute.select("query_id", "cand_id").join(
        ann.select("query_id", "cand_id", F.lit(1).alias("_hit")),
        ["query_id", "cand_id"],
        "left",
    )
    return hits.groupBy("query_id").agg(
        F.count("_hit").alias("n_hit"),
        F.round(F.count("_hit") / F.lit(k), 4).alias(f"recall_at_{k}"),
    )


def ndcg_audit(approx: DataFrame, ideal: DataFrame, k: int = 5) -> DataFrame:
    """Graded retrieval quality: nDCG@k of an ANN tier against the
    brute-force ideal (Järvelin & Kekäläinen 2002, public). recall@k
    (ann_recall) counts HITS; nDCG also charges the tier for putting a
    barely-relevant neighbor above a near-duplicate — the metric that
    matters when downstream consumes the ORDER (semantic-dedup keep
    choice, hard-negative mining take the top few).

    Both inputs carry (query_id, cand_id, cos_sim, rank) — the schema
    axis_lsh_topk / topk_cosine emit; gains are the TRUE cosines
    (clamped at 0 so anti-correlated neighbors cannot make DCG
    non-monotone), discount 1/log2(rank+1). Per query:
    (dcg, idcg, ndcg_at_k), 6dp — one groupBy per side + one join,
    DuckDB-replayable."""
    gain = F.greatest(F.col("cos_sim"), F.lit(0.0))
    disc = gain / F.log2(F.col("rank") + 1)
    dcg = (
        approx.where(F.col("rank") <= k)
        .groupBy("query_id")
        .agg(F.round(F.sum(disc), 6).alias("dcg"))
    )
    idcg = (
        ideal.where(F.col("rank") <= k)
        .groupBy("query_id")
        .agg(F.round(F.sum(disc), 6).alias("idcg"))
    )
    return idcg.join(dcg, "query_id", "left").select(
        "query_id",
        F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
        "idcg",
        F.when(
            F.col("idcg") > 0,
            F.round(F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias(f"ndcg_at_{k}"),
    )


# ---------------------------------------------------------------------------
# Embedding column utilities
# ---------------------------------------------------------------------------


def l2_normalize(vec_col: Column) -> Column:
    """Unit-normalized copy of an embedding column (pure JVM); zero vectors
    pass through unchanged rather than dividing by zero."""
    n = l2norm(vec_col)
    return F.when(n > 0, F.transform(vec_col, lambda x: x / n)).otherwise(vec_col)


def quantize_int8(vec_col: Column) -> Column:
    """struct(scale float, q array<tinyint>): symmetric int8 quantization —
    4x smaller embedding storage at 10^12 rows; dequantize with
    ``transform(q, x -> x * scale)``. Max-abs scaling keeps the dot-product
    ranking error bounded; pure JVM expressions."""
    absmax = F.array_max(F.transform(vec_col, lambda x: F.abs(x)))
    scale = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(
        vec_col, lambda x: F.round(x / scale).cast("tinyint")
    )
    return F.struct(
        scale.cast("float").alias("scale"), q.alias("q")
    )


def dequantize(qstruct: Column) -> Column:
    """Inverse of quantize_int8: array<float> reconstruction."""
    scale = qstruct.getField("scale")
    return F.transform(
        qstruct.getField("q"), lambda x: (x.cast("float") * scale)
    )


def in_batch_hard_negatives(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_batches: int = 8,
    k: int = 3,
) -> DataFrame:
    """In-batch hard-negative mining for contrastive training: within
    each deterministic batch (pmod(id, n_batches)), every anchor's k
    most-cosine-similar DIFFERENT-label rows. This is the standard
    in-batch-negatives recipe (CLIP-style contrastive pipelines): the
    batch bound makes the quadratic local, so total cost is
    rows * batch_size — linear in the corpus, never all-pairs.

    Scale shape: ONE hash exchange on the batch key co-locates each
    batch, the self-join is an equi-join on that key, and the top-k
    window partitions by anchor inside the same distribution. Batch
    size is capped by construction (id space / n_batches at synth
    scale; a production caller batches by shard id), so no task sees
    unbounded work. Ranking on the 6-decimal-rounded cosine with an id
    tie-break is deterministic under any partitioning and reproducible
    outside Spark.
    """
    from pyspark.sql.window import Window

    vec = F.col(vec_col).cast("array<double>")
    base = df.select(
        F.col(id_col).alias("id"),
        vec.alias("v"),
        F.col(label_col).alias("lbl"),
        F.pmod(F.col(id_col), F.lit(int(n_batches))).alias("b"),
    )
    a = base.select(
        F.col("id").alias("anchor_id"),
        F.col("v").alias("av"),
        F.col("lbl").alias("albl"),
        "b",
    )
    c = base.select(
        F.col("id").alias("neg_id"),
        F.col("v").alias("cv"),
        F.col("lbl").alias("clbl"),
        "b",
    )
    scored = (
        a.join(c, "b")
        .where(
            (F.col("anchor_id") != F.col("neg_id"))
            & (F.col("albl") != F.col("clbl"))
        )
        .select(
            "anchor_id",
            "neg_id",
            F.round(cosine(F.col("av"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos_sim"), F.asc("neg_id")
    )
    out = scored.withColumn("rnk", F.row_number().over(w).cast("long"))
    return out.where(F.col("rnk") <= int(k))


def tfidf_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    max_df: int | None = 32,
) -> DataFrame:
    """Document-pair TF-IDF cosine similarity over an inverted term
    index — the sparse-vector near-dup tier between exact shingle
    matching (surface identical) and embedding cosine (needs a model).
    Rewrites/translations-of-structure share vocabulary but not
    shingles; TF-IDF cosine catches them with zero model dependency.

    Scale shape: candidates are pairs SHARING a term (inverted-index
    equi-join), never |corpus|²; ``max_df`` drops terms in more docs
    than the cap — stop-words blow the index quadratically while
    carrying no signal, so the cap is both the perf guard and standard
    practice. Per-pair dot products ride one groupBy; norms are one
    doc-keyed aggregate joined back. IDF = ln(N/df) with N via a
    broadcast single-row join; float sums here are benign at 6 dp
    rounding (term weights are O(1–10), so accumulated ulp error is
    ~1e-14 relative — nine orders below the rounding boundary).
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("t"),
    ).where(F.col("t") != "")
    tf = tok.groupBy("id", "t").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count("*").alias("df_t"))
    if max_df is not None:
        dfreq = dfreq.where(F.col("df_t") <= int(max_df))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("_n")
    )
    w = (
        tf.join(dfreq, "t")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "t",
            (F.col("tf") * F.log(F.col("_n") / F.col("df_t"))).alias("w"),
        )
    )
    norms = w.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a = w.select(F.col("id").alias("id_a"), "t", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("id_b"), "t", F.col("w").alias("wb"))
    dots = (
        a.join(b, "t")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    out = (
        dots.join(
            norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("na")),
            "id_a",
        )
        .join(
            norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("nb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "tfidf_cos"
            ),
        )
    )
    return out.where(F.col("tfidf_cos") >= float(threshold))


def label_centroid_similarity(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding
    centroids — the corpus cartography table ("which domains live in
    the same region of embedding space"), the number that justifies
    merging two sources' quality thresholds or keeping them apart.
    Centroids are per-(label, dim) means ROUNDED to 6 dp (pinning the
    order-sensitive float sums, same trick as kmeans), so the cosines
    are engine-exact.

    Scale shape: the corpus collapses to labels×dims rows in one
    map-side-combinable groupBy; the pair table is labels²/2 × dims —
    driver-free, broadcast-sized for any real label cardinality."""
    dims = emb.select(
        F.col(label_col).alias("lab"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select("lab", "dim", F.col("v").cast("double").alias("v"))
    cent = dims.groupBy("lab", "dim").agg(
        F.round(F.avg("v"), 6).alias("c")
    )
    a = cent.select(
        F.col("lab").alias("lab_a"), "dim", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("lab").alias("lab_b"), "dim", F.col("c").alias("cb")
    )
    pairs = (
        a.join(b, "dim")
        .where(F.col("lab_a") < F.col("lab_b"))
        .groupBy("lab_a", "lab_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("_dot"),
            F.sum(F.col("ca") * F.col("ca")).alias("_na"),
            F.sum(F.col("cb") * F.col("cb")).alias("_nb"),
        )
    )
    return pairs.select(
        "lab_a",
        "lab_b",
        F.round(
            F.col("_dot") / F.sqrt(F.col("_na") * F.col("_nb")), 6
        ).alias("cosine"),
    )


def knn_hubness(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    graph: DataFrame | None = None,
) -> DataFrame:
    """Hubness audit of the k-NN graph: the in-degree distribution —
    in_degree → how many vectors are cited that often as a neighbor,
    with node and citation shares. High-dimensional embedding spaces
    grow "hubs" (a few vectors appear in everyone's top-k) that poison
    dedup and retrieval; a heavy tail here is the signal to re-normalize
    or re-embed before any similarity-based curation runs.

    Every vector appears, including in-degree 0 (never anyone's
    neighbor — the anti-hubs that indicate isolated/noise regions).

    ``graph`` may supply a precomputed neighbor table (query_id,
    cand_id, rank) — at scale the ANN output (ann_topk / ivf_topk) IS
    that table, so the audit costs one edge-sized groupBy. The default
    builds the exact graph via brute_force_topk, which broadcasts the
    query side: correct for audits on a bounded sample, not a 10^12-row
    default — pass the ANN graph there.
    """
    if graph is None:
        graph = brute_force_topk(emb, emb, k=k, id_col=id_col, vec_col=vec_col)
    indeg = graph.where(F.col("rank") <= k).groupBy(
        F.col("cand_id").alias("vid")
    ).agg(F.count("*").cast("long").alias("d"))
    allv = emb.select(F.col(id_col).alias("vid"))
    deg = allv.join(indeg, "vid", "left").select(
        "vid", F.coalesce("d", F.lit(0)).alias("d")
    )
    hist = deg.groupBy(F.col("d").alias("in_degree")).agg(
        F.count("*").cast("long").alias("n_vectors")
    )
    tot = hist.agg(
        F.sum("n_vectors").cast("double").alias("nv"),
        F.sum(F.col("in_degree") * F.col("n_vectors"))
        .cast("double")
        .alias("ne"),
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "in_degree",
            "n_vectors",
            F.round(F.col("n_vectors") / F.col("nv"), 6).alias("node_share"),
            F.round(
                F.when(
                    F.col("ne") > 0,
                    F.col("in_degree") * F.col("n_vectors") / F.col("ne"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("citation_share"),
        )
        .orderBy("in_degree")
    )


def label_cohesion(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding cohesion audit — the centroid-based
    silhouette stand-in that stays linear: for each label, the mean
    cosine of members to their OWN centroid (cohesion), the nearest
    OTHER label by centroid cosine (the confusable neighbor), and the
    margin between them. A label whose cohesion barely beats its
    nearest-neighbor centroid similarity is a cluster the curation
    pipeline should not treat as a unit.

    Centroid per-dim means are ROUNDED to 6 dp (pinning order-sensitive
    float sums — the kmeans/label_centroid_similarity trick) so both
    engines see identical centroids before any cosine.

    Scale shape: corpus → (label × dim) in one map-side-combinable
    groupBy; centroids rebuild as arrays (labels-sized, broadcast);
    member→centroid cosine is one broadcast join + zip_with dot — the
    corpus is touched exactly twice (centroid pass, scoring pass) and
    nothing n² exists anywhere: the label×label table is tiny.
    """
    dims = emb.select(
        F.col(label_col).alias("lab"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select("lab", "dim", F.col("v").cast("double").alias("v"))
    cent = (
        dims.groupBy("lab", "dim")
        .agg(F.round(F.avg("v"), 6).alias("c"))
        .groupBy("lab")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("cvec")
        )
    )
    member = emb.select(
        F.col(label_col).alias("lab"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("mvec"),
    )
    coh = (
        member.join(F.broadcast(cent), "lab")
        .select("lab", cosine(F.col("mvec"), F.col("cvec")).alias("cos"))
        .groupBy("lab")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.round(F.avg("cos"), 6).alias("cohesion"),
        )
    )
    ca = cent.select(F.col("lab").alias("lab"), F.col("cvec").alias("va"))
    cb = cent.select(F.col("lab").alias("lab_b"), F.col("cvec").alias("vb"))
    from pyspark.sql.window import Window

    wnear = Window.partitionBy("lab").orderBy(
        F.desc("ccos"), F.asc("lab_b")
    )
    near = (
        ca.join(F.broadcast(cb), F.col("lab") != F.col("lab_b"))
        .select(
            "lab",
            "lab_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(wnear))
        .where(F.col("rn") == 1)
        .select(
            "lab",
            F.col("lab_b").alias("nearest_label"),
            F.col("ccos").alias("nearest_cos"),
        )
    )
    return (
        coh.join(near, "lab", "left")
        .select(
            F.col("lab").alias(label_col),
            "n_members",
            "cohesion",
            "nearest_label",
            "nearest_cos",
            F.round(F.col("cohesion") - F.col("nearest_cos"), 6).alias(
                "margin"
            ),
        )
        .orderBy(label_col)
    )


def margin_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fwd_graph: DataFrame | None = None,
    bwd_graph: DataFrame | None = None,
) -> DataFrame:
    """Margin-based parallel-pair mining (X213; Artetxe & Schwenk 2019,
    the CCMatrix/LASER bitext-mining criterion, ratio variant): for a
    candidate pair (x, y) with x from ``src`` and y from ``tgt``,

        margin(x, y) = cos(x, y) / ((fwd_k(x) + bwd_k(y)) / 2)

    where fwd_k(x) = mean cos of x's k nearest targets and bwd_k(y) =
    mean cos of y's k nearest sources. Dividing by the LOCAL similarity
    scale fixes raw-cosine mining's hubness failure: a generic "hub"
    caption scores high against everything, so its denominator is high
    too and its margin collapses — only pairs that are similar *relative
    to their own neighborhoods* survive. This is how web-scale image/
    caption or cross-lingual pair corpora are mined from two embedding
    pools (one per language/modality) before alignment filtering
    (alignment.py) and semantic dedup (curation.py) run.

    Output: per-src BEST candidate with margin >= threshold —
    (src_id, tgt_id, cos_sim, margin, mutual), where ``mutual`` says y's
    own nearest source (backward rank-1 by cosine, id tiebreak) is x —
    the intersection-strategy signal; downstream can filter on it for
    the high-precision regime.

    Scale shape (10^12 rows): the default builds EXACT k-NN graphs via
    brute_force_topk (broadcast query side — audit/small-pool sizes
    only). At scale pass ``fwd_graph``/``bwd_graph``: the ANN output
    (ann_topk / ivf_topk / multiprobe_lsh_topk) IS that table — columns
    (query_id, cand_id, cos_sim, rank). Everything downstream is
    edge-shaped: two node-sized mean tables (map-side-combinable
    groupBys) join back onto the k·|src| candidate edges by their own
    keys, the per-src argmax window is k-bounded, and no cross join or
    full-pool broadcast exists outside the explicitly-bounded default.

    Determinism: cosines arrive 6-dp rounded (brute_force_topk
    contract); the neighborhood penalty accumulates as an INTEGER
    micro-cosine sum (round(cos·10⁶) as long) — float means summed in
    engine-dependent order flip the 6-dp margin round on boundary rows,
    integer sums are associative — then one deterministic float divide;
    margins round to 6 dp; every window tiebreaks on id — DuckDB-oracle
    exact.
    """
    from pyspark.sql.window import Window

    if fwd_graph is None:
        fwd_graph = brute_force_topk(tgt, src, k=k, id_col=id_col, vec_col=vec_col)
    if bwd_graph is None:
        bwd_graph = brute_force_topk(src, tgt, k=k, id_col=id_col, vec_col=vec_col)

    micro = F.round(F.col("cos_sim") * F.lit(1_000_000.0)).cast("long")
    fwd_avg = fwd_graph.groupBy(F.col("query_id").alias("src_id")).agg(
        F.sum(micro).alias("_fi"), F.count("*").alias("_fn")
    )
    bwd_avg = bwd_graph.groupBy(F.col("query_id").alias("tgt_id")).agg(
        F.sum(micro).alias("_bi"), F.count("*").alias("_bn")
    )
    bwd_best = bwd_graph.where(F.col("rank") == 1).select(
        F.col("query_id").alias("tgt_id"),
        F.col("cand_id").alias("back_src"),
    )
    cand = fwd_graph.select(
        F.col("query_id").alias("src_id"),
        F.col("cand_id").alias("tgt_id"),
        "cos_sim",
    )
    scored = (
        cand.join(fwd_avg, "src_id")
        .join(bwd_avg, "tgt_id")
        .withColumn(
            "margin",
            F.round(
                F.col("cos_sim")
                / (
                    (
                        F.col("_fi") / F.lit(1_000_000.0) / F.col("_fn")
                        + F.col("_bi") / F.lit(1_000_000.0) / F.col("_bn")
                    )
                    / F.lit(2.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("src_id").orderBy(
        F.desc("margin"), F.asc("tgt_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("margin") >= F.lit(float(threshold))))
        .join(bwd_best, "tgt_id", "left")
        .select(
            "src_id",
            "tgt_id",
            "cos_sim",
            "margin",
            F.coalesce(F.col("back_src") == F.col("src_id"), F.lit(False)).alias(
                "mutual"
            ),
        )
        .orderBy("src_id")
    )


def lof_scores(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 1.5,
    graph: DataFrame | None = None,
) -> DataFrame:
    """Local Outlier Factor (X214; Breunig et al. 2000) over an
    embedding column — the density-ratio outlier score curation needs
    BEFORE similarity-based ops run: LOF ≈ 1 means "as dense as my
    neighbors" (inlier), LOF >> 1 means "my neighborhood is far sparser
    than my neighbors' neighborhoods" (mis-embedded junk, OCR garbage,
    off-modality rows — the vectors that poison SemDeDup buckets and
    ANN recall). Complements knn_hubness (graph in-degree) with the
    classic local-density view.

    Cosine distance d = 1 − cos throughout. With N_k(p) the k nearest
    (deterministic id tiebreaks; exactly k, not the tie-inclusive
    textbook set — documented deviation), kdist(o) = d of o's k-th
    neighbor, reach(p,o) = max(kdist(o), d(p,o)):

        lrd(p) = |N_k| / Σ_o reach(p,o)
        LOF(p) = mean_o lrd(o) / lrd(p)

    Rows whose whole neighborhood sits at distance 0 (exact-duplicate
    collapse) have undefined density: lrd/lof are NULL there — run
    exact dedup first, as the pipeline does.

    Scale shape (10^12 rows): pass ``graph`` = the ANN output
    (query_id, cand_id, cos_sim, rank) — every downstream step is
    edge-shaped (two map-side-combinable groupBys + two hash joins on
    the edge table's own keys). The default builds the exact graph via
    brute_force_topk (broadcast query side) — bounded audit pools only.

    Determinism: distances become INTEGER micro-units (round((1−cos)·10⁶)
    on the 6-dp cosine — exact), so reach sums and lrd-mean sums are
    associative integers; lrd pins to 6 dp and re-enters as an integer;
    every ratio is ONE float divide of exact operands — DuckDB-oracle
    exact.
    """
    if graph is None:
        graph = brute_force_topk(emb, emb, k=k, id_col=id_col, vec_col=vec_col)
    edges = graph.where(F.col("rank") <= k).select(
        F.col("query_id").alias("p"),
        F.col("cand_id").alias("o"),
        F.round((F.lit(1.0) - F.col("cos_sim")) * F.lit(1_000_000.0))
        .cast("long")
        .alias("d_i"),
    )
    kdist = edges.groupBy(F.col("p").alias("o")).agg(
        F.max("d_i").alias("kd_i")
    )
    reach = edges.join(kdist, "o").select(
        "p", "o", F.greatest("kd_i", "d_i").alias("reach_i")
    )
    lrd = reach.groupBy("p").agg(
        F.sum("reach_i").alias("_sr"), F.count("*").alias("_n")
    )
    # lrd = n / (Σ reach / 1e6); NULL when the neighborhood collapsed
    lrd = lrd.select(
        "p",
        "_n",
        F.when(
            F.col("_sr") > 0,
            F.round(
                F.col("_n") * F.lit(1_000_000.0) / F.col("_sr"), 6
            ),
        ).alias("lrd"),
    ).withColumn(
        "lrd_i", F.round(F.col("lrd") * F.lit(1_000_000.0)).cast("long")
    )
    nbr_lrd = edges.join(
        lrd.select(F.col("p").alias("o"), F.col("lrd_i").alias("o_lrd_i")),
        "o",
    ).groupBy("p").agg(
        F.sum("o_lrd_i").alias("_slo"),
        F.count("o_lrd_i").alias("_nlo"),
    )
    out = (
        lrd.join(nbr_lrd, "p")
        .select(
            F.col("p").alias(id_col),
            F.round(F.col("lrd"), 6).alias("lrd"),
            F.when(
                F.col("lrd_i").isNotNull()
                & (F.col("lrd_i") > 0)
                & (F.col("_nlo") == F.col("_n")),
                F.round(
                    F.col("_slo") / (F.col("_n") * F.col("lrd_i")), 6
                ),
            ).alias("lof"),
        )
        .withColumn(
            "is_outlier",
            F.when(
                F.col("lof").isNotNull(),
                F.col("lof") >= F.lit(float(threshold)),
            ),
        )
        .orderBy(id_col)
    )
    return out


def dim_truncation_audit(
    emb: DataFrame,
    queries: DataFrame,
    dims: list[int] = (4, 8, 16),
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding dimension-truncation retrieval audit (X223; the
    Matryoshka/MRL storage question, Kusupati et al. 2022): at 10^12
    rows the embedding column IS the storage bill, and truncating 768
    dims to 64 cuts it 12× — IF retrieval survives. For each candidate
    prefix width d, run the same top-k cosine retrieval on the
    truncated vectors and report recall@k against full-width truth:

        recall@k(d) = |topk_full ∩ topk_d| / (k · |queries|)

    One row per d: (d, k, n_queries, mean_recall). Read it like the ANN
    recall audit (X31): pick the smallest d whose recall clears your
    bar, then store/serve that prefix (int8-quantize it on top —
    quantize_int8 — for another 4×).

    Scale shape: the default builds exact graphs via brute_force_topk
    (broadcast query side) — audits run on a bounded query sample, the
    X31 precedent. Recall counts are integer joins on (query, cand);
    the single mean division is the only float — DuckDB-oracle exact.
    """
    full = brute_force_topk(emb, queries, k=k, id_col=id_col, vec_col=vec_col)
    out = None
    nq = queries.select(F.col(id_col)).distinct().count()
    for d in dims:
        t_emb = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, int(d)).alias(vec_col)
        )
        t_q = queries.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, int(d)).alias(vec_col)
        )
        trunc = brute_force_topk(
            t_emb, t_q, k=k, id_col=id_col, vec_col=vec_col
        )
        hits = full.join(
            trunc.select("query_id", "cand_id"), ["query_id", "cand_id"]
        ).agg(F.count("*").cast("long").alias("n_hit"))
        row = hits.select(
            F.lit(int(d)).cast("long").alias("d"),
            F.lit(int(k)).cast("long").alias("k"),
            F.lit(int(nq)).cast("long").alias("n_queries"),
            F.round(F.col("n_hit") / F.lit(float(k * nq)), 6).alias(
                "mean_recall"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("d")
