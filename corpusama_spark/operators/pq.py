"""Product quantization for embedding search at 10^12-vector scale
(Jégou, Douze & Schmid 2011, "Product Quantization for Nearest
Neighbor Search").

The IVF tier (similarity.py) solves the *scan* problem — probe a few
inverted lists instead of the whole corpus. PQ solves the *memory*
problem: a 64-dim float32 embedding is 256 bytes; its PQ code at
m=8 subspaces × 256 centroids is 8 bytes — a 10^12-vector index that
fits on a modest cluster's disks, with distance computed against the
codes alone (asymmetric distance computation, ADC), never the vectors.

Spark-first shape, same determinism contract as operators/kmeans.py:

- train: per-subspace Lloyd with deterministic lowest-id init, fixed
  iteration count, centroids pinned to 6 dp after every update — the
  whole train→encode→search round trip is therefore DuckDB-oracle-
  checkable, which no RNG-seeded MLlib pipeline is;
- encode: one broadcast join (codebook is m·k·d_sub rows, always tiny)
  + one groupBy — each vector collapses to (vec_id, sub, code);
- search: the query-side lookup table (LUT) is nq·m·k rows, broadcast;
  ADC distance is a groupBy-sum over m partial distances per
  (query, candidate) pair — codes are the ONLY corpus-sized thing that
  moves, m small-int rows per vector (bytes, in the packed layout).

Scale shape (10^12 rows): training reads a bounded sample in
deployment (the IVF operator's deterministic hash-sample pattern,
similarity.py); here it trains on the full contract table so the
oracle sees the identical trajectory. Encode and ADC are scan-stage
after one broadcast each. The relational exploded form below is the
oracle tier; packing codes to an array<tinyint> column and folding the
broadcast LUT with F.aggregate is a mechanical narrowing that keeps
the same numbers (pinned by test_pq.py's packed-parity case).

Reference anchor: corpusama has no ANN tier (its dedup is exact SQL,
corpusama/util/util.py dedupe paths); this extends the engine's
similarity family (SURVEY §2.10 X7–X11) with the standard
memory-bounded search layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from corpusama_spark.operators.kmeans import lowest_id_seeds

__all__ = ["pq_codebook", "pq_codes", "pq_topk", "ivf_coarse", "ivfpq_topk"]


def _dims(emb: DataFrame, id_col: str, vec_col: str, dsub: int) -> DataFrame:
    """(id, sub, dim, v): the exploded component table. ``dim`` stays
    absolute (a component belongs to exactly one subspace) so centroid
    joins key on ``dim`` alone and ``sub`` rides along."""
    return emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select(
        "id",
        F.floor(F.col("dim") / dsub).cast("int").alias("sub"),
        "dim",
        F.col("v").cast("double").alias("v"),
    )


def _infer_dim(emb: DataFrame, vec_col: str) -> int:
    row = emb.select(F.size(F.col(vec_col)).alias("d")).where(
        F.col("d") > 0
    ).head(1)
    if not row:
        raise ValueError("pq: no non-empty vectors to infer dim from")
    return int(row[0]["d"])


def pq_codebook(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """(sub, cluster, dim, c): per-subspace centroids after ``iters``
    Lloyd rounds from the deterministic lowest-id init, every update
    rounded to 6 dp (the cross-engine pin — see operators/kmeans.py)."""
    m, k, iters = int(m), int(k), int(iters)
    dim = _infer_dim(emb, vec_col)
    if dim % m != 0:
        raise ValueError(f"pq: dim={dim} not divisible by m={m}")
    dims = _dims(emb, id_col, vec_col, dim // m)

    seeds = lowest_id_seeds(emb, id_col, k)
    centroids = dims.join(F.broadcast(seeds), "id").select(
        "sub", "cluster", "dim", F.round(F.col("v"), 6).alias("c")
    )
    for _ in range(iters):
        d2 = (
            dims.join(F.broadcast(centroids.drop("sub")), "dim")
            .groupBy("id", "sub", "cluster")
            .agg(
                F.round(
                    F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))),
                    6,
                ).alias("d2")
            )
        )
        pick = Window.partitionBy("id", "sub").orderBy(
            F.asc("d2"), F.asc("cluster")
        )
        assign = (
            d2.withColumn("rnk", F.row_number().over(pick))
            .where(F.col("rnk") == 1)
            .select("id", "sub", "cluster")
        )
        centroids = (
            dims.join(assign, ["id", "sub"])
            .groupBy("sub", "cluster", "dim")
            .agg(F.round(F.avg("v"), 6).alias("c"))
        )
    return centroids


def pq_codes(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, sub, code, d2): the PQ encoding — per subspace, the
    nearest trained centroid (ties: lowest cluster id) and the squared
    residual at the pipeline's native 6 dp (re-rounding to fewer digits
    is engine-divergent on exact halves — Spark's BigDecimal HALF_UP vs
    DuckDB's correctly-rounded double disagree on e.g. 0.27795). m rows
    per vector; in the packed deployment layout this is one
    array<tinyint> column of length m."""
    dim = _infer_dim(emb, vec_col)
    if codebook is None:
        codebook = pq_codebook(emb, id_col, vec_col, m=m, k=k, iters=iters)
    dims = _dims(emb, id_col, vec_col, dim // int(m))
    d2 = (
        dims.join(F.broadcast(codebook.drop("sub")), "dim")
        .groupBy("id", "sub", "cluster")
        .agg(
            F.round(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))), 6
            ).alias("d2")
        )
    )
    pick = Window.partitionBy("id", "sub").orderBy(F.asc("d2"), F.asc("cluster"))
    return (
        d2.withColumn("rnk", F.row_number().over(pick))
        .where(F.col("rnk") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("sub").cast("int").alias("sub"),
            F.col("cluster").cast("long").alias("code"),
            F.col("d2").alias("d2"),
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    topk: int = 5,
) -> DataFrame:
    """(query_id, cand_id, adc_d2, rnk): asymmetric-distance top-k.

    The query never meets a corpus vector: distances go through the
    lookup table lut(query, sub, cluster) = ||q_sub − c_{sub,cluster}||²
    (6 dp), and a candidate's ADC distance is the sum of its m looked-up
    partials. Corpus-side traffic is the code table only. Ties break
    (adc_d2, cand_id) — the repo-standard cross-engine ordering."""
    codebook = pq_codebook(corpus, id_col, vec_col, m=m, k=k, iters=iters)
    codes = pq_codes(
        corpus, id_col, vec_col, m=m, k=k, iters=iters, codebook=codebook
    )
    dim = _infer_dim(corpus, vec_col)
    qdims = _dims(queries, id_col, vec_col, dim // int(m))
    lut = (
        qdims.join(F.broadcast(codebook.drop("sub")), "dim")
        .groupBy(
            F.col("id").alias("query_id"), "sub", F.col("cluster").alias("code")
        )
        .agg(
            F.round(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))), 6
            ).alias("pd")
        )
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("cand_id"))
        .agg(F.round(F.sum("pd"), 6).alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("cand_id"))
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(topk))
        .select("query_id", "cand_id", "adc_d2", F.col("rnk").cast("int").alias("rnk"))
    )

def ivf_coarse(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kc: int = 4,
    citers: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Coarse quantizer for IVFADC: full-dimension deterministic Lloyd
    (lowest-id init, ``citers`` rounds, 6 dp pin — operators/kmeans.py's
    contract), then one FINAL assignment pass against the trained
    centroids, because the inverted lists must be consistent with the
    centroid table the search side probes (kmeans_assign's return is the
    pre-update assignment, which is the right *clustering* answer but
    the wrong *index* answer).

    Returns (centroids (cell, dim, c), assign (id, cell))."""
    kc, citers = int(kc), int(citers)
    dims = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select("id", "dim", F.col("v").cast("double").alias("v"))

    seeds = lowest_id_seeds(emb, id_col, kc).withColumnRenamed(
        "cluster", "cell"
    )
    centroids = dims.join(F.broadcast(seeds), "id").select(
        "cell", "dim", F.round(F.col("v"), 6).alias("c")
    )
    for _ in range(citers):
        d2 = (
            dims.join(F.broadcast(centroids), "dim")
            .groupBy("id", "cell")
            .agg(
                F.round(
                    F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))),
                    6,
                ).alias("d2")
            )
        )
        pick = Window.partitionBy("id").orderBy(F.asc("d2"), F.asc("cell"))
        assign = (
            d2.withColumn("rnk", F.row_number().over(pick))
            .where(F.col("rnk") == 1)
            .select("id", "cell")
        )
        centroids = (
            dims.join(assign, "id")
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("v"), 6).alias("c"))
        )
    final_d2 = (
        dims.join(F.broadcast(centroids), "dim")
        .groupBy("id", "cell")
        .agg(
            F.round(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))), 6
            ).alias("d2")
        )
    )
    pick = Window.partitionBy("id").orderBy(F.asc("d2"), F.asc("cell"))
    assign = (
        final_d2.withColumn("rnk", F.row_number().over(pick))
        .where(F.col("rnk") == 1)
        .select("id", "cell")
    )
    return centroids, assign


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kc: int = 4,
    citers: int = 2,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    nprobe: int = 2,
    topk: int = 5,
) -> DataFrame:
    """IVFADC (Jégou 2011 §V): coarse quantizer prunes the scan, residual
    PQ codes bound the memory — the layout every production 10^12-vector
    index (FAISS IVF-PQ) ships. A query probes its ``nprobe`` nearest
    cells; within a probed cell, distance is ADC over the RESIDUAL
    (vector − cell centroid) codes via a per-(query, cell) lookup table.

    Scale shape: corpus-sized traffic is the (id, cell, sub, code) table
    — m small ints per vector, partitionable by cell so a probe touches
    only its inverted lists; centroids, codebooks and LUTs are broadcast
    (kc·d + m·k·d_sub + nq·nprobe·m·k rows). Residuals are computed once
    at index-build, exactly like FAISS's add(); nothing query-side ever
    joins the raw corpus vectors.

    Determinism contract: every trained float and distance pinned to
    6 dp; ties break on lowest cell/cluster/cand_id — the whole
    train → encode → probe → ADC pipeline replays exactly in SQL.

    Returns (query_id, cand_id, cell, adc_d2, rnk), rnk ≤ topk over the
    union of probed cells."""
    m, k, nprobe = int(m), int(k), int(nprobe)
    dim = _infer_dim(corpus, vec_col)
    if dim % m != 0:
        raise ValueError(f"ivfpq: dim={dim} not divisible by m={m}")
    dsub = dim // m

    centroids, assign = ivf_coarse(corpus, id_col, vec_col, kc, citers)
    # the Lloyd loops below re-reference these lineages many times; without
    # a persist each reference replays the whole coarse training
    centroids = centroids.persist()
    assign = assign.persist()

    # residual table: (id, cell, sub, dim, v) with v = vector − centroid
    cdims = corpus.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select("id", "dim", F.col("v").cast("double").alias("v"))
    rdims = (
        cdims.join(assign, "id")
        .join(F.broadcast(centroids), ["cell", "dim"])
        .select(
            "id",
            "cell",
            F.floor(F.col("dim") / dsub).cast("int").alias("sub"),
            "dim",
            F.round(F.col("v") - F.col("c"), 6).alias("v"),
        )
    ).persist()

    # per-subspace PQ codebook on residuals (same loop as pq_codebook,
    # over the residual dims; seeds are the kc-independent lowest ids)
    seeds = lowest_id_seeds(corpus, id_col, k)
    codebook = rdims.join(F.broadcast(seeds), "id").select(
        "sub", "cluster", "dim", F.round(F.col("v"), 6).alias("c")
    )
    for _ in range(int(iters)):
        d2 = (
            rdims.join(F.broadcast(codebook.drop("sub")), "dim")
            .groupBy("id", "sub", "cluster")
            .agg(
                F.round(
                    F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))),
                    6,
                ).alias("d2")
            )
        )
        pick = Window.partitionBy("id", "sub").orderBy(
            F.asc("d2"), F.asc("cluster")
        )
        pq_assign = (
            d2.withColumn("rnk", F.row_number().over(pick))
            .where(F.col("rnk") == 1)
            .select("id", "sub", "cluster")
        )
        codebook = (
            rdims.join(pq_assign, ["id", "sub"])
            .groupBy("sub", "cluster", "dim")
            .agg(F.round(F.avg("v"), 6).alias("c"))
        )

    # encode: nearest residual centroid per (id, sub)
    enc_d2 = (
        rdims.join(F.broadcast(codebook.drop("sub")), "dim")
        .groupBy("id", "cell", "sub", "cluster")
        .agg(
            F.round(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))), 6
            ).alias("d2")
        )
    )
    pick = Window.partitionBy("id", "sub").orderBy(F.asc("d2"), F.asc("cluster"))
    codes = (
        enc_d2.withColumn("rnk", F.row_number().over(pick))
        .where(F.col("rnk") == 1)
        .select("id", "cell", "sub", F.col("cluster").alias("code"))
    )

    # query side: probe nprobe nearest cells, residual LUT per probe
    qdims = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select("query_id", "dim", F.col("v").cast("double").alias("v"))
    probe_d2 = (
        qdims.join(F.broadcast(centroids), "dim")
        .groupBy("query_id", "cell")
        .agg(
            F.round(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))), 6
            ).alias("d2")
        )
    )
    pw = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probes = (
        probe_d2.withColumn("rnk", F.row_number().over(pw))
        .where(F.col("rnk") <= nprobe)
        .select("query_id", "cell")
    )
    rq = (
        qdims.join(F.broadcast(probes), "query_id")
        .join(F.broadcast(centroids), ["cell", "dim"])
        .select(
            "query_id",
            "cell",
            F.floor(F.col("dim") / dsub).cast("int").alias("sub"),
            "dim",
            F.round(F.col("v") - F.col("c"), 6).alias("v"),
        )
    )
    lut = (
        rq.join(F.broadcast(codebook.drop("sub")), "dim")
        .groupBy("query_id", "cell", "sub", F.col("cluster").alias("code"))
        .agg(
            F.round(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))), 6
            ).alias("pd")
        )
    )
    adc = (
        codes.join(F.broadcast(lut), ["cell", "sub", "code"])
        .where(F.col("id") != F.col("query_id"))
        .groupBy("query_id", F.col("id").alias("cand_id"), "cell")
        .agg(F.round(F.sum("pd"), 6).alias("adc_d2"))
    )
    from corpusama_spark.plans.caching import own_caches

    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("cand_id"))
    out = (
        adc.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(topk))
        .select(
            "query_id",
            "cand_id",
            F.col("cell").cast("long").alias("cell"),
            "adc_d2",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
    return own_caches(out, centroids, assign, rdims)
