"""Embedding-space health diagnostics: covariance structure, collapse
/ anisotropy audit, and the top principal component — the "is this
embedding column still carrying information?" gate run before any
similarity-based curation (semantic dedup, ANN filtering, hard-negative
mining) trusts cosine distances.

Representation collapse (all vectors crowding one direction) makes
cosine similarity uninformative: everything looks like a near-dup and
semantic dedup over-deletes.  The standard audits (Ethayarajh 2019;
Mu & Viswanath 2018 "All-but-the-Top") measure anisotropy = how much
of the second moment lives in the mean direction, and the share of
variance captured by the top principal component.

Scale shape (10^12 rows, dim d):

* ``embed_covariance`` — the d×d Gram matrix is accumulated per Arrow
  batch with one ``numpy`` matmul inside ``mapInPandas`` (vectorized,
  never per-row Python), emitting only the d(d+1)/2 upper-triangle
  partial sums per batch; the shuffle then carries ~d² tiny rows per
  partition into a map-side-combinable groupBy.  Pixels/embeddings
  never shuffle; only O(d²) floats do.
* ``embed_collapse`` — pure-JVM: one ``posexplode`` → per-dimension
  aggregate (d rows) → single-row rollup.  No Python at all.
* ``top_principal_component`` — the covariance reduce is distributed;
  the eigen step is driver-side numpy on the collected d×d matrix
  (d ≤ a few thousand ⇒ bounded, documented collect), fixed-iteration
  power method so results are deterministic across runs.

Reference anchor: corpusama has no embedding ops; this extends the
quality-gate family (reference corpus/langid.py's "trust the signal
only after auditing it" pattern) to the embedding modality required
by the image+caption north rule.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "embed_covariance",
    "embed_collapse",
    "top_principal_component",
]


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.where(F.col(vec_col).isNotNull()).select(
        F.size(vec_col).alias("d")
    ).first()
    if row is None:
        raise ValueError(f"no non-null vectors in {vec_col!r}")
    return int(row["d"])


def embed_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Population covariance matrix of the embedding column, emitted as
    the upper triangle ``(i, j, cov)`` with ``i <= j`` (d(d+1)/2 rows),
    6 dp.  NULL vectors and ragged rows (size != dim) are excluded —
    ragged rows are a data error upstream ops must surface, but a
    global audit must not crash on them.

    cov(i,j) = E[v_i v_j] - E[v_i]E[v_j]  (population, not sample —
    pinned so the DuckDB oracle is a plain expression).

    One ``mapInPandas`` pass computes the per-batch Gram matrix with a
    single float64 matmul and the per-dimension sums; only O(d²)
    partial-sum rows reach the shuffle.
    """
    if dim is None:
        dim = _infer_dim(df, vec_col)
    d = int(dim)

    vecs = df.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == d)
    ).select(F.col(vec_col).alias("v"))

    # Partial rows: (i, j, s) where j >= 0 is the triu Gram sum
    # s = sum(v_i * v_j); j == -1 carries the per-dim sum s = sum(v_i);
    # (i, j) == (-1, -1) carries the row count.
    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        iu = np.triu_indices(d)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf["v"]]
            )
            g = x.T @ x
            out = pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "s": g[iu],
                }
            )
            sums = pd.DataFrame(
                {
                    "i": np.arange(d, dtype="int32"),
                    "j": np.full(d, -1, dtype="int32"),
                    "s": x.sum(axis=0),
                }
            )
            cnt = pd.DataFrame(
                {"i": [-1], "j": [-1], "s": [float(len(pdf))]}
            )
            yield pd.concat([out, sums, cnt], ignore_index=True)

    parts = vecs.mapInPandas(gram, schema="i int, j int, s double")
    agg = parts.groupBy("i", "j").agg(F.sum("s").alias("s"))

    n = agg.where((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n")
    )
    means = agg.where((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("mi_dim"), F.col("s").alias("msum")
    )
    triu = agg.where(F.col("j") >= 0)

    return (
        triu.crossJoin(F.broadcast(n))
        .join(
            F.broadcast(means).withColumnRenamed("msum", "sum_i"),
            F.col("i") == F.col("mi_dim"),
        )
        .drop("mi_dim")
        .join(
            F.broadcast(means).withColumnRenamed("msum", "sum_j"),
            F.col("j") == F.col("mi_dim"),
        )
        .drop("mi_dim")
        .select(
            "i",
            "j",
            # + 0.0 folds IEEE -0.0 into +0.0 so engines agree on the
            # textual form of zero covariances
            (
                F.round(
                    F.col("s") / F.col("n")
                    - (F.col("sum_i") / F.col("n"))
                    * (F.col("sum_j") / F.col("n")),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def embed_collapse(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Single-row embedding-collapse audit, pure JVM:

    * ``n`` / ``n_bad`` — clean vs NULL/ragged vector counts,
    * ``mean_norm_sq`` — E[‖v‖²] (second moment),
    * ``centroid_norm_sq`` — ‖E[v]‖² (energy in the mean direction),
    * ``anisotropy`` — centroid_norm_sq / mean_norm_sq ∈ [0, 1]: ~0 is
      a healthy centered space, →1 means vectors collapse onto one ray
      and cosine similarity stops discriminating,
    * ``trace_cov`` — total variance = mean_norm_sq − centroid_norm_sq,
    * ``top_dim_var_share`` — max single-coordinate variance / trace
      (a cheap axis-aligned lower bound on PC1's share; the exact PC1
      share is ``top_principal_component``).

    One posexplode → d-row per-dimension aggregate → single-row rollup;
    the only shuffle is on the d dimension keys.
    """
    if dim is None:
        dim = _infer_dim(df, vec_col)
    d = int(dim)

    clean = F.col(vec_col).isNotNull() & (F.size(vec_col) == d)
    bad = df.agg(
        F.count(F.when(~F.coalesce(clean, F.lit(False)), 1))
        .cast("long")
        .alias("n_bad")
    )

    per_dim = (
        df.where(clean)
        .select(F.posexplode(vec_col).alias("i", "v"))
        .groupBy("i")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.avg(F.col("v").cast("double")).alias("m"),
            F.avg(
                F.col("v").cast("double") * F.col("v").cast("double")
            ).alias("m2"),
        )
    )
    roll = per_dim.agg(
        F.max("cnt").alias("n"),
        F.sum("m2").alias("mean_norm_sq"),
        F.sum(F.col("m") * F.col("m")).alias("centroid_norm_sq"),
        F.max(F.col("m2") - F.col("m") * F.col("m")).alias("maxvar"),
    )
    return roll.crossJoin(F.broadcast(bad)).select(
        F.col("n").cast("long").alias("n"),
        "n_bad",
        F.lit(d).cast("int").alias("dim"),
        F.round("mean_norm_sq", 6).alias("mean_norm_sq"),
        F.round("centroid_norm_sq", 6).alias("centroid_norm_sq"),
        F.round(
            F.when(
                F.col("mean_norm_sq") > 0,
                F.col("centroid_norm_sq") / F.col("mean_norm_sq"),
            ),
            6,
        ).alias("anisotropy"),
        F.round(
            F.col("mean_norm_sq") - F.col("centroid_norm_sq"), 6
        ).alias("trace_cov"),
        F.round(
            F.when(
                F.col("mean_norm_sq") - F.col("centroid_norm_sq") > 0,
                F.col("maxvar")
                / (F.col("mean_norm_sq") - F.col("centroid_norm_sq")),
            ),
            6,
        ).alias("top_dim_var_share"),
    )


def top_principal_component(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    iters: int = 50,
) -> DataFrame:
    """Top eigenvalue / eigenvector of the population covariance via
    fixed-iteration power method — PC1's variance share is THE collapse
    number ("all-but-the-top" removes this direction before cosine).

    The covariance reduce is the distributed ``embed_covariance`` plan;
    the eigen step collects the d×d matrix to the driver (bounded,
    O(d²) floats — d is the embedding width, never the row count) and
    runs ``iters`` deterministic power steps from the all-ones start.
    Sign convention: the eigenvector's largest-|.|-coordinate is made
    positive so results are stable across runs.

    Returns one row: (dim, iters, top_eigenvalue, trace_cov,
    top_pc_var_share, top_pc — array<double> rounded 6 dp).
    """
    import numpy as np

    if dim is None:
        dim = _infer_dim(df, vec_col)
    d = int(dim)

    rows = embed_covariance(df, vec_col, dim=d).collect()
    cov = np.zeros((d, d), dtype="float64")
    for r in rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]

    v = np.ones(d) / np.sqrt(d)
    for _ in range(int(iters)):
        w = cov @ v
        nrm = float(np.linalg.norm(w))
        if nrm == 0.0:
            break
        v = w / nrm
    lam = float(v @ cov @ v)
    k = int(np.abs(v).argmax())
    if v[k] < 0:
        v = -v
    trace = float(np.trace(cov))

    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                d,
                int(iters),
                round(lam, 6),
                round(trace, 6),
                round(lam / trace, 6) if trace > 0 else None,
                [round(float(x), 6) for x in v],
            )
        ],
        schema=(
            "dim int, iters int, top_eigenvalue double, "
            "trace_cov double, top_pc_var_share double, "
            "top_pc array<double>"
        ),
    )


def assign_to_centroids(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, d2): nearest-centroid assignment of vectors against a
    GIVEN (cell, dim, c) centroid table — the index-side primitive the
    Lloyd trainers keep inline (pq.ivf_coarse's final pass, extracted so
    staleness audits can re-assign NEW data without retraining). 6dp d2
    pin, (d2, cell) tie-break — the kmeans determinism contract."""
    dims = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select("id", "dim", F.col("v").cast("double").alias("v"))
    d2 = (
        dims.join(F.broadcast(centroids), "dim")
        .groupBy("id", "cell")
        .agg(
            F.round(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))), 6
            ).alias("d2")
        )
    )
    pick = Window.partitionBy("id").orderBy(F.asc("d2"), F.asc("cell"))
    return (
        d2.withColumn("rnk", F.row_number().over(pick))
        .where(F.col("rnk") == 1)
        .select("id", "cell", "d2")
    )


def index_staleness(
    train_assign: DataFrame,
    new_emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    drift_threshold: float = 0.5,
    residual_ratio: float = 2.0,
) -> DataFrame:
    """IVF index staleness audit (X247): is the centroid table trained
    yesterday still the right router for today's vectors? Per cell:
    train_share vs the NEW batch's share (assigned against the SAME
    frozen centroids), the share ratio, mean squared residual then and
    now, and ``stale`` when the fill ratio drifts beyond
    ``drift_threshold`` (|log-free ratio − 1|) or the residual grows
    ``residual_ratio``×. The operational question behind it: a drifted
    embedding distribution silently turns an IVF index into a skew bomb
    (hot cells → hot partitions → straggler probes) long before recall
    visibly degrades — this audit is the retrain trigger.

    Inputs: ``train_assign`` = (id, cell, d2) recorded at build time
    (ivf_coarse's assign output + d2), ``new_emb`` the fresh batch.
    Everything relational: one broadcast-centroid re-assignment, two
    bounded groupBys (≤ cells rows), one join. DuckDB-oracle-exact.
    """
    new_assign = assign_to_centroids(new_emb, centroids, id_col, vec_col)
    t = train_assign.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_train"),
        F.round(F.avg("d2"), 6).alias("train_resid"),
    )
    n = new_assign.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_new"),
        F.round(F.avg("d2"), 6).alias("new_resid"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    joined = (
        t.join(n, "cell", "full")
        .select(
            "cell",
            F.coalesce("n_train", F.lit(0)).alias("n_train"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            "train_resid",
            "new_resid",
        )
        .select(
            "*",
            (F.col("n_train") / F.sum("n_train").over(wall)).alias("_ts"),
            (F.col("n_new") / F.sum("n_new").over(wall)).alias("_ns"),
        )
    )
    ratio = F.when(
        F.col("_ts") > 0, F.round(F.col("_ns") / F.col("_ts"), 6)
    )
    resid_growth = F.when(
        F.col("train_resid") > 0,
        F.round(F.col("new_resid") / F.col("train_resid"), 6),
    )
    return joined.select(
        "cell",
        "n_train",
        "n_new",
        F.round("_ts", 6).alias("train_share"),
        F.round("_ns", 6).alias("new_share"),
        ratio.alias("share_ratio"),
        "train_resid",
        "new_resid",
        resid_growth.alias("resid_growth"),
        (
            ratio.isNull()
            | (F.abs(ratio - 1.0) > drift_threshold)
            | (resid_growth > residual_ratio)
        ).alias("stale"),
    ).orderBy("cell")
