"""Deterministic relational k-means (fixed-iteration Lloyd).

Clustering is the workhorse of corpus curation at scale — SemDeDup
prunes within k-means cells, data-mixing recipes weight by cluster, and
cluster cells are the standard coarse index for ANN (the IVF operator
in similarity.py consumes exactly this kind of assignment). MLlib's
KMeans exists but is RDD-era, RNG-seeded and engine-private; this
implementation is Lloyd's algorithm as PURE DataFrame relational
algebra, deterministic end to end, so the full train→assign round trip
is DuckDB-oracle-checkable like every other operator in the repo:

- init: the k lowest-id vectors are the starting centroids (k-means‖'s
  seeding would also be expressible — it's hash-ranked sampling — but
  deterministic-id init is what a cross-engine contract can pin);
- assign: squared L2 via the exploded (id, dim, v) table joined to the
  (cluster, dim, c) centroid table — one broadcast join + one groupBy,
  argmin with fixed tie-break (distance, cluster);
- update: per-(cluster, dim) mean, ROUNDED to 6 dp — the rounding is
  load-bearing: float sums are order-sensitive in the last ulps, and
  pinning centroids to 6 dp after every update keeps two engines (or
  two partitionings) on identical trajectories;
- repeat a FIXED number of iterations (convergence tests are
  float-fragile; fixed-point iteration counts are reproducible).

Scale shape (10^9 vectors): the dims table is |rows|×d — explode is
scan-stage; each iteration is one broadcast join (centroids are k×d
rows, always tiny) + two groupBys whose partial aggregation collapses
per-partition first. Iterations build ONE lazy plan; in deployment
persist the dims table across iterations (`.persist()`) — here the
plan stays pure so the oracle twin is the same expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmeans_assign"]


def kmeans_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """(id, cluster, d2) after ``iters`` Lloyd iterations from the
    deterministic lowest-id init: final assignment plus the squared L2
    distance to the winning centroid (rounded to 4 dp). See module
    docstring for the determinism contract."""
    k, iters = int(k), int(iters)
    dims = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select("id", "dim", F.col("v").cast("double").alias("v"))

    seed_w = Window.orderBy(F.asc("id"))
    seeds = (
        emb.select(F.col(id_col).alias("id"))
        .withColumn("cluster", F.row_number().over(seed_w) - 1)
        .where(F.col("cluster") < k)
    )
    centroids = (
        dims.join(F.broadcast(seeds), "id")
        .select("cluster", "dim", F.round(F.col("v"), 6).alias("c"))
    )

    assign = None
    for _ in range(iters):
        d2 = (
            dims.join(F.broadcast(centroids), "dim")
            .groupBy("id", "cluster")
            .agg(
                F.round(
                    F.sum(
                        (F.col("v") - F.col("c"))
                        * (F.col("v") - F.col("c"))
                    ),
                    6,
                ).alias("d2")
            )
        )
        pick = Window.partitionBy("id").orderBy(
            F.asc("d2"), F.asc("cluster")
        )
        assign = (
            d2.withColumn("rnk", F.row_number().over(pick))
            .where(F.col("rnk") == 1)
            .select("id", "cluster", "d2")
        )
        centroids = (
            dims.join(assign.select("id", "cluster"), "id")
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("v"), 6).alias("c"))
        )

    return assign.select(
        F.col("id").alias(id_col),
        F.col("cluster").cast("long").alias("cluster"),
        F.round(F.col("d2"), 4).alias("d2"),
    )


def kmeans_quality(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Per-cluster quality summary over the kmeans_assign output:
    member count, share of the corpus, inertia (Σ d2) and mean d2 —
    the table that says whether k is sane (one cluster holding 90% of
    rows with 10× the mean scatter means k is too small or the space
    is degenerate). Pure groupBy over the assignment table; the
    expensive part is the assignment itself."""
    assign = kmeans_assign(emb, id_col, vec_col, k=k, iters=iters)
    tot = assign.agg(F.count("*").cast("long").alias("n_total"))
    return (
        assign.groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("d2"), 4).alias("inertia"),
            F.round(F.avg("d2"), 6).alias("mean_d2"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "cluster",
            "n",
            F.round(F.col("n") / F.col("n_total").cast("double"), 6)
            .alias("share"),
            "inertia",
            "mean_d2",
        )
        .orderBy("cluster")
    )
