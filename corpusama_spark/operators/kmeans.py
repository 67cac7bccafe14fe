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

__all__ = ["kmeans_assign", "kcenter_select", "lowest_id_seeds"]


def lowest_id_seeds(df: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, cluster) for the k lowest ids, cluster = 0-based rank — the
    deterministic init table. Round-5 rewrite: the original ran
    ``row_number`` over an UNPARTITIONED id-ordered window (the whole
    corpus through one task just to pick k rows); now ``orderBy.limit``
    compiles to TakeOrderedAndProject (per-partition top-k + driver
    merge of k·n_partitions candidates) and the k-row result — k is a
    codebook-sized constant — is rebuilt as a literal DataFrame, the
    same bounded-collect tier as the PQ codebooks and LUTs."""
    from pyspark.sql import types as T

    ids = sorted(
        r[0]
        for r in df.select(F.col(id_col).alias("id")).orderBy("id").limit(int(k)).collect()
    )
    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("cluster", T.IntegerType()),
        ]
    )
    return df.sparkSession.createDataFrame(
        [(i, c) for c, i in enumerate(ids)], schema
    )


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

    seeds = lowest_id_seeds(emb, id_col, k)
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


def kcenter_select(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 6,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal — the 2-approximation to the NP-hard k-center optimum;
    Sener & Savarese 2018 use exactly this as the active-learning /
    data-selection coreset): start from the lowest-id vector, then k−1
    times pick the point FARTHEST from the selected set (max over rows
    of min-distance-to-centers, squared L2, ties to the lower id).
    Returns (rank, id, radius): the selection order plus each pick's
    distance-to-cover at selection time — rank r's radius is the exact
    covering radius of the first r−1 centers (0.0 for the seed), so the
    output doubles as the coverage curve that says what k buys.

    Determinism contract: distances are ROUNDED to 6 dp before the
    argmax (same load-bearing pin as the Lloyd centroids above), so two
    engines and two partitionings walk identical trajectories.

    Scale shape (10^9 vectors): each of the k−1 rounds is one
    scan-stage JVM distance expression against the NEWEST center
    (broadcast as d literals — mind is updated incrementally, so only
    ONE center's distances are computed per round, not r) + one 1-row
    max agg. Driver state is k ids and one d-vector per round. k
    Spark jobs total; the corpus never re-shuffles.
    """
    k = int(k)
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    first = base.orderBy("id").limit(1).collect()[0]
    out_rows = [(1, first.id, 0.0)]
    centre = [float(x) for x in first.vec]

    def _dist_to(vals: list[float]) -> F.Column:
        carr = F.array(*[F.lit(v) for v in vals])
        return F.round(
            F.aggregate(
                F.zip_with(
                    F.col("vec"), carr, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    # persist each round's mind column: the plan is built incrementally,
    # and without the persist every round's action would lazily REPLAY
    # all prior rounds' distance updates (O(k²) scans instead of O(k)).
    cur = base.withColumn("mind", _dist_to(centre)).persist()
    for rank in range(2, k + 1):
        # argmax(mind), ties to the LOWER id: max over (mind, -id)
        top = cur.agg(
            F.max(F.struct(F.col("mind"), (-F.col("id")).alias("nid")))
        ).collect()[0][0]
        sel_id = -top.nid
        sel = cur.where(F.col("id") == sel_id).select("vec").collect()[0]
        out_rows.append((rank, sel_id, float(top.mind)))
        centre = [float(x) for x in sel.vec]
        nxt = cur.withColumn(
            "mind", F.least(F.col("mind"), _dist_to(centre))
        ).persist()
        nxt.count()  # materialize before dropping the parent cache
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    spark = emb.sparkSession
    return spark.createDataFrame(
        out_rows, "rank int, id long, radius double"
    )
