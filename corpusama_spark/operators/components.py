"""Connected components over near-dup pairs → dedup clusters.

Every large-scale dedup ends here: pair generators (minhash LSH, simhash /
phash hamming bands, embedding buckets) emit EDGES, but the keep/drop
decision needs CLUSTERS — one canonical document per connected component.

Algorithm: iterative label propagation ("hash-min"): every node starts
labeled with its own id; each round, a node adopts the minimum label among
itself and its neighbors. Converges in O(component diameter) rounds — for
dedup graphs (dense clusters around a template, small diameter) typically
3-5. Each round is one shuffle join keyed by node id; labels are persisted
per round and the previous round unpersisted, with ``localCheckpoint``
every few rounds so the lineage (and task-retry cost) stays bounded on a
long chain. For adversarial long-chain graphs, the large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce") halves
diameter per round — the same join shape, O(log d) rounds; hash-min is the
right default for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    checkpoint_every: int = 5,
    fixed_iters: int | None = None,
) -> DataFrame:
    """(id, component) with component = min id reachable from the node.

    ``fixed_iters`` runs exactly that many propagation rounds with NO
    driver-side convergence actions (for plan-only contexts where the
    graph's diameter is known); otherwise rounds run until a cheap
    count-of-changes action reports a fixpoint (early-exits almost always).
    """
    from corpusama_spark.plans.caching import own_caches

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(
                F.col(id_b).alias("src"), F.col(id_a).alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .persist()
    )
    labels_handle = labels
    rounds = fixed_iters if fixed_iters is not None else max_iters
    for i in range(rounds):
        # min neighbor label per node, one hop
        prop = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_handle = (
            labels.join(prop, labels.id == prop.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
            )
            .persist()
        )
        new_labels = new_handle
        if (i + 1) % checkpoint_every == 0:
            # truncate lineage so task retries never replay all rounds;
            # localCheckpoint is eager, so the pre-checkpoint cache can be
            # released right away. Superseded checkpoint BLOCKS are owned by
            # Spark's ContextCleaner (DataFrame.unpersist does not touch
            # them) and are reclaimed when their DataFrames are GC'd.
            new_labels = new_handle.localCheckpoint()
            new_handle.unpersist()
            new_handle = new_labels
        if fixed_iters is None:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .where(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            labels_handle.unpersist()
            labels, labels_handle = new_labels, new_handle
            if changed == 0:
                break
        else:
            labels_handle.unpersist()
            labels, labels_handle = new_labels, new_handle
    edges.unpersist()
    return own_caches(
        labels.select("id", F.col("comp").alias("component")), labels_handle
    )


def cluster_canonicals(components: DataFrame) -> DataFrame:
    """One row per cluster: (component, n_members) — the keep list is
    `component == id` rows of the components table itself."""
    return components.groupBy("component").agg(
        F.count("*").alias("n_members")
    )
