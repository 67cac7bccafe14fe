"""Label propagation (X224): python mirror, two-cliques-one-bridge
community split (the LSH chain-collapse fix), layout invariance."""

import numpy as np


def _mirror(edges, rounds):
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({a for a, _ in und})
    nbrs = {n: [] for n in nodes}
    for a, b in und:
        nbrs[a].append(b)
    lab = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            votes = {}
            for m in nbrs[n]:
                votes[lab[m]] = votes.get(lab[m], 0) + 1
            votes[lab[n]] = votes.get(lab[n], 0) + 1  # self-vote
            new[n] = min(votes, key=lambda l: (-votes[l], l))
        lab = new
    return lab


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_lpa_breaks_bridged_cliques(spark):
    from corpusama_spark.operators.components import (
        connected_components,
        label_propagation,
    )
    from pyspark.sql import functions as F

    # clique 0-4, clique 10-14, one weak bridge 4-10 (the LSH chain edge)
    edges = [
        (a, b) for grp in ([0, 1, 2, 3, 4], [10, 11, 12, 13, 14])
        for i, a in enumerate(grp) for b in grp[i + 1 :]
    ] + [(4, 10)]
    df = _df(spark, edges)
    got = {
        r.node: r.community
        for r in label_propagation(df, rounds=4).collect()
    }
    assert got == _mirror(edges, 4)
    # both cliques converge internally, and the bridge does NOT merge them
    assert len({got[n] for n in range(5)}) == 1
    assert len({got[n] for n in range(10, 15)}) == 1
    assert got[0] != got[10]
    # contrast: connected components glues everything into one blob
    cc = connected_components(
        df.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    assert cc.select("component").distinct().count() == 1


def test_lpa_mirror_random_graph_and_layout(spark):
    from corpusama_spark.operators.components import label_propagation

    rng = np.random.RandomState(6)
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, 40, size=(120, 2))
        if a != b
    ]
    df = _df(spark, edges)
    got = {
        r.node: r.community
        for r in label_propagation(df, rounds=3).collect()
    }
    assert got == _mirror(edges, 3)
    again = {
        r.node: r.community
        for r in label_propagation(df.repartition(7), rounds=3).collect()
    }
    assert again == got
