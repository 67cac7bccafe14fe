"""Relational PageRank with dangling redistribution (X201)."""

import numpy as np


def _mirror(edges, d=0.85, iters=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    p = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = p[outdeg == 0].sum()
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += p[idx[u]] / outdeg[idx[u]]
        p = np.round((1 - d) / n + d * (contrib + dangling / n), 9)
    return {v: (round(float(p[idx[v]]), 6), int(outdeg[idx[v]])) for v in nodes}


def test_pagerank_matches_numpy_mirror_with_dangling(spark):
    from corpusama_spark.operators.components import pagerank_full

    # a -> b -> c -> a cycle, d points into the cycle, e is dangling
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("d", "a"), ("d", "b"),
        ("a", "e"),  # e has no out-edges -> dangling
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.pr, r.outdeg) for r in pagerank_full(df).collect()}
    want = _mirror(edges)
    assert got == want
    # rank mass sums to ~1 and the cycle dominates the pure source d
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-4
    assert got["a"][0] > got["d"][0]


def test_pagerank_uniform_on_symmetric_cycle(spark):
    from corpusama_spark.operators.components import pagerank_full

    edges = [(i, (i + 1) % 5) for i in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    prs = {r.pr for r in pagerank_full(df).collect()}
    assert prs == {0.2}


def test_token_pagerank_ranks_hub_vocabulary(spark):
    from corpusama_spark.operators.components import (
        pagerank_full,
        token_cooc_edges,
    )

    rows = [(i, f"header boiler plate unique{i} word{i % 7}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    edges = token_cooc_edges(df, top_tokens=20, min_cooc=3)
    out = [r.node for r in pagerank_full(edges).limit(3).collect()]
    # the boilerplate trio co-occurs everywhere -> top centrality
    assert set(out) == {"header", "boiler", "plate"}
