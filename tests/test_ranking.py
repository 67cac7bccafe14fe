"""BM25 ranking (operators/ranking.py): python-recomputation parity,
edge cases, plan shape."""

import math

from pyspark.sql import functions as F

from corpusama_spark.operators.ranking import bm25_scores


def _expected(corpus: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    toks = {
        d: [t for t in txt.lower().strip().split() if t]
        for d, txt in corpus.items()
        if txt is not None
    }
    toks = {d: ts for d, ts in toks.items() if ts}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    df = {
        t: sum(1 for ts in toks.values() if t in ts)
        for t in terms
    }
    out = {}
    for d, ts in toks.items():
        score, hits = 0.0, 0
        for t in terms:
            tf = ts.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(ts) / avgdl)
            )
        if hits:
            out[d] = (round(score, 6), hits)
    return out


def test_bm25_matches_python(spark):
    corpus = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "fox fox fox and nothing else",
        3: "a long document " + "filler " * 40 + "with one fox inside",
        4: "no relevant terms at all here",
        5: None,
        6: "   ",
        7: "dog dog fox",
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.score, r.n_hit)
        for r in bm25_scores(df, ["fox", "dog"]).collect()
    }
    assert got == _expected(corpus, ["fox", "dog"])
    # rare-term idf dominates: doc 2 (3x fox, short) outranks doc 3
    assert got[2][0] > got[3][0]
    # null/blank/term-free docs never appear
    assert set(got) == {1, 2, 3, 7}


def test_bm25_plan_shape(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    out = bm25_scores(df, ["beta"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure JVM
    assert "BroadcastHashJoin" in plan  # df marginal
    assert "BroadcastNestedLoopJoin" in plan  # single-row stats total
    import pytest

    with pytest.raises(ValueError):
        bm25_scores(df, [])


def _jac_expected(corpus, n=2, thr=0.5):
    def sh(t):
        ws = t.lower().strip().split()
        out = set()
        for i in range(max(len(ws) - n + 1, 1)):
            s = " ".join(ws[i:i + n])
            if s:
                out.add(s)
        return out

    sets = {d: sh(t) for d, t in corpus.items() if t and sh(t)}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = round(inter / len(sets[a] | sets[b]), 6)
                if j >= thr:
                    out[(a, b)] = j
    return out


def test_exact_jaccard_pairs_matches_python(spark):
    from corpusama_spark.operators.dedup import exact_jaccard_pairs

    corpus = {
        1: "the quick brown fox jumps over the dog",
        2: "the quick brown fox jumps over the cat",   # near-dup of 1
        3: "completely different text about spark engines",
        4: "completely different text about spark engines",  # exact dup of 3
        5: "unrelated words entirely here",
        6: "   ",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in exact_jaccard_pairs(
            df, "text", "doc_id", threshold=0.5, shingle_n=2
        ).collect()
    }
    assert got == _jac_expected(corpus, n=2, thr=0.5)
    assert got[(3, 4)] == 1.0   # exact dup
    assert (1, 2) in got        # near-dup survives the threshold
    # df-capping: cap of 1 removes every shared shingle -> no pairs
    none = exact_jaccard_pairs(
        df, "text", "doc_id", threshold=0.0, shingle_n=2, max_df=1
    ).collect()
    assert none == []
