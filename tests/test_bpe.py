"""Distributed BPE merge-rule training (X197)."""

import re
from collections import Counter


def _mirror_train(texts, n_merges):
    words = Counter()
    for t in texts:
        for w in (t or "").strip().lower().split():
            if re.fullmatch(r"[a-z0-9]+", w):
                words[w] += 1
    syms = {w: " ".join(list(w)) + " </w>" for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, c in words.items():
            parts = syms[w].split(" ")
            for a, b in zip(parts, parts[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        # max count, then lexicographic pair
        (p1, p2), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, p1, p2, cnt))
        pat, rep = f" {p1} {p2} ", f" {p1}{p2} "
        for w in syms:
            s = " " + syms[w] + " "
            s = re.sub(re.escape(pat), rep, s)
            s = re.sub(re.escape(pat), rep, s)
            syms[w] = s.strip()
    return merges


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "low lower lowest newer newest wider widest",
    "low low low lower lower newest newest newest",
    "THE QUICK BROWN FOX",  # lowercased into the same counts
    "punct! stays-out 100 200 100",
    None,
]


def test_bpe_train_matches_python_mirror(spark):
    from corpusama_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = bpe_train(df, "text", n_merges=10)
    want = _mirror_train(TEXTS, 10)
    assert got == want
    # learned rules look like BPE: early merges include high-freq word ends
    assert all(cnt > 0 for _, _, _, cnt in got)
    ranks = [r for r, *_ in got]
    assert ranks == list(range(1, 11))


def test_bpe_apply_counts_subword_tokens(spark):
    from corpusama_spark.operators.bpe import bpe_apply, bpe_train

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe_train(df, "text", n_merges=10)
    out = {
        r.text: r.bpe_tokens
        for r in bpe_apply(df, merges, "text").collect()
    }
    # every fully-merged word contributes >=1 token; unmerged chars more
    assert out["the quick brown fox jumps over the lazy dog"] >= 9
    assert out[None] is None or out[None] == 0 or out[None] is None
    # more merges -> fewer or equal tokens
    fewer = {
        r.text: r.bpe_tokens
        for r in bpe_apply(df, merges[:2], "text").collect()
    }
    for t in TEXTS:
        if t and out.get(t) is not None and fewer.get(t) is not None:
            assert out[t] <= fewer[t]


def test_bpe_run_of_identical_symbols_is_pinned(spark):
    """The two-pass contract: a 6-run merges to the documented maximal
    pairing, identically in Spark and the python mirror."""
    from corpusama_spark.operators.bpe import bpe_train

    texts = ["aaaaaa aaaaaa bb bb bb"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, "text", n_merges=2)
    want = _mirror_train(texts, 2)
    assert got == want
