"""Caption-image agreement (alignment.py) and distributed bigram LM
(lm.py): Python-recomputed parity, edge semantics, plan shape.

Both operators are pure relational algebra, so the tests recompute the
exact expected values with hashlib/math on the driver and demand
bit-for-bit equality (round-6) — the same standard the DuckDB oracles
apply at the contract layer.
"""

import hashlib
import math

from pyspark.sql import functions as F

from corpusama_spark.plans.audit import report


def _bucket_sign(tok: str, dim: int) -> tuple[int, int]:
    h = hashlib.md5(tok.encode()).hexdigest()
    return int(h[:8], 16) % dim, 1 if int(h[8], 16) % 2 == 0 else -1


def _expected_score(caption: str, vec: list[float]) -> tuple[int, float]:
    dim = len(vec)
    wt: dict[int, int] = {}
    for tok in caption.lower().split():
        b, s = _bucket_sign(tok, dim)
        wt[b] = wt.get(b, 0) + s
    n2 = sum(w * w for w in wt.values())
    dot = sum(w * vec[b] for b, w in wt.items())
    vn = math.sqrt(sum(v * v for v in vec))
    return n2, round(dot / (math.sqrt(n2) * vn), 6)


def test_caption_agreement_matches_python(spark):
    from corpusama_spark.operators.alignment import caption_image_agreement

    caps = {
        10: "a red fox sits on a log",
        11: "stock photo placeholder image banner",
        12: "the the the repeated repeated",
    }
    vecs = {
        10: [0.5, -0.25, 1.0, 0.0, 0.75, -1.0, 0.125, 0.5],
        11: [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        12: [-0.5, 0.5, -0.5, 0.5, -0.5, 0.5, -0.5, 0.5],
    }
    docs = spark.createDataFrame(
        list(caps.items()), "doc_id long, text string"
    )
    images = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = {
        r.doc_id: (r.n2, r.align_score, r.keep)
        for r in caption_image_agreement(docs, images, threshold=0.05).collect()
    }
    assert set(got) == set(caps)
    for did, cap in caps.items():
        n2, score = _expected_score(cap, vecs[did])
        assert got[did] == (n2, score, score >= 0.05), did


def test_caption_agreement_drops_empty_and_zero_norm(spark):
    from corpusama_spark.operators.alignment import caption_image_agreement

    docs = spark.createDataFrame(
        [(1, "real caption here"), (2, "   "), (3, None), (4, "also real")],
        "doc_id long, text string",
    )
    images = spark.createDataFrame(
        [(1, [1.0, 0.0, 1.0, 0.0]), (2, [1.0] * 4), (3, [1.0] * 4),
         (4, [0.0, 0.0, 0.0, 0.0])],  # zero-norm image vector
        "vec_id long, embedding array<double>",
    )
    got = caption_image_agreement(docs, images).collect()
    # 2 (whitespace) and 3 (NULL) never featurize; 4 is dropped by vn > 0
    assert [r.doc_id for r in got] == [1]


def _expected_ppl(corpus: dict[int, str], k: float = 0.5):
    words = {d: t.lower().split() for d, t in corpus.items()}
    bigrams = {d: list(zip(w, w[1:])) for d, w in words.items()}
    bc: dict[tuple[str, str], int] = {}
    cc: dict[str, int] = {}
    for bgs in bigrams.values():
        for w1, w2 in bgs:
            bc[(w1, w2)] = bc.get((w1, w2), 0) + 1
            cc[w1] = cc.get(w1, 0) + 1
    vocab = {w for ws in words.values() for w in ws}
    out = {}
    for d, bgs in bigrams.items():
        if not bgs:
            continue
        lp = [
            math.log((bc[(w1, w2)] + k) / (cc[w1] + k * len(vocab)))
            for w1, w2 in bgs
        ]
        out[d] = (len(bgs), round(math.exp(-sum(lp) / len(lp)), 6))
    return out


def test_bigram_ppl_matches_python(spark):
    from corpusama_spark.operators.lm import corpus_perplexity

    corpus = {
        1: "the cat sat on the mat",
        2: "the cat ran",
        3: "a dog sat on a mat",
        4: "completely novel words appear here once",
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.ppl)
        for r in corpus_perplexity(docs).collect()
    }
    assert got == _expected_ppl(corpus)
    # common-bigram docs must be more in-domain (lower ppl) than the novel doc
    assert got[2][1] < got[4][1]


def test_bigram_ppl_short_docs_and_broadcast_off(spark):
    from corpusama_spark.operators.lm import corpus_perplexity

    corpus = {1: "one", 2: "", 3: None, 4: "two words", 5: "two words"}
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    on = {r.doc_id: r.ppl for r in corpus_perplexity(docs).collect()}
    off = {
        r.doc_id: r.ppl
        for r in corpus_perplexity(docs, broadcast_model=False).collect()
    }
    # <2-token docs produce no row; broadcast toggle never changes values
    assert set(on) == {4, 5} and on == off


def test_alignment_and_lm_plans_stay_jvm(spark):
    from corpusama_spark.operators.alignment import caption_image_agreement
    from corpusama_spark.operators.lm import corpus_perplexity

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    images = spark.createDataFrame(
        [(1, [1.0, 0.0, 1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    report(caption_image_agreement(docs, images)).assert_no_row_python()
    report(corpus_perplexity(docs)).assert_no_row_python()


def test_score_against_held_out_model(spark):
    """Train on one corpus, score DIFFERENT text: unseen bigrams hit the
    add-k floor via the left-join coalesce path (c=0, ctx=0 when the left
    word itself is novel) and stay finite."""
    from corpusama_spark.operators.lm import score_perplexity, train_bigram_lm

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [(9, "zz qq totally unseen"), (10, "the cat sat")],
        "doc_id long, text string",
    )
    bc, cc, v = train_bigram_lm(train)
    got = {r.doc_id: r.ppl for r in score_perplexity(test, bc, cc, v).collect()}
    assert set(got) == {9, 10}
    assert math.isfinite(got[9]) and got[9] > got[10]
