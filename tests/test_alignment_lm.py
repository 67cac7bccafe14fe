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


def test_caption_agreement_surfaces_ragged_embeddings(spark):
    """ADVICE r3: an embedding shorter than the inferred dim must not
    silently NULL the keep decision — default mode raises, drop mode
    excludes the ragged row and scores the rest normally."""
    import pytest

    from corpusama_spark.operators.alignment import caption_image_agreement

    docs = spark.createDataFrame(
        [(1, "real caption here"), (2, "another real caption")],
        "doc_id long, text string",
    )
    images = spark.createDataFrame(
        [(1, [1.0, 0.0, 1.0, 0.0]), (2, [1.0, 0.5])],  # row 2 is ragged
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="ragged embedding"):
        caption_image_agreement(docs, images, dim=4).collect()
    got = caption_image_agreement(docs, images, dim=4, ragged="drop").collect()
    assert [r.doc_id for r in got] == [1]
    assert all(r.keep is not None and r.align_score is not None for r in got)
    with pytest.raises(ValueError):
        caption_image_agreement(docs, images, dim=4, ragged="ignore")


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


def _expected_sb(corpus: dict[int, str], alpha: float = 0.4):
    words = {d: t.lower().split() for d, t in corpus.items()}
    tri: dict = {}
    bi: dict = {}
    uni: dict = {}
    for ws in words.values():
        for g in zip(ws, ws[1:], ws[2:]):
            tri[g] = tri.get(g, 0) + 1
        for g in zip(ws, ws[1:]):
            bi[g] = bi.get(g, 0) + 1
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
    n = sum(uni.values())
    out = {}
    for d, ws in words.items():
        tgs = list(zip(ws, ws[1:], ws[2:]))
        if not tgs:
            continue
        ss = []
        for w1, w2, w3 in tgs:
            if tri.get((w1, w2, w3), 0) > 0:
                s = tri[(w1, w2, w3)] / bi[(w1, w2)]
            elif bi.get((w2, w3), 0) > 0:
                s = alpha * bi[(w2, w3)] / uni[w2]
            else:
                s = alpha * alpha * uni.get(w3, 0) / n
            ss.append(math.log(s))
        out[d] = (len(tgs), round(sum(ss) / len(ss), 6))
    return out


def test_stupid_backoff_self_score_matches_python(spark):
    """Self-score parity. Note: in self-scoring every trigram is seen by
    construction, so only the trigram tier fires — the backoff tiers are
    exercised by the held-out test below."""
    from corpusama_spark.operators.lm import corpus_stupid_backoff

    corpus = {
        1: "the cat sat on the mat",
        2: "the cat sat quietly",
        3: "a dog sat on a rug",
        4: "zz cat sat here",
        5: "qq rr mat",
        6: "two words",                  # no trigram -> no row
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_trigrams, r.sb_logscore)
        for r in corpus_stupid_backoff(docs).collect()
    }
    assert got == _expected_sb(corpus)
    assert 6 not in got
    # a doc whose context repeats (c3 < c2) scores below ln(1)=0;
    # a doc of corpus-unique trigrams scores exactly 0
    assert got[1][1] < 0.0 == got[5][1]


def test_stupid_backoff_held_out_exercises_backoff_tiers(spark):
    """Held-out scoring: trigram tier, bigram-backoff tier (alpha), and
    unigram tier (alpha^2) all fire, matching the Python recomputation."""
    from corpusama_spark.operators.lm import (
        score_stupid_backoff,
        train_stupid_backoff,
    )

    train_corpus = {
        1: "the cat sat on the mat",
        2: "the cat ran off quickly",
    }
    test_corpus = {
        9: "the cat sat",          # trigram tier: seen
        10: "zz cat sat",          # bigram tier: "cat sat" seen, trigram not
        11: "zz qq mat",           # unigram tier: "qq mat" bigram unseen
    }
    train = spark.createDataFrame(
        list(train_corpus.items()), "doc_id long, text string"
    )
    test = spark.createDataFrame(
        list(test_corpus.items()), "doc_id long, text string"
    )
    tri, bi, uni, tot = train_stupid_backoff(train)
    got = {
        r.doc_id: (r.n_trigrams, r.sb_logscore)
        for r in score_stupid_backoff(test, tri, bi, uni, tot).collect()
    }
    # recompute against the TRAIN counts
    words = {d: t.lower().split() for d, t in train_corpus.items()}
    trid, bid, unid = {}, {}, {}
    for ws in words.values():
        for g in zip(ws, ws[1:], ws[2:]):
            trid[g] = trid.get(g, 0) + 1
        for g in zip(ws, ws[1:]):
            bid[g] = bid.get(g, 0) + 1
        for w in ws:
            unid[w] = unid.get(w, 0) + 1
    n = sum(unid.values())
    exp = {}
    for d, t in test_corpus.items():
        ws = t.split()
        scores = []
        for w1, w2, w3 in zip(ws, ws[1:], ws[2:]):
            if trid.get((w1, w2, w3), 0) > 0:
                s = trid[(w1, w2, w3)] / bid[(w1, w2)]
            elif bid.get((w2, w3), 0) > 0:
                s = 0.4 * bid[(w2, w3)] / unid[w2]
            else:
                s = 0.4 * 0.4 * unid.get(w3, 0) / n
            scores.append(math.log(s))
        exp[d] = (len(scores), round(sum(scores) / len(scores), 6))
    assert got == exp
    # tiers strictly ordered: exact > bigram backoff > unigram backoff
    assert got[9][1] > got[10][1] > got[11][1]


def _kn_expected(
    train_corpus: dict[int, str],
    test_corpus: dict[int, str],
    discount: float | None = None,
) -> dict[int, tuple[int, float]]:
    """Python recomputation of interpolated-KN perplexity, mirroring
    score_kneser_ney's arithmetic (incl. held-out OOV branches)."""
    bc: dict[tuple[str, str], int] = {}
    for t in train_corpus.values():
        ws = t.lower().split()
        for g in zip(ws, ws[1:]):
            bc[g] = bc.get(g, 0) + 1
    ctx: dict[str, int] = {}
    fwd: dict[str, int] = {}
    rev: dict[str, int] = {}
    for (w1, w2), c in bc.items():
        ctx[w1] = ctx.get(w1, 0) + c
        fwd[w1] = fwd.get(w1, 0) + 1
        rev[w2] = rev.get(w2, 0) + 1
    t_types = float(len(bc))
    n1 = float(sum(1 for c in bc.values() if c == 1))
    n2 = float(sum(1 for c in bc.values() if c == 2))
    if discount is None:
        d = n1 / (n1 + 2.0 * n2) if n1 + 2.0 * n2 > 0 else 0.5
    else:
        d = discount
    out = {}
    for did, t in test_corpus.items():
        ws = t.lower().split()
        grams = list(zip(ws, ws[1:]))
        if not grams:
            continue
        lp = 0.0
        for w1, w2 in grams:
            cv = float(bc.get((w1, w2), 0))
            cx = float(ctx.get(w1, 0))
            pcont = rev.get(w2, 0) / t_types
            if cx > 0:
                p = (max(cv - d, 0.0) + d * fwd[w1] * pcont) / cx
            elif pcont > 0:
                p = pcont
            else:
                p = 1.0 / t_types
            lp += math.log(p)
        out[did] = (len(grams), round(math.exp(-lp / len(grams)), 6))
    return out


def test_kneser_ney_self_score_matches_python(spark):
    """Self-score parity (the oracled composition): estimated discount
    D = n1/(n1+2*n2), every bigram seen -> only the interpolated branch."""
    from corpusama_spark.operators.lm import corpus_kneser_ney

    corpus = {
        1: "the cat sat on the mat",
        2: "the cat sat quietly",
        3: "a dog sat on a rug",
        4: "the dog ate the mat",
        5: "one",                      # no bigram -> no row
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.kn_ppl)
        for r in corpus_kneser_ney(docs).collect()
    }
    assert got == _kn_expected(corpus, corpus)
    assert 5 not in got
    # frequent contexts ("the cat") make doc 1/2 more predictable than 3
    assert got[1][1] < got[3][1]


def test_kneser_ney_held_out_branches_and_fixed_discount(spark):
    """Held-out scoring exercises the unseen-context (pure continuation)
    and fully-OOV (1/t floor) branches; fixed discount pins D."""
    from corpusama_spark.operators.lm import (
        score_kneser_ney,
        train_kneser_ney,
    )

    train_corpus = {
        1: "the cat sat on the mat",
        2: "the cat ran off",
    }
    test_corpus = {
        9: "the cat sat",    # both bigrams seen: interpolated branch
        10: "zz cat ran",    # "zz cat": unseen context -> Pcont(cat)
        11: "zz qq",         # qq never a continuation -> 1/t floor
    }
    train = spark.createDataFrame(
        list(train_corpus.items()), "doc_id long, text string"
    )
    test = spark.createDataFrame(
        list(test_corpus.items()), "doc_id long, text string"
    )
    model = train_kneser_ney(train)
    got = {
        r.doc_id: (r.n_bigrams, r.kn_ppl)
        for r in score_kneser_ney(test, *model, discount=0.75).collect()
    }
    assert got == _kn_expected(train_corpus, test_corpus, discount=0.75)
    # the OOV doc must be strictly less predictable than the seen one
    assert got[11][1] > got[9][1]
