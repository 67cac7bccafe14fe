"""Secret-Sharer canary exposure (X215): exact rank/exposure mechanics
and memorized-vs-novel separation through the real bigram-LM chain."""

import math


def test_canary_exposure_mechanics(spark):
    from corpusama_spark.operators.privacy import canary_exposure

    # group g1: canary is rank 1 of 4 -> exposure = log2(4); group g2:
    # canary ties a distractor on ppl and loses the id tiebreak
    rows = [
        ("g1", 10, 5.0, False),
        ("g1", 11, 3.0, False),
        ("g1", 12, 9.0, False),
        ("g1", 1, 2.0, True),
        ("g2", 20, 4.0, False),
        ("g2", 21, 7.0, False),
        ("g2", 30, 4.0, True),
    ]
    df = spark.createDataFrame(
        rows, "canary_id string, cand_id long, ppl double, is_canary boolean"
    )
    out = {r.canary_id: r for r in canary_exposure(df).collect()}
    g1 = out["g1"]
    assert (g1.n_candidates, g1.canary_rank, g1.memorized) == (4, 1, True)
    assert g1.exposure == round(math.log2(4), 6)
    g2 = out["g2"]
    assert (g2.n_candidates, g2.canary_rank, g2.memorized) == (3, 2, False)
    assert g2.exposure == round(
        (math.log(3) - math.log(2)) / 0.6931471805599453, 6
    )


def test_canary_exposure_separates_memorized_from_novel(spark):
    from corpusama_spark.operators.lm import (
        score_perplexity,
        train_bigram_lm,
    )
    from corpusama_spark.operators.privacy import canary_exposure
    from pyspark.sql import functions as F

    # corpus: the canary phrase repeated verbatim many times + varied
    # filler. A model trained on it scores the planted phrase far better
    # than a never-seen token string.
    phrase = "the secret number is 42717"
    filler = [
        f"document {i} talks about weather {i % 7} and rivers {i % 5}"
        for i in range(30)
    ]
    corpus = [(i, phrase) for i in range(20)] + [
        (100 + i, t) for i, t in enumerate(filler)
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    model = train_bigram_lm(docs)

    cands_txt = [(0, 0, phrase, True), (1, 0, "zqx wvu ponm krf tbd", True)]
    for j, t in enumerate(filler[:15]):
        cands_txt.append((0, 1 + j, t, False))
        cands_txt.append((1, 1 + j, t, False))
    cand_docs = spark.createDataFrame(
        cands_txt, "canary_id long, cand_id long, text string, is_canary boolean"
    )
    sc = score_perplexity(
        cand_docs.select(
            F.concat_ws("_", "canary_id", "cand_id").alias("doc_id"), "text"
        ),
        *model,
        id_col="doc_id",
    )
    cands = cand_docs.join(
        sc.select(
            F.split("doc_id", "_")[0].cast("long").alias("canary_id"),
            F.split("doc_id", "_")[1].cast("long").alias("cand_id"),
            "ppl",
        ),
        ["canary_id", "cand_id"],
    )
    out = {r.canary_id: r for r in canary_exposure(cands).collect()}
    assert out[0].memorized and out[0].exposure == round(math.log2(16), 6)
    assert not out[1].memorized
    assert out[0].exposure > out[1].exposure
