"""LangID model + analyze() aggregation parity.

Oracle: a literal Python transcription of the reference's analyze()
(util/langid.py:290-339) fed by the SAME deterministic trigram model the
engine uses — so the Spark aggregation (threshold, byte shares, rounding,
multilingual cutoff, l1/multiling) is what's under test.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from corpusama_spark.functions import langid as L
from corpusama_spark.functions import textrules as T
from corpusama_spark.functions.seedtext import SEED_SENTENCES


@pytest.fixture(scope="module")
def model():
    return L.TrigramModel.train(SEED_SENTENCES)


def test_model_identifies_seed_languages(model):
    for lang, sents in SEED_SENTENCES.items():
        hits = 0
        for s in sents:
            cleaned = T.clean_line(s)
            got, score = model.predict_one(cleaned)
            if got == lang and score > 0.6:
                hits += 1
        assert hits >= len(sents) - 2, (lang, hits)


def test_model_low_confidence_on_garbage(model):
    for s in ["qz qz qz wx", "zzzzz kkkkk qqqqq", "mmmm wwww xxxx yyyy"]:
        _, score = model.predict_one(s)
        assert score < 0.9


def oracle_analyze(langs, nbytes, max_langs=4):
    # transcription of util/langid.py:320-338 (threshold already applied)
    uniq = set(langs)
    by = {
        k: sum(nbytes[i] for i in range(len(langs)) if langs[i] == k) for k in uniq
    }
    filesize = sum(by.values())
    n = min(len(uniq), max_langs)
    mth = 1 / (n + 1)
    ids = {}
    for k in uniq:
        share = round(by[k] / filesize, 2)
        if share >= mth:
            ids[k] = share
    return dict(sorted(ids.items(), key=lambda kv: (-kv[1], kv[0])))


def oracle_lid(model, caption, min_len=10, threshold=0.6, max_langs=4):
    lines = T.clean_lines(caption.split("\n"))
    if not lines:
        return None
    langs, nbytes = [], []
    for line in lines:
        if len(line) < min_len:
            langs.append("short")
        else:
            lang, score = model.predict_one(line)
            langs.append(lang if score > threshold else "unknown")
        nbytes.append(len(line.encode("utf8")))
    return oracle_analyze(langs, nbytes, max_langs)


CAPTIONS = [
    ("a", "The distribution of emergency food supplies continued this week."),
    ("b", "La distribution des vivres s'est poursuivie toute la semaine."),
    ("c", "El acceso humanitario a la región sigue siendo muy limitado."),
    (
        "d",
        "The response plan requires additional funding this year.\n"
        "Les écoles ont rouvert ce mois-ci après les réparations.",
    ),
    ("e", "tiny\nok"),
    ("f", "#### 123 ****"),
    ("g", "zz qq xx ww vv kk jj pp"),
    (
        "h",
        "Thousands of families have been displaced by the drought.\nshort one\n"
        "Miles de familias fueron desplazadas por la sequía persistente.",
    ),
    ("i", "SAUBERES TRINKWASSER IST JETZT AN ZWÖLF VERTEILSTELLEN VERFÜGBAR."),
]


def test_spark_lid_matches_oracle(spark, model):
    df = spark.createDataFrame(
        pd.DataFrame(CAPTIONS, columns=["image_id", "caption"])
    )
    prepped = df.withColumn("p", T.prep_caption("caption")).select(
        "image_id", F.col("p.lines").alias("lines")
    )
    labeled = L.label_lines(L.explode_lines(prepped))
    out = {r.image_id: r for r in L.aggregate_lid(labeled).collect()}
    for image_id, caption in CAPTIONS:
        expected = oracle_lid(model, caption)
        if not expected:
            # empty/garbage caption: either no rows (no lines) or empty lid
            if image_id in out:
                assert out[image_id].lid in (None, {})
            continue
        row = out[image_id]
        got = {e.lang: e.share for e in row.lid_arr}
        assert got == expected, (image_id, got, expected)
        top = max(expected.items(), key=lambda kv: (kv[1], kv[0]))[0] if expected else None
        exp_order = list(expected)
        assert row.l1 == exp_order[0]
        assert row.l1_size == pytest.approx(expected[exp_order[0]])
        exp_multi = len([k for k in expected if k not in ("unknown", "short")]) > 1
        assert row.multiling == exp_multi
        _ = top


def test_threshold_strictness(spark):
    # score exactly == threshold must relabel to unknown (util/langid.py:317)
    rows = [("x", 0, "line", "en", 0.6, 10), ("y", 0, "line", "en", 0.61, 10)]
    df = spark.createDataFrame(
        rows, "image_id string, line_no int, line string, lang string, score double, line_bytes long"
    )
    relabeled = df.select(
        "image_id",
        F.when(F.col("score") > 0.6, F.col("lang")).otherwise("unknown").alias("lang"),
        "line_bytes",
    )
    got = {r.image_id: r.lang for r in relabeled.collect()}
    assert got == {"x": "unknown", "y": "en"}


def test_lid_map_and_share_access(spark, model):
    df = spark.createDataFrame(
        pd.DataFrame(CAPTIONS[:4], columns=["image_id", "caption"])
    )
    prepped = df.withColumn("p", T.prep_caption("caption")).select(
        "image_id", F.col("p.lines").alias("lines")
    )
    out = L.aggregate_lid(L.label_lines(L.explode_lines(prepped)))
    en = out.select("image_id", L.lid_share("lid", "en").alias("s")).collect()
    shares = {r.image_id: r.s for r in en}
    assert shares["a"] and shares["a"] >= 0.8
    assert shares["b"] is None
