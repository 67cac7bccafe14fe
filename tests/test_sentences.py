"""Sentence-level LI (secondary_pipeline semantics: M3/A7/M5)."""

from pyspark.sql import functions as F

from corpusama_spark.operators.sentences import annotate_sentences, sentence_rows


def test_sentence_split_and_renumber(spark):
    df = spark.createDataFrame(
        [("a", "One two three four. Cinq six sept huit! Short.\nNine ten e11 t12?")],
        ["image_id", "caption_norm"],
    )
    rows = sentence_rows(df).collect()
    assert [r.sent_id for r in rows] == [0, 1, 2, 3]
    assert rows[0].sentence == "One two three four."
    assert rows[3].sentence == "Nine ten e11 t12?"


def test_annotate_short_skip_and_labels(spark):
    df = spark.createDataFrame(
        [
            (
                "a",
                "The distribution of emergency food supplies continued. "
                "La distribution des vivres d'urgence s'est poursuivie. "
                "Tiny one.",
            )
        ],
        ["image_id", "caption_norm"],
    )
    out = {
        r.sent_id: r.sent_lang
        for r in annotate_sentences(sentence_rows(df)).collect()
    }
    assert out[0] == "en"
    assert out[1] == "fr"
    assert out[2] is None  # < 4 tokens -> skipped (reference keeps original)


def test_long_sentence_chunk_majority(spark):
    # 2 chunks of english + 1 of french tokens with long=5: majority en
    en = "the water supply and the response plan for the northern camps"
    fr = "la distribution des vivres"
    df = spark.createDataFrame(
        [("a", f"{en} {fr}")], ["image_id", "caption_norm"]
    )
    out = annotate_sentences(sentence_rows(df), short=4, long=5).collect()
    assert len(out) == 1
    assert out[0].sent_lang == "en"
    # determinism across partitioning
    df2 = df.repartition(8)
    out2 = annotate_sentences(sentence_rows(df2), short=4, long=5).collect()
    assert out2[0].sent_lang == out[0].sent_lang
