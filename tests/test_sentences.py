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


def test_language_aware_split(spark):
    """M5: per-language rules — abbreviation dots don't end sentences,
    Spanish inverted punctuation opens them (the reference's NLTK-language
    table, base_pipeline.py:46-50, re-expressed as rules)."""
    from corpusama_spark.operators.sentences import split_sentences

    cases = [
        ("en", "Mr. Smith went to Washington. He left.",
         ["Mr. Smith went to Washington.", "He left."]),
        ("fr", "M. Dupont est arrivé. Il part demain.",
         ["M. Dupont est arrivé.", "Il part demain."]),
        ("es", "Él dijo ¿Cuándo vienes? mañana. Sr. García lo sabe.",
         ["Él dijo", "¿Cuándo vienes?", "mañana.", "Sr. García lo sabe."]),
    ]
    for lang, text, want in cases:
        df = spark.createDataFrame([(text,)], ["t"])
        got = df.select(split_sentences(F.col("t"), lang).alias("s")).first().s
        assert got == want, (lang, got, want)
    # the language-agnostic default would wrongly split after 'Mr.'
    df = spark.createDataFrame([(cases[0][1],)], ["t"])
    base = df.select(split_sentences(F.col("t")).alias("s")).first().s
    assert base[0] == "Mr."


def test_split_sentences_for_column_lang(spark):
    from corpusama_spark.operators.sentences import split_sentences_for

    df = spark.createDataFrame(
        [("en", "Dr. Who ran. Fast."), ("es", "Hola ¿qué tal? bien."),
         ("de", "Einfach. Zwei Sätze.")],
        ["lang", "t"],
    )
    got = {
        r.lang: r.s
        for r in df.select(
            "lang", split_sentences_for("t", "lang").alias("s")
        ).collect()
    }
    assert got["en"] == ["Dr. Who ran.", "Fast."]
    assert got["es"] == ["Hola", "¿qué tal?", "bien."]
    assert got["de"] == ["Einfach.", "Zwei Sätze."]  # fallback rule
