"""Obfuscation-folded lexicon gate (X241): leet variants caught and
counted as obfuscated, clean text passes, fold map edges ('!', years,
prices), severity gate, empty/NULL docs."""


def _lex(spark):
    return spark.createDataFrame(
        [("badword", 2), ("slurx", 3), ("spamterm", 1)],
        "term string, severity int",
    )


def test_fold_and_hits(spark):
    from corpusama_spark.functions.lexicon import lexicon_hits

    docs = spark.createDataFrame(
        [
            (1, "a perfectly clean sentence about kittens"),
            (2, "you absolute BADWORD and also b4dw0rd again"),
            (3, "the $lurx wrote 5lurx twice"),
            (4, "spamterm! spamterm!!!"),       # trailing ! splits off
            (5, "prices like $100 and years like 2019 are not hits"),
            (6, ""),
            (7, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lexicon_hits(docs, _lex(spark)).collect()}

    assert out[1].n_hits == 0 and out[1].terms == ""
    # raw uppercase + leet variant: both hit, one counts as obfuscated
    assert out[2].n_hits == 2 and out[2].n_obfuscated == 1
    assert out[2].max_severity == 2 and out[2].terms == "badword"
    # $ and 5 both fold to s
    assert out[3].n_hits == 2 and out[3].n_obfuscated == 2
    assert out[3].max_severity == 3
    # '!' is NOT folded: it splits, so "spamterm!!!" still hits
    assert out[4].n_hits == 2 and out[4].n_obfuscated == 0
    # digits fold inside tokens ($100 -> ioo etc.) but match no term
    assert out[5].n_hits == 0
    assert out[6].n_hits == 0 and out[7].n_hits == 0


def test_gate_thresholds(spark):
    from corpusama_spark.functions.lexicon import lexicon_gate

    docs = spark.createDataFrame(
        [(1, "clean"), (2, "mild spamterm here"), (3, "sl0rx? no: slurx")],
        "doc_id long, text string",
    )
    strict = {r.doc_id: r.keep for r in lexicon_gate(docs, _lex(spark)).collect()}
    assert strict == {1: True, 2: False, 3: False}
    lax = {
        r.doc_id: r.keep
        for r in lexicon_gate(
            docs, _lex(spark), max_hits=1, max_severity=1
        ).collect()
    }
    # severity 1 single hit tolerated; severity 3 never
    assert lax == {1: True, 2: True, 3: False}
