"""Homoglyph spoofing gate (X228): spoof vs legit-Cyrillic vs
code-switching semantics, counts, flag."""


def test_confusable_stats(spark):
    from corpusama_spark.operators.textstats import confusable_stats

    # NOTE: strings below deliberately mix Cyrillic lookalikes into
    # Latin-shaped tokens; comments mark which chars are Cyrillic.
    rows = [
        (0, "pay with pаypal now"),  # а Cyrillic -> spoof
        (1, "привет мир"),  # pure Cyrillic, no Latin -> clean
        (2, "ssh-сервер down"),  # mixed token with REAL Cyrillic -> mixed, not spoof
        (3, "plain ascii text only"),
        (4, "frее оffеr tоdаy"),  # 3 spoofed tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in confusable_stats(df).collect()}

    assert (out[0].n_mixed, out[0].n_spoof, out[0].spoof_flag) == (1, 1, True)
    assert (out[1].n_mixed, out[1].n_spoof, out[1].spoof_flag) == (
        0,
        0,
        False,
    )
    # 'сервер' is real Cyrillic (в and р... в is not a lookalike) glued
    # to latin 'ssh-' -> mixed fires, spoof must NOT
    assert (out[2].n_mixed, out[2].n_spoof, out[2].spoof_flag) == (
        1,
        0,
        False,
    )
    assert (out[3].n_mixed, out[3].n_spoof) == (0, 0)
    assert (out[4].n_mixed, out[4].n_spoof, out[4].spoof_flag) == (3, 3, True)
    assert out[4].mixed_share == 1.0
