"""Mined-pair bitext cleaning gates (X221): each gate fires on a
handcrafted pair, reason precedence, multiset number matching."""


def _run(spark, rows):
    from corpusama_spark.operators.alignment import bitext_filter

    df = spark.createDataFrame(
        rows, "pair_id long, src_text string, tgt_text string"
    )
    return {r.pair_id: r for r in bitext_filter(df).collect()}


def test_bitext_gates(spark):
    out = _run(
        spark,
        [
            # clean pair: numbers match as multisets despite reorder
            (0, "meet at 10 on gate 7", "porte 7 rendezvous heure 10"),
            # length-ratio violation
            (1, "hi", "this side is enormously longer than the other one"),
            # number mismatch
            (2, "pay 100 euros", "paie 200 euros"),
            # untranslated copy (case-folded)
            (3, "Exact Same Text", "exact same text"),
            # empty target -> token bounds (ratio is NULL, fails first)
            (4, "something", ""),
            # both numberless: vacuously matching numbers
            (5, "no digits here", "aucun chiffre ici"),
        ],
    )
    assert out[0].keep and out[0].drop_reason is None
    assert out[0].numbers_match and not out[0].is_copy

    assert not out[1].keep and out[1].drop_reason == "len_ratio"
    assert out[1].len_ratio > 2.0

    assert not out[2].keep and out[2].drop_reason == "number_mismatch"
    assert not out[2].numbers_match

    assert not out[3].keep and out[3].drop_reason == "copy"
    assert out[3].is_copy

    assert not out[4].keep and out[4].drop_reason == "len_ratio"
    assert out[4].len_ratio is None and out[4].n_tok_tgt == 0

    assert out[5].keep and out[5].numbers_match


def test_bitext_token_bounds_and_ratio_edge(spark):
    long_side = "tok " * 501
    out = _run(
        spark,
        [
            (0, long_side, long_side + "x"),  # >500 tokens both sides
            (1, "ab", "abcd"),  # ratio exactly 2.0 -> keep
        ],
    )
    assert not out[0].keep and out[0].drop_reason == "token_bounds"
    assert out[1].keep and out[1].len_ratio == 2.0
