"""Good-Turing unseen mass + Chao1 richness (X209)."""


def test_unseen_vocab_closed_forms(spark):
    from corpusama_spark.operators.skew import unseen_vocab_estimates

    rows = [
        # source a: 'x' x4, singletons y z w  -> N=7, S=4, N1=3, N2=0
        ("a", "x x y z"), ("a", "x x w"),
        # source b: every type twice -> N=6, S=3, N1=0, N2=3
        ("b", "p q r"), ("b", "p q r"),
    ]
    df = spark.createDataFrame(rows, "src string, text string")
    out = {r.src: r for r in unseen_vocab_estimates(df, "src").collect()}

    a = out["a"]
    assert (a.n_tokens, a.n_types, a.n1, a.n2) == (7, 4, 3, 0)
    assert a.gt_unseen == round(3 / 7, 6)
    assert a.chao1 == round(4 + 3 * 2 / 2, 6)  # bias-corrected, N2=0 finite
    assert a.coverage == round(4 / 7.0, 6)

    b = out["b"]
    assert (b.n1, b.n2) == (0, 3)
    assert b.gt_unseen == 0.0
    assert b.chao1 == 3.0 and b.coverage == 1.0  # nothing unseen


def test_unseen_mass_shrinks_as_corpus_repeats(spark):
    from corpusama_spark.operators.skew import unseen_vocab_estimates

    once = [("g", f"tok{i}") for i in range(50)]
    rep = once + [("g", f"tok{i}") for i in range(50)]
    d1 = spark.createDataFrame(once, "src string, text string")
    d2 = spark.createDataFrame(rep, "src string, text string")
    g1 = unseen_vocab_estimates(d1, "src").collect()[0]
    g2 = unseen_vocab_estimates(d2, "src").collect()[0]
    assert g1.gt_unseen == 1.0   # everything is a singleton
    assert g2.gt_unseen == 0.0   # full repeat: nothing new expected
    assert g2.coverage > g1.coverage
