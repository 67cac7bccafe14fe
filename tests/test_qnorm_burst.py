"""Quantile normalization and token burstiness."""


def test_quantile_normalize_maps_ref_to_itself_and_matches_hand(spark):
    from corpusama_spark.operators.quantiles import quantile_normalize

    rows = (
        # ref group: values 10,20,30,40 (n_ref=4)
        [(1, "ref", 10), (2, "ref", 20), (3, "ref", 30), (4, "ref", 40)]
        # other group: 2 values -> ranks 1,2 of n=2 -> idx ceil(r*4/2)
        + [(5, "b", 7), (6, "b", 99)]
    )
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = {r.id: r for r in quantile_normalize(
        df, "g", "v", "id", "ref").collect()}
    for i, expect in [(1, 10), (2, 20), (3, 30), (4, 40)]:
        assert out[i].mapped == expect  # reference maps to itself
    assert out[5].mapped == 20  # idx = ceil(1*4/2) = 2
    assert out[6].mapped == 40  # idx = ceil(2*4/2) = 4
    assert out[5].q == 0.5 and out[6].q == 1.0


def test_quantile_normalize_equalizes_distributions(spark):
    from corpusama_spark.operators.quantiles import quantile_normalize

    # same-size groups: after normalization, group b's multiset of
    # mapped values must equal the reference's values exactly
    rows = [(i, "ref", i * 10) for i in range(1, 9)] + [
        (100 + i, "b", i * 1000 + 5) for i in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = quantile_normalize(df, "g", "v", "id", "ref").collect()
    ref_vals = sorted(r.v for r in out if r.g == "ref")
    b_mapped = sorted(r.mapped for r in out if r.g == "b")
    assert b_mapped == ref_vals


def test_token_burstiness_poisson_vs_clumped(spark):
    from corpusama_spark.operators.textstats import token_burstiness

    # "even" appears once in every doc (fano = 0: constant count);
    # "bursty" appears 10 times in one doc only
    docs = [(i, "even " + ("bursty " * 10 if i == 0 else "pad")) for i in
            range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.tok: r for r in token_burstiness(
        df, "text", "doc_id", min_df=1).collect()}
    assert out["even"].fano == 0.0  # variance of constant 1 is 0
    assert out["even"].df == 10 and out["even"].total == 10
    # bursty: n=10, s1=10, s2=100 -> fano = (1000-100)/100 = 9
    assert out["bursty"].fano == 9.0
    assert out["pad"].df == 9


def test_token_burstiness_min_df_filters(spark):
    from corpusama_spark.operators.textstats import token_burstiness

    df = spark.createDataFrame(
        [(1, "rare common"), (2, "common"), (3, "common")],
        "doc_id long, text string",
    )
    toks = {r.tok for r in token_burstiness(
        df, "text", "doc_id", min_df=2).collect()}
    assert toks == {"common"}


def test_qnorm_burst_queries_plan_clean(spark):
    import __spark_entry__ as e
    from corpusama_spark.session import assert_no_row_python

    for name in ("quantile_norm", "burstiness"):
        assert_no_row_python(
            e.queries()[name](spark, "/root/testdata/sf0.001")
        )


def test_trimmed_stats_hand_case(spark):
    from corpusama_spark.operators.quantiles import trimmed_stats

    # 8 values, trim 1/8 -> k=1: drop min and max
    vals = [1000, 10, 20, 30, 40, 50, 60, 0]
    rows = [(i, "s", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    r = trimmed_stats(df, "g", "v", "id", trim=0.125).collect()[0]
    inner = [10, 20, 30, 40, 50, 60]
    assert r.n == 8 and r.k_trimmed == 1
    assert r.mean == round(sum(vals) / 8, 6)
    assert r.trimmed_mean == round(sum(inner) / 6, 6)
    assert r.winsorized_mean == round((sum(inner) + 10 + 60) / 8, 6)
    # the outlier 1000 moves the mean but not the trimmed mean
    assert r.trimmed_mean == 35.0 and r.mean > 150


def test_trimmed_stats_small_group_no_trim(spark):
    from corpusama_spark.operators.quantiles import trimmed_stats

    # n=5, floor(5/8)=0: nothing trimmed, all three means equal
    df = spark.createDataFrame(
        [(i, "s", 10 * (i + 1)) for i in range(5)], "id long, g string, v long"
    )
    r = trimmed_stats(df, "g", "v", "id").collect()[0]
    assert r.k_trimmed == 0
    assert r.mean == r.trimmed_mean == r.winsorized_mean == 30.0


def test_rbo_identical_rankings_closed_form(spark):
    from corpusama_spark.operators.ranking import rbo_vocab_rankings

    # every token appears exactly once per doc it's in -> freq == df ->
    # identical rankings -> truncated RBO = 1 - p^k exactly
    docs = [(d, " ".join(f"tok{t:02d}" for t in range(60) if t <= d))
            for d in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = rbo_vocab_rankings(df, "text", "doc_id", k=50, p=0.9).collect()[0]
    expect = 0.0
    for d in range(1, 51):
        expect += 0.9 ** d  # overlap_d == d
    assert r.rbo == round((1.0 - 0.9) / 0.9 * expect, 6)
    assert abs(r.rbo - (1 - 0.9 ** 50)) < 5e-7  # 6dp rounding
    assert r.overlap_at_k == 50 and r.jaccard_at_k == 1.0


def test_rbo_divergent_head_scores_low(spark):
    from corpusama_spark.operators.ranking import rbo_vocab_rankings

    # "hot" dominates frequency (1000 in one doc) but has df=1;
    # "wide" leads df. With k=2 the heads disagree -> rbo < 1
    rows = [(0, "hot " * 1000)] + [(i, "wide filler") for i in range(1, 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = rbo_vocab_rankings(df, "text", "doc_id", k=2, p=0.9).collect()[0]
    assert r.overlap_at_k <= 2
    assert r.rbo < 1.0


def test_trimmed_rbo_queries_plan_clean(spark):
    import __spark_entry__ as e
    from corpusama_spark.session import assert_no_row_python

    for name in ("trimmed_mean", "rbo_rankings"):
        assert_no_row_python(
            e.queries()[name](spark, "/root/testdata/sf0.001")
        )


def test_oov_rate_hand_case(spark):
    from corpusama_spark.operators.textstats import oov_rate

    # vocab_top=2 -> global vocabulary {the, cat} (freq 4, 3)
    df = spark.createDataFrame(
        [
            (1, "a", "the cat the cat"),
            (2, "a", "the cat zebra"),
            (3, "b", "the quokka axolotl"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in oov_rate(
        df, "text", "source", vocab_top=2).collect()}
    a, b = out["a"], out["b"]
    assert a.n_tokens == 7 and a.n_oov == 1  # zebra
    assert a.oov_share == round(1 / 7, 6)
    assert a.n_types == 3 and a.n_oov_types == 1
    assert b.n_tokens == 3 and b.n_oov == 2  # quokka, axolotl
    assert b.oov_type_share == round(2 / 3, 6)


def test_oov_rate_query_plan_clean(spark):
    import __spark_entry__ as e
    from corpusama_spark.session import assert_no_row_python

    assert_no_row_python(e.queries()["oov_rate"](spark, "/root/testdata/sf0.001"))
