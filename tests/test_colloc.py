"""Corpus-linguistics operators (operators/colloc.py): hand-computed
parity for the association scores, KWIC window edges, plan shape."""

import math

from corpusama_spark.plans.audit import report


def test_collocations_scores_match_hand_computation(spark):
    from corpusama_spark.operators.colloc import collocations

    # "of the" appears 4x; "of" as w1 5x; "the" as w2 6x; 13 bigrams total
    docs = spark.createDataFrame(
        [
            (1, "of the of the of the"),
            (2, "of the king"),
            (3, "of course the end beats the rest"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.w1, r.w2): r for r in collocations(docs, min_count=2).collect()}
    assert set(rows) == {("of", "the"), ("the", "of")}
    r = rows[("of", "the")]
    f_xy, f_x, f_y, n = 4, 5, 6, 13
    assert (r.f_xy, r.f_x, r.f_y) == (f_xy, f_x, f_y)
    assert r.pmi == round(math.log2(f_xy * n / (f_x * f_y)), 6)
    assert r.t_score == round((f_xy - f_x * f_y / n) / math.sqrt(f_xy), 6)
    assert r.log_dice == round(14 + math.log2(2 * f_xy / (f_x + f_y)), 6)
    # logDice is bounded at 14: a bigram that exhausts both marginals hits it
    solo = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb")], "doc_id long, text string"
    )
    only = collocations(solo, min_count=2).collect()
    assert len(only) == 1 and only[0].log_dice == 14.0


def test_keywords_simple_maths(spark):
    from corpusama_spark.operators.colloc import keywords

    focus = spark.createDataFrame(
        [(1, "gene gene gene protein cell"), (2, "gene protein the the")],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(3, "the the the of of cell"), (4, "the of and and")],
        "doc_id long, text string",
    )
    got = {r.tok: r for r in keywords(focus, ref, min_focus_count=2).collect()}
    # 'gene' never in ref -> f_ref 0; 'the' is reference-heavy -> score < 1
    assert set(got) == {"gene", "the", "protein"}
    g = got["gene"]
    assert g.f_ref == 0
    fpm_f = 4 * 1e6 / 9
    assert g.fpm_focus == round(fpm_f, 6)
    assert g.score == round((fpm_f + 100.0) / (0.0 + 100.0), 6)
    assert got["the"].score < 1.0 < got["gene"].score


def test_kwic_window_edges(spark):
    from corpusama_spark.operators.colloc import kwic

    docs = spark.createDataFrame(
        [(1, "hit a b c hit d"), (2, "x hit"), (3, "no match here")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.pos): (r.left, r.hit, r.right)
           for r in kwic(docs, "HIT", width=2).collect()}
    assert got == {
        (1, 0): ("", "hit", "a b"),       # doc start: empty left
        (1, 4): ("b c", "hit", "d"),      # doc end: short right
        (2, 1): ("x", "hit", ""),          # term at last token
    }


def test_colloc_plans_stay_jvm_and_broadcast(spark):
    from corpusama_spark.operators.colloc import collocations, keywords, kwic

    docs = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    for df in (
        collocations(docs, min_count=1),
        keywords(docs, docs, min_focus_count=1),
        kwic(docs, "a"),
    ):
        report(df).assert_no_row_python()
    plan = (
        collocations(docs, min_count=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # marginals broadcast, pairs never self-join


def test_frequency_profile_ranks_and_coverage(spark):
    from corpusama_spark.operators.colloc import frequency_profile

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b z")], "doc_id long, text string"
    )
    got = {r.tok: (r.freq, r.rank, r.cum_share)
           for r in frequency_profile(docs).collect()}
    # a:4 b:3 c:1 z:1 of 9; ties (c,z) break alphabetically
    assert got == {
        "a": (4, 1, round(4 / 9, 6)),
        "b": (3, 2, round(7 / 9, 6)),
        "c": (1, 3, round(8 / 9, 6)),
        "z": (1, 4, 1.0),
    }
