"""k-anonymity / l-diversity audits, source vocabulary overlap, and
BLEU-2 pair verify — hand-computed small cases."""

import math

import pytest
from pyspark.sql import functions as F


def test_k_anonymity_hand_case(spark):
    from corpusama_spark.operators.privacy import k_anonymity

    # classes: (en,a)×6, (en,b)×2, (fr,a)×1 → min=1, two below k=5
    rows = (
        [("en", "a")] * 6 + [("en", "b")] * 2 + [("fr", "a")]
    )
    df = spark.createDataFrame(rows, ["lang", "source"])
    (r,) = k_anonymity(df, ["lang", "source"], k=5).collect()
    assert r["n_rows"] == 9
    assert r["n_classes"] == 3
    assert r["min_class"] == 1
    assert r["n_violating_classes"] == 2
    assert r["n_at_risk"] == 3
    assert r["at_risk_share"] == round(3 / 9, 6)
    assert r["n_singletons"] == 1


def test_k_anonymity_null_quasi_value_is_its_own_class(spark):
    from corpusama_spark.operators.privacy import k_anonymity

    df = spark.createDataFrame(
        [("en",), (None,), (None,)], "lang string"
    )
    (r,) = k_anonymity(df, ["lang"], k=2).collect()
    assert r["n_classes"] == 2
    assert r["n_singletons"] == 1  # the 'en' row; NULL class has 2


def test_l_diversity_worklist(spark):
    from corpusama_spark.operators.privacy import l_diversity

    # class A: 6 rows all lang=en → k ok, l FAILS (homogeneous)
    # class B: 3 rows, 2 langs → k FAILS, l ok
    # class C: 5 rows, 3 langs → passes both, absent from output
    rows = (
        [("A", "en")] * 6
        + [("B", "en"), ("B", "en"), ("B", "fr")]
        + [("C", "en"), ("C", "fr"), ("C", "de"), ("C", "en"), ("C", "fr")]
    )
    df = spark.createDataFrame(rows, ["source", "lang"])
    out = l_diversity(df, ["source"], "lang", l=2, k=5).collect()
    assert [r["source"] for r in out] == ["B", "A"]  # worst (n asc) first
    b, a = out
    assert not b["k_anon"] and b["l_diverse"]
    assert a["k_anon"] and not a["l_diverse"]
    assert a["top_share"] == 1.0  # full disclosure
    assert b["top_share"] == round(2 / 3, 6)


def test_source_vocab_overlap_hand_case(spark):
    from corpusama_spark.operators.textstats import source_vocab_overlap

    df = spark.createDataFrame(
        [
            ("a", "x y z"),
            ("a", "x x w"),     # a vocab: {x,y,z,w}
            ("b", "x y"),       # b vocab: {x,y}
            ("c", "q"),         # c vocab: {q} — disjoint, no output row
        ],
        ["source", "text"],
    )
    out = source_vocab_overlap(df, "text", "source").collect()
    assert len(out) == 1  # only (a,b) intersect; disjoint pairs absent
    r = out[0]
    assert (r["g_a"], r["g_b"]) == ("a", "b")
    assert r["v_a"] == 4 and r["v_b"] == 2 and r["n_common"] == 2
    assert r["jaccard"] == 0.5
    assert r["c_ab"] == 0.5 and r["c_ba"] == 1.0  # b contained in a


def test_bleu_identical_pair_is_one(spark):
    from corpusama_spark.operators.fuzzy import bleu_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    (r,) = bleu_pairs(pairs, docs).collect()
    assert r["p1"] == 1.0 and r["p2"] == 1.0 and r["bleu2"] == 1.0


def test_bleu_clipping_and_geometric_mean(spark):
    from corpusama_spark.operators.fuzzy import bleu_pairs

    # a: 'the cat the cat' — unigrams the×2 cat×2; bigrams
    # 'the cat'×2 'cat the'×1. b: 'the cat' → clipped p1=2/4, p2=1/3.
    docs = spark.createDataFrame(
        [(1, "the cat the cat"), (2, "the cat")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    (r,) = bleu_pairs(pairs, docs).collect()
    assert r["p1"] == 0.5
    assert r["p2"] == round(1 / 3, 6)
    assert r["len_a"] == 4 and r["len_b"] == 2
    # len_a >= len_b → no brevity penalty
    assert r["bleu2"] == pytest.approx(math.sqrt(0.5 / 3), abs=1e-6)


def test_bleu_brevity_penalty_and_zero_overlap(spark):
    from corpusama_spark.operators.fuzzy import bleu_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha beta gamma delta"),
            (3, "zz qq"),
        ],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    out = {(r["id_a"], r["id_b"]): r for r in bleu_pairs(pairs, docs).collect()}
    short = out[(1, 2)]  # candidate shorter than reference → BP < 1
    assert short["p1"] == 1.0 and short["p2"] == 1.0
    assert short["bleu2"] == pytest.approx(math.exp(1 - 4 / 2), abs=1e-6)
    assert out[(1, 3)]["bleu2"] == 0.0  # disjoint → p1=0 → bleu 0


def test_bleu_single_token_doc_has_zero_p2(spark):
    from corpusama_spark.operators.fuzzy import bleu_pairs

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    (r,) = bleu_pairs(pairs, docs).collect()
    assert r["p1"] == 1.0 and r["p2"] == 0.0 and r["bleu2"] == 0.0


def test_new_audit_queries_have_no_row_python(spark):
    """Plan sweep: none of the new audit queries may contain row-at-a-
    time Python (BatchEvalPython) in their physical plan."""
    import __spark_entry__ as E
    from corpusama_spark.plans.audit import report

    for fn in (
        E.q_drop_waterfall,
        E.q_wasserstein_drift,
        E.q_theil_decomp,
        E.q_k_anonymity,
        E.q_l_diversity,
        E.q_source_overlap,
        E.q_bleu_verify,
    ):
        report(fn(spark, "/root/testdata/sf0.001")).assert_no_row_python()
