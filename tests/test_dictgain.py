"""Shared-dictionary compression gain (X231): in-process zlib parity,
template-flood vs diverse-source contrast, dictionary order/tie-break,
missing-dictionary and degenerate-text edges."""

import zlib

from pyspark.sql import functions as F

_LEVEL = 6  # pinned in compressq._LEVEL; asserted equal in the parity test

TEMPLATE = (
    "breaking news update from the regional desk please subscribe to our "
    "newsletter for daily coverage all rights reserved contact the editor "
    "for reprint permission story follows below {} thanks for reading "
    "share this article with your friends on social media platforms"
)
DIVERSE = [
    "quarterly rainfall exceeded the median by forty percent in the basin",
    "the committee deferred its vote pending an independent audit report",
    "migratory counts at the estuary fell sharply after the dredging work",
    "a lightweight alloy frame cut the prototype's mass by a third",
    "the archive's earliest ledger mentions a tannery by the east gate",
    "volunteers mapped seventeen springs along the disused drover's road",
    "her thesis reframes the treaty as a customs dispute, not a border one",
    "the kiln firing log shows two failed batches before the glaze held",
]


def _mirror_solo(s: str) -> int:
    return len(zlib.compress(s.encode("utf-8"), _LEVEL))


def _mirror_dict(s: str, d: str) -> int:
    if not d:
        return _mirror_solo(s)
    c = zlib.compressobj(
        _LEVEL, zlib.DEFLATED, zlib.MAX_WBITS, 8, 0, d.encode("utf-8")
    )
    return len(c.compress(s.encode("utf-8")) + c.flush())


def _corpus(spark):
    rows = [(i, "tmpl", TEMPLATE.format(f"slot value number {i}")) for i in range(20)]
    rows += [(100 + i, "div", t) for i, t in enumerate(DIVERSE)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_dict_gain_zlib_parity(spark):
    from corpusama_spark.functions import compressq
    from corpusama_spark.functions.compressq import dict_gain, train_shared_dict

    assert compressq._LEVEL == _LEVEL
    df = _corpus(spark)
    dicts = train_shared_dict(df, ngram=4, k=32)
    dict_map = {r.source: r.dict_text for r in dicts.collect()}
    out = dict_gain(df, dicts).collect()
    texts = {r.doc_id: (r.source, r.text) for r in df.collect()}
    assert len(out) == 28
    for r in out:
        src, txt = texts[r.doc_id]
        assert r.n_solo == _mirror_solo(txt)
        assert r.n_dict == _mirror_dict(txt, dict_map.get(src, ""))
        expect = round((r.n_solo - r.n_dict) / r.n_solo, 6)
        assert r.gain == expect


def test_template_flood_separates_where_solo_ratio_cannot(spark):
    from corpusama_spark.functions.compressq import dict_gain, train_shared_dict

    df = _corpus(spark)
    out = dict_gain(df, train_shared_dict(df, ngram=4, k=32))
    means = {
        r.source: r.m
        for r in out.groupBy("source").agg(F.avg("gain").alias("m")).collect()
    }
    # the shared skeleton compresses to almost nothing with the dictionary
    assert means["tmpl"] > 0.5
    # diverse prose shares no repeated gram -> no dictionary -> gain 0;
    # without the min_df guard this was 0.53 (the zdict memorized each
    # doc's own singleton grams) — pin the guard's effect
    assert means["div"] == 0.0
    # while each template doc ALONE looks like ordinary prose: its solo
    # ratio stays in the natural-text band (no per-doc gate catches it)
    solo = out.join(df.select("doc_id", "text"), "doc_id").where(
        F.col("source") == "tmpl"
    )
    ratios = [
        r.n_solo / len(r.text.encode()) for r in solo.select("n_solo", "text").collect()
    ]
    assert all(0.4 < x < 0.9 for x in ratios)
    flags = {r.source: r.f for r in out.groupBy("source").agg(
        F.sum(F.col("is_templated").cast("int")).alias("f")).collect()}
    assert flags["tmpl"] == 20 and flags["div"] == 0


def test_dictionary_order_and_ties(spark):
    from corpusama_spark.functions.compressq import dict_gain, train_shared_dict

    # distinct fillers (j*/k*/m*) keep the cross-doc grams to exactly
    # "a b c d" (df 3) and "x y z w" (df 2)
    rows = [
        (1, "s", "a b c d j1 j2 j3 x y z w"),
        (2, "s", "a b c d k1 k2 k3 x y z w"),
        (3, "s", "a b c d m1 m2 m3 m4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    d = train_shared_dict(df, ngram=4, k=3).collect()[0].dict_text
    # most-frequent LAST (zlib scans the zdict tail-first); min_df=2
    # drops every singleton, leaving exactly the two shared grams
    assert d.split("\n") == ["x y z w", "a b c d"]
    # min_df=1 admits singletons; k=3 then keeps the lexicographically
    # first singleton ("b c d j1") as the third (coldest, FIRST) line
    d1 = train_shared_dict(df, ngram=4, k=3, min_df=1).collect()[0].dict_text
    assert d1.split("\n") == ["b c d j1", "x y z w", "a b c d"]


def test_missing_dict_and_degenerate_text(spark):
    from corpusama_spark.functions.compressq import dict_gain, train_shared_dict

    df = spark.createDataFrame(
        [(1, "known", "hello world hello world hello world hello"),
         (2, "unknown", "some fresh text never seen before at all"),
         (3, "known", "")],
        "doc_id long, source string, text string",
    )
    dicts = train_shared_dict(
        df.where(F.col("source") == "known"), ngram=2, k=8, min_df=1
    )
    rows = {r.doc_id: r for r in dict_gain(df, dicts).collect()}
    # group without a dictionary row: dict-free compression, gain 0
    assert rows[2].n_dict == rows[2].n_solo and rows[2].gain == 0.0
    # empty text: n_solo is the DEFLATE header, gain pinned 0, no NULL
    assert rows[3].gain == 0.0 and rows[3].gain is not None
    assert not rows[2].is_templated and not rows[3].is_templated
