"""Property-based tests (hypothesis): invariants that must hold on ANY
input, not just fixtures. Each example batches all strings into one Spark
job; example counts are small because a Spark round-trip costs ~100 ms.
"""

import hashlib
import xml.sax.saxutils

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ish text incl. unicode quotes/dashes/controls the cleaners target
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=120,
    ),
    min_size=1,
    max_size=12,
)


def _run(spark, texts, expr):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    return [r.o for r in df.select(expr.alias("o")).orderBy("i").collect()]


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_pdf_clean_idempotent(spark, texts):
    """clean(clean(x)) == clean(x) — the chain is a normal form."""
    from corpusama_spark.functions.convert import pdf_clean_text

    once = _run(spark, texts, pdf_clean_text(F.col("t")))
    twice = _run(spark, once, pdf_clean_text(F.col("t")))
    assert once == twice


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_quote_fold_idempotent(spark, texts):
    from corpusama_spark.functions.normalize import fold_quotes_dashes_col

    once = _run(spark, texts, fold_quotes_dashes_col(F.col("t")))
    twice = _run(spark, once, fold_quotes_dashes_col(F.col("t")))
    assert once == twice


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_simhash_column_vs_vectorized_parity(spark, texts):
    """The numpy kernel must equal the Column-expression twin on ANY text."""
    from corpusama_spark.operators.dedup import simhash_bits, simhash_vectorized

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expr = {
        r.doc_id: r.sh
        for r in df.select("doc_id", simhash_bits("text").alias("sh")).collect()
    }
    vec = {
        r.doc_id: r.simhash
        for r in simhash_vectorized(df, "text", "doc_id").collect()
    }
    assert expr == vec


@given(texts=st.lists(st.text(max_size=80), min_size=1, max_size=10))
@settings(**SETTINGS)
def test_winnow_shape_and_determinism(spark, texts):
    from corpusama_spark.operators.dedup import winnow_fingerprints

    a = _run(spark, texts, winnow_fingerprints("t", k=5, window=4))
    b = _run(spark, texts, winnow_fingerprints("t", k=5, window=4))
    assert a == b
    for fps, t in zip(a, texts):
        assert fps == sorted(set(fps))  # sorted, distinct
        assert all(len(fp) == 8 for fp in fps)
        if len(t) < 5:
            assert fps == []
        else:
            # every fingerprint is the md5-prefix of SOME 5-gram of t
            grams = {
                hashlib.md5(t.lower()[i : i + 5].encode()).hexdigest()[:8]
                for i in range(len(t) - 4)
            }
            assert set(fps) <= grams


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1e4,
                max_value=1e4,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=4,
            max_size=16,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_quantize_error_bound(spark, vecs):
    import numpy as np
    import pandas as pd

    from corpusama_spark.operators.similarity import dequantize, quantize_int8

    df = spark.createDataFrame(pd.DataFrame({"v": vecs}))
    out = df.select(
        F.col("v"), dequantize(quantize_int8(F.col("v"))).alias("rt")
    ).collect()
    for r in out:
        orig = np.array(r.v, dtype=np.float64)
        rt = np.array(r.rt, dtype=np.float64)
        absmax = np.abs(orig).max()
        tol = (absmax / 127.0) * 0.5 + 1e-3 if absmax > 0 else 1e-12
        assert np.abs(orig - rt).max() <= tol


@given(vals=st.lists(st.text(max_size=40), min_size=1, max_size=10))
@settings(**SETTINGS)
def test_xml_quoteattr_parity_any_string(spark, vals):
    from corpusama_spark.operators.flatten import xml_quoteattr_col

    got = _run(spark, vals, xml_quoteattr_col(F.col("t")))
    for g, v in zip(got, vals):
        assert g == xml.sax.saxutils.quoteattr(v.strip())


EDGES = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=25,
)


@given(edges=EDGES)
@settings(**SETTINGS)
def test_components_star_and_hashmin_match_unionfind(spark, edges):
    """Both component algorithms must agree with a union-find ground truth
    on arbitrary small graphs (self-loops, parallel edges, singletons)."""
    from corpusama_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    parent = list(range(31))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {x for e in edges for x in e}
    want = {x: find(x) for x in nodes}
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    st_out = {
        r.id: r.component for r in connected_components_star(pairs).collect()
    }
    assert st_out == want
    hm_out = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert hm_out == want


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_drop_duplicated_lines_idempotent(spark, texts):
    """One pass reaches a fixpoint: every surviving line has corpus count
    < threshold, so a second pass drops nothing."""
    from corpusama_spark.operators.curation import drop_duplicated_lines

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = drop_duplicated_lines(df, threshold=2)
    again = drop_duplicated_lines(
        once.select("doc_id", "text"), threshold=2
    )
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text for r in again.collect()}
    assert a == b
    # ...and drops nothing further, except the representational edge that
    # "all lines dropped" serializes as '' — indistinguishable from one
    # empty line, which may itself be corpus-duplicated and re-dropped
    assert all(
        r.n_dropped == 0 for r in again.collect() if r.text != ""
    )


@given(texts=TEXTS, frac=st.sampled_from([0.0, 0.3, 1.0]))
@settings(**SETTINGS)
def test_stratified_sample_envelope(spark, texts, frac):
    """fraction 0 keeps nothing, 1 keeps everything, and any fraction's
    sample is a subset of a larger fraction's sample (nested samples —
    the property that makes mixture re-weighting monotone)."""
    from corpusama_spark.operators.curation import stratified_sample

    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "id long, stratum string, text string",
    )
    got = {r.id for r in stratified_sample(df, "stratum", {"s": frac}, "id").collect()}
    if frac == 0.0:
        assert got == set()
    elif frac == 1.0:
        assert got == set(range(len(texts)))
    bigger = {
        r.id
        for r in stratified_sample(df, "stratum", {"s": min(1.0, frac + 0.5)}, "id").collect()
    }
    assert got <= bigger
