"""clean_lines parity + JVM predicate equivalence.

The oracle re-runs the reference's algorithm (util/langid.py:82-103) using
the reference's own uninorm module, so Spark output is checked against the
reference's actual behavior, not our reading of it.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from corpusama_spark.functions import textrules as T


def ref_clean_lines(uninorm_ref, lines):
    # literal transcription of the documented algorithm, driven by the
    # reference's normalize_line (the oracle; not engine code)
    table = str.maketrans(T.DROP_ALL, " " * len(T.DROP_ALL))
    out = [uninorm_ref.normalize_line(x).translate(table) for x in lines]
    out = [" ".join(x.split()) for x in out if x.strip()]
    return [x.lower() if x.isupper() else x for x in out]


SAMPLES = [
    "Plain sentence with words.",
    "  NUMBERS 123 and #### symbols!!!",
    "ALL CAPS LINE HERE",
    "entities &amp; accents &#233;",
    "tiny",
    "",
    "   ",
    "### 42 ***",
    "mixed CASE Stays",
    "curly “quotes” drop to straight",
    "soft­hyphen and – dash vanish",
    "tab\tand\x0bvertical",
]


def test_clean_lines_parity(uninorm_ref):
    assert T.clean_lines(SAMPLES) == ref_clean_lines(uninorm_ref, SAMPLES)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=6))
def test_clean_lines_parity_fuzz(uninorm_ref, lines):
    assert T.clean_lines(lines) == ref_clean_lines(uninorm_ref, lines)


def test_prep_udf_matches_kernel(spark):
    caps = [
        "First line.\nSECOND LINE!\n###\nlast &amp; line",
        None,
        "",
        "single",
    ]
    df = spark.createDataFrame(pd.DataFrame({"caption": caps}))
    rows = (
        df.withColumn("p", T.prep_caption("caption"))
        .select("caption", "p.caption_norm", "p.lines")
        .collect()
    )
    for r in rows:
        if r.caption is None:
            assert r.caption_norm is None and r.lines is None
        else:
            from corpusama_spark.functions.normalize import normalize_doc

            assert r.caption_norm == normalize_doc(r.caption)
            assert r.lines == T.clean_lines(r.caption.split("\n"))


def test_jvm_drop_translate_matches_python(spark):
    vals = SAMPLES + ["; greek question", "• bullets ■"]
    df = spark.createDataFrame(pd.DataFrame({"s": vals}))
    got = df.select(
        T.lower_if_upper_col(T.collapse_ws_col(T.drop_chars_col(F.col("s")))).alias("c")
    ).collect()
    table = str.maketrans(T.DROP_ALL, " " * len(T.DROP_ALL))
    for r, v in zip(got, vals):
        expect = " ".join(v.translate(table).split())
        expect = expect.lower() if expect.isupper() else expect
        assert r.c == expect, (v, r.c, expect)


def test_nanlike(spark):
    vals = [None, "", "  ", "none", "NULL", "nan", "None ", "real text", "0"]
    df = spark.createDataFrame(pd.DataFrame({"s": vals}), schema="s string")
    got = [r.n for r in df.select(T.is_nanlike(F.col("s")).alias("n")).collect()]
    assert got == [True, True, True, True, True, True, True, False, False]
