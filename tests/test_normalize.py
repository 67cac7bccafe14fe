"""Byte-exact parity of the normalization kernel vs the reference uninorm.

Mirrors the reference's own unit-test style (test/test_util/test_util.py,
test_langid.py:35-44) plus a hypothesis sweep — the reference is pure Python,
so it IS the oracle (SURVEY.md §5 item 2).
"""

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from corpusama_spark.functions import normalize as N

CASES = [
    "",
    "plain ascii line",
    "  leading and trailing   ",
    "tabs\there\tand\tthere",
    "curly \u201cquotes\u201d and \u2018single\u2019 ones",
    "dash \u2014 em, \u2013 en, \u2010 hyphen, \u30a0 katakana",
    "entities &amp; &lt; &gt; &quot; &apos; &#233; &#xE9; &eacute; &unknown; &broken",
    "ligature \ufb01le and \ufb00 and \u00bd and \u216b",
    "nbsp\u00a0thin\u2009ideographic\u3000spaces",
    "controls \x00\x07\x1b kept\u200d zwj",
    "line\u2028sep\u2029para",
    "<p class='x'>tag \ufb01 kept</p> outside \ufb01 folded",
    "<!-- comment \ufb01 --> after",
    "combining cafe\u0301 composed caf\u00e9",
    "multi\nline\n\n\ninput",
    "&#147;win1252 mapped&#148;",
    "deep &amp;#233; double-encoded",
    "ALL CAPS WITH \u201cQUOTES\u201d",
    "mixed <b>bold &amp; strong</b> tail",
    "trailing tag <br/>",
    "soft\u00adhyphen",
    "\ufe58 small em dash \ufe31 presentation",
    "\u055a armenian apostrophe \u07f4 nko",
    "\u301d CJK quotes \u301f",
    "emoji \U0001f600 astral \U0001d11e clef",
]


@pytest.mark.parametrize("text", CASES)
def test_normalize_line_parity(uninorm_ref, text):
    assert N.normalize_text(text) == uninorm_ref.normalize_line(text)


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.one_of(
            st.characters(),
            st.sampled_from(
                N.SINGLE_QUOTES
                + N.DOUBLE_QUOTES
                + N.HYPHENS
                + N.DASHES
                + "&;#<>/='\"\t\n   ‍"
                + string.printable
            ),
        ),
        max_size=80,
    )
)
def test_normalize_line_parity_fuzz(uninorm_ref, text):
    assert N.normalize_text(text) == uninorm_ref.normalize_line(text)


def test_normalize_doc_matches_reference_clean_text(uninorm_ref):
    text = "first ﬁne line\nSECOND &amp; line\n\n<q>third</q> end"
    expected = "".join(uninorm_ref.normalize_line(x) for x in text.split("\n"))
    assert N.normalize_doc(text) == expected


def test_entity_xml_basics_reescaped(uninorm_ref):
    # the uninorm quirk: decoded entities that are XML basics get re-escaped
    s = "&amp; &#38; &#60; &#62; &#34; &#39; &lt;"
    assert N.normalize_text(s) == uninorm_ref.normalize_line(s)
    assert "&amp;" in N.normalize_text(s)
    assert "<" not in N.normalize_text(s)


@settings(max_examples=1000, deadline=None)
@given(
    st.text(
        alphabet=[chr(i) for i in range(128) if chr(i) not in "&<"], max_size=80
    )
)
def test_ascii_fast_path_equals_general_path(text):
    # the fast path's guard admits exactly this alphabet; results must be
    # byte-identical to the full-chain path
    assert N.normalize_text(text) == N._normalize_general(text)


def test_html_to_text_reference_semantics():
    # literal cases from the reference's own suite
    # (test/test_util/test_convert.py:70-79)
    html = "<p>Encyclopedias have existed for around 2,000 years. (Wikipedia)</p>"
    text = "Encyclopedias have existed for around 2,000 years. (Wikipedia)"
    assert N.html_to_text(html) == text
    assert N.html_to_text(1) == 1
    assert N.html_to_text(None) is None
    # entities decode (HTMLParser convert_charrefs default), comments/scripts
    # drop their markup
    assert N.html_to_text("a &amp; b") == "a & b"
    assert N.html_to_text("<b>x</b><!-- hidden -->y") == "xy"


def test_html_to_text_spark_column(spark):
    df = spark.createDataFrame(
        [("<p>one <b>two</b></p>",), (None,), ("plain",)], ["t"]
    )
    rows = df.select(N.html_to_text_col("t").alias("x")).collect()
    assert [r.x for r in rows] == ["one two", None, "plain"]
