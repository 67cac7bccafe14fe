"""C4 cleaning rules (functions/c4.py): line retention semantics, page
gate precedence, NULL handling, and scan-stage plan shape. The contract
query `c4_rules` is value-exact vs DuckDB over derived multi-line pages
(scripts/selfcheck.py)."""

from pyspark.sql import functions as F

from corpusama_spark.functions.c4 import c4_filter, c4_kept_lines
from corpusama_spark.plans.audit import report

GOOD = "this line has five good words."
SHORT = "too few words."
NOPUNCT = "this line has no terminal punctuation at all"
JS = "please enable JavaScript to view this content."
QUOTE = 'he said "this is a quoted full sentence."'


def _pages(spark, rows):
    return spark.createDataFrame(rows, "page_id long, text string")


def test_line_rules(spark):
    page = "\n".join([GOOD, SHORT, NOPUNCT, JS, QUOTE])
    out = c4_filter(_pages(spark, [(1, page)])).collect()[0]
    assert out.n_lines == 5
    # GOOD and QUOTE survive; SHORT (<5 words), NOPUNCT, JS die
    assert out.n_lines_kept == 2
    assert out.cleaned == GOOD + "\n" + QUOTE
    assert out.drop_reason == "too_few_sentences"  # only 2 sentences
    assert not out.keep


def test_page_kept_and_sentence_count(spark):
    page = "\n".join([GOOD] * 4)
    out = c4_filter(_pages(spark, [(1, page)])).collect()[0]
    assert out.keep and out.drop_reason == "kept"
    assert out.n_sentences == 4


def test_page_gate_precedence(spark):
    base = "\n".join([GOOD] * 3)
    rows = [
        (1, base + "\nwe need Lorem Ipsum here and { badword1."),
        (2, base + "\nsome code { badword1 follows."),
        (3, base + "\nthe badword1 appears alone."),
    ]
    got = {r.page_id: r.drop_reason for r in c4_filter(_pages(spark, rows)).collect()}
    assert got == {1: "lorem_ipsum", 2: "brace", 3: "bad_word"}


def test_null_and_empty_text(spark):
    rows = [(1, None), (2, "")]
    got = {r.page_id: (r.n_lines_kept, r.keep) for r in c4_filter(_pages(spark, rows)).collect()}
    assert got == {1: (0, False), 2: (0, False)}


def test_kept_lines_expression_composes(spark):
    df = _pages(spark, [(1, GOOD + "\n" + SHORT)]).select(
        F.size(c4_kept_lines(F.col("text"))).alias("n")
    )
    assert df.collect()[0].n == 1


def test_plan_scan_stage_no_shuffle(spark):
    out = c4_filter(_pages(spark, [(1, GOOD)]))
    rep = report(out).assert_no_row_python()
    rep.assert_max_shuffles(0)
