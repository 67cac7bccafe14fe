"""Subcorpus predicates (P13) + vertical export (S12)."""

from pyspark.sql import functions as F

from corpusama_spark.operators.export import vert_doc
from corpusama_spark.operators.subcorpus import load_subcorpora, subcorpus

RW_SUBCORP = """*FREQLISTATTRS word lemma

=doc_html
  doc
  file_id="0"

=doc_pdf
  doc
  file_id!="0"

=source_multi
  doc
  source__name=".*\\|.*"
"""


def test_reference_subcorpus_file_parses_and_filters(spark):
    # the reference's own registry syntax (registry_subcorp/rw_subcorp:1-16)
    df = spark.createDataFrame(
        [
            (1, "0", "OCHA"),
            (2, "12", "OCHA|UNHCR"),
            (3, "0", "WFP|ACF"),
            (4, None, "WFP"),
        ],
        ["id", "file_id", "source__name"],
    )
    subs = load_subcorpora(RW_SUBCORP)
    assert set(subs) == {"doc_html", "doc_pdf", "source_multi"}
    assert {r.id for r in subcorpus(df, subs["doc_html"]).collect()} == {1, 3}
    # NULL file_id: absent value satisfies != (not equal to "0")
    assert {r.id for r in subcorpus(df, subs["doc_pdf"]).collect()} == {2, 4}
    assert {r.id for r in subcorpus(df, subs["source_multi"]).collect()} == {2, 3}


def test_lang_negation_regex(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "es"), (3, "fr"), (4, "de")], ["id", "lang"]
    )
    subs = load_subcorpora('=not_es_fr\n  doc\n  lang!="es|fr"\n')
    assert {r.id for r in subcorpus(df, subs["not_es_fr"]).collect()} == {1, 4}


def test_vert_doc_structure(spark):
    df = spark.createDataFrame(
        [("One two. Three four five!",)], ["text"]
    )
    out = df.select(
        vert_doc(F.lit('<doc id="7">'), F.col("text")).alias("v")
    ).collect()[0].v
    assert out == (
        '<doc id="7">\n'
        '<s id="0">\nOne\ntwo.\n</s>\n'
        '<s id="1">\nThree\nfour\nfive!\n</s>\n'
        "</doc>"
    )
    # doc-count invariant (S15/A9): one <doc line per input doc
    assert out.count("<doc ") == 1
