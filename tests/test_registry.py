"""Registry emit: golden-file round-trips against the reference's own
registry + subcorp files (parsed from /root/reference at test time), and
the builder path from engine config."""

from pathlib import Path

from pyspark.sql import functions as F

from corpusama_spark.operators.registry import (
    Registry,
    SubcorpusDef,
    emit_registry,
    emit_subcorp,
    parse_registry,
    parse_subcorp,
    registry_for_corpus,
)

REF_REGISTRY = Path("/root/reference/registry/rw_en23")
REF_SUBCORP = Path("/root/reference/registry_subcorp/rw_en_subcorp")


def test_registry_golden_roundtrip():
    """parse(reference) -> emit -> parse must reproduce the model exactly:
    every header key, attribute block, structure and nested attribute of
    registry/rw_en23 survives (golden comparison modulo whitespace)."""
    text = REF_REGISTRY.read_text()
    model = parse_registry(text)
    again = parse_registry(emit_registry(model))
    assert again == model
    # spot the load-bearing content parsed out of the golden file
    header = dict(model.header)
    assert header["CORPUS"] == "rw_en23"
    assert header["DOCSTRUCTURE"] == "doc"
    assert [a.name for a in model.attributes] == [
        "id", "word", "lemma", "upos", "xpos", "feats", "head", "deprel",
        "lc", "lemma_lc",
    ]
    assert [s.name for s in model.structures] == ["s", "docx", "doc"]
    doc = model.structures[2]
    assert ("TYPE", "MD_MGD") in doc.props
    assert "date__original__year" in [c.name for c in doc.children]
    lc = model.attributes[8]
    assert ("DYNAMIC", "utf8lowercase") in lc.props


def test_subcorp_golden_roundtrip_and_loadable(spark):
    """Subcorp emit reproduces the reference definition file's model AND
    stays loadable by the predicate parser (subcorpus.load_subcorpora)."""
    from corpusama_spark.operators.subcorpus import load_subcorpora

    text = REF_SUBCORP.read_text()
    freq, defs = parse_subcorp(text)
    assert freq == ["word", "lemma"]
    assert [d.name for d in defs] == [
        "doc_html", "doc_pdf", "source_single", "source_multi",
        "lang_en", "lang_es", "lang_fr",
    ]
    assert defs[1].structure == "doc"
    assert defs[1].conditions == [("file_id", "!=", "0")]
    emitted = emit_subcorp(freq, defs)
    freq2, defs2 = parse_subcorp(emitted)
    assert (freq2, defs2) == (freq, defs)
    preds = load_subcorpora(emitted)
    assert set(preds) == {d.name for d in defs}


def test_subcorp_emitted_predicates_filter(spark):
    """An emitted definition drives the same rows through subcorpus()."""
    from corpusama_spark.operators.subcorpus import load_subcorpora, subcorpus

    emitted = emit_subcorp(
        [], [SubcorpusDef("not_es_fr", "doc", [("lang", "!=", "es|fr")])]
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = subcorpus(docs, load_subcorpora(emitted)["not_es_fr"])
    langs = {r.lang for r in got.select("lang").distinct().collect()}
    assert "es" not in langs and "fr" not in langs and langs


def test_registry_builder_from_config():
    reg = registry_for_corpus(
        corpus_id="cap_en24",
        language="en",
        info="English captions 2024",
        base_path="/corpora",
        positional_attrs=["word", "lemma"],
        doc_attrs=["id", "file_id", "lang", "source", "date__original__year"],
        subcorp_file="/corpora/registry_subcorp/cap_en_subcorp",
        diachronic_attr="date__original__year",
        multivalue_attrs={"source"},
    )
    text = emit_registry(reg)
    model = parse_registry(text)
    assert model == reg  # emit/parse closure on built registries too
    header = dict(model.header)
    assert header["LANGUAGE"] == "English"
    assert header["DIACHRONIC"] == "doc.date__original__year"
    assert header["SUBCDEF"].endswith("cap_en_subcorp")
    assert "vert.xz" in header["VERTICAL"]
    names = [a.name for a in model.attributes]
    assert names == ["word", "lemma", "lc", "lemma_lc"]
    doc = [s for s in model.structures if s.name == "doc"][0]
    src = [c for c in doc.children if c.name == "source"][0]
    assert ("MULTIVALUE", "1") in src.props
