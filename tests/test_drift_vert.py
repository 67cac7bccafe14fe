"""Schema drift / attribute profiling / vert round-trip / conversion chains
(A13, A14, A12, F28, S12-rest, F11, F14, F16-F18, S11 xz, S14 yaml)."""

import lzma
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

TARGET = StructType(
    [
        StructField("id", LongType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
    ]
)


def test_reconcile_adds_missing_as_null_and_keeps_new(spark):
    from corpusama_spark.operators.schema_drift import drift_report, reconcile_to

    batch = spark.createDataFrame([(1, "hello", "x")], "id long, text string, extra string")
    out = reconcile_to(batch, TARGET)
    assert out.columns == ["id", "lang", "text", "extra"]
    r = out.collect()[0]
    assert r.lang is None and r.text == "hello" and r.extra == "x"
    report = {(x.column, x.status) for x in drift_report(batch, TARGET).collect()}
    assert report == {("lang", "missing"), ("extra", "new")}


def test_union_reconciled_loss_free(spark):
    from corpusama_spark.operators.schema_drift import union_reconciled

    a = spark.createDataFrame([(1, "en")], "id long, lang string")
    b = spark.createDataFrame([(2, "t2", "n")], "id long, text string, new_col string")
    u = union_reconciled([a, b], TARGET)
    rows = {r.id: r for r in u.collect()}
    assert len(rows) == 2
    assert rows[1].lang == "en" and rows[1].text is None and rows[1].new_col is None
    assert rows[2].text == "t2" and rows[2].lang is None and rows[2].new_col == "n"


def test_na_profile_single_pass(spark):
    from corpusama_spark.operators.schema_drift import na_profile

    df = spark.createDataFrame(
        [("a", 1), ("  ", 2), ("NaN", None), (None, 4)],
        "s string, v int",
    )
    out = {r.attribute: r for r in na_profile(df).collect()}
    assert out["s"].n == 4 and out["s"].n_na == 3 and out["s"].pct_na == 0.75
    assert out["v"].n_na == 1 and out["v"].pct_na == 0.25


def test_diff_summary_statuses(spark):
    from corpusama_spark.operators.schema_drift import diff_rows, diff_summary

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "id long, text string"
    )
    rows = {r.id: r.status for r in diff_rows(old, new, "id", ["text"]).collect()}
    assert rows == {1: "same", 2: "changed", 3: "removed", 4: "added"}
    summary = {
        r.status: r.n for r in diff_summary(old, new, "id", ["text"]).collect()
    }
    assert summary == {"same": 1, "changed": 1, "removed": 1, "added": 1}


def test_vert_roundtrip_and_distributed_reader(spark, tmp_path):
    """vert_doc -> write -> read_vert (lineSep split) -> parse_vert must
    reproduce the (doc, sent, token) table of the original text."""
    from corpusama_spark.operators.export import vert_doc
    from corpusama_spark.operators.vertical import parse_vert, read_vert

    docs = spark.createDataFrame(
        [
            (7, "First sentence here. Second one now! Third? yes"),
            (8, "Single sentence only"),
        ],
        "doc_id long, text string",
    )
    tag = F.concat(F.lit('<doc id="'), F.col("doc_id").cast("string"), F.lit('">'))
    verts = docs.select(vert_doc(tag, F.col("text")).alias("vert"))
    path = str(tmp_path / "corpus_vert")
    verts.write.mode("overwrite").text(path)

    back = read_vert(spark, path)
    parsed = parse_vert(back, "vert", doc_id_type="long").collect()
    got = {}
    for r in parsed:
        got.setdefault((r.doc_id, r.sent_id), []).append((r.token_id, r.token))
    for k in got:
        got[k] = [t for _, t in sorted(got[k])]
    assert got[(7, 0)] == ["First", "sentence", "here."]
    assert got[(7, 1)] == ["Second", "one", "now!"]
    assert got[(7, 2)] == ["Third?"]
    assert got[(7, 3)] == ["yes"]
    assert got[(8, 0)] == ["Single", "sentence", "only"]


def test_parse_vert_tagged_token_lines(spark):
    """Tagged vert (idx\\tword\\t...) lines must yield the word column —
    the secondary-pipeline regex path (secondary_pipeline.py:186-189)."""
    from corpusama_spark.operators.vertical import parse_vert

    vert = '<doc id="3">\n<s id="0">\n1\tHello\tUH\n2\tworld\tNN\n</s>\n</doc>'
    df = spark.createDataFrame([(vert,)], "vert string")
    rows = sorted(
        (r.sent_id, r.token_id, r.token)
        for r in parse_vert(df, doc_id_type="long").collect()
    )
    assert rows == [(0, 0, "Hello"), (0, 1, "world")]


def test_conllu_doc_shape(spark):
    from corpusama_spark.operators.vertical import conllu_doc

    df = spark.createDataFrame([(5, "Hi there. Bye now!")], "id long, text string")
    out = df.select(conllu_doc(F.col("id"), F.col("text")).alias("c")).collect()[0].c
    lines = out.split("\n")
    assert lines[0] == "# newdoc id = 5"
    assert "# sent_id = 0" in lines and "# sent_id = 1" in lines
    assert "# text = Hi there." in lines
    tok = [ln for ln in lines if ln.startswith("1\t")]
    assert tok[0].split("\t") == ["1", "Hi", "_", "_", "_", "_", "_", "_", "_", "_"]
    assert len(tok[0].split("\t")) == 10


def test_pdf_clean_text_matches_reference_chain(spark):
    """Byte-parity with pdf.clean_text's ordered regex chain
    (corpusama/source/pdf.py:16-33), replicated in Python here."""
    from corpusama_spark.functions.convert import pdf_clean_text

    def ref_clean(text, drops="�\t"):
        text = text.translate(str.maketrans(drops, " " * len(drops)))
        text = re.sub(r" {0,}\n {0,}", r"\n", text)
        text = re.sub(r" {2,}", r" ", text)
        text = re.sub(r"\n{3,}", r"\n\n", text)
        return text.strip()

    cases = [
        "a�b\tc",
        "  line one   \n   line two  ",
        "x\n\n\n\n\ny",
        " a  b   c\td�\n\n\n \n e ",
        "",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, t string")
    got = {
        r.i: r.c
        for r in df.select("i", pdf_clean_text(F.col("t")).alias("c")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == ref_clean(c), (i, c)


def test_clean_xml_tokens_parity(spark):
    from corpusama_spark.functions.convert import clean_xml_tokens_col

    raw = "a\x0bb\x0cc\x1cd\x1de\x1ef ok"
    df = spark.createDataFrame([(raw,)], "t string")
    got = df.select(clean_xml_tokens_col(F.col("t")).alias("c")).collect()[0].c
    want = raw
    for tok in ["\x0b", "\x0c", "\x1c", "\x1d", "\x1e"]:
        want = want.replace(tok, "")
    assert got == want == "abcdef ok"


def test_convert_wrappers(spark):
    from corpusama_spark.functions.convert import (
        list_to_string_no_sep,
        str_to_obj,
        to_json_or_str,
    )

    df = spark.createDataFrame(
        [(["ab", "cd "], '{"k": 3}', 9)], "l array<string>, j string, v int"
    )
    r = df.select(
        list_to_string_no_sep(F.col("l")).alias("nosep"),
        str_to_obj(F.col("j"), "k int").getField("k").alias("k"),
        to_json_or_str(F.col("l"), "array<string>").alias("lj"),
        to_json_or_str(F.col("v"), "int").alias("vs"),
    ).collect()[0]
    assert r.nosep == "abcd" and r.k == 3
    assert r.lj == '["ab","cd "]' and r.vs == "9"


def test_xz_export_roundtrip(spark, tmp_path):
    """S11: .txt.xz written partition-parallel via lzma, readable back."""
    from corpusama_spark.operators.export import write_xz_text

    path = str(tmp_path / "xz_out")
    df = spark.createDataFrame(
        [(f"doc {i}",) for i in range(50)], ["t"]
    ).repartition(4)
    files = write_xz_text(df, "t", path, docs_per_file=10)
    assert files and all(f.endswith(".txt.xz") for f in files)
    # the manifest is authoritative: it lists exactly the files on disk,
    # and the atomic tmp->rename publish leaves no .tmp behind
    import glob as _glob
    import os as _os

    on_disk = sorted(_glob.glob(_os.path.join(path, "*")))
    assert sorted(files) == [f for f in on_disk if f.endswith(".txt.xz")]
    assert not [f for f in on_disk if f.endswith(".tmp")]
    lines = []
    for f in files:
        with lzma.open(f, "rt", encoding="utf-8") as fh:
            chunk = fh.read().splitlines()
            assert len(chunk) <= 10
            lines += chunk
    assert sorted(lines) == sorted(f"doc {i}" for i in range(50))
    # Spark-side read-back (one task per non-splittable .xz file)
    from corpusama_spark.operators.export import read_xz_text

    back = read_xz_text(spark, path)
    assert sorted(r.value for r in back.collect()) == sorted(lines)


def test_load_config_yaml(tmp_path):
    from corpusama_spark.pipeline import FilterConfig, load_config

    cfg = load_config("target_lang: en\nmin_portion: 0.5\nnbuckets: 16\n")
    assert cfg.target_lang == "en" and cfg.min_portion == 0.5 and cfg.nbuckets == 16
    p = tmp_path / "cfg.yml"
    p.write_text("min_tokens: 2\n")
    assert load_config(str(p)).min_tokens == 2
    assert load_config("") == FilterConfig()
    with pytest.raises(ValueError):
        load_config("not_a_key: 1\n")


def test_count_invariant(spark):
    from corpusama_spark.operators.schema_drift import count_invariant

    df = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    out = {
        r.stage: (r.n, r.delta)
        for r in count_invariant(
            spark, {"raw": df, "kept": df.where("v >= 0"), "half": df.where("v < 5")}
        ).collect()
    }
    assert out == {"raw": (10, 0), "kept": (10, 0), "half": (5, -5)}
