"""J7 sequence-alignment join + M1 fastText adapter seam."""

import sys
import types

from pyspark.sql import functions as F


def _tok_df(spark, doc_id, toks_tags):
    return spark.createDataFrame(
        [(doc_id, i, t, g) for i, (t, g) in enumerate(toks_tags)],
        "doc_id long, token_id long, token string, tag string",
    )


def test_align_tokens_statuses(spark):
    from corpusama_spark.operators.align import align_tokens

    old = _tok_df(
        spark, 1, [("the", "DT"), ("cat", "NN"), ("sat", "VB"), ("down", "RB")]
    )
    new = _tok_df(
        spark,
        1,
        [("the", "DT"), ("dog", "NN"), ("sat", "VBD"), ("down", "RB"), ("now", "RB")],
    )
    rows = align_tokens(old, new, tag_col="tag").collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, []).append(r)
    assert [r.token_a for r in by_status["same"]] == ["the", "down"]
    # same word, different tag -> comparable (the reference's C rows)
    assert [(r.token_a, r.tag_a, r.tag_b) for r in by_status["comparable"]] == [
        ("sat", "VB", "VBD")
    ]
    assert [(r.token_a, r.token_b) for r in by_status["changed"]] == [("cat", "dog")]
    assert [r.token_b for r in by_status["inserted"]] == ["now"]
    assert "deleted" not in by_status
    # positions survive the round trip for aligned rows
    sat = by_status["comparable"][0]
    assert (sat.pos_a, sat.pos_b) == (2, 2)


def test_align_tokens_disjoint_docs_and_summary(spark):
    from corpusama_spark.operators.align import (
        align_summary,
        align_tokens,
        tag_confusion,
    )

    old = _tok_df(spark, 1, [("a", "X"), ("b", "X")]).unionByName(
        _tok_df(spark, 2, [("only", "X"), ("old", "X")])
    )
    new = _tok_df(spark, 1, [("a", "Y"), ("b", "X")]).unionByName(
        _tok_df(spark, 3, [("only", "X"), ("new", "X")])
    )
    aligned = align_tokens(old, new, tag_col="tag")
    summary = {r.status: r.n for r in align_summary(aligned).collect()}
    # doc 2 exists only in old (2 deleted), doc 3 only in new (2 inserted)
    assert summary == {"same": 1, "comparable": 1, "deleted": 2, "inserted": 2}
    conf = tag_confusion(aligned).collect()
    assert [(r.tag_a, r.tag_b, r.n) for r in conf] == [("X", "Y", 1)]


def test_align_is_cogroup_not_row_python(spark):
    from corpusama_spark.operators.align import align_tokens
    from corpusama_spark.session import assert_no_row_python

    old = _tok_df(spark, 1, [("a", "X")])
    new = _tok_df(spark, 1, [("a", "X")])
    aligned = align_tokens(old, new, tag_col="tag")
    assert_no_row_python(aligned)  # applyInPandas cogroup, not BatchEvalPython
    plan = aligned._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan


def test_fasttext_adapter_contract():
    """FastTextAdapter must translate fastText's list-predict output shape
    into the module's (langs, scores) contract."""
    import numpy as np

    from corpusama_spark.functions.langid import FastTextAdapter

    class _StubFt:
        def predict(self, lines):
            labels = [["__label__en"] if "the" in ln else ["__label__fr"] for ln in lines]
            scores = [np.array([0.97]) for _ in lines]
            return labels, scores

    adapter = FastTextAdapter(_StubFt())
    langs, scores = adapter.predict(["the cat", "le chat"])
    assert langs == ["en", "fr"]
    assert scores == [0.97, 0.97]
    assert all(isinstance(s, float) for s in scores)


def test_load_model_env_seam(monkeypatch, tmp_path):
    """With $CORPUSAMA_FASTTEXT_MODEL set, load_model must go through
    fasttext.load_model + FastTextAdapter (stubbed module, real seam)."""
    from corpusama_spark.functions import langid as L

    model_file = tmp_path / "tiny.bin"
    model_file.write_bytes(b"stub")
    loaded = {}

    stub = types.ModuleType("fasttext")

    def load_model(path):
        loaded["path"] = path

        class _Ft:
            def predict(self, lines):
                return [["__label__es"]] * len(lines), [[0.5]] * len(lines)

        return _Ft()

    stub.load_model = load_model
    monkeypatch.setitem(sys.modules, "fasttext", stub)
    monkeypatch.setenv("CORPUSAMA_FASTTEXT_MODEL", str(model_file))
    model = L.load_model()
    assert isinstance(model, L.FastTextAdapter)
    assert loaded["path"] == str(model_file)
    langs, scores = model.predict(["hola"])
    assert langs == ["es"] and scores == [0.5]

    monkeypatch.delenv("CORPUSAMA_FASTTEXT_MODEL")
    assert not isinstance(L.load_model(), L.FastTextAdapter)
