"""JSONL quarantine source (X265): clean lane fully parsed, malformed
and type-mismatched lines retained with raw text, triage report."""

import pytest

from corpusama_spark.sources.jsonl import (
    quarantine_report,
    read_jsonl_quarantine,
)


LINES = [
    '{"image_id": "a", "w": 640, "caption": "a red fox"}',
    '{"image_id": "b", "w": 480, "caption": "blue sky"}',
    '{"image_id": "c", "w": "not-a-number", "caption": "bad width"}',
    '{"image_id": "d", "w": 100, "caption": "truncated',  # malformed JSON
    'not json at all',
    '{"image_id": "e", "w": 320, "caption": null}',  # valid: null caption
]


@pytest.fixture()
def path(tmp_path):
    p = tmp_path / "feed.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_lanes_split_and_nothing_lost(spark, path):
    clean, quar = read_jsonl_quarantine(
        spark, path, "image_id string, w int, caption string"
    )
    c = {r.image_id: r for r in clean.collect()}
    q = quar.collect()
    # every input line is in exactly one lane
    assert len(c) + len(q) == len(LINES)
    assert set(c) == {"a", "b", "e"}
    assert c["e"].caption is None and c["a"].w == 640
    # quarantine keeps the raw line for triage
    raws = sorted(r.raw_line for r in q)
    assert any("not-a-number" in r for r in raws)
    assert any(r == "not json at all" for r in raws)
    # the clean lane never smuggles a corrupt column
    assert "_corrupt_record" not in clean.columns


def test_quarantine_report_shapes(spark, path):
    _, quar = read_jsonl_quarantine(
        spark, path, "image_id string, w int, caption string"
    )
    rep = {r.failure: r.n for r in quarantine_report(quar).collect()}
    assert rep.get("bad_w") == 1          # type mismatch on w
    assert rep.get("not_json", 0) >= 2    # truncated + non-json lines


def test_schema_must_not_declare_corrupt_col(spark, path):
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl_quarantine(
            spark, path, "image_id string, _corrupt_record string"
        )
