"""Mojibake detection/repair (functions/mojibake.py): property-tested
kernel, distributed split-union parity, plan shape."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from corpusama_spark.functions.mojibake import (
    MOJIBAKE_PATTERN,
    flag_mojibake,
    fix_mojibake,
    repair_text,
)

# text worth repairing: at least one non-ASCII char below U+0800 (2-byte
# UTF-8), and ITSELF already a repair fixpoint — a string like "Â\x80" IS
# the mojibake of "\x80", and repair correctly converges past it to the
# fixpoint (the same inherent ambiguity ftfy documents), so the inversion
# property quantifies over genuine (stable) plaintexts only.
_interesting = (
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7FF),
        min_size=1,
        max_size=40,
    )
    .filter(lambda s: any(ord(c) > 0x7F for c in s))
    .filter(lambda s: repair_text(s) == s)
)


def _mojibake(s: str, codec: str) -> str | None:
    try:
        return s.encode("utf-8").decode(codec)
    except UnicodeDecodeError:
        return None


@settings(max_examples=300, deadline=None)
@given(_interesting, st.sampled_from(["latin-1", "cp1252"]))
def test_repair_inverts_mojibake(s, codec):
    broken = _mojibake(s, codec)
    if broken is None or broken == s:
        return
    assert repair_text(broken) == s


@settings(max_examples=300, deadline=None)
@given(_interesting)
def test_repair_inverts_double_mojibake(s):
    once = _mojibake(s, "latin-1")
    twice = _mojibake(once, "latin-1")
    assert repair_text(twice) == s


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
               max_size=60))
def test_ascii_is_fixed_point_and_never_flagged(s):
    assert repair_text(s) == s
    assert not re.search(MOJIBAKE_PATTERN, s)


@settings(max_examples=300, deadline=None)
@given(_interesting, st.sampled_from(["latin-1", "cp1252"]))
def test_flag_catches_2byte_mojibake(s, codec):
    """Every 2-byte-range mojibake string the repair can fix, the JVM
    telltale must also catch — the gate must not starve the fixer."""
    broken = _mojibake(s, codec)
    if broken is None or repair_text(broken) == broken:
        return
    if all(ord(c) < 0x800 for c in s):
        assert re.search(MOJIBAKE_PATTERN, broken), repr(broken)


def test_mixed_legit_and_mojibake_repairs_per_region():
    """ADVICE r3: a row mixing legitimate non-ASCII with damage (the fr/de
    crawl common case) must still repair — the whole-string roundtrip fails
    both codecs ('…' blocks latin-1, 'é…' bytes break UTF-8), so each
    telltale run round-trips on its own and the clean text never re-encodes."""
    assert repair_text("café … cafÃ©") == "café … café"
    assert repair_text("naïve — donâ€™t") == "naïve — don’t"


def test_gate_keeps_text_when_telltales_do_not_decrease():
    """ADVICE r3: a successful roundtrip is NOT sufficient — here the
    repaired form ('Ã…') still contains exactly one telltale match, so the
    rewrite is evidence-free and the original must be kept verbatim (the
    old unconditional accept iterated it into 'Å', destroying data)."""
    s = "Ã…"
    assert repair_text(s) == s


def test_fix_mojibake_distributed_parity(spark):
    rows = [
        (1, "plain ascii stays put"),
        (2, "cafÃ© au lait"),                  # latin-1 mojibake
        (3, "donâ€™t â€” ever"),          # cp1252 mojibake
        (4, None),
        (5, "legit café already clean"),
        (6, "cafÃƒÂ© double"),                # double mojibake
        (7, "café … cafÃ©"),                   # mixed legit + damage
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in fix_mojibake(df).collect()}
    assert got == {i: repair_text(t) for i, t in rows}
    assert got[2] == "café au lait"
    assert got[3] == "don’t — ever"
    assert got[6] == "café double"
    assert got[4] is None and got[1] == rows[0][1]


def test_flag_column_and_python_stays_off_clean_branch(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "clean"), (2, "cafÃ©")], "doc_id long, text string"
    )
    flags = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", flag_mojibake(F.col("text")).alias("f")
        ).collect()
    }
    assert flags == {1: False, 2: True}
    # the detection column itself is pure JVM
    plan = (
        df.select(flag_mojibake(F.col("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
