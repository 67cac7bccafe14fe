"""Mojibake detection and repair (ftfy's core fix, engine-shaped).

Web-crawled text is full of double-encoding damage: UTF-8 bytes decoded
as cp1252/latin-1 somewhere upstream ("cafÃ©", "â€” ", "donâ€™t").
ftfy (Speer 2019, public) repairs it by round-tripping: re-encode the
damaged string with the wrong codec, re-decode as UTF-8. The roundtrip
itself needs real codecs — Python territory — so the engine splits the
work the way a 10^12-row deployment must:

1. ``flag_mojibake``: a pure-JVM regexp over the telltale byte shapes
   (a latin-1 lead byte Ã/Â/Ê… followed by a continuation-range char, or
   the cp1252 punctuation cluster â€¦). This is the SCAN-STAGE gate: on
   real crawls ≲1% of rows flag, so 99% of the corpus never leaves the
   JVM.
2. ``fix_mojibake``: Arrow-batched roundtrip repair applied ONLY to the
   flagged slice (filter → repair → union with the untouched slice).
   The clean side is a pass-through projection; the dirty side pays one
   Python exchange for the rows that actually need it. Iterates (≤3) so
   double-mojibake ("cafÃƒÂ©") also lands. Two safety properties:

   - MIXED content repairs: when the whole string fails the roundtrip
     (legitimate non-ASCII next to damage — "café … cafÃ©" on a fr
     crawl), each maximal run of telltale matches round-trips on its
     own, so the legitimate text never has to survive the wrong codec.
   - A repair is ACCEPTED only if it strictly reduces the telltale
     count (ftfy gates on a badness heuristic for the same reason), so
     text that merely byte-resembles mojibake is kept verbatim unless
     the rewrite actually removes damage shapes. Residual window: an
     isolated pair whose roundtrip lands on a clean codepoint ("×" +
     em-dash → "ח") still passes the count gate — full disambiguation
     needs language statistics, out of scope for a regex-gated kernel.

Reference seam: the reference normalizes entities and unicode the same
pass-through way (pipeline/ske_fr/uninorm_4.py, re-expressed in
functions/normalize.py); mojibake is the one damage class uninorm cannot
see because the damage happened before the text was text.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Lead bytes of 2-byte UTF-8 sequences decode (latin-1/cp1252) to Ã..Ã¿ /
# Â..; 3-byte (CJK, punctuation) sequences start with à-ï forms like â, ã,
# ä, å, æ, ç, è, é, ê, ë, ì, í, î, ï followed by two continuation chars.
# The continuation range 0x80-0xBF decodes to U+0080-U+00BF (latin-1) or
# the cp1252 remap of its holes (€‚ƒ„…†‡ˆ‰Š‹ŒŽ''""•–—˜™š›œžŸ).
# U+0080-U+00BF: latin-1 decode of UTF-8 continuation bytes; the named
# chars: cp1252 remaps of the 0x80-0x9F byte "holes".
_CONT = (
    "\u0080-\u00bf"
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039"
    "\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc\u2122"
    "\u0161\u203a\u0153\u017e\u0178"
)
# Lead Â-ß covers every 2-byte UTF-8 sequence (U+0080-U+07FF — lead bytes
# 0xC2-0xDF decode latin-1/cp1252 to exactly Â..ß); à-ï covers 3-byte
# sequences. A telltale, not a proof — repair_text's roundtrip is the proof.
MOJIBAKE_PATTERN = f"[Â-ß][{_CONT}]|[à-ï][{_CONT}]{{2}}"


def flag_mojibake(text_col: Column) -> Column:
    """Pure-JVM telltale: True when the string contains byte shapes that
    only arise from UTF-8 read with a single-byte codec. RE2-safe, so the
    same pattern runs in the DuckDB oracle."""
    return F.coalesce(
        text_col.rlike(MOJIBAKE_PATTERN), F.lit(False)
    )


_MOJI_RE = re.compile(MOJIBAKE_PATTERN)
# Maximal runs of telltale matches: adjacent damaged sequences repair as
# one region, so multi-char damage ("â€” " next to "â€¦") decodes whole.
_MOJI_RUN_RE = re.compile(f"(?:{MOJIBAKE_PATTERN})+")


def _roundtrip_string(s: str) -> str | None:
    """Wrong-codec → UTF-8 roundtrip of exactly ``s``; None if no codec
    ladder step survives (not encodable with either single-byte codec, or
    the bytes are not valid UTF-8 — i.e. ``s`` wasn't mojibake after all)."""
    for codec in ("cp1252", "latin-1"):
        try:
            raw = s.encode(codec)
        except UnicodeEncodeError:
            continue
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            continue
    return None


def _roundtrip_once(s: str) -> str:
    """One repair pass: whole-string roundtrip when the string survives a
    single-byte encode (pure-ASCII-plus-damage, the crawl common case),
    else per-region — each maximal telltale run round-trips independently
    so legitimate non-ASCII outside the runs is never re-encoded."""
    whole = _roundtrip_string(s)
    if whole is not None:
        return whole

    def _sub(m: re.Match) -> str:
        fixed = _roundtrip_string(m.group(0))
        return fixed if fixed is not None else m.group(0)

    return _MOJI_RUN_RE.sub(_sub, s)


def repair_text(s: str, max_rounds: int = 3) -> str:
    """Driver/test-visible scalar kernel: iterate the roundtrip until
    stable (handles double-mojibake) or ``max_rounds``. Every accepted
    round must strictly REDUCE the telltale-match count — a successful
    decode that doesn't remove damage shapes is evidence the input merely
    byte-resembled mojibake, and the original is kept."""
    if s is None:
        return None
    count = len(_MOJI_RE.findall(s))
    if count == 0:
        return s
    for _ in range(max_rounds):
        fixed = _roundtrip_once(s)
        if fixed == s:
            break
        new_count = len(_MOJI_RE.findall(fixed))
        if new_count >= count:
            break
        s, count = fixed, new_count
        if count == 0:
            break
    return s


def fix_mojibake(
    df: DataFrame, text_col: str = "text", max_rounds: int = 3
) -> DataFrame:
    """Same schema as ``df`` with ``text_col`` repaired on flagged rows.

    Plan shape: the flag splits the input into a JVM-only pass-through
    branch and a flagged branch that crosses into Arrow exactly once; the
    two union back losslessly (both keep every original column). The
    split-union reads the source twice, but the second read is a
    pruned-column scan of the ~1% flagged slice's columns — far cheaper
    at scale than shipping 100% of rows through Python to fix 1%."""
    flag = flag_mojibake(F.col(text_col))
    clean = df.where(~flag)
    dirty = df.where(flag)

    fields = [f.name for f in df.schema.fields]

    def _fix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[text_col] = [
                repair_text(s, max_rounds) for s in pdf[text_col]
            ]
            yield pdf

    repaired = dirty.mapInPandas(_fix, schema=df.schema)
    return clean.select(fields).unionByName(repaired.select(fields))
