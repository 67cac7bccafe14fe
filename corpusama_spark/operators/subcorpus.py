"""Subcorpus predicates — Sketch-Engine subcorpus definitions as filters.

The reference ships subcorpus registry files (registry_subcorp/rw_subcorp:
1-16, rw_en_subcorp; P13 in SURVEY §2.2) whose bodies are `attr=value` /
`attr!=value` lines where values are REGULAR EXPRESSIONS anchored over the
whole attribute (Manatee semantics). Example:

    =doc_pdf
      doc
      file_id!="0"
    =source_multi
      doc
      source__name=".*\\|.*"

This module parses that exact syntax into Column predicates, so a corpus
built by this engine can reuse the reference's subcorpus definitions
verbatim: `load_subcorpora(text) -> {name: Column}` and
`subcorpus(df, defn)` applies one.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COND_RE = re.compile(r'^\s*([A-Za-z0-9_]+)\s*(!?=)\s*"((?:[^"\\]|\\.)*)"\s*$')
_HEADER_RE = re.compile(r"^=([A-Za-z0-9_]+)\s*$")


def condition_to_column(attr: str, op: str, pattern: str) -> Column:
    """One `attr="regex"` / `attr!="regex"` line → Column predicate.

    Manatee matches the regex against the WHOLE value — emulate with
    ^(?:...)$ anchoring. NULL attributes never match a positive condition
    and always satisfy a negative one (absent ≠ pattern).
    """
    col = F.col(attr).cast("string")
    matched = col.rlike(f"^(?:{pattern})$")
    if op == "=":
        return F.coalesce(matched, F.lit(False))
    return F.coalesce(~matched, F.lit(True))


def load_subcorpora(text: str) -> dict[str, Column]:
    """Parse a subcorpus registry file body → {name: combined predicate}."""
    out: dict[str, Column] = {}
    name: str | None = None
    conds: list[Column] = []

    def flush():
        if name is not None and conds:
            pred = conds[0]
            for c in conds[1:]:
                pred = pred & c
            out[name] = pred

    for line in text.splitlines():
        header = _HEADER_RE.match(line.strip())
        if header:
            flush()
            name = header.group(1)
            conds = []
            continue
        m = _COND_RE.match(line)
        if m:
            conds.append(condition_to_column(m.group(1), m.group(2), m.group(3)))
    flush()
    return out


def subcorpus(df: DataFrame, predicate: Column) -> DataFrame:
    return df.where(predicate)
