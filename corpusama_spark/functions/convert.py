"""Type/format conversion scalar functions (reference corpusama/util/
convert.py and source/pdf.py) — all pure-JVM Column expressions.

F11 pdf_clean_text, F14 clean_xml_tokens, F16 list_to_string_no_sep,
F17 str_to_obj (from_json), F18 to_json_or_str. The list/NaN nullifiers
(F15/P7-P9) live in operators/flatten.py and functions/textrules.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# characters the PDF extractor drops (pdf.py:16 `drops="�\t"`)
PDF_DROPS = "�\t"

# invalid XML tokens removed at export time (util/util.py:82-84)
XML_INVALID = "\x0b\x0c\x1c\x1d\x1e"


def pdf_clean_text(col: Column) -> Column:
    """F11: the reference's pdf.clean_text chain, order-preserving
    (corpusama/source/pdf.py:16-33):

    1. drop characters -> space (translate)
    2. strip per-line leading/trailing spaces (`" *\\n *"` -> newline)
    3. collapse runs of 2+ spaces
    4. collapse 3+ newlines to a blank line
    5. strip outer whitespace (Python str.strip semantics, so a regex
       trim — Spark's trim() removes only spaces)
    """
    out = F.translate(col, PDF_DROPS, "  ")
    out = F.regexp_replace(out, r" *\n *", "\n")
    out = F.regexp_replace(out, r" {2,}", " ")
    out = F.regexp_replace(out, r"\n{3,}", "\n\n")
    return F.regexp_replace(out, r"^\s+|\s+$", "")


def clean_xml_tokens_col(col: Column) -> Column:
    """F14: remove invalid XML tokens \\x0b \\x0c \\x1c \\x1d \\x1e
    (corpusama/util/util.py:82-103) — a single JVM translate."""
    return F.translate(col, XML_INVALID, "")


def list_to_string_no_sep(col: Column) -> Column:
    """F16: join list items without a separator, then strip
    (convert.py:109-124; used for len-1 lists). NULL list -> NULL."""
    return F.when(col.isNotNull(), F.trim(F.array_join(col, "")))


def str_to_obj(col: Column, schema: str) -> Column:
    """F17: parse a JSON string cell into a typed value (convert.py:30-50).

    The reference falls back to the raw value when unparsable; from_json
    yields NULL there, so callers keep the original with
    ``F.coalesce(to_json(str_to_obj(c, s)), c)`` when they need the
    as-is fallback.
    """
    return F.from_json(col, schema)


def str_to_obj_any(col: Column) -> Column:
    """F17 complete: the reference's full parse ladder (convert.py:30-50)
    json.loads → ast.literal_eval → as-is, for legacy cells holding Python
    literals ("{'k': 1}", "('a', 'b')") that strict JSON parsing rejects.

    Returns struct(value string, kind string): ``value`` is the parsed
    object re-serialized with to_json_or_str semantics (convert.py:16-27 —
    json.dumps for lists/dicts, str() otherwise), ``kind`` records which
    rung parsed it ('json' | 'literal' | 'str'; NULL input stays NULL).
    Arrow-batched pandas UDF — per-element parsing is inherent to ast, but
    batches cross the boundary once; use the pure-JVM ``str_to_obj``
    (from_json) wherever cells are known-JSON.
    """
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField("value", StringType()), StructField("kind", StringType())]
    )

    @F.pandas_udf(schema)
    def _udf(s: pd.Series) -> pd.DataFrame:
        import ast
        import json

        vals, kinds = [], []
        for x in s:
            if x is None:
                vals.append(None)
                kinds.append(None)
                continue
            obj, kind = x, "str"
            if x:  # falsy strings return as-is, like the reference
                try:
                    obj, kind = json.loads(x), "json"
                except (json.JSONDecodeError, TypeError):
                    try:
                        obj, kind = ast.literal_eval(x), "literal"
                    except (SyntaxError, ValueError):
                        pass
            if isinstance(obj, (list, dict)):
                try:
                    vals.append(json.dumps(obj))
                except TypeError:  # unserializable payload: keep repr
                    vals.append(str(obj))
            else:
                vals.append(str(obj))
            kinds.append(kind)
        return pd.DataFrame({"value": vals, "kind": kinds})

    return _udf(col)


def to_json_or_str(col: Column, dtype: str) -> Column:
    """F18: lists/dicts -> JSON string, anything else -> str
    (convert.py:16-27). ``dtype`` is the column's Spark type name; complex
    types serialize via to_json, scalars cast."""
    if dtype.startswith(("array", "map", "struct")):
        return F.to_json(col)
    return col.cast("string")
