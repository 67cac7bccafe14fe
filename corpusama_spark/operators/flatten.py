"""Nested-metadata flattening + XML doc-tag assembly.

Re-expresses the reference's attribute path (corpusama/util/flatten.py:11-65,
corpusama/corpus/attribute.py:20-116) over real nested Spark types instead of
JSON-in-TEXT cells:

- structs flatten to ``parent__child`` columns (separator "__", name mangling
  "." → "__", "-" → "_", attribute.py:31-32);
- arrays of structs become one array per leaf field (the reference's
  list-of-dicts → dict-of-lists, flatten.py:11-34) — no row explosion;
- multivalued leaves join with "|" after guarding existing separators
  (convert.py:84-106 semantics, F15);
- ``date__*`` columns get ``__year`` twins (attribute.py:102-116, F20);
- per-row XML start tags assemble from quoted attrs sorted by name with the
  ``file_id="FILE_ID"`` placeholder (attribute.py:69-99, F19; quoting
  util.py:106-118, F13).

Everything here is pure Column expressions — schema recursion happens at plan
build time on the driver, so Catalyst sees plain projections.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

SEP = "__"


def _mangle(name: str) -> str:
    return name.replace(".", SEP).replace("-", "_")


def flatten_columns(df: DataFrame, separator: str = SEP) -> DataFrame:
    """Fully flatten struct and array-of-struct columns (no explosion)."""
    while True:
        new_cols: list[Column] = []
        changed = False
        for field in df.schema.fields:
            name, dtype = field.name, field.dataType
            if isinstance(dtype, StructType):
                for sub in dtype.fields:
                    new_cols.append(
                        F.col(f"`{name}`.`{sub.name}`").alias(
                            _mangle(f"{name}{separator}{sub.name}")
                        )
                    )
                changed = True
            elif isinstance(dtype, ArrayType) and isinstance(
                dtype.elementType, StructType
            ):
                # list-of-struct → one array column per leaf (dict-of-lists)
                for sub in dtype.elementType.fields:
                    new_cols.append(
                        F.expr(f"transform(`{name}`, x -> x.`{sub.name}`)").alias(
                            _mangle(f"{name}{separator}{sub.name}")
                        )
                    )
                changed = True
            else:
                new_cols.append(F.col(f"`{name}`").alias(_mangle(name)))
        df = df.select(new_cols)
        if not changed:
            return df


def join_multivalues(
    df: DataFrame, separator: str = "|", replacement: str = "%7C"
) -> DataFrame:
    """Array columns → separator-joined strings; empty arrays → NULL.

    Existing separators inside elements percent-encode (the reference raises
    unless a replacement is configured, convert.py:99-104; we always encode —
    the raise is a config policy, not a dataflow semantics difference).
    Nulls inside arrays are pruned first (empty_list_to_none, convert.py:73-81).
    """
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, ArrayType) and not isinstance(
            field.dataType.elementType, (ArrayType, StructType)
        ):
            col = F.filter(
                F.transform(F.col(f"`{field.name}`"), lambda x: x.cast("string")),
                lambda x: x.isNotNull() & (F.trim(x) != ""),
            )
            joined = F.array_join(
                F.transform(col, lambda x: F.replace(x, F.lit(separator), F.lit(replacement))),
                separator,
            )
            out = out.withColumn(
                field.name,
                F.when(F.size(col) > 0, joined).otherwise(F.lit(None)),
            )
    return out


def add_year_columns(df: DataFrame, prefix: str = "date" + SEP) -> DataFrame:
    """date__* string/timestamp columns → date__*__year (F20)."""
    out = df
    for field in df.schema.fields:
        if field.name.startswith(prefix):
            out = out.withColumn(
                f"{field.name}{SEP}year",
                F.date_format(F.to_timestamp(F.col(f"`{field.name}`")), "yyyy"),
            )
    return out


def xml_quoteattr_col(col: Column) -> Column:
    """xml.sax.saxutils.quoteattr on a trimmed string (util.py:106-118).

    quoteattr prefers double quotes; values containing '\"' but no \"'\" wrap
    in single quotes; containing both wrap double with &quot;. &, <, >
    always escape.

    The strip matches PYTHON str.strip() semantics, not SQL trim: Python
    treats Unicode White_Space plus the \\x1c-\\x1f separators as
    whitespace; Spark's trim() removes only ASCII spaces.
    """
    py_ws = r"[\p{IsWhite_Space}\x1c-\x1f]+"
    s = F.regexp_replace(
        col.cast("string"), f"^{py_ws}|{py_ws}$", ""
    )
    esc = F.replace(
        F.replace(F.replace(s, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;")),
        F.lit(">"),
        F.lit("&gt;"),
    )
    # quoteattr additionally escapes embedded line/tab controls numerically
    for ch, ent in (("\n", "&#10;"), ("\r", "&#13;"), ("\t", "&#9;")):
        esc = F.replace(esc, F.lit(ch), F.lit(ent))
    has_dq = F.contains(s, F.lit('"'))
    has_sq = F.contains(s, F.lit("'"))
    return (
        F.when(~has_dq, F.concat(F.lit('"'), esc, F.lit('"')))
        .when(~has_sq, F.concat(F.lit("'"), esc, F.lit("'")))
        .otherwise(
            F.concat(
                F.lit('"'), F.replace(esc, F.lit('"'), F.lit("&quot;")), F.lit('"')
            )
        )
    )


def doc_tag_col(id_col: Column, attrs: dict[str, Column], file_id: Column | None = None) -> Column:
    """`<doc id=… file_id=… k=v …>` with attrs sorted by name (F19).

    ``file_id=None`` emits the `FILE_ID` placeholder filled at export time
    (attribute.py:85-90; export.py:51-53). NULL attr values are omitted
    (attribute.py:93-95).
    """
    parts: list[Column] = [F.lit("<doc id="), xml_quoteattr_col(id_col), F.lit(" ")]
    if file_id is not None:
        parts += [F.lit("file_id="), xml_quoteattr_col(file_id), F.lit(" ")]
    else:
        parts += [F.lit('file_id="FILE_ID" ')]
    for name in sorted(attrs):
        quoted = xml_quoteattr_col(attrs[name])
        parts.append(
            F.when(
                attrs[name].isNotNull(),
                F.concat(F.lit(f"{name}="), quoted, F.lit(" ")),
            ).otherwise(F.lit(""))
        )
    parts.append(F.lit(">"))
    return F.concat(*parts)
