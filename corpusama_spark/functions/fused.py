"""The fused text-stage UDF: normalize + clean + language-ID + perplexity
in ONE Arrow exchange.

Why one exchange instead of three chained pandas UDFs (prep → lid → ppl):
each ArrowEvalPython node owns its own Python worker per task, so a chain of
three triples the live Python processes (3 workers × tasks) and serializes
every intermediate (including the cleaned-lines arrays) through Arrow twice.
Measured on this box at 640k rows, the chained plan stopped scaling past ~4
cores (worker oversubscription); the fused plan keeps one worker per task
and the `lines` arrays never leave Python.

The constituent kernels stay importable and independently tested
(textrules.prep_caption, langid.lid_struct / analyze_lines,
perplexity.perplexity); this module only changes WHERE they run, not what
they compute — pinned by the equivalence tests in tests/test_pipeline.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from corpusama_spark.functions.langid import (
    DEFAULT_MAX_LANGS,
    DEFAULT_MIN_LEN,
    DEFAULT_THRESHOLD,
    analyze_lines,
    load_model,
)
from corpusama_spark.functions.normalize import normalize_text
from corpusama_spark.functions.perplexity import get_model
from corpusama_spark.functions.textrules import _DROP_TABLE

TEXT_STAGE_SCHEMA = StructType(
    [
        StructField("caption_norm", StringType(), True),
        StructField(
            "lid_arr",
            ArrayType(
                StructType(
                    [
                        StructField("lang", StringType(), True),
                        StructField("share", DoubleType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField("l1", StringType(), True),
        StructField("l1_size", DoubleType(), True),
        StructField("multiling", BooleanType(), True),
        StructField("ppl", DoubleType(), True),
    ]
)


def text_stage(
    caption_col: Column | str,
    min_len: int = DEFAULT_MIN_LEN,
    threshold: float = DEFAULT_THRESHOLD,
    max_langs: int = DEFAULT_MAX_LANGS,
) -> Column:
    """caption → struct(caption_norm, lid_arr, l1, l1_size, multiling, ppl)."""

    @F.pandas_udf(TEXT_STAGE_SCHEMA)
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        lid_model = load_model()
        ppl_model = get_model()
        none_lid = (None, None, None, None)
        for captions in batches:
            norms: list[str | None] = []
            lines_col: list[list[str] | None] = []
            for cap in captions:
                if not isinstance(cap, str):
                    norms.append(None)
                    lines_col.append(None)
                    continue
                segs = [normalize_text(line) for line in cap.split("\n")]
                norms.append("".join(segs))
                cleaned = []
                for seg in segs:
                    x = seg.translate(_DROP_TABLE)
                    if x.strip():
                        x = " ".join(x.split())
                        cleaned.append(x.lower() if x.isupper() else x)
                lines_col.append(cleaned)

            # one model call for the whole Arrow batch
            unique = sorted(
                {
                    ln
                    for lines in lines_col
                    if lines
                    for ln in lines
                    if len(ln) >= min_len
                }
            )
            langs, scores = lid_model.predict(unique)
            preds = dict(zip(unique, zip(langs, scores)))
            lid_rows = []
            for lines in lines_col:
                if not lines:
                    lid_rows.append(none_lid)
                    continue
                res = analyze_lines(
                    lines, lid_model, min_len, threshold, max_langs, preds
                )
                lid_rows.append(res if res is not None else none_lid)

            ppl = ppl_model.perplexity_batch(pd.Series(norms))
            out = pd.DataFrame(
                lid_rows, columns=["lid_arr", "l1", "l1_size", "multiling"]
            )
            out.insert(0, "caption_norm", norms)
            out["ppl"] = ppl
            yield out

    return _udf(F.col(caption_col) if isinstance(caption_col, str) else caption_col)
