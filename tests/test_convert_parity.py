"""F17/F18 parity against the reference's own convert functions, run
in-process from /root/reference (the same load-at-test-time pattern the
normalize tests use for uninorm). defusedxml is shimmed with the stdlib
ElementTree because the wheel isn't in this sandbox — only the import is
shimmed, the functions under test are the reference's own."""

import sys
import types

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ref_convert():
    if "defusedxml" not in sys.modules:
        import xml.etree.ElementTree as _ET

        shim = types.ModuleType("defusedxml")
        shim.ElementTree = _ET
        sys.modules["defusedxml"] = shim
    sys.path.insert(0, "/root/reference")
    try:
        from corpusama.util import convert as ref

        yield ref
    finally:
        sys.path.remove("/root/reference")


CELLS = [
    '{"a": 1, "b": [2, 3]}',      # strict JSON
    "{'a': 1, 'b': (2, 3)}",      # python literal (legacy cell)
    "['x', 'y']",                  # python literal list
    "('t', 'u')",                  # tuple -> str() on re-serialize
    "3.5",
    "null",
    "None",
    "not json at all",
    "https://example.org/x?y=1",   # the SyntaxWarning URL case
    "",
    None,
]


def test_str_to_obj_any_matches_reference(spark, ref_convert):
    from corpusama_spark.functions.convert import str_to_obj_any

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CELLS)], "i long, c string"
    )
    got = {
        r.i: (r.o.value, r.o.kind)
        for r in df.select("i", str_to_obj_any(F.col("c")).alias("o")).collect()
    }
    import json

    for i, c in enumerate(CELLS):
        if c is None:
            assert got[i] == (None, None)
            continue
        obj = ref_convert.str_to_obj(c)
        want = (
            json.dumps(obj) if isinstance(obj, (list, dict)) else str(obj)
        )
        assert got[i][0] == want, (c, got[i], want)
    # kind records the parse rung
    assert got[0][1] == "json"
    assert got[1][1] == "literal"
    assert got[7][1] == "str"


def test_to_json_or_str_matches_reference(spark, ref_convert):
    """F18: the engine's typed to_json_or_str agrees with the reference's
    isinstance dispatch for list and scalar payloads."""
    from corpusama_spark.functions.convert import to_json_or_str

    df = spark.createDataFrame(
        [(["a", "b"], 7, "plain")], "l array<string>, n long, s string"
    )
    r = df.select(
        to_json_or_str(F.col("l"), "array<string>").alias("lj"),
        to_json_or_str(F.col("n"), "long").alias("nj"),
        to_json_or_str(F.col("s"), "string").alias("sj"),
    ).first()
    assert r.lj == ref_convert.to_json_or_str(["a", "b"]).replace(" ", "")
    assert r.nj == ref_convert.to_json_or_str(7)
    assert r.sj == ref_convert.to_json_or_str("plain")
