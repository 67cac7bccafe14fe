"""X181-X183: t-closeness EMD gate, image header-consistency audit,
and per-channel dataset normalization statistics."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from corpusama_spark.functions.images import header_audit
from corpusama_spark.functions.imageops import channel_stats
from corpusama_spark.io.imagecodec import encode_png, encode_qimg
from corpusama_spark.operators.privacy import t_closeness


# ------------------------------------------------------- t-closeness
def test_t_closeness_known_values(spark):
    # global support {1, 2}, q = (0.75, 0.25)
    # class A: all 1s -> p = (1, 0); t = |1 - 0.75| / (2-1) = 0.25
    # class C: all 2s -> p = (0, 1); t = |0 - 0.75| = 0.75
    rows = [("A", 1), ("A", 1), ("B", 1), ("C", 2)]
    df = spark.createDataFrame(rows, "g string, sv int")
    out = {r["g"]: r for r in t_closeness(df, ["g"], "sv").collect()}
    assert out["A"]["t_close"] == 0.25 and out["A"]["n"] == 2
    assert out["C"]["t_close"] == 0.75
    # worst-first ordering
    got = [r["g"] for r in t_closeness(df, ["g"], "sv").collect()]
    assert got == ["C", "A", "B"]


def test_t_closeness_three_value_support(spark):
    # support {1,2,3}, global q=(1/3,1/3,1/3) from 6 rows
    # class A = {1,1}: p=(1,0,0); cums: 2/3, 1/3 -> t = (2/3+1/3)/2 = 0.5
    rows = [("A", 1), ("A", 1), ("B", 2), ("B", 3), ("B", 2), ("B", 3)]
    df = spark.createDataFrame(rows, "g string, sv int")
    out = {r["g"]: r for r in t_closeness(df, ["g"], "sv").collect()}
    assert out["A"]["t_close"] == pytest.approx(0.5, abs=1e-6)
    # B: p=(0,.5,.5); cum1 = -1/3, cum2 = -1/3+1/6 = -1/6 -> t = .25
    assert out["B"]["t_close"] == pytest.approx(0.25, abs=1e-6)


def test_t_closeness_single_support_and_nulls(spark):
    rows = [("A", 7), ("A", None), ("B", 7)]
    df = spark.createDataFrame(rows, "g string, sv int")
    out = {r["g"]: r for r in t_closeness(df, ["g"], "sv").collect()}
    assert out["A"]["t_close"] == 0.0 and out["A"]["n_null"] == 1
    assert out["B"]["t_close"] == 0.0 and out["B"]["n"] == 1


# ------------------------------------------------------ header audit
def _img(w, h, val=100):
    return np.full((h, w, 3), val, dtype=np.uint8)


def test_header_audit_parses_png_and_qimg(spark):
    rows = [
        (1, bytearray(encode_png(_img(20, 10))), 20, 10, "png"),
        (2, bytearray(encode_qimg(_img(33, 7), "jpeg")), 33, 7, "jpeg"),
        (3, bytearray(encode_qimg(_img(5, 6), "webp")), 5, 6, "webp"),
    ]
    df = spark.createDataFrame(rows, "id long, bytes binary, w int, h int, fmt string")
    out = {r["id"]: r for r in header_audit(df).collect()}
    for i in (1, 2, 3):
        assert out[i]["header_ok"] is True
        assert out[i]["w_parsed"] == out[i]["w"]
        assert out[i]["h_parsed"] == out[i]["h"]


def test_header_audit_flags_lying_metadata(spark):
    rows = [
        # declared w off by 3
        (1, bytearray(encode_qimg(_img(10, 10), "jpeg")), 13, 10, "jpeg"),
        # declared fmt wrong
        (2, bytearray(encode_png(_img(4, 4))), 4, 4, "jpeg"),
        # truncated garbage -> sniff fails, parsed dims NULL
        (3, bytearray(b"QI"), 4, 4, "jpeg"),
        # real-JPEG magic: sniffed jpeg but dims unparseable -> not ok
        (4, bytearray(b"\xff\xd8\xff\xe0" + b"\x00" * 30), 4, 4, "jpeg"),
    ]
    df = spark.createDataFrame(rows, "id long, bytes binary, w int, h int, fmt string")
    out = {r["id"]: r for r in header_audit(df).collect()}
    assert out[1]["header_ok"] is False and out[1]["w_parsed"] == 10
    assert out[2]["header_ok"] is False and out[2]["fmt_sniffed"] == "png"
    assert out[3]["w_parsed"] is None and out[3]["header_ok"] is False
    assert out[4]["fmt_sniffed"] == "jpeg"
    assert out[4]["w_parsed"] is None and out[4]["header_ok"] is False


def test_header_audit_no_python_in_plan(spark):
    rows = [(1, bytearray(encode_png(_img(4, 4))), 4, 4, "png")]
    df = spark.createDataFrame(rows, "id long, bytes binary, w int, h int, fmt string")
    plan = header_audit(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # neither batch nor arrow


# ----------------------------------------------------- channel stats
def test_channel_stats_matches_numpy(spark):
    a = _img(4, 3, 10)
    b = _img(2, 2, 200)
    b[:, :, 1] = 50  # distinct green channel
    rows = [
        (1, bytearray(encode_png(a)), "png"),
        (2, bytearray(encode_png(b)), "png"),
        (3, bytearray(b"junk"), "png"),  # corrupt
    ]
    df = spark.createDataFrame(rows, "id long, bytes binary, fmt string")
    out = {r["channel"]: r for r in channel_stats(df).collect()}
    pix = np.concatenate(
        [a.reshape(-1, 3), b.reshape(-1, 3)]
    ).astype("float64")
    for ci, ch in enumerate(["r", "g", "b"]):
        assert out[ch]["n_pixels"] == 16
        assert out[ch]["n_images"] == 3
        assert out[ch]["n_corrupt"] == 1
        assert out[ch]["mean"] == pytest.approx(pix[:, ci].mean(), abs=1e-6)
        assert out[ch]["std"] == pytest.approx(pix[:, ci].std(), abs=1e-6)


def test_channel_stats_lossy_decode_quantized(spark):
    # qimg decode reconstructs quantized midpoints — stats follow decode
    a = _img(8, 8, 101)
    data = encode_qimg(a, "jpeg")
    from corpusama_spark.io.imagecodec import decode_image

    dec = decode_image(data, "jpeg").astype("float64")
    df = spark.createDataFrame(
        [(1, bytearray(data), "jpeg")], "id long, bytes binary, fmt string"
    )
    out = {r["channel"]: r for r in channel_stats(df).collect()}
    assert out["r"]["mean"] == pytest.approx(dec[:, :, 0].mean(), abs=1e-6)
