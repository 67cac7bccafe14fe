"""Magic-bytes format gate + token-entropy quality signal (round 4)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_sniffed_format_on_real_synth_bytes(spark):
    """Drive the sniffer over the REAL captions binary column: every
    non-corrupt row's sniffed container must equal its declared fmt, and
    the ~1% truncated streams must still sniff as their container (the
    magic header survives truncation to >= 8 bytes by construction)."""
    from corpusama_spark.functions.images import magic_gate
    from corpusama_spark.sources.synth import captions_df

    caps = captions_df(spark, 300, partitions=4)
    out = magic_gate(caps).select("image_id", "fmt", "fmt_sniffed", "magic_ok")
    rows = out.collect()
    assert len(rows) == 300
    mismatches = [r for r in rows if not r["magic_ok"]]
    # headers survive the synth's mid-stream truncation, so ALL rows agree
    assert mismatches == []
    assert {r["fmt_sniffed"] for r in rows} == {"png", "jpeg", "webp"}


def test_sniffed_format_edge_cases(spark):
    from corpusama_spark.functions.images import sniffed_format
    from corpusama_spark.io.imagecodec import PNG_SIG

    df = spark.createDataFrame(
        [
            Row(i=0, b=PNG_SIG + b"rest"),
            Row(i=1, b=b"QIMGjpeg" + b"\x00" * 9),
            Row(i=2, b=b"QIMGwebp" + b"\x00" * 9),
            Row(i=3, b=b"\xff\xd8\xff\xe0JFIF"),
            Row(i=4, b=b"RIFF\x00\x00\x00\x00WEBPVP8 "),
            Row(i=5, b=b"QIMGtiff----"),  # unknown QIMG payload fmt
            Row(i=6, b=b"garbage bytes"),
            Row(i=7, b=b""),
            Row(i=8, b=None),
        ]
    )
    got = {
        r["i"]: r["s"]
        for r in df.select("i", sniffed_format(F.col("b")).alias("s")).collect()
    }
    assert got == {
        0: "png",
        1: "jpeg",
        2: "webp",
        3: "jpeg",
        4: "webp",
        5: "unknown",
        6: "unknown",
        7: "missing",
        8: "missing",
    }


def test_token_entropy_formula(spark):
    from corpusama_spark.operators.textstats import token_entropy

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a a b b"),  # uniform over 2 → ln 2
            Row(doc_id=1, text="a a a a"),  # single type → 0
            Row(doc_id=2, text="a b c d"),  # uniform over 4 → ln 4
            Row(doc_id=3, text=None),
            Row(doc_id=4, text="  "),
        ]
    )
    rows = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert rows[0]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert rows[1]["entropy"] == 0.0
    assert rows[2]["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert rows[2]["ttr"] == 1.0
    assert rows[1]["ttr"] == 0.25
    assert rows[3]["entropy"] == 0.0 and rows[3]["n_tokens"] == 0
    assert rows[4]["vocab"] == 0
    assert len(rows) == 5
