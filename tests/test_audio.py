"""Audio lane (io/audiocodec.py, functions/audioops.py): codec round-trip,
feature parity, resample, corrupt tolerance, metadata gate, plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from corpusama_spark.functions.audioops import (
    audio_features,
    audio_rules,
    resample_audio,
)
from corpusama_spark.io.audiocodec import (
    decode_audio,
    encode_qaud,
    synth_audio,
)
from corpusama_spark.session import assert_no_row_python


def test_codec_roundtrip_and_determinism():
    s = (np.sin(np.linspace(0, 20, 1600)) * 30000).astype("<i2")
    rate, back = decode_audio(encode_qaud(s, 16000))
    assert rate == 16000
    assert np.array_equal(back, s)
    assert synth_audio(7) == synth_audio(7)
    assert synth_audio(7) != synth_audio(8)
    for bad in (b"", b"QAUDxx", b"XXXX" + b"\0" * 20,
                encode_qaud(s, 16000)[:-3]):
        with pytest.raises(ValueError):
            decode_audio(bad)


def test_audio_features_match_numpy(spark):
    blobs = {
        1: synth_audio(1, sample_rate=8000, seconds=0.1),
        2: synth_audio(2, sample_rate=16000, seconds=0.05),
        3: synth_audio(3)[:30],              # truncated body (header is 12 B)
        4: b"WAVE" + b"\0" * 40,             # bad magic
        5: encode_qaud(np.zeros(800, "<i2"), 8000),  # pure silence
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()],
        "doc_id long, audio binary",
    )
    out = df.select("doc_id", audio_features(F.col("audio")).alias("f")).select(
        "doc_id", "f.*"
    )
    assert_no_row_python(out)
    got = {r.doc_id: r for r in out.collect()}
    assert got[3].audio_ok is False and got[3].audio_reason == "audio_truncated_body"
    assert got[4].audio_ok is False and got[4].audio_reason == "audio_bad_magic"
    assert got[5].audio_ok and got[5].silence_ratio == 1.0 and got[5].rms == 0.0
    for d in (1, 2):
        rate, s = decode_audio(blobs[d])
        x = s.astype(np.float64) / 32767.0
        assert got[d].audio_ok
        assert got[d].sample_rate == rate and got[d].n_samples == len(x)
        assert got[d].duration_s == round(len(x) / rate, 6)
        assert got[d].rms == round(float(np.sqrt(np.mean(x * x))), 6)
        zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        assert got[d].zero_cross_rate == round(zc, 6)
        assert 0 <= got[d].clip_ratio <= 0.05


def test_resample_preserves_duration(spark):
    df = spark.createDataFrame(
        [(1, bytearray(synth_audio(5, sample_rate=16000, seconds=0.2))),
         (2, bytearray(b"junk"))],
        "doc_id long, audio binary",
    )
    out = {
        r.doc_id: r.r
        for r in df.select(
            "doc_id", resample_audio(F.col("audio"), 8000).alias("r")
        ).collect()
    }
    assert out[2] is None
    rate, s = decode_audio(bytes(out[1]))
    assert rate == 8000
    assert abs(len(s) / 8000 - 0.2) < 0.001  # duration preserved
    # content survives: resampled tone correlates with the original
    _, orig = decode_audio(synth_audio(5, sample_rate=16000, seconds=0.2))
    ds = orig.astype(np.float64)[::2]
    c = np.corrcoef(ds[: len(s)], s[: len(ds)].astype(np.float64))[0, 1]
    assert c > 0.95


def test_audio_rules_reasons(spark):
    rows = [
        (1, 16000, 16000),        # 1 s -> keep
        (2, 16000, 100),          # too short
        (3, 16000, 16000 * 700),  # too long
        (4, 12345, 16000),        # unsupported rate
        (5, 16000, 0),            # empty
        (6, None, 16000),         # missing meta
    ]
    df = spark.createDataFrame(rows, "doc_id long, sample_rate int, n_samples long")
    got = {r.doc_id: (r.audio_keep, r.audio_drop_reason)
           for r in audio_rules(df).collect()}
    assert got == {
        1: (True, None),
        2: (False, "audio_too_short"),
        3: (False, "audio_too_long"),
        4: (False, "audio_rate_unsupported"),
        5: (False, "audio_empty"),
        6: (False, "audio_meta_missing"),
    }
    # the gate is pure JVM: no Python node of any kind
    plan = (
        audio_rules(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
