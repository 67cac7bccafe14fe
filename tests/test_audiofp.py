"""Spectral audio fingerprints + near-dup pairs (X204)."""

import numpy as np


def _tone(seed, n=8192, rate=16000):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / rate
    f1, f2 = 200 + 50 * (seed % 7), 900 + 80 * (seed % 5)
    x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    x += 0.01 * rng.randn(n)
    return (x * 20000).clip(-32767, 32767).astype("<i2")


def _df(spark, rows):
    from corpusama_spark.io.audiocodec import encode_qaud

    data = [(i, encode_qaud(s, 16000)) for i, s in rows]
    return spark.createDataFrame(data, "doc_id long, audio binary")


def test_fingerprints_scale_invariant_and_deterministic(spark):
    from corpusama_spark.functions.audioops import audio_fingerprints

    base = _tone(1)
    half = (base.astype("float64") * 0.5).astype("<i2")
    df = _df(spark, [(1, base), (2, half), (3, _tone(9))])
    fp = {
        (r.id, r.frame_idx): r.subfp
        for r in audio_fingerprints(df).collect()
    }
    frames = sorted(i for (d, i) in fp if d == 1)
    assert len(frames) >= 10
    # amplitude scaling preserves every sign bit
    same = sum(fp[(1, i)] == fp[(2, i)] for i in frames)
    assert same >= 0.9 * len(frames)
    # a different tone disagrees on most frames
    diff = sum(fp[(1, i)] == fp[(3, i)] for i in frames)
    assert diff <= 0.5 * len(frames)
    # corrupt bytes emit nothing, never raise
    bad = spark.createDataFrame(
        [(9, b"nope")], "doc_id long, audio binary"
    )
    assert audio_fingerprints(bad).count() == 0


def test_audio_near_dups_find_relevelled_copy(spark):
    from corpusama_spark.functions.audioops import audio_near_dups

    rows = [(1, _tone(1))]
    # 2 = re-levelled copy of 1; 3..6 distinct tones
    half = (_tone(1).astype("float64") * 0.7).astype("<i2")
    rows.append((2, half))
    rows += [(i, _tone(i * 13)) for i in range(3, 7)]
    out = audio_near_dups(_df(spark, rows), min_matches=4).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs
    assert pairs[(1, 2)].agreement > 0.8
    # no false pair dominates the true one
    for (a, b), r in pairs.items():
        if (a, b) != (1, 2):
            assert r.agreement < pairs[(1, 2)].agreement
