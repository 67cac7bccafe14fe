"""Exposure/contrast/entropy image gate (X212): numpy parity over
lossless PNG round-trips, reason precedence, tolerated failures."""

import numpy as np


def _expected(arr):
    a = arr.astype("float64")
    luma = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    lu8 = np.clip(np.round(luma), 0, 255).astype("int64")
    n = lu8.size
    hist = np.bincount(lu8.ravel(), minlength=256)
    clo = float(np.round(hist[:8].sum() / n, 6))
    chi = float(np.round(hist[248:].sum() / n, 6))
    p1, p99 = np.percentile(lu8, [1.0, 99.0])
    h64 = hist.reshape(64, 4).sum(axis=1)
    p = h64[h64 > 0] / n
    ent = float(np.round(-(p * np.log2(p)).sum(), 4))
    return clo, chi, int(p99 - p1), ent


def test_exposure_gate_numpy_parity_and_reasons(spark):
    from corpusama_spark.functions.imageops import exposure_gate
    from corpusama_spark.io.imagecodec import encode_png

    rng = np.random.RandomState(12)
    black = np.zeros((16, 16, 3), dtype=np.uint8)
    white = np.full((16, 16, 3), 255, dtype=np.uint8)
    # mid-gray wash: in-range but nearly constant -> low_contrast
    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    flat[0, 0] = 131
    good = rng.randint(20, 236, (16, 16, 3), dtype=np.uint8)
    rows = [
        ("black", encode_png(black), "png"),
        ("white", encode_png(white), "png"),
        ("flat", encode_png(flat), "png"),
        ("good", encode_png(good), "png"),
        ("bad", b"\x89nope", "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    )
    out = {r.image_id: r for r in exposure_gate(df).collect()}

    assert out["black"].clip_low == 1.0
    assert not out["black"].exposure_keep
    assert out["black"].exposure_reason == "underexposed"
    assert out["black"].luma_entropy == 0.0

    assert out["white"].clip_high == 1.0
    assert out["white"].exposure_reason == "overexposed"

    assert out["flat"].exposure_reason == "low_contrast"
    assert out["flat"].dyn_range < 16

    clo, chi, dyn, ent = _expected(good)
    g = out["good"]
    assert (g.clip_low, g.clip_high, g.dyn_range, g.luma_entropy) == (
        clo,
        chi,
        dyn,
        ent,
    )
    assert g.exposure_keep and g.exposure_reason is None

    b = out["bad"]
    assert not b.exposure_keep
    assert b.exposure_reason.startswith("decode_error:")
    assert b.luma_entropy is None


def test_exposure_gate_layout_invariant(spark):
    from corpusama_spark.functions.imageops import exposure_gate
    from corpusama_spark.io.imagecodec import encode_png

    rng = np.random.RandomState(3)
    rows = [
        (f"i{k}", encode_png(rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)),
         "png")
        for k in range(24)
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    )
    a = sorted(map(tuple, exposure_gate(df.repartition(2)).collect()))
    b = sorted(map(tuple, exposure_gate(df.repartition(9)).collect()))
    assert a == b
