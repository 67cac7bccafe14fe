"""Colorfulness/grayscale gate (X198) + border/letterbox audit (X199):
numpy parity over lossless PNG round-trips, tolerated failures."""

import numpy as np


def _colorfulness(arr):
    a = arr.astype("float64")
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    rg = r - g
    yb = 0.5 * (r + g) - b
    sigma = np.sqrt(rg.var() + yb.var())
    mu = np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    return float(np.round(sigma + 0.3 * mu, 4))


def test_colorfulness_gate_numpy_parity_and_reasons(spark):
    from corpusama_spark.functions.imageops import colorfulness_gate
    from corpusama_spark.io.imagecodec import encode_png

    rng = np.random.RandomState(5)
    gray = np.repeat(
        rng.randint(0, 256, (12, 12, 1), dtype=np.uint8), 3, axis=2
    )
    vivid = rng.randint(0, 256, (12, 12, 3), dtype=np.uint8)
    dull = np.full((12, 12, 3), 100, dtype=np.uint8)
    dull[:, :, 0] += 3  # tiny tint: not gray by channel, still dull
    rows = [
        ("gray", encode_png(gray), "png"),
        ("vivid", encode_png(vivid), "png"),
        ("dull", encode_png(dull), "png"),
        ("bad", b"\x00\x01garbage", "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    )
    out = {r.image_id: r for r in colorfulness_gate(df).collect()}

    assert out["gray"].is_gray and not out["gray"].color_keep
    assert out["gray"].color_reason == "grayscale"
    assert out["gray"].mean_spread == 0.0

    assert not out["vivid"].is_gray and out["vivid"].color_keep
    assert out["vivid"].colorfulness == _colorfulness(vivid)
    assert out["vivid"].color_reason is None

    assert not out["dull"].is_gray  # spread 3 > tol 2
    assert not out["dull"].color_keep
    assert out["dull"].color_reason == "low_colorfulness"

    assert out["bad"].color_reason.startswith("decode_error:")
    assert out["bad"].color_keep is False


def test_border_audit_detects_letterbox_and_crop(spark):
    from corpusama_spark.functions.imageops import border_crop_audit
    from corpusama_spark.io.imagecodec import encode_png

    rng = np.random.RandomState(9)
    # 100x80, 20-row black bands top+bottom -> letterbox
    lb = np.zeros((100, 80, 3), dtype=np.uint8)
    lb[20:80] = rng.randint(5, 250, (60, 80, 3), dtype=np.uint8)
    # 10-col white borders left+right -> pillarbox
    pb = np.full((50, 100, 3), 255, dtype=np.uint8)
    pb[:, 10:90] = rng.randint(5, 250, (50, 80, 3), dtype=np.uint8)
    solid = np.full((30, 30, 3), 42, dtype=np.uint8)
    clean = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    rows = [
        ("lb", encode_png(lb), "png"),
        ("pb", encode_png(pb), "png"),
        ("solid", encode_png(solid), "png"),
        ("clean", encode_png(clean), "png"),
        ("bad", b"nope", "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    )
    out = {r.image_id: r for r in border_crop_audit(df).collect()}

    r = out["lb"]
    assert (r.top, r.bottom) == (20, 20) and r.letterbox and not r.pillarbox
    assert (r.content_w, r.content_h) == (80, 60)
    assert r.content_frac == round(80 * 60 / (80 * 100), 4)

    r = out["pb"]
    assert (r.left, r.right) == (10, 10) and r.pillarbox and not r.letterbox
    assert (r.content_w, r.content_h) == (80, 50)

    assert out["solid"].border_reason == "all_flat"
    assert out["solid"].content_frac == 0.0

    r = out["clean"]
    assert (r.top, r.bottom, r.left, r.right) == (0, 0, 0, 0)
    assert r.content_frac == 1.0 and r.border_reason is None

    assert out["bad"].border_reason.startswith("decode_error:")
