"""Skin-share routing pre-filter (X242): numpy mirror, constructed
skin/blue/centered images, corrupt tolerance, threshold routing."""

import numpy as np


def _png(arr):
    from corpusama_spark.io.imagecodec import encode_png

    return bytearray(encode_png(arr))


def _flat(rgb, h=40, w=40):
    return np.tile(np.array(rgb, dtype=np.uint8), (h, w, 1))


def test_skin_gate(spark):
    from corpusama_spark.functions.imageops import _skin_mask, skin_gate

    skin = _flat((220, 170, 140))      # passes every rule term
    blue = _flat((30, 60, 200))
    centered = _flat((30, 60, 200))
    centered[10:30, 10:30] = (220, 170, 140)  # skin only in the center
    rows = [
        (1, _png(skin), "png"),
        (2, _png(blue), "png"),
        (3, _png(centered), "png"),
        (4, bytearray(b"garbage"), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id long, bytes binary, fmt string")
    out = {r.image_id: r for r in skin_gate(df).collect()}

    assert 4 not in out  # corrupt tolerated
    assert out[1].skin_share == 1.0 and out[1].route_to_scorer
    assert out[2].skin_share == 0.0 and not out[2].route_to_scorer
    # centered: whole-frame share 25%, center-crop share 100%
    assert out[3].skin_share == 0.25
    assert out[3].center_skin_share == 1.0
    assert out[3].route_to_scorer  # the center threshold catches it

    # numpy mirror on a gradient image
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    df2 = spark.createDataFrame(
        [(9, _png(arr), "png")], "image_id long, bytes binary, fmt string"
    )
    r = skin_gate(df2).collect()[0]
    m = _skin_mask(arr)
    assert r.skin_share == round(float(m.sum()) / m.size, 6)
    c = m[8:24, 8:24]
    assert r.center_skin_share == round(float(c.sum()) / c.size, 6)
