"""Text-in-image likeness gate (X217): numpy parity, the dense-AND-banded
conjunction (text yes; smooth photo no; uniform texture no), tolerated
decode failures, layout invariance."""

import numpy as np


def _expected(arr, thresh=24):
    a = arr.astype("float64")
    luma = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    gx = np.abs(np.diff(luma, axis=1))
    edges = gx > thresh
    density = round(float(edges.mean()), 6)
    rc = edges.sum(axis=1).astype("float64")
    m = rc.mean()
    if m > 0:
        cv = round(float(rc.std() / m), 6)
        band = round(float((rc > 2.0 * m).mean()), 6)
    else:
        cv, band = 0.0, 0.0
    return density, cv, band


def _text_img():
    img = np.full((40, 40, 3), 255, dtype=np.uint8)
    for r0 in (4, 16, 28):
        for c in range(0, 40, 4):
            img[r0 : r0 + 6, c : c + 2] = 0  # glyph-ish strokes in bands
    return img


def test_textiness_conjunction_and_parity(spark):
    from corpusama_spark.functions.imageops import textiness_gate
    from corpusama_spark.io.imagecodec import encode_png

    rng = np.random.RandomState(4)
    text = _text_img()
    photo = np.tile(
        np.linspace(40, 200, 40).astype(np.uint8)[None, :, None], (40, 1, 3)
    )
    texture = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    rows = [
        ("text", encode_png(text), "png"),
        ("photo", encode_png(photo), "png"),
        ("texture", encode_png(texture), "png"),
        ("bad", b"\x89broken", "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    )
    out = {r.image_id: r for r in textiness_gate(df).collect()}

    for name, arr in (("text", text), ("photo", photo), ("texture", texture)):
        d, cv, band = _expected(arr)
        r = out[name]
        assert (r.edge_density, r.row_cv, r.band_share) == (d, cv, band), name

    assert out["text"].text_likely
    assert not out["photo"].text_likely  # sparse edges
    assert not out["texture"].text_likely  # dense but uniform (low cv)
    assert out["texture"].edge_density > 0.08  # it fails on cv, not density
    b = out["bad"]
    assert not b.text_likely and b.textiness_reason.startswith("decode_error:")
    assert b.edge_density is None


def test_textiness_layout_invariant(spark):
    from corpusama_spark.functions.imageops import textiness_gate
    from corpusama_spark.io.imagecodec import encode_png

    rng = np.random.RandomState(13)
    rows = [
        (
            f"i{k}",
            encode_png(rng.randint(0, 256, (12, 12, 3), dtype=np.uint8)),
            "png",
        )
        for k in range(20)
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    )
    a = sorted(map(tuple, textiness_gate(df.repartition(2)).collect()))
    b = sorted(map(tuple, textiness_gate(df.repartition(7)).collect()))
    assert a == b
