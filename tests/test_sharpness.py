"""Variance-of-Laplacian blur gate (imageops.sharpness_gate): numpy
parity on lossless PNG round-trips, plus the tolerated-failure paths
(corrupt bytes, sub-3×3 images)."""

import numpy as np


def _lapvar(arr):
    luma = (
        0.299 * arr[:, :, 0].astype("float64")
        + 0.587 * arr[:, :, 1].astype("float64")
        + 0.114 * arr[:, :, 2].astype("float64")
    )
    lap = (
        luma[:-2, 1:-1]
        + luma[2:, 1:-1]
        + luma[1:-1, :-2]
        + luma[1:-1, 2:]
        - 4.0 * luma[1:-1, 1:-1]
    )
    return float(np.round(lap.var(), 4))


def test_sharpness_gate_matches_numpy_and_flags_failures(spark):
    from corpusama_spark.functions.imageops import sharpness_gate
    from corpusama_spark.io.imagecodec import encode_png

    rng = np.random.RandomState(11)
    flat = np.full((16, 16, 3), 128, dtype=np.uint8)  # lap_var = 0
    noisy = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)  # sharp
    # checkerboard: high-frequency structure -> very sharp
    cb = (np.indices((12, 12)).sum(axis=0) % 2 * 255).astype(np.uint8)
    board = np.stack([cb, cb, cb], axis=2)
    tiny = np.full((2, 2, 3), 7, dtype=np.uint8)

    rows = [
        ("flat", encode_png(flat), "png"),
        ("noisy", encode_png(noisy), "png"),
        ("board", encode_png(board), "png"),
        ("tiny", encode_png(tiny), "png"),
        ("corrupt", b"\x00\x01garbage", "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {r.image_id: r for r in sharpness_gate(df, min_lap_var=1.0).collect()}

    assert out["flat"].lap_var == 0.0
    assert out["flat"].sharp_keep is False
    assert out["flat"].sharp_reason == "blurry"

    for name, arr in (("noisy", noisy), ("board", board)):
        assert abs(out[name].lap_var - _lapvar(arr)) < 1e-9
        assert out[name].sharp_keep is True
        assert out[name].sharp_reason is None

    assert out["tiny"].sharp_keep is False
    assert out["tiny"].sharp_reason == "too_small_for_laplacian"
    assert out["corrupt"].sharp_keep is False
    assert out["corrupt"].sharp_reason.startswith("decode_error:")
