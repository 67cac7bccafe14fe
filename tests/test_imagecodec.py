import numpy as np
import pytest

from corpusama_spark.io import imagecodec as ic


def _arr(h=20, w=15, seed=3):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    a = _arr()
    data = ic.encode_png(a)
    b = ic.decode_png(data)
    assert np.array_equal(a, b)
    assert ic.psnr(a, b) == float("inf")


def test_png_corrupt_rejected():
    data = bytearray(ic.encode_png(_arr()))
    with pytest.raises(ValueError):
        ic.decode_png(bytes(data[: len(data) // 2]))
    data[30] ^= 0xFF  # flip a byte inside IHDR payload -> CRC mismatch
    with pytest.raises(ValueError):
        ic.decode_png(bytes(data))


def test_qimg_lossy_but_above_40db():
    a = _arr(32, 32, seed=7)
    data = ic.encode_qimg(a, "jpeg")
    b = ic.decode_qimg(data)
    p = ic.psnr(a, b)
    assert 40.0 <= p < float("inf")


def test_decode_image_routes_by_fmt():
    a = _arr(8, 8)
    assert np.array_equal(ic.decode_image(ic.encode_png(a), "png"), a)
    assert ic.decode_image(ic.encode_qimg(a, "webp"), "webp").shape == a.shape
    with pytest.raises(ValueError):
        ic.decode_image(b"junk", "png")
    with pytest.raises(ValueError):
        ic.decode_image(ic.encode_png(a), "tiff")


def test_roundtrip_lossy_equals_real_roundtrip():
    """The analytic roundtrip the verify stage uses must be BYTE-EQUAL to
    an actual encode_qimg -> decode_qimg pass — the honesty pin for
    skipping the zlib serialize/deserialize in the hot path."""
    import numpy as np

    from corpusama_spark.io.imagecodec import (
        decode_qimg,
        encode_qimg,
        roundtrip_lossy,
    )

    rng = np.random.default_rng(11)
    for shape in [(5, 7, 3), (32, 32, 3), (17, 64, 3)]:
        arr = rng.integers(0, 256, shape).astype(np.uint8)
        for fmt in ("jpeg", "webp"):
            want = decode_qimg(encode_qimg(arr, fmt))
            got = roundtrip_lossy(arr, fmt)
            assert np.array_equal(got, want), (shape, fmt)
