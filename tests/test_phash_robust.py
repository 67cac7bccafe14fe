"""phash distortion-robustness audit (X236): identity pins 0 flips,
numpy mirror per distortion, corrupt bytes tolerated, summary math."""

import numpy as np


def test_flips_mirror_and_identity(spark):
    from corpusama_spark.functions.imageops import (
        _distort,
        phash64,
        phash_distortion_flips,
    )
    from corpusama_spark.io.imagecodec import decode_image
    from corpusama_spark.sources.synth import captions_df

    caps = captions_df(spark, 40, partitions=4).select("image_id", "bytes", "fmt")
    out = phash_distortion_flips(caps).collect()
    rows = {(r.image_id, r.kind): r.flips for r in out}
    ids = {r.image_id for r in out}
    assert len(ids) >= 35  # ~1% corrupt tolerated, not fatal

    # identity must be exactly 0 everywhere
    assert all(rows[(i, "identity")] == 0 for i in ids)

    # numpy mirror on the driver for every surviving image
    raw = {r.image_id: (bytes(r.bytes), r.fmt) for r in caps.collect()}
    for i in sorted(ids)[:10]:
        arr = decode_image(*raw[i])
        base = phash64(arr)
        for kind in ("resize_half", "brighten", "crop_border", "letterbox"):
            expect = bin((base ^ phash64(_distort(arr, kind))) & ((1 << 64) - 1)).count("1")
            assert rows[(i, kind)] == expect, (i, kind)


def test_corrupt_bytes_tolerated(spark):
    from corpusama_spark.functions.imageops import phash_distortion_flips

    df = spark.createDataFrame(
        [(1, bytearray(b"not an image"), "qimg"), (2, None, "qimg")],
        "image_id long, bytes binary, fmt string",
    )
    assert phash_distortion_flips(df).count() == 0


def test_robustness_summary(spark):
    from corpusama_spark.functions.imageops import (
        phash_distortion_flips,
        phash_robustness,
    )
    from corpusama_spark.sources.synth import captions_df

    caps = captions_df(spark, 60, partitions=4).select("image_id", "bytes", "fmt")
    flips = phash_distortion_flips(caps)
    summ = {r.kind: r for r in phash_robustness(flips, band_radius=8).collect()}
    assert set(summ) == {"identity", "resize_half", "brighten", "crop_border",
                         "letterbox"}
    # identity survives perfectly by construction
    ident = summ["identity"]
    assert ident.mean_flips == 0.0 and ident.survive_share == 1.0
    # block-mean phash is resize-stable: half-size should mostly survive
    assert summ["resize_half"].mean_flips <= summ["crop_border"].mean_flips + 8
    # survive_share consistent with mean bound
    for r in summ.values():
        assert 0.0 <= r.survive_share <= 1.0 and r.max_flips <= 64
