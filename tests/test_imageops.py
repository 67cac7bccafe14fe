"""Image transform family: features/phash, resize, frame sampling."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from corpusama_spark.functions.imageops import (
    encode_qvid,
    image_features,
    phash64,
    resize_image,
    resize_nn,
    sample_frames,
)
from corpusama_spark.io.imagecodec import decode_image, encode_png, encode_qimg


def _img(seed: int, w: int = 48, h: int = 40) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # smooth gradient so the perceptual hash has structure to latch onto
    grad = (np.linspace(0, 255, w, dtype=np.uint8)[None, :, None]).repeat(h, 0)
    return ((base.astype(np.uint16) + grad.repeat(3, 2)) // 2).astype(np.uint8)


def test_phash_invariance_and_sensitivity():
    a = _img(1)
    assert phash64(a) == phash64(a.copy())
    # small perturbation -> small hamming; different image -> large
    tweaked = a.copy()
    tweaked[:2, :2] = 0
    h_small = bin((phash64(a) ^ phash64(tweaked)) & (2**64 - 1)).count("1")
    h_other = bin((phash64(a) ^ phash64(_img(99))) & (2**64 - 1)).count("1")
    assert h_small <= 6
    assert h_other > h_small
    # phash survives the lossy re-encode (the near-dup use case)
    rt = decode_image(encode_qimg(a, "jpeg"), "jpeg")
    assert bin((phash64(a) ^ phash64(rt)) & (2**64 - 1)).count("1") <= 4


def test_image_features_udf(spark):
    a, b = _img(1), _img(2)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["a", "b", "bad"],
                "bytes": [encode_png(a), encode_qimg(b, "jpeg"), b"garbage"],
                "fmt": ["png", "jpeg", "png"],
            }
        )
    )
    out = {
        r.image_id: r
        for r in df.select(
            "image_id", image_features("bytes", "fmt").alias("f")
        ).select("image_id", "f.*").collect()
    }
    assert out["a"].mean_r == pytest.approx(float(a[..., 0].mean()))
    assert out["a"].phash64 == phash64(a)
    assert out["b"].phash64 is not None
    assert out["bad"].phash64 is None and out["bad"].mean_r is None


def test_resize_roundtrip(spark):
    a = _img(3)
    df = spark.createDataFrame(
        pd.DataFrame({"bytes": [encode_png(a), None], "fmt": ["png", "png"]})
    )
    out = df.select(resize_image("bytes", "fmt", 16, 12).alias("r")).collect()
    resized = decode_image(bytes(out[0].r), "png")
    assert resized.shape == (12, 16, 3)
    assert np.array_equal(resized, resize_nn(a, 16, 12))
    assert out[1].r is None


def test_sample_frames(spark):
    frames = [_img(i, w=24, h=20) for i in range(5)]
    vid = encode_qvid(frames, fmt="jpeg")
    df = spark.createDataFrame(
        pd.DataFrame(
            {"video_id": ["v1", "corrupt"], "bytes": [vid, b"notavideo"]}
        )
    )
    rows = sample_frames(df, "video_id", "bytes", every_k=2).collect()
    got = sorted((r.video_id, r.frame_no) for r in rows)
    assert got == [("v1", 0), ("v1", 2), ("v1", 4)]  # corrupt -> zero rows
    # sampled frames decode to the original pixel content (lossy tolerance)
    fr0 = decode_image(bytes(rows[0].frame), rows[0].fmt)
    assert fr0.shape == frames[0].shape


def test_image_near_dups_phash_banding(spark):
    """Exact copies pair at hamming 0; a lossy re-encode of the same image
    pairs within small hamming; unrelated images don't pair."""
    from corpusama_spark.operators.dedup import image_near_dups
    from corpusama_spark.plans.caching import release

    a, b = _img(10), _img(20)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["a", "a_copy", "a_lossy", "b"],
                "bytes": [
                    encode_png(a),
                    encode_png(a),
                    encode_qimg(a, "jpeg"),
                    encode_png(b),
                ],
                "fmt": ["png", "png", "jpeg", "png"],
            }
        )
    )
    pairs = image_near_dups(df, hamming_k=4)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    release(pairs)
    assert got[("a", "a_copy")] == 0
    assert ("a", "a_lossy") in got or ("a_copy", "a_lossy") in got
    assert not any("b" in p for p in got)


def test_image_ops_are_narrow(spark):
    """Feature extraction must run in the scan stage: no shuffle anywhere
    in the plan (the bytes-never-shuffle invariant)."""
    a = _img(4)
    df = spark.createDataFrame(
        pd.DataFrame({"bytes": [encode_png(a)], "fmt": ["png"]})
    )
    plan = (
        df.select(image_features("bytes", "fmt").alias("f"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_image_quality_rules_flags(spark):
    """Each metadata rule fires independently; keep is the conjunction."""
    from corpusama_spark.functions.imageops import image_quality_rules

    rows = [
        # (id, w, h, fmt, nbytes) -> expected (dims, aspect, bpp, fmt, keep)
        ("ok", 640, 480, "jpeg", 640 * 480, (True, True, True, True, True)),
        ("icon", 16, 16, "png", 256, (False, True, True, True, False)),
        ("bomb", 9000, 9000, "png", 9000 * 9000, (False, True, True, True, False)),
        ("banner", 1200, 100, "jpeg", 120000, (True, False, True, True, False)),
        ("truncated", 640, 480, "jpeg", 100, (True, True, False, True, False)),
        ("bloated", 100, 100, "png", 200000, (True, True, False, True, False)),
        ("badfmt", 640, 480, "tiff", 640 * 480, (True, True, True, False, False)),
        ("caps", 640, 480, "JPEG", 640 * 480, (True, True, True, True, True)),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows],
        "id string, w int, h int, fmt string, nbytes long",
    )
    out = {
        r.id: (r.r.dims_ok, r.r.aspect_ok, r.r.bpp_ok, r.r.fmt_ok, r.r.image_keep)
        for r in df.select(
            "id",
            image_quality_rules(
                F.col("w"), F.col("h"), F.col("fmt"), F.col("nbytes")
            ).alias("r"),
        ).collect()
    }
    for rid, _w, _h, _f, _n, want in rows:
        assert out[rid] == want, rid


def test_image_quality_rules_prune_bytes(tmp_path, spark):
    """The metadata gate must never read the bytes column: project only the
    rule struct from a parquet table with a binary column and assert the
    scan's ReadSchema excludes it — the property that makes this tier a
    metadata scan at 10^12 rows."""
    from corpusama_spark.functions.imageops import image_quality_rules

    p = str(tmp_path / "imgs")
    spark.createDataFrame(
        [("a", b"\x89PNG" * 100, 640, 480, "png")],
        "image_id string, bytes binary, w int, h int, fmt string",
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = df.select(
        "image_id",
        image_quality_rules(
            F.col("w"), F.col("h"), F.col("fmt"), F.lit(1000)
        ).alias("r"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_schema and all("bytes" not in ln for ln in scan_schema)


def test_sample_frames_truncated_containers_yield_zero_rows(spark):
    """Corrupt QVID containers (header- OR payload-truncated) contribute
    zero rows — never a task error, never a partial frame list."""
    import numpy as np
    from pyspark.sql import Row

    from corpusama_spark.functions.imageops import encode_qvid, sample_frames

    frame = np.zeros((8, 8, 3), dtype=np.uint8)
    good = encode_qvid([frame, frame, frame], "jpeg")
    df = spark.createDataFrame(
        [
            Row(video_id="ok", bytes=good),
            Row(video_id="hdr", bytes=good[:7]),      # header-truncated
            Row(video_id="tbl", bytes=good[:13]),     # frame-table cut
            Row(video_id="pay", bytes=good[:-3]),     # payload cut mid-frame
            Row(video_id="nul", bytes=None),
        ]
    )
    out = sample_frames(df, every_k=1).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append(r["frame_no"])
    assert by_vid == {"ok": [0, 1, 2]}


def test_video_rules_reason_tiers(spark):
    from pyspark.sql import Row

    from corpusama_spark.functions.imageops import video_rules

    df = spark.createDataFrame(
        [
            Row(i=0, fps=30, n_frames=300, w=640, h=480),    # keep
            Row(i=1, fps=None, n_frames=300, w=640, h=480),  # meta missing
            Row(i=2, fps=13, n_frames=300, w=640, h=480),    # fps unsupported
            Row(i=3, fps=30, n_frames=0, w=640, h=480),      # empty
            Row(i=4, fps=30, n_frames=300, w=32, h=480),     # tiny
            Row(i=5, fps=30, n_frames=5, w=640, h=480),      # too short
            Row(i=6, fps=30, n_frames=30 * 4000, w=640, h=480),  # too long
        ]
    )
    got = {
        r["i"]: (r["video_drop_reason"], r["video_keep"])
        for r in video_rules(df).collect()
    }
    assert got[0] == (None, True)
    assert got[1][0] == "video_meta_missing"
    assert got[2][0] == "video_fps_unsupported"
    assert got[3][0] == "video_empty"
    assert got[4][0] == "video_tiny_resolution"
    assert got[5][0] == "video_too_short"
    assert got[6][0] == "video_too_long"
    assert all(not k for r, k in [got[i] for i in range(1, 7)])
