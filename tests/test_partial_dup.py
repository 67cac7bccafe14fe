"""Quadrant-phash partial-duplicate detection (X237): collage reuse found
where full-hash dedup is blind, exact copies match all quadrants, unrelated
images stay apart, flood guard drops blank-quadrant buckets."""

import numpy as np


def _img(seed, h=64, w=64):
    rng = np.random.RandomState(seed)
    # smooth blocky pattern: upsampled 8x8 noise, structured enough for
    # a stable phash, distinct across seeds
    small = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    return np.repeat(np.repeat(small, h // 8, axis=0), w // 8, axis=1)


def _rows(spark):
    from corpusama_spark.io.imagecodec import encode_png

    a = _img(1)
    b = _img(2)
    collage = _img(3)
    collage[:32, :32] = a[:32, :32]  # B steals A's top-left quadrant
    copy_a = a.copy()
    rows = [
        (1, bytearray(encode_png(a)), "png"),
        (2, bytearray(encode_png(collage)), "png"),
        (3, bytearray(encode_png(copy_a)), "png"),
        (4, bytearray(encode_png(b)), "png"),
    ]
    return spark.createDataFrame(rows, "image_id long, bytes binary, fmt string")


def test_partial_dup_detection(spark):
    from corpusama_spark.functions.imageops import quadrant_phashes
    from corpusama_spark.operators.dedup import partial_dup_pairs

    hashes = quadrant_phashes(_rows(spark))
    assert hashes.count() == 4
    pairs = {(r.id_a, r.id_b): r for r in partial_dup_pairs(hashes).collect()}

    # the collage: quadrant 0 lifted verbatim -> found, and ONLY a
    # partial dup (full hashes far apart: invisible to X14)
    p = pairs[(1, 2)]
    assert 0 in p.matched_quads and p.min_quad_dist == 0
    assert p.partial_only and p.full_dist > 16

    # exact copy: all four quadrants, full_dist 0, not partial_only
    c = pairs[(1, 3)]
    assert list(c.matched_quads) == [0, 1, 2, 3]
    assert c.full_dist == 0 and not c.partial_only

    # copy shares the stolen quadrant with the collage too
    assert (2, 3) in pairs and 0 in pairs[(2, 3)].matched_quads

    # unrelated image pairs with id 4: absent
    assert not any(4 in k for k in pairs)


def test_flood_guard_drops_blank_quadrants(spark):
    from corpusama_spark.functions.imageops import quadrant_phashes
    from corpusama_spark.operators.dedup import partial_dup_pairs
    from corpusama_spark.io.imagecodec import encode_png

    # 30 images, all sharing a WHITE top half (blank quadrants 0/1) but
    # distinct bottom halves: the blank-quadrant buckets flood and must
    # be dropped, leaving no pairs at max_bucket < 30
    rows = []
    for i in range(30):
        arr = _img(100 + i)
        arr[:32, :] = 255
        rows.append((i, bytearray(encode_png(arr)), "png"))
    df = spark.createDataFrame(rows, "image_id long, bytes binary, fmt string")
    hashes = quadrant_phashes(df)
    out = partial_dup_pairs(hashes, max_bucket=16).collect()
    assert out == []
    # without the guard the blank quadrant alone yields ~435 pairs
    flood = partial_dup_pairs(hashes, max_bucket=None).collect()
    assert len(flood) >= 400
