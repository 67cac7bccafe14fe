import numpy as np

from corpusama_spark.io import imagecodec as ic
from corpusama_spark.sources.synth import captions_df


def test_captions_deterministic_across_partitioning(spark):
    a = captions_df(spark, 200, partitions=2).orderBy("image_id").collect()
    b = captions_df(spark, 200, partitions=7).orderBy("image_id").collect()
    assert [r.image_id for r in a] == [r.image_id for r in b]
    assert [r.caption for r in a] == [r.caption for r in b]
    assert [bytes(r.bytes) for r in a] == [bytes(r.bytes) for r in b]


def test_captions_shape_and_noise_mix(spark):
    rows = captions_df(spark, 400, partitions=4).collect()
    assert len(rows) == 400
    assert len({r.image_id for r in rows}) == 400
    caps = [r.caption for r in rows]
    assert any(c is None for c in caps)
    assert any(c and c.isupper() for c in caps)
    assert any(c and "&" in c for c in caps)
    fmts = {r.fmt for r in rows}
    assert fmts == {"png", "jpeg", "webp"}
    # decodable images dominate; ~1% corrupt tolerated
    ok = bad = 0
    for r in rows:
        try:
            arr = ic.decode_image(bytes(r.bytes), r.fmt)
            assert arr.shape == (r.h, r.w, 3)
            ok += 1
        except ValueError:
            bad += 1
    assert ok > 380 and 0 < bad < 20


def test_phash_spread(spark):
    rows = captions_df(spark, 300, partitions=3).select("phash").collect()
    buckets = {r.phash % 16 for r in rows}
    assert len(buckets) >= 12  # phash buckets well spread


def test_png_rows_roundtrip_exact(spark):
    rows = captions_df(spark, 120, partitions=2).where("fmt = 'png'").collect()
    checked = 0
    for r in rows:
        try:
            arr = ic.decode_image(bytes(r.bytes), "png")
        except ValueError:
            continue
        assert np.array_equal(arr, ic.decode_png(bytes(r.bytes)))
        checked += 1
    assert checked > 10
