"""Z-order layout, blocked edit-distance pairs, CUSUM change-point,
compression-ratio gate."""

import zlib
from datetime import datetime

from pyspark.sql import functions as F


def _morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_reference_bit_math(spark):
    from corpusama_spark.operators.layout import zorder_key

    rows = [(1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 65535, 65535),
            (5, 41234, 917), (6, 70000, -3)]  # clamp cases
    df = spark.createDataFrame(rows, "id long, a long, b long")
    out = {
        r.id: r.zval
        for r in df.select("id", "a", "b").select(
            "id", zorder_key(F.col("a"), F.col("b"))
        ).collect()
    }
    assert out[1] == 0 and out[2] == 2 and out[3] == 1
    assert out[4] == (1 << 32) - 1
    assert out[5] == _morton(41234, 917)
    assert out[6] == _morton(65535, 0)  # saturating clamp


def test_zorder_buckets_are_contiguous_z_ranges(spark):
    from corpusama_spark.operators.layout import zorder_buckets

    rows = [(i, i * 37 % 1000, i * 91 % 1000) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    out = zorder_buckets(df, "id", F.col("a"), F.col("b"), nbuckets=8)
    rs = sorted(out.collect(), key=lambda r: (r.zval, r.id))
    # walking in z order, bucket ids must be non-decreasing (ranges)
    assert all(
        rs[i].bucket <= rs[i + 1].bucket for i in range(len(rs) - 1)
    )
    sizes = {}
    for r in rs:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile balance


def test_edit_near_pairs_finds_typo_twins_and_respects_cutoff(spark):
    from corpusama_spark.operators.fuzzy import edit_near_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy hog"),   # dist 1
        (3, "the quick brown fox jumped over the lazy dog"),  # dist 2
        (4, "completely unrelated text about spark shuffles"),
        (5, "THE  quick   brown fox jumps over the lazy dog"),  # norm == 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r for r in edit_near_pairs(
        df, "text", "doc_id", max_dist=3).collect()}
    assert out[(1, 2)].dist == 1
    assert out[(1, 5)].dist == 0  # whitespace-normalized identical
    assert out[(1, 3)].dist == 2
    assert all(a != 4 and b != 4 for a, b in out)


def test_edit_near_pairs_suffix_block_catches_leading_edit(spark):
    from corpusama_spark.operators.fuzzy import edit_near_pairs

    # leading edits break the prefix block; the suffix block must catch it
    rows = [
        (1, "zzz alpha beta gamma delta epsilon zeta eta theta"),
        (2, "aaa alpha beta gamma delta epsilon zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = edit_near_pairs(df, "text", "doc_id", max_dist=3).collect()
    assert len(out) == 1 and out[0].dist == 3


def test_edit_near_pairs_flood_guard_drops_hot_block(spark):
    from corpusama_spark.operators.fuzzy import edit_near_pairs

    # 30 identical texts flood both blocks; guard at 10 drops everything
    rows = [(i, "same same same text") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = edit_near_pairs(df, "text", "doc_id", max_dist=3, max_block=10)
    assert out.count() == 0


def test_cusum_shift_locates_step_change(spark):
    from corpusama_spark.operators.trends import cusum_shift

    # 10 days at 10.0 then 10 days at 20.0 -> shift at day 10
    rows = []
    for d in range(20):
        v = 10.0 if d < 10 else 20.0
        rows.append((d, "t", datetime(2024, 1, 1 + d), v))
        rows.append((100 + d, "t", datetime(2024, 1, 1 + d, 12), v))
    df = spark.createDataFrame(
        rows, "id long, event_type string, ts timestamp, value double"
    )
    r = cusum_shift(df, "event_type", "ts", "value").collect()[0]
    assert str(r.shift_day) == "2024-01-10"  # last day of the low regime
    assert r.n_days == 20
    assert r.mean_before == 10.0 and r.mean_after == 20.0
    assert r.cusum_max == 50.0  # 10 days * |10 - 15|


def test_cusum_shift_level_series_is_flat(spark):
    from corpusama_spark.operators.trends import cusum_shift

    rows = [(d, "t", datetime(2024, 1, 1 + d), 7.0) for d in range(15)]
    df = spark.createDataFrame(
        rows, "id long, event_type string, ts timestamp, value double"
    )
    r = cusum_shift(df, "event_type", "ts", "value").collect()[0]
    assert r.cusum_max == 0.0


def test_compression_gate_parity_with_zlib_and_bounds(spark):
    from corpusama_spark.functions.compressq import compression_gate

    texts = [
        (1, "spam " * 400),                       # hyper-compressible
        (2, "The mill wheel turned slowly beneath a copper sky, and "
            "each plank of the old bridge answered with its own voice."),
        (3, "k9$Qz@7!pL#x2&Vm^8sWq*4Tn%6Jd(1Hg)5Rf_0Yb+3Uc=eZ"),  # noise
        (4, ""),                                   # dropped
        (5, None),                                 # dropped
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_gate(df).collect()}
    assert 4 not in out and 5 not in out
    for i, t in [(1, texts[0][1]), (2, texts[1][1]), (3, texts[2][1])]:
        raw = t.encode("utf-8")
        assert out[i].n_bytes == len(raw)
        assert out[i].n_comp == len(zlib.compress(raw, 6))
        assert out[i].ratio == round(out[i].n_comp / out[i].n_bytes, 6)
    assert not out[1].keep          # boilerplate: ratio below lo
    assert out[2].keep              # prose: in band
    assert not out[3].keep          # noise: ratio above hi


def test_new_layout_queries_plan_clean(spark):
    import __spark_entry__ as e
    from corpusama_spark.session import assert_no_row_python

    for name in ("zorder_layout", "fuzzy_pairs", "cusum_shift",
                 "compress_gate"):
        assert_no_row_python(
            e.queries()[name](spark, "/root/testdata/sf0.001")
        )
