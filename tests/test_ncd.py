"""Normalized compression distance (X225): zlib mirror parity,
self/near/unrelated ordering, threshold flag."""

import zlib


def _ncd(a, b, level=6):
    ca = len(zlib.compress(a.encode(), level))
    cb = len(zlib.compress(b.encode(), level))
    cab = len(zlib.compress((a + b).encode(), level))
    return round((cab - min(ca, cb)) / max(ca, cb), 6), ca, cb, cab


def test_ncd_mirror_and_ordering(spark):
    from corpusama_spark.functions.compressq import ncd_pairs

    base = (
        "the crawler fetched this page and its boilerplate navigation "
        "yesterday evening before the index refreshed " * 4
    )
    near = base.replace("yesterday", "tuesday")
    other = (
        "completely unrelated quarterly earnings discussion with numbers "
        "9913 4821 and a table of currencies " * 4
    )
    rows = [
        (0, base, base),
        (1, base, near),
        (2, base, other),
    ]
    df = spark.createDataFrame(
        rows, "pair_id long, text_a string, text_b string"
    )
    out = {r.pair_id: r for r in ncd_pairs(df, threshold=0.4).collect()}
    for pid, a, b in rows:
        exp, ca, cb, cab = _ncd(a, b)
        r = out[pid]
        assert (r.ncd, r.c_a, r.c_b, r.c_ab) == (exp, ca, cb, cab), pid
    assert out[0].ncd < out[1].ncd < out[2].ncd
    assert out[0].near_dup and out[1].near_dup and not out[2].near_dup
    # identical copy compresses to nearly nothing extra
    assert out[0].ncd < 0.1
