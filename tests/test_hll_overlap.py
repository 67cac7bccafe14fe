"""HLL set-algebra overlap (X219): python sketch mirror, identical /
disjoint group semantics, exact audit columns, clamped overlap."""

import hashlib
import math


def _hv(k):
    return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)


def _regs(keys, p=6):
    m = 1 << p
    bits = 60 - p
    regs = {}
    for k in keys:
        h = _hv(k)
        reg = h % m
        w = h >> p
        rank = (bits + 1) - w.bit_length() if w > 0 else bits + 1
        regs[reg] = max(regs.get(reg, 0), rank)
    return regs


def _est(regs, p=6):
    m = 1 << p
    z = sum(2.0 ** -r for r in sorted(regs.values()))
    nz = len(regs)
    raw = 0.709 * m * m / (z + (m - nz))
    zeros = m - nz
    if raw <= 2.5 * m and zeros > 0:
        return round(m * math.log(m / zeros), 6)
    return round(raw, 6)


def _mirror_pair(ka, kb, p=6):
    ra, rb = _regs(ka, p), _regs(kb, p)
    merged = dict(ra)
    for reg, r in rb.items():
        merged[reg] = max(merged.get(reg, 0), r)
    ea, eb, eu = _est(ra, p), _est(rb, p), _est(merged, p)
    ov = round(max(0.0, ea + eb - eu), 6)
    inter = len(set(ka) & set(kb))
    uni = len(set(ka) | set(kb))
    return (
        ea,
        eb,
        eu,
        ov,
        round(ov / eu, 6),
        uni,
        inter,
        round(inter / uni, 6),
    )


def _df(spark, groups):
    rows = [(g, str(k)) for g, keys in groups.items() for k in keys]
    return spark.createDataFrame(rows, "g string, k string")


def test_hll_overlap_mirror_and_semantics(spark):
    from corpusama_spark.operators.sketches import hll_overlap

    a = [f"tok{i}" for i in range(300)]
    b = [f"tok{i}" for i in range(150, 450)]  # half-overlapping
    c = [f"other{i}" for i in range(200)]  # disjoint from a
    groups = {"a": a, "b": b, "c": c}
    out = {
        (r.g_a, r.g_b): r
        for r in hll_overlap(_df(spark, groups), "g", "k").collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    for ga, gb in out:
        r = out[(ga, gb)]
        ea, eb, eu, ov, je, uni, inter, jx = _mirror_pair(
            groups[ga], groups[gb]
        )
        got = (
            r.est_a,
            r.est_b,
            r.union_est,
            r.overlap_est,
            r.jaccard_est,
            r.n_union,
            r.n_overlap,
            r.jaccard_exact,
        )
        assert got == (ea, eb, eu, ov, je, uni, inter, jx), (ga, gb)
    # semantics: the half-overlapping pair reads far more shared than
    # the disjoint ones, on both the sketch and the exact columns
    assert out[("a", "b")].n_overlap == 150
    assert out[("a", "c")].n_overlap == 0
    assert out[("a", "b")].jaccard_est > out[("a", "c")].jaccard_est
    assert out[("a", "b")].jaccard_est > out[("b", "c")].jaccard_est


def test_hll_overlap_identical_groups(spark):
    from corpusama_spark.operators.sketches import hll_overlap

    keys = [f"k{i}" for i in range(500)]
    out = hll_overlap(
        _df(spark, {"x": keys, "y": list(keys)}), "g", "k"
    ).collect()
    assert len(out) == 1
    r = out[0]
    # identical key sets: union sketch == each sketch -> jaccard_est = 1
    assert r.est_a == r.est_b == r.union_est
    assert r.jaccard_est == 1.0 and r.jaccard_exact == 1.0
    assert r.n_overlap == 500 and r.n_union == 500
