"""One-permutation MinHash with rotation densification (X191)."""

import hashlib

MERSENNE = (1 << 31) - 1


def _shingles(text, n=3):
    toks = [t for t in text.strip().lower().split()]
    out = []
    for i in range(max(len(toks) - n, 0) + 1):
        s = " ".join(toks[i : i + n])
        if s:
            out.append(s)
    seen, dedup = set(), []
    for s in out:
        if s not in seen:
            seen.add(s)
            dedup.append(s)
    return dedup


def _h(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % MERSENNE


def _mirror_sig(text, k=16, n=3):
    slots = [None] * k
    for s in _shingles(text, n):
        hv = _h(s)
        b = hv % k
        if slots[b] is None or hv < slots[b]:
            slots[b] = hv
    filled = []
    for i in range(k):
        for j in range(k):
            v = slots[(i + j) % k]
            if v is not None:
                filled.append(v + j * MERSENNE)
                break
    return filled, sum(v is not None for v in slots)


ROWS = [
    (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (2, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (3, "alpha bravo charlie delta echo foxtrot golf hotel india JULIET extra"),
    (4, "kilo lima mike november oscar papa quebec romeo"),
    (5, "one two"),  # single short shingle -> 1 filled bin, 15 borrowed
    (6, "   "),  # no shingles -> filtered out
]


def test_oph_signature_matches_python_md5_mirror(spark):
    from corpusama_spark.operators.dedup import oph_signatures

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        r.id: (r.sig, r.nbins_filled)
        for r in oph_signatures(df, "text", "doc_id", k=16).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}  # 6 has no shingles
    for i, text in ROWS[:5]:
        sig, nb = _mirror_sig(text)
        assert got[i] == (sig, nb), f"doc {i}"
    # densified: no nulls anywhere, exact dup pair identical
    assert all(v is not None for v in got[5][0])
    assert got[1][0] == got[2][0]


def test_oph_partition_invariance(spark):
    from corpusama_spark.operators.dedup import oph_signatures

    df = spark.createDataFrame(ROWS * 10, "doc_id long, text string")
    a = sorted(
        map(tuple, oph_signatures(df.repartition(1), "text", "doc_id").collect())
    )
    b = sorted(
        map(tuple, oph_signatures(df.repartition(7), "text", "doc_id").collect())
    )
    assert a == b


def test_oph_estimator_tracks_exact_jaccard(spark):
    from corpusama_spark.operators.dedup import oph_accuracy_pairs

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    out = {
        (r.id_a, r.id_b): r
        for r in oph_accuracy_pairs(df, pairs, "text", "doc_id", k=16).collect()
    }
    assert out[(1, 2)].est_j == 1.0 and out[(1, 2)].exact_j == 1.0
    assert out[(1, 4)].est_j == 0.0 and out[(1, 4)].exact_j == 0.0
    # near-dup: estimator within 2 slots of truth at k=16
    r13 = out[(1, 3)]
    assert 0.0 < r13.exact_j < 1.0
    assert abs(r13.est_j - r13.exact_j) <= 2 / 16 + 1e-9


def test_lsh_band_plan_matches_python_integration(spark):
    """X192: numeric mirror of the S-curve integrals + known shape
    facts (more rows/band -> higher s50; b=K,r=1 floods FPs)."""
    from corpusama_spark.operators.dedup import lsh_band_plan

    K, t, g = 16, 0.5, 500
    out = {(r.b, r.r): r for r in lsh_band_plan(spark, K, t, g).collect()}
    assert set(out) == {(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)}

    def mirror(b, r):
        fp = fn = 0.0
        for i in range(g):
            s = (i + 0.5) / g
            p = 1.0 - (1.0 - s**r) ** b
            if s < t:
                fp += p
            else:
                fn += 1.0 - p
        return fp / g, fn / g

    for (b, r), row in out.items():
        fp, fn = mirror(b, r)
        assert abs(row.fp_area - fp) < 1e-6, (b, r)
        assert abs(row.fn_area - fn) < 1e-6, (b, r)
        assert abs(row.s50 - (1 - 2 ** (-1 / b)) ** (1 / r)) < 1e-6
    # s50 grows with rows-per-band; single-row bands collide on anything
    s50s = [out[(16 // r, r)].s50 for r in (1, 2, 4, 8, 16)]
    assert s50s == sorted(s50s)
    assert out[(16, 1)].fp_area > out[(4, 4)].fp_area
    assert out[(16, 1)].fn_area < out[(4, 4)].fn_area
    # the balanced banding should win the equal-weight cost at t=0.5
    best = min(out.values(), key=lambda r: (r.cost, r.b))
    assert (best.b, best.r) == (4, 4)
