"""Z-order vs linear file-layout pruning audit (X202)."""


def _morton(a, b, bits=16):
    a = min(max(a, 0), (1 << bits) - 1)
    b = min(max(b, 0), (1 << bits) - 1)
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def _mirror(rows, a_rng, b_rng, nfiles):
    def ntile(keys):
        n = len(keys)
        order = sorted(range(n), key=lambda i: keys[i])
        out = [0] * n
        base, rem = divmod(n, nfiles)
        pos = 0
        for f in range(1, nfiles + 1):
            size = base + (1 if f <= rem else 0)
            for _ in range(size):
                out[order[pos]] = f
                pos += 1
        return out

    ids = [r[0] for r in rows]
    a = [r[1] for r in rows]
    b = [r[2] for r in rows]
    lin = ntile([(a[i], b[i], ids[i]) for i in range(len(rows))])
    zor = ntile([(_morton(a[i], b[i]), ids[i]) for i in range(len(rows))])
    res = {}
    for name, fcol in (("linear", lin), ("zorder", zor)):
        stats = {}
        for i in range(len(rows)):
            s = stats.setdefault(
                fcol[i], [a[i], a[i], b[i], b[i], 0, 0]
            )
            s[0] = min(s[0], a[i]); s[1] = max(s[1], a[i])
            s[2] = min(s[2], b[i]); s[3] = max(s[3], b[i])
            s[4] += 1
            if a_rng[0] <= a[i] <= a_rng[1] and b_rng[0] <= b[i] <= b_rng[1]:
                s[5] += 1
        fs = rs = sel = 0
        for s in stats.values():
            sel += s[5]
            if (s[1] >= a_rng[0] and s[0] <= a_rng[1]
                    and s[3] >= b_rng[0] and s[2] <= b_rng[1]):
                fs += 1
                rs += s[4]
        res[name] = (len(stats), fs, len(rows), rs, sel)
    return res


def test_pruning_audit_matches_mirror_and_zorder_prunes_2d(spark):
    from corpusama_spark.operators.layout import pruning_audit

    rows = [(i, (i * 37) % 400, (i * 91) % 400) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    a_rng, b_rng = (100.0, 140.0), (200.0, 260.0)
    out = {
        r.layout: r
        for r in pruning_audit(
            df, "id", "a", "b", a_rng, b_rng, nfiles=16
        ).collect()
    }
    want = _mirror(rows, a_rng, b_rng, 16)
    for name in ("linear", "zorder"):
        r = out[name]
        assert (
            r.n_files, r.files_scanned, r.rows_total,
            r.rows_scanned, r.rows_selected,
        ) == want[name], name
        assert r.skip_ratio == round(1 - r.files_scanned / r.n_files, 6)
    # physics: when the predicate is selective on the LEADING sort key,
    # the linear layout prunes at least as well — z-order's cost side
    assert out["linear"].files_scanned <= out["zorder"].files_scanned

    # z-order's win case: a predicate selective ONLY on the second
    # dimension — linear-by-(a,b) cannot prune on b at all
    a2, b2 = (0.0, 400.0), (200.0, 230.0)
    out2 = {
        r.layout: r
        for r in pruning_audit(
            df, "id", "a", "b", a2, b2, nfiles=16
        ).collect()
    }
    want2 = _mirror(rows, a2, b2, 16)
    for name in ("linear", "zorder"):
        r = out2[name]
        assert (
            r.n_files, r.files_scanned, r.rows_total,
            r.rows_scanned, r.rows_selected,
        ) == want2[name], name
    assert out2["linear"].files_scanned == 16  # no pruning at all
    assert out2["zorder"].files_scanned < 16
    assert (
        out2["zorder"].read_amplification
        < out2["linear"].read_amplification
    )
