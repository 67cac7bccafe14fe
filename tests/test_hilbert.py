"""Hilbert layout key (X263): Spark == python mirror, bijective,
unit-step continuity (the property Z-order lacks), and tighter
bounding boxes than Z-order over unaligned key ranges."""

from corpusama_spark.operators.layout import hilbert_py, with_hilbert_key


def _zorder_py(x, y, bits=4):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_spark_matches_mirror_bijective_continuous(spark):
    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = with_hilbert_key(grid, "x", "y", bits=4, out="hk").collect()
    assert len(rows) == 256
    got = {(r.x, r.y): r.hk for r in rows}
    # exact mirror parity
    for (x, y), d in got.items():
        assert d == hilbert_py(x, y, 4)
    # bijective onto 0..255
    assert sorted(got.values()) == list(range(256))
    # continuity: consecutive curve positions are Manhattan-adjacent
    inv = {d: xy for xy, d in got.items()}
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_tighter_boxes_than_zorder_on_unaligned_ranges():
    bits, span = 4, 16
    hinv = {
        hilbert_py(x, y, bits): (x, y)
        for x in range(16)
        for y in range(16)
    }
    zinv = {
        _zorder_py(x, y, bits): (x, y)
        for x in range(16)
        for y in range(16)
    }

    def bbox_area(inv, lo):
        pts = [inv[k] for k in range(lo, lo + span)]
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        return (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)

    offsets = range(0, 256 - span, 7)  # deliberately unaligned
    h_total = sum(bbox_area(hinv, o) for o in offsets)
    z_total = sum(bbox_area(zinv, o) for o in offsets)
    # a contiguous hilbert range never teleports across quadrant seams;
    # summed over unaligned windows its boxes are strictly tighter
    assert h_total < z_total


def test_three_way_pruning_audit_invariants(spark):
    from corpusama_spark.operators.layout import pruning_audit

    df = spark.createDataFrame(
        [(i, (i * 37) % 256, (i * 101) % 256) for i in range(2000)],
        "id long, a long, b long",
    )
    rep = {
        r.layout: r
        for r in pruning_audit(
            df, "id", "a", "b",
            a_range=(30.0, 90.0), b_range=(100.0, 180.0),
            nfiles=16, hilbert_bits=8,
        ).collect()
    }
    assert set(rep) == {"linear", "zorder", "hilbert"}
    # the predicate's true answer is layout-independent
    sel = {r.rows_selected for r in rep.values()}
    assert len(sel) == 1
    # every layout's scan covers at least the selected rows
    for r in rep.values():
        assert r.rows_scanned >= r.rows_selected
        assert r.n_files == 16
