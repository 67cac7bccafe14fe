"""Water-filling budget allocation (X238): python mirror (exact greedy
water-fill), cap saturation and re-flow, degenerate budgets, zero rows."""

from fractions import Fraction


def _mirror(rows, budget):
    """Exact water-fill: rows = [(k, t, cap)]; returns {k: alloc}."""
    live = [(k, t, c) for k, t, c in rows if t > 0 and c > 0]
    alloc = {k: 0 for k, _, _ in rows}
    if budget >= sum(c for _, _, c in live):
        for k, _, c in live:
            alloc[k] = c
        return alloc
    live.sort(key=lambda r: (Fraction(r[2], r[1]), r[0]))
    capped, rem_b = [], budget
    rem = live[:]
    while True:
        T = sum(t for _, t, _ in rem)
        lam = Fraction(rem_b, T)
        sat = [r for r in rem if Fraction(r[2], r[1]) <= lam]
        if not sat:
            break
        for k, t, c in sat:
            alloc[k] = c
            rem_b -= c
        rem = [r for r in rem if Fraction(r[2], r[1]) > lam]
    T = sum(t for _, t, _ in rem)
    for k, t, c in rem:
        alloc[k] = min(c, (rem_b * t) // T)
    return alloc


def _check(spark, rows, budget):
    from corpusama_spark.operators.curation import waterfill_allocation

    df = spark.createDataFrame(rows, "source string, target_w long, cap long")
    out = {r.source: r for r in waterfill_allocation(df, budget).collect()}
    expect = _mirror(rows, budget)
    for k, want in expect.items():
        assert out[k].alloc == want, (k, out[k].alloc, want)
    total = sum(r.alloc for r in out.values())
    achievable = min(budget, sum(c for _, t, c in rows if t > 0 and c > 0))
    lo = next(iter(out.values())).leftover
    assert lo == achievable - total and 0 <= lo
    return out


def test_no_caps_binding(spark):
    rows = [("a", 50, 10**9), ("b", 30, 10**9), ("c", 20, 10**9)]
    out = _check(spark, rows, 1000)
    assert out["a"].alloc == 500 and out["b"].alloc == 300 and out["c"].alloc == 200
    assert not any(r.capped for r in out.values())


def test_cap_saturation_reflows(spark):
    # 'a' wants 500 but caps at 100; its freed budget re-flows to b/c
    rows = [("a", 50, 100), ("b", 30, 10**9), ("c", 20, 10**9)]
    out = _check(spark, rows, 1000)
    assert out["a"].alloc == 100 and out["a"].capped
    assert out["b"].alloc == 540 and out["c"].alloc == 360


def test_cascade_two_caps(spark):
    rows = [("a", 40, 50), ("b", 40, 300), ("c", 20, 10**9)]
    out = _check(spark, rows, 1000)
    assert out["a"].alloc == 50 and out["a"].capped
    assert out["b"].alloc == 300 and out["b"].capped
    assert out["c"].alloc == 650 and not out["c"].capped


def test_budget_exceeds_supply_and_dead_rows(spark):
    rows = [("a", 10, 70), ("b", 10, 30), ("z", 0, 500), ("y", 10, 0)]
    out = _check(spark, rows, 10_000)
    assert out["a"].alloc == 70 and out["b"].alloc == 30
    assert out["z"].alloc == 0 and out["y"].alloc == 0
    assert out["a"].leftover == 0


def test_floor_leftover_reported(spark):
    rows = [("a", 3, 10**9), ("b", 7, 10**9)]
    out = _check(spark, rows, 100)
    # floors: 30 + 70 exactly here; make it ragged
    rows = [("a", 3, 10**9), ("b", 8, 10**9)]
    out = _check(spark, rows, 100)
    assert sum(r.alloc for r in out.values()) <= 100


def test_boundary_budgets_conserve(spark):
    from corpusama_spark.operators.curation import waterfill_allocation

    df = spark.createDataFrame(
        [("a", 10, 100), ("b", 5, 50)], "source string, target_w long, cap long"
    )
    for b in (0, 1, 149, 150, 151):
        rows = waterfill_allocation(df, b).collect()
        tot = sum(r.alloc for r in rows)
        assert tot <= min(b, 150)
        assert rows[0].leftover == min(b, 150) - tot
