"""Exact weighted group quantiles (X234): python mirror, boundary-exact
crossing, unit-weight equivalence to the unweighted operator, NULL and
non-positive weight exclusion."""

from fractions import Fraction


def _mirror(pairs, q):
    """Weighted type-1 quantile: smallest v with cumw >= q*W (exact)."""
    r = Fraction(q).limit_denominator(1000)
    agg = {}
    for v, w in pairs:
        agg[v] = agg.get(v, 0) + w
    total = sum(agg.values())
    cw = 0
    for v in sorted(agg):
        cw += agg[v]
        if cw * r.denominator >= r.numerator * total:
            return v
    raise AssertionError("unreachable")


def test_weighted_quantiles_mirror(spark):
    from corpusama_spark.operators.quantiles import weighted_group_quantiles

    pairs = [(float(v), (v * 7) % 13 + 1) for v in range(1, 60)]
    rows = [("g", v, w) for v, w in pairs]
    rows += [("h", float(v), 1) for v in range(10)]
    df = spark.createDataFrame(rows, "key string, val double, w long")
    qs = [0.25, 0.5, 0.95]
    out = {
        (r.key, r.q): r.value
        for r in weighted_group_quantiles(df, "key", "val", "w", qs).collect()
    }
    for q in qs:
        assert out[("g", q)] == _mirror(pairs, q)
        assert out[("h", q)] == _mirror([(float(v), 1) for v in range(10)], q)


def test_boundary_exact_crossing(spark):
    from corpusama_spark.operators.quantiles import weighted_group_quantiles

    # cumulative weights 1,2,4: q=0.5 -> q*W = 2 exactly, met AT val=2
    # (a float boundary could tip either way; the BIGINT test cannot)
    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 2)],
        "key string, val double, w long",
    )
    out = weighted_group_quantiles(df, "key", "val", "w", [0.5]).collect()
    assert out[0].value == 2.0


def test_exclusions_and_tie_merge(spark):
    from corpusama_spark.operators.quantiles import weighted_group_quantiles

    df = spark.createDataFrame(
        [("g", 1.0, 5), ("g", 1.0, 5), ("g", 2.0, 0), ("g", 3.0, None),
         ("g", None, 9), ("g", 9.0, 10)],
        "key string, val double, w long",
    )
    # effective: val 1.0 w=10 (ties merged), val 9.0 w=10; W=20
    out = {r.q: r.value for r in
           weighted_group_quantiles(df, "key", "val", "w", [0.5, 0.51]).collect()}
    assert out[0.5] == 1.0  # cw(1.0)=10 = 0.5*20 exactly
    assert out[0.51] == 9.0
