"""Shapley drop attribution (ablation.shapley_drop_attribution):
closed-form (1/|T| split) vs brute-force Shapley over all subsets,
plus the efficiency axiom on the corpus totals."""

from itertools import permutations

from pyspark.sql import functions as F


def _brute_shapley(fail_sets, k):
    """Exact Shapley by averaging marginals over all k! orderings of the
    grand coalition; v(S) = #docs with a failing rule in S."""

    def v(S):
        return sum(1 for T in fail_sets if T & S)

    phi = [0.0] * k
    perms = list(permutations(range(k)))
    for order in perms:
        S = set()
        for i in order:
            before = v(S)
            S.add(i)
            phi[i] += v(S) - before
    return [p / len(perms) for p in phi]


def test_shapley_matches_bruteforce_and_is_efficient(spark):
    from corpusama_spark.operators.ablation import shapley_drop_attribution

    # 8 docs with hand-picked failure patterns over 3 rules
    rows = [
        (0, 1, 0, 0),  # only r0
        (1, 1, 1, 0),  # r0+r1 -> 1/2 each
        (2, 1, 1, 1),  # all   -> 1/3 each
        (3, 0, 0, 0),  # kept
        (4, 0, 0, 1),  # only r2
        (5, 0, 1, 1),  # r1+r2
        (6, 0, 0, 0),  # kept
        (7, 1, 0, 1),  # r0+r2
    ]
    df = spark.createDataFrame(rows, "doc_id long, a int, b int, c int")
    rules = {n: F.col(n) == 1 for n in ("a", "b", "c")}
    out = {r.rule: r for r in shapley_drop_attribution(df, rules).collect()}

    fail_sets = [
        {j for j, f in enumerate(r[1:]) if f} for r in rows if any(r[1:])
    ]
    expect = _brute_shapley(fail_sets, 3)
    for j, name in enumerate(("a", "b", "c")):
        assert abs(out[name].shapley - expect[j]) < 1e-6

    n_dropped = len(fail_sets)
    assert all(r.n_dropped == n_dropped for r in out.values())
    # efficiency: attributions sum exactly to the number of dropped docs
    assert abs(sum(r.shapley for r in out.values()) - n_dropped) < 1e-6
    assert abs(sum(r.shap_share for r in out.values()) - 1.0) < 1e-6
