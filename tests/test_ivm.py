"""Incremental view maintenance (X258): maintained state is bit-equal to
a fresh recompute across inserts/deletes/updates, group birth/death, and
the all-NULL SUM edge."""


def _state_rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_maintenance_equals_recompute(spark):
    from corpusama_spark.operators.ivm import aggregate_state, apply_changelog
    from corpusama_spark.operators.upsert import row_changelog

    before = spark.createDataFrame(
        [
            (1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", None),
            (5, "c", 50), (6, "c", 60),  # group c will fully vanish
            (7, "e", None),              # all-NULL group stays all-NULL
        ],
        "k long, g string, v long",
    )
    after = spark.createDataFrame(
        [
            (1, "a", 11),                 # update
            (2, "a", 20),                 # unchanged
            (3, "b", 30), (4, "b", None), # unchanged incl NULL
            (8, "d", 80), (9, "d", 90),   # new group d
            (7, "e", None),
            (10, "b", None),              # NULL insert into live group
        ],
        "k long, g string, v long",
    )
    log = row_changelog(before, after, ("k",), ["g", "v"])
    maintained = apply_changelog(
        aggregate_state(before, ["g"], ["v"]), log, ["g"], ["v"]
    )
    recomputed = aggregate_state(after, ["g"], ["v"])
    assert _state_rows(maintained) == _state_rows(recomputed)
    got = {r.g: r for r in maintained.collect()}
    assert "c" not in got                      # emptied group dropped
    assert got["d"].n == 2 and got["d"].sum_v == 170
    assert got["e"].sum_v is None and got["e"].n == 1
    assert got["b"].n == 3 and got["b"].nn_v == 1


def test_retract_to_all_null_sum_goes_null(spark):
    from corpusama_spark.operators.ivm import aggregate_state, apply_changelog
    from corpusama_spark.operators.upsert import row_changelog

    before = spark.createDataFrame(
        [(1, "g", 5), (2, "g", None)], "k long, g string, v long"
    )
    after = spark.createDataFrame(
        [(2, "g", None)], "k long, g string, v long"
    )
    log = row_changelog(before, after, ("k",), ["g", "v"])
    maintained = apply_changelog(
        aggregate_state(before, ["g"], ["v"]), log, ["g"], ["v"]
    )
    r = maintained.collect()[0]
    # the naive sum-as-0 answer is wrong here: a recompute never sees a
    # non-null value, so SUM must be NULL
    assert r.n == 1 and r.sum_v is None and r.nn_v == 0
    assert _state_rows(maintained) == _state_rows(
        aggregate_state(after, ["g"], ["v"])
    )
