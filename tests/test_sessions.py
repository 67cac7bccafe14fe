"""Gap-based sessionization (operators/sessions.py): boundary semantics,
determinism, single-exchange plan."""

from datetime import datetime

from corpusama_spark.plans.audit import report


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )


def test_gap_boundary_and_session_assignment(spark):
    from corpusama_spark.operators.sessions import session_stats, sessionize

    t = lambda m, s=0, us=0: datetime(2024, 1, 1, 10, m, s, us)  # noqa: E731
    rows = [
        # user 1: three events 10 min apart -> one session
        (1, t(0), 1, 1.0), (2, t(10), 1, 2.0), (3, t(20), 1, 3.0),
        # then EXACTLY 30:00 gap -> same session (rule is gap > threshold)
        (4, t(50), 1, 4.0),
        # then 30:00.000001 -> NEW session (one microsecond over)
        (5, datetime(2024, 1, 1, 11, 20, 0, 1), 1, 5.0),
        # user 2: single event
        (6, t(5), 2, 10.0),
    ]
    tagged = {r.event_id: r.session_idx
              for r in sessionize(_events(spark, rows)).collect()}
    assert tagged == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2, 6: 1}
    stats = {(r.user_id, r.session_idx): (r.n_events, r.duration_us, r.total_value)
             for r in session_stats(_events(spark, rows)).collect()}
    assert stats[(1, 1)] == (4, 50 * 60 * 1_000_000, 10.0)
    assert stats[(1, 2)] == (1, 0, 5.0)
    assert stats[(2, 1)] == (1, 0, 10.0)


def test_tiebreak_determinism_and_one_exchange(spark):
    from corpusama_spark.operators.sessions import session_stats

    ts0 = datetime(2024, 1, 1, 9, 0, 0)
    rows = [(i, ts0, 7, float(i)) for i in range(6)]  # all same timestamp
    df = session_stats(_events(spark, rows))
    got = df.collect()
    assert len(got) == 1 and got[0].n_events == 6
    rep = report(df)
    rep.assert_no_row_python()
    # windows + groupBy share ONE user_id exchange (count the AQE final
    # plan only — toString also prints the pre-adaptive initial plan)
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
