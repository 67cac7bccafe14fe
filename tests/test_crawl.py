"""Politeness scheduling (X235): spacing invariant, host stickiness,
determinism, delay join default, audit bound arithmetic."""

from pyspark.sql import functions as F


def _frontier(spark, n=120, hosts=5):
    return spark.range(n).select(
        F.concat(F.lit("h"), F.pmod("id", F.lit(hosts))).alias("host"),
        F.concat(F.lit("https://x/"), F.col("id")).alias("url"),
    )


def test_schedule_invariants(spark):
    from corpusama_spark.operators.crawl import politeness_schedule

    fr = _frontier(spark)
    delays = spark.createDataFrame(
        [("h0", 2000), ("h1", 500)], "host string, delay_ms long"
    )
    out = politeness_schedule(fr, delays, workers=4).collect()

    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    for host, rows in by_host.items():
        rows.sort(key=lambda r: r.seq)
        # seq is a dense 0..n-1 per host
        assert [r.seq for r in rows] == list(range(len(rows)))
        # the polite spacing: consecutive etas differ by exactly delay
        deltas = {rows[i + 1].eta_ms - rows[i].eta_ms for i in range(len(rows) - 1)}
        assert deltas == {rows[0].delay_ms}
        # host-sticky: one worker owns the host
        assert len({r.worker for r in rows}) == 1
    # delay join + default
    assert by_host["h0"][0].delay_ms == 2000
    assert by_host["h1"][0].delay_ms == 500
    assert by_host["h2"][0].delay_ms == 1000  # default


def test_schedule_deterministic_across_partitioning(spark):
    from corpusama_spark.operators.crawl import politeness_schedule

    fr = _frontier(spark)
    a = sorted(map(tuple, politeness_schedule(fr.repartition(7)).collect()))
    b = sorted(map(tuple, politeness_schedule(fr.coalesce(1)).collect()))
    assert a == b


def test_audit_bound(spark):
    from corpusama_spark.operators.crawl import (
        politeness_audit,
        politeness_schedule,
    )

    fr = _frontier(spark, n=100, hosts=2)  # h0: 50 urls, h1: 50 urls
    delays = spark.createDataFrame(
        [("h0", 100), ("h1", 3000)], "host string, delay_ms long"
    )
    sched = politeness_schedule(fr, delays, workers=1)
    audit = politeness_audit(sched).collect()
    assert len(audit) == 1
    a = audit[0]
    assert a.n_urls == 100 and a.n_hosts == 2
    # the slow host bounds the wall clock: 50 * 3000
    assert a.bound_ms == 150_000 and a.bottleneck_host == "h1"
