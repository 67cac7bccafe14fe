"""Crawl-frontier politeness scheduling (X235).

The fetch side of the robots/url family (urls.py X58/X232): given a
frontier of URLs, produce a schedule that (a) never fetches the same
host faster than its crawl-delay, (b) is host-sticky across workers so
the spacing guarantee survives distribution, and (c) is deterministic,
so a re-run or a restarted scheduler re-derives the identical plan.

Everything is relational: one per-host window for sequencing, one
broadcast join for per-host delays, a hash for worker stickiness. The
skew story is SEMANTIC here — a host with 10^9 frontier URLs serializes
by design (politeness forbids parallelizing within a host); the audit
surfaces exactly which hosts bound the wall clock, which is the real
operational question ("this crawl cannot finish faster than max over
hosts of n_urls·delay, whatever the cluster size").

Reference shape: corpusama's fetch loop is a polite sequential API
crawler (reference corpusama/source/call.py waits between calls); this
is that contract re-expressed as a distributed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["politeness_schedule", "politeness_audit"]


def politeness_schedule(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    host_col: str = "host",
    url_col: str = "url",
    default_delay_ms: int = 1000,
    workers: int = 16,
) -> DataFrame:
    """Input columns + (seq, delay_ms, eta_ms, worker).

    - ``seq``: 0-based fetch order within the host, deterministic
      (ordered by md5(url), ties by url) so re-runs agree.
    - ``delay_ms``: the host's crawl-delay from ``delays`` (host,
      delay_ms) when given — robots.txt Crawl-delay, converted upstream
      — else ``default_delay_ms``.
    - ``eta_ms`` = seq · delay_ms: the earliest polite fetch offset from
      the host's first fetch. Integer ms, exact cross-engine.
    - ``worker`` = xxhash64(host) mod workers: host-sticky, so one
      worker owns a host's queue and the spacing needs no coordination.

    Scale: one window partitioned by host (per-host state only), one
    broadcast join (|hosts| rows), no corpus-wide exchange beyond the
    host shuffle the window needs.
    """
    w = Window.partitionBy(host_col).orderBy(
        F.md5(F.col(url_col)), F.col(url_col)
    )
    out = frontier.select(
        "*", (F.row_number().over(w) - 1).cast("long").alias("seq")
    )
    if delays is not None:
        d = F.broadcast(
            delays.select(
                F.col("host").alias("_dhost"),
                F.col("delay_ms").cast("long").alias("_delay"),
            )
        )
        out = (
            out.join(d, F.col(host_col) == F.col("_dhost"), "left")
            .drop("_dhost")
            .withColumn(
                "delay_ms",
                F.coalesce(F.col("_delay"), F.lit(int(default_delay_ms))),
            )
            .drop("_delay")
        )
    else:
        out = out.withColumn("delay_ms", F.lit(int(default_delay_ms)).cast("long"))
    # md5-derived worker id (not xxhash64): portable across engines and
    # stable across Spark versions, so a restarted scheduler — or an
    # auditor in another engine — re-derives the identical assignment
    wid = F.pmod(
        F.conv(F.substring(F.md5(F.col(host_col)), 1, 8), 16, 10).cast("long"),
        F.lit(workers),
    )
    return out.select(
        "*",
        (F.col("seq") * F.col("delay_ms")).alias("eta_ms"),
        wid.cast("int").alias("worker"),
    )


def politeness_audit(schedule: DataFrame, host_col: str = "host") -> DataFrame:
    """Per-worker wall-clock bounds from a politeness_schedule output:
    (worker, n_urls, n_hosts, bound_ms, bottleneck_host). ``bound_ms``
    is max over the worker's hosts of n_urls·delay — the politeness
    lower bound no amount of hardware beats; ``bottleneck_host`` names
    the host that sets it (ties broken lexicographically). One groupBy
    per level, both map-side combinable."""
    per_host = schedule.groupBy("worker", host_col).agg(
        F.count("*").alias("n_urls"),
        (F.count("*") * F.max("delay_ms")).alias("span_ms"),
    )
    w = Window.partitionBy("worker").orderBy(
        F.col("span_ms").desc(), F.col(host_col).asc()
    )
    ranked = per_host.select(
        "*", F.row_number().over(w).alias("_rk")
    )
    agg = ranked.groupBy("worker").agg(
        F.sum("n_urls").alias("n_urls"),
        F.count("*").alias("n_hosts"),
        F.max("span_ms").alias("bound_ms"),
        F.max(F.when(F.col("_rk") == 1, F.col(host_col))).alias(
            "bottleneck_host"
        ),
    )
    return agg.orderBy("worker")
