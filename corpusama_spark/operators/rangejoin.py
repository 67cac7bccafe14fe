"""Bucketed range (interval) join — the other temporal join Spark can't
plan well natively.

``l JOIN r ON r.ts BETWEEN l.ts + lower AND l.ts + upper`` has no
equi-key, so Catalyst falls back to BroadcastNestedLoopJoin (fine only
when one side broadcasts) or a cartesian — O(n_l * n_r) at cluster
scale. The standard fix (the same one Databricks' range-join hints and
kdb+ wj use) is BUCKETING: quantize time into buckets at least as wide
as the window span, replicate each LEFT row into the (at most 2 when
``width >= span``) buckets its window touches, equi-join on the bucket
id, then apply the exact range predicate.

Correctness: a qualifying pair (l, r) meets in EXACTLY the bucket
containing r.ts — the left row was replicated into every bucket its
window overlaps, the right row lives in one bucket — so no dedup pass
is needed and no pair is lost.

Scale shape (10^12 rows):
- replication factor is ceil(span/width)+1 <= 2 for the default width,
  so the shuffled volume is ~2x left + 1x right — linear, not pairs;
- the equi-join on bucket id is a plain hash shuffle join Catalyst and
  AQE treat like any other (skew split applies if one time bucket is a
  burst hot spot); an optional ``key`` column co-partitions by
  (key, bucket) and further shards bursts;
- output size IS the true match count — the only irreducible term.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    # parquet timestamps arrive TIMESTAMP_NTZ (unix_micros rejects);
    # session tz is UTC (session.py) so the cast is lossless
    return F.unix_micros(col.cast("timestamp"))


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    key: str | None = None,
    width_us: int | None = None,
) -> DataFrame:
    """Inner range join: all (left, right) pairs with
    ``left.ts + lower_us <= right.ts <= left.ts + upper_us`` (inclusive
    both ends, negative lower = look-back). Column names must not clash
    across the two inputs (alias upstream). ``width_us`` defaults to the
    window span (guaranteeing <= 2 replicas per left row); pass a larger
    width to trade replication for bucket fan-in.
    """
    if upper_us < lower_us:
        raise ValueError("upper_us < lower_us")
    span = upper_us - lower_us
    width = int(width_us) if width_us is not None else max(span, 1)
    l_us = _us(F.col(left_ts))
    r_us = _us(F.col(right_ts))
    lo_b = F.floor((l_us + F.lit(lower_us)) / F.lit(width))
    hi_b = F.floor((l_us + F.lit(upper_us)) / F.lit(width))
    lrep = left.withColumn("_l_us", l_us).withColumn(
        "_bucket", F.explode(F.sequence(lo_b, hi_b))
    )
    rrep = right.withColumn("_r_us", r_us).withColumn(
        "_bucket", F.floor(F.col("_r_us") / F.lit(width))
    )
    on = ["_bucket"] if key is None else [key, "_bucket"]
    j = lrep.join(rrep, on=on, how="inner").where(
        (F.col("_r_us") >= F.col("_l_us") + F.lit(lower_us))
        & (F.col("_r_us") <= F.col("_l_us") + F.lit(upper_us))
    )
    return j.drop("_bucket", "_l_us", "_r_us")


def range_count(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    value_col: str | None = None,
    key: str | None = None,
) -> DataFrame:
    """Per-left-row aggregate over its time window: (left_id, n_matches,
    value_sum). Left rows with zero matches KEEP their row (n=0, sum=0)
    via a final left join — the contract shape for neighborhood-density
    features (burst detection, co-occurrence rates) where every row needs
    its count. value_sum rounds to 6 dp for cross-engine hash stability.
    """
    rsel = [F.col(right_ts).alias("_rts")]
    if key:
        rsel.append(F.col(key))
    if value_col:
        rsel.append(F.col(value_col).alias("_rval"))
    pairs = bucketed_range_join(
        left.select(left_id, left_ts, *([key] if key else [])),
        right.select(*rsel),
        left_ts=left_ts,
        right_ts="_rts",
        lower_us=lower_us,
        upper_us=upper_us,
        key=key,
    )
    agg = pairs.groupBy(left_id).agg(
        F.count("*").alias("n_matches"),
        (
            F.round(F.sum("_rval"), 6) if value_col else F.lit(0.0)
        ).alias("value_sum"),
    )
    return (
        left.select(left_id)
        .join(agg, [left_id], "left")
        .select(
            F.col(left_id),
            F.coalesce(F.col("n_matches"), F.lit(0)).alias("n_matches"),
            F.coalesce(F.col("value_sum"), F.lit(0.0)).alias("value_sum"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str] = ("l_start", "l_end"),
    right_cols: tuple[str, str] = ("r_start", "r_end"),
    width_us: int = 60_000_000,
    key: str | None = None,
) -> DataFrame:
    """Interval OVERLAP join (X268): all (left, right) pairs whose
    [start, end] ranges intersect — ``l_start <= r_end AND r_start <=
    l_end`` (microsecond timestamps, inclusive). The multimodal use:
    video shot intervals × caption/subtitle time spans, crawl sessions ×
    incident windows. Catalyst has no equi-key for this predicate and
    falls back to a nested-loop join; the classic distributed answer
    (the same bucketize-verify shape as ``bucketed_range_join``) is:

    1. each interval EXPLODES onto the coarse time buckets it touches
       (replication = interval_len / width + 1 — pick ``width_us`` near
       the typical interval length so replication stays ~2);
    2. hash equi-join on (key?, bucket);
    3. the exact predicate verifies, and pairs that co-occupy several
       buckets are claimed ONLY by the bucket containing the overlap's
       start — a pure per-row condition, so no dropDuplicates shuffle
       is needed to dedup multi-bucket matches.

    Emits the pair plus overlap_start/overlap_end/overlap_us. Degenerate
    inputs (end < start) raise at execution via an ANSI-safe guard
    column check upstream is cheaper; here they simply never match."""
    ls, le = (F.col(c) for c in left_cols)
    rs, re_ = (F.col(c) for c in right_cols)
    l_lo, l_hi = _us(ls), _us(le)
    r_lo, r_hi = _us(rs), _us(re_)
    lrep = left.withColumn("_l_lo", l_lo).withColumn(
        "_l_hi", l_hi
    ).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("_l_lo") / F.lit(width_us)),
                F.floor(F.col("_l_hi") / F.lit(width_us)),
            )
        ),
    )
    rrep = right.withColumn("_r_lo", r_lo).withColumn(
        "_r_hi", r_hi
    ).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("_r_lo") / F.lit(width_us)),
                F.floor(F.col("_r_hi") / F.lit(width_us)),
            )
        ),
    )
    on = ["_bucket"] if key is None else [key, "_bucket"]
    ov_lo = F.greatest(F.col("_l_lo"), F.col("_r_lo"))
    ov_hi = F.least(F.col("_l_hi"), F.col("_r_hi"))
    j = (
        lrep.join(rrep, on=on, how="inner")
        .where(
            (F.col("_l_lo") <= F.col("_r_hi"))
            & (F.col("_r_lo") <= F.col("_l_hi"))
            # claim the pair exactly once: in the bucket where the
            # overlap begins
            & (F.col("_bucket") == F.floor(ov_lo / F.lit(width_us)))
        )
        .withColumn("overlap_us", ov_hi - ov_lo + 1)
        .withColumn(
            "overlap_start", F.timestamp_micros(ov_lo)
        )
        .withColumn("overlap_end", F.timestamp_micros(ov_hi))
    )
    return j.drop("_bucket", "_l_lo", "_l_hi", "_r_lo", "_r_hi")
