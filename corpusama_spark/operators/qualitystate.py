"""Differential data-quality verification on partitioned data (X249).

The Deequ-lineage idea (Schelter et al., "Differential Data Quality
Verification on Partitioned Data", ICDE 2019 — retrieved in PAPERS.md):
keep a small ALGEBRAIC STATE per partition per column — counts, null
counts, min/max/sum, HLL registers — such that corpus-level quality
metrics are a pure merge of states. Adding a partition (a new snapshot
wave, a stream epoch) updates every metric WITHOUT rescanning old data:
at 10^12 rows the difference between "recompute completeness" and
"merge 4096 state rows" is the whole job.

Mergeability is exact by construction: counts/sums add, min/max take
extrema, HLL registers take element-wise max — all associative and
commutative, so `metrics(states(full)) == metrics(states(A) ∪
states(B))` bit-for-bit (the pytest pins it). The HLL shape is
sketches.hll_distinct's (md5 60-bit, m=64, published α), so the whole
chain stays DuckDB-oracle-exact.

State row: (part, column, n, n_null, min_num, max_num, sum_num,
min_str, max_str, sum_len, regs[64]) — numeric and string columns fill
their half, the other half is NULL.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quality_states", "merge_quality_metrics", "quality_check"]

_P = 6
_M = 64
_ALPHA_M2 = 2904.064  # 0.709 * 64^2 (Flajolet et al. 2007 published α)


def _hll_regs(df: DataFrame, part_col: str, col: str) -> DataFrame:
    """(part, column, regs): 64 max-rank registers over the column's
    non-null values, missing registers filled 0 — the mergeable
    distinctness state."""
    hv = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    ranked = (
        df.where(F.col(col).isNotNull())
        .select(
            F.col(part_col).alias("part"),
            F.pmod(hv, F.lit(_M)).cast("int").alias("reg"),
            F.shiftrightunsigned(hv, _P).alias("w"),
        )
        .groupBy("part", "reg")
        .agg(
            F.max(
                F.when(
                    F.col("w") > 0,
                    F.lit(55) - F.length(F.conv(F.col("w"), 10, 2)),
                ).otherwise(F.lit(55))
            ).alias("mrank")
        )
    )
    parts = df.select(F.col(part_col).alias("part")).distinct()
    frame = parts.select(
        "part", F.explode(F.sequence(F.lit(0), F.lit(_M - 1))).alias("reg")
    )
    full = frame.join(ranked, ["part", "reg"], "left").select(
        "part", "reg", F.coalesce("mrank", F.lit(0)).alias("mrank")
    )
    return full.groupBy("part").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("reg", "mrank"))),
            lambda s: s["mrank"],
        ).alias("regs")
    )


def quality_states(
    df: DataFrame,
    part_col: str,
    numeric_cols: list[str] = (),
    string_cols: list[str] = (),
) -> DataFrame:
    """One mergeable state row per (partition, column). Each column's
    scan is one map-side-combinable groupBy plus the register groupBy —
    per PARTITION, so a new partition's states come from scanning only
    the new partition."""
    outs = []
    for c in numeric_cols:
        base = df.groupBy(F.col(part_col).alias("part")).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
            F.min(F.col(c).cast("double")).alias("min_num"),
            F.max(F.col(c).cast("double")).alias("max_num"),
            F.sum(F.col(c).cast("double")).alias("sum_num"),
        )
        s = base.join(_hll_regs(df, part_col, c), "part", "left").select(
            "part",
            F.lit(c).alias("column"),
            "n",
            "n_null",
            "min_num",
            "max_num",
            "sum_num",
            F.lit(None).cast("string").alias("min_str"),
            F.lit(None).cast("string").alias("max_str"),
            F.lit(None).cast("long").alias("sum_len"),
            "regs",
        )
        outs.append(s)
    for c in string_cols:
        base = df.groupBy(F.col(part_col).alias("part")).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
            F.min(F.col(c)).alias("min_str"),
            F.max(F.col(c)).alias("max_str"),
            F.sum(F.length(F.col(c)).cast("long")).alias("sum_len"),
        )
        s = base.join(_hll_regs(df, part_col, c), "part", "left").select(
            "part",
            F.lit(c).alias("column"),
            "n",
            "n_null",
            F.lit(None).cast("double").alias("min_num"),
            F.lit(None).cast("double").alias("max_num"),
            F.lit(None).cast("double").alias("sum_num"),
            "min_str",
            "max_str",
            "sum_len",
            "regs",
        )
        outs.append(s)
    if not outs:
        raise ValueError("no columns requested")
    return reduce(lambda a, b: a.unionByName(b), outs)


def merge_quality_metrics(states: DataFrame) -> DataFrame:
    """Corpus-level metrics from ANY union of state rows: (column, n,
    n_null, completeness, min_num, max_num, mean_num, min_str, max_str,
    avg_len, distinct_est). Pure algebra — counts add, extrema extend,
    registers element-wise max then the published HLL estimate with
    linear-counting correction."""
    regs = states.select(
        "column", F.posexplode("regs").alias("reg", "mrank")
    ).groupBy("column", "reg").agg(F.max("mrank").alias("mrank"))
    z = regs.groupBy("column").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mrank"))).alias("z"),
        F.sum((F.col("mrank") == 0).cast("int")).alias("zeros"),
    )
    raw = F.lit(_ALPHA_M2) / F.col("z")
    est = F.when(
        (raw <= F.lit(2.5 * _M)) & (F.col("zeros") > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.col("zeros")),
    ).otherwise(raw)
    hll = z.select("column", F.round(est, 6).alias("distinct_est"))
    agg = states.groupBy("column").agg(
        F.sum("n").alias("n"),
        F.sum("n_null").alias("n_null"),
        F.min("min_num").alias("min_num"),
        F.max("max_num").alias("max_num"),
        F.sum("sum_num").alias("_sum"),
        F.min("min_str").alias("min_str"),
        F.max("max_str").alias("max_str"),
        F.sum("sum_len").alias("_sumlen"),
    )
    nonnull = F.col("n") - F.col("n_null")
    return (
        agg.join(hll, "column")
        .select(
            "column",
            "n",
            "n_null",
            F.round(F.lit(1.0) - F.col("n_null") / F.col("n"), 6).alias(
                "completeness"
            ),
            "min_num",
            "max_num",
            F.when(nonnull > 0, F.round(F.col("_sum") / nonnull, 6)).alias(
                "mean_num"
            ),
            "min_str",
            "max_str",
            F.when(nonnull > 0, F.round(F.col("_sumlen") / nonnull, 6)).alias(
                "avg_len"
            ),
            "distinct_est",
        )
        .orderBy("column")
    )


def quality_check(metrics: DataFrame, rules: DataFrame) -> DataFrame:
    """Deequ-style verification: ``rules`` = (column, metric, lo, hi);
    each rule passes when the named metric lies in [lo, hi] (NULL bound
    = unbounded). Output: rules + value + passed, plus an all_passed
    flag repeated on every row (one broadcastable verdict)."""
    m = metrics
    long = None
    for c in ("n", "completeness", "min_num", "max_num", "mean_num",
              "avg_len", "distinct_est"):
        part = m.select(
            "column", F.lit(c).alias("metric"), F.col(c).cast("double").alias("value")
        )
        long = part if long is None else long.unionByName(part)
    joined = rules.join(long, ["column", "metric"], "left")
    passed = (
        F.col("value").isNotNull()
        & (F.col("lo").isNull() | (F.col("value") >= F.col("lo")))
        & (F.col("hi").isNull() | (F.col("value") <= F.col("hi")))
    )
    out = joined.select("column", "metric", "lo", "hi", "value", passed.alias("passed"))
    from pyspark.sql import Window

    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return out.select(
        "*", F.min(F.col("passed").cast("int")).over(wall).cast("boolean").alias("all_passed")
    ).orderBy("column", "metric")
