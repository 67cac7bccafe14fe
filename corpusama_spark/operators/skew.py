"""Key-skew diagnostics — the planning view for salting decisions.

Every skew mitigation in the engine (flagship salt buckets, split-and-merge
sessionization, banded-dedup flood guards) needs the same upstream fact:
WHICH keys are hot and BY HOW MUCH. This operator turns that into a
first-class relational query instead of ad-hoc notebook counts, so a
deployment can gate `presplit_hours=` / `salt_buckets=` choices on data.

Scale shape: one groupBy(key) count (the unavoidable pass), a single-row
total broadcast back (the colloc.py marginal pattern), and a
TakeOrderedAndProject for the top-N — no window over the full key set, no
second scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Top-``top_n`` heaviest keys: (key, n, share, skew, salt_factor).

    ``share`` = fraction of all rows, ``skew`` = n / mean-rows-per-key
    (1.0 = perfectly balanced), ``salt_factor`` = ceil(skew) — the number
    of salt buckets that levels this key to the mean. Ordering is
    deterministic (n desc, key asc)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("total"),
        F.count("*").alias("n_keys"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(
                F.col("n") * F.col("n_keys") / F.col("total"), 4
            ).alias("skew"),
            F.ceil(F.col("n") * F.col("n_keys") / F.col("total"))
            .cast("long")
            .alias("salt_factor"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(top_n)
    )


def suggest_salt(df: DataFrame, key_col: str, target_skew: float = 2.0) -> int:
    """Driver-side scalar: the salt-bucket count that brings the hottest
    key down to ``target_skew`` x the mean — 1 when no salting is needed.
    One bounded collect (a single row)."""
    row = skew_report(df, key_col, top_n=1).collect()
    if not row:
        return 1
    return max(1, math.ceil(float(row[0].skew) / target_skew))
