"""Quality-rule ablation: per-rule marginal statistics for threshold tuning.

A heuristic filter chain (the reference's drop_all/langid gates,
corpusama/util/langid.py:73-111; Gopher/C4-style rules) is tuned by asking,
per rule: how many documents does it reject (``n_fail``), how many does it
ALONE reject (``n_sole`` — removing the rule admits exactly these), and what
share of the corpus that is. This operator computes that table in one pass:

- every rule evaluates as a scan-stage int flag (no UDFs — callers pass
  Column predicates built from pyspark.sql.functions);
- one projection computes the per-row fail count, one explode unpivots the
  flags to (rule, fail) rows, one vocabulary-width groupBy aggregates —
  the only corpus-sized exchange is the explode's |rules|-fold row
  amplification feeding a partial-agg, which map-side combine collapses
  to |rules| rows per task before the shuffle;
- the corpus count rides the same aggregate (count(*) per rule group ==
  n_docs), so no second pass and no driver-side action.

At 10^12 rows this is the same shape as the word-count: linear scan,
constant-width shuffle. Rules stay tunable without re-reading data by
persisting the flags projection once per sweep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rule_ablation(
    df: DataFrame,
    rules: dict[str, Column],
    id_col: str = "doc_id",
) -> DataFrame:
    """(rule, n_fail, n_sole, n_docs, fail_rate) for every rule.

    ``n_sole`` counts rows where this rule is the ONLY failing one —
    the marginal cost of keeping it. fail_rate is n_fail / n_docs
    rounded to 6 decimals.
    """
    if not rules:
        raise ValueError("rule_ablation needs at least one rule")
    names = list(rules)
    flags = df.select(
        F.col(id_col),
        *[rules[n].cast("int").alias(n) for n in names],
    )
    nfail = sum((F.col(n) for n in names[1:]), F.col(names[0]))
    unpivoted = flags.withColumn("_nfail", nfail).select(
        "_nfail",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("rule"), F.col(n).alias("fail")
                    )
                    for n in names
                ]
            )
        ).alias("r"),
    )
    return (
        unpivoted.groupBy(F.col("r.rule").alias("rule"))
        .agg(
            F.sum("r.fail").alias("n_fail"),
            F.sum(
                F.when((F.col("r.fail") == 1) & (F.col("_nfail") == 1), 1)
                .otherwise(0)
            ).alias("n_sole"),
            F.count("*").alias("n_docs"),
        )
        .select(
            "rule",
            "n_fail",
            "n_sole",
            "n_docs",
            F.round(F.col("n_fail") / F.col("n_docs"), 6).alias("fail_rate"),
        )
    )


def drop_waterfall(
    df: DataFrame,
    rules: dict[str, Column],
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequential drop attribution: evaluate ``rules`` IN ORDER and charge
    every dropped row to the FIRST rule that rejects it — the standard
    data-curation "waterfall" report (each stage's count is the marginal
    drop GIVEN everything upstream already ran), as opposed to
    :func:`rule_ablation`'s order-independent marginals.

    Output, one row per rule in chain order: ``stage`` (1-based position),
    ``rule``, ``n_first`` (rows this stage drops), ``n_fail`` (rows the
    rule matches regardless of position — n_fail − n_first is the overlap
    absorbed upstream), ``cum_dropped``, ``n_remaining`` after the stage,
    and ``drop_share`` = n_first / n_docs (6dp).

    Scale shape (10^12 rows): ONE corpus scan computes all flags plus the
    first-failing-rule label per row (a coalesce chain, pure JVM), one
    constant-width groupBy collapses it to ≤ |rules| rows, and the
    cumulative window runs on that |rules|-row table — corpus-sized data
    crosses the exchange once, already combined map-side. The chain stays
    tunable without re-reads by persisting the flags projection.

    Reference seam: corpusama's drop_all chain applies gates sequentially
    (corpusama/util/langid.py:73-111) but only logs the final keep — this
    is the per-stage accounting a 10^12-row run needs to budget each gate.
    """
    if not rules:
        raise ValueError("drop_waterfall needs at least one rule")
    names = list(rules)
    flags = df.select(
        F.col(id_col),
        *[rules[n].cast("int").alias(n) for n in names],
    )
    first = F.coalesce(
        *[F.when(F.col(n) == 1, F.lit(n)) for n in names],
        F.lit("_kept"),
    )
    labeled = flags.withColumn("_first", first)
    per_rule = labeled.groupBy("_first").agg(
        F.count("*").cast("long").alias("n_first")
    )
    totals = labeled.groupBy().agg(
        F.count("*").cast("long").alias("n_docs"),
        *[F.sum(n).cast("long").alias(f"_f_{n}") for n in names],
    )
    order = F.create_map(
        *[x for i, n in enumerate(names) for x in (F.lit(n), F.lit(i + 1))]
    )
    chain = (
        df.sparkSession.createDataFrame(
            [(n,) for n in names], schema="rule string"
        )
        .join(
            per_rule.withColumnRenamed("_first", "rule"), "rule", "left"
        )
        .crossJoin(F.broadcast(totals))
        .select(
            order[F.col("rule")].cast("int").alias("stage"),
            "rule",
            F.coalesce("n_first", F.lit(0)).cast("long").alias("n_first"),
            F.coalesce(
                *[
                    F.when(F.col("rule") == n, F.col(f"_f_{n}"))
                    for n in names
                ]
            )
            .cast("long")
            .alias("n_fail"),
            "n_docs",
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("stage").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return chain.select(
        "stage",
        "rule",
        "n_first",
        "n_fail",
        F.sum("n_first").over(w).cast("long").alias("cum_dropped"),
        (F.col("n_docs") - F.sum("n_first").over(w))
        .cast("long")
        .alias("n_remaining"),
        F.round(F.col("n_first") / F.col("n_docs"), 6).alias("drop_share"),
    ).orderBy("stage")


def shapley_drop_attribution(
    df: DataFrame,
    rules: dict[str, Column],
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Shapley attribution of dropped documents to rules — the
    order-FREE answer to "which gate is doing the work?" that sits
    between :func:`rule_ablation` (n_fail over-counts shared drops) and
    :func:`drop_waterfall` (first-fail depends on chain order).

    The coalition game per document is v(S) = 1 if any rule in S fails
    the doc, else 0. For that game the Shapley value has a closed form:
    a rule outside the doc's failing set T is a null player (its
    marginal is 0 everywhere), members of T are symmetric, and
    efficiency forces Σφ = v(N) = 1 — so each dropped doc splits its
    unit drop EQUALLY among its |T| failing rules, φ_i = 1/|T|·1{i∈T}.
    Corpus-level Shapley is therefore Σ_docs fail_i/nfail, and the
    per-rule totals sum exactly to the number of dropped docs.

    Exactness across engines: 1/nfail sums are float-order-sensitive,
    so the split is accumulated as INTEGER micro-units of
    lcm(1..k)/nfail per doc (k = |rules|) and divided once at the end —
    DuckDB and Spark agree bit-exactly.

    Output, one row per rule: n_fail, shapley (6 dp), shap_share of all
    drops (6 dp), n_dropped, n_docs. Scale shape: identical to
    rule_ablation — one scan computes the flags + per-row nfail, one
    |rules|-fold explode feeds a constant-width partial agg; corpus
    rows cross the exchange once, combined map-side.
    """
    if not rules:
        raise ValueError("shapley_drop_attribution needs at least one rule")
    names = list(rules)
    lcm = 1
    for j in range(2, len(names) + 1):
        g, a, b = 1, lcm, j
        while b:
            a, b = b, a % b
        g = a
        lcm = lcm * j // g
    flags = df.select(
        F.col(id_col),
        *[rules[n].cast("int").alias(n) for n in names],
    )
    nfail = sum((F.col(n) for n in names[1:]), F.col(names[0]))
    unpivoted = flags.withColumn("_nfail", nfail).select(
        "_nfail",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(n).alias("rule"), F.col(n).alias("fail"))
                    for n in names
                ]
            )
        ).alias("r"),
    )
    # integer micro-units: a doc failing t rules gives each failing rule
    # lcm/t units; a doc's units always total exactly lcm
    units = F.when(
        (F.col("r.fail") == 1) & (F.col("_nfail") > 0),
        F.lit(lcm).cast("long") / F.col("_nfail"),
    ).otherwise(F.lit(0))
    agg = (
        unpivoted.groupBy(F.col("r.rule").alias("rule"))
        .agg(
            F.sum("r.fail").cast("long").alias("n_fail"),
            F.sum(units.cast("long")).cast("long").alias("_units"),
            F.sum(
                F.when(F.col("_nfail") > 0, 1).otherwise(0)
            ).cast("long").alias("_dropped_x"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )
    return agg.select(
        "rule",
        "n_fail",
        F.round(F.col("_units") / F.lit(float(lcm)), 6).alias("shapley"),
        F.round(
            F.when(
                F.col("_dropped_x") > 0,
                F.col("_units") / (F.lit(lcm) * F.col("_dropped_x")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("shap_share"),
        F.col("_dropped_x").alias("n_dropped"),
        "n_docs",
    )
