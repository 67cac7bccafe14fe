"""Rule-ablation table + adaptive quantile gate + cross-modal audit."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_rule_ablation_counts(spark):
    from corpusama_spark.operators.ablation import rule_ablation

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="x"),            # fails short only... and alpha? 'x' alpha=1.0 ok; digit 0; caps 0 → sole short? len=1<50 → short; alpha 1.0 ok
            Row(doc_id=1, text="A" * 100),      # caps=1.0 → caps only
            Row(doc_id=2, text="1234567890" * 10),  # digit+alpha
            Row(doc_id=3, text="the quick brown fox jumps over the lazy dog and keeps going"),  # passes all
        ]
    )
    from corpusama_spark.functions.textrules import (
        caps_ratio_col,
        digit_ratio_col,
        alpha_ratio_col,
    )

    t = F.coalesce(F.col("text"), F.lit(""))
    rules = {
        "short": F.length(t) < 50,
        "caps": caps_ratio_col(t) > 0.5,
        "alpha": alpha_ratio_col(t) < 0.6,
        "digit": digit_ratio_col(t) > 0.2,
    }
    out = {r["rule"]: r for r in rule_ablation(docs, rules).collect()}
    assert set(out) == {"short", "caps", "alpha", "digit"}
    assert all(r["n_docs"] == 4 for r in out.values())
    assert out["short"]["n_fail"] == 1 and out["short"]["n_sole"] == 1
    assert out["caps"]["n_fail"] == 1 and out["caps"]["n_sole"] == 1
    # digit doc fails both digit and alpha → sole=0 for each
    assert out["digit"]["n_fail"] == 1 and out["digit"]["n_sole"] == 0
    assert out["alpha"]["n_fail"] == 1 and out["alpha"]["n_sole"] == 0
    assert out["short"]["fail_rate"] == 0.25


def test_adaptive_gate_bounds(spark):
    """The gate must keep exactly the rows whose n_chars lies within the
    per-group type-1 p12.5/p87.5 band."""
    import math

    import __spark_entry__ as E

    # build a miniature documents table on disk so the query fn can read it
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="t", lang="en" if i < 40 else "fr",
                source="s", n_chars=i + 1)
            for i in range(60)
        ]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = E.q_adaptive_gate(spark, d).collect()
    rows = {r["doc_id"]: r for r in out}
    # en group: n_chars 1..40 → lo = ceil(.125*40)=5, hi = ceil(.875*40)=35
    assert rows[0]["lo"] == 5 and rows[0]["hi"] == 35
    assert rows[0]["keep"] is False          # n_chars=1 < 5
    assert rows[10]["keep"] is True          # 11 within [5,35]
    assert rows[39]["keep"] is False         # 40 > 35
    # fr group: 41..60 (n=20) → lo = 41-1+ceil(2.5)=43, hi = 41-1+ceil(17.5)=58
    assert rows[40]["lo"] == 43 and rows[40]["hi"] == 58
    assert sum(r["keep"] for r in out) == (35 - 5 + 1) + (58 - 43 + 1)


def test_drop_waterfall_attribution(spark):
    """Every dropped row is charged to its FIRST failing rule; the
    cumulative/remaining columns track the chain; n_fail keeps the
    order-independent total."""
    from corpusama_spark.operators.ablation import drop_waterfall

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="x"),                 # short (alpha ok)
            Row(doc_id=1, text="A" * 100),           # caps only
            Row(doc_id=2, text="1234567890" * 10),   # alpha first, digit too
            Row(doc_id=3, text="the quick brown fox jumps over the lazy "
                               "dog and keeps going"),  # kept
        ]
    )
    from corpusama_spark.functions.textrules import (
        alpha_ratio_col,
        caps_ratio_col,
        digit_ratio_col,
    )

    t = F.coalesce(F.col("text"), F.lit(""))
    rules = {
        "short": F.length(t) < 50,
        "alpha": alpha_ratio_col(t) < 0.6,
        "caps": caps_ratio_col(t) > 0.5,
        "digit": digit_ratio_col(t) > 0.2,
    }
    rows = drop_waterfall(docs, rules, "doc_id").collect()
    assert [r["rule"] for r in rows] == ["short", "alpha", "caps", "digit"]
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
    by = {r["rule"]: r for r in rows}
    # doc0 → short; doc2 → alpha (first in chain, also fails digit);
    # doc1 → caps; digit charged nothing (doc2 absorbed upstream)
    assert by["short"]["n_first"] == 1
    assert by["alpha"]["n_first"] == 1
    assert by["caps"]["n_first"] == 1
    assert by["digit"]["n_first"] == 0
    assert by["digit"]["n_fail"] == 1  # order-independent total intact
    assert by["digit"]["cum_dropped"] == 3
    assert by["digit"]["n_remaining"] == 1
    assert by["short"]["drop_share"] == 0.25


def test_drop_waterfall_first_sums_to_total_dropped(spark):
    """Σ n_first == docs failing ANY rule (partition property), on the
    real documents table."""
    import __spark_entry__ as E

    out = E.q_drop_waterfall(spark, "/root/testdata/sf0.001").collect()
    total_first = sum(r["n_first"] for r in out)
    # recompute any-fail directly
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from corpusama_spark.functions.textrules import (
        alpha_ratio_col,
        caps_ratio_col,
        digit_ratio_col,
        is_nanlike,
    )

    t = F.coalesce(F.col("text"), F.lit(""))
    any_fail = (
        is_nanlike(F.col("text"))
        | (F.length(t) < 50)
        | (alpha_ratio_col(t) < 0.6)
        | (caps_ratio_col(t) > 0.5)
        | (digit_ratio_col(t) > 0.2)
    )
    expect = docs.where(any_fail).count()
    assert total_first == expect
    assert out[-1]["n_remaining"] == docs.count() - expect
