"""Consistent pseudonymization (X226): linkage across docs and casings,
non-entity text untouched, NULL passthrough, audit map counts."""

import hashlib


def _tok(entity):
    return f"<EMAIL_{hashlib.md5(entity.lower().encode()).hexdigest()[:6]}>"


def test_pseudonymize_linkage_and_rewrite(spark):
    from corpusama_spark.functions.scrub import pseudonymize
    from pyspark.sql import functions as F

    rows = [
        (0, "write to alice@corp.com or bob@corp.com today"),
        (1, "ALICE@CORP.COM replied; ping alice@corp.com again"),
        (2, "no addresses in this one"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.s
        for r in df.select("doc_id", pseudonymize("text").alias("s")).collect()
    }
    a, b = _tok("alice@corp.com"), _tok("bob@corp.com")
    assert out[0] == f"write to {a} or {b} today"
    # same entity, different casing, different doc -> same token
    assert out[1] == f"{a} replied; ping {a} again"
    assert out[2] == "no addresses in this one"
    assert out[3] is None
    assert "alice" not in out[0] and "corp.com" not in out[0]


def test_pseudonym_map_counts(spark):
    from corpusama_spark.functions.scrub import pseudonym_map

    rows = [
        (0, "alice@corp.com and bob@corp.com"),
        (1, "ALICE@CORP.COM alone"),
        (2, "alice@corp.com twice alice@corp.com"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.entity: (r.pseudonym, r.n_docs, r.n_occurrences)
        for r in pseudonym_map(df, "text", "doc_id").collect()
    }
    assert out["alice@corp.com"] == (_tok("alice@corp.com"), 3, 4)
    assert out["bob@corp.com"] == (_tok("bob@corp.com"), 1, 1)
    assert len(out) == 2
