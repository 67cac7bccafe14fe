"""Round-4 quality-analytics operators: Zipf fit, DSIR importance weights,
unicode-script composition, and the oracled phash dedup population."""

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------- zipf_fit


def test_zipf_fit_matches_numpy_ols(spark):
    from corpusama_spark.operators.textstats import zipf_fit

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, lang="en", text="a a a a b b c d"),
            Row(doc_id=1, lang="en", text="a a b b c"),
            Row(doc_id=2, lang="fr", text="x x x y"),
        ]
    )
    out = {r["lang"]: r for r in zipf_fit(docs, "text", "lang").collect()}

    # en freqs: a=6 b=4 c=2 d=1 → ranks 1..4
    freqs = [6, 4, 2, 1]
    x = np.log(np.arange(1, 5))
    y = np.log(np.array(freqs, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert out["en"]["vocab"] == 4
    assert out["en"]["tokens"] == 13
    assert out["en"]["zipf_slope"] == pytest.approx(slope, abs=2e-6)
    assert out["en"]["zipf_intercept"] == pytest.approx(intercept, abs=2e-6)
    assert 0.9 < out["en"]["zipf_r2"] <= 1.0
    # fr: 2 points → perfect fit
    assert out["fr"]["zipf_r2"] == pytest.approx(1.0)
    assert out["fr"]["vocab"] == 2


def test_zipf_fit_rank_ties_break_on_token(spark):
    from corpusama_spark.operators.textstats import zipf_fit

    # all tokens same freq: slope must be exactly 0 and deterministic
    docs = spark.createDataFrame([Row(doc_id=0, lang="en", text="b a c")])
    row = zipf_fit(docs, "text", "lang").collect()[0]
    assert row["zipf_slope"] == 0.0
    assert row["vocab"] == 3


# ------------------------------------------------------------ dsir_logratio


def _dsir_input(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="the quick brown fox", is_target=True),
            Row(doc_id=1, text="the lazy dog", is_target=True),
            Row(doc_id=2, text="zzz qqq vvv kkk", is_target=False),
            Row(doc_id=3, text="the quick dog", is_target=False),
            Row(doc_id=4, text=None, is_target=False),
            Row(doc_id=5, text="   ", is_target=False),
        ]
    )


def test_dsir_ranks_targetlike_docs_higher(spark):
    from corpusama_spark.operators.dsir import dsir_logratio
    from corpusama_spark.plans.caching import release

    out = dsir_logratio(_dsir_input(spark), "text", "doc_id", "is_target")
    rows = {r["doc_id"]: r for r in out.collect()}
    release(out)
    # target-vocabulary doc scores above the disjoint-vocabulary doc
    assert rows[3]["dsir_weight"] > rows[2]["dsir_weight"]
    # empty/null docs present with weight 0
    assert rows[4]["dsir_weight"] == 0.0 and rows[4]["n_tokens"] == 0
    assert rows[5]["dsir_weight"] == 0.0
    assert len(rows) == 6


def test_dsir_weight_is_exact_loglikelihood_ratio(spark):
    """Recompute doc 3's weight by hand from the bucket model (k=8 to force
    collisions so the hashed-feature path, not the token path, is what's
    checked)."""
    import hashlib

    from corpusama_spark.operators.dsir import dsir_logratio
    from corpusama_spark.plans.caching import release

    k = 8
    toks = {
        0: "the quick brown fox".split(),
        1: "the lazy dog".split(),
        2: "zzz qqq vvv kkk".split(),
        3: "the quick dog".split(),
    }
    bucket = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:6], 16) % k  # noqa: E731
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for d, ts in toks.items():
        for t in ts:
            b = bucket(t)
            raw[b] = raw.get(b, 0) + 1
            if d in (0, 1):
                tgt[b] = tgt.get(b, 0) + 1
    raw_t, tgt_t = sum(raw.values()), sum(tgt.values())
    expect = sum(
        math.log((tgt.get(bucket(t), 0) + 1) / (tgt_t + k))
        - math.log((raw.get(bucket(t), 0) + 1) / (raw_t + k))
        for t in toks[3]
    )
    out = dsir_logratio(
        _dsir_input(spark), "text", "doc_id", "is_target", k_buckets=k
    )
    got = {r["doc_id"]: r["dsir_weight"] for r in out.collect()}
    release(out)
    assert got[3] == pytest.approx(expect, abs=2e-6)


# ------------------------------------------------------------ script_counts


def test_script_counts_mixed_text(spark):
    from corpusama_spark.operators.textstats import script_counts

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="Hello привет 你好 مرحبا café 123 —"),
            Row(doc_id=1, text="12345 !!!"),
            Row(doc_id=2, text="это кириллица"),
            Row(doc_id=3, text=None),
        ]
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", script_counts(F.col("text")).alias("s")
        ).select("doc_id", "s.*").collect()
    }
    r0 = rows[0]
    # counts cross-checked against DuckDB RE2 (see selfcheck script_shares)
    assert (r0["n_latin"], r0["n_cyrillic"], r0["n_han"], r0["n_arabic"]) == (
        9, 6, 2, 5,
    )
    assert r0["dominant_script"] == "latin"
    assert r0["latin_share"] == pytest.approx(9 / 22, abs=1e-4)
    assert rows[1]["dominant_script"] == "none"
    assert rows[2]["dominant_script"] == "cyrillic"
    assert rows[3]["dominant_script"] == "none"


# --------------------------------------------------- phash population/pairs


def test_phash_population_twins_within_hamming_3(spark, tmp_path):
    import __spark_entry__ as E

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(40)]
    )
    pop = E._phash_population(docs)
    rows = {r["id"]: r["code"] for r in pop.collect()}
    # one twin per doc_id%10==0
    assert len(rows) == 44
    for base_id in (0, 10, 20, 30):
        ham = bin(rows[base_id] ^ rows[base_id + 1000000]).count("1")
        assert 1 <= ham <= 3


def test_phash_banded_pairs_equal_bruteforce(spark):
    """Pigeonhole completeness: banded LSH (4 bands, k=3) finds EXACTLY the
    brute-force pair set on the injected population."""
    from itertools import combinations

    import __spark_entry__ as E
    from corpusama_spark.operators.dedup import hamming_band_pairs
    from corpusama_spark.plans.caching import release

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(60)]
    )
    pop = E._phash_population(docs)
    codes = {r["id"]: r["code"] for r in pop.collect()}
    brute = {
        (a, b)
        for a, b in combinations(sorted(codes), 2)
        if bin(codes[a] ^ codes[b]).count("1") <= 3
    }
    pairs = hamming_band_pairs(pop, "id", "code", bands=4, hamming_k=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    release(pairs)
    assert got == brute and len(brute) >= 6


# ------------------------------------------------------------------ heaps_fit


def test_heaps_fit_matches_numpy(spark):
    from corpusama_spark.operators.textstats import heaps_fit

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, lang="en", text="a b"),
            Row(doc_id=1, lang="en", text="a c"),
            Row(doc_id=2, lang="en", text="b c d"),
        ]
    )
    row = heaps_fit(docs).collect()[0]
    # checkpoints: (N, V) = (2,2), (4,3), (7,4)
    x = np.log([2.0, 4.0, 7.0])
    y = np.log([2.0, 3.0, 4.0])
    beta, ln_k = np.polyfit(x, y, 1)
    assert row["n_checkpoints"] == 3
    assert row["beta"] == pytest.approx(beta, abs=2e-6)
    assert row["ln_k"] == pytest.approx(ln_k, abs=2e-6)
    assert 0 < row["beta"] < 1  # Heaps regime
