"""PPJoin exact prefix-filtered Jaccard self-join (X190)."""

from pyspark.sql import functions as F


def _corpus(spark):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, "zzz " + base),  # near dup (one leading word added)
        (4, base.replace("echo", "xray")),  # near dup (one word swapped)
        (5, "kilo lima mike november oscar papa quebec romeo sierra"),
        (6, "totally different words here nothing shared with others"),
        (7, "alpha bravo charlie delta unrelated tail of words now"),
        (8, None),
        (9, "short"),
        # boilerplate flood: one hot shingle shared by many docs
        *[
            (100 + i, f"header boiler plate line {i} unique tail {i * 7}")
            for i in range(12)
        ],
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute(spark, df, threshold, n=3):
    """Ground truth via the existing full-index exact tier, uncapped."""
    from corpusama_spark.operators.dedup import exact_jaccard_pairs

    return exact_jaccard_pairs(
        df, "text", "doc_id", threshold=threshold, shingle_n=n, max_df=None
    )


def test_ppjoin_equals_uncapped_exact_tier(spark):
    from corpusama_spark.operators.fuzzy import ppjoin_pairs

    df = _corpus(spark)
    for t in (0.3, 0.5, 0.8):
        got = sorted(
            ppjoin_pairs(df, "text", "doc_id", threshold=t).collect()
        )
        want = sorted(_brute(spark, df, t).collect())
        assert got == want, f"threshold {t}: {got} != {want}"
        assert got, f"threshold {t} found nothing — corpus too easy"


def test_ppjoin_prefix_index_is_smaller_than_full_index(spark):
    """The scale claim: only |x| − ⌈t|x|⌉ + 1 shingles per doc are
    indexed, so the candidate-side explode is a strict subset of the
    full inverted index exact_jaccard_pairs would join."""
    from corpusama_spark.operators.dedup import shingles

    df = _corpus(spark)
    sh = df.select(
        F.col("doc_id").alias("id"), shingles("text", 3).alias("sh")
    ).where(F.size("sh") > 0)
    t = 0.8
    full = sh.select(F.explode("sh")).count()
    plen = (
        F.size("sh")
        - F.ceil(F.lit(t) * F.size("sh") - F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    pref = sh.select(F.explode(F.slice("sh", 1, plen))).count()
    assert pref < full
    # at t=0.8 the prefix is ~20% of each doc + 1 shingle
    assert pref <= 0.45 * full


def test_ppjoin_exact_on_sf0001_documents(spark):
    """Cross-check on the driver's real table at a loose threshold."""
    from corpusama_spark.operators.fuzzy import ppjoin_pairs

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = 0.2
    got = sorted(ppjoin_pairs(df, "text", "doc_id", threshold=t).collect())
    want = sorted(_brute(spark, df, t).collect())
    assert got == want
