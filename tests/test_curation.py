"""Corpus-curation family: decontamination, corpus-level line dedup,
stratified hash sampling, semantic dedup."""

import pytest
from pyspark.sql import functions as F


def test_ngram_contamination_flags_shared_grams(spark):
    from corpusama_spark.operators.curation import ngram_contamination

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "a completely different sentence with no overlap at all"),
            (3, "QUICK Brown FOX jumps OVER fences and nothing else"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "quick brown fox jumps over the lazy")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in ngram_contamination(docs, bench, n=5).collect()
    }
    # doc 1 contains all three bench 5-grams; doc 3 shares only the
    # casefolded "quick brown fox jumps over"; doc 2 is clean
    assert out[1] == (3, True)
    assert out[3] == (1, True)
    assert out[2] == (0, False)


def test_ngram_contamination_reports_every_doc(spark):
    from corpusama_spark.operators.curation import ngram_contamination

    docs = spark.createDataFrame(
        [(i, f"unique text number {i} with filler words") for i in range(7)],
        "doc_id long, text string",
    )
    bench = docs.where(F.col("doc_id") == 99)  # empty bench
    got = ngram_contamination(docs, bench, n=3).collect()
    assert len(got) == 7
    assert all(r.n_hits == 0 and not r.contaminated for r in got)


def test_drop_duplicated_lines_keeps_order_and_counts(spark):
    from corpusama_spark.operators.curation import drop_duplicated_lines

    boiler = "accept cookies"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler}\nalpha content\nbeta content"),
            (2, f"{boiler}\ngamma content"),
            (3, f"{boiler}\n{boiler}"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in drop_duplicated_lines(docs, threshold=2).collect()}
    assert out[1].text == "alpha content\nbeta content"
    assert (out[1].n_kept, out[1].n_dropped) == (2, 1)
    assert out[2].text == "gamma content"
    # all-boilerplate doc survives with empty text, not a missing row
    assert out[3].text == ""
    assert (out[3].n_kept, out[3].n_dropped) == (0, 2)


def test_drop_duplicated_lines_threshold_boundary(spark):
    from corpusama_spark.operators.curation import drop_duplicated_lines

    docs = spark.createDataFrame(
        [(1, "twice\nonce_a"), (2, "twice\nonce_b")],
        "doc_id long, text string",
    )
    # threshold=3: the line occurring twice survives
    out3 = {r.doc_id: r.text for r in drop_duplicated_lines(docs, threshold=3).collect()}
    assert out3 == {1: "twice\nonce_a", 2: "twice\nonce_b"}
    # threshold=2: it is dropped from BOTH docs
    out2 = {r.doc_id: r.text for r in drop_duplicated_lines(docs, threshold=2).collect()}
    assert out2 == {1: "once_a", 2: "once_b"}


def test_stratified_sample_rates_and_determinism(spark):
    from corpusama_spark.operators.curation import stratified_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    frac = {"a": 0.5, "b": 0.1}
    got = stratified_sample(df, "stratum", frac, "id", seed="t").collect()
    by = {"a": 0, "b": 0}
    for r in got:
        by[r.stratum] += 1
    # 2000 rows per stratum; md5-uniform keeps within ~4 sigma of expectation
    assert abs(by["a"] - 1000) < 100
    assert abs(by["b"] - 200) < 60
    # deterministic: the same rows every run (this is the retry-safety
    # property rand()-based sampling lacks)
    again = stratified_sample(df, "stratum", frac, "id", seed="t").collect()
    assert sorted(r.id for r in got) == sorted(r.id for r in again)
    # a different seed draws a different sample at the same rate
    other = stratified_sample(df, "stratum", frac, "id", seed="u").collect()
    assert sorted(r.id for r in other) != sorted(r.id for r in got)


def test_stratified_sample_absent_stratum_dropped(spark):
    from corpusama_spark.operators.curation import stratified_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "zzz"), (3, None)], "id long, stratum string"
    )
    got = stratified_sample(df, "stratum", {"a": 1.0}, "id").collect()
    # fraction 1.0 keeps every 'a' row; unknown and NULL strata default to 0
    assert [r.id for r in got] == [1]


def test_semantic_dedup_clusters_near_dups(spark):
    import numpy as np

    from corpusama_spark.operators.curation import semantic_dedup

    rng = np.random.default_rng(7)
    vecs = {}
    for i in range(6):
        v = rng.normal(size=48)
        vecs[i] = (v / np.linalg.norm(v)).tolist()
    vecs[100] = vecs[0]  # exact copy of 0
    bump = np.array(vecs[1])
    bump[0] += 0.4  # near-dup of 1 (cosine ~0.93)
    vecs[101] = bump.tolist()
    df = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = {
        r.vec_id: (r.cluster_id, r.keep)
        for r in semantic_dedup(df, tau=0.85, nbits=6, ntables=8).collect()
    }
    assert len(out) == 8
    assert out[100] == (0, False) and out[0] == (0, True)
    assert out[101] == (1, False) and out[1] == (1, True)
    # unrelated vectors are singleton keepers
    for i in (2, 3, 4, 5):
        assert out[i] == (i, True)


def test_semantic_dedup_flood_guard(spark):
    """A degenerate bucket (many identical vectors) above max_bucket is
    dropped before the self-join: no edges, everything keeps itself."""
    from corpusama_spark.operators.curation import semantic_dedup

    one = [1.0] * 48
    df = spark.createDataFrame(
        [(i, one) for i in range(20)], "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(df, tau=0.5, max_bucket=5).collect()
    assert all(r.keep for r in out)
    # and with the guard above the bucket size, they all collapse to min id
    merged = semantic_dedup(df, tau=0.5, max_bucket=100).collect()
    assert {r.cluster_id for r in merged} == {0}


def test_pack_shards_exact_assignment(spark):
    from pyspark.sql import functions as F

    from corpusama_spark.operators.curation import pack_shards
    from corpusama_spark.plans.caching import release

    df = spark.createDataFrame(
        [(1, 3), (2, 4), (3, 5), (4, 1), (5, 2)], "doc_id long, n long"
    )
    out = pack_shards(
        df, budget=5, count_col=F.col("n"), partitions=2
    )
    got = {r.doc_id: (r.n_tokens, r.shard_id) for r in out.collect()}
    release(out)
    # exclusive prefix sums: 0,3,7,12,13 -> shards 0,0,1,2,2
    assert got == {1: (3, 0), 2: (4, 0), 3: (5, 1), 4: (1, 2), 5: (2, 2)}


def test_pack_shards_partition_invariant(spark):
    """The distributed prefix sum must equal the sequential one no matter
    how many range partitions the plan lands on."""
    from pyspark.sql import functions as F

    from corpusama_spark.operators.curation import pack_shards
    from corpusama_spark.plans.caching import release

    rows = [(i, (i * 37) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    outs = []
    for p in (1, 7, 32):
        out = pack_shards(df, budget=40, count_col=F.col("n"), partitions=p)
        outs.append(sorted((r.doc_id, r.shard_id) for r in out.collect()))
        release(out)
    assert outs[0] == outs[1] == outs[2]
    # sequential truth
    run, truth = 0, []
    for i, n in rows:
        truth.append((i, run // 40))
        run += n
    assert outs[0] == truth


def test_pack_shards_oversized_doc(spark):
    from pyspark.sql import functions as F

    from corpusama_spark.operators.curation import pack_shards
    from corpusama_spark.plans.caching import release

    df = spark.createDataFrame([(1, 12), (2, 1)], "doc_id long, n long")
    out = pack_shards(df, budget=5, count_col=F.col("n"), partitions=2)
    got = {r.doc_id: r.shard_id for r in out.collect()}
    release(out)
    # doc 1 owns shard 0 (starts there, spills past it); doc 2 starts at
    # token 12 -> shard 2
    assert got == {1: 0, 2: 2}


def test_ppl_buckets_ordered_and_balanced(spark):
    """CCNet terciles: within each language, every head-bucket doc has
    perplexity <= every tail-bucket doc, and bucket sizes differ by <= 1."""
    import __spark_entry__ as E

    rows = E.queries()["ppl_buckets"](spark, "/root/testdata/sf0.001").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append((r.bucket, r.ppl))
    assert len(rows) == 500
    for lang, items in by_lang.items():
        buckets = {}
        for b, p in items:
            buckets.setdefault(b, []).append(p)
        assert set(buckets) <= {"head", "middle", "tail"}
        sizes = sorted(len(v) for v in buckets.values())
        assert sizes[-1] - sizes[0] <= 1
        assert max(buckets["head"]) <= min(buckets["tail"])


def test_temperature_fractions_rebalance(spark):
    from corpusama_spark.operators.curation import (
        stratified_sample,
        temperature_fractions,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    # T=1 is the natural mix: every stratum keeps 100%
    assert temperature_fractions(df, "stratum", temperature=1.0) == {
        "big": 1.0,
        "small": 1.0,
    }
    # T=2 down-samples the majority: rare stratum keeps all, big keeps
    # sqrt(900)/sqrt(100) * (100/900) = 1/3
    fr = temperature_fractions(df, "stratum", temperature=2.0)
    assert fr["small"] == 1.0
    assert abs(fr["big"] - 1 / 3) < 1e-9
    # target_rows: expected sample size ~hits the target
    fr2 = temperature_fractions(df, "stratum", temperature=2.0, target_rows=400)
    expected = fr2["big"] * 900 + fr2["small"] * 100
    assert abs(expected - 400) < 1e-6
    # and it composes with the sampler
    got = stratified_sample(df, "stratum", fr2, "id").count()
    assert abs(got - 400) < 80  # ~4 sigma


def test_temperature_fractions_waterfill_hits_target(spark):
    """When a stratum's fraction clamps at 1.0, its shortfall is
    redistributed so the expected sample still hits target_rows."""
    from corpusama_spark.operators.curation import temperature_fractions

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    # naive scaling would give small 2.0 (clamped) and undershoot by 100
    fr = temperature_fractions(df, "stratum", temperature=2.0, target_rows=800)
    assert fr["small"] == 1.0
    expected = fr["big"] * 900 + fr["small"] * 100
    assert abs(expected - 800) < 1e-9
    # target above the corpus: everything keeps 100%
    fr_all = temperature_fractions(df, "stratum", temperature=2.0, target_rows=5000)
    assert fr_all == {"big": 1.0, "small": 1.0}


def test_stratified_sample_null_key_dropped(spark):
    """NULL sampling keys must be dropped row-by-row (hash propagates
    NULL, like the SQL twin's ||), never kept as one all-or-nothing
    cohort sharing a constant hash."""
    from corpusama_spark.operators.curation import stratified_sample

    df = spark.createDataFrame(
        [(1, "a"), (None, "a"), (None, "a")], "id long, stratum string"
    )
    got = stratified_sample(df, "stratum", {"a": 1.0}, "id").collect()
    assert [r.id for r in got] == [1]


def test_drop_duplicated_lines_null_text(spark):
    from corpusama_spark.operators.curation import drop_duplicated_lines

    df = spark.createDataFrame(
        [(1, None), (2, "x\ny")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in drop_duplicated_lines(df, threshold=2).collect()}
    # NULL text = empty doc: counts are concrete longs, never NULL
    assert (out[1].text, out[1].n_kept, out[1].n_dropped) == ("", 1, 0)
    assert out[2].n_kept + out[2].n_dropped == 2


def test_semantic_dedup_releases_component_caches(spark):
    from corpusama_spark.operators.curation import semantic_dedup
    from corpusama_spark.plans.caching import release

    one = [1.0] * 48
    df = spark.createDataFrame(
        [(i, one) for i in range(4)], "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(df, tau=0.5, nbits=6, ntables=8)
    out.collect()
    handles = getattr(out, "_owned_caches", [])
    assert handles, "semantic_dedup must expose its persisted handles"
    release(out)
    assert getattr(out, "_owned_caches") == []


def test_pps_sample_weights_and_determinism(spark):
    from corpusama_spark.operators.curation import pps_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate([64, 256, 1024, 4096, 9000])],
        "doc_id long, n_chars long",
    )
    out = pps_sample(df, "doc_id", "n_chars", 1.0 / 1024.0)
    rows = {r.doc_id: r for r in out.collect()}
    # weight >= 1/rate => p capped at 1 => always kept, ht_weight == 1
    for i, w in [(2, 1024), (3, 4096), (4, 9000)]:
        assert i in rows and rows[i].ht_weight == 1.0
    # kept sub-certainty rows carry 1/p
    for i, w in [(0, 64), (1, 256)]:
        if i in rows:
            assert rows[i].ht_weight == round(1024.0 / w, 6)
    # decision is hash-deterministic: re-running yields identical rows
    again = {r.doc_id for r in pps_sample(
        df, "doc_id", "n_chars", 1.0 / 1024.0).collect()}
    assert set(rows) == again


def test_pps_sample_ht_estimator_unbiased_at_cap(spark):
    from corpusama_spark.operators.curation import pps_sample

    # all rows at/above the cap: the HT-weighted count equals the corpus
    df = spark.createDataFrame(
        [(i, 2048) for i in range(50)], "doc_id long, n_chars long"
    )
    out = pps_sample(df, "doc_id", "n_chars", 1.0 / 1024.0)
    got = out.agg(F.sum("ht_weight")).collect()[0][0]
    assert got == 50.0


def test_neighbor_score_stats_means_and_divergence(spark):
    from corpusama_spark.operators.curation import neighbor_score_stats

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "id_a long, id_b long"
    )
    scores = spark.createDataFrame(
        [(1, 10), (2, 40), (3, 100), (4, 7)], "id long, score long"
    )
    out = {r.id: r for r in neighbor_score_stats(pairs, scores).collect()}
    # node 4 has no edges -> absent (inner join on agg)
    assert 4 not in out
    assert out[1].nb_mean == 70.0 and out[1].n_nb == 2
    assert out[1].divergence == -60.0
    assert out[2].nb_mean == 55.0  # (10+100)/2
    assert out[3].nb_mean == 25.0  # (10+40)/2


def test_boilerplate_share_counts_hot_lines(spark):
    from corpusama_spark.operators.curation import boilerplate_share

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique alpha\nCOOKIE BANNER"),
            (2, "COOKIE BANNER\nunique beta"),
            (3, "unique gamma\nunique delta"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           boilerplate_share(docs, threshold=2).collect()}
    # "COOKIE BANNER" appears 3x corpus-wide (>=2) -> hot
    assert out[1].n_boiler == 2 and out[1].n_lines == 3
    assert out[1].boiler_share == round(2 / 3, 6)
    assert out[2].n_boiler == 1 and out[2].boiler_share == 0.5
    assert out[3].n_boiler == 0 and out[3].boiler_share == 0.0
    # null text coalesces to one empty line, not hot at threshold 2...
    # unless another doc also has an empty line; here it's unique
    assert out[4].n_lines == 1 and out[4].n_boiler == 0


def test_eb_shrunk_means_pulls_small_groups_to_global(spark):
    from corpusama_spark.operators.curation import eb_shrunk_means

    # tiny group with perfect scores vs big group with good scores
    rows = [("tiny", 100)] * 2 + [("big", 80)] * 200 + [("bad", 10)] * 50
    df = spark.createDataFrame(rows, "domain string, score long")
    out = {r.domain: r for r in
           eb_shrunk_means(df, "domain", "score", 20.0).collect()}
    g = (2 * 100 + 200 * 80 + 50 * 10) / 252  # global mean
    assert out["tiny"].raw_mean == 100.0
    # tiny shrinks most of the way to the global mean...
    assert abs(out["tiny"].shrunk_mean
               - round((200 + 20 * g) / 22, 6)) < 1e-9
    # ...and below big's shrunk mean despite the higher raw mean
    assert out["tiny"].shrunk_mean < out["big"].shrunk_mean
    assert out["big"].n_docs == 200


def test_cross_reuse_stats_counts_and_flag(spark):
    from corpusama_spark.operators.curation import cross_reuse_stats

    df = spark.createDataFrame(
        [("cap A", "s1"), ("cap A", "s2"), ("cap A", "s1"),
         ("cap B", "s1"), ("cap B", "s1"),
         ("cap C", "s9")],
        "cap string, src string",
    )
    out = {r.cap: r for r in
           cross_reuse_stats(df, "cap", "src", min_rows=2).collect()}
    assert "cap C" not in out  # below min_rows
    assert out["cap A"].n_rows == 3 and out["cap A"].n_distinct_vals == 2
    assert out["cap A"].reused is True
    assert out["cap B"].n_distinct_vals == 1 and out["cap B"].reused is False


def test_within_group_percentile_rank_arithmetic(spark):
    from corpusama_spark.operators.curation import within_group_percentile

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 20), ("a", 40), ("a", 50),
         ("b", 7)],
        "src string, score long",
    )
    out = within_group_percentile(df, "src", "score").collect()
    by = {}
    for r in out:
        by.setdefault((r.src, r.score), set()).add(r.pct)
    # (rank-1)/(n-1): ties share a rank; single-row group pins to 0
    assert by[("a", 10)] == {0.0}
    assert by[("a", 20)] == {0.25}
    assert by[("a", 40)] == {0.75}
    assert by[("a", 50)] == {1.0}
    assert by[("b", 7)] == {0.0}


def test_weighted_sample_topk_exact_k_and_determinism(spark):
    from corpusama_spark.operators.curation import weighted_sample_topk

    df = spark.createDataFrame(
        [(g, i, (i % 7) + 1) for g in ("a", "b") for i in range(30)],
        "src string, rid long, w long",
    )
    out = weighted_sample_topk(df, "src", "rid", "w", k=5).collect()
    per = {}
    for r in out:
        per.setdefault(r.src, []).append(r.rid)
    assert sorted(len(v) for v in per.values()) == [5, 5]
    # deterministic under repartition
    again = sorted((r.src, r.rid) for r in weighted_sample_topk(
        df.repartition(7), "src", "rid", "w", k=5).collect())
    assert sorted((r.src, r.rid) for r in out) == again
    # zero/negative weights can never win
    z = spark.createDataFrame([("a", 1, 0), ("a", 2, -3), ("a", 3, 10)],
                              "src string, rid long, w long")
    kept = weighted_sample_topk(z, "src", "rid", "w", k=5).collect()
    assert [r.rid for r in kept] == [3]


def test_weighted_sample_topk_weight_bias(spark):
    from corpusama_spark.operators.curation import weighted_sample_topk

    # one group, 200 rows: ids < 100 weight 1, ids >= 100 weight 50.
    # heavy rows should dominate the top-20 overwhelmingly.
    rows = [("g", i, 1 if i < 100 else 50) for i in range(200)]
    df = spark.createDataFrame(rows, "src string, rid long, w long")
    kept = weighted_sample_topk(df, "src", "rid", "w", k=20).collect()
    heavy = sum(1 for r in kept if r.rid >= 100)
    assert heavy >= 17  # P(light row beats heavy) is tiny at w-ratio 50


def test_chunk_windows_overlap_and_tail(spark):
    from corpusama_spark.operators.curation import chunk_windows

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "single"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_windows(df, size=4, overlap=2).collect()
    by = {}
    for r in out:
        by.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 0,2,4,6,8 -> 5 chunks; last is the 2-token tail
    c1 = sorted(by[1], key=lambda r: r.chunk_idx)
    assert [r.n_tokens for r in c1] == [4, 4, 4, 4, 2]
    assert c1[0].chunk_text == "w0 w1 w2 w3"
    assert c1[1].chunk_text == "w2 w3 w4 w5"  # 2-token overlap
    assert c1[4].chunk_text == "w8 w9"
    assert [r.chunk_idx for r in c1] == [0, 1, 2, 3, 4]
    # single-token doc -> one short chunk; empty/null docs -> no chunks
    assert by[2][0].chunk_text == "single" and by[2][0].n_tokens == 1
    assert 3 not in by and 4 not in by


def test_chunk_windows_rejects_bad_overlap(spark):
    import pytest
    from corpusama_spark.operators.curation import chunk_windows

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_windows(df, size=4, overlap=4)


def test_jaccard_threshold_sweep_monotone_and_exact(spark):
    """Sweep counts are non-increasing in threshold and match a direct
    per-threshold recount on a tiny corpus."""
    from corpusama_spark.operators.dedup import (
        exact_jaccard_pairs,
        jaccard_threshold_sweep,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),        # identical to 1 → jaccard 1.0
            (3, "a b c d e zzz"),      # near 1
            (4, "q r s t u v"),        # unrelated
        ],
        ["doc_id", "text"],
    )
    ths = [0.4, 0.8, 0.99]
    out = jaccard_threshold_sweep(docs, "text", "doc_id", ths).collect()
    assert [r["threshold"] for r in out] == ths
    np = [r["n_pairs"] for r in out]
    nd = [r["n_docs"] for r in out]
    assert np == sorted(np, reverse=True)
    assert nd == sorted(nd, reverse=True)
    for r in out:
        pairs = exact_jaccard_pairs(
            docs, "text", "doc_id", threshold=r["threshold"]
        ).collect()
        assert r["n_pairs"] == len(pairs)
        assert r["n_docs"] == len(
            {p["id_a"] for p in pairs} | {p["id_b"] for p in pairs}
        )
        assert r["n_corpus"] == 4


def test_dedup_burden_by_group_attribution(spark):
    """Duplicates attribute to the DUPLICATE row's group; null/empty text
    is excluded from dedup but counted."""
    from corpusama_spark.operators.dedup import dedup_burden_by_group

    docs = spark.createDataFrame(
        [
            (1, "same", "a"),
            (2, "same", "b"),   # dup of 1, charged to b
            (3, "same", "b"),   # dup of 1, charged to b
            (4, "uniq", "b"),
            (5, None, "a"),
            (6, "   ", "a"),    # whitespace-only → null-ish
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r["source"]: r
        for r in dedup_burden_by_group(
            docs, "text", "doc_id", "source"
        ).collect()
    }
    assert out["a"]["n_rows"] == 3
    assert out["a"]["n_null"] == 2
    assert out["a"]["n_dup"] == 0
    assert out["a"]["n_canonical"] == 1
    assert out["b"]["n_rows"] == 3
    assert out["b"]["n_dup"] == 2      # docs 2,3 duplicate doc 1 (group a)
    assert out["b"]["n_canonical"] == 1  # doc 4 only
    assert out["b"]["dup_share"] == round(2 / 3, 6)
