"""Operator library: flatten/doc-tag, dedup family, similarity, textstats."""

import xml.sax.saxutils

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from corpusama_spark.operators import dedup as D
from corpusama_spark.operators import flatten as FL
from corpusama_spark.operators import similarity as SIM
from corpusama_spark.operators import textstats as TS


def test_flatten_nested(spark):
    df = spark.createDataFrame(
        [
            Row(
                id=1,
                date=Row(changed="2023-01-02", original="2022-05-06"),
                country=[
                    Row(name="A", iso3="AAA"),
                    Row(name="B", iso3="BBB"),
                ],
            )
        ]
    )
    flat = FL.flatten_columns(df)
    assert set(flat.columns) == {
        "id",
        "date__changed",
        "date__original",
        "country__name",
        "country__iso3",
    }
    row = flat.collect()[0]
    assert row.country__name == ["A", "B"]
    yeared = FL.add_year_columns(flat)
    r = yeared.collect()[0]
    assert r.date__changed__year == "2023" and r.date__original__year == "2022"
    joined = FL.join_multivalues(yeared)
    r2 = joined.collect()[0]
    assert r2.country__name == "A|B"


def test_multivalue_guard_and_empty(spark):
    df = spark.createDataFrame(
        [Row(id=1, vals=["a|b", "c", None]), Row(id=2, vals=[None]), Row(id=3, vals=[])]
    )
    out = {r.id: r.vals for r in FL.join_multivalues(df).collect()}
    assert out[1] == "a%7Cb|c"
    assert out[2] is None and out[3] is None


@pytest.mark.parametrize(
    "val",
    ["plain", 'has "dq"', "has 'sq'", "has \"both\" and 'sq'", "a&b<c>d", "  pad  "],
)
def test_xml_quoteattr_parity(spark, val):
    df = spark.createDataFrame([Row(s=val)])
    got = df.select(FL.xml_quoteattr_col(F.col("s")).alias("q")).collect()[0].q
    assert got == xml.sax.saxutils.quoteattr(val.strip())


def test_doc_tag(spark):
    df = spark.createDataFrame(
        [(2, "hello", "a|b|c", None)],
        "id int, disaster string, multi string, skip string",
    )
    tag = FL.doc_tag_col(
        F.col("id"),
        {"disaster__a__1": F.col("disaster"), "multi": F.col("multi"), "skip": F.col("skip")},
    )
    got = df.select(tag.alias("t")).collect()[0].t
    # golden shape from the reference's own test expectation
    # (test/test_corpus/test_attribute.py:28-42)
    assert got == '<doc id="2" file_id="FILE_ID" disaster__a__1="hello" multi="a|b|c" >'


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup
    (3, "completely different text about humanitarian aid"),
    (4, "another unrelated sentence mentioning water supplies"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_exact_dedup(spark, docs_df):
    out = D.exact_dedup(docs_df, "text", "doc_id").collect()
    assert len(out) == 4
    by_canon = {r.canonical_id: r.n_dupes for r in out}
    assert by_canon[0] == 2


def test_minhash_lsh_finds_near_dup(spark, docs_df):
    # bands=16 (1 hash per band): the 0<->2 pair's shingle Jaccard is 0.4,
    # so per-band collision P=0.4 — 16 single-hash bands make the near tier
    # robust to the hash family instead of a 2-hash-band coin flip
    pairs = D.minhash_lsh_pairs(docs_df, "text", "doc_id", num_hashes=16, bands=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup always collides
    assert (0, 2) in got or (1, 2) in got  # near dup collides in some band
    assert (0, 3) not in got and (3, 4) not in got
    verified = D.jaccard_pairs(docs_df, "text", "doc_id", pairs).collect()
    jac = {(r.id_a, r.id_b): r.jaccard for r in verified}
    assert jac[(0, 1)] == 1.0
    for (a, b), j in jac.items():
        assert 0.0 <= j <= 1.0


def test_simhash_dedup(spark, docs_df):
    out = D.simhash_dedup(docs_df, "text", "doc_id").collect()
    groups = {r.canonical_id: r.n_dupes for r in out}
    assert groups[0] == 2  # identical texts share simhash
    sh = docs_df.select(D.simhash_bits("text").alias("s")).collect()
    near = [r.s for r in sh]
    ham_01 = sum(a != b for a, b in zip(near[0], near[2]))
    ham_03 = sum(a != b for a, b in zip(near[0], near[3]))
    assert ham_01 < ham_03  # near-dup closer than unrelated


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_brute_force_topk(spark, emb_df):
    corpus = emb_df.limit(300)
    queries = emb_df.where("vec_id < 3")
    out = SIM.brute_force_topk(corpus, queries, k=5).collect()
    assert len(out) == 15
    for r in out:
        assert -1.0 <= r.cos_sim <= 1.0
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cos_sim))
    for q, rows in by_q.items():
        rows.sort()
        sims = [s for _, s in rows]
        assert sims == sorted(sims, reverse=True)


def test_ann_vs_brute_force_recall(spark, emb_df):
    corpus = emb_df.limit(500)
    queries = emb_df.where("vec_id < 10")
    exact = SIM.brute_force_topk(corpus, queries, k=3).collect()
    approx = SIM.ann_topk(corpus, queries, k=3, nplanes=4, ntables=8).collect()
    exact_pairs = {(r.query_id, r.cand_id) for r in exact}
    approx_pairs = {(r.query_id, r.cand_id) for r in approx}
    # LSH with few planes on clustered synthetic data: some overlap expected
    assert len(approx_pairs) > 0
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall > 0.4, recall


def test_langid_sql_and_quality(spark):
    rows = [
        (1, "the supplies and the team went to the north", "en"),
        (2, "la distribution de les vivres est en cours", "fr"),
        (3, "el acceso de los equipos en la zona es limitado", "es"),
        (4, "zzz qqq xxx", "unknown"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, want string")
    got = df.select("want", TS.langid_sql(F.col("text")).alias("got")).collect()
    for r in got:
        assert r.got == r.want, r
    q = df.select(TS.quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in q)
    assert q[0].q > q[3].q


def test_char_quartiles_nearest(spark):
    import numpy as np

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r.source: (r.q0, r.q1, r.q2, r.q3, r.q4)
        for r in TS.char_quartiles_nearest(
            df, "source", F.length("text")
        ).collect()
    }
    pdf = df.select("source", F.length("text").alias("n")).toPandas()
    for src, grp in pdf.groupby("source"):
        want = tuple(
            int(x)
            for x in np.quantile(
                sorted(grp["n"]), [0, 0.25, 0.5, 0.75, 1], method="nearest"
            )
        )
        assert got[src] == want, (src, got[src], want)


def test_export_gzip_roundtrip(spark, tmp_path):
    # S11: compressed text export/ingest via Hadoop codecs (the reference's
    # xz path, base_pipeline.py:278-292, with Spark-native gzip here)
    from corpusama_spark.operators.export import write_batched_text

    path = str(tmp_path / "txt_gz")
    df = spark.createDataFrame([(f"doc {i}",) for i in range(50)], ["t"])
    write_batched_text(df, "t", path, docs_per_file=20, compression="gzip")
    import glob

    assert glob.glob(path + "/*.txt.gz")
    back = spark.read.text(path)
    assert back.count() == 50
    assert sorted(r.value for r in back.collect())[0] == "doc 0"


def test_minhash_signature_vectorized_parity(spark, docs_df):
    # the numpy signature kernel must reproduce the Column-expression math
    from corpusama_spark.operators.dedup import (
        MERSENNE,
        minhash_signatures,
        minhash_signature,
        shingles,
    )

    expr = {
        r.id: list(r.sig)
        for r in docs_df.select(
            F.col("doc_id").alias("id"),
            minhash_signature(shingles("text", 3), 16).alias("sig"),
        ).collect()
    }
    vec = {
        r.id: list(r.sig)
        for r in minhash_signatures(
            docs_df, "text", "doc_id", 16, shingle_kernel="string"
        ).collect()
    }
    assert expr == vec


def test_simhash_vectorized_parity(spark):
    from corpusama_spark.operators.dedup import simhash_bits, simhash_vectorized

    # includes NULL and empty text: both paths must agree (NULL -> NULL hash,
    # empty -> all-zero hash), per the Column version's null propagation
    rows = [(i, t) for i, (_, t) in enumerate(DOCS)] + [(90, None), (91, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = {
        r.id: r.sh
        for r in df.select(
            F.col("doc_id").alias("id"), simhash_bits("text").alias("sh")
        ).collect()
    }
    vec = {
        r.doc_id: r.simhash
        for r in simhash_vectorized(df, "text", "doc_id").collect()
    }
    assert expr == vec
    assert vec[90] is None and vec[91] == "0" * 64


def test_simhash_codes_int_matches_bits(spark, docs_df):
    from corpusama_spark.operators.dedup import simhash_codes

    for r in simhash_codes(docs_df, "text", "doc_id").collect():
        # bit i of the string == bit i of the int64 (packed bit-0-first)
        want = sum(1 << i for i, c in enumerate(r.simhash) if c == "1")
        assert r.sim & 0xFFFFFFFFFFFFFFFF == want


def test_simhash_near_dups_complete_for_small_hamming(spark):
    """Banding must find EVERY pair with hamming <= bands-1 (pigeonhole):
    compare against a brute-force O(n^2) scan of the codes, including a
    1-bit-style perturbation (one token swapped) and an exact copy."""
    from corpusama_spark.operators.dedup import simhash_codes, simhash_near_dups

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    copies = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    perturbed = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+", "xqzyv").alias("text"),
    )
    src = docs.unionByName(copies).unionByName(perturbed)
    k = 3  # <= bands-1: banding is lossless here
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dups(src, "text", "doc_id", bands=4, hamming_k=k)
        .collect()
    }
    codes = {r.doc_id: r.sim for r in simhash_codes(src, "text", "doc_id").collect()}
    ids = sorted(codes)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((codes[a] ^ codes[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if h <= k:
                want[(a, b)] = h
    assert got == want
    # the exact copies are guaranteed present (hamming 0)
    assert any(h == 0 for h in got.values())


def test_simhash_near_dups_flood_guard(spark):
    """A degenerate value flooding one bucket must not go quadratic when
    max_bucket is set; unaffected pairs still surface."""
    from corpusama_spark.operators.dedup import simhash_near_dups

    flood = [(i, "same boilerplate text repeated") for i in range(60)]
    distinct = [(100, "alpha beta gamma delta"), (101, "alpha beta gamma delta")]
    df = spark.createDataFrame(flood + distinct, "doc_id long, text string")
    guarded = simhash_near_dups(
        df, "text", "doc_id", hamming_k=3, max_bucket=10
    ).collect()
    got = {(r.id_a, r.id_b) for r in guarded}
    assert (100, 101) in got  # small bucket unaffected
    assert not any(a < 60 and b < 60 for a, b in got)  # flood bucket dropped
    unguarded = simhash_near_dups(df, "text", "doc_id", hamming_k=3).collect()
    assert len(unguarded) == 60 * 59 // 2 + 1


def test_embedding_near_dups_flood_guard(spark):
    """One degenerate embedding bucket (identical vectors) is capped by
    max_bucket instead of exploding into O(b^2) pairs."""
    import pandas as pd

    from corpusama_spark.operators.similarity import embedding_near_dups

    vec = [1.0] + [0.0] * 63
    other = [0.0] * 32 + [1.0] + [0.0] * 31
    rows = [(i, vec) for i in range(50)] + [(100, other), (101, other)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    guarded = embedding_near_dups(df, threshold=0.99, max_bucket=10).collect()
    got = {(r.id_a, r.id_b) for r in guarded}
    assert (100, 101) in got
    assert not any(a < 50 and b < 50 for a, b in got)
    unguarded = embedding_near_dups(df, threshold=0.99, max_bucket=None).collect()
    assert len(unguarded) == 50 * 49 // 2 + 1


def test_lsh_operators_release_their_caches(spark, docs_df):
    from corpusama_spark.operators.dedup import minhash_lsh_pairs, simhash_near_dups
    from corpusama_spark.plans.caching import release

    for result in (
        minhash_lsh_pairs(docs_df, "text", "doc_id", num_hashes=16, bands=8),
        simhash_near_dups(docs_df, "text", "doc_id"),
    ):
        result.collect()
        handles = getattr(result, "_owned_caches")
        assert handles and all(h.storageLevel.useMemory for h in handles)
        release(result)
        assert not any(h.storageLevel.useMemory for h in handles)


def test_ivf_topk_recall_vs_brute_force(spark, emb_df):
    corpus = emb_df.limit(500)
    queries = emb_df.where("vec_id < 10")
    exact = SIM.brute_force_topk(corpus, queries, k=3).collect()
    approx = SIM.ivf_topk(corpus, queries, k=3, n_centroids=8, nprobe=3).collect()
    exact_pairs = {(r.query_id, r.cand_id) for r in exact}
    approx_pairs = {(r.query_id, r.cand_id) for r in approx}
    assert len(approx_pairs) > 0
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall > 0.5, recall
    # determinism: same centroids, same results
    again = SIM.ivf_topk(corpus, queries, k=3, n_centroids=8, nprobe=3).collect()
    assert {(r.query_id, r.cand_id) for r in again} == approx_pairs


def test_ivf_full_probe_equals_brute_force(spark, emb_df):
    """Probing ALL centroid lists makes IVF exact — the correctness anchor."""
    corpus = emb_df.limit(200)
    queries = emb_df.where("vec_id < 5")
    exact = {
        (r.query_id, r.cand_id)
        for r in SIM.brute_force_topk(corpus, queries, k=4).collect()
    }
    full = {
        (r.query_id, r.cand_id)
        for r in SIM.ivf_topk(
            corpus, queries, k=4, n_centroids=4, nprobe=4
        ).collect()
    }
    assert full == exact


def test_quantize_roundtrip_bounds(spark, emb_df):
    import numpy as np

    from corpusama_spark.operators.similarity import dequantize, quantize_int8

    df = emb_df.limit(100).select(
        "vec_id",
        F.col("embedding").alias("e"),
        dequantize(quantize_int8(F.col("embedding"))).alias("rt"),
    )
    for r in df.collect():
        orig = np.array(r.e, dtype=np.float64)
        rt = np.array(r.rt, dtype=np.float64)
        absmax = np.abs(orig).max()
        if absmax == 0:
            assert np.array_equal(orig, rt)
            continue
        # symmetric int8: error bounded by half a quantization step
        assert np.abs(orig - rt).max() <= absmax / 127.0 * 0.5 + 1e-6
    # cosine ranking survives quantization closely
    a = np.array(df.collect()[0].e); b = np.array(df.collect()[0].rt)
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999


def test_l2_normalize(spark):
    import pandas as pd

    from corpusama_spark.operators.similarity import l2_normalize, l2norm

    df = spark.createDataFrame(
        pd.DataFrame({"v": [[3.0, 4.0], [0.0, 0.0]]})
    )
    out = df.select(
        l2_normalize(F.col("v")).alias("n"),
        l2norm(l2_normalize(F.col("v"))).alias("len"),
    ).collect()
    assert out[0].n == [0.6, 0.8] and abs(out[0].len - 1.0) < 1e-12
    assert out[1].n == [0.0, 0.0]  # zero vector passes through


def test_infer_dim_and_non64_dim(spark):
    """ann/near-dup/IVF entry points must work at any embedding width —
    round 2 hardcoded dim=64 in ann_topk, which would project 16-wide
    vectors with 64-wide planes."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 16))
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16)  # a near-dup pair
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(60), "embedding": [v.tolist() for v in vecs]}
        )
    )
    assert SIM.infer_dim(df) == 16
    queries = df.where("vec_id < 4")
    approx = SIM.ann_topk(df, queries, k=3, nplanes=4, ntables=8).collect()
    assert approx and all(r.cand_id != r.query_id for r in approx)
    exact = SIM.brute_force_topk(df, queries, k=3).collect()
    overlap = {(r.query_id, r.cand_id) for r in approx} & {
        (r.query_id, r.cand_id) for r in exact
    }
    assert overlap  # LSH at dim 16 still finds true neighbors
    near = SIM.embedding_near_dups(df, threshold=0.95, max_bucket=None).collect()
    assert (0, 1) in {(r.id_a, r.id_b) for r in near}
    ivf = SIM.ivf_topk(df, queries, k=3, n_centroids=4, nprobe=4).collect()
    ivf_pairs = {(r.query_id, r.cand_id) for r in ivf}
    assert {(r.query_id, r.cand_id) for r in exact} == ivf_pairs  # full probe


def test_training_sample_prefilter_plan_and_determinism(spark, emb_df):
    """The quantizer-training scan must carry the content-hash pre-filter
    below the TakeOrderedAndProject (round-2 'What's wrong' #1), and
    centroids must stay deterministic across partitionings."""
    import numpy as np

    plan = SIM.training_sample_plan(
        emb_df, sample=64, prefilter_mod=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "pmod" in plan and "xxhash64" in plan
    # the filter reduces the rank's input (500 vectors -> ~125)
    n_filtered = SIM.training_sample_plan(
        emb_df, sample=10**6, prefilter_mod=4
    ).count()
    n_all = emb_df.count()
    assert 0 < n_filtered < n_all * 0.6
    c1 = SIM.train_centroids(emb_df, k=4, sample=64, prefilter_mod=4)
    c2 = SIM.train_centroids(
        emb_df.repartition(13), k=4, sample=64, prefilter_mod=4
    )
    assert np.array_equal(c1, c2)
    # starved pre-filter (mod >> corpus) falls back deterministically
    c3 = SIM.train_centroids(emb_df, k=4, sample=64, prefilter_mod=10**9)
    c4 = SIM.train_centroids(emb_df, k=4, sample=64, prefilter_mod=None)
    assert np.array_equal(c3, c4)


def test_axis_lsh_recall_and_exactness(spark, emb_df):
    """axis_sign_buckets is comparison-only (no float arithmetic), so the
    candidate set is reproducible from raw component signs; ann_recall
    emits one row per brute query even when the ANN side found nothing."""
    corpus = emb_df.limit(400)
    queries = emb_df.where("vec_id < 6")
    ann = SIM.axis_lsh_topk(corpus, queries, k=5, nbits=6, ntables=8)
    brute = SIM.brute_force_topk(corpus, queries, k=5)
    rec = SIM.ann_recall(ann, brute, k=5).collect()
    assert len(rec) == 6
    assert all(0.0 <= r.recall_at_5 <= 1.0 for r in rec)
    assert all(r.n_hit == round(r.recall_at_5 * 5) for r in rec)
    # bucket keys match a python recomputation of the sign bits
    rows = corpus.limit(20).select(
        "vec_id",
        "embedding",
        SIM.axis_sign_buckets(F.col("embedding"), 6, 8).alias("keys"),
    ).collect()
    for r in rows:
        for t in range(8):
            want = f"{t}:" + "".join(
                "1" if r.embedding[t * 6 + b] > 0 else "0" for b in range(6)
            )
            assert r.keys[t] == want


def test_ivf_injected_onehot_centroids_engine_exact(spark, emb_df):
    """ivf_recall's quantizer trick: with one-hot centroids scaled by 2.0
    the assignment score is 4 - 4*x_j (every float op exact — powers of
    two), so list membership reduces to comparing raw embedding components,
    which any engine reproduces bit-exactly. Verifies the Spark candidate
    set against a pure-python recomputation, and that argsort ties resolve
    to the lowest index (kind='stable' — DuckDB list_position semantics)."""
    import numpy as np

    K, nprobe = 8, 3
    cents = np.zeros((K, 64), dtype=np.float64)
    cents[np.arange(K), np.arange(K)] = 2.0
    corpus = emb_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = corpus.where("vec_id < 6")
    ivf = SIM.ivf_topk(
        corpus, queries, k=5, n_centroids=K, nprobe=nprobe, centroids=cents
    )
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in corpus.collect()
    }

    def probes(v, n):
        return np.argsort(-v[:K], kind="stable")[:n].tolist()

    lists = {i: probes(v, 1)[0] for i, v in emb.items()}
    got = ivf.collect()
    assert got
    for r in got:
        assert lists[r.cand_id] in probes(emb[r.query_id], nprobe)
    # ties -> lowest list index, matching a first-occurrence argmax
    tie = spark.createDataFrame(
        pd.DataFrame({"vec_id": [999], "embedding": [[0.5] * 64]})
    )
    assign = SIM._assign_udf(cents, nprobe)
    probed = tie.select(assign(F.col("embedding")).alias("p")).collect()[0].p
    assert probed == [0, 1, 2]


def test_ivf_over_quantized_embeddings(spark, emb_df):
    """X9 + X11 composed: ANN search over the int8-quantized embedding
    table (the 4x-smaller storage form at 10^12 rows) — full-probe IVF over
    dequantized vectors recovers nearly the same neighbors as over raw."""
    from corpusama_spark.operators.similarity import dequantize, quantize_int8

    corpus = emb_df.limit(300)
    queries = emb_df.where("vec_id < 6")
    raw = {
        (r.query_id, r.cand_id)
        for r in SIM.ivf_topk(
            corpus, queries, k=3, n_centroids=4, nprobe=4
        ).collect()
    }
    dq = lambda df: df.select(  # noqa: E731
        "vec_id", dequantize(quantize_int8(F.col("embedding"))).alias("embedding")
    )
    quant = {
        (r.query_id, r.cand_id)
        for r in SIM.ivf_topk(
            dq(corpus), dq(queries), k=3, n_centroids=4, nprobe=4
        ).collect()
    }
    # half-step-bounded quantization error barely perturbs cosine ranking
    assert len(raw & quant) / len(raw) >= 0.8, (raw - quant, quant - raw)


def test_axis_lsh_rejects_narrow_vectors(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(10),
                "embedding": [rng.standard_normal(16).tolist() for _ in range(10)],
            }
        )
    )
    with pytest.raises(ValueError, match="nbits"):
        SIM.axis_lsh_topk(df, df.where("vec_id < 2"), nbits=6, ntables=8)


def test_minhash_tokenhash_kernel_pinned_and_equivalent(spark, docs_df):
    """The tokenhash shingle kernel (r3 fast path): (a) signatures match a
    pure-python reimplementation of its definition — JVM token xxhash64,
    odd-constant uint64 combine, affine permutations; (b) it finds the
    same near-dup pairs as the string kernel on a copy fixture; (c) it is
    deterministic across partitionings."""
    import numpy as np

    from corpusama_spark.operators.dedup import (
        MERSENNE,
        _combine_consts,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    sample = docs_df.limit(40)
    # (a) python pin: recompute from JVM token hashes
    toks_hashed = {
        r.id: list(r.th)
        for r in sample.selectExpr(
            "doc_id as id",
            "transform(filter(split(lower(trim(text)), '\\\\s+'),"
            " t -> length(t) > 0), x -> abs(xxhash64(x)) % 2147483647) as th",
        ).collect()
    }
    consts = _combine_consts(3)
    want = {}
    for i, hs in toks_hashed.items():
        hs = np.array(hs, dtype=np.uint64)
        if len(hs) == 0:
            want[i] = [None] * 16
            continue
        if len(hs) >= 3:
            g = np.zeros(len(hs) - 2, dtype=np.uint64)
            for p in range(3):
                g += hs[p : len(hs) - 2 + p] * consts[p]
        else:
            g = np.array([(hs * consts[: len(hs)]).sum(dtype=np.uint64)])
        g = (g % np.uint64(MERSENNE)).astype(np.int64)
        want[i] = [
            int(
                min(
                    (int(x) * (2 * k + 1) + 1_000_003 * (k + 1)) % MERSENNE
                    for x in g
                )
            )
            for k in range(16)
        ]
    got = {
        r.id: list(r.sig)
        for r in minhash_signatures(sample, "text", "doc_id", 16).collect()
    }
    assert got == want
    # (b) same candidate pairs as the string kernel on an exact-copy tier
    copies = docs_df.limit(30).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    src = docs_df.limit(30).select("doc_id", "text").unionByName(copies)
    p_tok = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(src, "text", "doc_id", 16, bands=8).collect()
    }
    # copies must collide in every band under ANY hash family
    base_ids = [r.doc_id for r in docs_df.limit(30).select("doc_id").collect()]
    for i in base_ids:
        assert (i, i + 100000) in p_tok
    # (c) determinism across partitioning
    g1 = sorted(
        tuple(r.sig)
        for r in minhash_signatures(sample, "text", "doc_id", 16).collect()
    )
    g2 = sorted(
        tuple(r.sig)
        for r in minhash_signatures(
            sample.repartition(7), "text", "doc_id", 16
        ).collect()
    )
    assert g1 == g2


def test_repeated_spans_cross_doc_regions(spark):
    """Shared boilerplate across >=min_docs docs is flagged as one merged
    span per doc covering (at least) the shared region; docs without
    cross-doc repetition, NULL and empty docs emit nothing; below the
    min_docs threshold nothing is flagged."""
    from corpusama_spark.operators.dedup import repeated_spans

    boiler = "subscribe to our newsletter for daily updates"
    rows = [
        (0, f"alpha opening words {boiler} and an alpha tail"),
        (1, f"completely different start {boiler} different ending here"),
        (2, f"third document too {boiler} closing remarks"),
        (3, "nothing shared with anything else in this one"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = repeated_spans(df, "text", "doc_id", k=5, window=4, min_docs=3)
    spans = {}
    for r in out.collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert set(spans) == {0, 1, 2}
    texts = dict(rows)
    for d in (0, 1, 2):
        assert len(spans[d]) == 1  # contiguous shared region merges
        a, b = spans[d][0]
        covered = texts[d].lower()[a - 1 : b - 1]
        assert boiler in covered  # guaranteed: len(boiler) >= k + window - 1
        # and the span does not leak far beyond the repeat (< k+window slack
        # on each side from partial-window gram sharing)
        assert len(covered) < len(boiler) + 2 * (5 + 4)
    # min_docs above the multiplicity: nothing flagged
    assert (
        repeated_spans(df, "text", "doc_id", k=5, window=4, min_docs=4).count()
        == 0
    )


def test_repeated_spans_merges_disjoint_islands(spark):
    """Two separate shared regions in one doc yield two spans, not one."""
    from corpusama_spark.operators.dedup import repeated_spans

    r1 = "this first shared boilerplate region here"
    r2 = "another totally separate repeated trailer block"
    rows = [
        (0, f"{r1} XqWzK unique middle gibberish JvPbN {r2}"),
        (1, f"{r1} completely other filler text goes here {r2}"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = repeated_spans(df, "text", "doc_id", k=5, window=4, min_docs=2)
    spans = {}
    for r in out.collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    # both regions found in both docs, as DISTINCT islands (the unique
    # middles keep them from merging); incidental single-gram repeats
    # ("other", "here ") may add small extra spans — that's correct output
    # winnow coverage is exact up to k+w-2 chars of edge slack per side
    core1, core2 = r1[10:-10], r2[10:-10]
    for d, text in rows:
        covered = [text.lower()[a - 1 : b - 1] for a, b in spans[d]]
        assert any(core1 in c for c in covered)
        assert any(core2 in c for c in covered)
        assert not any(core1 in c and core2 in c for c in covered)


def test_repeated_spans_no_row_python_and_deterministic(spark):
    from corpusama_spark.operators.dedup import repeated_spans
    from corpusama_spark.session import assert_no_row_python

    rows = [(i, f"common prefix shared by all docs tail-{i % 7}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = repeated_spans(df, "text", "doc_id", min_docs=2)
    assert_no_row_python(out)
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            repeated_spans(
                df.repartition(5), "text", "doc_id", min_docs=2
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_minhash_md5_family(spark, docs_df):
    """The portable-hash (oracle-checkable) configuration: md5 shingle
    hashes + md5 band keys. Exact dups always share every band; unrelated
    docs don't; unknown family raises."""
    pairs = D.minhash_lsh_pairs(
        docs_df, "text", "doc_id", num_hashes=16, bands=8, hash_family="md5"
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got
    assert (0, 3) not in got and (3, 4) not in got
    with pytest.raises(ValueError, match="hash_family"):
        D.minhash_signatures(
            docs_df, "text", "doc_id", hash_family="sha9000"
        ).collect()


def test_simhash_md5_family(spark, docs_df):
    """md5 (portable/oracle-checkable) simhash: exact copies are hamming-0
    pairs; codes use only the low 60 bits; unknown family raises."""
    copies = docs_df.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    src = docs_df.unionByName(copies)
    pairs = D.simhash_near_dups(
        src, "text", "doc_id", bands=4, hamming_k=3, hash_family="md5"
    )
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    for i in range(5):
        assert got[(i, i + 1000)] == 0
    codes = D.simhash_codes(docs_df, "text", "doc_id", hash_family="md5")
    for r in codes.collect():
        assert r.sim is not None and 0 <= r.sim < (1 << 60)
        assert r.simhash[60:] == "0000"
    with pytest.raises(ValueError, match="hash_family"):
        D.simhash_codes(docs_df, "text", "doc_id", hash_family="crc")


def test_in_batch_hard_negatives_semantics(spark):
    from corpusama_spark.operators.similarity import in_batch_hard_negatives

    # one batch (n_batches=1): anchors see every other-label row
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),   # same label as 0 -> never a negative for 0
        (2, [0.8, 0.2], 1),   # hardest negative for 0
        (3, [0.0, 1.0], 1),   # easy negative for 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = in_batch_hard_negatives(df, n_batches=1, k=1).collect()
    by_anchor = {r.anchor_id: r for r in out}
    assert by_anchor[0].neg_id == 2 and by_anchor[0].rnk == 1
    # anchor 1 (label 0) also picks 2 (closest other-label)
    assert by_anchor[1].neg_id == 2
    # no pair ever shares a label
    lbl = {r[0]: r[2] for r in rows}
    assert all(lbl[r.anchor_id] != lbl[r.neg_id] for r in out)


def test_in_batch_hard_negatives_batch_isolation(spark):
    from corpusama_spark.operators.similarity import in_batch_hard_negatives

    # ids 0 and 1 land in different batches with n_batches=2 -> no pairs
    rows = [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 1),
            (2, [0.5, 0.5], 1), (3, [0.5, 0.5], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = in_batch_hard_negatives(df, n_batches=2, k=5).collect()
    for r in out:
        assert r.anchor_id % 2 == r.neg_id % 2


def test_containment_catches_embedded_excerpt(spark):
    from corpusama_spark.operators.dedup import (
        containment_pairs,
        exact_jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta"
    page = ("intro words here " + quote +
            " plus a very long tail " + " ".join(f"w{i}" for i in range(40)))
    df = spark.createDataFrame(
        [(1, quote), (2, page), (3, "unrelated text entirely different")],
        "doc_id long, text string",
    )
    cont = containment_pairs(df, "text", "doc_id", threshold=0.9,
                             shingle_n=3, max_df=None).collect()
    # the quote is fully embedded: containment finds (1,2) at 1.0 ...
    assert [(r.id_a, r.id_b, r.cont_a_in_b) for r in cont] == [(1, 2, 1.0)]
    # ... while Jaccard at the same strictness misses it
    jac = exact_jaccard_pairs(df, "text", "doc_id", threshold=0.9,
                              shingle_n=3).collect()
    assert jac == []


def test_grouped_trend_recovers_known_line(spark):
    from pyspark.sql import functions as F
    from corpusama_spark.operators.trends import grouped_trend

    rows = [("up", float(x), 3.0 * x + 7.0) for x in range(50)]
    rows += [("flat", float(x), 5.0) for x in range(50)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in
           grouped_trend(df, "g", F.col("x"), F.col("y")).collect()}
    assert out["up"].slope == 3.0 and out["up"].intercept == 7.0
    assert out["up"].r2 == 1.0 and out["up"].n == 50
    assert out["flat"].slope == 0.0 and out["flat"].intercept == 5.0


def test_tfidf_pairs_shared_vocab_beats_shingles(spark):
    from corpusama_spark.operators.dedup import exact_jaccard_pairs
    from corpusama_spark.operators.similarity import tfidf_pairs

    # same vocabulary, reordered: zero shared 3-shingles, high tf-idf cos
    a = "quantum flux capacitor resonates with tachyon harmonics"
    b = "tachyon harmonics resonates quantum capacitor with flux"
    filler = [(i, f"doc {i} filler text about topic{i} entirely") for i in range(3, 9)]
    df = spark.createDataFrame(
        [(1, a), (2, b)] + filler, "doc_id long, text string"
    )
    hits = tfidf_pairs(df, "text", "doc_id", threshold=0.9, max_df=None).collect()
    assert [(r.id_a, r.id_b) for r in hits] == [(1, 2)]
    assert hits[0].tfidf_cos == 1.0  # identical bags -> exactly 1
    assert exact_jaccard_pairs(df, "text", "doc_id", threshold=0.9,
                               shingle_n=3).collect() == []


def test_tfidf_pairs_df_cap_drops_stopword_candidates(spark):
    from corpusama_spark.operators.similarity import tfidf_pairs

    # docs share ONLY the stop-word "the"; with a df cap below its df the
    # pair never becomes a candidate
    df = spark.createDataFrame(
        [(i, f"the unique{i} tokens{i}") for i in range(10)],
        "doc_id long, text string",
    )
    assert tfidf_pairs(df, "text", "doc_id", threshold=0.0, max_df=5).collect() == []


def test_flesch_reading_ease_counts(spark):
    from pyspark.sql import functions as F
    from corpusama_spark.operators.textstats import flesch_reading_ease

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"),
         (2, "word"),
         (3, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.s for r in df.select(
        "doc_id", flesch_reading_ease(F.col("text")).alias("s")).collect()}
    assert out[1].words == 6 and out[1].sentences == 2
    # "the cat sat the dog ran" -> vowel groups: e,a,a,e,o,a = 6
    assert out[1].syllables == 6
    assert out[1].flesch == round(206.835 - 1.015 * 3 - 84.6 * 1.0, 6)
    assert out[2].sentences == 1  # floored, no divide-by-zero
    assert out[3].words == 0 and out[3].flesch is None


def test_rate_anomaly_flags_spike_not_warmup(spark):
    from datetime import datetime
    from corpusama_spark.operators.trends import rate_anomaly

    rows = []
    for d in range(1, 9):
        n = 100 if d < 8 else 500  # flat week then a 5x spike
        rows += [(i, "ingest", datetime(2024, 1, d, i % 24)) for i in range(n)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r.day: r for r in rate_anomaly(ev, trailing=7, z_thresh=2.0).collect()}
    # warm-up days: vacuous stats, never alerts, NULL-free
    assert out["2024-01-01"].n_prior == 0 and out["2024-01-01"].anomaly is False
    assert out["2024-01-02"].z == 0.0  # single prior day: sd undefined
    # flat days in between: z == 0 exactly (all counts equal -> sd == 0)
    assert out["2024-01-05"].anomaly is False
    # the spike day: 7 prior flat days, huge z
    spike = out["2024-01-08"]
    assert spike.n_prior == 7 and spike.trail_mean == 100.0
    assert spike.anomaly is True


def test_dedup_cascade_stages_and_transitive_canonical(spark):
    from corpusama_spark.operators.dedup import dedup_cascade
    from pyspark.sql import functions as F

    # ids 1,2 byte-identical (content A); 3 unique content but phash-near 1;
    # 4 totally distinct. Codes: 1 and 3 differ in one bit.
    rows = [
        (1, "A", 0b1111000011110000),
        (2, "A", 0b1010101010101010),  # code irrelevant: exact-dup of 1
        (3, "B", 0b1111000011110001),
        (4, "C", 0b0000111100001111),
    ]
    df = spark.createDataFrame(rows, "id long, chash string, code long")
    out = {r.id: r for r in
           dedup_cascade(df, "chash", "id", "code",
                         bands=4, hamming_k=1).collect()}
    assert out[1].stage == "unique" and out[1].keep is True
    assert out[2].stage == "exact_dup" and out[2].canonical == 1
    assert out[3].stage == "near_dup" and out[3].canonical == 1
    assert out[4].stage == "unique" and out[4].keep is True
    # exactly one keeper per visual identity
    assert sum(r.keep for r in out.values()) == 2


def test_dedup_cascade_exact_dup_follows_merged_canonical(spark):
    from corpusama_spark.operators.dedup import dedup_cascade

    # 5 is an exact dup of 3; 3 near-merges into 1 -> 5's canonical is 1
    rows = [
        (1, "A", 0b11110000),
        (3, "B", 0b11110001),
        (5, "B", 0b00000000),
    ]
    df = spark.createDataFrame(rows, "id long, chash string, code long")
    out = {r.id: r for r in
           dedup_cascade(df, "chash", "id", "code",
                         bands=4, hamming_k=1).collect()}
    assert out[5].stage == "exact_dup" and out[5].canonical == 1
    assert out[3].canonical == 1 and not out[3].keep


def test_decayed_mean_prefers_recent(spark):
    import math
    from datetime import datetime
    from corpusama_spark.operators.trends import decayed_mean

    # old row value 0 (31 days before anchor), fresh row value 10 (1 day)
    df = spark.createDataFrame(
        [(1, "t", datetime(2024, 1, 1), 0.0),
         (2, "t", datetime(2024, 1, 31), 10.0)],
        "id long, event_type string, ts timestamp, value double",
    )
    r = decayed_mean(df, "event_type", "ts", "value",
                     half_life_days=7.0, anchor="2024-02-01").collect()[0]
    lam = math.log(2.0) / 7.0
    w_old, w_new = math.exp(-lam * 31), math.exp(-lam * 1)
    expected = (0.0 * w_old + 10.0 * w_new) / (w_old + w_new)
    assert r.plain_mean == 5.0
    assert abs(r.decayed_mean - round(expected, 6)) < 1e-9
    assert r.decayed_mean > 9.0  # the month-old zero barely counts


def test_decayed_mean_constant_value_invariant(spark):
    from datetime import datetime
    from corpusama_spark.operators.trends import decayed_mean

    df = spark.createDataFrame(
        [(i, "t", datetime(2024, 1, 1 + i), 3.5) for i in range(10)],
        "id long, event_type string, ts timestamp, value double",
    )
    r = decayed_mean(df, "event_type", "ts", "value").collect()[0]
    assert r.plain_mean == 3.5 and r.decayed_mean == 3.5
