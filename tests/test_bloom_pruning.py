"""Bloom shard-pruning audit (X222): no false negatives at (key, shard)
granularity, python position mirror, saturation vs well-sized regimes."""

import hashlib


def _pos(key, i, n_bits):
    return int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:15], 16) % n_bits


def _df(spark, rows):
    return spark.createDataFrame(rows, "shard string, tok string")


def test_bloom_pruning_no_false_negatives_and_mirror(spark):
    from corpusama_spark.operators.bloom import (
        bloom_pruning_audit,
        bloom_shard_index,
    )

    rows = [
        ("s1", f"alpha{i}") for i in range(40)
    ] + [("s2", f"beta{i}") for i in range(40)] + [
        ("s1", "shared"),
        ("s2", "shared"),
        ("s3", "lonely"),
    ]
    df = _df(spark, rows)
    probes = spark.createDataFrame(
        [("shared",), ("lonely",), ("alpha3",), ("absent",)], "tok string"
    )
    out = {
        r.key: r
        for r in bloom_pruning_audit(
            df, probes, "shard", "tok", n_bits=4096, k=3
        ).collect()
    }
    # every shard that truly contains the key must be probed
    assert out["shared"].n_actual == 2 and out["shared"].n_probed >= 2
    assert out["lonely"].n_actual == 1 and out["lonely"].n_probed >= 1
    assert out["alpha3"].n_actual == 1 and out["alpha3"].n_probed >= 1
    assert out["absent"].n_actual == 0
    assert all(r.n_shards == 3 for r in out.values())
    # python mirror of the index bits for one shard
    idx = {
        (r.shard, r.idx): r.word
        for r in bloom_shard_index(df, "shard", "tok", 4096, 3).collect()
    }
    for i in range(3):
        p = _pos("lonely", i, 4096)
        assert (idx[("s3", p // 60)] >> (p % 60)) & 1 == 1


def test_bloom_pruning_sizing_regimes(spark):
    from corpusama_spark.operators.bloom import bloom_pruning_audit

    rows = [("s%d" % (i % 8), f"k{i}") for i in range(800)]
    df = _df(spark, rows)
    probes = spark.createDataFrame([(f"k{i}",) for i in range(10)], "tok string")
    # 64 bits for ~100 keys/shard: saturated -> probes touch every shard
    sat = bloom_pruning_audit(
        df, probes, "shard", "tok", n_bits=64, k=3
    ).collect()
    probed_share = sum(r.n_probed for r in sat) / sum(r.n_shards for r in sat)
    assert probed_share > 0.9  # saturated filter prunes ~nothing
    # 2^15 bits: comfortably sized -> most non-owning shards skipped
    big = bloom_pruning_audit(
        df, probes, "shard", "tok", n_bits=1 << 15, k=3
    ).collect()
    assert all(r.n_probed >= r.n_actual for r in big)
    fp = [r.false_probe_rate for r in big if r.false_probe_rate is not None]
    assert sum(fp) / len(fp) < 0.2
