"""Banded-Hamming recall audit (X227): pigeonhole regime recall = 1.0
exactly, incomplete regime loses pairs, python mirror."""

import hashlib
import itertools


def _code(i):
    return int(hashlib.md5(f"hr-{i}".encode()).hexdigest()[:15], 16)


def _pop(n=120):
    pop = {}
    for i in range(n):
        c = _code(i)
        pop[i] = c
        nf = (i % 7) + 1
        mask = 0
        for j in range(1, nf + 1):
            mask |= 1 << ((7 * i + 11 * j) % 60)
        pop[1000 + i] = c ^ mask
    return pop


def _mirror(pop, bands=4, k=7):
    ids = sorted(pop)
    truth = {}
    caught = {}
    for a, b in itertools.combinations(ids, 2):
        d = bin(pop[a] ^ pop[b]).count("1")
        if d > k:
            continue
        truth[d] = truth.get(d, 0) + 1
        shared = any(
            (pop[a] >> (t * 16)) & 0xFFFF == (pop[b] >> (t * 16)) & 0xFFFF
            for t in range(bands)
        )
        if shared:
            caught[d] = caught.get(d, 0) + 1
    return {
        d: (d < bands, truth[d], caught.get(d, 0),
            round(caught.get(d, 0) / truth[d], 6))
        for d in truth
    }


def test_hamming_band_recall(spark):
    from corpusama_spark.operators.dedup import hamming_band_recall

    pop = _pop()
    df = spark.createDataFrame(
        [(int(i), int(c)) for i, c in sorted(pop.items())],
        "id long, code long",
    )
    rows = {
        r.hamming: (r.guaranteed, r.n_true, r.n_caught, r.recall)
        for r in hamming_band_recall(df, bands=4, hamming_k=7).collect()
    }
    assert rows == _mirror(pop)
    # pigeonhole: every guaranteed distance is perfectly recalled
    for d, (g, _, _, rec) in rows.items():
        if g:
            assert rec == 1.0, d
    # the incomplete regime genuinely loses pairs on this population
    lost = [rec for d, (g, _, _, rec) in rows.items() if not g]
    assert lost and min(lost) < 1.0
