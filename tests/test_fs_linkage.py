"""Fellegi-Sunter EM record linkage (X207)."""

import numpy as np


def _docs(spark):
    base = [
        (i, f"rec{i} number {i} alpha bravo charlie delta echo {i * 7}")
        for i in range(40)
    ]
    copies = [(i + 1000, t) for i, t in base]  # exact duplicates
    pert = [
        (i + 2000, "zzz" + t.split(" ", 1)[1].join([" ", ""]).rstrip())
        for i, t in base
    ]
    # perturbed: replace first word, keep the rest
    pert = [(i + 2000, "zzz " + t.split(" ", 1)[1]) for i, t in base]
    return spark.createDataFrame(
        base + copies + pert, "doc_id long, text string"
    )


def _pairs(spark):
    rows = []
    for i in range(40):
        rows.append((i, i + 1000))        # true match, identical
        rows.append((i, i + 2000))        # true match, perturbed
        rows.append((i, (i + 7) % 40 + 1000))  # decoy: different record
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_agreement_patterns_fields(spark):
    from corpusama_spark.operators.fuzzy import agreement_patterns

    ap = {
        (r.id_a, r.id_b): (r.g1, r.g2, r.g3)
        for r in agreement_patterns(_pairs(spark), _docs(spark)).collect()
    }
    assert ap[(0, 1000)] == (1, 1, 1)       # identical
    g1, g2, g3 = ap[(0, 2000)]
    assert (g2, g3) == (1, 0) and g1 == 1   # perturbed first word
    assert ap[(0, 1007)][0] == 0            # decoy: low jaccard


def test_fs_em_separates_matches_from_decoys(spark):
    from corpusama_spark.operators.fuzzy import (
        fs_em_weights,
        fs_linkage_table,
        agreement_patterns,
    )

    docs, pairs = _docs(spark), _pairs(spark)
    p, m, u = fs_em_weights(agreement_patterns(pairs, docs), iters=10)
    # decoys agree on 2 of 3 fields, so prevalence is pulled below the
    # true 2/3 — what matters is the jaccard field separating classes
    assert 0.2 < p < 0.9
    assert m[0] > 0.9 > u[0]      # jaccard field is discriminative
    out = {
        (r.g1, r.g2, r.g3): r
        for r in fs_linkage_table(pairs, docs, iters=10).collect()
    }
    assert out[(1, 1, 1)].decision == "link"
    assert out[(1, 1, 1)].w_match > 0.99
    full = sorted(out.values(), key=lambda r: -r.weight)
    assert full[0].weight > full[-1].weight
    # decoy-dominated patterns land at non_link
    worst = full[-1]
    assert worst.g1 == 0 and worst.decision == "non_link"
    assert worst.w_match < 0.05
    # pattern counts cover all pairs
    assert sum(r.n for r in out.values()) == 120
