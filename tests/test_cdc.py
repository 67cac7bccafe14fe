"""Content-defined chunking (X220): python boundary mirror, exact
reconstruction, insert-shift robustness vs fixed blocks, dedup stats."""

import hashlib


def _mirror_chunks(text, w=8, mask=32):
    L = len(text)
    if L == 0:
        return []
    cuts = [
        i
        for i in range(w, L)  # i in w..L-1, cut AFTER 1-based position i
        if int(hashlib.md5(text[i - w : i].encode()).hexdigest()[:8], 16)
        % mask
        == 0
    ]
    starts = [0] + cuts
    ends = cuts + [L]
    return [
        (j, s, e - s, hashlib.md5(text[s:e].encode()).hexdigest())
        for j, (s, e) in enumerate(zip(starts, ends))
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cdc_mirror_and_reconstruction(spark):
    from corpusama_spark.operators.dedup import cdc_chunks

    texts = [
        (0, "the quick brown fox jumps over the lazy dog " * 8),
        (1, "short"),
        (2, ""),
        (3, "abcdefgh"),  # exactly window length -> single chunk
    ]
    got = {}
    for r in cdc_chunks(_df(spark, texts), "doc_id", "text").collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_no, r.start, r.clen, r.chash)
        )
    for did, text in texts:
        exp = _mirror_chunks(text)
        assert sorted(got.get(did, [])) == exp, did
        # chunks tile the text exactly
        assert sum(c[2] for c in exp) == len(text)
        assert "".join(
            text[c[1] : c[1] + c[2]] for c in sorted(exp)
        ) == text


def test_cdc_insert_shift_robustness(spark):
    from corpusama_spark.operators.dedup import cdc_chunks

    base = (
        "data pipelines chunk documents by content so that a single "
        "insertion does not rewrite every block of the snapshot store. "
    ) * 10
    shifted = "INSERTED-PREFIX-" + base
    rows = cdc_chunks(
        _df(spark, [(0, base), (1, shifted)]), "doc_id", "text"
    ).collect()
    h0 = {r.chash for r in rows if r.doc_id == 0}
    h1 = {r.chash for r in rows if r.doc_id == 1}
    shared = len(h0 & h1)
    # CDC: everything after the first content boundary re-aligns
    assert shared >= len(h0) - 2 and len(h0) > 5
    # fixed-size 32-char blocks lose ALL alignment after the insert
    fixed0 = {
        hashlib.md5(base[i : i + 32].encode()).hexdigest()
        for i in range(0, len(base), 32)
    }
    fixed1 = {
        hashlib.md5(shifted[i : i + 32].encode()).hexdigest()
        for i in range(0, len(shifted), 32)
    }
    assert len(fixed0 & fixed1) <= 1


def test_cdc_dedup_stats(spark):
    from corpusama_spark.operators.dedup import cdc_dedup_stats

    a = "every byte of this exact document appears twice in the corpus " * 6
    b = "completely different content lives here with other words " * 6
    out = {
        r.doc_id: r
        for r in cdc_dedup_stats(
            _df(spark, [(0, a), (1, a), (2, b)]), "doc_id", "text"
        ).collect()
    }
    assert out[0].dup_char_share == 1.0 and out[1].dup_char_share == 1.0
    assert out[0].n_dup_chunks == out[0].n_chunks
    # b shares nothing with a; its only dups are its own repeated phrase
    assert out[2].n_chunks > 0
