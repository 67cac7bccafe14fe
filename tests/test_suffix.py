"""Exact duplicate-substring spans via suffix-array prefix doubling
(X200): python brute-force parity + span-merge semantics."""


def _brute(texts, L):
    from collections import Counter

    grams = Counter()
    for _, t in texts:
        if not t:
            continue
        for i in range(len(t) - L + 1):
            grams[t[i : i + L]] += 1
    spans = []
    for did, t in texts:
        if not t:
            continue
        marks = [
            i
            for i in range(len(t) - L + 1)
            if grams[t[i : i + L]] >= 2
        ]
        if not marks:
            continue
        start, prev = marks[0], marks[0]
        for i in marks[1:]:
            if i - prev > L:
                spans.append((did, start, prev + L - start))
                start = i
            prev = i
        spans.append((did, start, prev + L - start))
    return sorted(spans)


def test_duplicate_spans_match_bruteforce(spark):
    from corpusama_spark.operators.suffix import duplicate_spans_exact

    texts = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "yes the quick brown fox jumps high above everything"),
        (3, "completely different content with no repeats at all?"),
        (4, "the quick brown fox jumps over the lazy dog tonight"),  # dup of 1
        (5, "zzz internal repeat internal repeat internal repeat"),
        (6, "shrt"),
        (7, None),
        (8, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    for L in (8, 16):
        got = sorted(
            (r.doc_id, r.start, r.span_len)
            for r in duplicate_spans_exact(df, min_len=L).collect()
        )
        want = _brute(texts, L)
        assert got == want, f"L={L}"
        assert got, f"L={L} found nothing"
    # doc 1 and 4 are byte-identical: the whole doc is one span at L=16
    got16 = dict(
        ((d, s), ln)
        for d, s, ln in _brute(texts, 16)
    )
    assert got16[(1, 0)] == len(texts[0][1])


def test_duplicate_spans_power_of_two_guard(spark):
    import pytest

    from corpusama_spark.operators.suffix import duplicate_spans_exact

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicate_spans_exact(df, min_len=12)


def test_duplicate_spans_partition_invariance(spark):
    from corpusama_spark.operators.suffix import duplicate_spans_exact

    texts = [(i, f"prefix shared segment alpha beta gamma {i}") for i in range(30)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    a = sorted(
        map(
            tuple,
            duplicate_spans_exact(df.repartition(1), min_len=16).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            duplicate_spans_exact(df.repartition(11), min_len=16).collect(),
        )
    )
    assert a == b and a
