"""Cross-modal retrieval recall (X262): an image whose vector equals its
caption's hashed feature direction retrieves its own caption at rank 1;
empty captions report -1; collapse (all-same image vectors) is caught."""

import hashlib


def _feat(caption, dim=16):
    v = [0.0] * dim
    for tok in caption.lower().split():
        h = hashlib.md5(tok.encode()).hexdigest()
        bucket = int(h[:8], 16) % dim
        sign = 1 if int(h[8], 16) % 2 == 0 else -1
        v[bucket] += sign
    return v


def test_self_retrieval_and_empty_caption(spark):
    from corpusama_spark.operators.alignment import xmodal_recall

    caps = {
        0: "red fox jumps quickly",
        1: "blue whale swims deep",
        2: "green hills roll far",
        3: "",  # empty -> no features -> true_rank -1
    }
    docs = spark.createDataFrame(
        [(i, c) for i, c in caps.items()], "doc_id long, text string"
    )
    images = spark.createDataFrame(
        [(i, _feat(caps[i]) if caps[i] else [1.0] * 16) for i in caps],
        "vec_id long, embedding array<double>",
    )
    got = {r.img_id: r for r in xmodal_recall(docs, images, k=2, dim=16).collect()}
    for i in (0, 1, 2):
        assert got[i].true_rank == 1 and got[i].hit_at_2
        assert got[i].top1_id == i
    assert got[3].true_rank == -1 and not got[3].hit_at_2


def test_encoder_collapse_is_visible(spark):
    from corpusama_spark.operators.alignment import xmodal_recall

    caps = {i: f"token{i} word{i} thing{i}" for i in range(4)}
    docs = spark.createDataFrame(
        [(i, c) for i, c in caps.items()], "doc_id long, text string"
    )
    # a collapsed image tower: every image maps to the SAME vector — the
    # paired-only agreement score would look uniformly fine, retrieval
    # recall shows all queries retrieving the same winner
    same = _feat(caps[0], 16)
    images = spark.createDataFrame(
        [(i, same) for i in range(4)], "vec_id long, embedding array<double>"
    )
    got = xmodal_recall(docs, images, k=1, dim=16).collect()
    top1 = {r.top1_id for r in got}
    assert len(top1) == 1  # everyone retrieves the same caption
    assert sum(1 for r in got if r.hit_at_1) <= 1
