"""Shot-boundary detection over QVID videos (X205)."""

import numpy as np


def _scene(color, n, seed):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        fr = np.full((16, 16, 3), color, dtype=np.int16)
        fr = (fr + rng.randint(-5, 6, fr.shape)).clip(0, 255)
        out.append(fr.astype(np.uint8))
    return out


def test_shots_split_on_hard_cuts_only(spark):
    from corpusama_spark.functions.imageops import encode_qvid, shot_boundaries

    frames = (
        _scene(30, 5, 1) + _scene(220, 4, 2) + _scene(120, 6, 3)
    )
    vid = encode_qvid(frames, fmt="png")
    single = encode_qvid(_scene(80, 8, 4), fmt="png")
    df = spark.createDataFrame(
        [(1, vid), (2, single), (3, b"garbage"), (4, None)],
        "video_id long, bytes binary",
    )
    out = {}
    for r in shot_boundaries(df).collect():
        out.setdefault(r.video_id, []).append(r)
    assert set(out) == {1, 2}  # corrupt + null emit zero rows
    shots = sorted(out[1], key=lambda r: r.shot_no)
    assert [(s.start_frame, s.n_frames) for s in shots] == [
        (0, 5), (5, 4), (9, 6),
    ]
    assert shots[0].cut_dist == 0.0
    assert shots[1].cut_dist > 1.5 and shots[2].cut_dist > 1.5
    assert [(s.start_frame, s.n_frames) for s in out[2]] == [(0, 8)]


def test_shots_keyframe_budget_beats_every_k(spark):
    """The curation claim: one keyframe per shot spends frames where
    the content changes."""
    from corpusama_spark.functions.imageops import encode_qvid, shot_boundaries

    # 20 frames, one scene: every-2nd sampling keeps 10, shots keep 1
    vid = encode_qvid(_scene(60, 20, 7), fmt="png")
    df = spark.createDataFrame([(1, vid)], "video_id long, bytes binary")
    shots = shot_boundaries(df).collect()
    assert len(shots) == 1 and shots[0].n_frames == 20
