"""Snapshot log (snapshots.py): atomic commits, parent chain, time travel,
restart continuity."""

import json

import pytest

from corpusama_spark.checkpoint import run_checkpointed
from corpusama_spark.pipeline import FilterConfig
from corpusama_spark.snapshots import (
    buckets_as_of,
    commit_snapshot,
    latest_snapshot_id,
    read_as_of,
    snapshots,
)
from corpusama_spark.sources.synth import captions_df


def test_commit_chain_and_time_travel_units(tmp_path, monkeypatch):
    d = str(tmp_path / "snaps")
    assert latest_snapshot_id(d) is None and snapshots(d) == []
    s1 = commit_snapshot(d, "r1", [3, 1], 100, 90)
    s2 = commit_snapshot(d, "r1", [2], 50, 40)
    assert (s1, s2) == (1, 2)
    chain = snapshots(d)
    assert chain[0]["parent_id"] is None and chain[1]["parent_id"] == 1
    assert chain[0]["buckets"] == [1, 3]  # sorted
    assert buckets_as_of(d, 1) == {1, 3}
    assert buckets_as_of(d) == {1, 2, 3}
    # a concurrent committer that computed the same id (stale latest read)
    # must fail loudly instead of overwriting the existing snapshot
    import corpusama_spark.snapshots as S

    target = S._snap_path(d, 3)
    target.write_text(json.dumps({"snapshot_id": 3, "parent_id": 2,
                                  "run_id": "x", "buckets": [7],
                                  "summary": {}}))
    monkeypatch.setattr(S, "latest_snapshot_id", lambda _d: 2)  # stale view
    with pytest.raises(RuntimeError, match="already committed"):
        S.commit_snapshot(d, "r1", [9], 1, 1)
    # no .tmp litter after the failed commit; the winner's file is intact
    assert not list((tmp_path / "snaps").glob(".tmp-*"))
    assert json.loads(target.read_text())["buckets"] == [7]


def test_checkpointed_run_commits_snapshots_and_reads_as_of(spark, tmp_path):
    caps = captions_df(spark, 200, partitions=4)
    out, mani, snaps = (
        str(tmp_path / "out"), str(tmp_path / "mani"), str(tmp_path / "snaps")
    )
    cfg = FilterConfig(nbuckets=8, repartition=False)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(
            spark, caps, out, mani, cfg, "run-1",
            fail_after_buckets=2, snapshot_dir=snaps,
        )
    mid = latest_snapshot_id(snaps)
    assert mid is not None
    mid_rows = read_as_of(spark, out, snaps, mid).count()
    assert 0 < mid_rows < 200
    run_checkpointed(spark, caps, out, mani, cfg, "run-2", snapshot_dir=snaps)
    chain = snapshots(snaps)
    # parent pointers survive the restart
    assert [s["parent_id"] for s in chain] == [None] + [
        s["snapshot_id"] for s in chain[:-1]
    ]
    assert buckets_as_of(snaps) == set(range(8))
    # time travel: as-of mid is a strict prefix of the final table
    assert read_as_of(spark, out, snaps, mid).count() == mid_rows
    assert read_as_of(spark, out, snaps).count() == 200
    # summaries add up to the corpus
    assert sum(s["summary"]["n_rows"] for s in chain) == 200


def test_expiry_squash_preserves_restart_and_retained_reads(spark, tmp_path):
    from corpusama_spark import snapshots as S

    snap = str(tmp_path / "snaps")
    for i in range(5):
        S.commit_snapshot(
            snap, f"run{i}", buckets=[2 * i, 2 * i + 1], n_rows=10, n_keep=8
        )
    before_all = S.buckets_as_of(snap)
    before_latest = S.latest_snapshot_id(snap)
    before_retained = S.buckets_as_of(snap, 4)

    plan = S.expiry_plan(snap, keep_last=2)
    assert plan["expire_ids"] == [1, 2, 3] and plan["retain_ids"] == [4, 5]
    assert plan["base_buckets"] == [0, 1, 2, 3, 4, 5]

    done = S.expire_snapshots(snap, keep_last=2)
    assert done == plan
    snaps = S.snapshots(snap)
    # base (squashed, carries id 3) + the two retained
    assert [s["snapshot_id"] for s in snaps] == [3, 4, 5]
    assert snaps[0].get("squashed") and snaps[0]["buckets"] == [
        0, 1, 2, 3, 4, 5,
    ]
    assert snaps[0]["summary"] == {"n_rows": 30, "n_keep": 24}
    # restart contract: the full committed-bucket set is unchanged
    assert S.buckets_as_of(snap) == before_all
    assert S.latest_snapshot_id(snap) == before_latest
    # retained time travel identical
    assert S.buckets_as_of(snap, 4) == before_retained
    # expired time travel coarsens to the base (documented semantics)
    assert S.buckets_as_of(snap, 1) == set()
    assert S.buckets_as_of(snap, 3) == {0, 1, 2, 3, 4, 5}
    # idempotent / no-op when nothing to expire
    again = S.expire_snapshots(snap, keep_last=2)
    assert again["expire_ids"] == []
    # the chain still accepts new commits after a squash
    S.commit_snapshot(snap, "run5", buckets=[10], n_rows=1, n_keep=1)
    assert S.latest_snapshot_id(snap) == 6
    assert 10 in S.buckets_as_of(snap)
