"""WAP-gated checkpointed pipeline (X246): passing audits publish, a
rejected wave stays un-committed (no staged leftovers, not in the
manifest) and re-runs cleanly after the gate is fixed."""

import pytest

from corpusama_spark.checkpoint import run_checkpointed
from corpusama_spark.pipeline import FilterConfig
from corpusama_spark.sources.synth import captions_df


def test_wap_publish_and_reject(spark, tmp_path):
    from corpusama_spark.snapshots import read_as_of, snapshots

    out, man, snap = (
        str(tmp_path / "out"),
        str(tmp_path / "man"),
        str(tmp_path / "snap"),
    )
    caps = captions_df(spark, 240, partitions=4)
    cfg = FilterConfig(nbuckets=4)

    audits = []

    def ok_audit(metrics, written):
        audits.append(metrics)
        # a real gate: rows present, keep-rate sane, written matches
        return metrics["n_rows"] > 0 and written.count() >= metrics["n_keep"]

    n = run_checkpointed(
        spark, caps, out, man, cfg, run_id="wap1",
        snapshot_dir=snap, wap_audit=ok_audit,
    )
    assert n == 4 and len(audits) == 4
    chain = snapshots(snap)
    assert len(chain) == 4 and not any(s.get("staged") for s in chain)
    total = read_as_of(spark, out, snap).count()
    assert total == 240


def test_wap_rejection_leaves_wave_rerunnable(spark, tmp_path):
    from corpusama_spark.snapshots import read_as_of, snapshots

    out, man, snap = (
        str(tmp_path / "out"),
        str(tmp_path / "man"),
        str(tmp_path / "snap"),
    )
    caps = captions_df(spark, 240, partitions=4)
    cfg = FilterConfig(nbuckets=4)

    calls = {"n": 0}

    def flaky_audit(metrics, written):
        calls["n"] += 1
        return calls["n"] != 2  # reject exactly the second wave

    with pytest.raises(RuntimeError, match="WAP audit rejected"):
        run_checkpointed(
            spark, caps, out, man, cfg, run_id="wap2",
            snapshot_dir=snap, wap_audit=flaky_audit,
        )
    # one wave published, none staged, rejected wave NOT in history
    chain = snapshots(snap)
    assert len(chain) == 1 and not any(s.get("staged") for s in chain)
    n_after_fail = read_as_of(spark, out, snap).count()

    # fix the gate, restart: remaining 3 waves run and publish
    n2 = run_checkpointed(
        spark, caps, out, man, cfg, run_id="wap2",
        snapshot_dir=snap, wap_audit=lambda m, w: True,
    )
    assert n2 == 3
    chain = snapshots(snap)
    assert len(chain) == 4 and not any(s.get("staged") for s in chain)
    assert read_as_of(spark, out, snap).count() == 240
    assert n_after_fail < 240
