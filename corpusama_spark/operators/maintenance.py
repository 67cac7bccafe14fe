"""Table maintenance over the snapshot store — the Iceberg
remove_orphan_files / rewrite_data_files housekeeping pair.

A long-lived 10^12-row table accumulates two kinds of rot that no query
ever surfaces:

- **Orphan files**: data written by a crashed wave that never committed,
  or staged by a WAP snapshot that was abandoned (snapshots.py
  abandon_snapshot drops the METADATA; the parquet it audited stays on
  disk). They cost storage and — worse — a naive directory-listing read
  would resurrect rows that were never part of any committed snapshot.
  The engine's readers are immune (read_as_of prunes to committed
  buckets), which is exactly why the files linger unnoticed.
- **Small files**: every wave commit closes its writers, so a bucket
  re-committed by many incremental runs fragments into files far below
  the scan-efficient size; at scale the NameNode/manifest pressure and
  per-file open cost dominate the read.

Both audits here are METADATA-scale operations: they walk the file
listing (on a real deployment, the Iceberg manifest — no data is read)
and return plans. ``vacuum_orphans`` is the only destructive call and
takes an age guard (Iceberg's ``older_than``) so an in-flight writer's
fresh files are never swept.
"""

from __future__ import annotations

import os
import pathlib
import time

from corpusama_spark.snapshots import buckets_as_of

_BUCKET_PREFIX = "bucket="


def _bucket_of(d: pathlib.Path) -> int | None:
    if d.name.startswith(_BUCKET_PREFIX):
        try:
            return int(d.name[len(_BUCKET_PREFIX):])
        except ValueError:
            return None
    return None


def orphan_scan(out_path: str, snap_dir: str) -> dict:
    """What a vacuum would reclaim: partition directories whose bucket no
    committed snapshot references (crashed-wave leftovers, abandoned WAP
    stages) plus writer litter (_temporary dirs, .tmp/. staging files).
    Returns a dry-run plan: {live_buckets, orphan_buckets, orphan_files,
    orphan_bytes, litter}. Never deletes."""
    root = pathlib.Path(out_path)
    live = buckets_as_of(snap_dir)
    orphan_buckets: list[int] = []
    orphan_files: list[str] = []
    orphan_bytes = 0
    litter: list[str] = []
    if not root.exists():
        return {
            "live_buckets": sorted(live),
            "orphan_buckets": [],
            "orphan_files": [],
            "orphan_bytes": 0,
            "litter": [],
        }
    for child in sorted(root.iterdir()):
        if child.name == "_temporary" or child.name.startswith(".tmp"):
            litter.append(str(child))
            continue
        b = _bucket_of(child)
        if b is None:
            if child.is_file() and child.name.startswith("_"):
                continue  # _SUCCESS and friends
            continue
        if b in live:
            # committed bucket: only stray temp files inside are litter
            # (.crc checksum companions are legitimate writer output)
            for f in child.rglob("*"):
                if "_temporary" in f.parts or (
                    f.name.startswith(".") and not f.name.endswith(".crc")
                ):
                    litter.append(str(f))
            continue
        orphan_buckets.append(b)
        for f in child.rglob("*"):
            if f.is_file():
                orphan_files.append(str(f))
                orphan_bytes += f.stat().st_size
    return {
        "live_buckets": sorted(live),
        "orphan_buckets": orphan_buckets,
        "orphan_files": orphan_files,
        "orphan_bytes": orphan_bytes,
        "litter": litter,
    }


def vacuum_orphans(
    out_path: str, snap_dir: str, older_than_s: float = 3 * 24 * 3600
) -> dict:
    """Execute the orphan plan, skipping anything younger than
    ``older_than_s`` (a writer racing the vacuum has fresh mtimes —
    Iceberg's older_than guard). Returns {removed_buckets, removed_files,
    skipped_young}. Committed data is untouched by construction: the
    plan only ever lists buckets absent from every published snapshot."""
    import shutil

    plan = orphan_scan(out_path, snap_dir)
    now = time.time()
    removed_buckets: list[int] = []
    removed_files = 0
    skipped_young: list[str] = []
    root = pathlib.Path(out_path)
    for b in plan["orphan_buckets"]:
        d = root / f"{_BUCKET_PREFIX}{b}"
        newest = max(
            (f.stat().st_mtime for f in d.rglob("*") if f.is_file()),
            default=0.0,
        )
        if now - newest < older_than_s:
            skipped_young.append(str(d))
            continue
        removed_files += sum(1 for f in d.rglob("*") if f.is_file())
        shutil.rmtree(d)
        removed_buckets.append(b)
    for item in plan["litter"]:
        p = pathlib.Path(item)
        if not p.exists():
            continue
        if now - p.stat().st_mtime < older_than_s:
            skipped_young.append(item)
            continue
        if p.is_dir():
            shutil.rmtree(p)
        else:
            p.unlink()
    return {
        "removed_buckets": removed_buckets,
        "removed_files": removed_files,
        "skipped_young": skipped_young,
    }


def small_file_report(
    out_path: str, snap_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> list[dict]:
    """Per committed bucket: file count, bytes, and whether a compaction
    (rewrite_data_files) would help — more than one file and a mean file
    size under half the target. Listing-only; sorted worst-first by file
    count so the maintenance job can budget top-N."""
    root = pathlib.Path(out_path)
    live = buckets_as_of(snap_dir)
    out = []
    for b in sorted(live):
        d = root / f"{_BUCKET_PREFIX}{b}"
        if not d.exists():
            continue
        files = [f for f in d.rglob("*.parquet") if f.is_file()]
        total = sum(f.stat().st_size for f in files)
        n = len(files)
        out.append(
            {
                "bucket": b,
                "n_files": n,
                "total_bytes": total,
                "mean_bytes": (total // n) if n else 0,
                "needs_compaction": n > 1 and (total / n) < target_bytes / 2,
            }
        )
    out.sort(key=lambda r: (-r["n_files"], r["bucket"]))
    return out


def compact_bucket(spark, out_path: str, bucket: int) -> int:
    """Rewrite one bucket's fragments into a single file (the Iceberg
    bin-pack rewrite at its smallest grain): read the bucket partition,
    coalesce(1), write to a staging dir, atomic-swap. Returns the row
    count. Idempotent — re-running on a compacted bucket is a no-op
    rewrite of one file."""
    import shutil

    d = pathlib.Path(out_path) / f"{_BUCKET_PREFIX}{bucket}"
    df = spark.read.parquet(str(d))
    n = df.count()
    tmp = str(d) + "__compact_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(d)
    os.rename(tmp, d)
    return n
