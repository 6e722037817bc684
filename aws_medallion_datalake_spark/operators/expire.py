"""Snapshot expiry with reachability GC + orphan sweep.

The reference retires nothing — every overwrite leaks the previous files
until S3 lifecycle rules (not in repo) clean them. Here expiry is a
first-class metadata operation (north_star: "snapshot expiry with
reachability GC, manifest-list rewrite"):

1. choose retained snapshots (always the current one; plus ``keep_last`` /
   ``older_than_ms`` policy),
2. reachable set = union of every retained manifest's file list + the
   retained manifest files themselves,
3. delete unreachable data files, expired manifests, and orphan commit
   prefixes (from aborted writes); metadata JSON versions are kept (tiny,
   and they are the audit trail),
4. write a new metadata version whose snapshot list contains only the
   retained snapshots.

The walk is driver-side ``os.walk`` here; at 10^8-file scale the listing
and the reachable-set anti-join run as a Spark job over the manifest
DataFrames (the reachable set is already columnar parquet) — the policy
logic is identical.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Optional

import pyarrow.parquet as pq

from ..sources.tableformat import Table


def expire_snapshots(
    table: Table,
    *,
    keep_last: int = 1,
    older_than_ms: Optional[int] = None,
    dry_run: bool = False,
) -> dict:
    """Expire old snapshots and GC unreachable files. Returns metrics."""
    t0 = time.time()
    version = table.current_version()
    meta = table.metadata(version)
    snaps = sorted(meta.snapshots, key=lambda s: s.snapshot_id)
    retained = [s for s in snaps[-keep_last:]] if keep_last > 0 else []
    if older_than_ms is not None:
        retained = [
            s for s in snaps if s.timestamp_ms >= older_than_ms or s in retained
        ]
    current = [s for s in snaps if s.snapshot_id == meta.current_snapshot_id]
    retained = sorted(
        {s.snapshot_id: s for s in retained + current}.values(),
        key=lambda s: s.snapshot_id,
    )
    expired = [s for s in snaps if s not in retained]

    reachable = set()
    for s in retained:
        reachable.add(os.path.join(table.root, s.manifest_path))
        man = pq.read_table(os.path.join(table.root, s.manifest_path), columns=["path"])
        reachable.update(os.path.join(table.root, p) for p in man.column("path").to_pylist())

    deleted_files = 0
    freed_bytes = 0
    for dirpath, _dirnames, filenames in os.walk(table.data_dir):
        for fn in filenames:
            full = os.path.join(dirpath, fn)
            if full not in reachable:
                freed_bytes += os.path.getsize(full)
                deleted_files += 1
                if not dry_run:
                    os.remove(full)
    # expired manifests
    for s in expired:
        mpath = os.path.join(table.root, s.manifest_path)
        if os.path.exists(mpath) and mpath not in reachable:
            freed_bytes += os.path.getsize(mpath)
            deleted_files += 1
            if not dry_run:
                os.remove(mpath)

    if not dry_run:
        # sweep now-empty orphan commit prefixes
        for entry in os.listdir(table.data_dir):
            full = os.path.join(table.data_dir, entry)
            if os.path.isdir(full) and not any(os.scandir(full)):
                shutil.rmtree(full)
        # manifest-list rewrite: new metadata version with only retained snaps
        meta.snapshots = retained
        table._write_metadata_version(version + 1, meta)

    return {
        "stage": "expire",
        "expired_snapshots": [s.snapshot_id for s in expired],
        "retained_snapshots": [s.snapshot_id for s in retained],
        "deleted_files": deleted_files,
        "freed_bytes": int(freed_bytes),
        "dry_run": dry_run,
        "duration_sec": round(time.time() - t0, 3),
    }
