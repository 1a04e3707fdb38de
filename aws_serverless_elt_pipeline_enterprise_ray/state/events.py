"""Post-commit event log + readiness probes.

S6 analogue: the reference emits one EventBridge event per
``(record_type, dt)`` partition written, to trigger the DQ gate
(``lambdas/transform/app.py:114-143``). We append ``partition_ready``
records to a JSONL file next to the manifest - single writer (the
committing driver), atomic-enough appends, consumers tail it or poll
the manifest version.

A3/A4 analogue: the reference's quality probe counts recent S3
objects with retries (``workflows/quality/app.py:47-62``,
``scripts/check_recent_s3_objects.py:24-40``) - clock-based and racy.
Ours queries the manifest: exact files/rows added between two
versions, and a blocking ``wait_for_manifest_version``.
"""

from __future__ import annotations

import json
import os
import time

from .manifest import ManifestStore


def events_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_events", "events.jsonl")


def emit_partition_ready(lake_dir: str, manifest) -> int:
    """Append one partition_ready record per partition touched by this
    commit. Returns the number of events written."""
    path = events_path(lake_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = 0
    with open(path, "a") as f:
        for pid, lin in manifest.lineage.items():
            f.write(
                json.dumps(
                    {
                        "event": "partition_ready",
                        "version": manifest.version,
                        "part_id": int(pid),
                        "created_at": manifest.created_at,
                        **{k: v for k, v in lin.items() if k != "src_files"},
                    }
                )
                + "\n"
            )
            n += 1
    return n


def read_events(lake_dir: str) -> list[dict]:
    path = events_path(lake_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def files_added_since(lake_dir: str, since_version: int) -> dict:
    """Exact readiness probe: files/rows added to the lake after
    ``since_version`` (A3's count-new-files, without clocks)."""
    store = ManifestStore(lake_dir)
    cur = store.load()
    if cur is None:
        return {"files": 0, "rows": 0, "version": None}
    base = store.load(since_version) if since_version in store.versions() else None
    base_files = set(base.all_files()) if base else set()
    new = [
        f
        for files in cur.partitions.values()
        for f in files
        if f["path"] not in base_files
    ]
    return {
        "files": len(new),
        "rows": sum(f["rows"] for f in new),
        "version": cur.version,
    }


def wait_for_manifest_version(
    lake_dir: str,
    min_version: int,
    timeout_s: float = 60.0,
    poll_s: float = 0.5,
) -> int | None:
    """Block until CURRENT >= min_version (A4's poll-with-retries,
    ``scripts/check_recent_s3_objects.py:24-40``). Returns the version
    reached, or None on timeout."""
    store = ManifestStore(lake_dir)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        v = store.current_version()
        if v is not None and v >= min_version:
            return v
        time.sleep(poll_s)
    return None
