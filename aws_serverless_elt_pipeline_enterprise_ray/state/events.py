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

from .lakefs import lakefs
from .manifest import ManifestStore


def events_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_events", "events.jsonl")


def _event_records(manifest) -> list[dict]:
    return [
        {
            "event": "partition_ready",
            "version": manifest.version,
            "part_id": int(pid),
            "created_at": manifest.created_at,
            **{k: v for k, v in lin.items() if k != "src_files"},
        }
        for pid, lin in manifest.lineage.items()
    ]


def emit_partition_ready(lake_dir: str, manifest) -> int:
    """Record one partition_ready event per partition touched by this
    commit. POSIX: appended to a single JSONL (single writer - the
    committing driver). Object store: no append exists, so each commit
    PUTs its own ``events-<version>.jsonl`` object (atomic, and
    naturally idempotent per version). Returns the events written."""
    recs = _event_records(manifest)
    fs = lakefs(lake_dir)
    if fs.is_object:
        fs.write_atomic(
            fs.full("_events", f"events-{manifest.version:06d}.jsonl"),
            "".join(json.dumps(r) + "\n" for r in recs),
        )
        return len(recs)
    path = events_path(lake_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    return len(recs)


def read_events(lake_dir: str) -> list[dict]:
    fs = lakefs(lake_dir)
    if fs.is_object:
        out = []
        for p in fs.walk_files(fs.full("_events")):
            out.extend(
                json.loads(line)
                for line in fs.read_text(p).splitlines()
                if line.strip()
            )
        return out
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
