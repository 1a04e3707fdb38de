"""Quarantine redrive: the reference's DLQ redrive analogue
(``scripts/redrive.sh`` -> SQS ``start-message-move-task``, and the
replay-via-copy pattern of re-emitting objects into the source prefix,
``scripts/replay_via_s3_copy.py:32-43``).

Quarantined rows keep their original values plus a ``_bad`` reason.
After the cause is fixed (e.g. a spec/transform change that now accepts
the rows), ``redrive`` re-emits them as a NEW change-log file in the
watched changelog directory - the normal tail/apply path then picks it
up with full checkpoint/idempotency semantics. Rows that still fail
normalization simply land back in quarantine (counted), so redrive is
safe to repeat.

Redriven rows are removed from the manifest's quarantine ledger in a
new committed version; the source quarantine files are deleted right
after that commit (and gc also sweeps unreferenced quarantine files).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import TableSpec, default_spec
from ..state.manifest import Manifest, ManifestStore
from .cdc import _now_iso


def redrive(
    lake_dir: str,
    changelog_dir: str,
    spec: TableSpec | None = None,
    *,
    now: str | None = None,
) -> dict:
    """Re-emit all quarantined rows into ``changelog_dir`` and clear
    the quarantine ledger (committed as a new manifest version).
    Returns {"rows": n, "file": path | None, "version": v | None}."""
    spec = spec or default_spec()
    store = ManifestStore(lake_dir)
    parent = store.load()
    if parent is None or not parent.quarantine:
        return {"rows": 0, "file": None, "version": None}

    from ..state.lakefs import fs_for, lakefs

    lfs = lakefs(lake_dir)
    tables = []
    src_paths = []
    for q in parent.quarantine:
        p = lfs.full(q["path"])
        if lfs.exists(p):
            t = lfs.read_parquet(p)
            drop = [c for c in ("_bad", "part_id") if c in t.column_names]
            tables.append(t.drop_columns(drop))
            src_paths.append(p)
    if not tables:
        rows = 0
        out_path = None
    else:
        uni = pa.unify_schemas([t.schema for t in tables], promote_options="permissive")
        tables = [t.cast(uni) for t in tables]
        tbl = pa.concat_tables(tables)
        rows = len(tbl)
        cfs = fs_for(changelog_dir)
        cfs.makedirs(changelog_dir)
        # atomic landing, per the tailer's producer contract; the
        # manifest version prefix keeps redrive file names MONOTONE
        # (the checkpoint watermark requires future files to sort
        # above it - a bare uuid name would not)
        name = f"redrive-{store.next_version():06d}-{uuid.uuid4().hex[:12]}.parquet"
        out_path = (
            changelog_dir.rstrip("/") + "/" + name
            if cfs.is_object
            else os.path.join(changelog_dir, name)
        )
        if cfs.is_object:
            cfs.write_parquet(tbl, out_path)  # object PUT is atomic
        else:
            tmp = os.path.join(changelog_dir, f".{name}.tmp")
            pq.write_table(tbl, tmp, compression="snappy")
            os.replace(tmp, out_path)

    manifest = Manifest(
        version=store.next_version(),
        parent_version=parent.version,
        created_at=now or _now_iso(),
        schema=list(parent.schema),
        schema_ipc=parent.schema_ipc,
        partitions=dict(parent.partitions),
        applied=list(parent.applied),
        applied_watermarks=dict(parent.applied_watermarks),
        watermark=parent.watermark,
        max_event_ts_us=parent.max_event_ts_us,
        max_lateness_us=parent.max_lateness_us,
        metrics={"redriven_rows": rows},
        lineage={"_redrive": {"rows": rows, "file": out_path}},
        quarantine=[],
        partitioning=dict(parent.partitioning),
    )
    committed = store.commit(manifest)
    # the rows now live in the re-emitted change file; the source
    # quarantine parquet is unreferenced as of this commit - delete it
    # here rather than waiting for a gc that only walks data/
    for p in src_paths:
        try:
            lfs.remove(p)
        except OSError:
            pass
    return {"rows": rows, "file": out_path, "version": committed.version}
