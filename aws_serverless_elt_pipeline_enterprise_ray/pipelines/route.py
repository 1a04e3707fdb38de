"""Multi-record-type stream routing.

The reference normalizes THREE record types in one bronze stream and
fans Parquet files out per ``(record_type, dt)`` partition
(``lambdas/shared/schemas.py:15-22,25-38`` declares the per-type
schemas; ``lambdas/transform/app.py:93-104`` groups a mixed batch by
type before writing). The engine analogue: one streaming pass splits a
mixed change log into per-type STAGED changelog directories (atomic,
monotone file names - the tailer's producer contract), then each type
applies into its own lake under ``lake_root/<name>`` with full
checkpoint / exactly-once semantics.

Idempotency layers:

* source-file level - a ``ROUTED.json`` watermark checkpoint (same
  watermark+exceptions representation as the manifest's) records which
  source files have been split; a re-run stages only new files.
* row level - if a crash lands between staging and the checkpoint
  write, the re-run re-stages those source files into NEW staged files;
  applying the same logical change rows twice is harmless because LWW
  by (ts, seq) is idempotent (the replay invariant).

Rows whose ``record_type`` matches no registered spec are staged under
``_staged/_unknown/`` - the routing-level quarantine (M4 analogue for
unroutable records).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..schema import TableSpec
from ..sources.changelog import list_changelog_files
from ..state.manifest import Manifest, _atomic_write
from .cdc import _compact_checkpoint, apply_changes

UNKNOWN_DIR = "_unknown"


class _StageWriter:
    """Stateless-task batch fn: split one Arrow batch by record_type
    and write each slice as an atomic staged changelog file. Returns
    tiny count rows (the only thing that reaches the driver)."""

    def __init__(self, staged_root: str, type_col: str, types: list[str], run_prefix: int):
        self.staged_root = staged_root
        self.type_col = type_col
        self.types = types
        self.run_prefix = run_prefix

    def _write(self, sub: pa.Table, type_name: str) -> None:
        from ..state.lakefs import fs_for

        fs = fs_for(self.staged_root)
        # run_prefix keeps names monotone ACROSS routing runs (the
        # staged dir is itself a watermarked changelog); within a run
        # order is irrelevant - they are all applied together
        name = f"route-{self.run_prefix:06d}-{uuid.uuid4().hex[:12]}.parquet"
        if fs.is_object:
            fs.write_parquet(  # object PUT is atomic
                sub, self.staged_root.rstrip("/") + "/" + type_name + "/" + name
            )
            return
        d = os.path.join(self.staged_root, type_name)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{name}.tmp")
        pq.write_table(sub, tmp, compression="snappy")
        os.replace(tmp, os.path.join(d, name))

    def __call__(self, batch: pa.Table) -> pa.Table:
        tv = batch[self.type_col]
        out_types, out_rows = [], []
        for t in self.types:
            sub = batch.filter(pc.equal(tv, t))
            if len(sub):
                self._write(sub.drop_columns([self.type_col]), t)
                out_types.append(t)
                out_rows.append(len(sub))
        known = pc.is_in(tv, value_set=pa.array(self.types))
        unk = batch.filter(pc.invert(pc.fill_null(known, False)))
        if len(unk):
            self._write(unk, UNKNOWN_DIR)  # keep type col for inspection
            out_types.append(UNKNOWN_DIR)
            out_rows.append(len(unk))
        return pa.table(
            {"record_type": pa.array(out_types, pa.string()),
             "rows": pa.array(out_rows, pa.int64())}
        )


def _load_state(path: str) -> dict:
    from ..state.lakefs import fs_for

    fs = fs_for(path)
    if fs.exists(path):
        return json.loads(fs.read_text(path))
    return {"applied": [], "watermarks": {}, "runs": 0}


def route_changes(
    changelog_dir: str,
    lake_root: str,
    specs: dict[str, TableSpec],
    *,
    type_col: str = "record_type",
) -> dict:
    """Split pending mixed change files into per-type staged dirs.
    Returns {"staged": {type: rows}, "pending_files": n}."""
    from ..state.lakefs import lakefs

    staged_root = lakefs(lake_root).full("_staged")
    lakefs(lake_root).makedirs(staged_root)
    state_path = staged_root.rstrip("/") + "/ROUTED.json"
    state = _load_state(state_path)
    probe = Manifest(
        version=0, parent_version=None, created_at="", schema=[],
        partitions={}, applied=state["applied"], watermark=-1,
        metrics={}, lineage={}, quarantine=[],
        applied_watermarks=state["watermarks"],
    )
    files = [
        p for p in list_changelog_files(changelog_dir) if not probe.is_applied(p)
    ]
    staged: dict[str, int] = {}
    if files:
        run_prefix = int(state["runs"]) + 1
        writer = _StageWriter(staged_root, type_col, sorted(specs), run_prefix)
        counts = (
            rd.read_parquet(files)
            .map_batches(writer.__call__, batch_format="pyarrow")
            .take_all()
        )
        for r in counts:
            staged[r["record_type"]] = staged.get(r["record_type"], 0) + int(r["rows"])
        applied, wms = _compact_checkpoint(
            state["applied"], state["watermarks"], files
        )
        _atomic_write(
            state_path,
            json.dumps({"applied": applied, "watermarks": wms, "runs": run_prefix}),
        )
    return {"staged": staged, "pending_files": len(files)}


def route_and_apply(
    changelog_dir: str,
    lake_root: str,
    specs: dict[str, TableSpec],
    *,
    type_col: str = "record_type",
    now: str | None = None,
    **apply_kwargs,
) -> dict:
    """Route a mixed change stream and apply each type into its own
    lake (``lake_root/<name>``). Returns
    {"staged": {...}, "manifests": {name: [Manifest, ...]}}."""
    routed = route_changes(changelog_dir, lake_root, specs, type_col=type_col)
    manifests: dict[str, list] = {}
    from ..state.lakefs import lakefs

    rfs = lakefs(lake_root)
    for name, spec in specs.items():
        staged_dir = rfs.full("_staged", name)
        if rfs.isdir(staged_dir) and list_changelog_files(staged_dir):
            manifests[name] = apply_changes(
                staged_dir, rfs.full(name), spec,
                now=now, **apply_kwargs,
            )
        else:
            manifests[name] = []
    return {**routed, "manifests": manifests}
