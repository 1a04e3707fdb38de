"""Re-salt / rebalance migration: rewrite the lake under a NEW
partitioning (different P, hot-key set, or salt) in one atomic manifest
commit.

Partitioning is sticky - fixed by the first commit and reused by every
later apply (``pipelines/cdc.py``), because a key's partition is a pure
function of ``(P, hot_keys, salt)``: silently changing them would
strand a key's existing rows in another partition and duplicate them.
The operational consequence is that a hot conversation discovered
AFTER commit 1 can never be salted. This migration closes that gap:

    read committed state (tombstones KEPT - a purged tombstone would
    let a late out-of-order upsert resurrect a deleted key)
      -> assign part_id under the NEW partitioning
      -> one shuffle -> per-partition key-sorted COW write
      -> commit manifest with the new partitioning block

Subsequent applies pick the new partitioning up from the manifest.
Readers never see a half-migrated lake (the commit is the single
visibility point); a crash mid-migration leaves orphan files for gc.
Reference analogue: Glue's partition-rewriting overwrite pattern
(``glue_catalog/scripts/compact_silver.py:36-42``), with atomicity the
reference lacks.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import assign_part_id, hash_impl_id
from ..state.manifest import Manifest, ManifestStore, manifest_payload_schema
from .cdc import _now_iso, read_table


class _PartitionWriter:
    """Writes one rebalanced partition (key-sorted, single run)."""

    def __init__(self, lake_dir: str, key_cols: tuple[str, ...], max_rows_per_file: int):
        self.lake_dir = lake_dir
        self.key_cols = key_cols
        self.max_rows_per_file = max_rows_per_file
        from ..stages.merge import file_blooms_enabled

        self.file_blooms = file_blooms_enabled()  # captured on the driver

    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"part_id": pa.array([], pa.int32()),
                 "files": pa.array([], pa.string())}
            )
        part_id = int(group["part_id"][0].as_py())
        tbl = group.drop_columns(["part_id"])
        idx = pc.sort_indices(
            tbl, sort_keys=[(c, "ascending") for c in self.key_cols]
        )
        tbl = tbl.take(idx)  # stable turn ordering within the partition (O4)
        from ..state.lakefs import lakefs

        lfs = lakefs(self.lake_dir)
        part_dir = lfs.full("data", f"part={part_id:05d}")
        lfs.makedirs(part_dir)
        files = []
        from ..stages.merge import file_entry

        rid = uuid.uuid4().hex
        for lo in range(0, len(tbl), self.max_rows_per_file):
            chunk = tbl.slice(lo, self.max_rows_per_file)
            path = lfs.full("data", f"part={part_id:05d}", f"f-{uuid.uuid4().hex}.parquet")
            lfs.write_parquet(chunk, path)
            files.append(
                file_entry(self.lake_dir, path, chunk, self.key_cols[0], run_id=rid,
                           bloom=self.file_blooms)
            )
        return pa.table(
            {"part_id": pa.array([part_id], pa.int32()),
             "files": pa.array([json.dumps(files)], pa.string())}
        )


def rebalance(
    lake_dir: str,
    *,
    num_partitions: int | None = None,
    hot_keys: tuple[str, ...] | None = None,
    hot_key_salt: int | None = None,
    max_rows_per_file: int = 2_000_000,
    now: str | None = None,
) -> Manifest:
    """Migrate the lake to new partitioning parameters (any subset may
    change; omitted ones are kept). Returns the committed manifest."""
    store = ManifestStore(lake_dir)
    parent = store.load()
    if parent is None:
        raise RuntimeError("nothing committed - nothing to rebalance")
    pp = parent.partitioning
    new_P = int(num_partitions or pp["num_partitions"])
    new_hot = tuple(hot_keys if hot_keys is not None else pp.get("hot_keys", ()))
    new_salt = int(hot_key_salt or pp.get("hot_key_salt", 8))
    key_cols = tuple(pp.get("key_cols", ("conv_id", "turn_idx")))

    # full state, internal cols + tombstones, runs LWW-merged per old
    # partition by the reader; ONE shuffle to the new partition key
    ds = read_table(lake_dir, include_internal=True, keep_tombstones=True)
    hot_set = frozenset(new_hot) if new_hot else None

    def assign(b: pa.Table) -> pa.Table:
        return assign_part_id(b, new_P, hot_set, new_salt)

    writer = _PartitionWriter(lake_dir, key_cols, max_rows_per_file)
    rows = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part_id")
        .map_groups(writer.__call__, batch_format="pyarrow")
        .take_all()
    )
    partitions = {str(int(r["part_id"])): json.loads(r["files"]) for r in rows}
    total = sum(f["rows"] for fs in partitions.values() for f in fs)
    pay = manifest_payload_schema(parent)
    manifest = Manifest(
        version=store.next_version(),
        parent_version=parent.version,
        created_at=now or _now_iso(),
        schema=[(f.name, str(f.type)) for f in pay],
        schema_ipc=parent.schema_ipc,
        partitions=partitions,
        applied=list(parent.applied),
        applied_watermarks=dict(parent.applied_watermarks),
        watermark=parent.watermark,
        max_event_ts_us=parent.max_event_ts_us,
        max_lateness_us=parent.max_lateness_us,
        metrics={
            "rebalanced_rows": total,
            "old_num_partitions": pp["num_partitions"],
            "new_num_partitions": new_P,
        },
        lineage={"_rebalance": {"from": pp, "rows": total}},
        quarantine=list(parent.quarantine),
        partitioning={
            **pp,  # carry lake-level properties (e.g. merge_policy)
            "num_partitions": new_P,
            "hot_keys": list(new_hot),
            "hot_key_salt": new_salt,
            "hash_impl": hash_impl_id(),
            "key_cols": list(key_cols),
        },
    )
    return store.commit(manifest)
