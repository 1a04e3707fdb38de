"""Small-file compaction over committed partitions.

Engine analogue of the reference's Glue compaction job
(``infra/terraform/modules/glue_catalog/scripts/compact_silver.py:36-42``:
read a dt partition, add ``_ingested_at``, ``repartition(1)``,
overwrite) - but copy-on-write + manifest-committed, so a reader never
sees a half-compacted partition. Tombstone purging is gated by an
explicit event-time horizon: a tombstone at ts=T guards against
out-of-order upserts with ts < T arriving in FUTURE change files, so
purging is only safe for tombstones older than the stream's maximum
lateness bound. ``purge_tombstones=True`` purges everything (operator
asserts no more late data); ``purge_tombstones_before_us=<us epoch>``
purges only tombstones below the horizon.

One task per partition, no shuffle; partitions already too few files
are skipped (rewrite only when it helps - the "small file problem" row
of SURVEY §4).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..schema import TableSpec, default_spec
from ..state.manifest import Manifest, ManifestStore
from .cdc import _now_iso


def _zorder_argsort(tbl: pa.Table, cols: tuple[str, ...], bits: int = 16):
    """Row order interleaving the rank codes of ``cols`` (rank-based =
    equi-depth, so skewed distributions still split the value space
    evenly): each column's rows rank-normalize to a ``bits``-bit code
    via one argsort, the codes bit-interleave into a Morton/Z value,
    and the returned indices sort rows by it. Rows close in Z are close
    in EVERY clustered column, so chunking by Z order yields per-file
    zone maps that are simultaneously tight on all of them."""
    import numpy as np

    n = len(tbl)
    if n == 0:
        return np.arange(0, dtype=np.int64)
    # The interleaved code must fit in 64 bits: numpy shifts >= 64 are
    # platform-undefined, so shrink per-column resolution when many
    # cluster columns are given rather than silently dropping bits.
    bits = max(1, min(bits, 64 // max(len(cols), 1)))
    top = (1 << bits) - 1
    codes = []
    for c in cols:
        v = tbl[c].to_pandas()
        order = v.argsort(kind="mergesort").to_numpy()  # nulls last
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n, dtype=np.int64)
        codes.append(((rank * top) // max(n - 1, 1)).astype(np.uint64))
    k = len(codes)
    z = np.zeros(n, dtype=np.uint64)
    for b in range(bits):
        for j, code in enumerate(codes):
            bit = (code >> np.uint64(b)) & np.uint64(1)
            z |= bit << np.uint64(b * k + (k - 1 - j))
    return np.argsort(z, kind="stable")


class _Compactor:
    def __init__(
        self,
        lake_dir: str,
        purge_tombstones: bool,
        target_rows_per_file: int,
        stamp_ingested_at: str | None,
        purge_before_us: int | None = None,
        key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        drop_cols: tuple[str, ...] = (),
        cluster_by: tuple[str, ...] = (),
        payload_names: tuple[str, ...] | None = None,
    ):
        self.key_cols = key_cols
        self.drop_cols = tuple(drop_cols)
        # current manifest payload: rewritten files conform to it, so a
        # DDL-dropped column's bytes leave storage at the next compact
        self.payload_names = (
            frozenset(payload_names) if payload_names is not None else None
        )
        self.lake_dir = lake_dir
        self.purge = purge_tombstones
        self.purge_before_us = purge_before_us
        self.target = target_rows_per_file
        self.stamp = stamp_ingested_at
        self.cluster_by = tuple(cluster_by)
        from ..stages.merge import file_blooms_enabled

        self.file_blooms = file_blooms_enabled()  # captured on the driver

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_pid, out_files = [], []
        from ..schema import lww_reduce
        from ..stages.merge import conform_to_schema

        from ..state.lakefs import lakefs

        lfs = lakefs(self.lake_dir)
        for row in batch.to_pylist():
            pid = int(row["part_id"])
            paths = [lfs.full(p) for p in json.loads(row["files"])]
            tbls = [lfs.read_parquet(p) for p in paths]
            if len(tbls) > 1:
                uni = pa.unify_schemas([t.schema for t in tbls], promote_options="permissive")
                tbls = [conform_to_schema(t, uni) for t in tbls]
            tbl = pa.concat_tables(tbls)
            if len(paths) > 1:
                # LSM compaction proper: merge delta-append runs down
                # to a single sorted run per partition
                tbl = lww_reduce(tbl, self.key_cols, "ts", "_seq")
            deleted = pc.fill_null(tbl["_deleted"], False)
            if self.purge:
                tbl = tbl.filter(pc.invert(deleted))
            elif self.purge_before_us is not None:
                old_tomb = pc.and_(
                    deleted,
                    pc.less(
                        tbl["ts"],
                        pa.scalar(self.purge_before_us, pa.timestamp("us")),
                    ),
                )
                tbl = tbl.filter(pc.invert(pc.fill_null(old_tomb, False)))
            if self.drop_cols:
                tbl = tbl.drop_columns(
                    [c for c in self.drop_cols if c in tbl.column_names]
                )
            if self.payload_names is not None:
                stale = [
                    c for c in tbl.column_names
                    if not c.startswith("_") and c not in self.payload_names
                ]
                if stale:  # DDL-dropped columns still present in bytes
                    tbl = tbl.drop_columns(stale)
            if self.stamp is not None and "_ingested_at" not in tbl.column_names:
                # reference precedent for additive schema evolution:
                # compaction adds a constant timestamp column (M7);
                # job-start time is passed in for determinism.
                tbl = tbl.append_column(
                    "_ingested_at",
                    pa.array([self.stamp] * len(tbl), pa.string()),
                )
            if self.cluster_by and len(tbl):
                # Z-order the single run: key zone maps go loose (files
                # overlap in key range) but the shared run id keeps
                # secondary-column pruning LWW-safe, and the clustered
                # columns' zone maps become tight per file.
                tbl = tbl.take(
                    pa.array(_zorder_argsort(tbl, self.cluster_by))
                )
            part_dir = lfs.full("data", f"part={pid:05d}")
            lfs.makedirs(part_dir)
            files = []
            from ..stages.merge import file_entry

            rid = uuid.uuid4().hex
            for lo in range(0, max(len(tbl), 1), self.target):
                chunk = tbl.slice(lo, self.target)
                path = lfs.full("data", f"part={pid:05d}", f"f-{uuid.uuid4().hex}.parquet")
                lfs.write_parquet(chunk, path)
                files.append(
                    file_entry(
                        self.lake_dir, path, chunk, self.key_cols[0],
                        run_id=rid, bloom=self.file_blooms,
                    )
                )
            out_pid.append(pid)
            out_files.append(json.dumps(files))
        return pa.table({"part_id": out_pid, "files": out_files})


def compact(
    lake_dir: str,
    spec: TableSpec | None = None,
    *,
    target_rows_per_file: int = 2_000_000,
    min_files_to_compact: int = 2,
    purge_tombstones: bool = False,
    purge_tombstones_before_us: int | None = None,
    purge_tombstones_auto: bool = False,
    lateness_multiplier: float = 2.0,
    min_lateness_us: int = 3_600_000_000,
    stamp_ingested_at: str | None = None,
    drop_columns: tuple[str, ...] | list[str] = (),
    cluster_by: tuple[str, ...] | list[str] = (),
    now: str | None = None,
) -> Manifest | None:
    """Re-pack partitions with >= ``min_files_to_compact`` files (or
    any partition, when purging tombstones) and commit a new manifest
    version. Returns the new manifest, or None if nothing to do.

    ``purge_tombstones_auto`` derives the purge horizon from the
    manifest's OBSERVED event-time skew instead of an operator-provided
    one: ``horizon = max_event_ts - max(lateness_multiplier *
    max_lateness, min_lateness_us)``. A tombstone below the horizon can
    only be wrongly purged if a future commit arrives more than
    ``lateness_multiplier`` times later than anything ever observed
    (floored at ``min_lateness_us``, default 1h, so a stream that has
    shown zero skew still keeps a safety window).

    ``cluster_by=(cols...)`` Z-orders every rewritten partition's rows
    by the interleaved rank codes of those columns before chunking —
    the Delta/Iceberg OPTIMIZE ZORDER analogue. Per-file zone maps on
    the clustered columns become tight, so ``read_where`` /
    ``read_time_range`` prune files a key-sorted layout cannot; key
    zone maps go loose, so point lookups may touch more files of the
    partition (the documented trade). Safe because the rewrite is one
    LWW-reduced run (shared ``run`` id in the manifest) — later delta
    appends demote the partition to full reads until re-compacted."""
    spec = spec or default_spec()
    store = ManifestStore(lake_dir)
    parent = store.load()
    if parent is None:
        return None
    drop_columns = tuple(drop_columns)
    cluster_by = tuple(cluster_by)
    if cluster_by:
        known = {name for name, _ in parent.schema}
        bad = [c for c in cluster_by if c not in known]
        if bad:
            raise KeyError(f"unknown cluster_by columns {bad}; lake has {sorted(known)}")
    if drop_columns:
        keyish = set(parent.partitioning.get("key_cols", spec.key_cols)) | {"ts"}
        bad = [c for c in drop_columns if c in keyish]
        if bad:
            raise ValueError(f"cannot drop key/order columns: {bad}")
    if purge_tombstones_auto and purge_tombstones_before_us is None:
        if parent.max_event_ts_us is not None:
            guard = max(
                int(lateness_multiplier * parent.max_lateness_us),
                int(min_lateness_us),
            )
            purge_tombstones_before_us = parent.max_event_ts_us - guard
    todo = [
        {"part_id": int(pid), "files": json.dumps([f["path"] for f in files])}
        for pid, files in parent.partitions.items()
        if files
        and (
            len(files) >= min_files_to_compact
            or purge_tombstones
            or purge_tombstones_before_us is not None
            or stamp_ingested_at
            or drop_columns
            or cluster_by
        )
    ]
    if not todo:
        return None
    from ..state.manifest import manifest_payload_schema, schema_to_ipc

    compactor = _Compactor(
        lake_dir=lake_dir,
        purge_tombstones=purge_tombstones,
        target_rows_per_file=target_rows_per_file,
        stamp_ingested_at=stamp_ingested_at,
        purge_before_us=purge_tombstones_before_us,
        key_cols=tuple(parent.partitioning.get("key_cols", spec.key_cols)),
        drop_cols=drop_columns,
        cluster_by=cluster_by,
        payload_names=tuple(manifest_payload_schema(parent).names),
    )
    # task-based (state serialized once): no actor-pool startup latency
    ds = rd.from_items(todo).map_batches(
        compactor.__call__, batch_format="pyarrow", batch_size=1
    )
    partitions = dict(parent.partitions)
    for r in ds.take_all():
        partitions[str(int(r["part_id"]))] = json.loads(r["files"])
    pay = manifest_payload_schema(parent)
    if drop_columns:
        pay = pa.schema([f for f in pay if f.name not in drop_columns])
    if stamp_ingested_at is not None and "_ingested_at" not in pay.names:
        pay = pay.append(pa.field("_ingested_at", pa.string()))
    manifest = Manifest(
        version=store.next_version(),
        parent_version=parent.version,
        created_at=now or _now_iso(),
        schema=[(f.name, str(f.type)) for f in pay],
        schema_ipc=schema_to_ipc(pay),
        partitions=partitions,
        applied=list(parent.applied),
        applied_watermarks=dict(parent.applied_watermarks),
        watermark=parent.watermark,
        max_event_ts_us=parent.max_event_ts_us,
        max_lateness_us=parent.max_lateness_us,
        metrics={
            "compacted_partitions": len(todo),
            **({"clustered_by": list(cluster_by)} if cluster_by else {}),
        },
        lineage={str(t["part_id"]): {"compaction_of": parent.version} for t in todo},
        quarantine=list(parent.quarantine),
        partitioning=dict(parent.partitioning),
    )
    return store.commit(manifest)
