"""Per-partition LWW merge with copy-on-write Parquet rewrite.

This is the engine's core stateful stage (SURVEY §2.3 T2): the
reference *declares* record-level dedup via ``idempotency_key`` config
(``configs/ups_shipping.yaml:9``) and enforces it only post-hoc with a
GE ``unique`` expectation (``ge_validate_silver.py:40``); we enforce it
structurally. Each ``PartitionMerger`` call receives ALL pending change
events for one hash partition (delivered by the
``groupby("part_id").map_groups`` shuffle), reduces them to one row per
``(conv_id, turn_idx)`` by greatest ``(ts, seq)``, merges against the
partition's current Parquet files, and writes a NEW uniquely-named file
set - the copy-on-write analogue of the reference's uniquely-named
batch files (``lambdas/transform/app.py:104``), but made exactly-once
by the manifest commit that follows.

Delete semantics: tombstones. A ``D`` event is kept as a row with
``_deleted=true`` so a late-arriving older upsert for the same key
cannot resurrect it (order-insensitive replay, the north-rule
invariant). Tombstones are purged by compaction once the checkpoint
watermark has passed them.

A callable class either way it runs: as an actor pool
(``merge_compute="actors"``: spec parsing, schema objects and the
current-file map built once per actor in ``__init__``) or, the
measured-faster default, as tasks over a serialized-once instance
(``merge_compute="tasks"``: same state rides the closure, no pool
startup, restart safety from COW writes + the manifest commit).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import TableSpec, lake_schema, lww_reduce
from ..state.lakefs import lakefs

#: Schema of the small per-partition result rows returned to the driver.
MERGE_RESULT_SCHEMA = pa.schema(
    [
        pa.field("part_id", pa.int32()),
        pa.field("files", pa.string()),       # JSON [{"path","rows","bytes"}]
        pa.field("quarantine", pa.string()),  # JSON [{"path","rows"}]
        pa.field("metrics", pa.string()),     # JSON counters
        pa.field("max_seq", pa.int64()),
        # event-time extent of this commit's applied events - feeds the
        # manifest's observed-lateness watermark (tombstone GC horizon)
        pa.field("min_ts_us", pa.int64()),
        pa.field("max_ts_us", pa.int64()),
    ]
)


def file_blooms_enabled() -> bool:
    """Driver-side capture of the bloom kill switch: workers don't see
    post-init driver env changes, so writer classes read this in
    ``__init__`` and pass it through to ``file_entry``."""
    return os.environ.get("GRAFT_FILE_BLOOMS", "1") != "0"


def file_entry(
    lake_dir: str,
    path: str,
    chunk: pa.Table,
    key_col: str | None,
    run_id: str | None = None,
    bloom: bool | None = None,
) -> dict:
    """Manifest file entry for one written chunk, with a zone map: the
    min/max of the leading key column (chunks are key-sorted by every
    writer, so ranges are tight). Point lookups prune FILES inside a
    partition by these ranges - at 100 TB a partition holds many
    multi-million-row files and a key lookup should read one of them,
    not all (the file-level analogue of Iceberg/Delta column stats).
    Recorded only for string keys (lexicographic compare is then
    byte-identical between writer and reader); older manifests without
    the fields are always read."""
    fs = lakefs(lake_dir)
    entry = {
        "path": fs.rel(path),
        "rows": len(chunk),
        "bytes": fs.size(path),
    }
    # run membership: all files written by ONE partition rewrite share a
    # run id. A partition whose files all belong to one run provably
    # holds no superseded rows across files (the writer LWW-reduced
    # before chunking), so secondary-column pruning is LWW-safe even
    # when key ranges overlap (e.g. after cluster_by reordering).
    if run_id is not None:
        entry["run"] = run_id
    if (
        key_col is not None
        and len(chunk)
        and key_col in chunk.column_names
        and pa.types.is_string(chunk.schema.field(key_col).type)
    ):
        mm = pc.min_max(chunk[key_col])
        kmin, kmax = mm["min"].as_py(), mm["max"].as_py()
        if kmin is not None:
            entry["key_min"] = kmin
            entry["key_max"] = kmax
        # file-level key Bloom filter (sidecar object, ~10 bits per
        # distinct key, k=7 -> ~1% FP): prunes point lookups that the
        # min/max range CANNOT - after LSM delta-appends a partition
        # holds runs with overlapping key ranges, and a range check
        # keeps every straddling file while the bloom keeps only real
        # candidates (Delta/Iceberg bloom index analogue). Sidecar
        # lives next to the data file, is referenced by the entry (gc
        # keeps it alive exactly as long as its file) and is an
        # optimization only - readers treat a missing/corrupt sidecar
        # as "must read". Killable via GRAFT_FILE_BLOOMS=0.
        if bloom is None:
            bloom = file_blooms_enabled()
        if kmin is not None and bloom:
            import numpy as np
            import pandas as pd

            from ..functions.bloom import _positions

            keys = pc.unique(chunk[key_col]).drop_null()
            n = len(keys)
            if 0 < n <= 8_000_000:  # sidecar cap ~10 MB
                num_bits = 1 << max(
                    10, int(np.ceil(np.log2(max(n, 1) * 10)))
                )
                bits = np.zeros(num_bits // 8, dtype=np.uint8)
                pos = _positions(keys.to_pandas(), num_bits, 7).ravel()
                np.bitwise_or.at(
                    bits,
                    (pos >> np.uint64(3)).astype(np.int64),
                    np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8),
                )
                side = path + ".bloom"
                fs.write_atomic(side, bits.tobytes())
                entry["bloom"] = fs.rel(side)
                entry["bloom_bits"] = num_bits
                entry["bloom_k"] = 7
    # ts zone map (microseconds, JSON-safe ints): lets time-ranged
    # scans skip whole files. Effectiveness is data-dependent (keys
    # minted over time cluster ts within key-sorted chunks; uniform
    # key<->ts mixing yields wide ranges) - correctness never depends
    # on it (read_time_range treats missing/wide ranges as "read").
    if len(chunk) and "ts" in chunk.column_names and pa.types.is_timestamp(
        chunk.schema.field("ts").type
    ):
        tm = pc.min_max(chunk["ts"])
        tmin, tmax = tm["min"].value, tm["max"].value
        if tmin is not None:
            entry["ts_min"] = int(tmin)
            entry["ts_max"] = int(tmax)
    # generic zone maps: min/max of every primitive payload column
    # (JSON-safe: timestamps as µs ints), powering read_where's
    # predicate-pruned scans. Cheap (one vectorized min_max per column
    # per chunk) and, like the key/ts maps, an optimization only -
    # readers treat missing entries as "must read".
    if len(chunk):
        stats: dict[str, list] = {}
        for f in chunk.schema:
            if f.name.startswith("_") or f.name in ("part_id",):
                continue
            t = f.type
            col = chunk[f.name]
            if pa.types.is_timestamp(t):
                mm = pc.min_max(col)
                if mm["min"].value is not None:
                    stats[f.name] = [int(mm["min"].value), int(mm["max"].value)]
            elif (
                pa.types.is_integer(t)
                or pa.types.is_floating(t)
                or pa.types.is_string(t)
            ):
                mm = pc.min_max(col)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if lo is not None:
                    stats[f.name] = [lo, hi]
        if stats:
            entry["stats"] = stats
    return entry


def conform_to_schema(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``tbl`` onto ``schema``: missing columns null-filled,
    extra columns dropped, types cast. This is the read-side half of
    additive schema evolution (old partition files lacking newly-added
    payload columns are padded with nulls)."""
    cols = []
    n = len(tbl)
    for field in schema:
        if field.name in tbl.column_names:
            col = tbl[field.name]
            if col.type != field.type:
                col = pc.cast(col, field.type, safe=False)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.table(cols, schema=schema)


class PartitionMerger:
    """Callable-class actor for ``groupby("part_id").map_groups``.

    Parameters are plain picklable values; heavy setup happens once per
    actor here (T3/T4 analogue: the reference caches config and clients
    per Lambda container, ``ups_shipping/handler.py:14-19``).
    """

    def __init__(
        self,
        lake_dir: str,
        spec: TableSpec,
        current_files: dict[int, list[dict]],
        max_rows_per_file: int = 2_000_000,
        delta_threshold: float = 0.2,
    ):
        self.lake_dir = lake_dir
        self.spec = spec
        self.lake_schema = lake_schema(spec)
        # part_id -> [{"path","rows","bytes"}] from the parent manifest
        self.current_files = current_files
        self.max_rows_per_file = max_rows_per_file
        self.key_cols = spec.key_cols
        # captured on the DRIVER: worker tasks don't see later env edits
        self.file_blooms = file_blooms_enabled()
        # LSM-style hybrid: when this commit's (reduced) delta is small
        # relative to the partition (< delta_threshold x current rows),
        # APPEND it as a new run instead of rewriting the partition -
        # readers and compaction LWW-merge runs per partition. Kills
        # the O(partition)/commit write amplification of pure COW at
        # steady state; compaction re-merges runs down to one.
        self.delta_threshold = delta_threshold
        # coalesce policy: column-level partial updates. Every written
        # row must be fully merged against current state (so cross-run
        # whole-row LWW on reads stays valid) -> delta-append disabled.
        self.policy = getattr(spec, "merge_policy", "lww")
        if self.policy == "coalesce":
            from ..schema import coalesce_reduce

            self.reduce = coalesce_reduce
            self.delta_threshold = 0.0  # always read-modify-write
        else:
            self.reduce = lww_reduce

    # -- helpers -------------------------------------------------------
    def _existing(self, part_id: int) -> list[dict]:
        return (
            self.current_files.get(part_id)
            or self.current_files.get(str(part_id))
            or []
        )

    def _read_current(self, part_id: int) -> pa.Table | None:
        files = self._existing(part_id)
        if not files:
            return None
        fs = lakefs(self.lake_dir)
        tables = [
            conform_to_schema(
                fs.read_parquet(fs.full(f["path"])),
                self.lake_schema,
            )
            for f in files
        ]
        return pa.concat_tables(tables) if tables else None

    def _write_partition(self, part_id: int, tbl: pa.Table) -> list[dict]:
        fs = lakefs(self.lake_dir)
        part_dir = fs.full("data", f"part={part_id:05d}")
        fs.makedirs(part_dir)
        files = []
        n = len(tbl)
        step = self.max_rows_per_file
        rid = uuid.uuid4().hex  # one run per partition write
        for lo in range(0, n, step):
            chunk = tbl.slice(lo, step)
            name = f"f-{uuid.uuid4().hex}.parquet"
            path = fs.full("data", f"part={part_id:05d}", name)
            fs.write_parquet(chunk, path)
            files.append(
                file_entry(self.lake_dir, path, chunk, self.key_cols[0], run_id=rid,
                           bloom=self.file_blooms)
            )
        return files

    def _write_quarantine(self, part_id: int, tbl: pa.Table) -> list[dict]:
        fs = lakefs(self.lake_dir)
        qdir = fs.full("_quarantine", f"part={part_id:05d}")
        fs.makedirs(qdir)
        path = fs.full("_quarantine", f"part={part_id:05d}", f"q-{uuid.uuid4().hex}.parquet")
        fs.write_parquet(tbl, path)
        return [{"path": fs.rel(path), "rows": len(tbl)}]

    # -- the merge -----------------------------------------------------
    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return MERGE_RESULT_SCHEMA.empty_table()
        part_id = int(group["part_id"][0].as_py())

        bad_mask = pc.is_valid(group["_bad"])
        n_bad = pc.sum(pc.cast(bad_mask, pa.int64())).as_py() or 0
        quarantine: list[dict] = []
        if n_bad:
            quarantine = self._write_quarantine(part_id, group.filter(bad_mask))
            group = group.filter(pc.invert(bad_mask))

        metrics = {
            "events_applied": len(group),
            "quarantined": int(n_bad),
            "upserts": 0,
            "deletes": 0,
            "dedup_hits": 0,
            "rows_after": 0,
            "files_rewritten": 0,
            "bytes_written": 0,
        }
        max_seq = -1
        if len(group) == 0:
            return pa.table(
                [
                    pa.array([part_id], pa.int32()),
                    pa.array([None], pa.string()),
                    pa.array([json.dumps(quarantine)], pa.string()),
                    pa.array([json.dumps(metrics)], pa.string()),
                    pa.array([max_seq], pa.int64()),
                    pa.array([None], pa.int64()),
                    pa.array([None], pa.int64()),
                ],
                schema=MERGE_RESULT_SCHEMA,
            )
        max_seq = pc.max(group["seq"]).as_py()
        ts_i64 = pc.cast(group["ts"], pa.int64())
        min_ts_us = pc.min(ts_i64).as_py()
        max_ts_us = pc.max(ts_i64).as_py()

        # change rows -> lake layout: payload + (_deleted, _seq)
        delta_cols = []
        for field in self.lake_schema:
            if field.name == "_deleted":
                delta_cols.append(pc.equal(group["op"], "D"))
            elif field.name == "_seq":
                delta_cols.append(pc.cast(group["seq"], pa.int64()))
            else:
                delta_cols.append(group[field.name])
        delta = pa.table(delta_cols, schema=self.lake_schema)
        n_delta = len(delta)
        if self.policy == "lww":
            delta = lww_reduce(delta, self.key_cols, "ts", "_seq")
        # coalesce: the delta must reach the combined reduce RAW - a
        # pre-reduced delta would fold a delete into its successors and
        # lose the reset against the CURRENT state's columns
        metrics["dedup_hits"] = n_delta - len(delta)

        existing = self._existing(part_id)
        n_current = sum(f["rows"] for f in existing)
        if existing and len(delta) < self.delta_threshold * max(n_current, 1):
            # delta-append run: no read-modify-write; LWW deferred to
            # read/compaction (run count bounded by compaction cadence)
            deleted = pc.sum(pc.cast(delta["_deleted"], pa.int64())).as_py() or 0
            metrics["deletes"] = int(deleted)
            metrics["upserts"] = len(delta) - int(deleted)
            metrics["rows_after"] = n_current + len(delta)  # pre-merge bound
            metrics["delta_appends"] = 1
            new_files = self._write_partition(part_id, delta)
            files = list(existing) + new_files  # keep runs + the new one
            metrics["files_rewritten"] = len(new_files)
            metrics["bytes_written"] = sum(f["bytes"] for f in new_files)
        else:
            current = self._read_current(part_id)
            combined = (
                pa.concat_tables([current, delta]) if current is not None else delta
            )
            merged = self.reduce(combined, self.key_cols, "ts", "_seq")
            # lww_reduce returns rows key-sorted: stable (conv_id,
            # turn_idx) turn ordering falls out of the reduction sort
            # (SURVEY §2.6 O4).

            deleted = pc.sum(pc.cast(merged["_deleted"], pa.int64())).as_py() or 0
            metrics["deletes"] = int(deleted)
            metrics["upserts"] = len(merged) - int(deleted)
            metrics["rows_after"] = len(merged)

            files = self._write_partition(part_id, merged)
            metrics["files_rewritten"] = len(files)
            metrics["bytes_written"] = sum(f["bytes"] for f in files)

        return pa.table(
            [
                pa.array([part_id], pa.int32()),
                pa.array([json.dumps(files)], pa.string()),
                pa.array([json.dumps(quarantine)], pa.string()),
                pa.array([json.dumps(metrics)], pa.string()),
                pa.array([max_seq], pa.int64()),
                pa.array([min_ts_us], pa.int64()),
                pa.array([max_ts_us], pa.int64()),
            ],
            schema=MERGE_RESULT_SCHEMA,
        )
