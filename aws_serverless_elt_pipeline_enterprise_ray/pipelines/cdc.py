"""The flagship CDC ingest pipeline: tail -> normalize -> partition ->
merge -> commit.

End-to-end analogue of the reference's ingest+transform path
(SURVEY §3.1: S3 event -> idempotent ingest -> SQS -> grouped Parquet
write), re-expressed Ray-Data-first:

    discover pending change files (vs. checkpoint)          [driver]
    ray.data.read_parquet(pending)                          [streamed]
      .map_batches(normalize + salted part_id, pyarrow)     [stateless tasks]
      .groupby("part_id").map_groups(PartitionMerger, ...)  [actor pool, THE shuffle]
    collect P small result rows                             [driver]
    atomic manifest + checkpoint commit                     [driver]

Only the tiny per-partition result rows ever reach the driver; data
moves exclusively through Ray's object store. Micro-batched commits
(``commit_every_files``) bound the work lost to a crash and give
kill-and-resume granularity, mirroring the reference's per-object
idempotency records (``lambdas/ingest/app.py:84-126``).
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..schema import (
    TableSpec,
    assign_part_id,
    default_spec,
    normalize_batch,
    schema_union,
)
from ..sources.changelog import discover_pending, group_by_schema, peek_schemas
from ..stages.merge import PartitionMerger
from ..state.manifest import Manifest, ManifestStore


def _now_iso() -> str:
    return datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.%fZ"
    )


class _NormalizeAssign:
    """Stateless-task batch fn: M1-M4 normalization + A1 partition-id
    assignment in one pass over a zero-copy Arrow batch."""

    def __init__(self, spec: TableSpec):
        self.spec = spec
        self.hot = frozenset(spec.hot_keys) if spec.hot_keys else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = normalize_batch(batch, self.spec)
        return assign_part_id(
            out, self.spec.num_partitions, self.hot, self.spec.hot_key_salt
        )


def apply_changes(
    changelog_dir: str | list[str],
    lake_dir: str,
    spec: TableSpec | None = None,
    *,
    commit_every_files: int | None = None,
    batch_size: int = 131_072,
    merge_concurrency: int | tuple[int, int] | None = None,
    max_rows_per_file: int = 2_000_000,
    now: str | None = None,
    detect_hot_keys: bool = False,
) -> list[Manifest]:
    """Apply all pending change-log files to the lake. Returns the list
    of manifests committed by this run (empty if nothing pending).

    Exactly-once: a change file is either in a committed manifest's
    ``applied`` set (fully merged) or it is pending; data files are
    invisible until their manifest commits. Re-running after a kill
    re-processes only un-committed files; re-submitting an applied
    batch is a no-op (the reference's ``verify-idempotency`` semantics,
    ``Makefile:344-359``).
    """
    spec = spec or default_spec()
    store = ManifestStore(lake_dir)

    if isinstance(changelog_dir, list):
        current = store.load()
        applied = set(current.applied) if current else set()
        pending = [p for p in sorted(changelog_dir) if p not in applied]
    else:
        pending = discover_pending(changelog_dir, store.applied_files())
    if not pending:
        return []

    chunk = commit_every_files or len(pending)
    manifests = []
    for i in range(0, len(pending), chunk):
        m = _apply_chunk(
            pending[i : i + chunk],
            store,
            spec,
            batch_size=batch_size,
            merge_concurrency=merge_concurrency,
            max_rows_per_file=max_rows_per_file,
            now=now,
            detect_hot_keys=detect_hot_keys,
        )
        manifests.append(m)
    return manifests


def _apply_chunk(
    files: list[str],
    store: ManifestStore,
    spec: TableSpec,
    *,
    batch_size: int,
    merge_concurrency,
    max_rows_per_file: int,
    now: str | None,
    detect_hot_keys: bool,
) -> Manifest:
    parent = store.load()
    parent_version = parent.version if parent else None

    # -- additive schema evolution: discover new columns from footers --
    schemas = peek_schemas(files)
    extras = schema_union(list(schemas.values()), spec.payload_schema)
    run_spec = spec.with_extras(extras) if (extras and spec.extra_columns == "keep") else spec
    if parent:
        prior = [tuple(c) for c in parent.schema]
        prior_extras = [
            (n, _parse_type(t))
            for n, t in prior
            if n not in run_spec.payload_schema.names
        ]
        run_spec = run_spec.with_extras(prior_extras)

    # Partitioning is sticky: the first commit fixes (P, hot_keys,
    # salt) in the manifest; later applies MUST reuse it, since a key's
    # partition is a pure function of these (changing them would strand
    # a key's existing rows in another partition - duplicate keys).
    # Hot-key detection therefore only runs on the FIRST commit; a
    # later re-salt requires a partition-migrating rebalance.
    if parent and parent.partitioning:
        pp = parent.partitioning
        run_spec = dataclasses.replace(
            run_spec,
            num_partitions=pp["num_partitions"],
            hot_keys=tuple(pp.get("hot_keys", ())),
            hot_key_salt=pp.get("hot_key_salt", run_spec.hot_key_salt),
        )
    elif detect_hot_keys and not run_spec.hot_keys:
        hot = _sample_hot_keys(files, run_spec)
        if hot:
            run_spec = dataclasses.replace(run_spec, hot_keys=hot)

    # -- build the Dataset pipeline ------------------------------------
    groups = group_by_schema(files)
    datasets = [rd.read_parquet(g) for g in groups]
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)

    ds = ds.map_batches(
        _NormalizeAssign(run_spec), batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )

    current_files = (
        {int(k): [f["path"] for f in v] for k, v in parent.partitions.items()}
        if parent
        else {}
    )
    if merge_concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        # Leave ~1/4 of the CPUs for the read + normalize + shuffle
        # stages: an actor pool that reserves every CPU starves the
        # upstream tasks and the pipeline deadlocks/serializes.
        merge_concurrency = max(1, min(run_spec.num_partitions, (3 * ncpu) // 4))
    results = ds.groupby("part_id").map_groups(
        PartitionMerger,
        fn_constructor_kwargs={
            "lake_dir": store.lake_dir,
            "spec": run_spec,
            "current_files": current_files,
            "max_rows_per_file": max_rows_per_file,
        },
        batch_format="pyarrow",
        concurrency=merge_concurrency,
        num_cpus=1,
    )

    # -- tiny driver-side collect + atomic commit ----------------------
    rows = results.take_all()
    partitions = dict(parent.partitions) if parent else {}
    lineage: dict[str, dict] = {}
    quarantine = list(parent.quarantine) if parent else []
    agg: dict[str, int] = {}
    max_seq = parent.watermark if parent else -1
    for r in rows:
        pid = str(int(r["part_id"]))
        if r["files"] is not None:
            partitions[pid] = json.loads(r["files"])
        m = json.loads(r["metrics"])
        for k, v in m.items():
            agg[k] = agg.get(k, 0) + v
        q = json.loads(r["quarantine"])
        quarantine.extend(q)
        lineage[pid] = {"src_files": files, **m}
        if r["max_seq"] is not None:
            max_seq = max(max_seq, int(r["max_seq"]))

    applied = (list(parent.applied) if parent else []) + files
    manifest = Manifest(
        version=store.next_version(),
        parent_version=parent_version,
        created_at=now or _now_iso(),
        schema=[(f.name, str(f.type)) for f in run_spec.payload_schema],
        partitions=partitions,
        applied=applied,
        watermark=int(max_seq),
        metrics=agg,
        lineage=lineage,
        quarantine=quarantine,
        partitioning={
            "num_partitions": run_spec.num_partitions,
            "hot_keys": list(run_spec.hot_keys),
            "hot_key_salt": run_spec.hot_key_salt,
        },
    )
    return store.commit(manifest)


def _sample_hot_keys(
    files: list[str], spec: TableSpec, threshold: float = 0.05
) -> tuple[str, ...]:
    """Cheap driver-side hot-key probe: read the conv_id column of the
    first pending file and flag keys above ``threshold`` frequency
    (SURVEY §4 skew row). At scale this would sample row groups."""
    tbl = pq.read_table(files[0], columns=["conv_id"])
    counts = pc.value_counts(tbl["conv_id"].combine_chunks())
    n = len(tbl)
    hot = [
        d["values"]
        for d in counts.to_pylist()
        if d["counts"] / max(n, 1) >= threshold
    ]
    return tuple(h for h in hot if h is not None)


_TYPE_PARSE = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "timestamp[us]": pa.timestamp("us"),
}


def _parse_type(s: str) -> pa.DataType:
    return _TYPE_PARSE.get(s, pa.string())


# ---------------------------------------------------------------------------
# Reading the committed table
# ---------------------------------------------------------------------------


def read_table(
    lake_dir: str,
    version: int | None = None,
    columns: list[str] | None = None,
    include_internal: bool = False,
) -> rd.Dataset:
    """Dataset over the committed lake state at ``version`` (default
    CURRENT): tombstones filtered, internal columns dropped, old files
    padded with nulls for columns added later (schema evolution).

    Rows within each partition file are already sorted by
    ``(conv_id, turn_idx)`` (stable turn ordering, SURVEY §2.6 O4)."""
    store = ManifestStore(lake_dir)
    m = store.load(version)
    if m is None or not m.all_files():
        from ..schema import TRANSCRIPT_SCHEMA

        return rd.from_arrow(TRANSCRIPT_SCHEMA.empty_table())

    paths = [os.path.join(lake_dir, p) for p in m.all_files()]
    target = pa.schema([pa.field(n, _parse_type(t)) for n, t in (tuple(c) for c in m.schema)])

    groups = group_by_schema(paths)
    datasets = [rd.read_parquet(g) for g in groups]
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)

    def finalize(batch: pa.Table) -> pa.Table:
        live = batch.filter(pc.invert(pc.fill_null(batch["_deleted"], False)))
        from ..stages.merge import conform_to_schema

        out = conform_to_schema(
            live,
            target
            if not include_internal
            else pa.schema(
                list(target)
                + [pa.field("_deleted", pa.bool_()), pa.field("_seq", pa.int64())]
            ),
        )
        return out

    ds = ds.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    if columns:
        ds = ds.select_columns(columns)
    return ds
