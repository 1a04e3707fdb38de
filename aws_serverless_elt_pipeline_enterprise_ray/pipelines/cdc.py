"""The flagship CDC ingest pipeline: tail -> normalize -> partition ->
merge -> commit.

End-to-end analogue of the reference's ingest+transform path
(SURVEY §3.1: S3 event -> idempotent ingest -> SQS -> grouped Parquet
write), re-expressed Ray-Data-first:

    discover pending change files (vs. checkpoint)          [driver]
    ray.data.read_parquet(pending, ~1 block/CPU)            [streamed]
      .map_batches(normalize + salted part_id + combiner)   [stateless tasks, zero-copy]
      .groupby("part_id").map_groups(PartitionMerger, ...)  [THE shuffle; tasks (default) or actor pool]
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
    hash_impl_id,
    lww_combine_fast,
    normalize_batch,
    promote_type,
    schema_union,
)
from ..sources.changelog import discover_pending, group_by_schema, peek_schemas
from ..stages.merge import PartitionMerger
from ..state.lakefs import fs_for, lakefs
from ..state.manifest import (
    Manifest,
    ManifestStore,
    manifest_payload_schema,
    parse_type_string,
    schema_to_ipc,
)


def _now_iso() -> str:
    return datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.%fZ"
    )


class _NormalizeAssign:
    """Stateless-task batch fn: M1-M4 normalization + A1 partition-id
    assignment + per-batch LWW combiner in one pass over a zero-copy
    Arrow batch.

    The combiner (keep only the winning row per key within this batch;
    tombstones kept) is the CDC analogue of pre-aggregation before a
    groupby: LWW is an associative, commutative per-key reduction, so
    reducing early only shrinks what the shuffle moves (measured ~33%
    faster end-to-end on an update-heavy 2M-event stream)."""

    def __init__(self, spec: TableSpec, combine: bool = True):
        self.spec = spec
        self.hot = frozenset(spec.hot_keys) if spec.hot_keys else None
        self.combine = combine

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = normalize_batch(batch, self.spec)
        out = assign_part_id(
            out,
            self.spec.num_partitions,
            self.hot,
            self.spec.hot_key_salt,
            key_col=self.spec.key_cols[0],
            salt_col=self.spec.key_cols[1] if len(self.spec.key_cols) > 1 else None,
        )
        if self.combine and len(out):
            good_mask = pc.is_null(out["_bad"])
            bad = out.filter(pc.invert(good_mask))
            red = lww_combine_fast(
                out.filter(good_mask), self.spec.key_cols, "ts", "seq"
            )
            out = pa.concat_tables([red, bad]) if len(bad) else red
        return out


class _CombineOnly:
    """Second-stage LWW combiner: coalesces several first-stage
    combiner outputs into one bigger batch and reduces again, shrinking
    what the shuffle and the stage barrier move by another multiple on
    update-heavy streams (the deepened map-side combine).

    ADAPTIVE: combining is optional for correctness (the merge reduces
    authoritatively), so each task watches its own reduction ratio and
    switches to pass-through when a batch fails to shrink by
    ``min_reduction`` - on low-duplication streams the second stage
    costs one lexsort per task and then gets out of the way."""

    def __init__(self, spec: TableSpec, min_reduction: float = 0.15):
        self.spec = spec
        self.min_reduction = min_reduction
        self.enabled = True  # per-task state (instance deserialized per task)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.enabled or len(batch) == 0:
            return batch
        good_mask = pc.is_null(batch["_bad"])
        bad = batch.filter(pc.invert(good_mask))
        red = lww_combine_fast(
            batch.filter(good_mask), self.spec.key_cols, "ts", "seq"
        )
        out = pa.concat_tables([red, bad]) if len(bad) else red
        if len(out) > (1.0 - self.min_reduction) * len(batch):
            self.enabled = False
        return out


def apply_changes(
    changelog_dir: str | list[str],
    lake_dir: str,
    spec: TableSpec | None = None,
    *,
    commit_every_files: int | str | None = None,
    batch_size: int | None | str = "default",
    merge_concurrency: int | tuple[int, int] | None = None,
    merge_compute: str = "tasks",
    stage_barrier: bool | str = "auto",
    delta_threshold: float = 0.2,
    max_rows_per_file: int = 2_000_000,
    now: str | None = None,
    detect_hot_keys: bool = False,
    exchange: str | None = None,
    pipeline_commits: bool | None = None,
    commit_retries: int | None = None,
    expect_parent_version: int | None = None,
) -> list[Manifest]:
    """Apply all pending change-log files to the lake. Returns the list
    of manifests committed by this run (empty if nothing pending).

    Exactly-once: a change file is either in a committed manifest's
    ``applied`` set (fully merged) or it is pending; data files are
    invisible until their manifest commits. Re-running after a kill
    re-processes only un-committed files; re-submitting an applied
    batch is a no-op (the reference's ``verify-idempotency`` semantics,
    ``Makefile:344-359``).

    ``pipeline_commits`` (or ``GRAFT_PIPELINE_COMMITS=1``): on a
    multi-commit run, prefetch chunk k+1's read+normalize+combine into
    the object store while chunk k shuffles/merges/commits - commits
    stay strictly serial (exactly-once unchanged: the prefetch writes
    nothing), but the pre-shuffle half of every chunk overlaps the
    post-shuffle half of its predecessor. Run specs for future chunks
    are folded deterministically (``_derive_run_spec``) and re-checked
    against the real parent at commit time; a fold mismatch just
    rebuilds, so prefetching is never a correctness input.

    When it pays: reads that spend their time OFF-CPU (cold object
    storage / S3), where the prefetch uses network+disk while the
    merge uses CPU. On a page-cache-warm single box both halves are
    DRAM-bound and the overlap measures a wash (in-session A/B,
    18M events / 4 commits: 6.6-9.3s serial vs 7.7-9.3s pipelined at
    8 CPUs; within noise at 32) - hence opt-in, not default.
    """
    spec = spec or default_spec()
    store = ManifestStore(lake_dir)

    current = store.load()
    if isinstance(changelog_dir, list):
        pending = [
            p for p in sorted(changelog_dir)
            if current is None or not current.is_applied(p)
        ]
    else:
        pending = discover_pending(changelog_dir, manifest=current)
    if not pending:
        return []

    if commit_every_files == "auto":
        # Byte-bounded commits: at 100 TB nobody should guess a file
        # count. Greedy-pack pending files so each commit's on-disk
        # input stays under the cap (decompressed working set ~3x);
        # commits stay resumable units and shuffle volume stays bounded
        # regardless of how the producer sized its files.
        cap = int(os.environ.get("GRAFT_AUTO_COMMIT_BYTES", 8 << 30))
        chunks: list[list[str]] = []
        cur: list[str] = []
        cur_b = 0
        for p in pending:
            sz = fs_for(p).size(p)
            if cur and cur_b + sz > cap:
                chunks.append(cur)
                cur, cur_b = [], 0
            cur.append(p)
            cur_b += sz
        if cur:
            chunks.append(cur)
    else:
        n = commit_every_files or len(pending)
        chunks = [pending[i : i + n] for i in range(0, len(pending), n)]
    chunk_kwargs = dict(
        batch_size=batch_size,
        merge_concurrency=merge_concurrency,
        merge_compute=merge_compute,
        stage_barrier=stage_barrier,
        delta_threshold=delta_threshold,
        max_rows_per_file=max_rows_per_file,
        now=now,
        detect_hot_keys=detect_hot_keys,
        exchange=exchange,
        commit_retries=commit_retries,
        expect_parent_version=expect_parent_version,
    )
    if pipeline_commits is None:
        pipeline_commits = os.environ.get("GRAFT_PIPELINE_COMMITS") == "1"
    manifests: list[Manifest] = []
    if pipeline_commits and len(chunks) > 1:
        from concurrent.futures import ThreadPoolExecutor

        # Fold each chunk's run spec forward without waiting for its
        # parent commit: schema after chunk k = chunk k's run spec
        # schema; partitioning after the first commit is sticky.
        pfields = list(manifest_payload_schema(current)) if current else None
        ppart = (
            current.partitioning if (current and current.partitioning) else None
        )
        folded: list[TableSpec] = []
        for i, ck in enumerate(chunks):
            rs = _derive_run_spec(
                spec,
                pfields,
                ppart,
                ck,
                detect_hot_keys=(detect_hot_keys and ppart is None and i == 0),
            )
            folded.append(rs)
            pfields = list(rs.payload_schema)
            ppart = _partitioning_of(rs)

        def build(i: int):
            ds, _, _ = _build_normalized(chunks[i], folded[i], batch_size)
            return ds.materialize()

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(build, 0)
            for i in range(len(chunks)):
                prebuilt = fut.result()
                if i + 1 < len(chunks):
                    fut = pool.submit(build, i + 1)
                m = _apply_chunk_with_retry(
                    chunks[i],
                    store,
                    spec,
                    prebuilt=prebuilt,
                    prebuilt_spec=folded[i],
                    **chunk_kwargs,
                )
                if m is not None:
                    manifests.append(m)
        return manifests
    for files_chunk in chunks:
        m = _apply_chunk_with_retry(files_chunk, store, spec, **chunk_kwargs)
        if m is not None:
            manifests.append(m)
    return manifests


def _apply_chunk_with_retry(
    files: list[str],
    store: ManifestStore,
    spec: TableSpec,
    commit_retries: int | None = None,
    **kw,
) -> Manifest | None:
    """One chunk's apply with bounded commit-race auto-retry. Losing a
    ``CommitConflict`` means a concurrent writer published first: the
    loser's data files are orphans (invisible; ``gc`` sweeps them), and
    re-running ``_apply_chunk`` is safe by construction - it re-loads
    the FRESH parent, the fence re-filters the chunk against the
    winner's checkpoint (skipping files the winner applied), and the
    merge re-reads current state. Retries are the engine analogue of
    the reference's SQS redelivery (visibility-timeout requeue,
    ``infra/terraform/modules/sqs_queue/main.tf:43-46``); bounded so a
    genuinely wedged lake (e.g. a livelocked committer storm) still
    surfaces instead of spinning forever."""
    import random
    import time as _time

    from ..state.manifest import CommitConflict

    retries = (
        commit_retries
        if commit_retries is not None
        else int(os.environ.get("GRAFT_COMMIT_RETRIES", 5))
    )
    for attempt in range(retries + 1):
        try:
            return _apply_chunk(files, store, spec, **kw)
        except CommitConflict:
            if attempt == retries:
                raise
            # jittered backoff: racing writers must desynchronize, and
            # a fresh POSIX orphan (grace 60s) needs real time to age
            _time.sleep(min(2.0, 0.05 * (2 ** attempt)) * (0.5 + random.random()))
            # a prefetched stream belongs to the pre-race world; rebuild
            kw["prebuilt"] = None
            kw["prebuilt_spec"] = None


def _derive_run_spec(
    spec: TableSpec,
    parent_fields,
    parent_partitioning: dict | None,
    files: list[str],
    schemas: dict | None = None,
    detect_hot_keys: bool = False,
) -> TableSpec:
    """The run spec for one commit as a PURE function of (table spec,
    parent schema fields, parent partitioning, chunk files) - additive
    schema evolution from footers, prior-commit extras carried forward,
    sticky partitioning enforced. Being deterministic in these inputs
    is what lets the pipelined apply fold specs for future chunks
    BEFORE their parents commit (and assert the fold afterwards).

    Partitioning is sticky: the first commit fixes (P, hot_keys, salt)
    in the manifest; later applies MUST reuse it, since a key's
    partition is a pure function of these (changing them would strand
    a key's existing rows in another partition - duplicate keys).
    Hot-key detection therefore only runs on the FIRST commit; a later
    re-salt requires a partition-migrating rebalance."""
    schemas = schemas if schemas is not None else peek_schemas(files)
    extras = schema_union(list(schemas.values()), spec.payload_schema)
    run_spec = spec.with_extras(extras) if (extras and spec.extra_columns == "keep") else spec
    if parent_fields is not None:
        prior_extras = [
            (f.name, f.type)
            for f in parent_fields
            if f.name not in run_spec.payload_schema.names
        ]
        run_spec = run_spec.with_extras(prior_extras)
        # Type evolution is monotone widening: an extra column whose
        # footer type differs from the committed (parent) type resolves
        # through promote_type, never first-seen-wins — a float32 lake
        # column receiving float64 files widens; the reverse apply
        # stays float64. Base-spec columns are pinned by the spec.
        prior_types = {f.name: f.type for f in parent_fields}
        base_names = set(spec.payload_schema.names)
        widened, changed = [], False
        for f in run_spec.payload_schema:
            pt = prior_types.get(f.name)
            if pt is not None and f.name not in base_names and not pt.equals(f.type):
                try:
                    widened.append(pa.field(f.name, promote_type(pt, f.type)))
                except ValueError as e:
                    raise ValueError(
                        f"column {f.name!r}: {e} (committed lake type "
                        f"{pt} vs incoming {f.type}; evolution must widen)"
                    ) from None
                changed = True
            else:
                widened.append(f)
        if changed:
            run_spec = dataclasses.replace(
                run_spec, payload_schema=pa.schema(widened)
            )
    if parent_partitioning:
        pp = parent_partitioning
        if pp.get("hash_impl", hash_impl_id()) != hash_impl_id():
            raise RuntimeError(
                f"lake was partitioned with {pp['hash_impl']} but this "
                f"runtime hashes with {hash_impl_id()}; re-partitioning "
                "required (full replay into a fresh lake)"
            )
        rec_keys = tuple(pp.get("key_cols") or ())
        if rec_keys and tuple(run_spec.key_cols) != rec_keys:
            raise RuntimeError(
                f"lake is keyed on {rec_keys} but the apply spec says "
                f"{tuple(run_spec.key_cols)}; applying with mismatched "
                "key columns would mis-partition and merge on the "
                "wrong grain (pass a spec matching the lake)"
            )
        run_spec = dataclasses.replace(
            run_spec,
            num_partitions=pp["num_partitions"],
            hot_keys=tuple(pp.get("hot_keys", ())),
            hot_key_salt=pp.get("hot_key_salt", run_spec.hot_key_salt),
            # merge semantics are a property of the LAKE, fixed at the
            # first commit like the partitioning - a later apply with a
            # default spec must not silently switch LWW<->coalesce
            merge_policy=pp.get("merge_policy", run_spec.merge_policy),
        )
    elif detect_hot_keys and not run_spec.hot_keys:
        hot = _sample_hot_keys(files, run_spec)
        if hot:
            run_spec = dataclasses.replace(run_spec, hot_keys=hot)
    return run_spec


def _partitioning_of(run_spec: TableSpec) -> dict:
    """The manifest ``partitioning`` entry a commit with this run spec
    writes - also the folded parent state for the NEXT chunk."""
    return {
        "num_partitions": run_spec.num_partitions,
        "hot_keys": list(run_spec.hot_keys),
        "hot_key_salt": run_spec.hot_key_salt,
        "hash_impl": hash_impl_id(),
        "key_cols": list(run_spec.key_cols),
        "merge_policy": getattr(run_spec, "merge_policy", "lww"),
    }


def _same_run_spec(a: TableSpec, b: TableSpec) -> bool:
    return (
        a.payload_schema == b.payload_schema
        and a.num_partitions == b.num_partitions
        and tuple(a.hot_keys) == tuple(b.hot_keys)
        and a.hot_key_salt == b.hot_key_salt
        and a.key_cols == b.key_cols
        and getattr(a, "merge_policy", "lww") == getattr(b, "merge_policy", "lww")
    )


def _build_normalized(
    files: list[str],
    run_spec: TableSpec,
    batch_size,
    schemas: dict | None = None,
):
    """The pre-shuffle half of one commit's pipeline: read (blocks
    sized by bytes), normalize + assign part_id + first-stage LWW
    combine, volume-gated second-stage combine. Returns (ds, est_bytes,
    num_blocks); the caller decides whether to barrier/materialize.

    Block sizing: the sort shuffle's cost is quadratic-ish in block
    COUNT (map-fragments x reduce-tasks through the object store), so
    aim for ~1 block per CPU, growing with data volume so a block
    never exceeds the target block size (measured: 200 tiny blocks ->
    11.7s, 32 right-sized blocks -> 4.4s on the same 5M-event input)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    est_bytes = sum(fs_for(f).size(f) for f in files) * 3  # snappy ~3x
    target_block = rd.DataContext.get_current().target_max_block_size or (128 << 20)
    # Block count: at least 1/CPU (parallelism), at most 8*ncpu (the
    # sort exchange churns with block count: 140 blocks ran 3x slower
    # than 64 on the same 100M-event input) - but NEVER let the cap
    # push a block past ~4x the target block size: a multi-GB block
    # sorts with pathological cache behavior and can spill, which is
    # both slow and (on a small cluster) makes low-parallelism runs
    # degrade superlinearly. Bytes win over the per-CPU cap.
    num_blocks = int(max(ncpu, -(-est_bytes // target_block)))
    cap = 8 * ncpu
    if num_blocks > cap and est_bytes // cap <= 4 * target_block:
        num_blocks = cap

    groups = group_by_schema(files, schemas if schemas is not None else peek_schemas(files))
    per_group = max(1, num_blocks // len(groups))
    datasets = [
        fs_for(g[0]).ray_read_parquet(g, override_num_blocks=per_group)
        for g in groups
    ]
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)

    # Batch size here is a COMBINER knob: bigger batches let the
    # per-batch LWW pre-reduce collapse more duplicate keys before the
    # shuffle (a 30k-row scan batch barely reduces; a 512k-row batch
    # collapses update-heavy streams ~10x and cut shuffle+merge time
    # 2.5x at 4-8 CPUs on a 54M-event stream; whole-block batches
    # overshoot - multi-GB sorts thrash). Blocks are already sized
    # ~1/CPU above, so this does not cost task parallelism.
    if batch_size == "default":
        batch_size = 524_288
    # map-side LWW combining is only valid for whole-row LWW; the
    # coalesce policy needs every partial-update row at the merge
    lww = getattr(run_spec, "merge_policy", "lww") == "lww"
    ds = ds.map_batches(
        _NormalizeAssign(run_spec, combine=lww),
        batch_format="pyarrow",
        batch_size=batch_size,  # None = per-block batches (no coalesce copy)
        zero_copy_batch=True,
    )
    if lww and batch_size and est_bytes >= (1 << 30):
        # second-stage combine over ~4 first-stage outputs (adaptive:
        # disables itself per task when the stream isn't duplicate-
        # heavy); cuts barrier+shuffle bytes another ~4x on update-
        # heavy bulk streams. Volume-gated: on a small (incremental)
        # apply the stage's fixed cost exceeds any shuffle saving
        # (measured ~2x slower on a 2M-event tail apply).
        ds = ds.map_batches(
            _CombineOnly(run_spec),
            batch_format="pyarrow",
            batch_size=4 * batch_size,
            zero_copy_batch=True,
        )
    return ds, est_bytes, num_blocks


def _apply_chunk(
    files: list[str],
    store: ManifestStore,
    spec: TableSpec,
    *,
    batch_size: int,
    merge_concurrency,
    merge_compute: str,
    stage_barrier: bool | str,
    delta_threshold: float,
    max_rows_per_file: int,
    now: str | None,
    detect_hot_keys: bool,
    exchange: str | None = None,
    prebuilt: "rd.Dataset | None" = None,
    prebuilt_spec: TableSpec | None = None,
    expect_parent_version: int | None = None,
) -> Manifest | None:
    parent = store.load()
    parent_version = parent.version if parent else None

    # Snapshot-validation fence (serializable DML): the caller derived
    # these change files from a specific committed version; if another
    # writer has advanced the lake since, applying them would write a
    # stale read-modify-write. Surface the same clean conflict the
    # commit-time race produces so the caller re-synthesizes.
    if (
        expect_parent_version is not None
        and parent_version != expect_parent_version
    ):
        from ..state.manifest import CommitConflict

        raise CommitConflict(
            f"snapshot stale: synthesized against version "
            f"{expect_parent_version}, lake is at {parent_version}"
        )

    # Concurrent-writer fence, half 1: a writer that lost a race for an
    # earlier chunk re-filters against the FRESH parent instead of
    # re-applying files a faster writer already committed (silent
    # duplicate application; harmless under LWW but it double-counts
    # metrics and doubles write volume). Half 2 is store.commit's
    # stale-parent / exclusive-version-create check, which turns a race
    # WITHIN a chunk into a clean conflict error.
    if parent is not None:
        still_pending = [f for f in files if not parent.is_applied(f)]
        if not still_pending:
            return None
        if len(still_pending) != len(files):
            files = still_pending
            prebuilt = None  # prefetched stream covered the full chunk

    schemas = peek_schemas(files)
    run_spec = _derive_run_spec(
        spec,
        list(manifest_payload_schema(parent)) if parent else None,
        parent.partitioning if (parent and parent.partitioning) else None,
        files,
        schemas=schemas,
        detect_hot_keys=detect_hot_keys,
    )

    # Pipelined apply: the caller prefetched this chunk's normalized
    # stream under a FOLDED run spec (derived before the parent
    # committed). Use it only if the fold matches reality - a mismatch
    # (e.g. a concurrent writer evolved the schema meanwhile) falls
    # back to rebuilding, so prefetching is never a correctness input.
    if prebuilt is not None and prebuilt_spec is not None and _same_run_spec(
        prebuilt_spec, run_spec
    ):
        ds = prebuilt
        est_bytes, num_blocks = None, None
        stage_barrier = False  # prefetch already materialized it
    else:
        ds, est_bytes, num_blocks = _build_normalized(
            files, run_spec, batch_size, schemas
        )
    if stage_barrier == "auto":
        # Barrier pays when the working set is modest or CPUs scarce
        # (fused sort-map/normalize interleaving thrashes: ~1.8x slower
        # at 4 CPUs on 18M events; neutral at 16-32). At large volumes
        # the materialization cost and lost read/sort overlap flip the
        # sign (~30% slower at 90M events), so stream instead.
        import ray as _ray

        _ncpu = int(_ray.cluster_resources().get("CPU", 8))
        stage_barrier = est_bytes <= (4 << 30) or _ncpu <= 8
    import time as _time

    _timing = bool(os.environ.get("GRAFT_PHASE_TIMING"))
    _t0 = _time.perf_counter()
    if stage_barrier:
        ds = ds.materialize()
    _t_norm = _time.perf_counter() - _t0

    current_files = (
        {int(k): list(v) for k, v in parent.partitions.items()} if parent else {}
    )
    merge_kwargs = {
        "lake_dir": store.lake_dir,
        "spec": run_spec,
        "current_files": current_files,
        "max_rows_per_file": max_rows_per_file,
        "delta_threshold": delta_threshold,
    }
    if merge_compute == "actors":
        # Actor-pool merge: state (spec, schemas, current-file map) is
        # built once per actor. Leave ~1/4 of the CPUs for the read +
        # normalize + shuffle stages: a pool that reserves every CPU
        # starves the upstream tasks and the pipeline deadlocks.
        if merge_concurrency is None:
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 8))
            merge_concurrency = max(1, min(run_spec.num_partitions, (3 * ncpu) // 4))
        results = ds.groupby("part_id").map_groups(
            PartitionMerger,
            fn_constructor_kwargs=merge_kwargs,
            batch_format="pyarrow",
            concurrency=merge_concurrency,
            num_cpus=1,
        )
    elif (exchange or os.environ.get("GRAFT_EXCHANGE", "sort")) in (
        "direct",
        "inflight",
    ):
        # Sort-free direct exchange (stages/exchange.py): part_id
        # boundaries are known a priori, so skip Ray's sort-based
        # groupby entirely - split each normalized block into per-
        # partition shards (num_returns=P) and reduce per partition.
        # "inflight" additionally folds each partition's shards every
        # round_blocks map blocks, bounding in-flight shuffle volume by
        # the round, not the commit (commits larger than memory).
        from ..stages.exchange import direct_exchange_merge, inflight_exchange_merge

        merger = PartitionMerger(**merge_kwargs)
        results = None
        mode = exchange or os.environ.get("GRAFT_EXCHANGE", "sort")
        fan = int(os.environ.get("GRAFT_EXCHANGE_FANIN", 64))
        if mode == "inflight":
            rows = inflight_exchange_merge(
                ds, run_spec.num_partitions, merger, round_blocks=fan
            )
        else:
            rows = direct_exchange_merge(
                ds, run_spec.num_partitions, merger, fan_in=fan
            )
    else:
        # Task-based merge (default): the merger's state rides along as
        # a serialized-once closure, tasks schedule elastically with no
        # pool-startup cost (measured ~1.7x faster end-to-end at 20M
        # events on 32 CPUs) and restart safety comes from COW writes +
        # the manifest commit, not actor lifetime.
        merger = PartitionMerger(**merge_kwargs)
        results = ds.groupby("part_id").map_groups(
            merger.__call__, batch_format="pyarrow"
        )

    # -- tiny driver-side collect + atomic commit ----------------------
    _t0 = _time.perf_counter()
    if results is not None:
        rows = results.take_all()
    if _timing:
        import sys as _sys

        print(
            f"[phase] files={len(files)} normalize={_t_norm:.2f}s "
            f"shuffle+merge+write={_time.perf_counter() - _t0:.2f}s "
            f"barrier={stage_barrier} blocks={num_blocks}",
            file=_sys.stderr,
        )
    partitions = dict(parent.partitions) if parent else {}
    lineage: dict[str, dict] = {}
    quarantine = list(parent.quarantine) if parent else []
    agg: dict[str, int] = {}
    max_seq = parent.watermark if parent else -1
    min_ts_us: int | None = None
    max_ts_us: int | None = None
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
        if r["min_ts_us"] is not None:
            v = int(r["min_ts_us"])
            min_ts_us = v if min_ts_us is None else min(min_ts_us, v)
        if r["max_ts_us"] is not None:
            v = int(r["max_ts_us"])
            max_ts_us = v if max_ts_us is None else max(max_ts_us, v)

    # observed-lateness watermark: only CROSS-commit earliness counts
    # (a later commit's min ts below the running max event ts)
    prev_max_ts = parent.max_event_ts_us if parent else None
    max_lateness = parent.max_lateness_us if parent else 0
    if prev_max_ts is not None and min_ts_us is not None and min_ts_us < prev_max_ts:
        max_lateness = max(max_lateness, prev_max_ts - min_ts_us)
    new_max_ts = max(
        v for v in (prev_max_ts, max_ts_us) if v is not None
    ) if (prev_max_ts is not None or max_ts_us is not None) else None

    applied, applied_watermarks = _compact_checkpoint(
        list(parent.applied) if parent else [],
        dict(parent.applied_watermarks) if parent else {},
        files,
    )
    manifest = Manifest(
        version=store.next_version(),
        parent_version=parent_version,
        created_at=now or _now_iso(),
        schema=[(f.name, str(f.type)) for f in run_spec.payload_schema],
        schema_ipc=schema_to_ipc(run_spec.payload_schema),
        partitions=partitions,
        applied=applied,
        applied_watermarks=applied_watermarks,
        watermark=int(max_seq),
        max_event_ts_us=new_max_ts,
        max_lateness_us=int(max_lateness),
        metrics=agg,
        lineage=lineage,
        quarantine=quarantine,
        partitioning=_partitioning_of(run_spec),
    )
    committed = store.commit(manifest)
    # S6 analogue: partition-ready events for downstream gates/consumers
    from ..state.events import emit_partition_ready

    emit_partition_ready(store.lake_dir, committed)
    return committed


def _sample_hot_keys(
    files: list[str], spec: TableSpec, threshold: float = 0.05
) -> tuple[str, ...]:
    """Cheap driver-side hot-key probe: read the conv_id column of the
    first pending file and flag keys above ``threshold`` frequency
    (SURVEY §4 skew row). At scale this would sample row groups."""
    key = spec.key_cols[0]
    tbl = fs_for(files[0]).read_parquet(files[0], columns=[key])
    counts = pc.value_counts(tbl[key].combine_chunks())
    n = len(tbl)
    hot = [
        d["values"]
        for d in counts.to_pylist()
        if d["counts"] / max(n, 1) >= threshold
    ]
    return tuple(h for h in hot if h is not None)


#: legacy alias - lossless parsing (raises on unknown) lives in state.manifest
_parse_type = parse_type_string


def _compact_checkpoint(
    applied: list[str], watermarks: dict[str, str], new_files: list[str]
) -> tuple[list[str], dict[str, str]]:
    """Fold newly-applied files into the watermark+exceptions
    checkpoint (the DDB-TTL analogue, ``dynamodb_table/main.tf:10-24``:
    the reference lets idempotency records expire; we advance a
    per-directory watermark instead, keeping only out-of-order
    exceptions explicit).

    For each directory touched, the watermark advances over the
    CURRENT listing as long as every listed file is applied; applied
    files beyond the first gap stay in the exception list. Files that
    have vanished from the listing are absorbed (they can never be
    rediscovered). Manifest size stays O(dirs + out-of-order files)
    for an always-on tailer committing a 10^10-event stream."""
    def canon(p: str) -> str:
        return p if "://" in p else os.path.abspath(p)

    def parent(p: str) -> str:
        return p.rsplit("/", 1)[0] if "://" in p else os.path.dirname(p)

    pool = {canon(p) for p in applied}
    pool |= {canon(p) for p in new_files}
    wms = dict(watermarks)
    for d in sorted({parent(p) for p in pool}):
        listing = sorted(
            canon(d + "/" + name)
            for name in fs_for(d).listdir(d)
            if name.endswith(".parquet")
        )
        wm = wms.get(d)
        for p in listing:
            if wm is not None and p <= wm:
                continue
            if p in pool:
                wm = p
            else:
                break
        if wm is not None:
            wms[d] = wm
            pool = {p for p in pool if parent(p) != d or p > wm}
    return sorted(pool), wms


def apply_dataset(
    events,
    lake_dir: str,
    spec: TableSpec | None = None,
    *,
    label: str,
    **apply_kwargs,
) -> list[Manifest]:
    """MERGE INTO from an in-memory or streamed change batch: stage the
    batch (Dataset / pandas / Arrow of CDC envelope rows) atomically
    under ``<lake>/_ingest/<label>/`` and run the ordinary exactly-once
    apply. ``label`` names the logical batch; replaying the same label
    reuses the staged files and the apply is a no-op - the producer
    half of exactly-once for derived change streams."""
    from ..sources.changelog import stage_changes

    files = stage_changes(events, lakefs(lake_dir).full("_ingest", label))
    return apply_changes(files, lake_dir, spec, **apply_kwargs)


# ---------------------------------------------------------------------------
# Reading the committed table
# ---------------------------------------------------------------------------


def _empty_like(m, columns=None) -> rd.Dataset:
    """Empty Dataset with the right schema for a pruned-to-nothing (or
    missing) lake read: the manifest's payload schema when a manifest
    exists (derived lakes - search index, rollups - have their own),
    the transcript schema only when there is no manifest to ask,
    projected to the requested columns either way."""
    if m is None:
        from ..schema import TRANSCRIPT_SCHEMA

        sch = TRANSCRIPT_SCHEMA
    else:
        sch = manifest_payload_schema(m)
    if columns:
        sch = pa.schema([sch.field(c) for c in columns if c in sch.names])
    return rd.from_arrow(sch.empty_table())


def conv_partitions(m, conv_ids: list[str]) -> set[int]:
    """The partition ids that can hold the given conversations under
    the manifest's recorded partitioning - the ONE reader-side copy of
    the writer's hash + hot-key-salt formula (schema.assign_part_id);
    used by point lookups and forget_keys."""
    import numpy as np

    from ..schema import hash_strings

    pp = m.partitioning
    P = pp["num_partitions"]
    hot = set(pp.get("hot_keys", ()))
    salt_k = pp.get("hot_key_salt", 8)
    h = hash_strings(np.array(conv_ids, dtype=object)).astype(np.uint64)
    parts: set[int] = set()
    # the Knuth-hash salt add wraps mod 2^64 BY DESIGN; errstate keeps
    # numpy's scalar-overflow warning from masking real ones elsewhere
    with np.errstate(over="ignore"):
        for cid, hv in zip(conv_ids, h):
            if cid in hot:
                for s in range(salt_k):
                    parts.add(
                        int((hv + np.uint64(s) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(P))
                    )
            else:
                parts.add(int(hv % np.uint64(P)))
    return parts


def read_conversations(
    lake_dir: str,
    conv_ids: list[str],
    version: int | None = None,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Partition-pruned read: compute the (salted) partitions that can
    contain the requested conversations from the manifest's recorded
    partitioning and read ONLY those files - the payoff of hashing the
    lake by conv_id (a point lookup touches 1/P of the data; a hot
    salted conversation touches its k sub-partitions)."""

    store = ManifestStore(lake_dir)
    m = store.load(version)
    if m is None:
        return _empty_like(None, columns)
    parts = conv_partitions(m, conv_ids)
    sub = {pid: files for pid, files in m.partitions.items() if int(pid) in parts}
    # second pruning level: per-FILE zone maps (min/max key recorded at
    # write time; chunks are key-sorted, so ranges are tight). A point
    # lookup in a partition of many multi-million-row files reads only
    # the file(s) whose key range can contain the key. Files without a
    # recorded range (older manifests, non-string keys) are always
    # read; a pruned file contains NO rows (data or tombstone) for the
    # requested keys, so dropping it cannot change the LWW merge.
    import bisect

    wanted_sorted = sorted(set(conv_ids))

    def may_contain(f: dict) -> bool:
        kmin, kmax = f.get("key_min"), f.get("key_max")
        if kmin is None or kmax is None:
            return True
        i = bisect.bisect_left(wanted_sorted, kmin)
        return i < len(wanted_sorted) and wanted_sorted[i] <= kmax

    sub = {
        pid: kept
        for pid, files in sub.items()
        if (kept := [f for f in files if may_contain(f)])
    }
    # third pruning level: per-file key Bloom sidecars (written by
    # file_entry). Ranges cannot prune a file that merely STRADDLES a
    # wanted key - common once LSM delta runs overlap - but the bloom
    # answers "is any wanted key possibly in this file" with ~1% FP at
    # a ~10-bits/key sidecar read, far cheaper than the parquet read it
    # avoids. No false negatives, so dropping a bloom-negative file
    # cannot change the LWW merge; missing/corrupt sidecars mean
    # "read".
    if any(f.get("bloom") for files in sub.values() for f in files):
        from ..functions.bloom import sidecar_tester

        bloom_may = sidecar_tester(lakefs(lake_dir))
        sub = {
            pid: kept
            for pid, files in sub.items()
            if (kept := [f for f in files if bloom_may(f, wanted_sorted)])
        }
    if not any(sub.values()):
        return _empty_like(m, columns)
    ds = _read_lake_partitions(lake_dir, sub, m)
    # filter on the manifest's LEADING KEY column: "conversations" is
    # the transcript lake's name for it, but derived lakes (search
    # index keyed on term, rollups keyed on conv_id) share this exact
    # point-lookup path
    key0 = m.partitioning.get("key_cols", ("conv_id",))[0]
    want = set(conv_ids)

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key0], value_set=pa.array(list(want)))
        return batch.filter(mask)

    ds = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_key_range(
    lake_dir: str,
    lo: str,
    hi: str,
    version: int | None = None,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Range scan ``lo <= key <= hi`` (lexicographic on the leading key
    column, e.g. a ``conv_`` prefix scan). Hash partitioning cannot
    prune partitions for a RANGE, but the per-FILE zone maps can: only
    files whose recorded ``[key_min, key_max]`` intersects ``[lo, hi]``
    are read — at 100 TB a partition holds many key-sorted files and a
    narrow range touches one or two per partition. Rows are then
    exact-filtered per batch. Files without a recorded range are always
    read (pruning is an optimization, never a correctness dependency)."""
    store = ManifestStore(lake_dir)
    m = store.load(version)
    if m is None:
        return _empty_like(None, columns)

    def may_overlap(f: dict) -> bool:
        kmin, kmax = f.get("key_min"), f.get("key_max")
        if kmin is None or kmax is None:
            return True
        return kmin <= hi and lo <= kmax

    sub = {
        pid: kept
        for pid, files in m.partitions.items()
        if (kept := [f for f in files if may_overlap(f)])
    }
    if not any(sub.values()):
        return _empty_like(m, columns)
    key0 = m.partitioning.get("key_cols", ("conv_id",))[0]
    read_cols = (
        list(dict.fromkeys([*columns, key0])) if columns else None
    )
    ds = _read_lake_partitions(lake_dir, sub, m, columns=read_cols)

    def keep(batch: pa.Table) -> pa.Table:
        col = batch[key0]
        mask = pc.and_(
            pc.greater_equal(col, pa.scalar(lo)),
            pc.less_equal(col, pa.scalar(hi)),
        )
        return batch.filter(mask)

    ds = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def _key_disjoint(files: list[dict]) -> bool:
    """True iff the partition's files provably hold pairwise-disjoint
    key ranges (every key's full history lives in ONE file) - the
    condition under which pruning whole files by a secondary column is
    LWW-safe. Holds for a single run's key-sorted chunks; fails (by
    range overlap or missing zone maps) once delta-append runs stack
    versions of the same key across files."""
    ranges = []
    for f in files:
        kmin, kmax = f.get("key_min"), f.get("key_max")
        if kmin is None or kmax is None:
            return False
        ranges.append((kmin, kmax))
    ranges.sort()
    return all(ranges[i - 1][1] < ranges[i][0] for i in range(1, len(ranges)))


def _single_run(files: list[dict]) -> bool:
    """True iff every file of the partition belongs to the SAME write
    run (shared ``run`` id stamped by the writer): the whole partition
    was LWW-reduced in one rewrite, so no file can hold a superseded
    version of a key in another file — secondary-column pruning is
    LWW-safe even when key ranges overlap (the Z-ordered layout
    ``compact(cluster_by=...)`` produces). Older manifests without the
    field get no claim (falls back to ``_key_disjoint``)."""
    runs = {f.get("run") for f in files}
    return len(runs) == 1 and None not in runs


def _prune_safe(files: list[dict]) -> bool:
    """File-level pruning by a NON-key column is allowed iff the
    partition provably holds each key's full history in one file:
    either disjoint key ranges (key-sorted single-run chunks) or a
    shared write-run id (any single-run layout, incl. Z-ordered)."""
    return _single_run(files) or _key_disjoint(files)


def read_time_range(
    lake_dir: str,
    ts_from,
    ts_to,
    version: int | None = None,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Time-ranged scan of the CURRENT table state:
    ``ts_from <= ts <= ts_to`` on the LWW-merged rows. Per-file ts
    zone maps (``file_entry``) skip whole files - but only inside
    partitions where that is provably LWW-safe (``_prune_safe``:
    pairwise-disjoint key ranges, or one shared write run): with delta runs stacked, a key's winning
    version may sit in one file and a superseded version in another,
    so pruning a file could resurrect a stale row. Such partitions are
    read in full and filtered exactly; compaction restores their
    prunability. Pruning effectiveness is data-dependent (keys minted
    over time => tight per-chunk ts ranges); correctness never
    depends on it.

    Accepts datetime/pandas.Timestamp/ISO strings (naive = UTC-less
    lake time, matching the ``ts`` column's timezone-free µs unit)."""
    import pandas as _pd

    lo_us = int(_pd.Timestamp(ts_from).value // 1_000)
    hi_us = int(_pd.Timestamp(ts_to).value // 1_000)
    store = ManifestStore(lake_dir)
    m = store.load(version)
    if m is None:
        return _empty_like(None, columns)

    def may_overlap(f: dict) -> bool:
        tmin, tmax = f.get("ts_min"), f.get("ts_max")
        if tmin is None or tmax is None:
            return True
        return tmin <= hi_us and lo_us <= tmax

    sub: dict[str, list[dict]] = {}
    for pid, files in m.partitions.items():
        if not files:
            continue
        kept = (
            [f for f in files if may_overlap(f)]
            if _prune_safe(files)
            else list(files)
        )
        if kept:
            sub[pid] = kept
    if not sub:
        return _empty_like(m, columns)
    read_cols = list(dict.fromkeys([*columns, "ts"])) if columns else None
    ds = _read_lake_partitions(lake_dir, sub, m, columns=read_cols)

    def keep(batch: pa.Table) -> pa.Table:
        ts_type = batch.schema.field("ts").type
        col = batch["ts"]
        mask = pc.and_(
            pc.greater_equal(col, pa.scalar(lo_us, ts_type)),
            pc.less_equal(col, pa.scalar(hi_us, ts_type)),
        )
        return batch.filter(mask)

    ds = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_where(
    lake_dir: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Predicate-pruned scan of the current state:
    ``lo <= col <= hi`` on any primitive payload column, using the
    generic per-file zone maps (``file_entry`` records min/max of every
    primitive column at write time). The same LWW-safety rule as
    ``read_time_range`` applies: files are pruned only where provably
    LWW-safe (``_prune_safe``: disjoint key ranges or one shared write
    run - a pruned file in a delta-run stack could resurrect a
    superseded row);
    other partitions are read in full. Rows are then exact-filtered.
    Timestamp predicates accept datetime/Timestamp/ISO strings."""
    store = ManifestStore(lake_dir)
    m = store.load(version)
    if m is None:
        return _empty_like(None, columns)
    payload = manifest_payload_schema(m)
    if col not in payload.names:
        raise KeyError(f"unknown column {col!r}; lake has {payload.names}")
    col_type = payload.field(col).type
    if pa.types.is_timestamp(col_type):
        import pandas as _pd

        lo_v = int(_pd.Timestamp(lo).value // 1_000)
        hi_v = int(_pd.Timestamp(hi).value // 1_000)
        lo_s, hi_s = pa.scalar(lo_v, col_type), pa.scalar(hi_v, col_type)
    else:
        lo_v, hi_v = lo, hi
        lo_s, hi_s = pa.scalar(lo, col_type), pa.scalar(hi, col_type)

    def may_overlap(f: dict) -> bool:
        rng = (f.get("stats") or {}).get(col)
        if not rng:
            return True
        return rng[0] <= hi_v and lo_v <= rng[1]

    sub: dict[str, list[dict]] = {}
    for pid, files in m.partitions.items():
        if not files:
            continue
        kept = (
            [f for f in files if may_overlap(f)]
            if _prune_safe(files)
            else list(files)
        )
        if kept:
            sub[pid] = kept
    if not sub:
        return _empty_like(m, columns)
    read_cols = list(dict.fromkeys([*columns, col])) if columns else None
    ds = _read_lake_partitions(lake_dir, sub, m, columns=read_cols)

    def keep(batch: pa.Table) -> pa.Table:
        c = batch[col]
        mask = pc.and_(pc.greater_equal(c, lo_s), pc.less_equal(c, hi_s))
        return batch.filter(pc.fill_null(mask, False))

    ds = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_table(
    lake_dir: str,
    version: int | None = None,
    columns: list[str] | None = None,
    include_internal: bool = False,
    keep_tombstones: bool = False,
) -> rd.Dataset:
    """Dataset over the committed lake state at ``version`` (default
    CURRENT): tombstones filtered, internal columns dropped, old files
    padded with nulls for columns added later (schema evolution).

    Rows within each partition file are already sorted by
    ``(conv_id, turn_idx)`` (stable turn ordering, SURVEY §2.6 O4)."""
    store = ManifestStore(lake_dir)
    m = store.load(version)
    if m is None or not m.all_files():
        empty = _empty_like(m, columns)
        if include_internal:
            sch = pa.schema(
                list(empty.schema().base_schema)
                + [pa.field("_deleted", pa.bool_()),
                   pa.field("_seq", pa.int64())]
            )
            return rd.from_arrow(sch.empty_table())
        return empty

    return _read_lake_partitions(
        lake_dir, m.partitions, m,
        include_internal=include_internal, keep_tombstones=keep_tombstones,
        columns=columns,
    )


def _read_lake_partitions(
    lake_dir: str,
    partitions: dict[str, list[dict]],
    m: Manifest,
    include_internal: bool = False,
    keep_tombstones: bool = False,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Partition-parallel lake reader with LWW merge-on-read.

    A partition may hold multiple RUNS (delta-append commits since the
    last compaction); the reader concatenates a partition's runs,
    LWW-reduces when there is more than one file (files of a single
    run hold disjoint key ranges, so single-file partitions skip the
    reduce), filters tombstones and conforms to the manifest schema.
    One task per partition - the same parallelism the merge used.

    ``columns`` pushes projection into the parquet READ (only the
    requested columns plus the merge-internal ones — key cols, ts,
    _seq, _deleted — leave storage; a 2-column scan of a wide lake
    reads 2 columns' pages, not the row). Old files lacking evolved
    columns are footer-checked and null-padded as before."""
    payload = manifest_payload_schema(m)
    if columns:
        missing = [c for c in columns if c not in payload.names]
        if missing:
            raise KeyError(f"unknown columns {missing}; lake has {payload.names}")
        target = pa.schema([payload.field(c) for c in columns])
    else:
        target = payload
    if include_internal:
        target = pa.schema(
            list(target)
            + [pa.field("_deleted", pa.bool_()), pa.field("_seq", pa.int64())]
        )
    items = [
        {"files": json.dumps([f["path"] for f in files])}
        for files in partitions.values()
        if files
    ]
    if not items:
        return rd.from_arrow(target.empty_table())

    from ..schema import lww_reduce
    from ..stages.merge import conform_to_schema

    key_cols = tuple(m.partitioning.get("key_cols", ("conv_id", "turn_idx")))
    payload_need = (
        [c for c in payload.names
         if c in {*columns, *key_cols, "ts"}]
        if columns
        else payload.names
    )
    internal = pa.schema(
        [payload.field(c) for c in payload_need]
        + [pa.field("_deleted", pa.bool_()), pa.field("_seq", pa.int64())]
    )

    def read_partition(batch: pa.Table) -> pa.Table:
        fs = lakefs(lake_dir)  # process-local, rebuilt from the URI
        out = []
        for row in batch.to_pylist():
            paths = json.loads(row["files"])
            tbls = []
            for p in paths:
                fp = fs.full(p)
                have = set(fs.read_parquet_schema(fp).names)
                tbls.append(
                    conform_to_schema(
                        fs.read_parquet(
                            fp,
                            columns=[c for c in internal.names if c in have],
                        ),
                        internal,
                    )
                )
            t = pa.concat_tables(tbls)
            if len(paths) > 1:
                t = lww_reduce(t, key_cols, "ts", "_seq")
            if not keep_tombstones:
                t = t.filter(pc.invert(pc.fill_null(t["_deleted"], False)))
            out.append(conform_to_schema(t, target))
        return pa.concat_tables(out) if out else target.empty_table()

    return rd.from_items(items).map_batches(
        read_partition, batch_format="pyarrow", batch_size=1
    )
