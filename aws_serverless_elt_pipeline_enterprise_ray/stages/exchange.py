"""Sort-free direct exchange for the CDC merge shuffle.

``groupby("part_id")`` routes through Ray Data's sort-based exchange:
sample boundaries, range-partition every block, merge-sort runs into
reduce groups. For the CDC apply that machinery is redundant — the
partition key is a dense integer ``part_id`` in ``[0, P)`` whose
boundaries are known a priori (the writer assigned them), so the
exchange can be a classic two-stage map/reduce shuffle with zero sort
passes:

  map  (one task per normalized block, pipelined with the read):
       stable-argsort the block by part_id once, slice into per-
       partition shards, return them as P separate objects
       (``num_returns=P`` — a reduce task fetches ONLY its shard,
       never the whole block).
  reduce (one task per partition): concat the shards for partition p
       from every map task and run the ordinary ``PartitionMerger``.

Fewer passes over the stream (no boundary sampling, no per-block range
sort, no merge-sort of runs) means strictly less memory traffic — the
binding constraint measured in BASELINE.md — and the all-to-all is
expressed directly in object-store refs with locality-aware fetches.
This is the "sort-free range exchange" follow-up recorded in SURVEY.md;
it drops to raw Ray tasks because Ray Data's Dataset API cannot express
a known-boundary exchange (its hash-shuffle strategy is not stable on
this Ray version, and ``groupby`` always sorts).

Scale notes: map tasks emit M x P shard objects. Shards are Arrow
slices of one contiguous take per block (zero extra copies beyond the
unavoidable exchange copy); empty shards ship as ``None`` markers so a
barely-touched partition costs O(M) null fetches, not O(M) table
fetches. Reduce tasks start as soon as every map task has produced its
shard — with the streaming read upstream, maps pipeline with I/O.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

import ray


def _split_by_part(tbl: pa.Table, num_parts: int):
    """Stable-sort one block by ``part_id`` and slice per-partition
    shards. Returns a ``num_parts``-tuple with ``None`` for empty
    shards (tiny objects — cheap for reduce tasks to skip)."""
    if len(tbl) == 0:
        return tuple([None] * num_parts)
    pids = tbl.column("part_id").to_numpy(zero_copy_only=False)
    order = np.argsort(pids, kind="stable")
    tbl = tbl.take(pa.array(order))
    bounds = np.searchsorted(pids[order], np.arange(num_parts + 1))
    return tuple(
        tbl.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p]))
        if bounds[p + 1] > bounds[p]
        else None
        for p in range(num_parts)
    )


def _combine_shards(key_cols, *shards):
    """Fan-in tier: concat one partition's shards from a GROUP of map
    tasks into a single object, pre-reducing duplicates with the hash
    LWW combiner (quarantined rows pass through untouched — the
    authoritative merge re-reduces on the true keys). Bounds both the
    final reduce's argument count and the bytes it fetches."""
    import pyarrow.compute as pc

    from ..schema import lww_combine_fast

    tables = [s for s in shards if s is not None]
    if not tables:
        return None
    tbl = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    good_mask = pc.is_null(tbl["_bad"])
    bad = tbl.filter(pc.invert(good_mask))
    red = lww_combine_fast(tbl.filter(good_mask), key_cols, "ts", "seq")
    return pa.concat_tables([red, bad]) if len(bad) else red


def _reduce_partition(merger, *shards):
    """Concat the non-empty shards of one partition and run the
    ordinary merge. Returns the merger's 1-row result table (or its
    empty table for an untouched partition)."""
    tables = [s for s in shards if s is not None]
    if not tables:
        return merger(pa.table({}))
    return merger(pa.concat_tables(tables) if len(tables) > 1 else tables[0])


def direct_exchange_merge(
    ds,
    num_parts: int,
    merger,
    *,
    reduce_num_cpus: float = 1,
    fan_in: int = 64,
) -> list[dict[str, Any]]:
    """Run ``merger`` over every partition of ``ds`` (a normalized
    Dataset carrying ``part_id``) via the sort-free exchange. Returns
    the same row dicts ``groupby("part_id").map_groups(...).take_all()``
    yields, skipping untouched partitions.

    The merger is ``ray.put`` once and shared by every reduce task
    (broadcast, not per-task serialization). When a commit spans more
    than ``fan_in`` map blocks, a tree of combine tasks (concat + hash
    LWW pre-reduce per group of ``fan_in`` shards) bounds the final
    reduce's argument count and fetch volume — O(log_{fan_in} M) tiers,
    so a 100 TB commit with tens of thousands of blocks never hands one
    task an unbounded ref list."""
    split = ray.remote(_split_by_part)
    combine = ray.remote(_combine_shards)
    reduce = ray.remote(_reduce_partition)

    merger_ref = ray.put(merger)
    map_refs: list[Any] = []
    # iterating ref bundles drives the (streaming) upstream execution;
    # split tasks launch as blocks materialize, overlapping with reads
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            refs = split.options(num_returns=num_parts).remote(
                block_ref, num_parts
            )
            if num_parts == 1:
                refs = [refs]
            map_refs.append(refs)

    if not map_refs:
        return []

    # shards[p] = list of refs holding partition p's rows
    shards = [[m[p] for m in map_refs] for p in range(num_parts)]
    key_cols = tuple(merger.key_cols)
    while max(len(s) for s in shards) > fan_in:
        shards = [
            [
                combine.remote(key_cols, *s[lo : lo + fan_in])
                for lo in range(0, len(s), fan_in)
            ]
            if len(s) > fan_in
            else s
            for s in shards
        ]

    result_refs = [
        reduce.options(num_cpus=reduce_num_cpus).remote(merger_ref, *s)
        for s in shards
    ]
    rows: list[dict[str, Any]] = []
    for tbl in ray.get(result_refs):
        rows.extend(tbl.to_pylist())
    return rows


def inflight_exchange_merge(
    ds,
    num_parts: int,
    merger,
    *,
    reduce_num_cpus: float = 1,
    round_blocks: int = 64,
) -> list[dict[str, Any]]:
    """Multi-ROUND in-flight variant of ``direct_exchange_merge`` for
    commits larger than aggregate memory: instead of holding every map
    task's P shards until one end-of-commit reduce wave, each partition
    FOLDS its pending shards into one accumulated (hash-LWW
    pre-reduced) object every ``round_blocks`` map blocks, releasing
    the consumed shard refs so the object store frees them while the
    NEXT round's map fan-out is still producing - round r+1's maps
    overlap round r's combines by construction (the self-identified
    SURVEY follow-up; reference analogue: the unbounded SQS fan-out,
    ``README.md:189-206``).

    In-flight volume per partition is therefore bounded by
    ``round_blocks`` raw shards + one accumulated combined shard (whose
    size is capped by the partition's DISTINCT pending keys + its
    quarantined rows, i.e. the true reduce input - duplicates collapse
    every fold), not by the whole commit's map output. Folds of one
    partition chain serially; partitions fold in parallel, and with
    P >> CPUs the chain never starves the cluster. Results are
    identical to the one-shot exchange: same combiner, same final
    authoritative merge per partition."""
    split = ray.remote(_split_by_part)
    combine = ray.remote(_combine_shards)
    reduce = ray.remote(_reduce_partition)

    merger_ref = ray.put(merger)
    key_cols = tuple(merger.key_cols)
    # acc[p]: the partition's folded shard ref (or None); pending[p]:
    # raw shard refs not yet folded
    acc: list[Any] = [None] * num_parts
    pending: list[list[Any]] = [[] for _ in range(num_parts)]
    seen_blocks = 0

    def fold(p: int) -> None:
        prior = [acc[p]] if acc[p] is not None else []
        acc[p] = combine.remote(key_cols, *prior, *pending[p])
        pending[p].clear()  # release raw shard refs -> store can free

    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            refs = split.options(num_returns=num_parts).remote(
                block_ref, num_parts
            )
            if num_parts == 1:
                refs = [refs]
            for p in range(num_parts):
                pending[p].append(refs[p])
            seen_blocks += 1
            if seen_blocks % round_blocks == 0:
                for p in range(num_parts):
                    fold(p)

    if seen_blocks == 0:
        return []
    for p in range(num_parts):
        if pending[p]:
            fold(p)

    result_refs = [
        reduce.options(num_cpus=reduce_num_cpus).remote(merger_ref, acc[p])
        for p in range(num_parts)
    ]
    rows: list[dict[str, Any]] = []
    for tbl in ray.get(result_refs):
        rows.extend(tbl.to_pylist())
    return rows
