"""Incremental materialized rollup maintained from the change data feed.

A dashboard aggregate over a 100-TB lake (per-conversation turn counts,
sizes, recency) cannot be recomputed from scratch on every commit. This
module maintains the rollup INCREMENTALLY, as a composition of the
engine's own primitives, with zero new distributed machinery:

* ``table_changes`` (the CDF) names exactly the keys whose visible
  state changed between the last refresh and CURRENT - only partitions
  whose file lists differ are read, so the cost of *finding* the work
  is O(delta), never O(lake).
* The affected conversations are then re-aggregated from the source
  lake via ``read_conversations`` - the partition-pruned, zone-mapped
  point-read path - so the cost of *doing* the work is
  O(affected conversations), never O(lake).
* The rollup itself IS a lake table keyed on ``conv_id``, maintained by
  the same ``apply_changes`` upsert path as any other table: the
  refresh emits an ordinary change stream (U rows with the new
  aggregates, D rows for conversations that vanished) into a staged
  changelog and applies it - inheriting hash partitioning, exactly-once
  manifest commits, kill-resume, time travel and its own change feed
  (a downstream consumer can subscribe to the ROLLUP's CDF).

Exactly-once refresh: the staged changelog for a version range is
written once behind a ``_STAGED`` marker and reused on replay; the
consumer checkpoint (last source version folded in) advances only
after the apply commits. A crash anywhere re-derives the same
deterministic range and re-applies the same staged files, which the
object-level idempotency checkpoint turns into a no-op - the same
contract as ``follow_changes`` + ingest.

Reference parity: the reference's downstream aggregates are Athena
full-scans over silver (Instructions.md:122-131) re-run per dashboard
refresh; partition-ready SNS events (lambdas/transform/app.py:117-131)
tell a consumer THAT something changed but the consumer still re-reads
whole partitions. This module is the incremental-refresh surface that
setup is missing.

Driver-side bounds, stated: the refresh collects (a) the affected
conv_ids and (b) one partial-aggregate row per (affected conv, batch
containing it). Both are O(delta), independent of lake size - the same
bound as the staged change files themselves. Conversations are
partition-local and files are key-sorted, so an affected conv's rows
concentrate in a handful of batches.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..schema import TS_TYPE, DQRules, TableSpec, default_spec
from ..sources.changelog import list_changelog_files, stage_changes
from ..state.manifest import ManifestStore, _atomic_write
from .cdc import apply_changes, read_conversations
from .cdf import table_changes

ROLLUP_KEY = "conv_id"

#: payload columns the rollup maintains per conversation
ROLLUP_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("n_turns", pa.int64()),
        pa.field("n_user_turns", pa.int64()),
        pa.field("n_chars", pa.int64()),
        pa.field("last_ts", TS_TYPE),
    ]
)


def rollup_spec(num_partitions: int = 16) -> TableSpec:
    """TableSpec for the conversation-rollup lake. Key = conv_id; the
    envelope ``ts`` of every refresh event is derived from the SOURCE
    version being folded in, so LWW ordering == refresh ordering and a
    replayed refresh can never regress a newer one."""
    fields = list(ROLLUP_SCHEMA)
    fields.append(pa.field("ts", TS_TYPE))
    return default_spec(
        name="conv_rollup",
        key_cols=(ROLLUP_KEY,),
        payload_schema=pa.schema(fields),
        num_partitions=num_partitions,
        hot_keys=(),
        dq=DQRules(
            not_null=(ROLLUP_KEY, "ts"),
            unique=((ROLLUP_KEY,),),
            ranges={},
        ),
    )


def _version_ts(source_version: int) -> pd.Timestamp:
    """Deterministic envelope time for a refresh folding in source
    version v (monotone in v, reproducible across replays)."""
    return pd.Timestamp(source_version, unit="s")


def _partial_agg(batch: pd.DataFrame, user_role: str = "user") -> pd.DataFrame:
    """Per-batch partial rollup: one row per conv_id present in the
    batch. Combinable by (sum, sum, sum, max)."""
    is_user = (batch["role"] == user_role).astype("int64")
    n_chars = batch["text"].str.len().fillna(0).astype("int64")
    g = batch.assign(_u=is_user, _c=n_chars).groupby("conv_id", sort=False)
    out = pd.DataFrame(
        {
            "n_turns": g.size(),
            "n_user_turns": g["_u"].sum(),
            "n_chars": g["_c"].sum(),
            "last_ts": g["ts"].max(),
        }
    ).reset_index()
    out["n_turns"] = out["n_turns"].astype("int64")
    return out


def _combine_partials(parts: pd.DataFrame) -> pd.DataFrame:
    g = parts.groupby("conv_id", sort=False)
    out = pd.DataFrame(
        {
            "n_turns": g["n_turns"].sum(),
            "n_user_turns": g["n_user_turns"].sum(),
            "n_chars": g["n_chars"].sum(),
            "last_ts": g["last_ts"].max(),
        }
    ).reset_index()
    return out


def _ckpt_path(rollup_dir: str) -> str:
    from ..state.lakefs import lakefs

    return lakefs(rollup_dir).full("_source_version.json")


def last_folded_version(rollup_dir: str) -> int:
    """Source version the rollup currently reflects (0 = nothing)."""
    from ..state.lakefs import fs_for

    p = _ckpt_path(rollup_dir)
    if fs_for(p).exists(p):
        return json.loads(fs_for(p).read_text(p))["source_version"]
    return 0


def refresh_rollup(
    source_lake: str,
    rollup_dir: str,
    *,
    num_partitions: int = 16,
    user_role: str = "user",
    **apply_kwargs,
) -> dict:
    """Fold all source commits since the last refresh into the rollup
    lake. ``user_role`` is the role value counted by ``n_user_turns``.
    Returns ``{"from_version", "to_version", "affected", "deleted",
    "committed"}``; a no-op when the source hasn't moved.
    """
    store = ManifestStore(source_lake)
    cur_m = store.load()
    cur = cur_m.version if cur_m else 0
    last = last_folded_version(rollup_dir)
    if cur <= last:
        return {
            "from_version": last,
            "to_version": last,
            "affected": 0,
            "deleted": 0,
            "committed": 0,
        }

    # 1. what changed? (CDF: reads only partitions whose files differ).
    # Empty diff groups can arrive as schemaless blocks (Ray map_groups
    # artifact) - pin the one column we need per batch.
    feed = table_changes(source_lake, last, cur)

    def _keys(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "conv_id" not in b.column_names:
            return pa.table({"conv_id": pa.array([], pa.string())})
        return pa.table({"conv_id": b["conv_id"].cast(pa.string())})

    aff_tbl = feed.map_batches(_keys, batch_format="pyarrow").to_pandas()
    affected = sorted(set(aff_tbl["conv_id"].dropna()))

    spec = rollup_spec(num_partitions)
    from ..state.lakefs import fs_for, lakefs

    stage_dir = lakefs(rollup_dir).full("_refresh", f"v{last:08d}-{cur:08d}")
    marker = stage_dir.rstrip("/") + "/_STAGED"

    if affected and not fs_for(marker).exists(marker):
        # 2. re-aggregate ONLY the affected conversations from the
        # pruned point-read path, at the snapshot being folded in
        src = read_conversations(
            source_lake,
            affected,
            version=cur,
            columns=["conv_id", "turn_idx", "role", "text", "ts"],
        )
        partials = src.map_batches(
            _partial_agg,
            batch_format="pandas",
            fn_kwargs={"user_role": user_role},
        ).to_pandas()
        agg = _combine_partials(partials) if len(partials) else pd.DataFrame(
            columns=["conv_id", "n_turns", "n_user_turns", "n_chars", "last_ts"]
        )

        # 3. emit the refresh as an ordinary change stream: U for convs
        # with rows at the target snapshot, D for ones fully deleted
        ts = _version_ts(cur)
        agg["op"] = "U"
        gone = sorted(set(affected) - set(agg["conv_id"]))
        if gone:
            dels = pd.DataFrame({"conv_id": gone})
            for c in ("n_turns", "n_user_turns", "n_chars"):
                dels[c] = pd.Series([pd.NA] * len(gone), dtype="Int64")
            dels["last_ts"] = pd.NaT
            dels["op"] = "D"
            agg = pd.concat([agg, dels], ignore_index=True)
        agg = agg.sort_values("conv_id", ignore_index=True)
        agg["seq"] = range(len(agg))
        agg["ts"] = ts

        tbl = pa.Table.from_pandas(agg, preserve_index=False)
        tbl = tbl.set_column(
            tbl.column_names.index("ts"), "ts", tbl["ts"].cast(TS_TYPE)
        )
        stage_changes(tbl, stage_dir)

    committed = []
    if affected:
        committed = apply_changes(
            list_changelog_files(stage_dir), rollup_dir, spec, **apply_kwargs
        )

    # 4. advance the consumer checkpoint only after the apply committed
    # (crash before this line => same range re-derived, staged files
    # reused, apply is a no-op: exactly-once end to end)
    lakefs(rollup_dir).makedirs(rollup_dir)
    _atomic_write(_ckpt_path(rollup_dir), json.dumps({"source_version": cur}))
    n_deleted = 0
    if affected and committed:
        n_deleted = sum(m.metrics.get("deletes", 0) for m in committed)
    return {
        "from_version": last,
        "to_version": cur,
        "affected": len(affected),
        "deleted": n_deleted,
        "committed": len(committed),
    }


def read_rollup(
    rollup_dir: str, columns: list[str] | None = None, version: int | None = None
) -> rd.Dataset:
    """The maintained aggregate, via the ordinary lake read path
    (snapshot-consistent, partition-pruned, time-travelable)."""
    from .cdc import read_table

    return read_table(rollup_dir, columns=columns, version=version)
