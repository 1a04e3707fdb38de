"""Targeted key deletion ("right-to-be-forgotten") over the lake.

``forget_keys`` deletes every row of the given conversations through
the engine's own CDC machinery: it synthesizes winning DELETE events
and applies them as a normal changelog, so the operation inherits
exactly-once commit, idempotent resume, replay-safety and LSM/compact
behavior for free - no second deletion code path to keep correct.

Scale shape: discovery rides ``cdc.read_conversations`` (the ONE
implementation of the writer's salted partition pruning), so only
O(|keys|) partitions are read to find the (conv_id, turn_idx) pairs;
the apply then rewrites only those partitions. The driver handles
key-count-sized data only.

Semantics note (CDC, not amnesia): the tombstones win LWW against all
CURRENTLY committed rows (same ts, higher seq). A *later* legitimate
change event for the same key re-creates it - matching CDC semantics;
a compliance pipeline must also stop producing events for the key
upstream. Run ``compact(purge_tombstones=True)`` afterwards to
physically drop the tombstones once the lateness horizon passes.

Reference parity: the reference has no targeted-delete op (deletes
only flow through the change stream, lambdas/shared/schemas.py op
codes); this composes the same D-op path into the bulk operation a
lake operator actually needs.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa

from ..schema import TableSpec, default_spec
from ..state.manifest import ManifestStore
from .cdc import apply_changes, read_conversations


def forget_keys(
    lake_dir: str,
    conv_ids: list[str],
    spec: TableSpec | None = None,
    *,
    staging_dir: str | None = None,
    **apply_kwargs,
):
    """Delete all rows of ``conv_ids`` from the lake. Returns the list
    of committed manifests (empty if the keys hold no rows)."""
    spec = spec or default_spec()
    store = ManifestStore(lake_dir)
    m = store.load()
    if m is None:
        return []

    ds = read_conversations(
        lake_dir, list(conv_ids), columns=["conv_id", "turn_idx", "ts"]
    )
    # driver sees only the forgotten keys' (conv, turn, ts) rows
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=65536))
    if not parts:
        return []
    hits = pa.concat_tables(parts)
    if len(hits) == 0:
        return []

    # winning tombstones: same ts as the committed row, seq above the
    # committed watermark (LWW tiebreak (ts, seq) -> delete wins)
    n = len(hits)
    base_seq = int(m.watermark) + 1
    deletes = pa.table(
        {
            "op": pa.array(["D"] * n, pa.string()),
            "seq": pa.array(np.arange(base_seq, base_seq + n), pa.int64()),
            "conv_id": hits["conv_id"],
            "turn_idx": hits["turn_idx"],
            "role": pa.nulls(n, pa.string()),
            "text": pa.nulls(n, pa.string()),
            "tool": pa.nulls(n, pa.string()),
            "ts": hits["ts"],
        }
    )
    from ..state.lakefs import fs_for, lakefs

    staging = staging_dir or lakefs(lake_dir).full("_staged", "forget")
    sfs = fs_for(staging)
    sfs.makedirs(staging)
    name = f"forget-{m.version:06d}-{uuid.uuid4().hex[:8]}.parquet"
    path = (
        staging.rstrip("/") + "/" + name
        if sfs.is_object
        else os.path.join(staging, name)
    )
    if sfs.is_object:
        sfs.write_parquet(deletes, path)  # object PUT is atomic
    else:
        import pyarrow.parquet as pq

        tmp = path + ".tmp"
        pq.write_table(deletes, tmp)
        os.replace(tmp, path)  # atomic landing, per the tailer contract  # atomic landing, per the tailer contract
    return apply_changes([path], lake_dir, spec, **apply_kwargs)


def expire_rows(
    lake_dir: str,
    older_than,
    spec: TableSpec | None = None,
    *,
    staging_dir: str | None = None,
    **apply_kwargs,
):
    """Retention policy: tombstone every CURRENT row with
    ``ts <= older_than`` through the ordinary exactly-once apply (the
    bulk-expiry sibling of ``forget_keys`` - same single deletion code
    path, same CDC semantics note). Discovery rides ``read_time_range``
    (ts zone maps prune whole files where LWW-safe); the driver sees
    only the expiring keys' (conv, turn, ts) rows. Follow with
    ``compact(purge_tombstones_auto=True)`` to physically drop the
    tombstones once the lateness horizon passes."""
    import pandas as pd

    from .cdc import read_time_range

    spec = spec or default_spec()
    store = ManifestStore(lake_dir)
    m = store.load()
    if m is None:
        return []

    ds = read_time_range(
        lake_dir,
        pd.Timestamp(0),
        older_than,
        columns=["conv_id", "turn_idx", "ts"],
    )
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=65536))
    hits = pa.concat_tables(parts) if parts else None
    if hits is None or len(hits) == 0:
        return []

    n = len(hits)
    base_seq = int(m.watermark) + 1
    deletes = pa.table(
        {
            "op": pa.array(["D"] * n, pa.string()),
            "seq": pa.array(np.arange(base_seq, base_seq + n), pa.int64()),
            "conv_id": hits["conv_id"],
            "turn_idx": hits["turn_idx"],
            "role": pa.nulls(n, pa.string()),
            "text": pa.nulls(n, pa.string()),
            "tool": pa.nulls(n, pa.string()),
            "ts": hits["ts"],
        }
    )
    from ..state.lakefs import fs_for, lakefs

    staging = staging_dir or lakefs(lake_dir).full("_staged", "expire")
    sfs = fs_for(staging)
    sfs.makedirs(staging)
    name = f"expire-{m.version:06d}-{uuid.uuid4().hex[:8]}.parquet"
    path = (
        staging.rstrip("/") + "/" + name
        if sfs.is_object
        else os.path.join(staging, name)
    )
    if sfs.is_object:
        sfs.write_parquet(deletes, path)  # object PUT is atomic
    else:
        import pyarrow.parquet as pq

        tmp = path + ".tmp"
        pq.write_table(deletes, tmp)
        os.replace(tmp, path)  # atomic landing, per the tailer contract
    return apply_changes([path], lake_dir, spec, **apply_kwargs)
