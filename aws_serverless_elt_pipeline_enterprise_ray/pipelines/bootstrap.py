"""Initial-snapshot bootstrap: full-table load, then switch to the
change stream (the Debezium "initial snapshot → streaming" phase; the
reference's first-run backfill is the same shape — seed the silver
lake from a bulk export, then let the event pipeline take over,
``scripts/backfill.py`` analogue).

``bootstrap_lake`` turns a plain transcript table (parquet path or
Dataset — NOT a changelog) into the lake's first committed version by
wrapping every row as an insert envelope with ``seq = snapshot_seq``
and running the ordinary exactly-once apply. The changelog can then
be applied from its very beginning WITHOUT an offset handshake:
overlap between the snapshot and the stream is harmless because LWW
by ``(ts, seq)`` is idempotent — a replayed change that produced a
snapshot row carries the same ``ts`` and a real ``seq > snapshot_seq``,
so it wins with identical content; an older change loses to the
snapshot row, exactly as it should.

That no-handshake property is the point: a consistent snapshot
watermark (Debezium's binlog position) is the hard part of real CDC
bootstraps, and the LWW envelope makes it unnecessary here — any
snapshot taken at ANY point of the stream converges to the same final
state once the full stream has been applied (the replay invariant,
verified value-for-value by the ``cdc_bootstrap`` oracle query).

Scale shape: the snapshot read streams (column-pruned parquet →
envelope columns appended per batch, zero-copy Arrow) into the same
salted-shuffle merge as any change batch; nothing about the bootstrap
is a special case after staging.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..schema import TableSpec
from ..state.manifest import Manifest
from .cdc import apply_dataset


def bootstrap_lake(
    snapshot,
    lake_dir: str,
    spec: TableSpec | None = None,
    *,
    snapshot_seq: int = 0,
    label: str = "snapshot-000000",
    **apply_kwargs,
) -> list[Manifest]:
    """Commit a full-table snapshot as the lake's initial state.

    ``snapshot``: a parquet path/dir or a Dataset of TRANSCRIPT rows
    (conv_id, turn_idx, role, text, tool, ts) — no op/seq columns.
    ``snapshot_seq`` must be <= every real change seq (default 0; the
    generator's seqs start at 1). Replaying the same ``label`` reuses
    the staged files, so the bootstrap itself is exactly-once."""
    import pandas as pd

    if isinstance(snapshot, rd.Dataset):
        ds = snapshot
    elif isinstance(snapshot, pd.DataFrame):
        ds = rd.from_pandas(snapshot)
    elif isinstance(snapshot, pa.Table):
        ds = rd.from_arrow(snapshot)
    else:
        ds = rd.read_parquet(snapshot)

    def envelope(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "op": pa.array(["I"] * n, pa.string()),
            "seq": pa.array([snapshot_seq] * n, pa.int64()),
        }
        for name in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
            cols[name] = b[name]
        return pa.table(cols)

    env = ds.map_batches(envelope, batch_format="pyarrow")
    return apply_dataset(env, lake_dir, spec, label=label, **apply_kwargs)
