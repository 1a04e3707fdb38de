"""Schema DDL over the lake: ADD COLUMN / DROP COLUMN, metadata-only.

The reference evolves schemas implicitly (Glue crawler picks up new
Parquet columns; there is no explicit DDL in the data plane) and this
engine evolves additively from changelog footers (``_derive_run_spec``).
Explicit DDL closes the remaining gap: changing the table's shape
WITHOUT waiting for data that exercises it — and without touching a
single data file.

Both statements commit an ordinary manifest version whose ``partitions``
entry is byte-identical to the parent's — O(1) data work on a 100-TB
lake. They lean entirely on reader machinery that already exists:

- ADD: readers null-pad files lacking manifest columns (the schema-
  evolution path), so a column added by DDL reads as NULL everywhere
  until data arrives for it.
- DROP: readers project files down to the manifest schema
  (``_read_lake_partitions`` reads only manifest-named columns), so a
  dropped column disappears from every read — including time-travel
  reads AT OR AFTER this version; earlier versions still show it
  (the manifest IS the schema history).

CDC interplay, stated: a later changelog that still carries a dropped
column re-adds it under ``extra_columns="keep"`` (additive evolution is
driven by event footers); a compliance drop must also stop the column
upstream, the same contract as ``forget_keys`` vs late events. Key
columns and ``ts`` are structural and cannot be dropped. ``compact``
conforms every partition it REWRITES to the current manifest schema,
so a dropped column's bytes leave storage as partitions compact
(``compact(min_files_to_compact=1)`` forces the full sweep).
"""

from __future__ import annotations

import datetime

import pyarrow as pa

from ..schema import TableSpec, default_spec
from ..state.manifest import (
    Manifest,
    ManifestStore,
    manifest_payload_schema,
    schema_to_ipc,
)


def _now_iso() -> str:
    return datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.%fZ"
    )


def _commit_schema(store: ManifestStore, m: Manifest, schema: pa.Schema,
                   op: str, col: str) -> Manifest:
    new = Manifest(
        version=store.next_version(),
        parent_version=m.version,
        created_at=_now_iso(),
        schema=[(f.name, str(f.type)) for f in schema],
        schema_ipc=schema_to_ipc(schema),
        partitions=m.partitions,  # untouched: metadata-only DDL
        applied=m.applied,
        applied_watermarks=m.applied_watermarks,
        watermark=m.watermark,
        max_event_ts_us=m.max_event_ts_us,
        max_lateness_us=m.max_lateness_us,
        metrics={"ddl": op, "column": col},
        lineage={},
        quarantine=m.quarantine,
        partitioning=m.partitioning,
    )
    return store.commit(new)


def add_column(
    lake_dir: str, name: str, dtype: pa.DataType | str,
    spec: TableSpec | None = None,
) -> Manifest:
    """``ALTER TABLE lake ADD COLUMN name dtype`` — O(1): commits a new
    version whose schema appends the column; every existing row reads
    as NULL for it (reader null-padding). Fails on duplicate names."""
    if isinstance(dtype, str):
        from ..state.manifest import parse_type_string

        dtype = parse_type_string(dtype)
    store = ManifestStore(lake_dir)
    m = store.load()
    if m is None:
        raise FileNotFoundError(f"no committed version at {lake_dir}")
    payload = manifest_payload_schema(m)
    if name in payload.names:
        raise ValueError(f"column {name!r} already exists")
    return _commit_schema(
        store, m, payload.append(pa.field(name, dtype)), "add_column", name
    )


def drop_column(
    lake_dir: str, name: str, spec: TableSpec | None = None,
) -> Manifest:
    """``ALTER TABLE lake DROP COLUMN name`` — O(1): commits a new
    version whose schema omits the column; readers project it away
    (data file bytes remain until the next ``compact`` rewrites to the
    current schema). Key columns and ``ts`` are structural."""
    spec = spec or default_spec()
    store = ManifestStore(lake_dir)
    m = store.load()
    if m is None:
        raise FileNotFoundError(f"no committed version at {lake_dir}")
    # the LAKE's structural columns, not the default spec's: a lake
    # committed with custom key_cols records them in the manifest
    key_cols = tuple(m.partitioning.get("key_cols") or spec.key_cols)
    protected = set(key_cols) | {"ts"}
    if name in protected:
        raise ValueError(
            f"cannot drop {name!r}: key columns and ts are structural"
        )
    payload = manifest_payload_schema(m)
    if name not in payload.names:
        raise KeyError(f"unknown column {name!r}; lake has {payload.names}")
    idx = payload.names.index(name)
    return _commit_schema(
        store, m, payload.remove(idx), "drop_column", name
    )
