"""Row-level DML over the lake: DELETE WHERE / UPDATE WHERE / MERGE INTO.

The lakehouse surface the reference's downstream consumers get from
Athena+Glue only as full-table rewrites (there is no row-level DML in
the reference at all — deletes/updates only flow through the change
stream, ``lambdas/shared/schemas.py`` op codes): here each statement
SYNTHESIZES winning change events and applies them through the one
exactly-once apply path (``pipelines/cdc.apply_changes``), exactly like
``pipelines/forget`` — so predicate DML inherits atomic commit,
idempotent resume, time travel, LSM/compaction and replay-safety for
free, with no second mutation code path to keep correct.

Scale shape:
- predicates are conjunctions of per-column comparisons that compile to
  BOTH a per-file zone-map test (whole files skip the scan where
  LWW-safe, same ``_prune_safe`` rule as ``read_where``) and one
  vectorized ``pyarrow.compute`` mask per batch;
- matched rows stream distributed end-to-end: the event synthesis is a
  ``map_batches`` and the staged changelog is written by Ray workers
  (``write_parquet``), never collected on the driver — unlike
  ``forget_keys`` (key-count-sized by contract), DML matches can be
  table-sized;
- ``merge_into`` detects matches with ONE co-partitioning
  ``hash_join`` against a projected key scan of the lake (key cols +
  ts only leave storage) — the source is never broadcast, the lake
  never rewrites unmatched partitions.

LWW mechanics: every synthesized event carries ``seq = watermark + 1``
(above every committed ``_seq``) and, for matched-row overrides, the
COMMITTED row's own ``ts`` — so the event wins the (ts, seq) tiebreak
unconditionally and the surviving row keeps its original timestamp.
``merge_into(when_matched="update_if_newer")`` instead carries the
source ts, so the committed row survives when it is strictly newer.
"""

from __future__ import annotations

import dataclasses
import operator
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..schema import TableSpec, default_spec
from ..state.manifest import ManifestStore, manifest_payload_schema
from .cdc import _prune_safe, _read_lake_partitions, apply_changes

#: predicate ops -> (zone-map file test, pyarrow.compute batch kernel)
_RANGE_OPS = {"==", "<", "<=", ">", ">=", "between", "in"}
_OPS = _RANGE_OPS | {"!="}


def _check_pred(where, payload: pa.Schema) -> list[list[tuple]]:
    """Validate + normalize a predicate to DNF: ``where`` is either a
    single conjunction ``[(col, op, val), ...]`` (ANDed) or a
    disjunction of conjunctions ``[[...], [...]]`` (each inner list
    ANDed, groups ORed). Returns the list of groups."""
    if not where:
        raise ValueError(
            "empty predicate: an unconditional statement must say so "
            "explicitly (e.g. ('turn_idx', '>=', 0))"
        )
    if isinstance(where[0], (list,)):
        groups = [list(g) for g in where]
        if not all(groups):
            raise ValueError("empty conjunction group in OR predicate")
    else:
        groups = [list(where)]
    return [_check_conj(g, payload) for g in groups]


def _check_conj(conj, payload: pa.Schema) -> list[tuple]:
    out = []
    for item in conj:
        col, op, val = item[0], item[1], item[2]
        if op not in _OPS:
            raise ValueError(f"unknown predicate op {op!r}; have {sorted(_OPS)}")
        if col not in payload.names:
            raise KeyError(f"unknown column {col!r}; lake has {payload.names}")
        typ = payload.field(col).type
        if pa.types.is_timestamp(typ):
            import pandas as pd

            conv = lambda v: pa.scalar(  # noqa: E731
                int(pd.Timestamp(v).value // 1_000), typ
            )
        else:
            conv = lambda v: pa.scalar(v, typ)  # noqa: E731
        if op == "between":
            lo, hi = val
            val = (conv(lo), conv(hi))
        elif op == "in":
            val = [conv(v) for v in val]
        else:
            val = conv(val)
        out.append((col, op, val))
    return out


def _resolve_spec(m, spec: TableSpec | None) -> TableSpec:
    """The statement's effective TableSpec. Key columns are a property
    of the LAKE — recorded in the manifest's ``partitioning`` block at
    first commit (the same source ``_prune_files`` and ``ddl`` use) —
    not of the caller's default config: on a custom-key lake whose
    payload happens to contain conv_id/turn_idx, synthesizing events
    with ``default_spec()``'s keys would emit null-key tombstones
    instead of the matched rows. With no ``spec``, derive key columns
    (and the payload schema) from the manifest; with one, validate its
    key_cols against the manifest and raise on mismatch."""
    if m is None:
        return spec or default_spec()
    recorded = tuple(m.partitioning.get("key_cols") or ())
    if spec is None:
        base = default_spec()
        if recorded and tuple(base.key_cols) != recorded:
            base = dataclasses.replace(
                base,
                key_cols=recorded,
                payload_schema=manifest_payload_schema(m),
            )
        return base
    if recorded and tuple(spec.key_cols) != recorded:
        raise ValueError(
            f"spec.key_cols {tuple(spec.key_cols)} do not match the "
            f"lake's recorded key_cols {recorded}"
        )
    return spec


def _zone_val(scalar: pa.Scalar):
    """A predicate scalar in the zone map's units: ``file_entry`` stats
    store timestamps as raw int64 microseconds, so timestamp scalars
    compare as ints, everything else as its Python value."""
    if pa.types.is_timestamp(scalar.type):
        return scalar.cast(pa.int64()).as_py()
    return scalar.as_py()


def _file_may_match(pred: list[tuple]):
    """Zone-map test: True unless some conjunct PROVABLY excludes the
    file. ``stats`` records (min, max) of every primitive column at
    write time; a missing entry keeps the file."""

    def may(f: dict) -> bool:
        stats = f.get("stats") or {}
        for col, op, val in pred:
            rng = stats.get(col)
            if not rng:
                continue
            lo, hi = rng
            if op == "==":
                v = _zone_val(val)
                if v is None or not (lo <= v <= hi):
                    return False
            elif op == "between":
                blo, bhi = _zone_val(val[0]), _zone_val(val[1])
                if blo is None or bhi is None:  # NULL bound: matches nothing
                    return False
                if blo > hi or bhi < lo:
                    return False
            elif op == "in":
                if not any(
                    _zone_val(v) is not None and lo <= _zone_val(v) <= hi
                    for v in val
                ):
                    return False
            elif op in ("<", "<="):
                v = _zone_val(val)
                cmpf = operator.lt if op == "<" else operator.le
                if v is None or not cmpf(lo, v):
                    return False
            elif op in (">", ">="):
                v = _zone_val(val)
                cmpf = operator.gt if op == ">" else operator.ge
                if v is None or not cmpf(hi, v):
                    return False
            # "!=" never prunes (min==max==v files are rare; not worth
            # the stats-equality special case)
        return True

    return may


def _batch_mask(pred: list[tuple], batch: pa.Table) -> pa.ChunkedArray | pa.Array:
    """Exact row mask (conjunction; SQL semantics: NULL -> no match)."""
    mask = None
    for col, op, val in pred:
        c = batch[col]
        if op == "==":
            m = pc.equal(c, val)
        elif op == "!=":
            m = pc.not_equal(c, val)
        elif op == "<":
            m = pc.less(c, val)
        elif op == "<=":
            m = pc.less_equal(c, val)
        elif op == ">":
            m = pc.greater(c, val)
        elif op == ">=":
            m = pc.greater_equal(c, val)
        elif op == "between":
            m = pc.and_(pc.greater_equal(c, val[0]), pc.less_equal(c, val[1]))
        else:  # in
            m = pc.is_in(c, value_set=pa.array([v.as_py() for v in val], c.type))
        m = pc.fill_null(m, False)
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def _dnf_mask(groups: list[list[tuple]], batch: pa.Table):
    mask = None
    for g in groups:
        gm = _batch_mask(g, batch)
        mask = gm if mask is None else pc.or_(mask, gm)
    return mask


def _group_key_values(pred, key_col):
    """Per DNF group: the leading-key values its ``==`` / ``in``
    conjuncts pin, or None when the group leaves the key free."""
    out = []
    for g in pred:
        vals = []
        for col, op, val in g:
            if col != key_col:
                continue
            if op == "==":
                vals.append(_zone_val(val))
            elif op == "in":
                vals.extend(_zone_val(v) for v in val)
        out.append(vals or None)
    return out


def _bloom_tester(lake_dir):
    """Shared per-file key-Bloom sidecar tester (see
    ``functions.bloom.sidecar_tester``), bound to this lake's
    filesystem with a per-call cache."""
    from ..functions.bloom import sidecar_tester
    from ..state.lakefs import lakefs

    return sidecar_tester(lakefs(lake_dir))


def _prune_files(lake_dir: str, m, pred: list[list[tuple]]):
    """Shared file-pruning pass (zone maps + key Blooms) for the
    matched-row scan and EXPLAIN; returns (surviving partitions,
    stats dict)."""
    key_col = (m.partitioning.get("key_cols") or ["conv_id"])[0]
    zone_mays = [_file_may_match(g) for g in pred]
    group_keys = _group_key_values(pred, key_col)
    bloom_may = (
        _bloom_tester(lake_dir) if any(gk for gk in group_keys) else None
    )
    sub: dict[str, list[dict]] = {}
    total = scanned = unsafe = 0
    for pid, files in m.partitions.items():
        if not files:
            continue
        total += len(files)
        zone_safe = _prune_safe(files)
        if not zone_safe:
            unsafe += 1
        kept = [
            f for f in files
            if any(
                (zone_mays[i](f) if zone_safe else True)
                and (
                    bloom_may(f, group_keys[i])
                    if bloom_may is not None and group_keys[i]
                    else True
                )
                for i in range(len(pred))
            )
        ]
        scanned += len(kept)
        if kept:
            sub[pid] = kept
    stats = {
        "files_total": total,
        "files_scanned": scanned,
        "files_pruned": total - scanned,
        "partitions_prune_unsafe": unsafe,
    }
    return sub, stats


def _matched_rows(
    lake_dir: str, store: ManifestStore, m, pred: list[list[tuple]],
    columns: list[str],
    sub: dict | None = None,
) -> rd.Dataset | None:
    """Distributed scan of CURRENT rows matching ``pred``:

    - zone-map pruned where LWW-safe (a pruned file in a multi-run
      stack could resurrect a superseded row, so those partitions skip
      zone pruning);
    - Bloom-sidecar pruned for DNF groups that pin the LEADING KEY by
      ``==`` / ``in`` — safe even in multi-run stacks: a file the bloom
      proves free of key K cannot contribute to K's LWW state, and any
      other key a partial stack mis-merges is filtered by the key
      conjunct's own mask before it can match."""
    if sub is None:
        sub, _ = _prune_files(lake_dir, m, pred)
    if not sub:
        return None
    read_cols = list(
        dict.fromkeys(columns + [c for g in pred for c, _, _ in g])
    )
    ds = _read_lake_partitions(lake_dir, sub, m, columns=read_cols)

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(_dnf_mask(pred, batch))

    ds = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return ds.select_columns(columns)


def explain_where(lake_dir: str, where: list[tuple]) -> dict:
    """EXPLAIN for a DML predicate (or any pruned scan): how many files
    the zone maps + key Bloom sidecars skip vs scan, matched-row count,
    and per-partition prune safety — the dry run an operator checks
    before a DELETE on a 100-TB lake. Pruning stats come from the
    manifest (+ sidecar reads for key-pinned groups); the matched count
    is the same distributed scan the statement would run, minus the
    write."""
    store = ManifestStore(lake_dir)
    m = store.load()
    if m is None:
        raise FileNotFoundError(f"no committed version at {lake_dir}")
    payload = manifest_payload_schema(m)
    pred = _check_pred(where, payload)
    sub, stats = _prune_files(lake_dir, m, pred)
    ds = _matched_rows(
        lake_dir, store, m, pred,
        [payload.names[0]],  # cheapest projection: count needs one col
        sub=sub,
    )
    matched = int(ds.count()) if ds is not None else 0
    return {"version": int(m.version), **stats, "matched_rows": matched}


def _stage_events(lake_dir: str, ds: rd.Dataset, tag: str) -> list[str] | None:
    """Write the synthesized changelog distributed (each worker lands
    its shard atomically through the lake's own filesystem backend, so
    the staging works on POSIX and object schemes alike); the driver
    collects only (path, rows) summary rows. Returns the staged file
    list (None when no row matched — no empty commit)."""
    from ..state.lakefs import fs_for, lakefs

    staging = lakefs(lake_dir).full("_staged", f"{tag}-{uuid.uuid4().hex[:8]}")
    fs_for(staging).makedirs(staging)

    def write_shard(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "rows": pa.array([], pa.int64())}
            )
        import os

        import pyarrow.parquet as pq

        path = staging.rstrip("/") + "/" + f"{tag}-{uuid.uuid4().hex[:12]}.parquet"
        fs = fs_for(path)
        if fs.is_object:
            fs.write_parquet(b, path)  # object PUT is atomic
        else:
            tmp = path + ".tmp"
            pq.write_table(b, tmp)
            os.replace(tmp, path)
        return pa.table({"path": [path], "rows": [len(b)]})

    summaries = ds.map_batches(write_shard, batch_format="pyarrow").take_all()
    files = sorted(s["path"] for s in summaries if s["rows"] > 0)
    return files or None


def _event_table(
    rows: pa.Table, payload: pa.Schema, op: str, seq: int,
    ts_col: str = "ts",
) -> pa.Table:
    """(op, seq) + the payload columns of ``rows``; ``ts`` taken from
    ``ts_col`` so overrides can carry the committed row's timestamp."""
    n = len(rows)
    cols: dict[str, object] = {
        "op": pa.array([op] * n, pa.string()),
        "seq": pa.array(np.full(n, seq, dtype=np.int64), pa.int64()),
    }
    for name in payload.names:
        src = ts_col if name == "ts" else name
        if src in rows.column_names:
            cols[name] = rows[src].cast(payload.field(name).type)
        else:
            cols[name] = pa.nulls(n, payload.field(name).type)
    return pa.table(cols)


def _run_serializable(lake_dir, spec, tag, synthesize, apply_kwargs):
    """Statement-level serializable retry. A DML statement is
    match-then-write: its events are only correct against the snapshot
    they were synthesized from. The file-level commit-race retry inside
    ``apply_changes`` would re-apply the SAME stale events onto the
    race winner's state — resurrecting deleted rows, overwriting newer
    writes with stale payloads, and colliding on (ts, seq)=(committed
    ts, wm+1) ties whose LWW winner is then sort-order luck. So DML
    disables it (``commit_retries=0``) and retries the WHOLE statement:
    on ``CommitConflict`` the losing attempt's staged shards are
    removed and the statement re-loads the fresh snapshot, re-matches
    its predicate, re-synthesizes with the fresh watermark and
    re-commits — the classic optimistic lakehouse transaction loop.
    A statement is always ONE atomic commit (``commit_every_files``
    is rejected: partial statement commits would double-apply
    non-idempotent SET expressions on retry)."""
    import os
    import random
    import time

    from ..state.lakefs import fs_for
    from ..state.manifest import CommitConflict

    if "commit_every_files" in apply_kwargs:
        raise ValueError(
            "a DML statement is one atomic commit; commit_every_files "
            "is not supported here"
        )
    retries = int(os.environ.get("GRAFT_DML_RETRIES", "5"))
    store = ManifestStore(lake_dir)
    for attempt in range(retries + 1):
        m = store.load()
        events = synthesize(m)
        if events is None:
            return []
        files = _stage_events(lake_dir, events, tag)
        if files is None:
            return []
        try:
            return apply_changes(
                files, lake_dir, spec, commit_retries=0,
                expect_parent_version=(m.version if m is not None else None),
                **apply_kwargs,
            )
        except CommitConflict:
            fs = fs_for(files[0])
            for pth in files:
                try:
                    fs.remove(pth)
                except (FileNotFoundError, OSError):
                    pass
            if attempt == retries:
                raise
            time.sleep(min(2.0, 0.05 * (2**attempt)) * (0.5 + random.random()))


def scan_where(
    lake_dir: str,
    where: list,
    columns: list[str] | None = None,
    version: int | None = None,
) -> rd.Dataset:
    """Generalized predicate scan of the committed state: the DML
    match engine as a public reader. ``where`` is the same predicate
    language as the statements (conjunction, or DNF list of
    conjunctions; ops ``== != < <= > >= between in``); pruning is
    zone maps + key Bloom sidecars, rows exact-filter per batch, and
    ``columns`` pushes projection into the parquet read. The
    multi-column / disjunctive sibling of ``cdc.read_where``."""
    store = ManifestStore(lake_dir)
    m = store.load(version)
    if m is None:
        from .cdc import _empty_like

        return _empty_like(None, columns)
    payload = manifest_payload_schema(m)
    pred = _check_pred(where, payload)
    cols = list(columns) if columns else list(payload.names)
    ds = _matched_rows(lake_dir, store, m, pred, cols)
    if ds is None:
        from .cdc import _empty_like

        return _empty_like(m, columns)
    return ds


def delete_where(
    lake_dir: str,
    where: list[tuple],
    spec: TableSpec | None = None,
    **apply_kwargs,
):
    """``DELETE FROM lake WHERE <conjunction>``. Tombstones every
    CURRENT row matching ``where`` (rows where a predicate column is
    NULL do not match, SQL semantics) through the ordinary exactly-once
    apply. Returns the committed manifests ([] when nothing matched).
    Serializable under concurrent writers (see ``_run_serializable``).

    ``where``: list of ``(col, op, value)`` conjuncts, op in
    ``== != < <= > >= between in`` (``between`` takes ``(lo, hi)``
    inclusive, ``in`` a list)."""
    store = ManifestStore(lake_dir)
    spec = _resolve_spec(store.load(), spec)

    def synthesize(m):
        if m is None:
            return None
        payload = manifest_payload_schema(m)
        pred = _check_pred(where, payload)
        ds = _matched_rows(
            lake_dir, store, m, pred, list(spec.key_cols) + ["ts"]
        )
        if ds is None:
            return None
        seq = int(m.watermark) + 1
        return ds.map_batches(
            lambda b: _event_table(b, payload, "D", seq),
            batch_format="pyarrow",
        )

    return _run_serializable(lake_dir, spec, "delete", synthesize, apply_kwargs)


def update_where(
    lake_dir: str,
    where: list[tuple],
    set: dict,  # noqa: A002 - SQL vocabulary
    spec: TableSpec | None = None,
    **apply_kwargs,
):
    """``UPDATE lake SET <col = expr, ...> WHERE <conjunction>``.
    Rewrites matching CURRENT rows via winning upsert events; each
    surviving row keeps its committed ``ts``. ``set`` values are plain
    scalars or callables ``pa.Table -> pa.Array`` (vectorized, e.g.
    ``lambda b: pc.binary_join_element_wise(pa.scalar("X:"), b["text"],
    "")``). Key columns and ``ts`` cannot be assigned. Serializable
    under concurrent writers (see ``_run_serializable``)."""
    store = ManifestStore(lake_dir)
    spec = _resolve_spec(store.load(), spec)
    key_cols = list(spec.key_cols)
    for col in set:
        if col in key_cols or col == "ts":
            raise ValueError(
                f"cannot assign {col!r}: key columns and ts are immutable "
                "(delete + insert to move a row)"
            )
    assignments = dict(set)

    def synthesize(m):
        if m is None:
            return None
        payload = manifest_payload_schema(m)
        pred = _check_pred(where, payload)
        for col in assignments:
            if col not in payload.names:
                raise KeyError(
                    f"unknown column {col!r}; lake has {payload.names}"
                )
        ds = _matched_rows(lake_dir, store, m, pred, list(payload.names))
        if ds is None:
            return None
        seq = int(m.watermark) + 1

        def to_updates(b: pa.Table) -> pa.Table:
            for col, expr in assignments.items():
                typ = payload.field(col).type
                arr = (
                    expr(b).cast(typ)
                    if callable(expr)
                    else pa.nulls(len(b), typ)
                    if expr is None
                    else pa.array([expr] * len(b), typ)
                )
                b = b.set_column(b.column_names.index(col), col, arr)
            return _event_table(b, payload, "U", seq)

        return ds.map_batches(to_updates, batch_format="pyarrow")

    return _run_serializable(lake_dir, spec, "update", synthesize, apply_kwargs)


def merge_into(
    lake_dir: str,
    source: rd.Dataset,
    spec: TableSpec | None = None,
    *,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    **apply_kwargs,
):
    """``MERGE INTO lake USING source ON <key columns>``.

    ``source`` carries the payload schema (key columns + value columns
    + ``ts``), ONE row per key (ambiguous-source is the caller's bug,
    as in SQL MERGE). Clauses:

    - ``when_matched``: ``"update"`` (source payload replaces the row
      unconditionally; the row keeps the COMMITTED ts) |
      ``"update_if_newer"`` (source payload + source ts; applies only
      when source ts >= committed ts, LWW-decided — the idempotent
      backfill clause) | ``"delete"`` | ``"ignore"``.
    - ``when_not_matched``: ``"insert"`` (source row inserted with its
      own ts; if the key currently holds a NEWER tombstone the event is
      restamped to the tombstone's ts so the insert still wins LWW —
      MERGE inserts land unconditionally, like the matched clauses) |
      ``"ignore"``.

    Match detection is one co-partitioning ``hash_join`` between the
    source and a key-column projection of the lake — both sides may be
    table-sized; nothing is broadcast or driver-collected. Serializable
    under concurrent writers: a lost commit race re-joins the source
    against the fresh snapshot (see ``_run_serializable``)."""
    from ..functions.joins import hash_join
    from .cdc import read_table

    assert when_matched in ("update", "update_if_newer", "delete", "ignore")
    assert when_not_matched in ("insert", "ignore")
    store = ManifestStore(lake_dir)
    m0 = store.load()
    if m0 is None:
        raise FileNotFoundError(f"no lake at {lake_dir} (bootstrap first)")
    spec = _resolve_spec(m0, spec)
    key_cols = list(spec.key_cols)

    def synthesize(m):
        if m is None:
            raise FileNotFoundError(f"no lake at {lake_dir} (bootstrap first)")
        payload = manifest_payload_schema(m)
        seq = int(m.watermark) + 1

        # tombstones kept: a not-matched key may still hold a NEWER
        # tombstone whose (ts, _seq) would LWW-beat a plain insert —
        # its credentials must surface so the insert can restamp
        lake_keys = read_table(
            lake_dir, version=m.version, columns=key_cols + ["ts"],
            include_internal=True, keep_tombstones=True,
        ).select_columns(key_cols + ["ts", "_deleted"])
        joined = hash_join(
            source, lake_keys, on=key_cols, how="left",
            right_cols=["ts", "_deleted"], suffix="_lake",
        )

        def to_events(b: pa.Table) -> pa.Table:
            present = pc.fill_null(pc.is_valid(b["ts_lake"]), False)
            matched = pc.and_(
                present, pc.invert(pc.fill_null(b["_deleted"], False))
            )
            out = []
            mb = b.filter(matched)
            if len(mb) and when_matched != "ignore":
                if when_matched == "delete":
                    out.append(
                        _event_table(mb, payload, "D", seq, ts_col="ts_lake")
                    )
                elif when_matched == "update":
                    out.append(
                        _event_table(mb, payload, "U", seq, ts_col="ts_lake")
                    )
                else:  # update_if_newer: source ts competes in LWW
                    out.append(_event_table(mb, payload, "U", seq))
            ub = b.filter(pc.invert(matched))
            if len(ub) and when_not_matched == "insert":
                # restamp against any tombstone's credentials: event ts
                # = max(source ts, tombstone ts); with seq = wm+1 the
                # insert then wins the tie-break unconditionally, like
                # the matched clauses (an insert silently no-oping
                # against a newer tombstone is not SQL MERGE)
                ts_new = pc.max_element_wise(ub["ts"], ub["ts_lake"])
                ub = ub.set_column(
                    ub.column_names.index("ts"), "ts", ts_new
                )
                out.append(_event_table(ub, payload, "U", seq))
            if not out:
                sch = _event_table(b.slice(0, 0), payload, "U", seq).schema
                return sch.empty_table()
            return pa.concat_tables(out)

        return joined.map_batches(
            lambda df: to_events(pa.Table.from_pandas(df, preserve_index=False)),
            batch_format="pandas",
        )

    return _run_serializable(lake_dir, spec, "merge", synthesize, apply_kwargs)
