"""Canonical schemas, table specs and vectorized normalization.

Arrow-columnar equivalent of the reference's per-record normalization
(``lambdas/shared/schemas.py:25-38`` ``normalize_record``: project onto
declared columns, missing -> null, extras dropped, unknown type
rejected) and timestamp canonicalization (``schemas.py:41-47``
``_iso_to_iso_z``). Where the reference validates one dict at a time,
we validate whole ``pyarrow.Table`` batches with ``pyarrow.compute``
kernels; bad rows are masked and routed to quarantine instead of
raising (``lambdas/ingest/app.py:112-118`` drop-bad-record semantics).

Timestamps are ``timestamp[us]`` (UTC by convention, stored naive so
Parquet/DuckDB/Arrow compare identically).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TS_TYPE = pa.timestamp("us")

#: The maintained lake table (payload) schema - primary key (conv_id, turn_idx).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", TS_TYPE),
    ]
)

#: Change-event envelope: op + seq + payload columns.
CHANGELOG_SCHEMA = pa.schema(
    [pa.field("op", pa.string()), pa.field("seq", pa.int64())]
    + list(TRANSCRIPT_SCHEMA)
)

#: Internal (hidden) lake columns. `ts` doubles as the LWW ordering
#: column; `_seq` is the final tie-break; `_deleted` marks tombstones
#: (kept so late-arriving older upserts cannot resurrect deleted keys).
INTERNAL_COLS = ("_deleted", "_seq")

VALID_OPS = ("I", "U", "D")

KEY_COLS = ("conv_id", "turn_idx")
ORDER_COLS = ("ts", "_seq")


@dataclasses.dataclass(frozen=True)
class DQRules:
    """Declarative DQ rules, mirroring the reference's GE suite
    (``glue_ge_validation/scripts/ge_validate_silver.py:36-53``) and its
    YAML mirror (``dq/ups_shipping/rules.yaml:4-10``)."""

    not_null: tuple[str, ...] = ("conv_id", "turn_idx", "ts")
    unique: tuple[tuple[str, ...], ...] = (("conv_id", "turn_idx"),)
    # col -> (min, max); None = unbounded
    ranges: dict = dataclasses.field(
        default_factory=lambda: {"turn_idx": (0, 100_000)}
    )
    row_count_min: int = 1


@dataclasses.dataclass(frozen=True)
class TableSpec:
    """Per-table config: the engine equivalent of the reference's
    dataset YAML (``configs/ups_shipping.yaml:1-37``): key columns,
    ordering, payload columns, partitioning and DQ rules, plus an
    optional per-batch transform hook (the UDF surface of
    ``templates/transform_handler.py:31-49``)."""

    name: str = "transcripts"
    key_cols: tuple[str, ...] = KEY_COLS
    order_cols: tuple[str, ...] = ("ts", "seq")
    payload_schema: pa.Schema = TRANSCRIPT_SCHEMA
    num_partitions: int = 64
    # conv_ids listed (or detected) as hot are salted across this many
    # sub-partitions; salt is derived from turn_idx so a given
    # (conv_id, turn_idx) always lands in the same partition.
    hot_key_salt: int = 8
    hot_keys: tuple[str, ...] = ()
    dq: DQRules = dataclasses.field(default_factory=DQRules)
    # Optional vectorized UDF applied to good rows inside normalize.
    transform: Callable[[pa.Table], pa.Table] | None = None
    # "keep": additive schema evolution - unknown changelog columns are
    # carried into the lake (back-filled as nulls for old data).
    # "drop": reference normalize_record behavior (extras dropped).
    extra_columns: str = "keep"
    # "lww": whole-row last-writer-wins (reference semantics).
    # "coalesce": column-level partial updates - an update's NULL
    # fields keep the committed value, non-null fields override; a
    # delete resets the key. Disables the map-side LWW combiners and
    # the delta-append fast path (each written row must be fully merged
    # against current state so cross-run whole-row LWW stays valid).
    merge_policy: str = "lww"

    @property
    def payload_cols(self) -> tuple[str, ...]:
        return tuple(self.payload_schema.names)

    def with_extras(self, extras: Sequence[tuple[str, pa.DataType]]) -> "TableSpec":
        """Extend the payload schema with discovered additive columns."""
        fields = list(self.payload_schema)
        known = set(self.payload_schema.names)
        for name, typ in extras:
            if name not in known:
                fields.append(pa.field(name, typ))
                known.add(name)
        return dataclasses.replace(self, payload_schema=pa.schema(fields))


def default_spec(**overrides) -> TableSpec:
    return dataclasses.replace(TableSpec(), **overrides)


def spec_from_yaml(path: str) -> TableSpec:
    """Load a TableSpec from YAML (the scaffold surface, mirroring
    ``make scaffold`` / ``templates/dataset.yaml``)."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    dq_cfg = cfg.get("dq", {})
    dq = DQRules(
        not_null=tuple(dq_cfg.get("not_null", ("conv_id", "turn_idx", "ts"))),
        unique=tuple(tuple(u) for u in dq_cfg.get("unique", [["conv_id", "turn_idx"]])),
        ranges={k: tuple(v) for k, v in dq_cfg.get("ranges", {}).items()},
        row_count_min=int(dq_cfg.get("row_count_min", 1)),
    )
    fields = [
        pa.field(c["name"], _type_from_str(c["type"]))
        for c in cfg.get("columns", [])
    ] or list(TRANSCRIPT_SCHEMA)
    return TableSpec(
        name=cfg.get("name", "transcripts"),
        key_cols=tuple(cfg.get("key_cols", KEY_COLS)),
        order_cols=tuple(cfg.get("order_cols", ("ts", "seq"))),
        payload_schema=pa.schema(fields),
        num_partitions=int(cfg.get("num_partitions", 64)),
        hot_key_salt=int(cfg.get("hot_key_salt", 8)),
        hot_keys=tuple(cfg.get("hot_keys", ())),
        dq=dq,
        extra_columns=cfg.get("extra_columns", "keep"),
        merge_policy=cfg.get("merge_policy", "lww"),
    )


_TYPES = {
    "string": pa.string(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float64": pa.float64(),
    "timestamp": TS_TYPE,
    "bool": pa.bool_(),
    "binary": pa.binary(),
}


def _type_from_str(s: str) -> pa.DataType:
    return _TYPES[s]


def lake_schema(spec: TableSpec) -> pa.Schema:
    """Physical schema of lake partition files: payload + hidden cols."""
    return pa.schema(
        list(spec.payload_schema)
        + [pa.field("_deleted", pa.bool_()), pa.field("_seq", pa.int64())]
    )


# ---------------------------------------------------------------------------
# Vectorized normalization (M1-M4)
# ---------------------------------------------------------------------------


def _cast_col(col: pa.ChunkedArray | pa.Array, typ: pa.DataType) -> pa.Array:
    """Cast with permissive string->timestamp handling; un-castable
    values become null (caught later by the validity mask when the
    column is required)."""
    if col.type == typ:
        return col
    if pa.types.is_timestamp(typ) and (
        pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
    ):
        # ISO-8601 strings; trailing 'Z' accepted (reference _iso_to_iso_z).
        col = pc.replace_substring_regex(col, "Z$", "")
        return pc.cast(pc.cast(col, pa.timestamp("us")), typ, safe=False)
    try:
        return pc.cast(col, typ)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return pc.cast(col, typ, safe=False)


def normalize_batch(batch: pa.Table, spec: TableSpec) -> pa.Table:
    """Vectorized M1+M2+M4: project onto ``op, seq, <payload>``, cast
    types, and append a ``_bad`` string column (null = valid row).

    Unknown ``op``, null key columns or a null/uncastable ``ts`` mark
    the row bad instead of raising - the Arrow analogue of the
    reference's try/except drop with structured log
    (``lambdas/ingest/app.py:112-118``). Bad rows keep their original
    values so quarantine output is inspectable.
    """
    n = len(batch)
    target = pa.schema(
        [pa.field("op", pa.string()), pa.field("seq", pa.int64())]
        + list(spec.payload_schema)
    )
    cols = []
    names = []
    for field in target:
        names.append(field.name)
        if field.name in batch.column_names:
            cols.append(_cast_col(batch[field.name], field.type))
        else:
            cols.append(pa.nulls(n, field.type))
    out = pa.table(cols, names=names)

    # The per-table UDF runs BEFORE validity marking, like the
    # reference's transform_record constructing the record ahead of
    # validation (templates/transform_handler.py:31-49): a fallback-
    # chain / fix-up transform can repair rows that would otherwise
    # quarantine (the redrive recovery path depends on this).
    if spec.transform is not None:
        out = spec.transform(out)
        n = len(out)

    bad = np.full(n, None, dtype=object)
    opv = out["op"].combine_chunks()
    ok_op = pc.is_in(opv, value_set=pa.array(list(VALID_OPS)))
    _mark(bad, pc.invert(pc.fill_null(ok_op, False)), "unknown_op")
    for k in spec.key_cols:
        _mark(bad, pc.is_null(out[k]), f"null_key:{k}")
    _mark(bad, pc.is_null(out["ts"]), "null_ts")
    _mark(bad, pc.is_null(out["seq"]), "null_seq")
    return out.append_column("_bad", pa.array(bad, pa.string()))


def _mark(bad: np.ndarray, mask, reason: str) -> None:
    m = np.asarray(mask.to_numpy(zero_copy_only=False) if hasattr(mask, "to_numpy") else mask)
    m = m & pd.isnull(bad)  # first failure reason wins
    bad[m] = reason


def split_quarantine(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Split a normalized batch into (good, quarantined) tables."""
    mask = pc.is_null(batch["_bad"])
    good = batch.filter(mask).drop_columns(["_bad"])
    quar = batch.filter(pc.invert(mask))
    return good, quar


# ---------------------------------------------------------------------------
# Partitioning (salted conv_id hash) - the one required shuffle key
# ---------------------------------------------------------------------------


def hash_strings(arr, seed: int = 0) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string column.

    Fast path: polars' zero-copy columnar hash (~9x cheaper than
    object-array hashing - no Python objects are materialized, which
    matters because this stage is memory-bandwidth-bound at scale).
    Deterministic across processes for a fixed polars version; the
    manifest records the hash impl so a resumed job can detect drift.
    Fallback: pandas SipHash over an object array."""
    try:
        import polars as pl

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            s = pl.from_arrow(arr)
        else:
            s = pl.Series(np.asarray(arr))
        return s.hash(seed=seed).to_numpy()
    except ImportError:  # pragma: no cover
        if isinstance(arr, (pa.ChunkedArray, pa.Array)):
            arr = arr.to_numpy(zero_copy_only=False)
        return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False)


def hash_impl_id() -> str:
    """Identifier of the partition-hash implementation; stored in the
    manifest's partitioning block so a resume with a different hash
    (polars major bump) fails loudly instead of mis-partitioning."""
    try:
        import polars as pl

        return f"polars-{pl.__version__.split('.')[0]}"
    except ImportError:  # pragma: no cover
        return "pandas-siphash"


def assign_part_id(
    batch: pa.Table,
    num_partitions: int,
    hot_keys: frozenset[str] | None = None,
    hot_key_salt: int = 8,
    key_col: str = "conv_id",
    salt_col: str | None = "turn_idx",
) -> pa.Table:
    """Append ``part_id = hash(key_col) % P`` (A1 analogue: the lake
    partitioning key). Hot keys are salted across ``hot_key_salt``
    sub-partitions using ``salt_col % salt`` so a hot conversation fans
    out across workers while each (conv_id, turn_idx) key still maps to
    exactly one partition - the LWW-correctness requirement called out
    in SURVEY §4. Single-column keys (``salt_col=None``, e.g. the
    dedup-index lake keyed on a content hash) skip salting: a uniform
    hash key has no hot keys by construction."""
    h = hash_strings(batch[key_col])
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    if hot_keys and salt_col is not None:
        conv = batch[key_col].to_numpy(zero_copy_only=False)
        hot_mask = np.isin(conv, list(hot_keys))
        if hot_mask.any():
            turn = batch[salt_col].to_numpy(zero_copy_only=False)
            salt = (turn.astype(np.int64) % hot_key_salt).astype(np.uint64)
            salted = ((h + salt * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)).astype(np.int32)
            part = np.where(hot_mask, salted, part)
    return batch.append_column("part_id", pa.array(part, pa.int32()))


# ---------------------------------------------------------------------------
# LWW reduction kernel (vectorized; used by the merge stage and tests)
# ---------------------------------------------------------------------------


def lww_reduce(tbl: pa.Table, key_cols=KEY_COLS, ts_col="ts", seq_col="_seq") -> pa.Table:
    """Keep, per key, the single row with the greatest ``(ts, seq)``.

    Fully vectorized: one multi-column sort + run-boundary detection on
    the sorted key columns. Order-insensitive (replay-safe): the result
    is independent of input row order. Rows where op == 'D' are KEPT as
    tombstones (``_deleted`` handling is the caller's concern).
    """
    if len(tbl) == 0:
        return tbl
    idx = pc.sort_indices(
        tbl,
        sort_keys=[(c, "ascending") for c in (*key_cols, ts_col, seq_col)],
    )
    s = tbl.take(idx)
    last = _run_last_mask(s, key_cols)
    return s.filter(pa.array(last))


def coalesce_reduce(
    tbl: pa.Table, key_cols=KEY_COLS, ts_col="ts", seq_col="_seq"
) -> pa.Table:
    """Column-level merge: per key, order rows by ``(ts, seq)``; a
    delete resets the key (rows at or before the LAST delete are void);
    among the surviving rows every column takes its LAST NON-NULL
    value (partial updates - an update's nulls keep the committed
    value). Keys whose final row is the delete come out as tombstones.
    Order-insensitive like ``lww_reduce`` (the sort restores a total
    order), returns rows key-sorted (stable turn ordering).

    Vectorized: one sort, numpy segment masks for the delete horizon,
    one pandas ``groupby.last()`` (C-level last-non-null per column) -
    no Python per key. Note the semantics: NULL never overrides, so
    explicitly nulling a field requires delete + re-insert.

    Cross-commit caveat (inherent to column-level merging without
    per-column provenance): a committed row carries ONE (ts, seq) -
    the latest contribution - so a LATE-arriving update that is older
    than the row's ts sorts below it and can only FILL columns still
    null, never override ones a newer event already set (even if that
    column's value came from an event older than the late arrival).
    Within one commit the total (ts, seq) order is fully restored, so
    single-pass application matches the global-order semantics
    exactly; per-column-timestamp state would be needed to close the
    cross-commit gap and is deliberately out of scope."""
    if len(tbl) == 0:
        return tbl
    import pandas as pd

    idx = pc.sort_indices(
        tbl,
        sort_keys=[(c, "ascending") for c in (*key_cols, ts_col, seq_col)],
    )
    s = tbl.take(idx)
    df = s.to_pandas()
    n = len(df)
    keys = [df[c].to_numpy() for c in key_cols]
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    seg = np.cumsum(change) - 1
    pos = np.arange(n, dtype=np.int64)
    deleted = df["_deleted"].fillna(False).to_numpy(bool)
    seg_starts = np.nonzero(change)[0]
    # last delete position per segment (-1 = none)
    d_pos = np.where(deleted, pos, -1)
    last_d = np.maximum.reduceat(d_pos, seg_starts)
    row_last_d = last_d[seg]
    alive = pos > row_last_d  # rows strictly after the key's last delete

    out_parts = []
    if alive.any():
        live = df[alive]
        merged = live.groupby(
            [live[c] for c in key_cols], sort=True, dropna=False
        ).last()  # last NON-NULL per column, C-level
        merged = merged.reset_index()
        out_parts.append(merged[df.columns.tolist()])
    # keys with no rows after their last delete -> the delete row
    # itself survives as the tombstone
    seg_ends = np.r_[seg_starts[1:] - 1, n - 1]
    tomb_rows = seg_ends[last_d == seg_ends]
    if len(tomb_rows):
        out_parts.append(df.iloc[tomb_rows])
    out = pd.concat(out_parts, ignore_index=True) if out_parts else df.iloc[0:0]
    out = out.sort_values(
        [*key_cols, ts_col, seq_col], kind="mergesort", ignore_index=True
    )
    return pa.Table.from_pandas(out, schema=tbl.schema, preserve_index=False)


_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _key_hashes(tbl: pa.Table, key_cols) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes of the composite key, fully
    vectorized with no Python-object materialization."""
    h1 = np.zeros(len(tbl), dtype=np.uint64)
    h2 = np.zeros(len(tbl), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            col = tbl[c]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                c1 = hash_strings(col, seed=0).astype(np.uint64)
                c2 = hash_strings(col, seed=1).astype(np.uint64)
            else:
                v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
                c1 = v * _MIX1
                c2 = (v + np.uint64(1)) * _MIX2
            h1 = (h1 * _MIX1) ^ c1
            h2 = (h2 * _MIX2) ^ c2
    return h1, h2


def lww_combine_fast(
    tbl: pa.Table, key_cols=KEY_COLS, ts_col="ts", seq_col="seq"
) -> pa.Table:
    """Per-batch LWW combiner: keep the winning row per key using a
    numpy lexsort over two independent 64-bit key hashes + (ts, seq).

    ~2x cheaper than the exact multi-column Arrow sort because no
    string comparisons or object arrays are involved. A false merge
    requires a simultaneous collision in BOTH hashes (~2^-128 per
    pair); the authoritative merge stage still reduces on the true key
    columns, so the combiner is the only place this probability exists.
    """
    n = len(tbl)
    if n == 0:
        return tbl
    h1, h2 = _key_hashes(tbl, key_cols)
    ts = tbl[ts_col].combine_chunks().to_numpy(zero_copy_only=False).view("i8")
    seq = tbl[seq_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, ts, h2, h1))
    s1, s2 = h1[order], h2[order]
    last = np.empty(n, dtype=bool)
    last[-1] = True
    last[:-1] = (s1[:-1] != s1[1:]) | (s2[:-1] != s2[1:])
    return tbl.take(pa.array(order[last]))


def _run_last_mask(sorted_tbl: pa.Table, key_cols) -> np.ndarray:
    """Boolean mask marking the last row of each equal-key run in a
    key-sorted table."""
    n = len(sorted_tbl)
    change = np.zeros(n, dtype=bool)
    change[-1] = True
    for c in key_cols:
        col = sorted_tbl[c].to_numpy(zero_copy_only=False)
        change[:-1] |= col[:-1] != col[1:]
    return change


def promote_type(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Smallest Arrow type BOTH inputs widen to losslessly — the
    type-evolution lattice (Delta/Iceberg widening semantics): ints
    promote within signedness (mixed signed/unsigned promotes to the
    signed type wide enough for both), floats promote to the wider
    float, int+float promotes to float64 (documented caveat: int64
    values above 2^53 round). Anything else — string vs number,
    uint64 vs signed, nested mismatches — raises, because a silent
    cast in either direction loses data."""
    if a.equals(b):
        return a
    # an all-null file footer types its column pa.null(): any real
    # type absorbs it (null casts to anything)
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    fl_a, fl_b = pa.types.is_floating(a), pa.types.is_floating(b)
    in_a, in_b = pa.types.is_integer(a), pa.types.is_integer(b)
    if fl_a and fl_b:
        return a if a.bit_width >= b.bit_width else b
    if in_a and in_b:
        signed = pa.types.is_signed_integer(a) or pa.types.is_signed_integer(b)

        def vbits(t: pa.DataType) -> int:
            return t.bit_width - (1 if pa.types.is_signed_integer(t) else 0)

        need = max(vbits(a), vbits(b)) + (1 if signed else 0)
        for bits in (8, 16, 32, 64):
            if bits >= need:
                return getattr(pa, f"int{bits}" if signed else f"uint{bits}")()
        raise ValueError(f"no integer type holds both {a} and {b}")
    if (in_a and fl_b) or (fl_a and in_b):
        return pa.float64()
    raise ValueError(f"incompatible schema evolution: {a} vs {b}")


def schema_union(schemas: Sequence[pa.Schema], base: pa.Schema) -> list[tuple[str, pa.DataType]]:
    """Discover additive extra columns across changelog file schemas
    (schema evolution - reference precedent: compaction's added
    ``_ingested_at`` column, ``compact_silver.py:40``). Returns
    (name, type) pairs not already in ``base``, in first-seen order;
    a column seen with DIFFERENT types across files resolves through
    ``promote_type`` (lossless widening) instead of first-seen-wins."""
    known = set(base.names) | {"op", "seq", "part_id", "_bad"}
    extras: list[tuple[str, pa.DataType]] = []
    index: dict[str, int] = {}
    for sch in schemas:
        for field in sch:
            if field.name in known:
                continue
            at = index.get(field.name)
            if at is None:
                index[field.name] = len(extras)
                extras.append((field.name, field.type))
            elif not extras[at][1].equals(field.type):
                try:
                    extras[at] = (
                        field.name, promote_type(extras[at][1], field.type)
                    )
                except ValueError as e:
                    raise ValueError(
                        f"column {field.name!r}: {e} (changelog files "
                        "disagree and neither type widens to the other)"
                    ) from None
    return extras


def spec_to_json(spec: TableSpec) -> str:
    return json.dumps(
        {
            "name": spec.name,
            "key_cols": list(spec.key_cols),
            "payload_cols": [
                {"name": f.name, "type": str(f.type)} for f in spec.payload_schema
            ],
            "num_partitions": spec.num_partitions,
        }
    )
