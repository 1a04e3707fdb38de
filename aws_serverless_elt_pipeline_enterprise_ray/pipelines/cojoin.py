"""Co-partitioned (storage-partitioned) join between two lakes.

Both lakes hash-partition rows by their leading key column with the
same partition count and the same hash (`schema.assign_part_id`), so
partition i of lake A can only ever match partition i of lake B: the
join runs as ONE task per partition pair — read both sides' runs,
LWW-reduce, vectorized ``pandas.merge`` — with NO exchange at all.
This is the 100-TB two-big-tables join: ``functions.joins.hash_join``
shuffles both inputs; this joins committed lakes for free because the
write path already co-located them (the Iceberg/Spark
"storage-partitioned join" optimization, SPARK-37375).

Safety guards (raise ``ValueError`` rather than silently mis-join):
* equal ``num_partitions`` and identical hash impl;
* the join key must START with both lakes' leading partition key;
* NO hot-key salting on either side — a salted hot key fans out
  across partitions, breaking per-partition containment (re-commit
  with ``rebalance`` to unsalt, or fall back to ``hash_join``).

Reference parity: Athena joins silver tables that Glue partitioned
identically (Instructions.md:122-131); this is that join without the
engine-side shuffle.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..schema import lww_reduce
from ..stages.merge import conform_to_schema
from ..state.manifest import ManifestStore, manifest_payload_schema

#: Arrow type string -> pandas nullable dtype (Arrow prints float64
#: as "double" and float32 as "float")
_NULLABLE = {
    "int8": "Int8", "int16": "Int16", "int32": "Int32", "int64": "Int64",
    "uint8": "UInt8", "uint16": "UInt16", "uint32": "UInt32",
    "uint64": "UInt64", "float": "Float32", "double": "Float64",
    "bool": "boolean",
}


def _partitioning_or_raise(lake: str, m) -> dict:
    p = dict(m.partitioning)
    if not p.get("num_partitions"):
        raise ValueError(f"{lake}: manifest has no partitioning block")
    return p


def _read_side(lake_dir: str, paths: list[str], payload: pa.Schema,
               key_cols: tuple[str, ...]) -> pa.Table:
    """One partition's committed state: concat runs, LWW-reduce when
    several files overlap, drop tombstones, conform to the payload."""
    internal = pa.schema(
        list(payload)
        + [pa.field("_deleted", pa.bool_()), pa.field("_seq", pa.int64())]
    )
    tbls = []
    for rel in paths:
        fp = os.path.join(lake_dir, rel)
        have = set(pq.read_schema(fp).names)
        tbls.append(
            conform_to_schema(
                pq.read_table(
                    fp, columns=[c for c in internal.names if c in have]
                ),
                internal,
            )
        )
    t = pa.concat_tables(tbls)
    if len(paths) > 1:
        t = lww_reduce(t, key_cols, "ts", "_seq")
    t = t.filter(pc.invert(pc.fill_null(t["_deleted"], False)))
    return conform_to_schema(t, payload)


def copartitioned_join(
    lake_a: str,
    lake_b: str,
    *,
    on: list[str] | str,
    how: str = "inner",
    suffix: str = "_b",
    version_a: int | str | None = None,
    version_b: int | str | None = None,
) -> rd.Dataset:
    """Join the committed states of two co-partitioned lakes with zero
    shuffle: one task per partition pair. ``how`` ∈ inner | left.
    Returns columns ``on`` + lake-A payload + lake-B payload (B names
    colliding with A get ``suffix``). Left-join-induced nulls use
    pandas nullable dtypes in EVERY partition so the block schema is
    stable whether or not a given partition had misses."""
    assert how in ("inner", "left"), how
    on_cols = [on] if isinstance(on, str) else list(on)

    sa, sb = ManifestStore(lake_a), ManifestStore(lake_b)
    ma, mb = sa.load(version_a), sb.load(version_b)
    if ma is None or mb is None:
        raise ValueError("both lakes need a committed manifest")
    pa_, pb_ = _partitioning_or_raise(lake_a, ma), _partitioning_or_raise(
        lake_b, mb
    )
    if pa_["num_partitions"] != pb_["num_partitions"]:
        raise ValueError(
            f"partition counts differ: {pa_['num_partitions']} vs "
            f"{pb_['num_partitions']} — rebalance one side or use hash_join"
        )
    if pa_.get("hash_impl") != pb_.get("hash_impl"):
        raise ValueError("partition hash impls differ; use hash_join")
    if pa_.get("hot_keys") or pb_.get("hot_keys"):
        raise ValueError(
            "hot-key salting breaks per-partition containment; "
            "rebalance to unsalt or use hash_join"
        )
    ka = tuple(pa_.get("key_cols", ("conv_id", "turn_idx")))
    kb = tuple(pb_.get("key_cols", ("conv_id", "turn_idx")))
    if not on_cols or on_cols[0] != ka[0] or on_cols[0] != kb[0]:
        raise ValueError(
            f"join key must start with both partition keys "
            f"({ka[0]!r}, {kb[0]!r}); got {on_cols}"
        )

    pay_a = manifest_payload_schema(ma)
    pay_b = manifest_payload_schema(mb)
    missing = [c for c in on_cols
               if c not in pay_a.names or c not in pay_b.names]
    if missing:
        raise ValueError(f"join columns missing from a payload: {missing}")

    a_rest = [c for c in pay_a.names if c not in on_cols]
    collide = set(a_rest) & set(pay_b.names)
    b_rest = [
        (c, f"{c}{suffix}" if c in collide else c)
        for c in pay_b.names
        if c not in on_cols
    ]
    out_cols = on_cols + a_rest + [o for _, o in b_rest]

    parts_b = {k: [f["path"] for f in v] for k, v in mb.partitions.items() if v}
    items = []
    for pid, files in ma.partitions.items():
        if not files:
            continue
        fb = parts_b.get(pid, [])
        if not fb and how == "inner":
            continue
        items.append(
            {
                "files_a": json.dumps([f["path"] for f in files]),
                "files_b": json.dumps(fb),
            }
        )

    def join_pair(batch: pa.Table) -> pd.DataFrame:
        frames = []
        for row in batch.to_pylist():
            ta = _read_side(
                lake_a, json.loads(row["files_a"]), pay_a, ka
            ).to_pandas()
            fb = json.loads(row["files_b"])
            if fb:
                tb = _read_side(lake_b, fb, pay_b, kb).to_pandas()
            else:
                tb = pay_b.empty_table().to_pandas()
            m = ta.merge(tb, on=on_cols, how=how, suffixes=("", suffix))
            frames.append(m.reindex(columns=out_cols))
        out = pd.concat(frames, ignore_index=True)
        if how == "left":
            # join-induced nulls: B payload goes nullable EVERYWHERE
            # so every partition block agrees on dtypes
            for src, dst in b_rest:
                want = _NULLABLE.get(str(pay_b.field(src).type))
                if want and str(out[dst].dtype) != want:
                    out[dst] = out[dst].astype(want)
        return out

    if not items:
        return rd.from_items([]).limit(0)
    return rd.from_items(items).map_batches(
        join_pair, batch_format="pyarrow", batch_size=1
    )
