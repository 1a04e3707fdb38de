"""Unit tests: normalization (M1-M4), partitioning, LWW kernel."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.schema import (
    TS_TYPE,
    assign_part_id,
    lww_reduce,
    normalize_batch,
    split_quarantine,
)


def make_batch(rows):
    cols = {k: [r.get(k) for r in rows] for k in
            ("op", "seq", "conv_id", "turn_idx", "role", "text", "tool", "ts")}
    return pa.table(
        {
            "op": pa.array(cols["op"], pa.string()),
            "seq": pa.array(cols["seq"], pa.int64()),
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], TS_TYPE),
        }
    )


def test_normalize_marks_bad_rows():
    spec = engine.default_spec()
    batch = make_batch(
        [
            dict(op="I", seq=1, conv_id="c1", turn_idx=0, role="user", text="hi", ts=1_000_000),
            dict(op="X", seq=2, conv_id="c1", turn_idx=1, role="user", text="bad op", ts=1_000_000),
            dict(op="U", seq=3, conv_id=None, turn_idx=1, role="user", text="null key", ts=1_000_000),
            dict(op="D", seq=4, conv_id="c2", turn_idx=0, ts=None),
        ]
    )
    out = normalize_batch(batch, spec)
    bad = out["_bad"].to_pylist()
    assert bad == [None, "unknown_op", "null_key:conv_id", "null_ts"]
    good, quar = split_quarantine(out)
    assert len(good) == 1 and len(quar) == 3
    assert "_bad" not in good.column_names


def test_normalize_casts_and_pads():
    spec = engine.default_spec()
    # strings for ints, missing tool column, string ts with Z suffix
    batch = pa.table(
        {
            "op": pa.array(["I"]),
            "seq": pa.array(["7"]),
            "conv_id": pa.array(["c1"]),
            "turn_idx": pa.array(["3"]),
            "role": pa.array(["user"]),
            "text": pa.array(["x"]),
            "ts": pa.array(["2024-01-02T03:04:05Z"]),
        }
    )
    out = normalize_batch(batch, spec)
    assert out["seq"].type == pa.int64()
    assert out["turn_idx"].type == pa.int32()
    assert out["ts"].type == TS_TYPE
    assert out["tool"].to_pylist() == [None]
    assert out["_bad"].to_pylist() == [None]
    assert out["ts"][0].as_py().year == 2024


def test_assign_part_id_deterministic_and_in_range():
    batch = pa.table(
        {
            "conv_id": pa.array([f"c{i%10}" for i in range(100)]),
            "turn_idx": pa.array(list(range(100)), pa.int32()),
        }
    )
    a = assign_part_id(batch, 16)
    b = assign_part_id(batch, 16)
    assert a["part_id"].to_pylist() == b["part_id"].to_pylist()
    assert all(0 <= p < 16 for p in a["part_id"].to_pylist())
    # same conv_id -> same partition (no salting)
    parts = {}
    for c, p in zip(a["conv_id"].to_pylist(), a["part_id"].to_pylist()):
        assert parts.setdefault(c, p) == p


def test_assign_part_id_salting_is_key_stable():
    batch = pa.table(
        {
            "conv_id": pa.array(["hot"] * 64 + ["cold"] * 4),
            "turn_idx": pa.array(list(range(64)) + [0, 1, 2, 3], pa.int32()),
        }
    )
    out = assign_part_id(batch, 32, hot_keys=frozenset(["hot"]), hot_key_salt=8)
    parts = out["part_id"].to_pylist()
    hot_parts = set(parts[:64])
    assert len(hot_parts) > 1, "hot key should fan out across partitions"
    assert len(hot_parts) <= 8
    # identical (conv_id, turn_idx) always maps identically
    again = assign_part_id(batch, 32, hot_keys=frozenset(["hot"]), hot_key_salt=8)
    assert parts == again["part_id"].to_pylist()


def test_lww_reduce_order_insensitive():
    rows = [
        dict(conv_id="a", turn_idx=0, ts=5, _seq=1, text="old"),
        dict(conv_id="a", turn_idx=0, ts=9, _seq=2, text="new"),
        dict(conv_id="a", turn_idx=0, ts=9, _seq=0, text="tie-lost"),
        dict(conv_id="b", turn_idx=1, ts=1, _seq=3, text="only"),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in rows]),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "ts": pa.array([r["ts"] for r in rows], TS_TYPE),
            "_seq": pa.array([r["_seq"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows]),
        }
    )
    for perm in ([0, 1, 2, 3], [3, 2, 1, 0], [2, 0, 3, 1]):
        out = lww_reduce(t.take(pa.array(perm)))
        assert out["text"].to_pylist() == ["new", "only"]


def test_schema_union_discovers_extras():
    from aws_serverless_elt_pipeline_enterprise_ray.schema import schema_union

    s1 = pa.schema([("op", pa.string()), ("conv_id", pa.string())])
    s2 = pa.schema([("op", pa.string()), ("conv_id", pa.string()), ("meta_tokens", pa.int32())])
    extras = schema_union([s1, s2], engine.TRANSCRIPT_SCHEMA)
    assert extras == [("meta_tokens", pa.int32())]


def test_coalesce_reduce_partial_updates():
    """Column-level merge kernel: later non-null wins per column, nulls
    keep earlier values, a delete resets the key (trailing delete =
    tombstone), order-insensitive."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from aws_serverless_elt_pipeline_enterprise_ray.schema import coalesce_reduce

    def row(conv, turn, ts, seq, role, text, deleted=False):
        return {
            "conv_id": conv, "turn_idx": turn,
            "role": role, "text": text, "tool": None,
            "ts": pd.Timestamp(ts), "_deleted": deleted, "_seq": seq,
        }

    rows = [
        # k1: insert full, then partial update (role only), then
        # partial update (text only)
        row("k1", 0, "2026-01-01", 1, "user", "hello"),
        row("k1", 0, "2026-01-02", 2, "assistant", None),
        row("k1", 0, "2026-01-03", 3, None, "edited"),
        # k2: insert, delete, re-insert partial (role only)
        row("k2", 0, "2026-01-01", 4, "user", "gone"),
        row("k2", 0, "2026-01-02", 5, None, None, deleted=True),
        row("k2", 0, "2026-01-03", 6, "system", None),
        # k3: insert then delete (trailing tombstone)
        row("k3", 0, "2026-01-01", 7, "user", "bye"),
        row("k3", 0, "2026-01-02", 8, None, None, deleted=True),
    ]
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("_deleted", pa.bool_()),
            pa.field("_seq", pa.int64()),
        ]
    )
    rng = np.random.default_rng(3)
    for order in (rows, [rows[i] for i in rng.permutation(len(rows))]):
        tbl = pa.Table.from_pylist(order, schema=schema)
        out = coalesce_reduce(tbl).to_pylist()
        by_key = {r["conv_id"]: r for r in out}
        assert len(out) == 3
        k1 = by_key["k1"]
        assert (k1["role"], k1["text"]) == ("assistant", "edited")
        assert k1["_seq"] == 3 and not k1["_deleted"]
        k2 = by_key["k2"]
        assert (k2["role"], k2["text"]) == ("system", None)  # delete reset text
        assert not k2["_deleted"]
        assert by_key["k3"]["_deleted"] is True
