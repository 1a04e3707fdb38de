"""Round-5 regression tests for the advisor findings:

* ``_update_current_monotonic`` must respect the RETIRED floor — a
  delayed committer's swap cannot roll demoted history forward.
* DML / diff on a custom-key lake must use the MANIFEST's recorded
  key columns, not ``default_spec()``'s (null-key tombstone bug).
* ``merge_into(when_not_matched='insert')`` must land even when the
  key currently holds a NEWER tombstone (restamped credentials).
* A branch-side key absent at merge time (tombstone purged by a
  branch compact) must synthesize a delete that deterministically
  beats the unchanged fork row — not an (ts, _seq) exact tie.
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.clone import clone_lake
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.branch import merge_branch
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.diff import diff_summary
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml import (
    delete_where,
    merge_into,
    update_where,
)
from aws_serverless_elt_pipeline_enterprise_ray.schema import TS_TYPE, DQRules
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore


# ---------------------------------------------------------------- manifest

def test_retired_floor_blocks_stale_current_swap(tmp_path):
    """A committer whose exclusive create lands just before a rollback
    records the RETIRED floor must NOT afterwards swap CURRENT to its
    now-retired version (silently undoing the demotion)."""
    ch = str(tmp_path / "ch")
    gen_changes(ch, n_events=300, n_convs=8, n_files=2, seed=5)
    lake = str(tmp_path / "lake")
    engine.apply_changes(ch, lake, engine.default_spec(num_partitions=2))
    delete_where(lake, [("turn_idx", ">=", 0)])  # v2 (unconditional)
    store = ManifestStore(lake)
    assert store.current_version() == 2
    store.rollback(1)  # records RETIRED floor at 2, CURRENT -> 1
    assert store.current_version() == 1
    # the delayed committer's swap for v2 arrives after the demotion
    store._update_current_monotonic(2)
    assert store.current_version() == 1, "retired version rolled forward"


# ---------------------------------------------------- custom-key lake DML

def _custom_key_lake(tmp_path, name="docs"):
    """Lake keyed on doc_id whose PAYLOAD also contains conv_id and
    turn_idx — the shape where defaulted key columns silently produce
    null-key events instead of the matched rows."""
    schema = pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("text", pa.string()),
            pa.field("ts", TS_TYPE),
        ]
    )
    spec = engine.default_spec(
        name="docs",
        key_cols=("doc_id",),
        payload_schema=schema,
        num_partitions=2,
        hot_keys=(),
        dq=DQRules(not_null=("doc_id", "ts"), unique=(("doc_id",),), ranges={}),
    )
    n = 40
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(range(n), unit="s")
    tbl = pa.table(
        {
            "op": pa.array(["I"] * n),
            "seq": pa.array(range(n), pa.int64()),
            "doc_id": pa.array([f"d{i:03d}" for i in range(n)]),
            "conv_id": pa.array([f"c{i % 4}" for i in range(n)]),
            "turn_idx": pa.array([i % 7 for i in range(n)], pa.int32()),
            "text": pa.array([f"text-{i}" for i in range(n)]),
            "ts": pa.array(ts).cast(TS_TYPE),
        }
    )
    ch = str(tmp_path / f"{name}-ch")
    os.makedirs(ch, exist_ok=True)
    pq.write_table(tbl, os.path.join(ch, "changes-000000.parquet"))
    lake = str(tmp_path / name)
    engine.apply_changes(ch, lake, spec)
    return lake, spec


def test_delete_where_uses_manifest_key_cols(tmp_path):
    lake, _ = _custom_key_lake(tmp_path)
    # no spec passed: key columns must come from the lake manifest
    ms = delete_where(lake, [("conv_id", "==", "c1")])
    assert ms
    df = engine.read_table(lake).to_pandas()
    assert (df["conv_id"] != "c1").all()
    assert len(df) == 30
    assert df["doc_id"].notna().all(), "null-key tombstones leaked in"


def test_update_where_uses_manifest_key_cols(tmp_path):
    lake, _ = _custom_key_lake(tmp_path)
    update_where(lake, [("turn_idx", "==", 3)], {"text": "edited"})
    df = engine.read_table(lake).to_pandas()
    assert (df.loc[df["turn_idx"] == 3, "text"] == "edited").all()
    assert (df.loc[df["turn_idx"] != 3, "text"] != "edited").all()
    assert len(df) == 40


def test_dml_mismatched_spec_keys_raise(tmp_path):
    lake, _ = _custom_key_lake(tmp_path, name="docs2")
    with pytest.raises(ValueError, match="key_cols"):
        delete_where(lake, [("conv_id", "==", "c1")], engine.default_spec())


def test_apply_mismatched_spec_keys_raise(tmp_path):
    lake, spec = _custom_key_lake(tmp_path, name="docs3")
    ch2 = str(tmp_path / "docs3-ch2")
    os.makedirs(ch2, exist_ok=True)
    tbl = pa.table(
        {
            "op": pa.array(["U"]),
            "seq": pa.array([1000], pa.int64()),
            "doc_id": pa.array(["d000"]),
            "conv_id": pa.array(["c0"]),
            "turn_idx": pa.array([0], pa.int32()),
            "text": pa.array(["late"]),
            "ts": pa.array([pd.Timestamp("2026-02-01")]).cast(TS_TYPE),
        }
    )
    pq.write_table(tbl, os.path.join(ch2, "changes-000001.parquet"))
    with pytest.raises(RuntimeError, match="keyed on"):
        engine.apply_changes(ch2, lake, engine.default_spec())
    # the matching spec still applies cleanly
    engine.apply_changes(ch2, lake, spec)
    df = engine.read_table(lake).to_pandas()
    assert df.loc[df["doc_id"] == "d000", "text"].iloc[0] == "late"


def test_diff_uses_manifest_key_cols_and_rejects_mismatch(tmp_path):
    lake_a, spec = _custom_key_lake(tmp_path, name="da")
    lake_b = str(tmp_path / "db")
    clone_lake(lake_a, lake_b)
    delete_where(lake_b, [("doc_id", "==", "d000")])
    update_where(lake_b, [("doc_id", "==", "d001")], {"text": "changed"})
    # no spec: diff must run on the doc_id grain from the manifests
    summary = diff_summary(lake_a, lake_b)
    assert summary == {"only_a": 1, "changed": 1}

    # a standard conv_id/turn_idx lake cannot diff against a doc_id lake
    ch = str(tmp_path / "std-ch")
    gen_changes(ch, n_events=200, n_convs=5, n_files=1, seed=9)
    std = str(tmp_path / "std")
    engine.apply_changes(ch, std, engine.default_spec(num_partitions=2))
    with pytest.raises(ValueError, match="key_cols disagree"):
        diff_summary(lake_a, std)


# ------------------------------------------------- MERGE INTO vs tombstone

def test_merge_insert_beats_newer_tombstone(tmp_path):
    ch = str(tmp_path / "ch")
    gen_changes(ch, n_events=800, n_convs=10, n_files=2, seed=17)
    lake = str(tmp_path / "lake")
    engine.apply_changes(ch, lake, engine.default_spec(num_partitions=2))
    df = engine.read_table(lake).to_pandas()
    row = df.sort_values(["conv_id", "turn_idx"]).iloc[0]
    conv, turn = str(row["conv_id"]), int(row["turn_idx"])

    delete_where(lake, [("conv_id", "==", conv), ("turn_idx", "==", turn)])
    gone = engine.read_table(lake).to_pandas()
    assert not (
        (gone["conv_id"] == conv) & (gone["turn_idx"] == turn)
    ).any()

    # source ts is OLDER than the tombstone's committed ts: without
    # restamping, the insert silently no-ops (tombstone wins LWW)
    src_ts = (row["ts"] - pd.Timedelta(hours=1)).floor("us")
    source = rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([conv, "brand-new"]),
                "turn_idx": pa.array([turn, 0], pa.int32()),
                "role": pa.array(["user", "user"]),
                "text": pa.array(["revived", "fresh"]),
                "tool": pa.array([None, None], pa.string()),
                "ts": pa.array([src_ts, src_ts]).cast(TS_TYPE),
            }
        )
    )
    merge_into(lake, source, when_matched="update", when_not_matched="insert")
    after = engine.read_table(lake).to_pandas()
    revived = after[(after["conv_id"] == conv) & (after["turn_idx"] == turn)]
    assert len(revived) == 1, "MERGE insert lost to the newer tombstone"
    assert revived["text"].iloc[0] == "revived"
    assert (after["conv_id"] == "brand-new").sum() == 1


# ------------------------------------------ branch-absent delete determinism

def test_branch_purged_tombstone_delete_still_lands_on_merge(tmp_path):
    ch = str(tmp_path / "ch")
    gen_changes(ch, n_events=1200, n_convs=12, n_files=2, seed=23)
    main = str(tmp_path / "main")
    engine.apply_changes(ch, main, engine.default_spec(num_partitions=4))
    base = engine.read_table(main).to_pandas().sort_values(
        ["conv_id", "turn_idx"]
    )
    conv, turn = str(base.iloc[0]["conv_id"]), int(base.iloc[0]["turn_idx"])

    branch = str(tmp_path / "branch")
    clone_lake(main, branch)
    delete_where(
        branch, [("conv_id", "==", conv), ("turn_idx", "==", turn)]
    )
    # compact away the tombstone: at merge time the branch key is ABSENT
    m = compact(branch, min_files_to_compact=1, purge_tombstones=True)
    assert m is not None
    raw = engine.read_table(branch, keep_tombstones=True).to_pandas()
    assert not ((raw["conv_id"] == conv) & (raw["turn_idx"] == turn)).any()

    res = merge_branch(branch, main, policy="lww")
    assert res["committed"]
    after = engine.read_table(main).to_pandas()
    assert not (
        (after["conv_id"] == conv) & (after["turn_idx"] == turn)
    ).any(), "purged-tombstone delete lost the LWW tie on merge"
    # everything else survives untouched
    rest = base[~((base["conv_id"] == conv) & (base["turn_idx"] == turn))]
    assert len(after) == len(rest)
