"""Three-way branch merge: clean merges, conflict policies
(fail/ours/theirs/lww), identical-edit recognition, delete
credentials, idempotent re-merge."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.branch import (
    MergeConflictError,
    merge_branch,
)
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.clone import clone_lake
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore


def _frame(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _edit_log(dirpath: str, rows: list[dict]) -> str:
    os.makedirs(dirpath, exist_ok=True)
    df = pd.DataFrame(rows)
    tbl = pa.table(
        {
            "op": pa.array(df["op"], pa.string()),
            "seq": pa.array(df["seq"], pa.int64()),
            "conv_id": pa.array(df["conv_id"], pa.string()),
            "turn_idx": pa.array(
                df["turn_idx"].astype("int32"), pa.int32()
            ),
            "role": pa.array(df.get("role"), pa.string()),
            "text": pa.array(df.get("text"), pa.string()),
            "tool": pa.nulls(len(df), pa.string()),
            "ts": pa.array(pd.to_datetime(df["ts"])).cast(pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, os.path.join(dirpath, "changes-000000.parquet"))
    return dirpath


def _setup(tmp_path, seed=31):
    """main lake + branch clone; returns (main, branch, base frame)."""
    ch = str(tmp_path / "ch")
    gen_changes(ch, n_events=2500, n_convs=30, n_files=3, seed=seed)
    main = str(tmp_path / "main")
    engine.apply_changes(ch, main, engine.default_spec(num_partitions=4))
    branch = str(tmp_path / "branch")
    clone_lake(main, branch)
    return main, branch, _frame(engine.read_table(main))


def _key(base: pd.DataFrame, i: int):
    row = base.iloc[i]
    return str(row["conv_id"]), int(row["turn_idx"])


def test_clean_merge_applies_branch_edits_and_deletes(tmp_path):
    main, branch, base = _setup(tmp_path)
    t0 = base["ts"].max()
    (c1, k1), (c2, k2), (c3, k3) = _key(base, 0), _key(base, 5), _key(base, 10)

    # branch: two upserts + one delete; main: one upsert on a 4th key
    _edit_log(
        str(tmp_path / "be"),
        [
            dict(op="U", seq=10_000_001, conv_id=c1, turn_idx=k1,
                 role="assistant", text="branch-edit-1",
                 ts=t0 + pd.Timedelta(hours=1)),
            dict(op="U", seq=10_000_002, conv_id=c2, turn_idx=k2,
                 role="assistant", text="branch-edit-2",
                 ts=t0 + pd.Timedelta(hours=1)),
            dict(op="D", seq=10_000_003, conv_id=c3, turn_idx=k3,
                 role=None, text=None, ts=t0 + pd.Timedelta(hours=1)),
        ],
    )
    engine.apply_changes(str(tmp_path / "be"), branch)
    (c4, k4) = _key(base, 15)
    _edit_log(
        str(tmp_path / "me"),
        [dict(op="U", seq=20_000_001, conv_id=c4, turn_idx=k4,
              role="user", text="main-edit", ts=t0 + pd.Timedelta(hours=2))],
    )
    engine.apply_changes(str(tmp_path / "me"), main)

    s = merge_branch(branch, main, policy="lww")
    assert s["n_conflicts"] == 0
    assert s["merged"] == 3 and s["deletes"] == 1
    got = _frame(engine.read_table(main))

    def cell(c, k):
        m = got[(got["conv_id"] == c) & (got["turn_idx"] == k)]
        return m["text"].iloc[0] if len(m) else None

    assert cell(c1, k1) == "branch-edit-1"
    assert cell(c2, k2) == "branch-edit-2"
    assert cell(c3, k3) is None  # deleted on branch, gone on main
    assert cell(c4, k4) == "main-edit"  # main's own edit survives
    # untouched keys identical to the pre-edit base
    touched = {(c1, k1), (c2, k2), (c3, k3), (c4, k4)}
    rest = got[~got.apply(
        lambda r: (r["conv_id"], r["turn_idx"]) in touched, axis=1)]
    rest_base = base[~base.apply(
        lambda r: (r["conv_id"], r["turn_idx"]) in touched, axis=1)]
    pd.testing.assert_frame_equal(
        rest.reset_index(drop=True), rest_base.reset_index(drop=True)
    )


def test_remerge_is_a_noop(tmp_path):
    main, branch, base = _setup(tmp_path)
    t0 = base["ts"].max()
    c1, k1 = _key(base, 3)
    _edit_log(
        str(tmp_path / "be"),
        [dict(op="U", seq=10_000_001, conv_id=c1, turn_idx=k1,
              role="assistant", text="edited",
              ts=t0 + pd.Timedelta(hours=1))],
    )
    engine.apply_changes(str(tmp_path / "be"), branch)

    s1 = merge_branch(branch, main)
    assert s1["merged"] == 1 and s1["committed"]
    v_after = ManifestStore(main).current_version()
    before = _frame(engine.read_table(main))

    # second merge: main already holds the branch state -> identical
    s2 = merge_branch(branch, main)
    assert s2["merged"] == 0 and s2["committed"] == []
    assert s2["n_identical"] >= 1
    assert ManifestStore(main).current_version() == v_after
    pd.testing.assert_frame_equal(_frame(engine.read_table(main)), before)


def _conflict_setup(tmp_path, branch_hours, main_hours, seed=37):
    main, branch, base = _setup(tmp_path, seed=seed)
    t0 = base["ts"].max()
    c1, k1 = _key(base, 7)
    _edit_log(
        str(tmp_path / "be"),
        [dict(op="U", seq=10_000_001, conv_id=c1, turn_idx=k1,
              role="assistant", text="branch-version",
              ts=t0 + pd.Timedelta(hours=branch_hours))],
    )
    engine.apply_changes(str(tmp_path / "be"), branch)
    _edit_log(
        str(tmp_path / "me"),
        [dict(op="U", seq=20_000_001, conv_id=c1, turn_idx=k1,
              role="assistant", text="main-version",
              ts=t0 + pd.Timedelta(hours=main_hours))],
    )
    engine.apply_changes(str(tmp_path / "me"), main)
    return main, branch, (c1, k1), t0


def _text_at(main, c, k):
    got = _frame(engine.read_table(main))
    m = got[(got["conv_id"] == c) & (got["turn_idx"] == k)]
    return m["text"].iloc[0] if len(m) else None


def test_policy_fail_raises_with_sample_and_touches_nothing(tmp_path):
    main, branch, (c1, k1), _ = _conflict_setup(tmp_path, 1, 2)
    v = ManifestStore(main).current_version()
    with pytest.raises(MergeConflictError) as ei:
        merge_branch(branch, main, policy="fail")
    assert ei.value.n_conflicts == 1
    assert ei.value.sample[0]["conv_id"] == c1
    assert ManifestStore(main).current_version() == v
    assert _text_at(main, c1, k1) == "main-version"


def test_policy_lww_newer_side_wins_each_way(tmp_path):
    # main edited later -> main wins
    main, branch, (c1, k1), _ = _conflict_setup(tmp_path, 1, 2)
    s = merge_branch(branch, main, policy="lww")
    assert s["n_conflicts"] == 1 and s["merged"] == 0
    assert _text_at(main, c1, k1) == "main-version"

    # branch edited later -> branch wins, authentic ts preserved
    main2, branch2, (c2, k2), t0 = _conflict_setup(
        tmp_path / "x", 3, 2, seed=41
    )
    s2 = merge_branch(branch2, main2, policy="lww")
    assert s2["n_conflicts"] == 1 and s2["merged"] == 1
    assert s2["n_forced"] == 0
    got = _frame(engine.read_table(main2))
    m = got[(got["conv_id"] == c2) & (got["turn_idx"] == k2)]
    assert m["text"].iloc[0] == "branch-version"
    assert m["ts"].iloc[0] == t0 + pd.Timedelta(hours=3)


def test_policy_ours_drops_conflicting_branch_change(tmp_path):
    main, branch, (c1, k1), _ = _conflict_setup(tmp_path, 3, 2)
    s = merge_branch(branch, main, policy="ours")
    assert s["n_conflicts"] == 1 and s["merged"] == 0
    assert _text_at(main, c1, k1) == "main-version"


def test_policy_theirs_wins_with_restamp_when_older(tmp_path):
    main, branch, (c1, k1), t0 = _conflict_setup(tmp_path, 1, 2)
    s = merge_branch(branch, main, policy="theirs")
    assert s["n_conflicts"] == 1 and s["merged"] == 1
    assert s["n_forced"] == 1  # branch ts was older: restamped
    got = _frame(engine.read_table(main))
    m = got[(got["conv_id"] == c1) & (got["turn_idx"] == k1)]
    assert m["text"].iloc[0] == "branch-version"
    # restamped to main's ts so the kernel's LWW accepts it
    assert m["ts"].iloc[0] == t0 + pd.Timedelta(hours=2)


def test_identical_concurrent_edits_are_not_conflicts(tmp_path):
    main, branch, base = _setup(tmp_path, seed=43)
    t0 = base["ts"].max()
    c1, k1 = _key(base, 4)
    row = dict(op="U", seq=10_000_001, conv_id=c1, turn_idx=k1,
               role="assistant", text="same-everywhere",
               ts=t0 + pd.Timedelta(hours=1))
    _edit_log(str(tmp_path / "be"), [row])
    _edit_log(str(tmp_path / "me"), [row])
    engine.apply_changes(str(tmp_path / "be"), branch)
    engine.apply_changes(str(tmp_path / "me"), main)
    s = merge_branch(branch, main, policy="fail")  # must NOT raise
    assert s["n_conflicts"] == 0 and s["n_identical"] == 1
    assert s["merged"] == 0
    assert _text_at(main, c1, k1) == "same-everywhere"


def test_unchanged_branch_is_a_noop(tmp_path):
    main, branch, _ = _setup(tmp_path, seed=47)
    s = merge_branch(branch, main)
    assert s["merged"] == 0 and s["committed"] == []


def test_merge_refuses_foreign_branch(tmp_path):
    main, branch, _ = _setup(tmp_path, seed=53)
    other = str(tmp_path / "other")
    ch2 = str(tmp_path / "ch2")
    gen_changes(ch2, n_events=500, n_convs=10, n_files=1, seed=59)
    engine.apply_changes(ch2, other, engine.default_spec(num_partitions=4))
    with pytest.raises(ValueError, match="branched from"):
        merge_branch(branch, other)
