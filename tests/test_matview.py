"""Incremental materialized rollup (pipelines/matview.py): the rollup
lake maintained from the CDF must always equal a full recompute over
the source lake's final state, across arbitrary commit/refresh
interleavings, full-conversation deletes, and crash-replays."""

import json
import os

import pandas as pd
import pytest

from aws_serverless_elt_pipeline_enterprise_ray import (
    apply_changes,
    default_spec,
    read_table,
)
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.matview import (
    last_folded_version,
    read_rollup,
    refresh_rollup,
)

COLS = ["conv_id", "n_turns", "n_user_turns", "n_chars", "last_ts"]


def _full_recompute(lake_dir: str) -> pd.DataFrame:
    src = read_table(lake_dir).to_pandas()
    if not len(src):
        return pd.DataFrame(columns=COLS)
    g = src.groupby("conv_id")
    return (
        pd.DataFrame(
            {
                "n_turns": g.size().astype("int64"),
                "n_user_turns": g["role"]
                .apply(lambda s: int((s == "user").sum()))
                .astype("int64"),
                "n_chars": g["text"]
                .apply(lambda s: int(s.str.len().fillna(0).sum()))
                .astype("int64"),
                "last_ts": g["ts"].max(),
            }
        )
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def _rollup_df(rollup_dir: str) -> pd.DataFrame:
    return (
        read_rollup(rollup_dir, columns=COLS)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def _assert_synced(lake, rollup):
    pd.testing.assert_frame_equal(
        _rollup_df(rollup), _full_recompute(lake), check_dtype=False
    )


@pytest.mark.parametrize("splits", [(4,), (2, 5), (1, 2, 3)])
def test_incremental_equals_full(tmp_path, splits):
    files = gen_changes(
        str(tmp_path / "ch"),
        n_events=12_000,
        n_convs=120,
        n_files=6,
        seed=7,
        delete_ratio=0.08,
    )
    lake, rollup = str(tmp_path / "lake"), str(tmp_path / "rollup")
    spec = default_spec(num_partitions=8)
    prev = 0
    for cut in list(splits) + [len(files)]:
        if cut > prev:
            apply_changes(files[prev:cut], lake, spec)
            prev = cut
        refresh_rollup(lake, rollup, num_partitions=4)
    _assert_synced(lake, rollup)
    # and the refresh is incremental: a no-op poll reports no work
    r = refresh_rollup(lake, rollup)
    assert r["affected"] == 0 and r["committed"] == 0


def test_full_delete_removes_rollup_row(tmp_path):
    ch = tmp_path / "ch"
    ch.mkdir()
    rows = [
        {
            "op": "I",
            "seq": i,
            "conv_id": f"c{i % 3}",
            "turn_idx": i // 3,
            "role": "user",
            "text": "hello",
            "tool": None,
            "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i),
        }
        for i in range(9)
    ]
    pd.DataFrame(rows).to_parquet(ch / "a.parquet")
    lake, rollup = str(tmp_path / "lake"), str(tmp_path / "rollup")
    spec = default_spec(num_partitions=4)
    apply_changes(str(ch), lake, spec)
    refresh_rollup(lake, rollup, num_partitions=4)
    assert set(_rollup_df(rollup)["conv_id"]) == {"c0", "c1", "c2"}

    # delete every turn of c1 -> its rollup row must disappear
    ch2 = tmp_path / "ch2"
    ch2.mkdir()
    dels = [
        {
            "op": "D",
            "seq": 100 + t,
            "conv_id": "c1",
            "turn_idx": t,
            "role": None,
            "text": None,
            "tool": None,
            "ts": pd.Timestamp("2026-02-01"),
        }
        for t in range(3)
    ]
    pd.DataFrame(dels).to_parquet(ch2 / "b.parquet")
    apply_changes(str(ch2), lake, spec)
    r = refresh_rollup(lake, rollup)
    assert r["deleted"] >= 1
    assert set(_rollup_df(rollup)["conv_id"]) == {"c0", "c2"}
    _assert_synced(lake, rollup)


def test_refresh_crash_replay_is_idempotent(tmp_path):
    """Crash between apply and checkpoint advance: the re-run re-derives
    the same range, reuses the staged files, and the apply is a no-op -
    the rollup state is unchanged."""
    files = gen_changes(
        str(tmp_path / "ch"), n_events=6_000, n_convs=60, n_files=3, seed=3
    )
    lake, rollup = str(tmp_path / "lake"), str(tmp_path / "rollup")
    spec = default_spec(num_partitions=4)
    apply_changes(files, lake, spec)
    refresh_rollup(lake, rollup, num_partitions=4)
    before = _rollup_df(rollup)
    v_before = last_folded_version(rollup)

    # simulate the crash: roll the consumer checkpoint back
    ckpt = os.path.join(rollup, "_source_version.json")
    with open(ckpt, "w") as f:
        json.dump({"source_version": 0}, f)
    r = refresh_rollup(lake, rollup)
    assert r["to_version"] == v_before
    assert r["committed"] == 0  # staged files already applied -> no-op
    pd.testing.assert_frame_equal(_rollup_df(rollup), before)
    _assert_synced(lake, rollup)
