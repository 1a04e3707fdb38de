"""Snapshot export: plain-Parquet hand-off equals read_table, with
per-partition resume and a completion marker."""

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq

from aws_serverless_elt_pipeline_enterprise_ray import (
    apply_changes,
    default_spec,
    read_table,
)
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.export import (
    export_snapshot,
)


def _read_export(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "data-*.parquet")))
    return pd.concat([pq.read_table(f).to_pandas() for f in files])


def test_export_matches_read_table_and_resumes(tmp_path):
    gen_changes(
        str(tmp_path / "ch"), n_events=8_000, n_convs=80, n_files=4, seed=5,
        delete_ratio=0.08,
    )
    lake, out = str(tmp_path / "lake"), str(tmp_path / "out")
    apply_changes(str(tmp_path / "ch"), lake, default_spec(num_partitions=8))

    res = export_snapshot(lake, out, max_rows_per_file=200)
    want = (
        read_table(lake).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    got = (
        _read_export(out)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns])
    assert res["rows"] == len(want) and res["resumed_partitions"] == 0
    snap = json.load(open(os.path.join(out, "_SNAPSHOT.json")))
    assert snap["rows"] == len(want) and snap["version"] == res["version"]
    # small max_rows_per_file must have chunked at least one partition
    assert any(
        len(glob.glob(os.path.join(d, "data-*.parquet"))) > 1
        for d in glob.glob(os.path.join(out, "part=*"))
    )

    # crash-resume: wipe one partition (as if the run died mid-way);
    # re-export redoes ONLY that partition
    victim = sorted(glob.glob(os.path.join(out, "part=*")))[0]
    n_parts = len(glob.glob(os.path.join(out, "part=*")))
    shutil.rmtree(victim)
    os.remove(os.path.join(out, "_SNAPSHOT.json"))
    res2 = export_snapshot(lake, out, max_rows_per_file=200)
    assert res2["resumed_partitions"] == n_parts - 1
    got2 = (
        _read_export(out)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2, want[got2.columns])


def test_export_new_version_invalidates_markers(tmp_path):
    files = gen_changes(
        str(tmp_path / "ch"), n_events=4_000, n_convs=40, n_files=4, seed=9
    )
    lake, out = str(tmp_path / "lake"), str(tmp_path / "out")
    spec = default_spec(num_partitions=4)
    apply_changes(files[:2], lake, spec)
    export_snapshot(lake, out)
    # lake moves on; markers carry the old version -> full re-export
    apply_changes(files[2:], lake, spec)
    res = export_snapshot(lake, out)
    assert res["resumed_partitions"] == 0
    want = (
        read_table(lake).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    got = (
        _read_export(out)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns])
