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


def test_export_dt_layout_matches_and_resumes(tmp_path):
    """Hive dt= layout: every row lands under its event-date directory,
    the union equals read_table, and a crashed partition's rerun
    overwrites its own deterministic files (stale chunks swept)."""
    gen_changes(
        str(tmp_path / "ch"), n_events=6_000, n_convs=60, n_files=3, seed=23
    )
    lake, out = str(tmp_path / "lake"), str(tmp_path / "out")
    apply_changes(str(tmp_path / "ch"), lake, default_spec(num_partitions=4))
    res = export_snapshot(lake, out, layout="dt", max_rows_per_file=500)
    assert res["resumed_partitions"] == 0

    files = sorted(glob.glob(os.path.join(out, "dt=*", "part*.parquet")))
    assert files
    got = pd.concat([pq.read_table(f).to_pandas() for f in files])
    want = read_table(lake).to_pandas()
    key = lambda df: df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got)[want.columns], key(want))

    # rows really are partitioned by their own event date
    for f in files:
        dt = os.path.basename(os.path.dirname(f)).split("=", 1)[1]
        t = pq.read_table(f).to_pandas()
        assert (t["ts"].dt.strftime("%Y-%m-%d") == dt).all()

    # crash simulation: drop one marker + plant a stale orphan chunk
    markers = sorted(glob.glob(os.path.join(out, "_markers", "part=*.json")))
    victim = markers[0]
    pid = victim.split("part=")[1].split(".")[0]
    os.remove(victim)
    some_dt_dir = os.path.dirname(files[0])
    stale = os.path.join(some_dt_dir, f"part{pid}-99999.parquet")
    shutil.copy(files[0], stale)

    res2 = export_snapshot(lake, out, layout="dt", max_rows_per_file=500)
    assert res2["resumed_partitions"] == len(markers) - 1
    assert not os.path.exists(stale)  # orphan swept on rerun
    files2 = sorted(glob.glob(os.path.join(out, "dt=*", "part*.parquet")))
    got2 = pd.concat([pq.read_table(f).to_pandas() for f in files2])
    pd.testing.assert_frame_equal(key(got2)[want.columns], key(want))


def test_export_jsonl_shards_match_and_resume(tmp_path):
    """JSONL handoff: gzipped line-JSON shards round-trip the visible
    state exactly (timestamps ISO, values intact), resume markers are
    format-aware (a parquet export at the same version does not mask a
    jsonl export into the same directory)."""
    gen_changes(
        str(tmp_path / "ch"), n_events=5_000, n_convs=50, n_files=3, seed=31,
        delete_ratio=0.05,
    )
    lake, out = str(tmp_path / "lake"), str(tmp_path / "out")
    apply_changes(str(tmp_path / "ch"), lake, default_spec(num_partitions=4))

    res = export_snapshot(lake, out, fmt="jsonl", max_rows_per_file=300)
    files = sorted(glob.glob(os.path.join(out, "part=*", "data-*.jsonl.gz")))
    assert files and res["resumed_partitions"] == 0
    got = pd.concat(
        [pd.read_json(f, lines=True, compression="gzip") for f in files]
    )
    want = read_table(lake).to_pandas()
    key = lambda df: df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got, want = key(got), key(want)
    assert len(got) == len(want)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["text"].fillna("").tolist() == want["text"].fillna("").tolist()
    # timestamps survive the ISO round-trip to the microsecond
    got_ts = pd.to_datetime(got["ts"], utc=True).dt.tz_localize(None)
    assert (got_ts == want["ts"]).all()

    # shard sizing respected
    assert any(
        len(glob.glob(os.path.join(d, "data-*.jsonl.gz"))) > 1
        for d in glob.glob(os.path.join(out, "part=*"))
    )

    # format-aware markers: same version re-export as parquet rewrites
    res2 = export_snapshot(lake, out, fmt="parquet", max_rows_per_file=300)
    assert res2["resumed_partitions"] == 0
    assert glob.glob(os.path.join(out, "part=*", "data-*.parquet"))
    # and a jsonl re-export after that resumes nothing either, but a
    # jsonl re-export over jsonl markers resumes everything
    export_snapshot(lake, out, fmt="jsonl", max_rows_per_file=300)
    res3 = export_snapshot(lake, out, fmt="jsonl", max_rows_per_file=300)
    assert res3["resumed_partitions"] == res3["partitions"]


def test_export_orc_roundtrips_through_stripe_reader(tmp_path):
    # fmt="orc" shards read back (stripe-parallel) equal to read_table
    from aws_serverless_elt_pipeline_enterprise_ray.sources.changelog import (
        read_changelog_orc,
    )

    gen_changes(
        str(tmp_path / "ch"), n_events=6_000, n_convs=60, n_files=3, seed=11,
        delete_ratio=0.05,
    )
    lake, out = str(tmp_path / "lake"), str(tmp_path / "out")
    apply_changes(str(tmp_path / "ch"), lake, default_spec(num_partitions=4))
    res = export_snapshot(lake, out, max_rows_per_file=500, fmt="orc")
    files = sorted(glob.glob(os.path.join(out, "part=*", "data-*.orc")))
    assert files and res["rows"] > 0
    got = (
        read_changelog_orc(files).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = (
        read_table(lake).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # ts came back at engine precision, not ORC's ns
    assert str(got["ts"].dtype) == str(want["ts"].dtype)
    # resume: second export skips every partition
    res2 = export_snapshot(lake, out, max_rows_per_file=500, fmt="orc")
    assert res2["resumed_partitions"] == res2["partitions"]
    # fmt change at same version must NOT resume from parquet markers
    out2 = str(tmp_path / "out2")
    export_snapshot(lake, out2, fmt="parquet")
    res3 = export_snapshot(lake, out2, fmt="orc")
    assert res3["resumed_partitions"] == 0


def test_orc_reader_fans_out_per_stripe(tmp_path):
    # a multi-stripe file becomes multiple read tasks, order-preserving
    import pyarrow as pa
    from pyarrow import orc as _orc

    from aws_serverless_elt_pipeline_enterprise_ray.sources.changelog import (
        read_changelog_orc,
    )

    t = pa.table({"x": list(range(5000)), "s": [f"r{i}" for i in range(5000)]})
    p = str(tmp_path / "multi.orc")
    _orc.write_table(t, p, stripe_size=4 * 1024)
    assert _orc.ORCFile(p).nstripes > 1
    ds = read_changelog_orc([p])
    df = ds.to_pandas().sort_values("x").reset_index(drop=True)
    assert len(df) == 5000 and list(df["x"][:3]) == [0, 1, 2]
    # column projection prunes at the stripe read
    only = read_changelog_orc([p], columns=["x"]).schema().names
    assert only == ["x"]
