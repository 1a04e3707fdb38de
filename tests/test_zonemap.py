"""File-level zone maps: min/max key recorded per written chunk and
used by read_conversations to prune files WITHIN a partition."""

import pandas as pd
import pyarrow as pa

from aws_serverless_elt_pipeline_enterprise_ray import (
    apply_changes,
    default_spec,
    read_table,
)
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import (
    read_conversations,
)
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore


def _write_changes(path, n_convs=40, turns=6):
    rows = []
    seq = 0
    for c in range(n_convs):
        for t in range(turns):
            rows.append(
                {
                    "op": "I",
                    "seq": seq,
                    "conv_id": f"conv_{c:04d}",
                    "turn_idx": t,
                    "role": "user",
                    "text": f"t{c}-{t}",
                    "tool": None,
                    "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=seq),
                }
            )
            seq += 1
    pd.DataFrame(rows).to_parquet(path)


def test_zone_maps_recorded_and_pruning_exact(tmp_path):
    ch = tmp_path / "ch"
    ch.mkdir()
    _write_changes(str(ch / "c1.parquet"))
    lake = str(tmp_path / "lake")
    # 2 partitions x tiny files -> many key-ranged files per partition
    apply_changes(
        str(ch), lake, default_spec(num_partitions=2), max_rows_per_file=30
    )

    m = ManifestStore(lake).load()
    all_files = [f for fs in m.partitions.values() for f in fs]
    assert len(all_files) >= 6
    assert all("key_min" in f and "key_max" in f for f in all_files)
    assert all(f["key_min"] <= f["key_max"] for f in all_files)

    target = "conv_0007"
    got = read_conversations(lake, [target]).to_pandas()
    want = read_table(lake).to_pandas()
    want = want[want["conv_id"] == target]
    pd.testing.assert_frame_equal(
        got.sort_values("turn_idx").reset_index(drop=True),
        want.sort_values("turn_idx").reset_index(drop=True),
    )
    # the zone maps must actually exclude files: at least one file in
    # the target's own partition cannot contain the key
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import (
        conv_partitions,
    )

    (pid,) = conv_partitions(m, [target])
    part_files = m.partitions[str(pid)]
    prunable = [
        f for f in part_files if f["key_max"] < target or f["key_min"] > target
    ]
    assert prunable, "expected at least one file prunable by key range"


def test_pruned_lookup_sees_lsm_deltas(tmp_path):
    """A delta run carrying an update/delete for the key must survive
    pruning (its range includes the key)."""
    ch1, ch2 = tmp_path / "ch1", tmp_path / "ch2"
    ch1.mkdir(), ch2.mkdir()
    _write_changes(str(ch1 / "c1.parquet"), n_convs=40)
    lake = str(tmp_path / "lake")
    spec = default_spec(num_partitions=2)
    apply_changes(str(ch1), lake, spec, max_rows_per_file=30)

    # small second batch -> delta-append path: update one turn, delete another
    pd.DataFrame(
        [
            {
                "op": "U",
                "seq": 10_000,
                "conv_id": "conv_0007",
                "turn_idx": 0,
                "role": "user",
                "text": "EDITED",
                "tool": None,
                "ts": pd.Timestamp("2026-02-01"),
            },
            {
                "op": "D",
                "seq": 10_001,
                "conv_id": "conv_0007",
                "turn_idx": 1,
                "role": None,
                "text": None,
                "tool": None,
                "ts": pd.Timestamp("2026-02-01"),
            },
        ]
    ).to_parquet(str(ch2 / "c2.parquet"))
    m = apply_changes(str(ch2), lake, spec, max_rows_per_file=30)[-1]
    assert m.metrics.get("delta_appends", 0) >= 1  # really took the LSM path

    got = read_conversations(lake, ["conv_0007"]).to_pandas()
    got = got.sort_values("turn_idx").reset_index(drop=True)
    assert list(got["turn_idx"]) == [0, 2, 3, 4, 5]  # turn 1 deleted
    assert got.loc[0, "text"] == "EDITED"


def test_read_key_range_pruned_and_exact(tmp_path):
    """Range scan: zone maps prune files whose [key_min, key_max]
    misses the range; result equals the full-read filter, with and
    without column projection."""
    from aws_serverless_elt_pipeline_enterprise_ray import read_key_range

    ch = tmp_path / "ch"
    ch.mkdir()
    _write_changes(str(ch / "c1.parquet"))
    lake = str(tmp_path / "lake")
    apply_changes(
        str(ch), lake, default_spec(num_partitions=2), max_rows_per_file=30
    )

    lo, hi = "conv_0010", "conv_0014"
    got = (
        read_key_range(lake, lo, hi).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = read_table(lake).to_pandas()
    want = (
        want[(want["conv_id"] >= lo) & (want["conv_id"] <= hi)]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["conv_id"].nunique() == 5

    # pruning actually engaged: the range needs strictly fewer files
    m = ManifestStore(lake).load()
    n_all = sum(len(fs) for fs in m.partitions.values())
    n_hit = sum(
        1
        for fs in m.partitions.values()
        for f in fs
        if f["key_min"] <= hi and lo <= f["key_max"]
    )
    assert 0 < n_hit < n_all

    proj = (
        read_key_range(lake, lo, hi, columns=["text"]).to_pandas()
    )
    assert list(proj.columns) == ["text"] and len(proj) == len(want)


def test_read_time_range_pruned_and_exact(tmp_path):
    """Time-ranged scan with keys minted over time (key <-> ts
    correlated): ts zone maps prune whole files; result equals the
    full-read filter."""
    from aws_serverless_elt_pipeline_enterprise_ray import read_time_range

    ch = tmp_path / "ch"
    ch.mkdir()
    _write_changes(str(ch / "c1.parquet"))
    lake = str(tmp_path / "lake")
    apply_changes(
        str(ch), lake, default_spec(num_partitions=2), max_rows_per_file=30
    )

    m = ManifestStore(lake).load()
    all_files = [f for fs in m.partitions.values() for f in fs]
    assert all("ts_min" in f and "ts_max" in f for f in all_files)

    lo = pd.Timestamp("2026-01-01 00:01:00")
    hi = pd.Timestamp("2026-01-01 00:02:00")
    got = (
        read_time_range(lake, lo, hi).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = read_table(lake).to_pandas()
    want = (
        want[(want["ts"] >= lo) & (want["ts"] <= hi)]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 61  # seq 60..120 inclusive

    lo_us = lo.value // 1000
    hi_us = hi.value // 1000
    n_hit = sum(1 for f in all_files if f["ts_min"] <= hi_us and lo_us <= f["ts_max"])
    assert 0 < n_hit < len(all_files)  # pruning actually engaged

    # column projection composes
    proj = read_time_range(lake, lo, hi, columns=["text"]).to_pandas()
    assert list(proj.columns) == ["text"] and len(proj) == 61


def test_read_time_range_safe_across_delta_runs(tmp_path):
    """With delta runs stacked (overlapping key ranges), per-file ts
    pruning must NOT resurrect a superseded row: a key updated to a ts
    OUTSIDE the queried band disappears from the band even though its
    old version's file overlaps it."""
    from aws_serverless_elt_pipeline_enterprise_ray import read_time_range

    ch1, ch2 = tmp_path / "ch1", tmp_path / "ch2"
    ch1.mkdir(), ch2.mkdir()
    _write_changes(str(ch1 / "c1.parquet"), n_convs=40)
    lake = str(tmp_path / "lake")
    spec = default_spec(num_partitions=2)
    apply_changes(str(ch1), lake, spec, max_rows_per_file=30)

    # delta run: move conv_0007 turn 0 to February
    pd.DataFrame(
        [
            {
                "op": "U",
                "seq": 10_000,
                "conv_id": "conv_0007",
                "turn_idx": 0,
                "role": "user",
                "text": "MOVED",
                "tool": None,
                "ts": pd.Timestamp("2026-02-01"),
            }
        ]
    ).to_parquet(str(ch2 / "c2.parquet"))
    m = apply_changes(str(ch2), lake, spec, max_rows_per_file=30)[-1]
    assert m.metrics.get("delta_appends", 0) >= 1

    # the whole January band: every original row except the moved one
    got = read_time_range(
        lake, pd.Timestamp("2026-01-01"), pd.Timestamp("2026-01-31")
    ).to_pandas()
    moved = got[(got["conv_id"] == "conv_0007") & (got["turn_idx"] == 0)]
    assert len(moved) == 0  # stale January version must not resurface
    want = read_table(lake).to_pandas()
    want = want[
        (want["ts"] >= pd.Timestamp("2026-01-01"))
        & (want["ts"] <= pd.Timestamp("2026-01-31"))
    ]
    assert len(got) == len(want)

    # February band finds exactly the moved row
    feb = read_time_range(
        lake, pd.Timestamp("2026-02-01"), pd.Timestamp("2026-02-28")
    ).to_pandas()
    assert list(feb["text"]) == ["MOVED"]


def test_read_where_generic_stats_pruned_and_exact(tmp_path):
    """Generic column zone maps: a turn_idx range scan equals the
    full-read filter; string predicates work; stats are recorded for
    every primitive payload column; delta-run partitions fall back to
    full reads without resurrecting stale rows."""
    from aws_serverless_elt_pipeline_enterprise_ray import read_where

    ch = tmp_path / "ch"
    ch.mkdir()
    _write_changes(str(ch / "c1.parquet"))
    lake = str(tmp_path / "lake")
    apply_changes(
        str(ch), lake, default_spec(num_partitions=2), max_rows_per_file=30
    )

    m = ManifestStore(lake).load()
    all_files = [f for fs in m.partitions.values() for f in fs]
    for f in all_files:
        st = f.get("stats", {})
        assert {"conv_id", "turn_idx", "role", "text", "ts"} <= set(st)
        assert st["turn_idx"][0] <= st["turn_idx"][1]

    got = (
        read_where(lake, "turn_idx", 2, 3).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = read_table(lake).to_pandas()
    want = (
        want[(want["turn_idx"] >= 2) & (want["turn_idx"] <= 3)]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # string predicate: text column values are "t{c}-{t}"
    s = read_where(lake, "text", "t10-0", "t10-5").to_pandas()
    assert set(s["conv_id"]) == {"conv_0010"} and len(s) == 6

    # projection composes
    proj = read_where(lake, "turn_idx", 2, 3, columns=["text"]).to_pandas()
    assert list(proj.columns) == ["text"] and len(proj) == len(want)

    # delta run: update one row's role, then scan a role range that
    # matches only the OLD value - the updated key must not resurface
    pd.DataFrame(
        [{
            "op": "U", "seq": 10_000, "conv_id": "conv_0003", "turn_idx": 0,
            "role": "zzz", "text": "edited", "tool": None,
            "ts": pd.Timestamp("2026-02-01"),
        }]
    ).to_parquet(str(tmp_path / "c2.parquet"))
    apply_changes(
        [str(tmp_path / "c2.parquet")], lake, default_spec(num_partitions=2),
        max_rows_per_file=30,
    )
    roles = read_where(lake, "role", "user", "user").to_pandas()
    hit = roles[(roles["conv_id"] == "conv_0003") & (roles["turn_idx"] == 0)]
    assert len(hit) == 0  # superseded 'user' version must not come back
    z = read_where(lake, "role", "zzz", "zzz").to_pandas()
    assert len(z) == 1 and z["text"].iloc[0] == "edited"


def test_cluster_by_zorder_pruning_and_safety(tmp_path):
    """Z-order clustering: compact(cluster_by=...) rewrites partitions
    ordered by the clustered columns' interleaved rank codes, so
    read_where prunes files a key-sorted layout cannot; safety comes
    from the shared write-run id (key ranges overlap after the
    reorder); a later delta append demotes the partition to full reads
    without breaking exactness."""
    from aws_serverless_elt_pipeline_enterprise_ray import read_where
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import (
        _key_disjoint,
        _single_run,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import (
        compact,
    )

    ch = tmp_path / "ch"
    ch.mkdir()
    _write_changes(str(ch / "c1.parquet"), n_convs=40, turns=6)
    lake = str(tmp_path / "lake")
    apply_changes(
        str(ch), lake, default_spec(num_partitions=2), max_rows_per_file=30
    )

    # key-sorted layout: every chunk holds the full 0..5 turn cycle, so
    # a turn_idx scan cannot prune anything
    m0 = ManifestStore(lake).load()
    for files in m0.partitions.values():
        hit = [f for f in files if f["stats"]["turn_idx"][0] <= 1]
        assert len(hit) == len(files)

    m = compact(
        lake, target_rows_per_file=30, min_files_to_compact=99,
        cluster_by=("turn_idx",),
    )
    assert m is not None and m.metrics["clustered_by"] == ["turn_idx"]

    want = read_table(lake).to_pandas()
    want = (
        want[(want["turn_idx"] >= 0) & (want["turn_idx"] <= 1)]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    got = (
        read_where(lake, "turn_idx", 0, 1).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    pruned_somewhere = False
    for files in m.partitions.values():
        # the new safety path is what engages: one run, overlapping keys
        assert _single_run(files)
        if len(files) > 1:
            assert not _key_disjoint(files)
        hit = [
            f for f in files
            if f["stats"]["turn_idx"][0] <= 1 and 0 <= f["stats"]["turn_idx"][1]
        ]
        if len(hit) < len(files):
            pruned_somewhere = True
    assert pruned_somewhere

    # delta append -> mixed runs -> full read, still exact
    pd.DataFrame(
        [{
            "op": "U", "seq": 10_000, "conv_id": "conv_0003", "turn_idx": 0,
            "role": "admin", "text": "new", "tool": None,
            "ts": pd.Timestamp("2026-02-01"),
        }]
    ).to_parquet(str(ch / "c2.parquet"))
    apply_changes(str(ch), lake, max_rows_per_file=30)
    m2 = ManifestStore(lake).load()
    assert any(not _single_run(fs) for fs in m2.partitions.values() if fs)
    got2 = read_where(lake, "turn_idx", 0, 0).to_pandas()
    row = got2[got2["conv_id"] == "conv_0003"]
    assert row["text"].tolist() == ["new"]  # no stale resurrection

    # two-column z-order: both columns' zone maps prune somewhere
    m3 = compact(
        lake, target_rows_per_file=30, min_files_to_compact=99,
        cluster_by=("turn_idx", "ts"),
    )
    total = hits_turn = hits_ts = 0
    lo_us = int(pd.Timestamp("2026-01-01 00:02:00").value // 1000)
    hi_us = int(pd.Timestamp("2026-01-01 00:03:00").value // 1000)
    for files in m3.partitions.values():
        total += len(files)
        for f in files:
            st = f["stats"]
            if st["turn_idx"][0] <= 1 and 0 <= st["turn_idx"][1]:
                hits_turn += 1
            if st["ts"][0] <= hi_us and lo_us <= st["ts"][1]:
                hits_ts += 1
    assert hits_turn < total and hits_ts < total
    got3 = (
        read_where(lake, "turn_idx", 0, 1).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want3 = read_table(lake).to_pandas()
    want3 = (
        want3[(want3["turn_idx"] >= 0) & (want3["turn_idx"] <= 1)]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got3, want3)


def test_zorder_argsort_single_column_is_stable_sort():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import (
        _zorder_argsort,
    )
    import numpy as np

    t = pa.table({"a": [3, 1, 2, 1, 3], "b": list("vwxyz")})
    idx = _zorder_argsort(t, ("a",))
    assert [t["a"][int(i)].as_py() for i in idx] == [1, 1, 2, 3, 3]
    # stability: equal keys keep input order
    assert [t["b"][int(i)].as_py() for i in idx] == ["w", "y", "x", "v", "z"]
