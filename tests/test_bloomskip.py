"""Per-file key Bloom sidecars: third-level point-lookup pruning
beyond hash partitions and min/max zone maps."""

import numpy as np
import pandas as pd

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.functions.bloom import Bloom
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import lakefs
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import (
    read_conversations,
)
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
    ManifestStore,
)


def _entries(lake):
    m = ManifestStore(lake).load()
    return [f for files in m.partitions.values() for f in files]


def _build(tmp_path):
    ch, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(ch, n_events=4000, n_convs=50, n_files=3, seed=61)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(ch, lake, spec)
    return ch, lake, spec


def test_bloom_sidecars_written_and_readable(tmp_path):
    _, lake, _ = _build(tmp_path)
    fs = lakefs(lake)
    entries = _entries(lake)
    assert entries and all(e.get("bloom") for e in entries)
    for e in entries:
        raw = fs.read_bytes(fs.full(e["bloom"]))
        assert len(raw) * 8 == e["bloom_bits"]
        bl = Bloom(np.frombuffer(raw, dtype=np.uint8),
                   e["bloom_bits"], e["bloom_k"])
        # zone-map endpoints are real keys -> the bloom must contain them
        assert bl.contains(pd.Series([e["key_min"], e["key_max"]])).all()


def test_bloom_prunes_range_straddling_miss(tmp_path):
    """A key lexically INSIDE a file's [key_min, key_max] but absent
    from the lake: the range check keeps the file, the bloom drops it."""
    _, lake, _ = _build(tmp_path)
    fs = lakefs(lake)
    entries = _entries(lake)
    # conv ids are conv_000000..conv_000049; the ghost sorts between
    # conv_000024 and conv_000025 and exists nowhere
    ghost = "conv_000024a"
    straddlers = [
        e for e in entries
        if e.get("key_min") and e["key_min"] <= ghost <= e["key_max"]
    ]
    assert straddlers, "fixture should produce range-straddling files"
    for e in straddlers:
        raw = fs.read_bytes(fs.full(e["bloom"]))
        bl = Bloom(np.frombuffer(raw, dtype=np.uint8),
                   e["bloom_bits"], e["bloom_k"])
        assert not bl.contains(pd.Series([ghost])).any()
    # end-to-end: the pruned read returns empty without error
    assert read_conversations(lake, [ghost]).count() == 0


def test_bloom_pruned_read_matches_full_filter(tmp_path):
    _, lake, _ = _build(tmp_path)
    want = ["conv_000003", "conv_000017", "conv_000041"]
    got = (
        read_conversations(lake, want)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    full = engine.read_table(lake).to_pandas()
    exp = (
        full[full["conv_id"].isin(want)]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_bloom_survives_lsm_delta_and_gc(tmp_path):
    ch, lake, spec = _build(tmp_path)
    # tiny second apply -> LSM delta run (overlapping key ranges)
    ch2 = str(tmp_path / "ch2")
    gen_changes(ch2, n_events=120, n_convs=50, n_files=1, seed=67)
    engine.apply_changes(ch2, lake, spec)
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import (
        compact,
    )

    compact(lake)
    store = ManifestStore(lake)
    removed = store.gc(keep_versions=1, min_age_seconds=0.0)
    fs = lakefs(lake)
    live = _entries(lake)
    # every live file keeps its sidecar; superseded sidecars are swept
    for e in live:
        assert fs.exists(fs.full(e["bloom"]))
    assert any(r.endswith(".bloom") for r in removed)
    # point-lookup a key that exists in the compacted state
    key = engine.read_table(lake).to_pandas()["conv_id"].iloc[0]
    got = read_conversations(lake, [key]).to_pandas()
    assert set(got["conv_id"]) == {key} and len(got) > 0


def test_bloom_kill_switch(tmp_path, monkeypatch):
    monkeypatch.setenv("GRAFT_FILE_BLOOMS", "0")
    _, lake, _ = _build(tmp_path)
    assert all(not e.get("bloom") for e in _entries(lake))
    # reads still work without sidecars
    assert read_conversations(lake, ["conv_000003"]).count() > 0
