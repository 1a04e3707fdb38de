"""Manifest commit-protocol unit tests: atomicity, stale-commit
rejection, single-winner version race, rollback/reset, gc."""

import json
import os

import pytest

from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
    Manifest,
    ManifestStore,
)


def mk(version, parent, partitions=None, applied=None):
    return Manifest(
        version=version,
        parent_version=parent,
        created_at="2026-01-01T00:00:00Z",
        schema=[("conv_id", "string")],
        partitions=partitions or {},
        applied=applied or [],
        watermark=-1,
        metrics={},
        lineage={},
        quarantine=[],
        partitioning={"num_partitions": 4, "hot_keys": [], "hot_key_salt": 8,
                      "hash_impl": "x", "key_cols": ["conv_id", "turn_idx"]},
    )


def test_commit_roundtrip_and_stale_rejection(tmp_path):
    store = ManifestStore(str(tmp_path / "lake"))
    store.commit(mk(1, None))
    assert store.current_version() == 1
    m = store.load()
    assert m.partitioning["num_partitions"] == 4
    # stale parent rejected
    with pytest.raises(RuntimeError, match="stale"):
        store.commit(mk(2, None))
    store.commit(mk(2, 1))
    assert store.versions() == [1, 2]


def test_version_race_single_winner(tmp_path):
    """Two committers with the same parent: exactly one wins."""
    store = ManifestStore(str(tmp_path / "lake"))
    store.commit(mk(1, None))
    a, b = mk(2, 1), mk(2, 1)
    store.commit(a)
    with pytest.raises(RuntimeError, match="already exists|stale"):
        store.commit(b)
    assert store.current_version() == 2


def test_reset_and_rollback(tmp_path):
    store = ManifestStore(str(tmp_path / "lake"))
    store.commit(mk(1, None))
    store.commit(mk(2, 1))
    store.rollback(1)
    assert store.current_version() == 1
    store.reset()
    assert store.current_version() is None
    # next_version continues past existing immutable versions
    assert store.next_version() == 3


def test_current_pointer_is_json(tmp_path):
    store = ManifestStore(str(tmp_path / "lake"))
    store.commit(mk(1, None))
    with open(os.path.join(store.dir, "CURRENT")) as f:
        assert json.load(f) == {"version": 1}


def test_history_summarizes_every_version(tmp_path):
    import pandas as pd

    from aws_serverless_elt_pipeline_enterprise_ray import apply_dataset, default_spec
    from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

    lake = str(tmp_path / "lake")
    spec = default_spec(num_partitions=4)
    for j in range(3):
        df = pd.DataFrame(
            [
                {"op": "I", "seq": j * 100 + i, "conv_id": f"c{i % 5}",
                 "turn_idx": j * 100 + i, "role": "user", "text": "t",
                 "tool": None, "ts": pd.Timestamp("2026-01-01")}
                for i in range(50)
            ]
        )
        apply_dataset(df, lake, spec, label=f"b{j}")

    h = ManifestStore(lake).history()
    assert [r["version"] for r in h] == [1, 2, 3]
    assert h[0]["parent_version"] is None and h[2]["parent_version"] == 2
    assert h[2]["rows"] == 150 and h[2]["watermark"] == 249
    assert all(r["files"] > 0 and r["bytes"] > 0 for r in h)
    assert h[1]["metrics"]["events_applied"] == 50


def test_tags_pin_versions_through_gc(tmp_path):
    """Named savepoints: read_table(version="name") resolves the tag,
    gc keeps a tagged version's files alive past keep_versions, and
    untagging releases them."""
    import pandas as pd

    import aws_serverless_elt_pipeline_enterprise_ray as engine

    lake = str(tmp_path / "lake")
    spec = engine.default_spec(num_partitions=2)
    for i in range(4):
        engine.apply_dataset(
            pd.DataFrame([{
                "op": "I", "seq": i, "conv_id": f"c{i}", "turn_idx": 0,
                "role": "user", "text": f"v{i}", "tool": None,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i),
            }]),
            lake, spec, label=f"b{i}",
        )
    store = ManifestStore(lake)
    assert store.tag("baseline", 1) == 1

    df = engine.read_table(lake, version="baseline").to_pandas()
    assert list(df["conv_id"]) == ["c0"]

    # gc keeping only the last version must preserve the tagged one
    store.gc(keep_versions=1, min_age_seconds=0)
    df = engine.read_table(lake, version="baseline").to_pandas()
    assert list(df["conv_id"]) == ["c0"]

    store.untag("baseline")
    removed = store.gc(keep_versions=1, min_age_seconds=0)
    assert removed  # v1-only files now collectable
