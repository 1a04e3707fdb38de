"""Initial-snapshot bootstrap → streaming handoff: overlap
idempotency, delete-after-snapshot, stale-stream-event loss, and
bootstrap exactly-once."""

import pandas as pd

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.bootstrap import (
    bootstrap_lake,
)
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
    ManifestStore,
)


def _ts(h):
    return pd.Timestamp(2026, 1, 1, h)


def _snapshot():
    # state as of "hour 2": k1 said hello(v2), k2 exists, k3 exists
    return pd.DataFrame(
        {
            "conv_id": ["k1", "k2", "k3"],
            "turn_idx": [0, 0, 0],
            "role": ["user"] * 3,
            "text": ["hello-v2", "keep-me", "doomed"],
            "tool": [None] * 3,
            "ts": [_ts(2), _ts(1), _ts(1)],
        }
    )


def _stream():
    # the FULL stream from the beginning, overlapping the snapshot
    return pd.DataFrame(
        {
            "op": ["I", "U", "I", "I", "D", "U"],
            "seq": [1, 2, 3, 4, 5, 6],
            "conv_id": ["k1", "k1", "k2", "k3", "k3", "k4"],
            "turn_idx": [0, 0, 0, 0, 0, 0],
            "role": ["user"] * 6,
            "text": ["hello-v1", "hello-v2", "keep-me", "doomed", None,
                     "late-join"],
            "tool": [None] * 6,
            "ts": [_ts(1), _ts(2), _ts(1), _ts(1), _ts(3), _ts(4)],
        }
    )


def test_bootstrap_then_full_replay_converges(tmp_path):
    lake = str(tmp_path / "lake")
    spec = engine.default_spec(num_partitions=4)
    ms = bootstrap_lake(
        engine_snapshot := _snapshot(), lake, spec
    )
    assert [m.version for m in ms] == [1]
    assert engine.read_table(lake).count() == len(engine_snapshot)

    engine.apply_dataset(_stream(), lake, spec, label="stream-000001")
    got = (
        engine.read_table(lake)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    # k1: replayed v2 (same ts, real seq) wins with identical content;
    # k2 unchanged; k3 deleted AFTER the snapshot; k4 streamed in later
    assert list(got["conv_id"]) == ["k1", "k2", "k4"]
    assert list(got["text"]) == ["hello-v2", "keep-me", "late-join"]


def test_stale_stream_event_loses_to_snapshot(tmp_path):
    lake = str(tmp_path / "lake")
    spec = engine.default_spec(num_partitions=4)
    bootstrap_lake(_snapshot(), lake, spec)
    # an event OLDER than the snapshot row's ts must not regress it
    stale = pd.DataFrame(
        {
            "op": ["U"],
            "seq": [99],
            "conv_id": ["k1"],
            "turn_idx": [0],
            "role": ["user"],
            "text": ["hello-v0"],
            "tool": [None],
            "ts": [_ts(0)],
        }
    )
    engine.apply_dataset(stale, lake, spec, label="stale-000001")
    got = engine.read_table(lake).to_pandas()
    assert got.loc[got["conv_id"] == "k1", "text"].iloc[0] == "hello-v2"


def test_bootstrap_is_exactly_once(tmp_path):
    lake = str(tmp_path / "lake")
    spec = engine.default_spec(num_partitions=4)
    bootstrap_lake(_snapshot(), lake, spec)
    v1 = ManifestStore(lake).current_version()
    # same label -> staged files reused, apply is a checkpoint no-op
    assert bootstrap_lake(_snapshot(), lake, spec) == []
    assert ManifestStore(lake).current_version() == v1
