"""Policy-driven maintenance (pipelines/maintain.py): LSM depth
triggers compaction, post-commit hot keys trigger a salted rebalance,
and neither changes the visible state."""

import pandas as pd

from aws_serverless_elt_pipeline_enterprise_ray import (
    apply_dataset,
    default_spec,
    read_table,
)
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.maintain import (
    detect_hot_keys,
    maintain,
)
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.stats import lake_stats


def _batch(n, label_offset=0, conv_fn=lambda i: f"c{i % 9}", ts="2026-01-01"):
    return pd.DataFrame(
        [
            {"op": "I", "seq": label_offset + i, "conv_id": conv_fn(i),
             "turn_idx": label_offset + i, "role": "user",
             "text": f"t{i}", "tool": None, "ts": pd.Timestamp(ts)}
            for i in range(n)
        ]
    )


def _state(lake):
    return (
        read_table(lake).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def test_maintain_compacts_deep_partitions(tmp_path):
    lake = str(tmp_path / "lake")
    spec = default_spec(num_partitions=4)
    # big base, then small deltas (<20% of a partition) stack LSM runs
    apply_dataset(_batch(8_000), lake, spec, label="base")
    for b in range(4):
        apply_dataset(
            _batch(100, label_offset=10_000 + b * 1000), lake, label=f"b{b}"
        )
    assert lake_stats(lake)["max_files_per_partition"] >= 4
    before = _state(lake)

    plan = maintain(lake, dry_run=True)
    assert plan["action"] == "compact" and plan["dry_run"]
    assert lake_stats(lake)["max_files_per_partition"] >= 4  # untouched

    res = maintain(lake)
    assert res["action"] == "compact" and res["detail"]["version"] is not None
    assert lake_stats(lake)["max_files_per_partition"] == 1
    pd.testing.assert_frame_equal(_state(lake), before)


def test_maintain_rebalances_hot_key(tmp_path):
    lake = str(tmp_path / "lake")
    spec = default_spec(num_partitions=8)
    # 80% of rows land on one conversation discovered AFTER commit 1
    apply_dataset(_batch(2_000), lake, spec, label="seed")
    hot = _batch(
        20_000, label_offset=10_000,
        conv_fn=lambda i: "c_hot" if i % 5 else f"c{i % 9}",
    )
    apply_dataset(hot, lake, label="hotwave")
    s = lake_stats(lake)
    assert s["row_skew"] >= 4.0

    found = detect_hot_keys(lake, [h["part_id"] for h in s["hot_partitions"]])
    assert "c_hot" in found

    before = _state(lake)
    res = maintain(lake, min_rows_for_rebalance=1_000)
    assert res["action"] == "rebalance"
    assert "c_hot" in res["detail"]["hot_keys"]
    after_stats = lake_stats(lake)
    assert "c_hot" in after_stats["partitioning"]["hot_keys"]
    assert after_stats["row_skew"] < s["row_skew"]
    pd.testing.assert_frame_equal(_state(lake), before)

    # stable: a second maintain finds nothing new to do
    res2 = maintain(lake, min_rows_for_rebalance=1_000)
    assert res2["action"] in ("none", "compact")


def test_tail_auto_maintenance(tmp_path):
    """tail(maintain_every=N) compacts the LSM runs its own micro-
    commits stacked; visible state is unchanged."""
    import os
    import shutil

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tail import tail
    from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes

    staged = str(tmp_path / "staged")
    changes = str(tmp_path / "ch")
    lake = str(tmp_path / "lake")
    os.makedirs(changes)
    # a big seed commit, then small deltas (delta-append -> runs stack)
    apply_dataset(_batch(8_000), lake, default_spec(num_partitions=4), label="seed")
    files = gen_changes(staged, n_events=400, n_convs=9, n_files=4, seed=77)
    for f in files:
        shutil.copy(f, os.path.join(changes, os.path.basename(f)))

    stats = tail(
        changes, lake, default_spec(num_partitions=4),
        poll_seconds=0.05, max_idle_rounds=2,
        commit_every_files=1, maintain_every=2,
    )
    assert stats["commits"] == 4
    assert "compact" in stats["maintenance"]
    assert lake_stats(lake)["max_files_per_partition"] == 1
