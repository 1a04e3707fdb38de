"""DQ gate, compaction, replay, CLI surface."""

import glob
import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes, oracle_final_state
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dq import dq_gate, run_dq
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.replay import replay
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

from test_cdc_e2e import assert_matches_oracle, final_table


@pytest.fixture(scope="module")
def lake_and_stream(tmp_path_factory):
    d = tmp_path_factory.mktemp("lc")
    changes, lake = str(d / "ch"), str(d / "lake")
    gen_changes(changes, n_events=6000, n_convs=80, n_files=6, seed=23)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=8),
                         commit_every_files=2)
    return changes, lake


def test_dq_passes_on_healthy_lake(lake_and_stream):
    changes, lake = lake_and_stream
    report = run_dq(lake)
    assert report["ok"], report
    assert report["checks"]["row_count"]["value"] == final_table(lake).num_rows
    assert report["checks"]["unique"]["dup_keys"] == 0
    assert os.path.exists(
        os.path.join(lake, "_dq", f"report-{report['version']:06d}.json")
    )


def test_dq_gate_demotes_on_violation(tmp_path):
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=2000, n_convs=40, n_files=2, seed=29)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(changes, lake, spec)
    store = ManifestStore(lake)
    v_good = store.current_version()
    # violating rule: turn_idx must be < 0 (impossible) -> gate fails
    import dataclasses

    bad_rules = dataclasses.replace(spec.dq, ranges={"turn_idx": (None, -1)})
    bad_spec = dataclasses.replace(spec, dq=bad_rules)
    # commit another version first so there is something to demote
    gen_changes(changes + "2", n_events=500, n_convs=40, n_files=1, seed=31)
    engine.apply_changes(changes + "2", lake, spec)
    v_new = store.current_version()
    assert v_new != v_good
    report = dq_gate(lake, bad_spec)
    assert not report["ok"]
    assert store.current_version() == v_good
    marker = glob.glob(os.path.join(lake, "_quarantine", "dq", "*.json"))
    assert marker


def test_compact_repacks_and_preserves_state(lake_and_stream):
    changes, lake = lake_and_stream
    store = ManifestStore(lake)
    before = final_table(lake)
    n_files_before = len(store.load().all_files())
    m = compact(lake, target_rows_per_file=100_000, purge_tombstones=True)
    assert m is not None
    n_files_after = len(m.all_files())
    assert n_files_after <= n_files_before
    # tombstones purged: no _deleted=true rows remain on disk
    for p in m.all_files():
        t = pq.read_table(os.path.join(lake, p), columns=["_deleted"])
        assert t["_deleted"].to_pylist().count(True) == 0
    after = final_table(lake)
    assert before.equals(after)
    assert_matches_oracle(lake, changes)
    # checkpoint survives compaction: nothing to re-apply
    assert engine.apply_changes(changes, lake) == []


def test_compact_stamp_ingested_at(tmp_path):
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=1000, n_convs=20, n_files=2, seed=37)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=2))
    m = compact(lake, stamp_ingested_at="2026-01-01T00:00:00Z", min_files_to_compact=1)
    assert ("_ingested_at", "string") in [tuple(c) for c in m.schema]
    for p in m.all_files():
        t = pq.read_table(os.path.join(lake, p))
        assert "_ingested_at" in t.column_names


def test_full_replay_reproduces_state(lake_and_stream):
    changes, lake = lake_and_stream
    before = final_table(lake)
    ms = replay(changes, lake, engine.default_spec(num_partitions=8))
    assert ms, "full replay should re-apply everything"
    after = final_table(lake)
    assert before.equals(after), "replay must reproduce identical final state"


def test_partial_replay_from_version(lake_and_stream):
    changes, lake = lake_and_stream
    store = ManifestStore(lake)
    before = final_table(lake)
    ms = replay(changes, lake, engine.default_spec(num_partitions=8), from_version=1)
    assert ms
    assert final_table(lake).equals(before)


def test_cli_roundtrip(tmp_path):
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "aws_serverless_elt_pipeline_enterprise_ray.cli", *args],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=240,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    assert run("gen", "--out", changes, "--events", "1500", "--convs", "30",
               "--files", "3")["files"] == 3
    res = run("--num-cpus", "4", "ingest", "--changelog", changes, "--lake", lake,
              "--partitions", "4")
    assert res["committed_versions"] == [1]
    show = run("show", "--lake", lake)
    assert show["version"] == 1 and show["watermark"] == 1499
    dq = run("--num-cpus", "4", "dq", "--lake", lake)
    assert dq["ok"]
    gc = run("gc", "--lake", lake)
    assert "removed" in gc


def test_tombstone_purge_horizon(tmp_path):
    """A purged tombstone can be resurrected by a later out-of-order
    older upsert - so purging is gated by an event-time horizon and
    only removes tombstones below it."""
    import pyarrow as pa
    from aws_serverless_elt_pipeline_enterprise_ray.gen import EPOCH_US

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=2000, n_convs=30, n_files=2, seed=47,
                delete_ratio=0.3)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=2))
    store = ManifestStore(lake)

    # horizon in the middle of the stream: only old tombstones purged
    horizon = EPOCH_US + 1000 * 1_000_000
    m = compact(lake, purge_tombstones_before_us=horizon, min_files_to_compact=1)
    assert m is not None
    kept_old, kept_new = 0, 0
    for p in m.all_files():
        t = pq.read_table(os.path.join(lake, p), columns=["_deleted", "ts"])
        for dele, ts in zip(t["_deleted"].to_pylist(), t["ts"].to_pylist()):
            if dele:
                epoch_us = int(ts.timestamp() * 1_000_000)
                if epoch_us < horizon:
                    kept_old += 1
                else:
                    kept_new += 1
    assert kept_old == 0, "tombstones below the horizon must be purged"
    assert kept_new > 0, "tombstones above the horizon must survive"
    # live data unchanged
    assert_matches_oracle(lake, changes)


def test_redrive_quarantined_rows(tmp_path):
    """DLQ redrive analogue: quarantined rows re-emitted as a new
    change file; a permissive transform then accepts the fixable ones;
    unfixable rows land back in quarantine. Quarantine ledger clears."""
    import dataclasses

    import pyarrow as pa
    import pyarrow.compute as pc

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.redrive import redrive

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=2000, n_convs=30, n_files=2, seed=83,
                bad_ratio=0.05)
    spec = engine.default_spec(num_partitions=4)
    ms = engine.apply_changes(changes, lake, spec)
    n_quar = ms[-1].metrics["quarantined"]
    assert n_quar > 0
    store = ManifestStore(lake)
    assert store.load().quarantine

    res = redrive(lake, changes, spec)
    assert res["rows"] == n_quar
    assert os.path.basename(res["file"]).startswith("redrive-")
    assert store.load().quarantine == []

    # fix-up transform: unknown ops become inserts (the "cause fixed"
    # scenario); null-key / null-ts rows remain genuinely bad
    def fix_ops(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("op")
        fixed = pc.if_else(
            pc.is_in(batch["op"], value_set=pa.array(["I", "U", "D"])),
            batch["op"],
            pa.scalar("I"),
        )
        return batch.set_column(i, "op", fixed)

    fix_spec = dataclasses.replace(spec, transform=fix_ops)
    ms2 = engine.apply_changes(changes, lake, fix_spec)
    assert ms2, "redrive file should be pending"
    m2 = ms2[-1]
    # unknown-op rows recovered; null-key/null-ts rows re-quarantined
    assert m2.metrics["events_applied"] > 0
    assert m2.metrics["quarantined"] < n_quar


def test_dq_only_changed_validates_touched_partitions(tmp_path):
    """Incremental DQ: a tiny follow-up commit is validated at
    O(delta) - only lineage partitions are read, partition-local rules
    still fire there, the global row_count check reports skipped."""
    import dataclasses

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=4000, n_convs=60, n_files=4, seed=37)
    spec = engine.default_spec(num_partitions=8)
    engine.apply_changes(changes, lake, spec)
    # small delta commit touching a subset of partitions
    gen_changes(changes + "2", n_events=200, n_convs=3, n_files=1, seed=41)
    engine.apply_changes(changes + "2", lake, spec)
    store = ManifestStore(lake)
    m = store.load()
    touched = len(m.lineage)
    total = sum(1 for _, f in m.partitions.items() if f)
    assert 0 < touched < total, (touched, total)

    rep = run_dq(lake, spec, only_changed=True)
    assert rep["ok"], rep
    assert rep["only_changed"] is True
    assert rep["checked_partitions"] == touched
    assert rep["checks"]["row_count"].get("skipped") is True
    assert os.path.exists(
        os.path.join(lake, "_dq", f"report-{rep['version']:06d}-incr.json")
    )

    # a violation inside a TOUCHED partition is still caught
    bad_rules = dataclasses.replace(spec.dq, ranges={"turn_idx": (None, -1)})
    bad_spec = dataclasses.replace(spec, dq=bad_rules)
    rep2 = run_dq(lake, bad_spec, only_changed=True)
    assert not rep2["ok"]
    assert rep2["checks"]["range"]["turn_idx"]["violations"] > 0
