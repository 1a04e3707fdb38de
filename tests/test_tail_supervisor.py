"""Supervised tailer: SIGKILL an always-on tail child mid-stream and
prove the supervisor restarts it and the lake still converges to the
oracle with no duplicate application — the restart shield for faults
outside the engine (e.g. the Ray-core task-GC race that kills a
long-lived driver between Dataset executions)."""

import os
import shutil
import signal
import threading
import time

import pytest

from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tail import supervised_tail
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

from test_cdc_e2e import assert_matches_oracle


@pytest.mark.slow
def test_supervisor_restarts_killed_tailer_and_converges(tmp_path):
    staging = str(tmp_path / "staging")
    changes = str(tmp_path / "ch")
    lake = str(tmp_path / "lake")
    os.makedirs(changes)
    gen_changes(staging, n_events=12_000, n_convs=80, n_files=10, seed=311)
    files = sorted(os.listdir(staging))
    # first wave lands before the tailer starts
    for f in files[:3]:
        shutil.copy(os.path.join(staging, f), os.path.join(changes, f))

    children = []
    stats_box = {}

    def run():
        stats_box["stats"] = supervised_tail(
            changes, lake,
            partitions=4, poll_seconds=0.2, max_idle_rounds=10,
            max_restarts=3, num_cpus=2,
            on_spawn=lambda p: children.append(p),
        )

    t = threading.Thread(target=run, daemon=True)
    t.start()

    # wait for the first incarnation to commit the first wave
    store = ManifestStore(lake)
    deadline = time.monotonic() + 180
    while time.monotonic() < deadline:
        if (store.current_version() or 0) >= 1:
            break
        time.sleep(0.1)
    else:
        pytest.fail("no commit observed within 180s")

    # SIGKILL the child's whole tree (tail driver + its Ray session)
    assert children, "on_spawn hook never fired"
    first = children[0]
    os.killpg(os.getpgid(first.pid), signal.SIGKILL)

    # second wave arrives while the tailer is dead; the restarted
    # incarnation must pick it up from the committed checkpoint
    for f in files[3:]:
        shutil.copy(os.path.join(staging, f), os.path.join(changes, f))

    t.join(timeout=240)
    assert not t.is_alive(), "supervisor did not return"
    stats = stats_box["stats"]
    assert stats["restarts"] >= 1
    assert stats["incarnations"] == stats["restarts"] + 1
    assert len(children) == stats["incarnations"]
    # exactly-once across the crash: final state equals the oracle of
    # the FULL stream, no resurrections, no double-applies
    assert_matches_oracle(lake, staging)
