"""Multi-writer stress on the object lake: N concurrent writer
processes (own Ray sessions) tail the same changelog into the same
s3sim:// lake with per-file commits; some are SIGKILLed mid-run and
restarted. Invariants under ANY interleaving: version numbers are
gapless, every change file lands in exactly ONE commit's lineage,
the final state matches the duckdb LWW oracle, and gc under/after the
race never touches referenced data. (Round-3 verdict item 8: scale the
two-tailer race to kill/restart stress.)"""

import glob
import os
import random
import signal
import subprocess
import sys
import time

import pytest

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

from test_cdc_e2e import assert_matches_oracle


def _writer(changes: str, lake: str) -> subprocess.Popen:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("RAY_ADDRESS", None)  # each writer owns a private session
    return subprocess.Popen(
        [
            sys.executable, "-m", "aws_serverless_elt_pipeline_enterprise_ray.cli",
            "--num-cpus", "2", "ingest", "--changelog", changes, "--lake", lake,
            "--partitions", "4", "--commit-every", "1",
        ],
        env=env, cwd="/root/repo",
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        preexec_fn=os.setsid,
    )


@pytest.mark.parametrize("backend", ["s3sim", "posix"])
def test_multiwriter_kill_restart_stress(tmp_path, backend):
    """Parametrized over BOTH commit protocols: the object single-step
    path and the POSIX two-step path (exclusive create = commit point,
    CURRENT = roll-forwardable cache; kill/restart exercises corpse
    roll-forward and the lost-commit fence)."""
    rng = random.Random(20260818)
    changes = str(tmp_path / "ch")
    lake = (
        "s3sim://" + str(tmp_path).lstrip("/") + "/lake"
        if backend == "s3sim"
        else str(tmp_path / "lake")
    )
    gen_changes(changes, n_events=24_000, n_convs=120, n_files=12, seed=91)
    all_files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    store = ManifestStore(lake)

    writers = [_writer(changes, lake) for _ in range(4)]
    # let work start, then SIGKILL two writers at random moments and
    # restart them (the restart is the manual analogue of a supervisor)
    deadline = time.monotonic() + 180
    while store.current_version() is None and time.monotonic() < deadline:
        time.sleep(0.1)
    assert store.current_version() is not None, "no writer committed in 180s"
    for _ in range(2):
        time.sleep(rng.uniform(0.5, 2.0))
        victim_i = rng.randrange(len(writers))
        victim = writers[victim_i]
        if victim.poll() is None:
            os.killpg(os.getpgid(victim.pid), signal.SIGKILL)
            victim.wait()
        writers[victim_i] = _writer(changes, lake)

    for w in writers:
        assert w.wait(timeout=300) is not None
    # every surviving writer exited cleanly (auto-retry absorbed races)
    for w in writers:
        assert w.returncode == 0, f"writer exited {w.returncode}"

    # gc while nothing is running, then a serial convergence pass
    removed = store.gc(min_age_seconds=0)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=4))

    # 1. gapless version log
    vs = store.versions()
    assert vs == list(range(1, len(vs) + 1)), f"gap in versions: {vs}"
    # 2. per-file exactly-once across ALL commit lineages
    seen: set[str] = set()
    for v in vs:
        m = store.load(v)
        commit_files = {
            f for lin in m.lineage.values() for f in lin.get("src_files", [])
        }
        dup = commit_files & seen
        assert not dup, f"{sorted(dup)} applied by two commits"
        seen |= commit_files
    assert seen == set(all_files)
    # 3. final state matches the oracle; checkpoint complete
    final = store.load()
    assert all(final.is_applied(f) for f in all_files)
    assert_matches_oracle(lake, changes)
    # 4. gc after the dust settles still leaves a readable, correct lake
    store.gc(min_age_seconds=0)
    assert_matches_oracle(lake, changes)
