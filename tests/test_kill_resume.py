"""Hard kill-and-resume: SIGKILL a real ingest process mid-run, then
resume in a fresh process. The lake must (a) never expose uncommitted
data, (b) resume from the last committed checkpoint without duplicate
application, (c) converge to the oracle state. This is the subprocess
version of the reference's verify-idempotency (Makefile:344-359) with
an actual crash instead of a re-invoke."""

import os
import signal
import subprocess
import sys
import time

import pytest

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

from test_cdc_e2e import assert_matches_oracle


@pytest.mark.parametrize("backend", ["posix", "s3sim"])
def test_sigkill_mid_ingest_then_resume(tmp_path, backend):
    changes = str(tmp_path / "ch")
    lake = (
        str(tmp_path / "lake")
        if backend == "posix"
        else "s3sim://" + str(tmp_path).lstrip("/") + "/lake"
    )
    gen_changes(changes, n_events=20_000, n_convs=100, n_files=10, seed=77)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("RAY_ADDRESS", None)  # child owns its own local session
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "aws_serverless_elt_pipeline_enterprise_ray.cli",
            "--num-cpus", "2", "ingest", "--changelog", changes, "--lake", lake,
            "--partitions", "4", "--commit-every", "1",
        ],
        env=env, cwd="/root/repo",
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        preexec_fn=os.setsid,  # own process group: we kill the whole tree
    )
    # wait until at least one commit landed, then SIGKILL the driver
    store = ManifestStore(lake)
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        v = store.current_version()
        if v is not None and v >= 1:
            break
        if proc.poll() is not None:
            pytest.fail("ingest finished before we could kill it")
        time.sleep(0.05)
    else:
        proc.kill()
        pytest.fail("no commit observed within 120s")
    # SIGKILL the whole child tree (driver + its private Ray session).
    # NEVER `ray stop --force` here - that would kill the test
    # session's own Ray cluster too.
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait()

    import glob as _glob
    all_files = sorted(_glob.glob(os.path.join(changes, "*.parquet")))
    v_killed = store.current_version()
    m_killed = store.load()
    applied_killed = {f for f in all_files if m_killed.is_applied(f)}
    assert v_killed >= 1
    assert len(applied_killed) == v_killed  # commit_every=1

    # resume in-process (the session fixture's Ray); only pending files apply
    manifests = engine.apply_changes(
        changes, lake, engine.default_spec(num_partitions=4)
    )
    assert manifests, "resume should have pending work"
    final = store.load()
    assert all(final.is_applied(f) for f in all_files)
    assert all(final.is_applied(f) for f in applied_killed)
    # checkpoint stays compact: exceptions list bounded, watermark set
    assert len(final.applied) == 0 and final.applied_watermarks
    assert_matches_oracle(lake, changes)

    # orphans from the killed attempt are unreferenced; gc removes them
    removed = store.gc(min_age_seconds=0)
    assert_matches_oracle(lake, changes)


@pytest.mark.parametrize("backend", ["posix", "s3sim"])
def test_sigkill_mid_pipelined_ingest_then_resume(tmp_path, backend):
    """Same hard-kill contract with the pipelined apply: the prefetch
    thread writes nothing, so a SIGKILL mid-run loses at most the
    uncommitted chunk and a serial resume converges to the oracle."""
    changes = str(tmp_path / "ch")
    lake = (
        str(tmp_path / "lake")
        if backend == "posix"
        else "s3sim://" + str(tmp_path).lstrip("/") + "/lake"
    )
    gen_changes(changes, n_events=20_000, n_convs=100, n_files=10, seed=79)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["GRAFT_PIPELINE_COMMITS"] = "1"
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "aws_serverless_elt_pipeline_enterprise_ray.cli",
            "--num-cpus", "2", "ingest", "--changelog", changes, "--lake", lake,
            "--partitions", "4", "--commit-every", "1",
        ],
        env=env, cwd="/root/repo",
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        preexec_fn=os.setsid,
    )
    store = ManifestStore(lake)
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        v = store.current_version()
        if v is not None and v >= 1:
            break
        if proc.poll() is not None:
            pytest.fail("ingest finished before we could kill it")
        time.sleep(0.05)
    else:
        proc.kill()
        pytest.fail("no commit observed within 120s")
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait()

    import glob as _glob

    all_files = sorted(_glob.glob(os.path.join(changes, "*.parquet")))
    assert store.current_version() >= 1
    manifests = engine.apply_changes(
        changes, lake, engine.default_spec(num_partitions=4)
    )
    assert manifests
    final = store.load()
    assert all(final.is_applied(f) for f in all_files)
    assert_matches_oracle(lake, changes)
