"""Object-store-specific scenarios beyond the parametrized core suites:
the changelog itself on the object store, lifecycle operators (compact,
clone, WAP publish, dq gate, redrive, forget) on an object lake, and
the concurrent-writer commit fence."""

import threading

import pyarrow as pa
import pytest

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import lakefs
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

from test_cdc_e2e import assert_matches_oracle, final_table


def uri(tmp_path, name: str) -> str:
    return "s3sim://" + str(tmp_path).lstrip("/") + "/" + name


def test_changelog_and_lake_both_on_object_store(tmp_path):
    """The reference's landing zone is an S3 prefix; the tailer must
    discover, footer-peek, read and checkpoint change files living on
    the object store itself."""
    changes, lake = uri(tmp_path, "ch"), uri(tmp_path, "lake")
    gen_changes(changes, n_events=6000, n_convs=80, n_files=5, seed=21)
    spec = engine.default_spec(num_partitions=4)
    ms = engine.apply_changes(changes, lake, spec, commit_every_files=2)
    assert [m.version for m in ms] == [1, 2, 3]
    # oracle reads the same object-store changelog through duckdb's
    # local view of the shim
    local_changes = "/" + changes.split("://", 1)[1]
    assert_matches_oracle(lake, local_changes)
    # URI-keyed checkpoint: resubmit is a no-op, resume applies nothing
    assert engine.apply_changes(changes, lake, spec) == []
    m = ManifestStore(lake).load()
    assert m.applied == [] and len(m.applied_watermarks) == 1
    assert next(iter(m.applied_watermarks)).startswith("s3sim://")


def test_lifecycle_on_object_lake(tmp_path):
    """compact → gc → clone → publish_branch on a URI lake, rename-free."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.clone import (
        clone_lake,
        publish_branch,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact

    changes, lake = str(tmp_path / "ch"), uri(tmp_path, "lake")
    gen_changes(changes, n_events=5000, n_convs=60, n_files=4, seed=23)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(changes, lake, spec)
    # a tiny second apply delta-appends LSM runs -> compaction has work
    ch_delta = str(tmp_path / "ch_delta")
    gen_changes(ch_delta, n_events=150, n_convs=60, n_files=1, seed=24)
    engine.apply_changes(ch_delta, lake, spec)
    before = final_table(lake)

    cm = compact(lake, spec)
    assert cm.metrics.get("compacted_partitions", 0) >= 1
    assert final_table(lake).equals(before)

    store = ManifestStore(lake)
    removed = store.gc(min_age_seconds=0, keep_versions=1)
    assert removed  # superseded pre-compaction files swept
    assert final_table(lake).equals(before)

    # branch on the same object store: server-side copy, no rename
    branch = uri(tmp_path, "branch")
    bm = clone_lake(lake, branch)
    assert bm.version == 1
    assert final_table(branch).equals(before)

    # evolve the branch, then WAP-publish it back
    ch2 = str(tmp_path / "ch2")
    gen_changes(ch2, n_events=800, n_convs=60, n_files=1, seed=29)
    engine.apply_changes(ch2, branch, spec)
    pm = publish_branch(branch, lake)
    assert pm.metrics["published_from_version"] == 2
    assert final_table(lake).equals(final_table(branch))


def test_dq_redrive_forget_on_object_lake(tmp_path):
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dq import run_dq
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.forget import forget_keys
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.redrive import redrive

    changes, lake = str(tmp_path / "ch"), uri(tmp_path, "lake")
    gen_changes(changes, n_events=4000, n_convs=50, n_files=3, seed=31,
                bad_ratio=0.02)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(changes, lake, spec)
    store = ManifestStore(lake)
    assert store.load().quarantine  # bad rows quarantined on the store

    report = run_dq(lake, spec)
    assert report["ok"]
    fs = lakefs(lake)
    assert fs.exists(fs.full("_dq", f"report-{store.load().version:06d}.json"))

    # redrive: quarantine rows re-emitted as a change file, ledger cleared
    res = redrive(lake, str(tmp_path / "redrive_out"), spec)
    assert res["rows"] > 0
    assert store.load().quarantine == []

    # forget: staged tombstones under the object lake, applied exactly-once
    victim = final_table(lake)["conv_id"][0].as_py()
    ms = forget_keys(lake, [victim], spec)
    assert ms and ms[0].metrics["deletes"] > 0
    left = final_table(lake)
    assert victim not in set(left["conv_id"].to_pylist())


def test_concurrent_writer_conflict_is_clean(tmp_path):
    """Two writers racing the SAME chunk: exactly one commits a given
    version; the loser gets a clean stale-commit/conflict error from
    the exclusive version create, never a silently interleaved lake."""
    changes, lake = str(tmp_path / "ch"), uri(tmp_path, "lake")
    gen_changes(changes, n_events=2000, n_convs=30, n_files=1, seed=37)
    spec = engine.default_spec(num_partitions=2)
    engine.apply_changes(changes, lake, spec)
    store = ManifestStore(lake)
    stale = store.load()  # writer A's view of the parent

    # writer B commits meanwhile
    ch2 = str(tmp_path / "ch2")
    gen_changes(ch2, n_events=500, n_convs=30, n_files=1, seed=41)
    engine.apply_changes(ch2, lake, spec)

    # writer A now tries to commit against its stale parent
    import dataclasses

    attempt = dataclasses.replace(
        stale, version=stale.version + 1, parent_version=stale.version
    )
    with pytest.raises(RuntimeError, match="stale commit"):
        store.commit(attempt)
    # ... and a racing attempt at the same version number loses the
    # exclusive create even if CURRENT momentarily matched its parent
    cur = store.load()
    dup = dataclasses.replace(
        cur, version=cur.version, parent_version=cur.parent_version
    )
    with pytest.raises(RuntimeError, match="already exists|stale commit"):
        store.commit(dup)


def test_concurrent_tailers_no_duplicate_application(tmp_path):
    """Two tailers over the same changelog+lake: whoever loses a chunk
    race auto-retries against the fresh checkpoint (bounded
    CommitConflict retry) and skips files the winner applied - BOTH
    appliers finish without manual intervention, the final state
    matches the oracle and each change file lands in exactly one
    commit's lineage."""
    changes, lake = str(tmp_path / "ch"), uri(tmp_path, "lake")
    gen_changes(changes, n_events=6000, n_convs=60, n_files=6, seed=43)
    spec = engine.default_spec(num_partitions=4)

    results: dict[str, object] = {}

    def run(name: str):
        results[name] = engine.apply_changes(
            changes, lake, spec, commit_every_files=1
        )

    t1 = threading.Thread(target=run, args=("a",))
    t2 = threading.Thread(target=run, args=("b",))
    t1.start(); t2.start(); t1.join(); t2.join()
    # both finished; between them every file was applied exactly once
    assert isinstance(results["a"], list) and isinstance(results["b"], list)
    assert len(results["a"]) + len(results["b"]) >= 1

    # whatever the interleaving, a final serial pass converges...
    engine.apply_changes(changes, lake, spec)
    assert_matches_oracle(lake, changes)
    # ...and the union of commit lineages covers each file at most once
    store = ManifestStore(lake)
    seen: set[str] = set()
    for v in store.versions():
        m = store.load(v)
        commit_files = {
            f for lin in m.lineage.values() for f in lin.get("src_files", [])
        }
        dup = commit_files & seen
        assert not dup, f"{dup} applied by two commits"
        seen |= commit_files


def test_export_snapshot_to_object_store(tmp_path):
    """Export of a committed lake version to an object-store
    destination: marker-commit per partition (no directory rename),
    resumable, both layouts; jsonl shards gzip through the put path."""
    import gzip
    import json

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.export import (
        export_snapshot,
    )

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=3000, n_convs=40, n_files=2, seed=61)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(changes, lake, spec)
    want = final_table(lake)

    out = uri(tmp_path, "export")
    res = export_snapshot(lake, out)
    assert res["rows"] == want.num_rows
    fs = lakefs(out)
    assert fs.exists(fs.full("_SNAPSHOT.json"))
    # read back every partition's parquet chunks -> identical table
    got = []
    for p in fs.walk_files(out):
        if p.endswith(".parquet"):
            got.append(fs.read_parquet(p))
    got_tbl = (
        pa.concat_tables(got)
        .select(want.column_names)
        .sort_by([(c, "ascending") for c in ("conv_id", "turn_idx")])
    )
    assert got_tbl.equals(want)
    # resume: re-export skips every finished partition
    res2 = export_snapshot(lake, out)
    assert res2["resumed_partitions"] == res2["partitions"]

    # dt layout + jsonl both land on the store
    out_dt = uri(tmp_path, "export_dt")
    export_snapshot(lake, out_dt, layout="dt")
    assert any("/dt=" in p for p in lakefs(out_dt).walk_files(out_dt))
    out_jl = uri(tmp_path, "export_jl")
    export_snapshot(lake, out_jl, fmt="jsonl")
    jfs = lakefs(out_jl)
    shard = next(p for p in jfs.walk_files(out_jl) if p.endswith(".jsonl.gz"))
    lines = gzip.decompress(jfs.read_bytes(shard)).decode().strip().splitlines()
    assert json.loads(lines[0])["conv_id"]


def test_tail_loop_over_object_store(tmp_path):
    """The always-on tailer against an object-store landing zone: a
    producer thread PUTs change files while the tailer polls; every
    file lands exactly once and the final state matches the oracle."""
    import time

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tail import tail

    changes, lake = uri(tmp_path, "landing"), uri(tmp_path, "lake")
    # pre-generate the full stream POSIX-side for the oracle, then
    # "land" it file by file onto the object store
    staging = str(tmp_path / "stage")
    files = gen_changes(staging, n_events=4000, n_convs=50, n_files=5, seed=71)

    fs = lakefs(changes)
    import threading

    def produce():
        for i, f in enumerate(sorted(files)):
            with open(f, "rb") as fh:
                fs.write_atomic(
                    changes.rstrip("/") + "/" + f.rsplit("/", 1)[-1], fh.read()
                )
            time.sleep(0.3)

    t = threading.Thread(target=produce)
    t.start()
    stats = tail(
        changes, lake, engine.default_spec(num_partitions=4),
        poll_seconds=0.2, max_idle_rounds=8,
    )
    t.join()
    assert stats["commits"] >= 1
    # every landed object is in the committed checkpoint exactly once
    m = ManifestStore(lake).load()
    landed = [changes.rstrip("/") + "/" + f.rsplit("/", 1)[-1] for f in files]
    assert all(m.is_applied(p) for p in landed)
    assert_matches_oracle(lake, staging)


def test_schema_evolution_on_object_lake(tmp_path):
    """Additive evolution with the lake on the object store: files
    written before the new columns existed are null-padded on read,
    and the evolved schema round-trips through the manifest."""
    changes, lake = str(tmp_path / "ch"), uri(tmp_path, "lake")
    gen_changes(changes, n_events=3000, n_convs=50, n_files=4, seed=81,
                evolve_after_file=2, duplicate_ratio=0.0)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(changes, lake, spec)
    got = final_table(
        lake, ("conv_id", "turn_idx", "text", "tool_call_id", "meta_tokens")
    )
    nulls = got["tool_call_id"].null_count
    assert 0 < nulls < got.num_rows
    assert_matches_oracle(lake, changes,
                          extra_cols=("tool_call_id", "meta_tokens"))


def test_sigkill_inflight_exchange_resume(tmp_path):
    """Hard kill mid-run with the multi-round in-flight exchange on an
    object lake: the COW + single-step-commit story is exchange-
    independent, so the resume converges to the oracle."""
    import os
    import signal
    import subprocess
    import sys
    import time

    changes, lake = str(tmp_path / "ch"), uri(tmp_path, "lake")
    gen_changes(changes, n_events=16_000, n_convs=80, n_files=8, seed=83)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["GRAFT_EXCHANGE"] = "inflight"
    env["GRAFT_EXCHANGE_FANIN"] = "2"
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [
            sys.executable, "-m",
            "aws_serverless_elt_pipeline_enterprise_ray.cli",
            "--num-cpus", "2", "ingest", "--changelog", changes,
            "--lake", lake, "--partitions", "4", "--commit-every", "1",
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

    ms = engine.apply_changes(
        changes, lake, engine.default_spec(num_partitions=4),
        exchange="inflight",
    )
    assert ms
    assert_matches_oracle(lake, changes)


def test_snapshot_isolation_under_compaction_and_gc(tmp_path):
    """Time travel + maintenance on the object lake: a pinned version
    keeps reading correctly across compact + gc (age-gated, version-
    retained), and gc after retention expiry removes the superseded
    files while CURRENT stays intact."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact

    changes, lake = str(tmp_path / "ch"), uri(tmp_path, "lake")
    gen_changes(changes, n_events=4000, n_convs=40, n_files=4, seed=91)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(changes, lake, spec, commit_every_files=2)
    store = ManifestStore(lake)
    v1 = 1
    pinned_before = final_table(lake, version=v1)

    ch2 = str(tmp_path / "ch2")
    gen_changes(ch2, n_events=400, n_convs=40, n_files=1, seed=92)
    engine.apply_changes(ch2, lake, spec)
    compact(lake, spec)
    # retention window covers v1 (4 versions exist); pinned read holds
    store.gc(min_age_seconds=0, keep_versions=4)
    assert final_table(lake, version=v1).equals(pinned_before)
    cur = final_table(lake)

    # retention expiry: drop to keep_versions=1 - old snapshot files go,
    # CURRENT still reads the same rows
    removed = store.gc(min_age_seconds=0, keep_versions=1)
    assert removed
    assert final_table(lake).equals(cur)


def test_apply_and_oracle_on_mocked_s3_scheme(tmp_path):
    """Full engine e2e over the REAL s3:// scheme (mocked SDK): the
    tailer reads a local changelog, the lake lives behind the s3 scheme
    whose commit arbiter is the conditional PutObject adapter, and Ray
    workers reconstruct the mocked filesystem from the URI alone (via
    GRAFT_FS_MODULES). Final state matches the duckdb LWW oracle."""
    import mocks3  # noqa: F401 - driver-side registration

    changes = str(tmp_path / "ch")
    lake = "s3://" + str(tmp_path).lstrip("/") + "/lake"
    gen_changes(changes, n_events=6000, n_convs=80, n_files=5, seed=33)
    spec = engine.default_spec(num_partitions=4)
    ms = engine.apply_changes(changes, lake, spec, commit_every_files=2)
    assert [m.version for m in ms] == [1, 2, 3]
    assert_matches_oracle(lake, changes)
    assert engine.apply_changes(changes, lake, spec) == []
    # the winner manifests really went through the conditional-put path
    fs = lakefs(lake)
    assert fs.fs._sync_s3_client is not None
