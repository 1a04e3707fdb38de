"""Benchmark: headline CDC apply throughput + representative queries.

Prints ONE JSON line:
  {"metric": "cdc_apply_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <dir>, "num_cpus": N,
   "events": E, "events_per_sec": E/sec}

--scaling: runs the headline pipeline at two parallelism levels in
fresh subprocesses over the SAME input and reports both throughputs
plus efficiency = (t_lo / t_hi) / (hi / lo)  (1.0 = perfectly linear).
Two pairs: PRIMARY 2->8 CPUs on a 135M-event stream, SECONDARY 4->16
on 18M events - each with a no-Ray multiprocessing hardware control
(see run_scaling and BASELINE.md).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32),
     BENCH_REPEAT (changelog = events table replicated this many times,
                   default 200 -> ~20M change events at sf0.1, large
                   enough that fixed startup costs stop dominating)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import warnings

# Ray Data's own deprecated-internal-free call fires once per dropped
# MaterializedDataset; iterative pipelines materialize per round.
warnings.filterwarnings(
    "ignore", message=".*`free` is a deprecated API.*",
    category=DeprecationWarning,
)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("BENCH_REPEAT", "200"))
SCRATCH = "/tmp/aws_serverless_elt_pipeline_enterprise_ray_bench"

#: glibc returns >128KB allocations straight to mmap and unmaps on
#: free, so every large per-batch array faults FRESH zero pages - on a
#: host whose fault path is degraded (BASELINE.md: hypervisor windows
#: at ~0.05 GB/s vs ~2+ healthy) that alone halves engine throughput.
#: Raising the thresholds makes worker heaps REUSE warm pages: measured
#: 13.6-18.5s -> 7.3s for the 18M-event apply during such a window
#: (identical to the healthy-window number). Real-cluster relevance:
#: mmap/munmap churn also costs TLB shootdowns + zeroing everywhere.
MALLOC_TUNING = {
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
}
os.environ.update(MALLOC_TUNING)


def prepare_changelog() -> tuple[str, int]:
    """Derive a deterministic change stream from the events table,
    replicated REPEAT x with shifted seq/ts/conv so keys overlap across
    replicas (updates/deletes exercise the merge path). Cached on disk;
    generation is NOT part of the measured time."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(SF_DIR, "events.parquet")
    key = f"{os.path.getmtime(src):.0f}-{REPEAT}"
    out = os.path.join(SCRATCH, f"changes-{key}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        with open(done) as f:
            return out, int(f.read())
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    t = pq.read_table(src, columns=["event_id", "ts", "user_id", "event_type", "props"])
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    role = t["event_type"].to_numpy(zero_copy_only=False)
    text = t["props"].to_numpy(zero_copy_only=False)
    ts0 = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    n = len(eid)
    total = 0
    conv = np.char.add("conv_", uid.astype("U20")).astype(object)
    turn = (eid % 40).astype(np.int32)
    for r in range(REPEAT):
        seq = eid + r * n
        mod = seq % 10
        op = np.where(mod == 9, "D", np.where(mod >= 6, "U", "I")).astype(object)
        ts = ts0 + r * 3_600_000_000  # +1h per replica: later replicas win LWW
        tbl = pa.table(
            {
                "op": pa.array(op, pa.string()),
                "seq": pa.array(seq, pa.int64()),
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(turn, pa.int32()),
                "role": pa.array(role, pa.string()),
                "text": pa.array(text, pa.string()),
                "tool": pa.nulls(n, pa.string()),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
            }
        )
        pq.write_table(tbl, os.path.join(out, f"changes-{r:06d}.parquet"),
                       compression="snappy")
        total += n
    with open(done, "w") as f:
        f.write(str(total))
    return out, total


def host_probe() -> dict:
    """Host-health context for the measured numbers: first-touch
    (page-fault) and warm DRAM write bandwidth in GB/s. The sandbox
    hypervisor has intermittent windows where fresh-page faulting drops
    to ~0.1 GB/s (vs ~2+ normally), which roughly halves any Ray run
    (object-store pages are fresh mmaps); recording both makes a slow
    benchmark distinguishable from a slow engine."""
    import numpy as np

    gb = 0.4
    buf = np.empty(50_000_000)  # 400 MB, untouched
    t0 = time.perf_counter()
    buf.fill(1.0)  # first touch: page faults + zeroing
    cold = gb / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    buf.fill(2.0)  # warm: pure DRAM write
    warm = gb / (time.perf_counter() - t0)
    return {"host_fault_gbps": round(cold, 2), "host_dram_gbps": round(warm, 2)}


def wait_for_healthy_host(
    threshold_gbps: float = 0.7, max_wait_s: float = 90.0, poll_s: float = 45.0
) -> dict:
    """Benchmark hygiene (belt-and-braces now that MALLOC_TUNING makes
    the engine largely immune): the hypervisor intermittently collapses
    fresh-page faulting to ~0.05 GB/s (see BASELINE.md), halving any
    Ray measurement. Wait (bounded) for the window to pass; proceed
    regardless at the cap, recording both probes so a number taken
    during degradation is labeled as such."""
    first = host_probe()
    probe, waited = dict(first), 0.0
    while probe["host_fault_gbps"] < threshold_gbps and waited < max_wait_s:
        time.sleep(poll_s)
        waited += poll_s
        probe = host_probe()
    return {
        "host_probe_initial": first,
        "host_probe_at_start": probe,
        "host_wait_s": round(waited, 1),
    }


def run_bench() -> dict:
    import ray

    # scaling subprocesses skip the wait (the parent waits ONCE)
    if os.environ.get("BENCH_NO_WAIT"):
        health = {"host_probe_at_start": host_probe(), "host_wait_s": 0.0}
    else:
        health = wait_for_healthy_host()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR",
                 runtime_env={"env_vars": MALLOC_TUNING})
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import aws_serverless_elt_pipeline_enterprise_ray as engine
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines import queries as Q

    changes, n_events = prepare_changelog()

    # warm the page cache so we measure compute + shuffle, not cold disk
    import pyarrow.parquet as pq

    for f in sorted(os.listdir(changes)):
        if f.endswith(".parquet"):
            pq.read_table(os.path.join(changes, f))

    # warm the Ray worker pool: spawning NUM_CPUS python workers takes
    # seconds and is a one-time session cost, not engine throughput
    import ray.data as rd

    rd.range(1_000_000, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    import glob

    lake = os.path.join(SCRATCH, f"lake-{NUM_CPUS}-{time.time_ns()}")
    if os.environ.get("BENCH_LAKE_SCHEME") == "s3sim":
        # object-store-backend comparison: same apply through the
        # rename-free protocol (state/lakefs.py); the shim's extra cost
        # is one local link/replace per put, so the delta vs POSIX is
        # the engine-side protocol overhead
        lake = "s3sim://" + lake.lstrip("/")
    spec = engine.default_spec(num_partitions=max(64, 2 * NUM_CPUS))
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    n_tail = max(1, len(files) // 10)
    head, tail = files[:-n_tail], files[-n_tail:]

    barrier = os.environ.get("BENCH_BARRIER", "auto")
    if barrier != "auto":
        barrier = barrier == "1"
    bs = os.environ.get("BENCH_BATCH")
    bs = "default" if bs is None else (None if bs == "0" else int(bs))
    # BENCH_COMMIT_EVERY=<files>: commit in chunks (the tailer's real
    # operating mode) — bounds in-flight shuffle state for very large
    # BENCH_REPEAT streams (e.g. the 10^9-event record) instead of one
    # giant single-commit exchange.
    ce = os.environ.get("BENCH_COMMIT_EVERY")
    ce = int(ce) if ce else None
    # bulk load: most of the stream into an empty lake
    t0 = time.perf_counter()
    manifests = engine.apply_changes(
        head, lake, spec, stage_barrier=barrier, batch_size=bs,
        commit_every_files=ce,
    )
    cdc_sec = time.perf_counter() - t0
    assert manifests, "no commit happened"
    head_events = int(n_events * len(head) / len(files))

    # steady-state increment: the tail applied against the populated
    # lake - exercises current-state read + COW rewrite, the true CDC
    # operating mode
    t0 = time.perf_counter()
    inc_manifests = engine.apply_changes(
        changes, lake, spec, stage_barrier=barrier, batch_size=bs,
        commit_every_files=ce,
    )
    inc_sec = time.perf_counter() - t0
    assert inc_manifests
    inc_events = n_events - head_events

    qtimes = {}
    qnames = () if os.environ.get("BENCH_SKIP_QUERIES") else (
        "lineitem_rollup",
        "window_events_hourly",
        "dedup_exact",
        "token_count",
        "ann_cosine_topk",
        "minhash_near_dup",
        "cdc_normalize",
        "corpus_refinery",
        "interval_join_sessions",
        "rank_events_per_user",
        "pivot_user_event_counts",
        "lm_bigram_score",
        "shuffle_shards",
        "bm25_rank",
        "cumsum_user_value",
        "cooccur_event_types",
        # round-4 additions: transcript curation + codec paths
        "conversation_lint",
        "instruction_pairs",
        "boilerplate_turns",
        "image_webp_decode",
        "audio_metadata",
        # round-4 second-half: fork-group RL data + de-identification
        "fork_advantage",
        "retry_edit_distance",
        "pseudonymize_ids",
        # round-4 continuation: packing/masking + lifecycle gates
        "loss_mask_spans",
        "pack_conversations",
        "fork_margin",
        "cdc_schema_evolve",
        # round-4 session 2: multi-table join analytics
        "tpch_q3_shipping",
        "tpch_q10_returned",
        # round-4 session 4: full TPC-H coverage + calibration
        "tpch_q21_waiting_supplier",
        "tpch_q9_product_profit",
        "rm_calibration",
        # round-4 session 5: branching + row-level DML
        "cdc_branch_merge",
        "cdc_delete_where",
        "cdc_merge_into",
    )
    for name in qnames:
        t0 = time.perf_counter()
        Q.QUERIES[name](SF_DIR)
        qtimes[name] = round(time.perf_counter() - t0, 3)

    shutil.rmtree(lake, ignore_errors=True)
    result = {
        "metric": "cdc_apply_sec",
        "value": round(cdc_sec, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "events": head_events,
        "events_per_sec": round(head_events / cdc_sec),
        "incremental_sec": round(inc_sec, 3),
        "incremental_events": inc_events,
        "incremental_events_per_sec": round(inc_events / inc_sec),
        **host_probe(),
        **health,
    }
    ray.shutdown()
    if os.environ.get("BENCH_CONTROL"):
        # Pre-registered control-normalized protocol (BASELINE.md): the
        # no-Ray multiprocessing control runs the same read+normalize+
        # combine work over the SAME head files IN THE SAME WINDOW,
        # immediately after the engine. Both sides are reported raw;
        # the ratio (engine events/s ÷ control events/s) factors the
        # hypervisor window out of the headline number.
        ctl = _control_curve(head, (NUM_CPUS,))[NUM_CPUS]
        result["control_mp_sec"] = round(ctl, 3)
        result["control_mp_events_per_sec"] = round(head_events / ctl)
        result["engine_vs_control"] = round(ctl / cdc_sec, 3)
        result["host_probe_after_control"] = host_probe()
    return result


def _control_curve(changes: str | list, pairs: tuple[int, ...]) -> dict[int, float]:
    """Hardware-ceiling control: the same read+normalize+combine work
    under plain multiprocessing (no Ray, no shuffle). On a single box
    this saturates shared DRAM bandwidth at ~6 effective cores; the
    control separates that machine property from engine scaling (on a
    real N->4N-node cluster every node brings its own memory bus).
    `changes` is a changelog dir or an explicit file list."""
    import glob
    import multiprocessing as mp

    import numpy as np

    if isinstance(changes, list):
        files = list(changes)
    else:
        files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    out: dict[int, float] = {}
    for n in pairs:
        shards = [list(s) for s in np.array_split(files, n)]
        t0 = time.perf_counter()
        with mp.get_context("fork").Pool(n) as p:
            p.map(_control_work, shards)
        out[n] = round(time.perf_counter() - t0, 3)
    return out


def _control_work(shard: list[str]) -> int:
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import aws_serverless_elt_pipeline_enterprise_ray as engine
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import (
        _NormalizeAssign,
    )

    fn = _NormalizeAssign(engine.default_spec(num_partitions=128))
    total = 0
    for f in shard:
        total += len(fn(pq.read_table(f)))
    return total


def _run_pair(lo: int, hi: int, repeat: int, trials: int) -> dict:
    """Engine medians at two fresh-process parallelism levels over the
    SAME input, plus the no-Ray multiprocessing control on the same
    changelog (the single-box DRAM-bandwidth ceiling - on a real N->4N
    NODE cluster every node brings its own memory bus)."""

    def run(ncpu: int) -> dict:
        # median of N fresh-process trials: single-box wall times vary
        # 20-30% run to run, medians make the ratio meaningful
        results = []
        for _ in range(trials):
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                BENCH_SKIP_QUERIES="1",
                BENCH_REPEAT=str(repeat),
                BENCH_NO_WAIT="1",
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            results.append(json.loads(out.strip().splitlines()[-1]))
        results.sort(key=lambda r: r["value"])
        med = results[len(results) // 2]
        med["trials_sec"] = [r["value"] for r in results]
        return med

    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    global REPEAT
    saved, REPEAT = REPEAT, repeat
    try:
        changes, _ = prepare_changelog()
    finally:
        REPEAT = saved
    control = _control_curve(changes, (lo, hi))
    control_speedup = control[lo] / control[hi]
    engine_speedup = r_lo["value"] / r_hi["value"]
    return {
        "cpus": [lo, hi],
        "sec": [r_lo["value"], r_hi["value"]],
        "trials_sec": [r_lo["trials_sec"], r_hi["trials_sec"]],
        "events_per_sec": [r_lo["events_per_sec"], r_hi["events_per_sec"]],
        "events": r_lo["events"],
        "scaling_efficiency": round(eff, 3),
        "control_mp_sec": control,
        "control_speedup": round(control_speedup, 3),
        "control_efficiency": round(control_speedup / (hi / lo), 3),
        # engine speedup relative to what the hardware allows
        "efficiency_vs_hardware_ceiling": round(engine_speedup / control_speedup, 3),
    }


def run_scaling() -> dict:
    """Two-cluster-size criterion, evidenced at two pairs:

    * PRIMARY (default 2 -> 8 CPUs, 135M-event stream): large enough
      that fixed session costs stop dominating and both sides run
      multi-worker; this is the pair the >=0.8 efficiency claim rests
      on, reported next to the hardware control's own efficiency.
    * SECONDARY (default 4 -> 16, 18M-event stream): the round-1
      protocol, kept for continuity; on this shared-DRAM box the
      CONTROL itself only reaches ~0.46 here (16 procs saturate the
      memory bus), so read it against efficiency_vs_hardware_ceiling.
    """
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    lo, hi = (
        int(os.environ.get("BENCH_SCALE_LO", "2")),
        int(os.environ.get("BENCH_SCALE_HI", "8")),
    )
    repeat = int(os.environ.get("BENCH_SCALE_REPEAT", "1500"))
    health = wait_for_healthy_host()  # once, for the whole protocol
    primary = _run_pair(lo, hi, repeat, trials)
    out = {"metric": "scaling_efficiency", **primary, **health}
    if not os.environ.get("BENCH_SCALE_NO_SECONDARY"):
        out["secondary_pair"] = _run_pair(4, 16, REPEAT, trials)
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
