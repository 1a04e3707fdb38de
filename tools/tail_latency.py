"""End-to-end CDC tail latency: file-LANDS -> change VISIBLE in a
committed version. The SLA metric the reference operates on via
ApproximateAgeOfOldestMessage (sqs alarm); here measured directly: a
producer thread atomically renames one change file per ``INTERVAL``
seconds into the watched directory while ``pipelines.tail`` polls and
applies, and each commit's lineage (src_files per partition) stamps
the commit time of every file it folded in. Reports p50/p95/max land->
commit latency plus the steady-state apply rate. Latency at this
micro-batch granularity is dominated by the per-round Ray pipeline
cost (~1-3s at toy file sizes), NOT queueing — the tailer keeps up
with the producer and batches any backlog into the next round, so
latency stays flat as the stream speeds up (the number that matters
at scale).

Usage: python tools/tail_latency.py   (prints one JSON line)
Env: TAIL_FILES (default 20), TAIL_INTERVAL_S (default 0.5),
TAIL_EVENTS (default 200000 across all files), RAY_GRAFT_CPUS.
"""

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = int(os.environ.get("TAIL_FILES", 20))
INTERVAL = float(os.environ.get("TAIL_INTERVAL_S", 0.5))
EVENTS = int(os.environ.get("TAIL_EVENTS", 200_000))


def main() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import aws_serverless_elt_pipeline_enterprise_ray as engine
    from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tail import tail

    base = f"/tmp/tail_latency_{time.time_ns()}"
    staging, watched, lake = (
        os.path.join(base, "staging"),
        os.path.join(base, "changelog"),
        os.path.join(base, "lake"),
    )
    os.makedirs(watched, exist_ok=True)
    gen_changes(staging, n_events=EVENTS, n_convs=EVENTS // 20,
                n_files=N_FILES, seed=11)
    files = sorted(
        f for f in os.listdir(staging) if f.endswith(".parquet")
    )
    # warm the worker pool so file #1's latency is engine, not startup
    rd.range(1_000_000, override_num_blocks=64).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    land: dict[str, float] = {}
    lat: dict[str, float] = {}

    def producer():
        for f in files:
            src, dst = os.path.join(staging, f), os.path.join(watched, f)
            os.rename(src, dst)  # atomic on same fs = the S3 PUT analogue
            land[dst] = time.perf_counter()
            time.sleep(INTERVAL)

    def on_commit(m):
        t = time.perf_counter()
        for info in m.lineage.values():
            for f in info.get("src_files", ()):
                if f in land and f not in lat:
                    lat[f] = t - land[f]

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    stats = tail(
        watched, lake, engine.default_spec(num_partitions=16),
        poll_seconds=0.2, max_idle_rounds=15, on_commit=on_commit,
    )
    th.join()
    vals = sorted(lat.values())
    assert len(vals) == N_FILES, (len(vals), N_FILES)
    pct = lambda p: round(vals[min(len(vals) - 1, int(p * len(vals)))], 3)
    out = {
        "metric": "tail_latency_sec",
        "files": N_FILES,
        "events": EVENTS,
        "producer_interval_s": INTERVAL,
        "p50": pct(0.50),
        "p95": pct(0.95),
        "max": round(vals[-1], 3),
        "commits": stats.get("commits"),
        "rounds": stats.get("rounds"),
        "rows_after": int(engine.read_table(lake).count()),
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }
    shutil.rmtree(base, ignore_errors=True)
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
