"""Driver-RSS evidence for the CDC apply path at 10^8 scale: apply a
135M-event change stream (the scaling-pair input, BENCH_REPEAT=1500)
through ``apply_changes`` while sampling the DRIVER's VmRSS, and
assert the peak stays event-frame-free. The stream is ~2.5 GB
compressed / tens of GB as Arrow — a driver that ever collected a
block-sized slice of it would blow the bound; the apply path's only
driver-side collection is P per-partition summary rows
(``pipelines/cdc.py`` take_all of partition manifests), so the delta
must stay flat regardless of stream size.

Usage: python tools/apply_scale_rss.py   (prints one JSON line)
Env: APPLY_REPEAT (default 1500), APPLY_COMMIT_EVERY (default 500
files -> 3 chunked commits), RAY_GRAFT_CPUS, APPLY_RSS_BOUND_MB
(default 512 — Ray Data's driver-side scheduler/metadata for a
multi-stage pipeline over 1500 input files costs a few hundred MB on
its own; the event data would cost tens of GB).
"""

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEAT = int(os.environ.get("APPLY_REPEAT", 1500))
COMMIT_EVERY = int(os.environ.get("APPLY_COMMIT_EVERY", 500))
BOUND_MB = int(os.environ.get("APPLY_RSS_BOUND_MB", 512))


def rss_mb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) // 1024
    return -1


def main() -> dict:
    import ray

    os.environ.setdefault("BENCH_REPEAT", str(REPEAT))
    import bench  # reuse the cached deterministic changelog

    bench.REPEAT = REPEAT
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

    changes, n_events = bench.prepare_changelog()
    lake = os.path.join(bench.SCRATCH, f"rss-lake-{time.time_ns()}")
    spec = engine.default_spec(num_partitions=64)

    # settle, then baseline AFTER Ray + imports are resident
    rd.range(1_000_000).count()
    time.sleep(1.0)
    baseline = rss_mb()
    peak = [baseline]
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            peak[0] = max(peak[0], rss_mb())
            time.sleep(0.25)

    threading.Thread(target=sampler, daemon=True).start()
    t0 = time.time()
    manifests = engine.apply_changes(
        changes, lake, spec, commit_every_files=COMMIT_EVERY
    )
    sec = round(time.time() - t0, 1)
    stop.set()
    peak[0] = max(peak[0], rss_mb())
    rows = engine.read_table(lake).count()
    out = {
        "metric": "cdc_apply_driver_rss",
        "events": n_events,
        "events_per_sec": round(n_events / sec),
        "commits": len(manifests),
        "rows_after": int(rows),
        "driver_rss_baseline_mb": baseline,
        "driver_rss_peak_mb": peak[0],
        "driver_rss_delta_mb": peak[0] - baseline,
        "bound_mb": BOUND_MB,
        "sec": sec,
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }
    shutil.rmtree(lake, ignore_errors=True)
    assert out["driver_rss_delta_mb"] < BOUND_MB, out
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
