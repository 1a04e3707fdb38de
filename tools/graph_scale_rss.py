"""Driver-RSS evidence for ``pagerank(node_state='dataset')`` at page
scale (round-3 verdict item 6): run PageRank over a synthetic graph of
GRAPH_N nodes / GRAPH_E edges (default 10^7 / 10^8) with the rank state
kept as a keyed Dataset, sample the DRIVER's VmRSS throughout, and
assert the peak stays node-frame-free: a single collected rank frame at
10^7 nodes is >=160 MB raw (int64 node + float64 rank) and in practice
300-500 MB through pandas, so a driver-RSS delta bounded well under
that is direct evidence no node-sized frame ever landed on the driver.

Usage: python tools/graph_scale_rss.py   (prints one JSON line)
Env: GRAPH_N, GRAPH_E, GRAPH_ITERS, RAY_GRAFT_CPUS, GRAPH_RSS_BOUND_MB
"""

import json
import os
import sys
import threading
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("GRAPH_N", 10_000_000))
E = int(os.environ.get("GRAPH_E", 100_000_000))
ITERS = int(os.environ.get("GRAPH_ITERS", 3))
BOUND_MB = int(os.environ.get("GRAPH_RSS_BOUND_MB", 256))
MODE = os.environ.get("GRAPH_MODE", "dataset")  # dataset | driver


def rss_mb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) // 1024
    return -1


def make_edges(b: pd.DataFrame) -> pd.DataFrame:
    """Deterministic splitmix-style edge synth: no driver-side arrays,
    every block derives its edges from its own id range."""
    i = b["id"].to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):  # wrap mod 2^64 by design
        z = i * np.uint64(0x9E3779B97F4A7C15)
        src = (z >> np.uint64(17)) % np.uint64(N)
        dst = ((z ^ (z >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)) % np.uint64(N)
    return pd.DataFrame(
        {"src": src.astype(np.int64), "dst": dst.astype(np.int64)}
    )


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
    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import (
        pagerank,
        pagerank_dataset,
    )

    edges = rd.range(E, override_num_blocks=256).map_batches(
        make_edges, batch_format="pandas"
    )
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
    if MODE == "driver":
        # contrast mode: driver-resident rank state (the documented
        # fast path for domain-scale graphs) — its RSS delta IS the
        # node frames, giving the baseline the dataset path avoids
        df = pagerank(edges, iterations=ITERS, node_state="driver")
        total, n_rows = float(df["rank"].sum()), len(df)
    else:
        ranks = pagerank_dataset(edges, iterations=ITERS)
        total = ranks.sum("rank")  # consume WITHOUT collecting node frames
        n_rows = ranks.count()
    sec = round(time.time() - t0, 1)
    stop.set()
    peak[0] = max(peak[0], rss_mb())
    out = {
        "metric": "pagerank_%s_driver_rss" % MODE,
        "nodes": N,
        "edges": E,
        "iterations": ITERS,
        "rank_rows": int(n_rows),
        "rank_sum": round(float(total), 6),
        "driver_rss_baseline_mb": baseline,
        "driver_rss_peak_mb": peak[0],
        "driver_rss_delta_mb": peak[0] - baseline,
        "bound_mb": BOUND_MB,
        "node_frame_raw_mb": (N * 16) >> 20,
        "sec": sec,
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }
    if MODE == "dataset":
        assert out["driver_rss_delta_mb"] < BOUND_MB, out
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
