"""Lake statistics from the manifest alone - the operational dashboard
for "do I need to compact / rebalance / worry?".

Everything here is computed from the committed manifest's file entries
(rows, bytes, zone maps) without touching a data file, so it is O(P)
driver work even on a 100-TB lake. The numbers answer the three
operational questions:

* **Skew** (``row_skew`` = max/mean partition rows): when it grows,
  a key is hot - feed ``hot_partitions`` to ``pipelines/rebalance``.
* **LSM depth** (``max_files_per_partition`` vs target): delta-append
  commits accumulate runs; merge-on-read cost grows with depth - run
  ``pipelines/compact`` when it exceeds a handful.
* **Small files** (``mean_file_bytes``): many tiny files mean the
  write path is committing too often for the stream rate - raise
  ``commit_every_files`` or compact.

The reference surfaces none of this; its closest analogue is CloudWatch
Lambda metrics + manual S3 listing (``README.md`` operations section).
"""

from __future__ import annotations

from ..state.manifest import ManifestStore


def lake_stats(lake_dir: str, version: int | None = None, top: int = 5) -> dict:
    """Operational statistics for a committed lake version (default
    CURRENT). Raises ``FileNotFoundError`` when nothing is committed."""
    m = ManifestStore(lake_dir).load(version)
    if m is None:
        raise FileNotFoundError(f"no committed version in {lake_dir}")

    per_part = {
        int(pid): {
            "rows": sum(f["rows"] for f in files),
            "bytes": sum(f["bytes"] for f in files),
            "files": len(files),
        }
        for pid, files in m.partitions.items()
    }
    nonempty = [p for p in per_part.values() if p["files"]]
    all_files = [f for files in m.partitions.values() for f in files]
    rows = [p["rows"] for p in nonempty] or [0]
    n_rows = sum(rows)
    mean_rows = n_rows / max(len(nonempty), 1)
    hot = sorted(per_part.items(), key=lambda kv: -kv[1]["rows"])[:top]
    return {
        "version": m.version,
        # configured P (the manifest records only touched partitions)
        "partitions": int(m.partitioning.get("num_partitions", len(per_part))),
        "nonempty_partitions": len(nonempty),
        "files": len(all_files),
        "rows": n_rows,
        "bytes": sum(f["bytes"] for f in all_files),
        "mean_file_bytes": (
            sum(f["bytes"] for f in all_files) // max(len(all_files), 1)
        ),
        "row_skew": round(max(rows) / mean_rows, 3) if mean_rows else 0.0,
        "max_rows_partition": max(rows),
        "mean_rows_partition": round(mean_rows, 1),
        "max_files_per_partition": max((p["files"] for p in nonempty), default=0),
        "mean_files_per_partition": round(
            sum(p["files"] for p in nonempty) / max(len(nonempty), 1), 2
        ),
        "zone_map_coverage": round(
            sum(1 for f in all_files if "key_min" in f) / max(len(all_files), 1),
            3,
        ),
        "quarantined_files": len(m.quarantine),
        "hot_partitions": [
            {"part_id": pid, **stats} for pid, stats in hot if stats["rows"]
        ],
        "partitioning": dict(m.partitioning),
    }


def row_provenance(lake_dir: str, version: int | None = None):
    """Row-level audit: the CURRENT (or time-traveled) state with a
    ``wrote_version`` column — which commit wrote each surviving row.

    A committed row's internal ``_seq`` is the sequence number of its
    WINNING change event; each manifest records ``watermark`` = the max
    seq applied through that version. ``wrote_version`` is the first
    version whose watermark covers the row's ``_seq`` (one driver-side
    ``history()`` pass — O(versions) manifest JSONs, never data — then a
    broadcast ``searchsorted`` per batch).

    Exact when per-commit seq ranges are non-overlapping (files landing
    in seq order, the normal tailer discipline); with out-of-order
    landings a row's winning seq can fall under an earlier version's
    watermark and the column is that LOWER BOUND — documented rather
    than hidden, since disambiguating would need per-version file
    diffs, an O(data) replay (``pipelines/cdf`` does exactly that when
    the exact answer is worth it)."""
    import numpy as np
    import pyarrow as pa

    from .cdc import read_table

    store = ManifestStore(lake_dir)
    hist = store.history()
    if version is not None:
        hist = [h for h in hist if int(h["version"]) <= version]
    if not hist:
        raise FileNotFoundError(f"no committed version at {lake_dir}")
    versions = np.array([int(h["version"]) for h in hist], dtype=np.int64)
    marks = np.array([int(h["watermark"]) for h in hist], dtype=np.int64)

    ds = read_table(lake_dir, version=version, include_internal=True)

    def annotate(b: pa.Table) -> pa.Table:
        seq = b["_seq"].to_numpy(zero_copy_only=False)
        # first version with watermark >= seq
        idx = np.searchsorted(marks, seq, side="left")
        wrote = versions[np.minimum(idx, len(versions) - 1)]
        b = b.drop_columns([c for c in ("_seq", "_deleted") if c in b.column_names])
        return b.append_column("wrote_version", pa.array(wrote, pa.int64()))

    return ds.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True)
