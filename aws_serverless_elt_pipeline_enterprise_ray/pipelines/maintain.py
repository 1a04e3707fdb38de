"""Policy-driven lake maintenance: turn the ``lake_stats`` report into
actions.

An always-on ingest loop slowly degrades a lake in two ways: delta-
append commits stack LSM runs (merge-on-read cost grows with depth),
and a key that becomes hot AFTER the first commit skews one partition
(the sticky-partitioning consequence ``pipelines/rebalance`` exists
for). ``maintain`` closes the loop the reference leaves to humans
(CloudWatch alarm -> operator runs a Glue job): read the manifest-only
stats, decide, act.

Decision order: a skew breach triggers ``rebalance`` (full COW rewrite
with the detected hot keys salted), which also collapses every
partition to a single sorted run - so compaction is only considered
when no rebalance happened.

Hot-KEY detection reads ONLY the skewed partitions (partition-pruned,
the stats name them) and combines per-batch partial key counts with a
per-batch floor: conversations are key-sorted within runs, so a truly
hot key concentrates inside batches and survives the floor, while the
long tail is dropped worker-side - the driver sees candidate keys, not
the partition's key census.
"""

from __future__ import annotations

import pandas as pd

from ..state.manifest import ManifestStore
from .stats import lake_stats


def detect_hot_keys(
    lake_dir: str,
    part_ids: list[int],
    *,
    hot_fraction: float = 0.1,
    batch_floor: int = 100,
) -> list[str]:
    """Keys carrying >= ``hot_fraction`` of their partition's rows,
    searched only inside ``part_ids``. Per-batch partial ``value_counts``
    filtered at ``batch_floor`` bound driver traffic to candidates."""
    from .cdc import _read_lake_partitions

    store = ManifestStore(lake_dir)
    m = store.load()
    sub = {
        pid: files
        for pid, files in m.partitions.items()
        if int(pid) in set(part_ids) and files
    }
    if not sub:
        return []
    key0 = m.partitioning.get("key_cols", ("conv_id",))[0]
    part_rows = {
        int(pid): sum(f["rows"] for f in files) for pid, files in sub.items()
    }

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[key0].value_counts()
        vc = vc[vc >= min(batch_floor, max(1, len(b) // 4))]
        return pd.DataFrame({key0: vc.index, "n": vc.to_numpy()})

    parts = (
        _read_lake_partitions(lake_dir, sub, m, columns=[key0])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return []
    counts = parts.groupby(key0)["n"].sum()
    threshold = hot_fraction * (sum(part_rows.values()) / max(len(part_rows), 1))
    return sorted(counts[counts >= max(threshold, 1)].index)


def maintain(
    lake_dir: str,
    *,
    max_files_per_partition: int = 4,
    max_row_skew: float = 4.0,
    min_rows_for_rebalance: int = 10_000,
    hot_key_salt: int = 8,
    target_rows_per_file: int = 2_000_000,
    dry_run: bool = False,
) -> dict:
    """Inspect the lake and run at most one corrective action.
    Returns ``{"stats": ..., "action": "none|compact|rebalance",
    "detail": ...}`` (``dry_run`` reports the decision without acting).
    """
    s = lake_stats(lake_dir)
    action, detail = "none", {}

    skewed = (
        s["row_skew"] >= max_row_skew
        and s["rows"] >= min_rows_for_rebalance
        and s["nonempty_partitions"] > 1
    )
    if skewed:
        hot_parts = [h["part_id"] for h in s["hot_partitions"]]
        hot = detect_hot_keys(lake_dir, hot_parts)
        already = set(s["partitioning"].get("hot_keys", ()))
        new_hot = [k for k in hot if k not in already]
        if new_hot:
            action = "rebalance"
            detail = {
                "hot_keys": sorted(already | set(new_hot)),
                "hot_key_salt": hot_key_salt,
            }
            if not dry_run:
                from .rebalance import rebalance

                m = rebalance(
                    lake_dir,
                    hot_keys=tuple(detail["hot_keys"]),
                    hot_key_salt=hot_key_salt,
                    max_rows_per_file=target_rows_per_file,
                )
                detail["version"] = m.version

    if action == "none" and s["max_files_per_partition"] >= max_files_per_partition:
        action = "compact"
        detail = {"max_files_per_partition": s["max_files_per_partition"]}
        if not dry_run:
            from .compact import compact

            m = compact(
                lake_dir,
                target_rows_per_file=target_rows_per_file,
                min_files_to_compact=max_files_per_partition,
            )
            detail["version"] = m.version if m else None

    return {"stats": s, "action": action, "dry_run": dry_run, "detail": detail}
