"""Zero-copy lake branching: clone a committed version into a new,
independently-evolving lake without copying data.

``clone_lake`` hard-links every data file of the source snapshot into
the destination and commits a fresh manifest v1 referencing them - a
dev/staging branch of a 100-TB lake costs one metadata pass, not a
rewrite. Each side then evolves independently:

* new commits on either side write NEW files (COW) - the shared files
  are never mutated by construction, so divergence is automatic;
* each lake's ``gc`` unlinks only ITS directory entries; the inode
  survives until every branch drops it (hard-link semantics give the
  reference counting that object stores provide via manifest-level
  sharing);
* the applied-files checkpoint is carried over, so re-submitting the
  source's original changelog to the clone is a no-op - branch
  semantics, not a fresh table that would re-apply history.

Cross-device destinations fall back to a real copy (documented: the
zero-copy property needs one filesystem, like S3 needs one bucket
region for server-side copy).

Reference parity: beyond-reference - the reference's only "copy" is
replay-via-S3-copy (scripts/replay_via_s3_copy.py), which re-processes
data; this branches the PROCESSED state.
"""

from __future__ import annotations

import json
import os

from ..state.lakefs import lakefs
from ..state.manifest import Manifest, ManifestStore


def _canon(path: str) -> str:
    return path if "://" in path else os.path.abspath(path)


def _transfer(src_fs, sp: str, dst_fs, dp: str) -> str:
    """Move one committed file between lakes: hard link / server-side
    copy within a backend, byte copy across backends. Returns 'linked'
    or 'copied' for the metrics."""
    if src_fs.is_object == dst_fs.is_object and (
        not src_fs.is_object
        or src_fs.base.split("://", 1)[0] == dst_fs.base.split("://", 1)[0]
    ):
        if not src_fs.is_object:
            dst_fs.makedirs(dp.rsplit("/", 1)[0])
            try:
                os.link(sp, dp)
                return "linked"
            except OSError:  # cross-device: degrade to a copy
                import shutil

                shutil.copy2(sp, dp)
                return "copied"
        src_fs.copy_file(sp, dp)  # server-side object copy
        return "linked"
    dst_fs.write_atomic(dp, src_fs.read_bytes(sp))
    return "copied"



def clone_lake(src_dir: str, dst_dir: str, version: int | None = None) -> Manifest:
    """Branch ``src_dir`` at ``version`` (default CURRENT) into the
    empty ``dst_dir``. Returns the clone's manifest (version 1)."""
    src = ManifestStore(src_dir)
    m = src.load(version)
    if m is None:
        raise FileNotFoundError(f"no committed version in {src_dir}")
    dst = ManifestStore(dst_dir)
    if dst.load() is not None:
        raise RuntimeError(f"{dst_dir} already has a committed lake")

    sfs, dfs = lakefs(src_dir), lakefs(dst_dir)
    n_linked = n_copied = 0
    for files in m.partitions.values():
        for f in files:
            rel = f["path"]
            how = _transfer(sfs, sfs.full(rel), dfs, dfs.full(rel))
            if how == "linked":
                n_linked += 1
            else:
                n_copied += 1

    from .cdc import _now_iso

    manifest = Manifest(
        version=1,
        parent_version=None,
        created_at=_now_iso(),
        schema=list(m.schema),
        schema_ipc=m.schema_ipc,
        partitions={pid: list(files) for pid, files in m.partitions.items()},
        applied=list(m.applied),
        applied_watermarks=dict(m.applied_watermarks),
        watermark=m.watermark,
        max_event_ts_us=m.max_event_ts_us,
        max_lateness_us=m.max_lateness_us,
        metrics={
            "cloned_from": m.version,
            "files_linked": n_linked,
            "files_copied": n_copied,
        },
        lineage={"_clone": {"source": _canon(src_dir), "version": m.version}},
        quarantine=[],
        partitioning=dict(m.partitioning),
    )
    committed = dst.commit(manifest)
    # durable record of provenance for humans (the manifest carries the
    # machine-readable copy)
    dfs.write_atomic(
        dfs.full("_manifest", "CLONE.json"),
        json.dumps({"source": _canon(src_dir), "source_version": m.version}),
    )
    return committed


def publish_branch(branch_dir: str, dst_dir: str) -> Manifest:
    """Write-audit-publish: atomically install a validated branch's
    state as the destination's next version — the Iceberg WAP / audit
    -branch workflow over the engine's own clone machinery. Pipeline:
    ``clone_lake(main, branch)`` → apply/ compact/ DQ-gate on the
    branch → ``publish_branch(branch, main)``; main's readers see the
    branch state only after the one atomic CURRENT swap (the same
    exactly-once commit every writer uses).

    Safety: refuses unless the branch's recorded clone lineage points
    at ``dst_dir`` AND the destination is still at the cloned version
    — if main advanced since the branch was cut, publishing would
    silently drop main's commits; re-branch and re-apply instead
    (documented as the rebase). Data files move by hard link (COW
    naming makes collisions impossible for post-clone files; files
    shared since the clone already exist in both); cross-device
    degrades to a copy. The branch's applied-files checkpoint carries
    over, so the changelogs it absorbed stay no-ops on main."""
    bst = ManifestStore(branch_dir)
    bm = bst.load()
    if bm is None:
        raise FileNotFoundError(f"no committed version in {branch_dir}")
    # the clone provenance lives in the durable CLONE.json (later
    # branch commits rebuild manifest lineage and drop the _clone key)
    bfs, dfs = lakefs(branch_dir), lakefs(dst_dir)
    clone_path = bfs.full("_manifest", "CLONE.json")
    clone_info = None
    if bfs.exists(clone_path):
        clone_info = json.loads(bfs.read_text(clone_path))
    if not clone_info or _canon(clone_info.get("source", "")) != _canon(dst_dir):
        raise ValueError(
            f"{branch_dir} was not branched from {dst_dir} "
            "(no matching clone provenance); refusing to publish"
        )
    dst = ManifestStore(dst_dir)
    dm = dst.load()
    if dm is None:
        raise FileNotFoundError(f"no committed version in {dst_dir}")
    cloned_at = clone_info["source_version"]
    if dm.version != cloned_at:
        raise RuntimeError(
            f"{dst_dir} advanced to v{dm.version} since the branch was "
            f"cut at v{cloned_at}; re-branch and re-apply "
            "(publish would drop those commits)"
        )

    n_linked = n_copied = n_shared = 0
    for files in bm.partitions.values():
        for f in files:
            rel = f["path"]
            dp = dfs.full(rel)
            if dfs.exists(dp):
                n_shared += 1
                continue
            how = _transfer(bfs, bfs.full(rel), dfs, dp)
            if how == "linked":
                n_linked += 1
            else:
                n_copied += 1

    from .cdc import _now_iso

    lineage = dict(bm.lineage or {})
    lineage.pop("_clone", None)
    lineage["_published_from"] = {
        "branch": _canon(branch_dir),
        "branch_version": bm.version,
    }
    manifest = Manifest(
        version=dm.version + 1,
        parent_version=dm.version,
        created_at=_now_iso(),
        schema=list(bm.schema),
        schema_ipc=bm.schema_ipc,
        partitions={pid: list(files) for pid, files in bm.partitions.items()},
        applied=list(bm.applied),
        applied_watermarks=dict(bm.applied_watermarks),
        watermark=bm.watermark,
        max_event_ts_us=bm.max_event_ts_us,
        max_lateness_us=bm.max_lateness_us,
        metrics={
            "published_from_version": bm.version,
            "files_linked": n_linked,
            "files_copied": n_copied,
            "files_shared": n_shared,
        },
        lineage=lineage,
        quarantine=list(bm.quarantine),
        partitioning=dict(bm.partitioning),
    )
    return dst.commit(manifest)
