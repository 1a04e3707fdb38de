"""Transactional manifest + checkpoint for the lake sink.

The reference's sink is NOT exactly-once: a retried SQS batch writes
duplicate uniquely-named Parquet files (``lambdas/transform/app.py:104``),
mitigated only post-hoc by the GE ``unique`` gate. Its idempotency /
resume state lives in a DynamoDB table keyed ``s3://bucket/key#etag``
with TTL (``lambdas/ingest/app.py:84-126``,
``infra/terraform/modules/dynamodb_table/main.tf:10-24``).

We replace both with ONE atomic visibility point (strictly stronger,
per SURVEY §4): writers emit uniquely-named files that are invisible
until a manifest version references them.

POSIX backend: the crash-atomic exclusive create of the versioned
manifest (temp + hardlink: the file is complete or absent) IS the
commit point; ``CURRENT`` is a roll-forwardable CACHE of the head,
updated monotonically under an advisory flock. A version file above
CURRENT — a committer that won its create but crashed (or has not yet
swapped) — is rolled forward by the next committer, which then sees
its own parent as stale and gets a clean ``CommitConflict``; there is
no grace window and no silent same-parent clobber (the lost-commit
race the concurrent-DML test exposed). ``rollback``/``reset`` record a
``RETIRED.json`` floor so demoted history is never rolled forward.
Single-node by design — the object path is the multi-node protocol.

Object backend (URI lakes, ``state/lakefs.py``): there is no atomic
rename, so the protocol is SINGLE-step, Delta-log style: the
conditional create (``If-None-Match``) of ``manifest-NNNNNN.json`` IS
the commit - durable and visible the instant it succeeds.
``current_version()`` derives from the strongly-consistent listing
(max committed version above the reset floor); there is no CURRENT
object to race on, no two-step window, and no orphan state at all.
Version numbers are gapless by construction (commit requires
``version == max+1`` and ``parent == current``), rollback is a
RESTORE-commit (a new version whose content is the demoted-to
snapshot - Delta/Iceberg semantics), and ``reset`` writes a floor
marker retiring everything at or below it.

The checkpoint (applied change-log files + watermark),
per-partition lineage and metrics are embedded IN the manifest, so
checkpoint and data commit are a single atomic action. A killed job
leaves orphan files that no manifest references (collected by ``gc``);
a resumed job skips change files already in ``applied`` - the engine
analogue of the DynamoDB "seen this object+etag" gate.

Layout::

    lake/
      data/part=00017/f-<hex>.parquet     # COW partition files
      _manifest/manifest-000042.json      # immutable versions
      _manifest/CURRENT                   # atomic pointer {"version": 42}
      _quarantine/part=00017/q-<hex>.parquet
      _dq/report-000042.json
"""

from __future__ import annotations

import base64
import dataclasses
import json
import os
import time
import uuid
from typing import Any

import pyarrow as pa


class CommitConflict(RuntimeError):
    """A concurrent writer won the commit race (stale parent or the
    exclusive version create lost). The attempted manifest was NOT
    published; the apply is safe to retry against the fresh parent -
    ``apply_changes`` does so automatically (bounded), re-filtering its
    chunk against the winner's checkpoint first. The reference gets the
    same retry for free from SQS redelivery
    (``infra/terraform/modules/sqs_queue/main.tf:43-46``)."""


@dataclasses.dataclass
class Manifest:
    version: int
    parent_version: int | None
    created_at: str  # injected by caller for determinism (M7 precedent)
    schema: list[dict]  # [{"name","type"}] - additive evolution history
    # part_id(str) -> [{"path","rows","bytes"}]
    partitions: dict[str, list[dict]]
    # checkpoint: change-log files fully applied as of this version
    applied: list[str]
    watermark: int  # max seq applied (change-log lag = newest seq - watermark)
    metrics: dict[str, Any]
    # part_id -> {"src_files": [...], "events": n, ...} for this commit
    lineage: dict[str, dict]
    quarantine: list[dict]
    # Partitioning is a property of the LAKE, fixed at first commit:
    # {"num_partitions": P, "hot_keys": [...], "hot_key_salt": k}.
    # Later applies MUST reuse it - changing P or the hot-key set
    # mid-stream would map existing keys to different partitions and
    # duplicate them (use pipelines.rebalance to migrate).
    partitioning: dict = dataclasses.field(default_factory=dict)
    # Lossless Arrow payload schema (base64 IPC). The human-readable
    # `schema` list stringifies types, which does NOT round-trip for
    # every Arrow type (list<...>, decimal, date32, ...): an evolved
    # column of such a type would silently come back as string on the
    # next apply and be cast with safe=False - cross-run corruption.
    # Readers prefer this field; `schema` stays for inspection.
    schema_ipc: str | None = None
    # Checkpoint compaction (the DDB-TTL analogue): per-changelog-dir
    # watermark path. Every file in a dir sorting <= its watermark is
    # applied; `applied` holds only the out-of-order exceptions above
    # the watermarks. Keeps manifest size O(P + pending) instead of
    # O(total files ever applied).
    applied_watermarks: dict = dataclasses.field(default_factory=dict)
    # Event-time watermark state for tombstone GC: the max event ts
    # ever applied, and the max observed CROSS-COMMIT lateness (how far
    # below the then-current max a later commit's min ts landed).
    # Within-commit disorder is irrelevant - LWW application is
    # order-insensitive; only events arriving in FUTURE commits can
    # resurrect a purged tombstone, and their earliness is bounded (in
    # practice) by this observed skew. compact(purge_tombstones_auto=
    # True) derives its horizon from these.
    max_event_ts_us: int | None = None
    max_lateness_us: int = 0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))

    def all_files(self) -> list[str]:
        return [f["path"] for files in self.partitions.values() for f in files]

    def total_rows(self) -> int:
        return sum(f["rows"] for files in self.partitions.values() for f in files)

    def is_applied(self, path: str) -> bool:
        """Checkpoint membership under watermark+exceptions semantics."""
        if "://" in path:  # URIs are already canonical
            ap = path
            parent = path.rsplit("/", 1)[0]
        else:
            ap = os.path.abspath(path)
            parent = os.path.dirname(ap)
        if ap in self.applied or path in self.applied:
            return True
        wm = self.applied_watermarks.get(parent)
        return wm is not None and ap <= wm


# -- lossless schema round-trip --------------------------------------------

_TYPE_PARSE = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "halffloat": pa.float16(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "date32[day]": pa.date32(),
    "date64[ms]": pa.date64(),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ns]": pa.timestamp("ns"),
}


def parse_type_string(s: str) -> pa.DataType:
    """Parse a stringified Arrow type from a legacy manifest. Raises on
    anything outside the table - silently falling back to string would
    corrupt an evolved column's type on the next apply."""
    try:
        return _TYPE_PARSE[s]
    except KeyError:
        raise RuntimeError(
            f"manifest schema type {s!r} is not losslessly parseable; "
            "this manifest predates schema_ipc - re-commit (any apply/"
            "compact) with the current engine to upgrade it"
        ) from None


def schema_to_ipc(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def schema_from_ipc(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


def manifest_payload_schema(m: Manifest) -> pa.Schema:
    """The committed payload schema, exact: prefer the IPC-serialized
    form; fall back to parsing the stringified legacy list."""
    if m.schema_ipc:
        return schema_from_ipc(m.schema_ipc)
    return pa.schema(
        [pa.field(n, parse_type_string(t)) for n, t in (tuple(c) for c in m.schema)]
    )


from .lakefs import fs_for, lakefs


def _atomic_write(path: str, data: str) -> None:
    """All-or-nothing write for ANY path/URI (POSIX temp + replace +
    dir fsync; atomic object PUT on URI backends)."""
    fs_for(path).write_atomic(path, data)


class ManifestStore:
    """Versioned manifest log rooted at ``<lake>/_manifest``.

    ``lake_dir`` may be a plain path or an object-store URI - every
    filesystem touch routes through ``state.lakefs.LakeFS``, and the
    commit protocol is rename-free on the object path (module
    docstring)."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self.fs = lakefs(lake_dir)
        self.dir = self.fs.full("_manifest")
        self.fs.makedirs(self.dir)
        self.fs.makedirs(self.fs.full("data"))

    # -- read ---------------------------------------------------------
    def _reset_floor(self) -> int:
        """Object backend: versions <= the floor are retired by reset
        markers (there is no CURRENT object to delete)."""
        floor = 0
        for name in self.fs.listdir(self.dir):
            if name.startswith("RESET-"):
                floor = max(
                    floor,
                    json.loads(
                        self.fs.read_text(self.fs.full("_manifest", name))
                    )["above"],
                )
        return floor

    def current_version(self) -> int | None:
        if self.fs.is_object:
            # listing IS the truth: the exclusive version create is the
            # single-step commit point (module docstring)
            vs = self.versions()
            floor = self._reset_floor()
            live = [v for v in vs if v > floor]
            return max(live) if live else None
        p = self.fs.full("_manifest", "CURRENT")
        if not self.fs.exists(p):
            return None
        return json.loads(self.fs.read_text(p))["version"]

    def load(self, version: "int | str | None" = None) -> Manifest | None:
        if isinstance(version, str):
            version = self.resolve_tag(version)
        if version is None:
            version = self.current_version()
        if version is None:
            return None
        return Manifest.from_json(
            self.fs.read_text(self.fs.full("_manifest", f"manifest-{version:06d}.json"))
        )

    # -- tags (named savepoints) --------------------------------------
    def _tags_path(self) -> str:
        return self.fs.full("_manifest", "TAGS.json")

    def tags(self) -> dict[str, int]:
        p = self._tags_path()
        if self.fs.exists(p):
            return json.loads(self.fs.read_text(p))
        return {}

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a name to a version (default CURRENT) - the DESCRIBE
        HISTORY savepoint analogue. Tagged versions read via
        ``read_table(version="name")``; gc keeps every tagged
        version's files alive."""
        v = version if version is not None else self.current_version()
        if v is None:
            raise RuntimeError("nothing committed - nothing to tag")
        if not self.fs.exists(self.fs.full("_manifest", f"manifest-{v:06d}.json")):
            raise FileNotFoundError(f"version {v} does not exist")
        t = self.tags()
        t[name] = int(v)
        _atomic_write(self._tags_path(), json.dumps(t, sort_keys=True))
        return int(v)

    def untag(self, name: str) -> None:
        t = self.tags()
        t.pop(name, None)
        _atomic_write(self._tags_path(), json.dumps(t, sort_keys=True))

    def resolve_tag(self, name: str) -> int:
        t = self.tags()
        if name not in t:
            raise KeyError(f"unknown tag {name!r}; have {sorted(t)}")
        return t[name]

    def applied_files(self) -> set[str]:
        """DEPRECATED for discovery: returns only the out-of-order
        exception set. Use ``Manifest.is_applied`` /
        ``discover_pending(..., manifest=...)`` which also honor the
        per-directory watermarks."""
        m = self.load()
        return set(m.applied) if m else set()

    # -- write --------------------------------------------------------
    def commit(self, manifest: Manifest) -> Manifest:
        """Atomically publish a new version. The version file is
        immutable once written; the CURRENT pointer swap is the single
        visibility point (exactly-once sink semantics)."""
        cur = self.current_version()
        if not self.fs.is_object:
            # make committed-but-unswapped rivals visible FIRST, then
            # validate the parent against the true head — a committer
            # that already built against the rolled-forward head (e.g.
            # a retry) need not pay an extra conflict round
            cur = self._roll_forward(cur)
        if manifest.parent_version != cur:
            raise CommitConflict(
                f"stale commit: parent={manifest.parent_version} current={cur}"
            )
        if self.fs.is_object:
            # single-step commit: version numbers are gapless, so the
            # exclusive create fully arbitrates every race
            expected = self.next_version()
            if manifest.version != expected:
                raise CommitConflict(
                    f"stale commit: version {manifest.version} but the log "
                    f"is at {expected - 1} (concurrent commit?)"
                )
        else:
            # POSIX: the exclusive version create IS the commit point
            # (version files are crash-atomic: complete or absent);
            # CURRENT is a roll-forwardable cache of the head. A version
            # file above CURRENT is a rival that won its create but has
            # not (or never will) swap CURRENT - roll it forward NOW and
            # surface the stale parent as a clean conflict, instead of
            # letting a same-parent sibling slide past and clobber it
            # (the silent lost-commit race the concurrent-DML test
            # found), and instead of aging corpses behind a grace
            # window. Retired history (rollback/reset floor) is never
            # rolled forward.
            vs = self.versions()
            newest = vs[-1] if vs else 0
            if newest >= manifest.version:
                if newest > self._posix_retired_floor():
                    # a NON-retired file at/above our number appeared
                    # AFTER the roll-forward listing above: a racing
                    # sibling won its create in that window. Burning
                    # past it here would commit our same-parent state
                    # over the rival's — the silent lost-update this
                    # path must never reintroduce. Conflict instead;
                    # the retry's roll-forward makes the rival visible.
                    raise CommitConflict(
                        f"stale commit: version {newest} appeared above "
                        f"CURRENT={cur} during commit (concurrent "
                        "committer); retry against the fresh parent"
                    )
                # retired history (rollback/reset floor): burn past it
                manifest = dataclasses.replace(manifest, version=newest + 1)
        vpath = self.fs.full("_manifest", f"manifest-{manifest.version:06d}.json")
        # Exclusive create makes version creation atomic (O_EXCL /
        # conditional put): of two racing committers with the same
        # parent, exactly one wins (the loser gets a stale-commit
        # error, not a silently clobbered manifest)
        try:
            self.fs.create_exclusive(vpath, manifest.to_json())
        except FileExistsError:
            raise CommitConflict(
                f"version {manifest.version} already exists (concurrent commit?)"
            ) from None
        if not self.fs.is_object:
            self._update_current_monotonic(manifest.version)
        return manifest



    def rollback(self, to_version: int) -> None:
        """Demote CURRENT to an earlier version (DQ-gate demotion -
        the engine analogue of the reference's quarantine path leaving
        bad partitions unpromoted, ``workflow_ge_gate/main.tf:172-209``).
        POSIX: re-point the CURRENT file. Object backend: commit a
        RESTORE version whose content is the target snapshot (history
        stays linear; Delta/Iceberg RESTORE semantics)."""
        vpath = self.fs.full("_manifest", f"manifest-{to_version:06d}.json")
        if not self.fs.exists(vpath):
            raise FileNotFoundError(vpath)
        if self.fs.is_object:
            target = self.load(to_version)
            cur = self.current_version()
            if cur == to_version:
                return
            restored = dataclasses.replace(
                target,
                version=self.next_version(),
                parent_version=cur,
                metrics={**target.metrics, "restored_from": to_version},
            )
            self.commit(restored)
            return
        with self._current_lock():
            self._record_posix_retired()
            self.fs.write_atomic(
                self.fs.full("_manifest", "CURRENT"),
                json.dumps({"version": to_version}),
            )

    def _current_lock(self):
        """POSIX-only advisory lock serializing CURRENT pointer writes
        (commit swap, roll-forward, rollback). Single-node by design -
        the object path is the multi-node protocol."""
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def lock():
            fd = os.open(
                self.fs.full("_manifest", ".current.lock"),
                os.O_CREAT | os.O_RDWR,
            )
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)

        return lock()

    def _update_current_monotonic(self, version: int) -> None:
        """Advance CURRENT to ``version`` unless it already points at or
        beyond it - a delayed committer's swap must never regress the
        pointer past a rival (or roll-forward) that moved it first.
        Versions at or below the RETIRED floor are demoted history
        (rollback/reset landed after our exclusive create): swapping to
        them would silently undo the demotion, so they stay invisible -
        mirroring ``_roll_forward``'s floor check."""
        with self._current_lock():
            if version <= self._posix_retired_floor():
                return
            p = self.fs.full("_manifest", "CURRENT")
            cur = (
                json.loads(self.fs.read_text(p))["version"]
                if self.fs.exists(p)
                else None
            )
            if cur is not None and cur >= version:
                return
            self.fs.write_atomic(p, json.dumps({"version": version}))

    def _roll_forward(self, cur: int | None) -> int | None:
        """POSIX recovery: make committed-but-unswapped version files
        visible. Any readable version file above both CURRENT and the
        retired floor whose parent chains from CURRENT was fully
        committed by its writer's exclusive create (crash-atomic, so
        complete); advance CURRENT through the chain and return the new
        head. Files at or below the retired floor are demoted history
        and stay invisible."""
        floor = self._posix_retired_floor()
        advanced = cur
        while True:
            base = max(advanced or 0, floor)
            nxt = None
            for v in self.versions():
                if v <= base:
                    continue
                try:
                    mv = self.load(v)
                except (ValueError, KeyError, TypeError):
                    continue  # unreadable legacy partial - skip
                if mv is not None and mv.parent_version == advanced:
                    nxt = v
                    break
            if nxt is None:
                break
            self._update_current_monotonic(nxt)
            advanced = nxt
        return advanced

    def _posix_retired_floor(self) -> int:
        """POSIX only: the highest version number known to be RETIRED
        history (demoted by rollback / reset) rather than a mid-flight
        concurrent committer. Version files above CURRENT but at or
        below this floor are legitimate leftovers; anything above BOTH
        is treated as a racing sibling by ``commit``."""
        path = self.fs.full("_manifest", "RETIRED.json")
        if not self.fs.exists(path):
            return 0
        return int(json.loads(self.fs.read_text(path)).get("above", 0))

    def _record_posix_retired(self) -> None:
        vs = self.versions()
        if not vs:
            return
        floor = max(vs[-1], self._posix_retired_floor())
        _atomic_write(
            self.fs.full("_manifest", "RETIRED.json"),
            json.dumps({"above": floor}),
        )

    def next_version(self) -> int:
        vs = self.versions()
        return (vs[-1] + 1) if vs else 1

    def reset(self) -> None:
        """Retire every committed version: the lake reads as empty and
        the next apply starts from an empty checkpoint (full-replay
        entry point). Old manifests/files remain until gc. POSIX:
        remove CURRENT; object backend: write a floor marker (there is
        no pointer object to delete)."""
        if self.fs.is_object:
            vs = self.versions()
            if vs:
                self.fs.write_atomic(
                    self.fs.full("_manifest", f"RESET-{vs[-1]:06d}"),
                    json.dumps({"above": vs[-1]}),
                )
            return
        with self._current_lock():
            self._record_posix_retired()
            self.fs.remove_if_exists(self.fs.full("_manifest", "CURRENT"))

    def versions(self) -> list[int]:
        out = []
        for name in self.fs.listdir(self.dir):
            if name.startswith("manifest-") and name.endswith(".json"):
                out.append(int(name[len("manifest-"):-len(".json")]))
        return sorted(out)

    # -- gc -----------------------------------------------------------
    def history(self) -> list[dict]:
        """DESCRIBE HISTORY analogue: one summary row per committed
        version, oldest first — version, parent, timestamp, commit
        metrics, row/file/byte totals and partitioning. Reads only the
        manifest JSONs (never data files)."""
        out = []
        for v in self.versions():
            m = self.load(v)
            if m is None:
                continue
            files = m.all_files()
            out.append(
                {
                    "version": m.version,
                    "parent_version": m.parent_version,
                    "created_at": m.created_at,
                    "watermark": m.watermark,
                    "rows": m.total_rows(),
                    "files": len(files),
                    "bytes": sum(
                        f.get("bytes", 0)
                        for fs in m.partitions.values()
                        for f in fs
                    ),
                    "quarantined_files": len(m.quarantine),
                    "metrics": dict(m.metrics),
                    "partitioning": dict(m.partitioning),
                }
            )
        return out

    def gc(self, keep_versions: int = 2, min_age_seconds: float = 300.0) -> list[str]:
        """Delete data and quarantine files not referenced by the last
        ``keep_versions`` manifests (orphans from failed attempts,
        COW-superseded files, redriven quarantine rows).

        Safe to run concurrently with writers because deletion is gated
        on file age (Iceberg-style orphan cleanup): an in-flight apply
        writes its partition files BEFORE the manifest commit makes
        them referenced, so only orphans older than ``min_age_seconds``
        - far beyond any single commit's write-to-commit window - are
        removed. Pass ``min_age_seconds=0`` only when no writer is live.
        """
        versions = self.versions()
        live: set[str] = set()
        keep = versions[-keep_versions:] if versions else []
        cur = self.current_version()
        if cur is not None and cur not in keep:
            keep.append(cur)
        for v in self.tags().values():  # savepoints stay restorable
            if v in versions and v not in keep:
                keep.append(v)
        for v in keep:
            m = self.load(v)
            live.update(m.all_files())
            live.update(q["path"] for q in m.quarantine)
            # bloom sidecars live exactly as long as their data file
            live.update(
                f["bloom"]
                for files in m.partitions.values()
                for f in files
                if f.get("bloom")
            )
        removed = []
        fs = self.fs
        cutoff = time.time() - min_age_seconds
        # _quarantine/dq/ holds DQ demotion markers (diagnostics, not
        # row data) - never swept.
        roots = [fs.full("data")]
        qroot = fs.full("_quarantine")
        if fs.isdir(qroot):
            roots += [
                fs.full("_quarantine", d)
                for d in fs.listdir(qroot)
                if d.startswith("part=")
            ]
        for top in roots:
            for p in fs.walk_files(top):
                rel = fs.rel(p)
                if rel not in live and fs.mtime(p) <= cutoff:
                    fs.remove(p)
                    removed.append(rel)
            fs.prune_empty_dirs(top)
        # staged changelogs (_staged/, _ingest/, _refresh/ from
        # apply_dataset, forget/expire, matview/search refreshes) keep
        # their replay role only until the CURRENT manifest covers
        # them; an APPLIED staged file older than the age gate is pure
        # debris. _STAGED markers go with the last file of their dir.
        cur_m = self.load()
        if cur_m is not None:
            for sub in ("_staged", "_ingest", "_refresh"):
                top = fs.full(sub)
                if not fs.isdir(top):
                    continue
                marker_dirs: set[str] = set()
                for p in fs.walk_files(top):
                    name = p.rsplit("/", 1)[-1] if "://" in p else os.path.basename(p)
                    if name == "_STAGED":
                        marker_dirs.add(p[: -len("/_STAGED")])
                        continue
                    if cur_m.is_applied(p) and fs.mtime(p) <= cutoff:
                        fs.remove(p)
                        removed.append(fs.rel(p))
                # a _STAGED marker whose directory holds nothing else is
                # debris too (object stores have no dirs to rmdir)
                for d in marker_dirs:
                    left = [
                        f for f in fs.walk_files(d)
                        if not f.endswith("/_STAGED")
                    ]
                    if not left:
                        fs.remove_if_exists(d + "/_STAGED")
                fs.prune_empty_dirs(top)
        return removed
