"""Multi-table transactional catalog: all-or-nothing visibility
across lakes.

The reference fans one bronze stream out into THREE per-type silver
tables (``lambdas/transform/app.py:93-104``) with no cross-table
consistency — a reader can see record type A's new partition while
type B's is still in flight. The engine's per-lake manifest commit is
already exactly-once, but ``pipelines/route.py`` promotes each lake
independently, so the same anomaly exists between lakes.

This module closes it with the Iceberg-REST-catalog pattern: a
versioned CATALOG whose entries pin ``{table_name: (lake_dir,
manifest_version)}``. Per-lake commits happen first (normal
``apply_changes`` — those versions exist but are not yet referenced),
then ONE exclusive-create of ``catalog-%06d.json`` publishes every
pin atomically. Readers that resolve through the catalog
(``read_table_at``) see either all of a transaction's tables or none.

Commit protocol (single-step, listing-is-truth on BOTH backends):
catalog versions are gapless; ``create_exclusive`` of the next
version file is the only visibility point, so of two racing
transactions exactly one wins and the loser gets ``CommitConflict``
(same arbitration as ``ManifestStore.commit``; POSIX ``O_EXCL`` /
conditional PUT). There is no CURRENT pointer to double-write —
``current_version()`` is the max of the listing.

Crash safety: a transaction that dies after its per-lake commits but
before the catalog commit leaves the catalog (and every catalog
reader) on the old pins for ALL tables — a consistent snapshot.
Re-running the transaction converges: ``apply_changes`` finds the
change files already applied (idempotent, returns []), the pin is
re-read from the lake's CURRENT, and the catalog commit completes.

Conflict recovery: the loser of a catalog race re-begins from the
fresh snapshot; its per-lake work is never lost (lake versions are
monotone and the new pin is simply re-stated). ``Transaction.commit``
does this bounded re-pin retry itself unless ``retries=0``.
"""

from __future__ import annotations

import json
from typing import Any

from .lakefs import lakefs
from .manifest import CommitConflict


class TxnCatalog:
    """Versioned {table -> (lake_dir, manifest_version)} pin log
    rooted at ``<root>/_catalog``. ``root`` may be a plain path or an
    object-store URI."""

    def __init__(self, root: str):
        self.root = root
        self.fs = lakefs(root)
        self.dir = self.fs.full("_catalog")
        self.fs.makedirs(self.dir)

    # -- read ---------------------------------------------------------
    def versions(self) -> list[int]:
        out = []
        for name in self.fs.listdir(self.dir):
            if name.startswith("catalog-") and name.endswith(".json"):
                out.append(int(name[len("catalog-"):-len(".json")]))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def snapshot(self, version: int | None = None) -> dict[str, dict]:
        """{table_name: {"lake_dir": str, "version": int}} at the
        given catalog version (default: current). Empty dict before
        the first commit."""
        if version is None:
            version = self.current_version()
        if version is None:
            return {}
        doc = json.loads(
            self.fs.read_text(
                self.fs.full("_catalog", f"catalog-{version:06d}.json")
            )
        )
        return doc["tables"]

    def history(self) -> list[dict]:
        return [
            json.loads(
                self.fs.read_text(
                    self.fs.full("_catalog", f"catalog-{v:06d}.json")
                )
            )
            for v in self.versions()
        ]

    # -- write --------------------------------------------------------
    def commit_pins(
        self, tables: dict[str, dict], parent: int | None
    ) -> int:
        """Atomically publish a catalog version. Gapless numbering +
        exclusive create arbitrate every race."""
        cur = self.current_version()
        if parent != cur:
            raise CommitConflict(
                f"stale catalog commit: parent={parent} current={cur}"
            )
        version = (cur or 0) + 1
        doc = json.dumps(
            {"version": version, "parent_version": parent, "tables": tables},
            sort_keys=True,
        )
        path = self.fs.full("_catalog", f"catalog-{version:06d}.json")
        try:
            self.fs.create_exclusive(path, doc)
        except FileExistsError:
            raise CommitConflict(
                f"catalog version {version} already exists "
                "(concurrent transaction?)"
            ) from None
        return version

    def begin(self) -> "Transaction":
        return Transaction(self)


class Transaction:
    """Collects per-table work, then publishes all pins in ONE catalog
    commit. Per-lake commits are exactly-once on their own; the
    transaction only controls cross-table VISIBILITY."""

    def __init__(self, catalog: TxnCatalog):
        self.catalog = catalog
        self.parent = catalog.current_version()
        self.base = catalog.snapshot(self.parent)
        self.pending: dict[str, dict] = {}

    def apply(
        self,
        name: str,
        changelog_dir: str | list[str],
        spec=None,
        *,
        lake_dir: str | None = None,
        **kw: Any,
    ) -> list:
        """apply_changes into ``name``'s lake (registered pin, or
        ``lake_dir`` for a table new to the catalog) and stage the
        resulting version pin. Returns the manifests committed."""
        from ..pipelines.cdc import apply_changes
        from .manifest import ManifestStore

        entry = self.base.get(name) or self.pending.get(name)
        if lake_dir is None:
            if entry is None:
                raise KeyError(
                    f"table {name!r} is not in the catalog; pass lake_dir"
                )
            lake_dir = entry["lake_dir"]
        ms = apply_changes(changelog_dir, lake_dir, spec, **kw)
        version = (
            ms[-1].version
            if ms
            else ManifestStore(lake_dir).current_version()
        )
        self.pending[name] = {"lake_dir": lake_dir, "version": version}
        return ms

    def pin(self, name: str, lake_dir: str, version: int) -> None:
        """Stage an explicit pin (compaction, rebalance, an apply done
        outside this object)."""
        self.pending[name] = {"lake_dir": lake_dir, "version": version}

    def commit(self, retries: int = 3) -> int:
        """Publish every staged pin atomically. On a catalog race the
        staged pins are re-stated over the winner's snapshot (lake
        versions are monotone, so re-pinning is always safe) up to
        ``retries`` times."""
        if not self.pending:
            raise ValueError("empty transaction")
        attempt = 0
        while True:
            tables = dict(self.base)
            tables.update(self.pending)
            try:
                return self.catalog.commit_pins(tables, self.parent)
            except CommitConflict:
                if attempt >= retries:
                    raise
                attempt += 1
                self.parent = self.catalog.current_version()
                self.base = self.catalog.snapshot(self.parent)


def read_table_at(
    catalog: TxnCatalog,
    name: str,
    catalog_version: int | None = None,
    **kw: Any,
):
    """Dataset over ``name`` exactly as pinned by the catalog — the
    transactionally-consistent read path (a direct ``read_table``
    sees per-lake CURRENT, which may be mid-transaction)."""
    from ..pipelines.cdc import read_table

    snap = catalog.snapshot(catalog_version)
    if name not in snap:
        raise KeyError(f"table {name!r} not in catalog snapshot")
    e = snap[name]
    return read_table(e["lake_dir"], version=e["version"], **kw)
