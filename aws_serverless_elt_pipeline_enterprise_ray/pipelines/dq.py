"""Data-quality gate over committed lake versions.

Engine analogue of the reference's Great-Expectations Glue gate
(``glue_ge_validation/scripts/ge_validate_silver.py:21-56``: row_count
between, not_null, unique keys, value ranges) and its declarative rule
mirror (``dq/ups_shipping/rules.yaml:4-10``). Where the reference runs
a Spark job per partition and quarantines via a Step Functions Catch
(``workflow_ge_gate/main.tf:136-217``), we run ONE partition-parallel
Ray Data pass (no shuffle - the uniqueness check exploits the
structural invariant that keys are partition-local) and demote the
manifest pointer on failure, leaving the previous version live.

The report is written next to the manifest version it validated
(``_dq/report-<version>.json``), like the reference's
``ge/results/.../run_<id>.json`` (S7).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..schema import TableSpec, default_spec
from ..state.manifest import ManifestStore, _atomic_write


class _PartitionChecker:
    """Per-partition DQ partials: one task per partition, no shuffle.

    Emits one result row per partition; the driver combines. Uniqueness
    needs no cross-partition pass because the merge stage guarantees a
    key lives in exactly one partition (salted keys included: the salt
    is a pure function of the key)."""

    def __init__(self, lake_dir: str, rules: dict, key_cols: tuple[str, ...]):
        self.lake_dir = lake_dir
        self.rules = rules
        # the MERGE key from the manifest's partitioning - NOT the DQ
        # unique rule: reducing multi-run partitions by a custom
        # dq.unique key would collapse legitimately distinct rows and
        # make the uniqueness check vacuous (it would merge away the
        # very duplicates it exists to catch)
        self.key_cols = key_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        from ..schema import lww_reduce
        from ..stages.merge import conform_to_schema

        from ..state.lakefs import lakefs

        lfs = lakefs(self.lake_dir)
        for row in batch.to_pylist():
            paths = [lfs.full(p) for p in json.loads(row["files"])]
            tbls = [lfs.read_parquet(p) for p in paths]
            if len(tbls) > 1:
                uni = pa.unify_schemas([t.schema for t in tbls], promote_options="permissive")
                tbls = [conform_to_schema(t, uni) for t in tbls]
            tbl = pa.concat_tables(tbls)
            if len(paths) > 1:
                # merge delta-append runs before checking, else rows
                # superseded by later runs read as duplicates
                tbl = lww_reduce(tbl, self.key_cols, "ts", "_seq")
            live = tbl.filter(pc.invert(pc.fill_null(tbl["_deleted"], False)))
            res = {"part_id": row["part_id"], "rows": len(live)}
            nulls = {}
            for c in self.rules["not_null"]:
                if c in live.column_names:
                    nulls[c] = live[c].null_count
            res["null_counts"] = json.dumps(nulls)
            dup = 0
            for key in self.rules["unique"]:
                if all(k in live.column_names for k in key):
                    n_distinct = len(live.select(list(key)).group_by(list(key)).aggregate([]))
                    dup += len(live) - n_distinct
            res["dup_keys"] = dup
            rng = {}
            for c, (lo, hi) in self.rules["ranges"].items():
                if c in live.column_names and len(live):
                    cmin = pc.min(live[c]).as_py()
                    cmax = pc.max(live[c]).as_py()
                    viol = 0
                    if lo is not None:
                        viol += pc.sum(
                            pc.cast(pc.less(live[c], lo), pa.int64())
                        ).as_py() or 0
                    if hi is not None:
                        viol += pc.sum(
                            pc.cast(pc.greater(live[c], hi), pa.int64())
                        ).as_py() or 0
                    rng[c] = {"min": cmin, "max": cmax, "violations": viol}
            res["ranges"] = json.dumps(rng, default=str)
            out.append(res)
        if not out:
            return pa.table(
                {"part_id": pa.array([], pa.int64()), "rows": pa.array([], pa.int64()),
                 "null_counts": pa.array([], pa.string()), "dup_keys": pa.array([], pa.int64()),
                 "ranges": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "part_id": [r["part_id"] for r in out],
                "rows": [r["rows"] for r in out],
                "null_counts": [r["null_counts"] for r in out],
                "dup_keys": [r["dup_keys"] for r in out],
                "ranges": [r["ranges"] for r in out],
            }
        )


def run_dq(
    lake_dir: str,
    spec: TableSpec | None = None,
    version: int | None = None,
    only_changed: bool = False,
) -> dict:
    """Validate a committed version; returns the report dict
    (``ok``, per-check results, per-partition detail).

    ``only_changed=True`` is the incremental mode for always-on
    tailing: every rule the engine enforces is PARTITION-LOCAL
    (not_null / unique keys / ranges - keys never span partitions), so
    validating only the partitions the latest commit touched (the
    manifest's lineage) gives the same per-partition guarantees at
    O(delta) read cost. The one global rule, row_count_min, needs the
    whole table and is reported as skipped (``ok: true, skipped:
    true``) - run a full ``run_dq`` on a schedule for it."""
    spec = spec or default_spec()
    store = ManifestStore(lake_dir)
    m = store.load(version)
    if m is None:
        return {"ok": False, "error": "no committed version"}
    rules = {
        "not_null": list(spec.dq.not_null),
        "unique": [list(u) for u in spec.dq.unique],
        "ranges": {k: list(v) for k, v in spec.dq.ranges.items()},
    }
    changed = {str(pid) for pid in m.lineage} if only_changed else None
    if changed is not None and not changed <= set(map(str, m.partitions)):
        # non-partition lineage (a rebalance writes {'_rebalance': ...})
        # means the WHOLE table was rewritten: incremental would be
        # vacuously green, so fall back to the full check
        changed = None
    items = [
        {"part_id": int(pid), "files": json.dumps([f["path"] for f in files])}
        for pid, files in m.partitions.items()
        if files and (changed is None or str(pid) in changed)
    ]
    checks = {
        "row_count": {"value": 0, "min": spec.dq.row_count_min, "ok": True},
        "not_null": {c: {"nulls": 0, "ok": True} for c in rules["not_null"]},
        "unique": {"dup_keys": 0, "ok": True},
        "range": {c: {"violations": 0, "ok": True} for c in rules["ranges"]},
    }
    if items:
        checker = _PartitionChecker(
            lake_dir=lake_dir,
            rules=rules,
            key_cols=tuple(m.partitioning.get("key_cols", spec.key_cols)),
        )
        # task-based (state serialized once): no actor-pool startup latency
        ds = rd.from_items(items).map_batches(
            checker.__call__, batch_format="pyarrow", batch_size=1
        )
        for r in ds.take_all():
            checks["row_count"]["value"] += r["rows"]
            for c, n in json.loads(r["null_counts"]).items():
                checks["not_null"][c]["nulls"] += n
            checks["unique"]["dup_keys"] += r["dup_keys"]
            for c, d in json.loads(r["ranges"]).items():
                checks["range"][c]["violations"] += d["violations"]

    if only_changed:
        checks["row_count"] = {
            "value": None,
            "min": spec.dq.row_count_min,
            "ok": True,
            "skipped": True,
        }
    else:
        checks["row_count"]["ok"] = (
            checks["row_count"]["value"] >= spec.dq.row_count_min
        )
    for c in rules["not_null"]:
        checks["not_null"][c]["ok"] = checks["not_null"][c]["nulls"] == 0
    checks["unique"]["ok"] = checks["unique"]["dup_keys"] == 0
    for c in rules["ranges"]:
        checks["range"][c]["ok"] = checks["range"][c]["violations"] == 0
    ok = (
        checks["row_count"]["ok"]
        and all(v["ok"] for v in checks["not_null"].values())
        and checks["unique"]["ok"]
        and all(v["ok"] for v in checks["range"].values())
    )
    report = {
        "ok": ok,
        "version": m.version,
        "only_changed": only_changed,
        "checked_partitions": len(items),
        "checks": checks,
    }
    from ..state.lakefs import lakefs as _lakefs

    lfs = _lakefs(lake_dir)
    lfs.makedirs(lfs.full("_dq"))
    suffix = "-incr" if only_changed else ""
    _atomic_write(
        lfs.full("_dq", f"report-{m.version:06d}{suffix}.json"),
        json.dumps(report, indent=1, default=str),
    )
    return report


def dq_gate(
    lake_dir: str,
    spec: TableSpec | None = None,
    on_fail=None,
) -> dict:
    """Validate CURRENT; on failure demote to the parent version and
    write a quarantine marker (the reference's QuarantineMarker +
    NotifyFailure path, ``workflow_ge_gate/main.tf:172-209``). The
    failed version's files stay on disk for inspection until gc.

    ``on_fail(report)`` is the notification hook - the engine analogue
    of the gate's SNS notify (``workflow_ge_gate/main.tf:192-209``);
    it runs after demotion, and its exceptions are swallowed (a broken
    notifier must not block the gate)."""
    store = ManifestStore(lake_dir)
    m = store.load()
    report = run_dq(lake_dir, spec)
    if not report.get("ok") and m is not None:
        if m.parent_version is not None:
            store.rollback(m.parent_version)
        else:
            store.reset()
        from ..state.lakefs import lakefs as _lakefs

        lfs = _lakefs(lake_dir)
        lfs.makedirs(lfs.full("_quarantine", "dq"))
        _atomic_write(
            lfs.full("_quarantine", "dq", f"version-{m.version:06d}.json"),
            json.dumps({"demoted_version": m.version, "report": report}, default=str),
        )
        report["demoted_to"] = m.parent_version
        if on_fail is not None:
            try:
                on_fail(report)
            except Exception:
                pass
    return report


def referential_check(
    child: "rd.Dataset",
    parent: "rd.Dataset",
    *,
    fk: str,
    pk: str | None = None,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Referential-integrity audit between two tables/lakes: child rows
    whose foreign key has NO matching parent key — the cross-table data
    contract the reference's per-table GE suites can't express
    (scripts/run_ge_checks.py validates one table at a time). Returns a
    Dataset of (fk_value, n_rows) per violating key.

    Scale shape: the child's fk column reduces MAP-SIDE to distinct
    (value, count) partials and the parent's pk to distinct values, so
    the anti hash_join exchanges key-vocabulary-sized sides — fact rows
    never shuffle. NULL foreign keys are ignored (SQL FK semantics:
    NULL never violates); use a not_null DQ rule to forbid them."""
    import pandas as pd

    from ..functions.joins import hash_join
    from ..functions.windows import bucketed_agg, bucketed_distinct

    pk = pk or fk

    def child_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[fk].dropna()
        return v.value_counts().rename("n_rows").rename_axis(fk).reset_index()

    counts = bucketed_agg(
        child.map_batches(child_partial, batch_format="pandas"),
        fk,
        {"n_rows": "sum"},
        nb=num_buckets,
    )

    def parent_keys(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({fk: b[pk].dropna()})

    keys = bucketed_distinct(
        parent.map_batches(parent_keys, batch_format="pandas"),
        fk,
        nb=num_buckets,
    )
    return hash_join(counts, keys, on=fk, how="anti")
