"""CLI entry points: the engine's operational surface.

Maps the reference's Make targets / ops workflows onto subcommands
(``Makefile:131-158`` ops-start, ``:227-247`` ge-start, ``:320-359``
verify-seed/verify-idempotency, ``scripts/gen_fake_events.py`` CLI):

    python -m aws_serverless_elt_pipeline_enterprise_ray.cli gen ...
    ... ingest --changelog DIR --lake DIR [--commit-every N]
    ... replay --changelog DIR --lake DIR [--from-version V]
    ... compact --lake DIR [--purge-tombstones]
    ... dq --lake DIR [--gate]
    ... gc --lake DIR
    ... show --lake DIR

Owns its Ray session (guarded init); library code never inits Ray.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Set BEFORE Ray auto-initializes so the raylet (and every worker it
# spawns) inherits them: stop glibc from mmap'ing/unmapping every large
# per-batch allocation - fresh-page churn costs TLB shootdowns + page
# zeroing, and on this sandbox's degraded hypervisor windows it alone
# halves throughput (see bench.MALLOC_TUNING / BASELINE.md).
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")


def _ray_up(num_cpus: int | None) -> bool:
    """Attach to (or start) a Ray session. Returns True only when THIS
    call started it — the CLI must then shut it down on exit, but must
    NEVER tear down an ambient session it merely joined (a `ray job
    submit` runtime's session, or the caller's when `main()` is
    invoked in-process)."""
    import ray

    started = False
    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
        started = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return started



def _parse_value(v: str):
    try:
        return json.loads(v)
    except (ValueError, TypeError):
        return v


def _parse_where(items: list) -> list[tuple]:
    out = []
    for item in items:
        col, op, val = item.split(":", 2)
        val = _parse_value(val)
        if op == "between":
            val = tuple(val)
        out.append((col, op, val))
    return out


def _where_arg(args) -> list:
    """One predicate from either surface: ``--where COL:OP:VALUE``
    conjuncts (scripting-friendly) or ``--where-sql`` text (the SQL
    users of the reference's Athena surface speak). Exactly one."""
    if bool(args.where) == bool(args.where_sql):
        raise SystemExit("pass exactly one of --where / --where-sql")
    if args.where_sql:
        from .sqlpred import parse_where

        return parse_where(args.where_sql)
    return _parse_where(args.where)


def _parse_set(items: list) -> dict:
    out = {}
    for item in items:
        col, val = item.split("=", 1)
        out[col] = _parse_value(val)
    return out

def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="aws_serverless_elt_pipeline_enterprise_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="seeded synthetic change stream")
    g.add_argument("--out", required=True)
    g.add_argument("--events", type=int, default=100_000)
    g.add_argument("--convs", type=int, default=1000)
    g.add_argument("--files", type=int, default=16)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--bad-ratio", type=float, default=0.0)
    g.add_argument("--evolve-after", type=int, default=None)

    i = sub.add_parser("ingest", help="apply pending change files")
    i.add_argument("--changelog", required=True)
    i.add_argument("--lake", required=True)
    i.add_argument("--commit-every", type=int, default=None)
    i.add_argument("--partitions", type=int, default=64)
    i.add_argument("--detect-hot-keys", action="store_true")

    t = sub.add_parser("tail", help="always-on poll-and-apply loop")
    t.add_argument("--changelog", required=True)
    t.add_argument("--lake", required=True)
    t.add_argument("--partitions", type=int, default=64)
    t.add_argument("--poll-seconds", type=float, default=1.0)
    t.add_argument("--max-idle-rounds", type=int, default=5,
                   help="negative = run forever")
    t.add_argument(
        "--maintain-every", type=int, default=None,
        help="run policy-driven maintenance after every N commits",
    )
    t.add_argument(
        "--supervise", action="store_true",
        help="run the loop in a restart-on-crash child process "
             "(survives Ray-core faults; see pipelines.tail.supervised_tail)",
    )
    t.add_argument("--max-restarts", type=int, default=10)

    r = sub.add_parser("replay", help="re-apply from a checkpoint version")
    r.add_argument("--changelog", required=True)
    r.add_argument("--lake", required=True)
    r.add_argument("--from-version", type=int, default=None)
    r.add_argument("--partitions", type=int, default=64)

    c = sub.add_parser("compact", help="re-pack small files")
    c.add_argument("--lake", required=True)
    c.add_argument("--target-rows", type=int, default=2_000_000)
    c.add_argument("--purge-tombstones", action="store_true",
                   help="purge ALL tombstones (assert no more late data)")
    c.add_argument("--purge-tombstones-before-us", type=int, default=None,
                   help="purge tombstones with event-time below this us epoch")
    c.add_argument("--purge-tombstones-auto", action="store_true",
                   help="derive the purge horizon from observed event-time skew")
    c.add_argument("--drop-columns", nargs="+", default=(),
                   help="schema-narrowing migration: remove these payload "
                        "columns from data + manifest in one commit")
    c.add_argument("--cluster-by", nargs="+", default=(),
                   help="Z-order rewritten partitions by these columns "
                        "(OPTIMIZE ZORDER analogue: tight zone maps for "
                        "read_where on them)")

    xp = sub.add_parser(
        "expire", help="retention: tombstone rows at/before a timestamp"
    )
    xp.add_argument("--lake", required=True)
    xp.add_argument("--older-than", required=True,
                    help="ISO timestamp cutoff (inclusive)")

    d = sub.add_parser("dq", help="data-quality report / gate")
    d.add_argument("--lake", required=True)
    d.add_argument("--gate", action="store_true", help="demote CURRENT on failure")
    d.add_argument(
        "--only-changed",
        action="store_true",
        help="incremental: validate only partitions touched by the last "
        "commit (O(delta) read; global row_count check skipped)",
    )

    cf = sub.add_parser(
        "changes", help="change data feed between two committed versions"
    )
    cf.add_argument("--lake", required=True)
    cf.add_argument("--from-version", type=int, required=True,
                    help="0 = empty snapshot (initial full feed)")
    cf.add_argument("--to-version", type=int, default=None)
    cf.add_argument("--out", default=None, help="write the feed as parquet here")

    fg = sub.add_parser(
        "forget", help="delete all rows of the given keys (right-to-be-forgotten)"
    )
    fg.add_argument("--lake", required=True)
    fg.add_argument("--keys", nargs="+", required=True, help="conv_ids to forget")

    rd_p = sub.add_parser("redrive", help="re-emit quarantined rows as a change file")
    rd_p.add_argument("--lake", required=True)
    rd_p.add_argument("--changelog", required=True)

    gc = sub.add_parser("gc", help="remove unreferenced data files")
    gc.add_argument("--lake", required=True)
    gc.add_argument("--keep-versions", type=int, default=2)
    gc.add_argument(
        "--min-age-seconds", type=float, default=300.0,
        help="only delete orphans older than this (safe with live writers)",
    )

    hs = sub.add_parser(
        "history", help="one summary line per committed version (manifest-only)"
    )
    hs.add_argument("--lake", required=True)

    s = sub.add_parser("show", help="manifest / checkpoint status")
    s.add_argument("--lake", required=True)

    st = sub.add_parser(
        "stats", help="skew / LSM-depth / small-file report from the manifest (no data read)"
    )
    st.add_argument("--lake", required=True)
    st.add_argument("--version", type=int, default=None)

    pf = sub.add_parser(
        "profile",
        help="ANALYZE-style column profile of the committed state "
        "(n / nulls / exact distinct / min / max per column)",
    )
    pf.add_argument("--lake", required=True)
    pf.add_argument("--columns", default=None,
                    help="comma list; default = all payload columns")
    pf.add_argument("--version", default=None)

    rb = sub.add_parser(
        "rebalance", help="migrate lake to new partitioning (P / hot keys / salt)"
    )
    rb.add_argument("--lake", required=True)
    rb.add_argument("--partitions", type=int, default=None)
    rb.add_argument("--hot-keys", nargs="*", default=None)
    rb.add_argument("--hot-key-salt", type=int, default=None)

    rt = sub.add_parser(
        "route", help="split a mixed record_type stream into per-type lakes and apply"
    )
    rt.add_argument("--changelog", required=True)
    rt.add_argument("--lake-root", required=True)
    rt.add_argument("--types", nargs="+", required=True)
    rt.add_argument("--type-col", default="record_type")
    rt.add_argument("--partitions", type=int, default=64)

    mt = sub.add_parser(
        "maintain", help="policy-driven compact/rebalance from the stats report"
    )
    mt.add_argument("--lake", required=True)
    mt.add_argument("--max-files-per-partition", type=int, default=4)
    mt.add_argument("--max-row-skew", type=float, default=4.0)
    mt.add_argument("--dry-run", action="store_true")

    ex = sub.add_parser(
        "export", help="resumable plain-Parquet snapshot export of a committed version"
    )
    ex.add_argument("--lake", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--version", type=int, default=None)
    ex.add_argument("--max-rows-per-file", type=int, default=2_000_000)
    ex.add_argument(
        "--layout", choices=("partition", "dt"), default="partition",
        help="dt = Hive dt=YYYY-MM-DD silver layout",
    )
    ex.add_argument(
        "--format", choices=("parquet", "jsonl"), default="parquet",
        help="jsonl = gzipped JSONL training-handoff shards",
    )

    ix = sub.add_parser(
        "index", help="refresh the incremental search index from the lake's CDF"
    )
    ix.add_argument("--lake", required=True)
    ix.add_argument("--index", required=True)
    ix.add_argument("--partitions", type=int, default=16)

    se = sub.add_parser("search", help="term lookup in the search index")
    se.add_argument("--index", required=True)
    se.add_argument("--term", required=True)

    cl = sub.add_parser(
        "clone", help="zero-copy branch of a committed version (hard links)"
    )
    cl.add_argument("--src", required=True)
    cl.add_argument("--dst", required=True)
    cl.add_argument("--version", type=int, default=None)

    pb = sub.add_parser(
        "publish",
        help="write-audit-publish: atomically install a validated "
        "branch's state as the destination's next version",
    )
    pb.add_argument("--branch", required=True)
    pb.add_argument("--dst", required=True)

    tg = sub.add_parser("tag", help="pin a name to a version (savepoint)")
    tg.add_argument("--lake", required=True)
    tg.add_argument("--name", required=True)
    tg.add_argument("--version", type=int, default=None)
    tg.add_argument("--delete", action="store_true")

    dl = sub.add_parser(
        "delete", help="DELETE FROM lake WHERE <conjunction> (row-level DML)"
    )
    dl.add_argument("--lake", required=True)
    dl.add_argument(
        "--where", action="append", default=None, metavar="COL:OP:VALUE",
        help="conjunct, e.g. role:==:assistant or turn_idx:between:[5,9]; "
        "VALUE parses as JSON, falling back to a raw string",
    )
    dl.add_argument(
        "--where-sql", default=None, metavar="SQL",
        help="SQL boolean expression instead of --where, e.g. "
        "\"role = 'assistant' AND turn_idx BETWEEN 5 AND 9\"",
    )

    up = sub.add_parser(
        "update", help="UPDATE lake SET col=value WHERE <conjunction>"
    )
    up.add_argument("--lake", required=True)
    up.add_argument("--where", action="append", default=None,
                    metavar="COL:OP:VALUE")
    up.add_argument("--where-sql", default=None, metavar="SQL")
    up.add_argument(
        "--set", action="append", required=True, metavar="COL=VALUE",
        help="scalar assignment; VALUE parses as JSON else raw string",
    )

    mb = sub.add_parser(
        "merge-branch",
        help="three-way merge of a diverged clone back into its source",
    )
    mb.add_argument("--branch", required=True)
    mb.add_argument("--into", required=True)
    mb.add_argument("--policy", default="lww",
                    choices=["lww", "ours", "theirs", "fail"])

    ac = sub.add_parser(
        "add-column", help="ALTER TABLE ADD COLUMN (metadata-only, O(1))"
    )
    ac.add_argument("--lake", required=True)
    ac.add_argument("--name", required=True)
    ac.add_argument("--type", required=True,
                    help="arrow type string, e.g. double, int64, string")

    dc = sub.add_parser(
        "drop-column", help="ALTER TABLE DROP COLUMN (metadata-only, O(1))"
    )
    dc.add_argument("--lake", required=True)
    dc.add_argument("--name", required=True)

    df_p = sub.add_parser(
        "diff", help="row-level lake diff: only_a/only_b/changed counts"
    )
    df_p.add_argument("--a", required=True)
    df_p.add_argument("--b", required=True)
    df_p.add_argument("--version-a", type=int, default=None)
    df_p.add_argument("--version-b", type=int, default=None)

    sw = sub.add_parser(
        "scan", help="predicate scan of the committed state (DNF where)"
    )
    sw.add_argument("--lake", required=True)
    sw.add_argument("--where", action="append", default=None,
                    metavar="COL:OP:VALUE")
    sw.add_argument("--where-sql", default=None, metavar="SQL")
    sw.add_argument("--columns", default=None,
                    help="comma-separated projection")
    sw.add_argument("--limit", type=int, default=20)

    sq = sub.add_parser(
        "sql",
        help="one DELETE / UPDATE / SELECT statement against a lake "
        "(the table name in the statement is informational; --lake "
        "addresses the data)",
    )
    sq.add_argument("--lake", required=True)
    sq.add_argument("--statement", required=True, metavar="SQL")

    sc = sub.add_parser(
        "scaffold", help="stamp spec YAML + transform + sample for a new table"
    )
    sc.add_argument("--name", required=True)
    sc.add_argument("--dir", default="specs")

    args = p.parse_args(argv)

    if args.cmd == "scaffold":
        from .scaffold import scaffold_dataset

        paths = scaffold_dataset(args.name, args.dir)
        print(json.dumps({"created": paths}))
        return 0

    if args.cmd == "gen":
        from .gen import gen_changes

        paths = gen_changes(
            args.out,
            n_events=args.events,
            n_convs=args.convs,
            n_files=args.files,
            seed=args.seed,
            bad_ratio=args.bad_ratio,
            evolve_after_file=args.evolve_after,
        )
        print(json.dumps({"files": len(paths), "dir": args.out}))
        return 0

    if args.cmd == "history":
        from .state.manifest import ManifestStore

        for row in ManifestStore(args.lake).history():
            print(json.dumps(row))
        return 0

    if args.cmd == "show":
        from .state.manifest import ManifestStore

        store = ManifestStore(args.lake)
        m = store.load()
        if m is None:
            print(json.dumps({"version": None}))
            return 0
        print(
            json.dumps(
                {
                    "version": m.version,
                    "watermark": m.watermark,
                    "applied_files": len(m.applied),
                    "rows": m.total_rows(),
                    "partitions": len(m.partitions),
                    "metrics": m.metrics,
                    "schema": [list(c) for c in m.schema],
                }
            )
        )
        return 0

    if args.cmd == "stats":
        from .pipelines.stats import lake_stats

        print(json.dumps(lake_stats(args.lake, args.version)))
        return 0

    if args.cmd == "gc":
        from .state.manifest import ManifestStore

        removed = ManifestStore(args.lake).gc(args.keep_versions, args.min_age_seconds)
        print(json.dumps({"removed": len(removed)}))
        return 0

    if args.cmd == "tail" and args.supervise:
        # the supervisor must hold NO Ray session: it has to outlive
        # child sessions that die to Ray-core faults
        from .pipelines.tail import supervised_tail

        stats = supervised_tail(
            args.changelog,
            args.lake,
            partitions=args.partitions,
            poll_seconds=args.poll_seconds,
            max_idle_rounds=(
                None if args.max_idle_rounds < 0 else args.max_idle_rounds
            ),
            maintain_every=args.maintain_every,
            max_restarts=args.max_restarts,
            num_cpus=args.num_cpus,
        )
        print(json.dumps(stats))
        return 0

    ray_owned = _ray_up(args.num_cpus)
    import ray

    try:
        if args.cmd == "profile":
            from .functions.aggregates import profile_table
            from .pipelines.cdc import read_table

            ds = read_table(args.lake, version=args.version)
            cols = (
                args.columns.split(",") if args.columns
                else list(ds.schema().names)
            )
            prof = profile_table(ds, columns=cols)
            print(prof.to_json(orient="records"))
        elif args.cmd == "ingest":
            from . import apply_changes, default_spec

            ms = apply_changes(
                args.changelog,
                args.lake,
                default_spec(num_partitions=args.partitions),
                commit_every_files=args.commit_every,
                detect_hot_keys=args.detect_hot_keys,
            )
            print(
                json.dumps(
                    {
                        "committed_versions": [m.version for m in ms],
                        "watermark": ms[-1].watermark if ms else None,
                        "metrics": ms[-1].metrics if ms else {},
                    }
                )
            )
        elif args.cmd == "tail":
            from . import default_spec
            from .pipelines.tail import tail as tail_loop

            stats = tail_loop(
                args.changelog,
                args.lake,
                default_spec(num_partitions=args.partitions),
                poll_seconds=args.poll_seconds,
                max_idle_rounds=(
                    None if args.max_idle_rounds < 0
                    else args.max_idle_rounds
                ),
                maintain_every=args.maintain_every,
            )
            print(json.dumps(stats))
        elif args.cmd == "replay":
            from . import default_spec
            from .pipelines.replay import replay

            ms = replay(
                args.changelog,
                args.lake,
                default_spec(num_partitions=args.partitions),
                from_version=args.from_version,
            )
            print(json.dumps({"committed_versions": [m.version for m in ms]}))
        elif args.cmd == "compact":
            from .pipelines.compact import compact

            m = compact(
                args.lake,
                target_rows_per_file=args.target_rows,
                purge_tombstones=args.purge_tombstones,
                purge_tombstones_before_us=args.purge_tombstones_before_us,
                purge_tombstones_auto=args.purge_tombstones_auto,
                drop_columns=tuple(args.drop_columns),
                cluster_by=tuple(args.cluster_by),
            )
            print(json.dumps({"version": m.version if m else None}))
        elif args.cmd == "expire":
            from .pipelines.forget import expire_rows

            ms = expire_rows(args.lake, args.older_than)
            print(
                json.dumps(
                    {
                        "committed_versions": [m.version for m in ms],
                        "tombstones": sum(
                            m.metrics.get("deletes", 0) for m in ms
                        ),
                    }
                )
            )
        elif args.cmd == "changes":
            from .pipelines.cdf import table_changes

            ds = table_changes(args.lake, args.from_version, args.to_version)
            if args.out:
                ds = ds.materialize()
                ds.write_parquet(args.out)
            n = ds.count()
            print(json.dumps({"changes": n, "out": args.out}))
        elif args.cmd == "maintain":
            from .pipelines.maintain import maintain

            res = maintain(
                args.lake,
                max_files_per_partition=args.max_files_per_partition,
                max_row_skew=args.max_row_skew,
                dry_run=args.dry_run,
            )
            print(json.dumps(res))
        elif args.cmd == "export":
            from .pipelines.export import export_snapshot

            res = export_snapshot(
                args.lake,
                args.out,
                version=args.version,
                max_rows_per_file=args.max_rows_per_file,
                layout=args.layout,
                fmt=args.format,
            )
            print(json.dumps(res))
        elif args.cmd == "tag":
            from .state.manifest import ManifestStore

            store = ManifestStore(args.lake)
            if args.delete:
                store.untag(args.name)
                print(json.dumps({"deleted": args.name}))
            else:
                v = store.tag(args.name, args.version)
                print(json.dumps({"tag": args.name, "version": v}))
        elif args.cmd == "diff":
            from .pipelines.diff import diff_summary

            out = diff_summary(
                args.a, args.b,
                version_a=args.version_a, version_b=args.version_b,
            )
            print(json.dumps({"diff": out, "identical": not out}))
        elif args.cmd == "scan":
            from .pipelines.dml import scan_where

            cols = args.columns.split(",") if args.columns else None
            ds = scan_where(args.lake, _where_arg(args), columns=cols)
            n = ds.count()
            rows = ds.limit(args.limit).to_pandas()
            print(json.dumps({
                "matched": int(n),
                "rows": json.loads(rows.to_json(orient="records",
                                                date_format="iso")),
            }))
        elif args.cmd == "add-column":
            from .pipelines.ddl import add_column

            m = add_column(args.lake, args.name, args.type)
            print(json.dumps({"version": m.version, "metrics": m.metrics}))
        elif args.cmd == "drop-column":
            from .pipelines.ddl import drop_column

            m = drop_column(args.lake, args.name)
            print(json.dumps({"version": m.version, "metrics": m.metrics}))
        elif args.cmd == "delete":
            from .pipelines.dml import delete_where

            ms = delete_where(args.lake, _where_arg(args))
            print(json.dumps({
                "committed": [m.version for m in ms],
                "metrics": ms[-1].metrics if ms else {},
            }))
        elif args.cmd == "update":
            from .pipelines.dml import update_where

            ms = update_where(
                args.lake, _where_arg(args), _parse_set(args.set)
            )
            print(json.dumps({
                "committed": [m.version for m in ms],
                "metrics": ms[-1].metrics if ms else {},
            }))
        elif args.cmd == "sql":
            from .pipelines.dml import delete_where, scan_where, update_where
            from .sqlpred import parse_statement

            stmt = parse_statement(args.statement)
            if stmt["kind"] == "delete":
                ms = delete_where(args.lake, stmt["where"])
                print(json.dumps({
                    "kind": "delete",
                    "committed": [m.version for m in ms],
                    "metrics": ms[-1].metrics if ms else {},
                }))
            elif stmt["kind"] == "update":
                ms = update_where(args.lake, stmt["where"], stmt["set"])
                print(json.dumps({
                    "kind": "update",
                    "committed": [m.version for m in ms],
                    "metrics": ms[-1].metrics if ms else {},
                }))
            else:  # select
                if stmt["where"] is None:
                    from .pipelines.cdc import read_table

                    ds = read_table(args.lake, columns=stmt["columns"])
                else:
                    ds = scan_where(
                        args.lake, stmt["where"], columns=stmt["columns"]
                    )
                n = ds.count()
                rows = ds.limit(stmt["limit"] or 20).to_pandas()
                print(json.dumps({
                    "kind": "select",
                    "matched": int(n),
                    "rows": json.loads(rows.to_json(orient="records",
                                                    date_format="iso")),
                }))
        elif args.cmd == "merge-branch":
            from .pipelines.branch import merge_branch

            res = merge_branch(args.branch, args.into, policy=args.policy)
            print(json.dumps(res))
        elif args.cmd == "clone":
            from .pipelines.clone import clone_lake

            m = clone_lake(args.src, args.dst, version=args.version)
            print(json.dumps({"version": m.version, "metrics": m.metrics}))
        elif args.cmd == "publish":
            from .pipelines.clone import publish_branch

            m = publish_branch(args.branch, args.dst)
            print(json.dumps({"version": m.version, "metrics": m.metrics}))
        elif args.cmd == "index":
            from .pipelines.search import refresh_search_index

            res = refresh_search_index(
                args.lake, args.index, num_partitions=args.partitions
            )
            print(json.dumps(res))
        elif args.cmd == "search":
            from .pipelines.search import search

            hits = search(args.index, args.term).to_pandas()
            if "conv_id" not in hits.columns:  # fully pruned -> no blocks
                hits = hits.reindex(columns=["conv_id", "n_occurrences"])
            print(
                json.dumps(
                    {
                        "term": args.term,
                        "hits": [
                            {"conv_id": c, "n": int(n)}
                            for c, n in zip(
                                hits["conv_id"], hits["n_occurrences"]
                            )
                        ],
                    }
                )
            )
        elif args.cmd == "forget":
            from .pipelines.forget import forget_keys

            ms = forget_keys(args.lake, list(args.keys))
            print(json.dumps({"commits": [m.version for m in ms]}))
        elif args.cmd == "redrive":
            from .pipelines.redrive import redrive as redrive_fn

            print(json.dumps(redrive_fn(args.lake, args.changelog)))
        elif args.cmd == "rebalance":
            from .pipelines.rebalance import rebalance

            m = rebalance(
                args.lake,
                num_partitions=args.partitions,
                hot_keys=tuple(args.hot_keys) if args.hot_keys is not None else None,
                hot_key_salt=args.hot_key_salt,
            )
            print(json.dumps({"version": m.version, "partitioning": m.partitioning}))
        elif args.cmd == "route":
            from . import default_spec
            from .pipelines.route import route_and_apply

            res = route_and_apply(
                args.changelog,
                args.lake_root,
                {t: default_spec(name=t, num_partitions=args.partitions) for t in args.types},
                type_col=args.type_col,
            )
            print(
                json.dumps(
                    {
                        "staged": res["staged"],
                        "versions": {
                            k: [m.version for m in v]
                            for k, v in res["manifests"].items()
                        },
                    }
                )
            )
        elif args.cmd == "dq":
            from .pipelines.dq import dq_gate, run_dq

            report = (
                dq_gate(args.lake)
                if args.gate
                else run_dq(args.lake, only_changed=args.only_changed)
            )
            print(json.dumps(report, default=str))
            return 0 if report.get("ok") else 1
    finally:
        if ray_owned:  # never tear down a session we merely joined
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
