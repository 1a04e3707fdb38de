"""Three-way branch merge: fold a diverged branch back into main.

``clone_lake`` branches a lake; ``publish_branch`` fast-forwards main
to a branch ONLY while main has not moved (the write-audit-publish
workflow). This module closes the remaining git-like gap: main and the
branch have BOTH advanced since the fork, and the branch's changes
must land on main anyway — ``merge_branch`` is the three-way merge,
built entirely from the engine's own primitives (raw snapshot reads,
one key-bucketed shuffle, a staged changelog, ``apply_changes``).

Construction (all pruned to partitions whose file lists changed):

* BASE  = the fork snapshot (the branch's version 1 — byte-identical
  to main at the recorded ``source_version``),
* B     = the branch's CURRENT state, read RAW (tombstones kept,
  ``(ts, _seq)`` merge credentials included),
* M     = main's CURRENT state, read the same way.

The three sides union into ONE key-bucketed shuffle; each bucket
resolves its keys vectorized in pandas. A key participates only if the
branch changed it (visibility or payload differs from BASE); if main
did not also change it, the branch row wins by the engine's own LWW
invariant (a lake's current row only ever advances in ``(ts, _seq)``,
so the branch's evolved row outranks the fork row main still holds).
Keys changed on BOTH sides to different states are conflicts, resolved
by ``policy``:

* ``"lww"`` (default) — the lake's native resolution: compare the two
  sides' authentic ``(ts, _seq)`` credentials (tombstones carry
  theirs); the winner is whatever a single lake that had seen both
  change streams would hold, so merging with ``lww`` equals replaying
  the branch's changelog onto main.
* ``"fail"`` — refuse: raise ``MergeConflictError`` with a count and a
  bounded key sample; main is untouched (conflict detection runs
  before any staging).
* ``"ours"`` — main wins: conflicting branch changes are dropped.
* ``"theirs"`` — the branch wins: when main's row outranks the
  branch's, the branch row is restamped (``ts`` advanced to main's,
  ``seq`` past both) so it wins the kernel's LWW — the same thing a
  user re-submitting their edit at merge time would produce. An LWW
  lake cannot resurrect an older timestamp any other way; the restamp
  count is reported as ``n_forced``.

Identical concurrent edits (both sides moved a key to the same visible
state) are recognized and skipped, not flagged.

Exactly-once: survivors stage under
``<main>/_merges/b<branch-id>-v<bv>-onto-v<mv>/`` behind the standard
``_STAGED`` marker (``sources.changelog.stage_changes``) and land via
``apply_changes`` — object-level idempotency makes a re-run of the
same merge a no-op, and a crash at any point resumes cleanly.

Scale shape: cost is O(changed partitions) to read and O(changed keys)
through the one shuffle — never O(lake). The resolved delta
materializes once (delta-sized) so conflicts, stats and staging do not
re-execute the read.

Reference parity: beyond-reference — the reference's only multi-writer
story is SQS redelivery into one serial consumer
(``infra/terraform/modules/sqs_queue/main.tf:43-46``); it has no
branch, no merge, no conflict detection.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.windows import _buckets_for_cluster, _key_buckets
from ..sources.changelog import stage_changes
from ..state.lakefs import lakefs
from ..state.manifest import ManifestStore, manifest_payload_schema

#: Restamped rows' seq must outrank both sides' credentials; merge
#: commits are a later epoch of the log, far above any event seq.
_FORCE_SEQ_BASE = 1 << 62

_SIDE = "_mb_side"
_BUCKET = "_mb_cb"


class MergeConflictError(RuntimeError):
    """policy="fail" found keys changed on both sides to different
    states. ``n_conflicts`` is the exact count; ``sample`` is a bounded
    list of {key cols..., branch_ts, main_ts} dicts."""

    def __init__(self, n_conflicts: int, sample: list[dict]):
        self.n_conflicts = n_conflicts
        self.sample = sample
        keys = "; ".join(
            ",".join(f"{k}={v}" for k, v in row.items()) for row in sample[:5]
        )
        super().__init__(
            f"{n_conflicts} key(s) changed on both branch and main since "
            f"the fork (first: {keys}); re-run with policy='lww', 'ours' "
            "or 'theirs', or resolve on the branch and re-merge"
        )


def _clone_info(branch_dir: str) -> dict:
    bfs = lakefs(branch_dir)
    p = bfs.full("_manifest", "CLONE.json")
    if not bfs.exists(p):
        raise ValueError(
            f"{branch_dir} has no clone provenance (_manifest/CLONE.json); "
            "merge_branch only merges lakes created by clone_lake"
        )
    return json.loads(bfs.read_text(p))


def _canon(path: str) -> str:
    return path if "://" in path else os.path.abspath(path)


def _changed_pids(a_parts: dict, b_parts: dict) -> set:
    return {
        pid
        for pid in set(a_parts) | set(b_parts)
        if a_parts.get(pid) != b_parts.get(pid)
    }


def _read_side(
    lake_dir: str, m, pids: set, side: str, nb: int, key0: str,
    all_cols: list[str],
):
    """Raw snapshot read (tombstones + (ts,_seq) credentials) of the
    given partitions, tagged with the side and the key bucket, and
    conformed to the UNION column set (a side that predates an evolved
    column carries it as nulls, like any old file)."""
    from .cdc import _read_lake_partitions

    sub = {p: m.partitions[p] for p in pids if m.partitions.get(p)}
    if not sub:
        return None
    ds = _read_lake_partitions(
        lake_dir, sub, m, include_internal=True, keep_tombstones=True
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        for c in all_cols:
            if c not in b.columns:
                b[c] = None
        b = b[all_cols]
        b[_SIDE] = side
        b[_BUCKET] = _key_buckets(b[key0], nb)
        return b

    return ds.map_batches(tag, batch_format="pandas")


def _na_eq(a: pd.Series, b: pd.Series) -> pd.Series:
    both_na = a.isna() & b.isna()
    with np.errstate(invalid="ignore"):
        eq = a == b
    return (eq & ~(a.isna() | b.isna())) | both_na


def merge_branch(
    branch_dir: str,
    main_dir: str,
    *,
    policy: str = "lww",
    max_conflict_sample: int = 20,
    **apply_kwargs,
) -> dict:
    """Merge the branch's changes since its fork into main. Returns
    ``{"fork_version", "branch_version", "main_version", "merged",
    "deletes", "n_conflicts", "n_identical", "n_forced", "committed"}``.

    ``policy``: "lww" | "fail" | "ours" | "theirs" (see module doc).
    Extra kwargs pass through to ``apply_changes`` (commit cadence,
    exchange strategy, ...).
    """
    if policy not in ("lww", "fail", "ours", "theirs"):
        raise ValueError(f"unknown merge policy {policy!r}")

    info = _clone_info(branch_dir)
    if _canon(info.get("source", "")) != _canon(main_dir):
        raise ValueError(
            f"{branch_dir} was branched from {info.get('source')!r}, "
            f"not {main_dir}; refusing to merge"
        )
    fork = int(info["source_version"])

    bst, mst = ManifestStore(branch_dir), ManifestStore(main_dir)
    bm, mm = bst.load(), mst.load()
    if bm is None or mm is None:
        raise FileNotFoundError("both branch and main must have commits")
    base_m = bst.load(1)  # the fork snapshot travels with the branch
    fork_m = mst.load(fork)
    if fork_m is None:
        raise ValueError(
            f"main no longer retains fork version {fork} (gc'd?); "
            "re-branch from CURRENT instead"
        )

    summary = {
        "fork_version": fork,
        "branch_version": bm.version,
        "main_version": mm.version,
        "merged": 0,
        "deletes": 0,
        "n_conflicts": 0,
        "n_identical": 0,
        "n_forced": 0,
        "committed": [],
    }
    if bm.version == 1:
        return summary  # branch never diverged: nothing to merge

    # partitioning must agree or keys would land in different buckets
    bp = {k: v for k, v in bm.partitioning.items() if k != "merge_policy"}
    mp = {k: v for k, v in mm.partitioning.items() if k != "merge_policy"}
    if bp != mp:
        raise RuntimeError(
            "branch and main partitioning diverged "
            f"({bp} vs {mp}); a rebalanced branch needs a full replay, "
            "not a merge"
        )

    key_cols = list(mm.partitioning.get("key_cols", ("conv_id", "turn_idx")))
    pids = _changed_pids(base_m.partitions, bm.partitions) | _changed_pids(
        fork_m.partitions, mm.partitions
    )
    if not pids:
        return summary

    # payload columns: union of the two sides' schemas (additive
    # evolution on either side since the fork)
    b_payload = manifest_payload_schema(bm)
    m_payload = manifest_payload_schema(mm)
    payload_cols = list(
        dict.fromkeys([*m_payload.names, *b_payload.names])
    )
    val_cols = [c for c in payload_cols if c not in key_cols]

    nb = _buckets_for_cluster()
    key0 = key_cols[0]
    all_cols = [*payload_cols, "_deleted", "_seq"]
    sides = [
        s
        for s in (
            _read_side(branch_dir, base_m, pids, "base", nb, key0, all_cols),
            _read_side(branch_dir, bm, pids, "b", nb, key0, all_cols),
            _read_side(main_dir, mm, pids, "m", nb, key0, all_cols),
        )
        if s is not None
    ]
    union = sides[0]
    for s in sides[1:]:
        union = union.union(s)

    out_cols = (
        ["op", "seq", *key_cols, *val_cols, "branch_ts", "main_ts",
         "n_clean", "n_conflict", "n_identical", "n_forced"]
    )

    def _empty_out() -> pd.DataFrame:
        d: dict = {"op": pd.Series(dtype=object),
                   "seq": pd.Series(dtype="int64")}
        for c in key_cols + val_cols:
            d[c] = pd.Series(dtype=object)
        for c in ("ts", "branch_ts", "main_ts"):
            d[c] = pd.Series(dtype="datetime64[us]")
        for c in ("n_clean", "n_conflict", "n_identical", "n_forced"):
            d[c] = pd.Series(dtype="int64")
        return pd.DataFrame(d)[out_cols]

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or _SIDE not in g.columns:
            return _empty_out()
        cols = key_cols + [c for c in val_cols if c in g.columns] + [
            "_deleted", "_seq"
        ]
        frames = {}
        for side in ("base", "b", "m"):
            f = g[g[_SIDE] == side][cols].set_index(key_cols)
            frames[side] = f.add_suffix(f"__{side}")
        j = frames["base"].join(frames["b"], how="outer").join(
            frames["m"], how="outer"
        )
        if len(j) == 0:
            return _empty_out()

        def present(side: str) -> pd.Series:
            return j[f"_seq__{side}"].notna()

        def visible(side: str) -> pd.Series:
            dele = j[f"_deleted__{side}"]
            return present(side) & ~dele.fillna(True).astype(bool)

        vis = {s: visible(s) for s in ("base", "b", "m")}
        have_vals = [c for c in val_cols if f"{c}__b" in j.columns]

        def payload_eq(s1: str, s2: str) -> pd.Series:
            eq = pd.Series(True, index=j.index)
            for c in have_vals:
                eq &= _na_eq(j[f"{c}__{s1}"], j[f"{c}__{s2}"])
            return eq

        def changed_vs_base(s: str) -> pd.Series:
            diff_vis = vis[s] != vis["base"]
            both_vis = vis[s] & vis["base"]
            return diff_vis | (both_vis & ~payload_eq(s, "base"))

        b_changed = changed_vs_base("b")
        m_changed = changed_vs_base("m")
        work = j[b_changed].copy()
        if len(work) == 0:
            stats = _empty_out().iloc[0:0]
            return stats
        w_m_changed = m_changed[b_changed]
        w_vis_b = vis["b"][b_changed]
        w_vis_m = vis["m"][b_changed]

        same_state = (w_vis_b == w_vis_m) & (
            ~w_vis_b | payload_eq("b", "m")[b_changed]
        )
        identical = w_m_changed & same_state
        conflict = w_m_changed & ~same_state
        clean = ~w_m_changed

        # credentials (tombstones carry theirs; absent rows lose)
        def creds(side: str):
            ts = pd.to_datetime(work[f"ts__{side}"]) if f"ts__{side}" in work \
                else pd.Series(pd.NaT, index=work.index)
            seq = work[f"_seq__{side}"]
            return ts, seq

        b_ts, b_seq = creds("b")
        m_ts, m_seq = creds("m")
        # lexicographic (ts, _seq): NaT/absent ranks lowest
        b_wins = (
            (b_ts > m_ts)
            | ((b_ts == m_ts) & (b_seq.fillna(-1) > m_seq.fillna(-1)))
            | (m_ts.isna() & b_ts.notna())
        )

        keep = clean.copy()
        forced = pd.Series(False, index=work.index)
        if policy == "lww":
            keep |= conflict & b_wins
        elif policy == "theirs":
            keep |= conflict
            forced = conflict & ~b_wins
        # "ours"/"fail": conflicting branch rows never stage

        rows = work[keep]
        n_rows = len(rows)
        out = pd.DataFrame(index=range(n_rows))
        rvis_b = w_vis_b[keep].to_numpy()
        out["op"] = np.where(rvis_b, "U", "D")
        # branch-ABSENT rows (tombstone purged by a branch compact
        # between fork and merge) synthesize a delete: restamp it ONE
        # ABOVE the base credentials, not equal to them — an event with
        # (base ts, base _seq) exactly ties the fork row main still
        # holds and whether the delete lands becomes sort-order luck.
        # Branch TOMBSTONES carry their own _seq__b and skip this.
        rb_seq = rows["_seq__b"].fillna(rows["_seq__base"] + 1).fillna(1)
        rm_seq = rows["_seq__m"].fillna(-1)
        rforced = forced[keep].to_numpy()
        # saturating restamp: an input seq already in the forced epoch
        # (a prior 'ours'/'theirs' merge in this lineage) keeps its
        # value — adding the base again would overflow int64 and the
        # wrapped-negative seq would LOSE the LWW it must win
        mx = np.maximum(rb_seq.to_numpy(), rm_seq.to_numpy()).astype(np.int64)
        out["seq"] = np.where(
            rforced,
            np.where(mx >= _FORCE_SEQ_BASE, mx, _FORCE_SEQ_BASE + mx),
            rb_seq.to_numpy(),
        ).astype(np.int64)
        keys_df = rows.index.to_frame(index=False)
        for i, c in enumerate(key_cols):
            out[c] = keys_df.iloc[:, i].to_numpy()
        for c in have_vals:
            if c == "ts":
                continue
            vals = rows[f"{c}__b"].to_numpy()
            out[c] = np.where(rvis_b, vals, None)
        # ts: the branch row's own ts (tombstones carry theirs; a
        # restamped row advances to main's so the kernel's LWW accepts)
        r_bts = b_ts[keep]
        r_mts = m_ts[keep]
        ts_out = r_bts.fillna(rows["ts__base"] if "ts__base" in rows
                              else pd.NaT)
        ts_out = ts_out.where(~pd.Series(rforced, index=ts_out.index)
                              | (ts_out >= r_mts), r_mts)
        out["ts"] = pd.to_datetime(ts_out.to_numpy()).astype("datetime64[us]")
        out["branch_ts"] = pd.NaT
        out["main_ts"] = pd.NaT
        for c in ("n_clean", "n_conflict", "n_identical", "n_forced"):
            out[c] = 0

        parts = [out]
        n_conf = int(conflict.sum())
        if n_conf and policy == "fail":
            cw = work[conflict]
            cf = pd.DataFrame(index=range(len(cw)))
            cf["op"] = "C"
            cf["seq"] = 0
            ck = cw.index.to_frame(index=False)
            for i, c in enumerate(key_cols):
                cf[c] = ck.iloc[:, i].to_numpy()
            for c in have_vals:
                if c != "ts":
                    cf[c] = None
            cf["ts"] = pd.NaT
            cf["branch_ts"] = pd.to_datetime(
                b_ts[conflict].to_numpy()).astype("datetime64[us]")
            cf["main_ts"] = pd.to_datetime(
                m_ts[conflict].to_numpy()).astype("datetime64[us]")
            for c in ("n_clean", "n_conflict", "n_identical", "n_forced"):
                cf[c] = 0
            parts.append(cf)

        # stats row: real-dtype key values (first key in the bucket) so
        # every bucket's Arrow block carries identical column types
        srow = {c: None for c in out_cols}
        first_key = work.index[0]
        if len(key_cols) == 1:
            first_key = (first_key,)
        for i, c in enumerate(key_cols):
            srow[c] = first_key[i]
        srow.update(
            op="S", seq=0, ts=pd.NaT, branch_ts=pd.NaT, main_ts=pd.NaT,
            n_clean=int(clean.sum()), n_conflict=n_conf,
            n_identical=int(identical.sum()), n_forced=int(forced.sum()),
        )
        parts.append(pd.DataFrame([srow]))
        res = pd.concat(parts, ignore_index=True)
        res = res.reindex(columns=out_cols)
        res["op"] = res["op"].astype(object)
        res["seq"] = res["seq"].astype("int64")
        for c in ("ts", "branch_ts", "main_ts"):
            res[c] = pd.to_datetime(res[c]).astype("datetime64[us]")
        for c in ("n_clean", "n_conflict", "n_identical", "n_forced"):
            res[c] = res[c].fillna(0).astype("int64")
        return res

    resolved = (
        union.groupby(_BUCKET)
        .map_groups(resolve, batch_format="pandas")
        .materialize()  # delta-sized: changed keys only, never the lake
    )

    def _only(ops: tuple):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["op"].isin(ops)]

        return fn

    stats_rows = resolved.map_batches(
        _only(("S",)), batch_format="pandas"
    ).to_pandas()
    if len(stats_rows):
        summary["n_conflicts"] = int(stats_rows["n_conflict"].sum())
        summary["n_identical"] = int(stats_rows["n_identical"].sum())
        summary["n_forced"] = int(stats_rows["n_forced"].sum())

    if policy == "fail" and summary["n_conflicts"]:
        sample = (
            resolved.map_batches(_only(("C",)), batch_format="pandas")
            .limit(max_conflict_sample)
            .to_pandas()
        )
        raise MergeConflictError(
            summary["n_conflicts"],
            sample[[*key_cols, "branch_ts", "main_ts"]].to_dict("records"),
        )

    survivors = resolved.map_batches(
        _only(("U", "D")), batch_format="pandas"
    )
    n_surv = survivors.count()
    if n_surv == 0:
        return summary

    chlog_cols = ["op", "seq", *key_cols, *val_cols]

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[chlog_cols]

    branch_id = os.path.basename(os.path.normpath(branch_dir)) or "branch"
    stage_dir = lakefs(main_dir).full(
        "_merges", f"b-{branch_id}-v{bm.version}-onto-v{mm.version}"
    )
    files = stage_changes(
        survivors.map_batches(project, batch_format="pandas"), stage_dir
    )

    from .cdc import apply_changes

    committed = apply_changes(files, main_dir, None, **apply_kwargs)
    summary["merged"] = int(n_surv)
    summary["committed"] = [m.version for m in committed]
    if committed:
        summary["deletes"] = sum(
            m.metrics.get("deletes", 0) for m in committed
        )
    return summary
