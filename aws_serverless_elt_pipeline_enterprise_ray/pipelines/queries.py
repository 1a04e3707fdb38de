"""Driver-verifiable query suite: every operator family from
SURVEY.md §2 exposed as a callable(sf_dir) plus (where expressible) a
DuckDB oracle SQL string over the same parquet tables.

The CDC queries derive a deterministic change stream FROM the shared
``events`` table (op/seq/key/payload are pure functions of event
columns), so the full engine path - write changelog files, tail,
normalize, salted-hash shuffle, LWW merge actors, manifest commit,
read back - can be verified value-for-value against a pure-SQL
reduction of the same derivation. Column names match the SQL exactly.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

SCRATCH = "/tmp/aws_serverless_elt_pipeline_enterprise_ray_scratch"

# ---------------------------------------------------------------------------
# shared derivation: events -> transcript change stream
# ---------------------------------------------------------------------------

#: SQL half of the derivation - MUST stay in lockstep with _derive_batch.
CH_SQL = """
  SELECT
    CASE WHEN event_id % 10 = 9 THEN 'D'
         WHEN event_id % 10 >= 6 THEN 'U'
         ELSE 'I' END AS op,
    event_id AS seq,
    'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(event_id % 40 AS INTEGER) AS turn_idx,
    event_type AS role,
    props AS text,
    CAST(NULL AS VARCHAR) AS tool,
    ts
  FROM events
"""

FINAL_SQL = f"""
  WITH ch AS ({CH_SQL}),
  ranked AS (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
    FROM ch
  )
  SELECT conv_id, turn_idx, role, text, tool, ts
  FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def _derive_batch(batch: pa.Table, inject_bad: bool = False) -> pa.Table:
    """Arrow half of the derivation (vectorized; mirrors CH_SQL)."""
    eid = batch["event_id"].to_numpy(zero_copy_only=False)
    uid = batch["user_id"].to_numpy(zero_copy_only=False)
    mod = eid % 10
    op = np.where(mod == 9, "D", np.where(mod >= 6, "U", "I")).astype(object)
    if inject_bad:
        op = np.where(eid % 97 == 0, "X", op).astype(object)
    conv = np.char.add("conv_", uid.astype("U20")).astype(object)
    return pa.table(
        {
            "op": pa.array(op, pa.string()),
            "seq": pa.array(eid, pa.int64()),
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array((eid % 40).astype(np.int32), pa.int32()),
            "role": batch["event_type"],
            "text": batch["props"],
            "tool": pa.nulls(len(batch), pa.string()),
            "ts": batch["ts"],
        }
    )


def _events(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )


def _changes_ds(sf_dir: str, inject_bad: bool = False) -> rd.Dataset:
    return _events(sf_dir).map_batches(
        lambda b: _derive_batch(b, inject_bad), batch_format="pyarrow"
    )


def _scratch(name: str) -> str:
    d = os.path.join(SCRATCH, f"{name}-{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    return d


#: Derived-changelog fixture cache: the changelog for a given
#: (sf_dir, inject_bad, n_files) is deterministic and READ-ONLY input
#: (every query applies it into its own fresh lake), so a full-suite
#: sweep derives each variant once instead of once per cdc_* query.
_CHANGELOG_CACHE: dict = {}


def _write_changelog(
    sf_dir: str, inject_bad: bool = False, n_files: int = 1
) -> str:
    key = (sf_dir, inject_bad, n_files)
    hit = _CHANGELOG_CACHE.get(key)
    if hit is not None and os.path.isdir(hit):
        return hit
    out = _scratch("changes")
    ds = _changes_ds(sf_dir, inject_bad)
    if n_files > 1:
        ds = ds.repartition(n_files)
    ds.write_parquet(out)
    _CHANGELOG_CACHE[key] = out
    return out


def _spec(sf_dir: str):
    from ..schema import default_spec

    # small partition counts at test scale; the lake fixes P at first commit
    return default_spec(num_partitions=16)


def _final_df(lake_dir: str) -> pd.DataFrame:
    from .cdc import read_table

    df = read_table(lake_dir).to_pandas()
    if "conv_id" not in df.columns:  # fully-pruned empty result
        df = df.reindex(columns=["conv_id", "turn_idx", "role", "text",
                                 "tool", "ts"])
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# CDC family
# ---------------------------------------------------------------------------


def q_cdc_apply_full(sf_dir: str):
    """Full engine e2e (SURVEY §3.1): derived changelog -> files ->
    tail -> normalize -> salted shuffle -> LWW merge -> commit -> read."""
    from .cdc import apply_changes

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    return _final_df(lake)


def q_cdc_apply_objstore(sf_dir: str):
    """The same full e2e on the rename-free OBJECT-STORE backend
    (``state/lakefs.py``): changelog discovery, footer peeks, the COW
    merge, the manifest commit (single-step conditional create) and the
    lake read all go through the s3sim:// put/list/delete contract -
    the multi-node story where shared storage is S3, not POSIX. Final
    state is byte-identical to the POSIX path and hash-checked against
    the same SQL oracle."""
    from .cdc import apply_changes

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    changes_uri = "s3sim://" + changes.lstrip("/")
    lake_uri = "s3sim://" + lake.lstrip("/")
    apply_changes(changes_uri, lake_uri, _spec(sf_dir), commit_every_files=2)
    return _final_df(lake_uri)


def q_cdc_apply_inflight(sf_dir: str):
    """Full e2e through the multi-round IN-FLIGHT exchange
    (``stages/exchange.py``): tiny rounds force each partition to fold
    its map shards many times within the commit (the
    bigger-than-memory commit shape), and the final state must stay
    hash-identical to the sort-based path's oracle."""
    import os as _os

    from .cdc import apply_changes

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    old = _os.environ.get("GRAFT_EXCHANGE_FANIN")
    _os.environ["GRAFT_EXCHANGE_FANIN"] = "4"
    try:
        apply_changes(changes, lake, _spec(sf_dir), exchange="inflight")
    finally:
        if old is None:
            _os.environ.pop("GRAFT_EXCHANGE_FANIN", None)
        else:
            _os.environ["GRAFT_EXCHANGE_FANIN"] = old
    return _final_df(lake)


def q_cdc_apply_debezium(sf_dir: str):
    """Full e2e from the DEBEZIUM wire format (the standard open CDC
    envelope): the derived change stream is re-serialized as wrapped
    Debezium JSON events (op c/u/d, before-image deletes, source.lsn
    as the total-order marker), read back by the compat reader, and
    applied through the ordinary normalize/merge/commit path - final
    state hash-matches the same FINAL_SQL oracle as the parquet path.
    Fixture serialization is driver-side (it IS the fixture); the read
    + apply are the distributed engine path."""
    import glob
    import json as _json

    import pyarrow.parquet as _pq

    from ..sources.changelog import read_changelog_debezium
    from .cdc import apply_dataset

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    tbl = pa.concat_tables(
        [_pq.read_table(p) for p in sorted(glob.glob(os.path.join(changes, "*.parquet")))]
    )
    df = tbl.to_pandas()
    df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    opmap = {"I": "c", "U": "u", "D": "d"}
    lines = []
    fields = [c for c in df.columns if c not in ("op", "seq")]
    for r in df.itertuples(index=False):
        d = r._asdict()
        body = {c: (None if pd.isna(d[c]) else d[c]) for c in fields}
        op = opmap[d["op"]]
        lines.append(
            _json.dumps(
                {
                    "payload": {
                        "op": op,
                        "before": body if op == "d" else None,
                        "after": None if op == "d" else body,
                        "source": {"lsn": int(d["seq"])},
                        "ts_ms": 0,
                    }
                }
            )
        )
    dbz_dir = _scratch("dbz")
    with open(os.path.join(dbz_dir, "events.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")

    ds = read_changelog_debezium(
        sorted(glob.glob(os.path.join(dbz_dir, "*.jsonl")))
    )
    apply_dataset(ds, lake, _spec(sf_dir), label="dbz")
    return _final_df(lake)


def q_cdc_apply_orc(sf_dir: str):
    """Full e2e from ORC change drops (the Hive-lineage columnar bronze
    format): the derived change stream is re-serialized as ORC files
    with a tiny stripe size (forcing the STRIPE-parallel read path to
    do real fan-out), read back by ``read_changelog_orc``, and applied
    through the ordinary normalize/merge/commit path — final state
    hash-matches the same FINAL_SQL oracle as the parquet path.
    Fixture serialization is driver-side (it IS the fixture); the read
    + apply are the distributed engine path."""
    import glob

    import pyarrow.parquet as _pq
    from pyarrow import orc as _orc

    from ..sources.changelog import read_changelog_orc
    from .cdc import apply_dataset

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    orc_dir = _scratch("orc")
    orc_files = []
    for p in sorted(glob.glob(os.path.join(changes, "*.parquet"))):
        tbl = _pq.read_table(p)
        out = os.path.join(
            orc_dir, os.path.basename(p).replace(".parquet", ".orc")
        )
        _orc.write_table(tbl, out, stripe_size=64 * 1024)
        orc_files.append(out)

    ds = read_changelog_orc(orc_files)
    apply_dataset(ds, lake, _spec(sf_dir), label="orc")
    return _final_df(lake)


def q_cdc_point_lookup(sf_dir: str):
    """Pruned point lookup: hash-partition pruning (conv_partitions)
    plus file-level zone-map pruning inside each partition - the read
    path a key lookup takes on a 100-TB lake. Small files force many
    zone-mapped chunks per partition so the second pruning level does
    real work."""
    from .cdc import apply_changes, read_conversations

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir), max_rows_per_file=500)
    targets = ["conv_3", "conv_7", "conv_11"]
    df = read_conversations(lake, targets).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def q_cdc_range_scan(sf_dir: str):
    """Zone-map-pruned key-range scan: hash partitioning can't prune a
    range, but per-file [key_min, key_max] can — small files force many
    zone-mapped chunks so the pruning does real work."""
    from .cdc import apply_changes, read_key_range

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir), max_rows_per_file=500)
    df = read_key_range(lake, "conv_2", "conv_39").to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def q_cdc_time_range(sf_dir: str):
    """Time-ranged scan of the current state (middle half of the event
    ts span): per-file ts zone maps skip whole files where LWW-safe
    (key-disjoint files only - delta runs are read in full), then an
    exact per-batch filter. Bounds derive from integer µs arithmetic
    both engines share."""
    from .cdc import apply_changes, read_time_range

    import pyarrow.parquet as pq

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir), max_rows_per_file=500)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["ts"])["ts"]
    mm = pc.min_max(t)
    lo, hi = mm["min"].value, mm["max"].value
    a, b = lo + (hi - lo) // 4, lo + (3 * (hi - lo)) // 4
    df = read_time_range(
        lake, pd.Timestamp(a, unit="us"), pd.Timestamp(b, unit="us")
    ).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def q_cdc_search_index(sf_dir: str):
    """Incrementally-maintained inverted index: the index LAKE is
    refreshed from the source lake's change data feed after each of two
    source commits (the second refresh diffs term multisets per
    affected conversation and emits U/D rows), and must equal a
    from-scratch SQL index of the final state."""
    import glob

    from .cdc import apply_changes
    from .search import read_index, refresh_search_index

    changes = _write_changelog(sf_dir, n_files=4)
    lake, idx = _scratch("lake"), _scratch("idx")
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    spec = _spec(sf_dir)
    apply_changes(files[: len(files) // 2], lake, spec)
    refresh_search_index(lake, idx, num_partitions=8)
    apply_changes(changes, lake, spec)
    refresh_search_index(lake, idx, num_partitions=8)
    df = (
        read_index(idx)
        .to_pandas()
        .sort_values(["term", "conv_id"])
        .reset_index(drop=True)
    )
    df["n_occurrences"] = df["n_occurrences"].astype("int64")
    return df[["term", "conv_id", "n_occurrences"]]


def q_cdc_expire(sf_dir: str):
    """Retention expiry: every current row at or before the mid-span
    cutoff is tombstoned through the ordinary exactly-once apply
    (discovery via the ts-zone-mapped time scan); the remaining state
    must equal the SQL final state filtered to ts > cutoff."""
    import pyarrow.parquet as pq

    from .cdc import apply_changes
    from .forget import expire_rows

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["ts"])["ts"]
    mm = pc.min_max(t)
    lo, hi = mm["min"].value, mm["max"].value
    cutoff = lo + (hi - lo) // 2
    expire_rows(lake, pd.Timestamp(cutoff, unit="us"), _spec(sf_dir))
    return _final_df(lake)


def q_cdc_predicate_scan(sf_dir: str):
    """Generic predicate-pruned scan (turn_idx BETWEEN 5 AND 9): per-
    file zone maps over every primitive column let any range predicate
    skip files, with the same key-disjointness LWW-safety rule as the
    time scan; rows then exact-filter per batch."""
    from .cdc import apply_changes, read_where

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir), max_rows_per_file=500)
    df = read_where(lake, "turn_idx", 5, 9).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def q_cdc_clustered_scan(sf_dir: str):
    """Z-order clustering end-to-end: apply, compact with
    cluster_by=("turn_idx", "ts") (rank-interleaved rewrite, shared
    run id), then the same predicate scan — pruning now rides the
    single-run safety proof (key ranges overlap after the reorder) and
    the result must still equal the SQL reduction exactly."""
    from .cdc import apply_changes, read_where
    from .compact import compact

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir), max_rows_per_file=500)
    compact(
        lake, target_rows_per_file=500, min_files_to_compact=99,
        cluster_by=("turn_idx", "ts"),
    )
    df = read_where(lake, "turn_idx", 5, 9).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def q_cdc_coalesce_merge(sf_dir: str):
    """Column-level merge policy: U events carry only their text (role
    nulled), so the final state keeps each key's last non-null role
    AND last non-null text independently - the partial-update CDC
    semantics LWW cannot express. Deletes reset the key. Verified
    against a DuckDB mirror built from last() FILTER aggregates over
    the delete horizon."""
    from .cdc import apply_changes

    out = _scratch("coalesce-ch")
    ds = _changes_ds(sf_dir)

    def null_role_on_update(b: pa.Table) -> pa.Table:
        mask = pc.equal(b["op"], "U")
        role = pc.if_else(mask, pa.nulls(len(b), pa.string()), b["role"])
        return b.set_column(b.column_names.index("role"), "role", role)

    ds.map_batches(null_role_on_update, batch_format="pyarrow").write_parquet(out)
    lake = _scratch("lake")
    from ..schema import default_spec

    apply_changes(
        out, lake, default_spec(num_partitions=16, merge_policy="coalesce")
    )
    return _final_df(lake)


def q_cdc_incremental_rollup(sf_dir: str):
    """Incremental materialized view: a per-conversation aggregate lake
    maintained from the change data feed across two source commits -
    CDF names the touched conversations, the pruned point-read path
    re-aggregates only those, and the result is applied to the rollup
    lake as an ordinary CDC upsert. Must equal a from-scratch rollup of
    the final state (the oracle)."""
    from .cdc import apply_changes
    from .matview import read_rollup, refresh_rollup

    changes, lake = _write_changelog(sf_dir, n_files=4), _scratch("lake")
    rollup = _scratch("rollup")
    files = sorted(
        os.path.join(changes, f)
        for f in os.listdir(changes)
        if f.endswith(".parquet")
    )
    spec = _spec(sf_dir)
    apply_changes(files[:2], lake, spec)
    refresh_rollup(lake, rollup, user_role="click")
    apply_changes(files[2:], lake, spec)
    refresh_rollup(lake, rollup, user_role="click")
    df = read_rollup(
        rollup,
        columns=["conv_id", "n_turns", "n_user_turns", "n_chars", "last_ts"],
    ).to_pandas()
    return df.sort_values("conv_id").reset_index(drop=True)


def q_cdc_apply_chunked_resume(sf_dir: str):
    """Micro-batched commits + resume: apply a prefix, then resume over
    the full directory (checkpoint skips applied files). Must equal the
    one-shot application (T1/D1 idempotency semantics)."""
    import glob

    from .cdc import apply_changes

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    apply_changes(files[: max(1, len(files) // 2)], lake, _spec(sf_dir))
    apply_changes(changes, lake, _spec(sf_dir), commit_every_files=2)
    return _final_df(lake)


def q_cdc_apply_delta_lsm(sf_dir: str):
    """LSM delta-append path under the oracle gate: bulk-load most of
    the stream, then apply the tail with a high delta threshold so the
    merge APPENDS run files; the merged read must still equal the pure
    SQL reduction."""
    import glob

    from .cdc import apply_changes

    changes, lake = _write_changelog(sf_dir, n_files=10), _scratch("lake")
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    apply_changes(files[:-2], lake, _spec(sf_dir))
    ms = apply_changes(
        changes, lake, _spec(sf_dir), commit_every_files=1, delta_threshold=0.95
    )
    assert any(m.metrics.get("delta_appends", 0) for m in ms), \
        "tail should append delta runs"
    return _final_df(lake)


def q_cdc_replay_idempotent(sf_dir: str):
    """Apply, then full replay from an empty checkpoint (reference
    replay semantics, workflows/replay/app.py:36-96): state must be
    reproduced exactly."""
    from .cdc import apply_changes
    from .replay import replay

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    replay(changes, lake, _spec(sf_dir))
    return _final_df(lake)


def q_cdc_normalize(sf_dir: str):
    """M1-M3 normalization projection of the raw change stream."""
    from ..schema import default_spec, normalize_batch

    spec = default_spec()
    ds = _changes_ds(sf_dir).map_batches(
        lambda b: normalize_batch(b, spec).drop_columns(["_bad"]),
        batch_format="pyarrow",
    )
    return ds.sort("seq").to_pandas()


def q_cdc_cojoin(sf_dir: str):
    """Storage-partitioned join: transcripts lake ⋈ conv-dimension
    lake, both hash-partitioned on conv_id with the same P — one task
    per partition pair, ZERO exchange (the two-big-tables join that
    hash_join would shuffle twice for)."""
    from .cdc import apply_changes
    from .cojoin import copartitioned_join

    # lake A: the standard transcripts stream
    changes_a, lake_a = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes_a, lake_a, _spec(sf_dir))

    # lake B: conv-level dimension (turn_idx pinned 0 -> one row per
    # conv after LWW; role = the conv's latest event_type)
    def derive_b(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        op = np.where(eid % 5 >= 3, "U", "I").astype(object)
        conv = np.char.add("conv_", uid.astype("U20")).astype(object)
        return pa.table(
            {
                "op": pa.array(op, pa.string()),
                "seq": pa.array(eid, pa.int64()),
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(
                    np.zeros(len(batch), np.int32), pa.int32()
                ),
                "role": batch["event_type"],
                "text": pa.nulls(len(batch), pa.string()),
                "tool": pa.nulls(len(batch), pa.string()),
                "ts": batch["ts"],
            }
        )

    changes_b, lake_b = _scratch("changes"), _scratch("lake")
    _events(sf_dir).map_batches(
        derive_b, batch_format="pyarrow"
    ).write_parquet(changes_b)
    apply_changes(changes_b, lake_b, _spec(sf_dir))

    out = copartitioned_join(lake_a, lake_b, on=["conv_id"], how="inner")
    df = (
        out.select_columns(["conv_id", "turn_idx", "role", "role_b"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    df["turn_idx"] = df["turn_idx"].astype("int64")
    return df[["conv_id", "turn_idx", "role", "role_b"]]


def q_cdc_lww_latest(sf_dir: str):
    """D2 record-level LWW dedup in isolation: winning row per key
    (deletes included, exposed as last_op), via the engine's vectorized
    kernel - hash-partition to P groups, then ONE sort + run-boundary
    reduction per group (``schema.lww_reduce``), never a Python call
    per key. This is the scale pattern the merge stage itself uses."""
    from ..schema import assign_part_id, lww_reduce

    def assign(b: pa.Table) -> pa.Table:
        return assign_part_id(b, 32)

    def reduce_group(g: pa.Table) -> pa.Table:
        return lww_reduce(
            g.drop_columns(["part_id"]), ("conv_id", "turn_idx"), "ts", "seq"
        )

    ds = (
        _changes_ds(sf_dir)
        .map_batches(assign, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(reduce_group, batch_format="pyarrow")
    )
    df = ds.to_pandas().rename(
        columns={"op": "last_op", "text": "last_text", "ts": "last_ts", "seq": "last_seq"}
    )[["conv_id", "turn_idx", "last_op", "last_text", "last_ts", "last_seq"]]
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def q_cdc_op_counts(sf_dir: str):
    """A5 counter semantics: events by op."""
    from ray.data.aggregate import Count

    out = _changes_ds(sf_dir).groupby("op").aggregate(Count(alias_name="n"))
    return out.sort("op").to_pandas()


def q_cdc_dt_rollup(sf_dir: str):
    """A7 Athena rollup analogue: rows per dt partition."""
    from ray.data.aggregate import Count

    def add_dt(b: pa.Table) -> pa.Table:
        return b.append_column("dt", pc.strftime(b["ts"], "%Y-%m-%d"))

    out = (
        _changes_ds(sf_dir)
        .map_batches(add_dt, batch_format="pyarrow")
        .groupby("dt")
        .aggregate(Count(alias_name="n"))
    )
    return out.sort("dt").to_pandas()


def q_cdc_sorted_recent(sf_dir: str):
    """O2 ordered inspection: 20 most recent events."""
    ds = _changes_ds(sf_dir).select_columns(["seq", "conv_id", "turn_idx", "ts"])
    return ds.sort(["ts", "seq"], descending=True).limit(20).to_pandas()


def q_cdc_distinct_roles(sf_dir: str):
    """Set op: distinct values of a column (D-family; ds.unique is a
    shuffle - fine for a low-cardinality column)."""
    vals = sorted(
        v for v in _changes_ds(sf_dir).unique("role") if v is not None
    )
    return pd.DataFrame({"role": vals})


def q_cdc_top_convs(sf_dir: str):
    """Top-k: 10 busiest conversations (groupby count -> sort -> limit,
    ties broken by conv_id for determinism)."""
    from ray.data.aggregate import Count

    out = (
        _changes_ds(sf_dir)
        .groupby("conv_id")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "conv_id"], descending=[True, False])
        .limit(10)
    )
    return out.to_pandas()


def q_cdc_lint_rollup(sf_dir: str):
    """CDC -> curation composition: apply the changelog, then run the
    structural transcript lint OVER the committed lake (the curation
    family's input IS the exactly-once table, not raw events). Oracle:
    the lint SQL over the FINAL_SQL LWW state."""
    from ..functions.transcripts import conversation_lint
    from .cdc import apply_changes, read_table

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    out = (
        conversation_lint(
            read_table(lake, columns=["conv_id", "turn_idx", "role", "text"]),
            conv_col="conv_id", order_col="turn_idx", role_col="role",
            text_col="text", opener_role="view", closer_role="click",
        )
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    for c in ("n_turns", "n_order_gaps", "n_role_repeats", "n_null_text"):
        out[c] = out[c].astype("int64")
    out["ok"] = out["ok"].astype(bool)
    return out[
        ["conv_id", "n_turns", "first_role", "last_role",
         "n_order_gaps", "n_role_repeats", "n_null_text", "ok"]
    ]


def q_cdc_context_truncate(sf_dir: str):
    """CDC -> curation composition #2: context-window truncation over
    the committed lake (keep each conversation's latest turns fitting
    a 24-token budget). Oracle: windowed reverse SUM over the
    FINAL_SQL state."""
    from ..functions.transcripts import context_truncate
    from .cdc import apply_changes, read_table

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    out = (
        context_truncate(
            read_table(lake, columns=["conv_id", "turn_idx", "text"]),
            conv_col="conv_id", order_col="turn_idx", text_col="text",
            budget_tokens=24,
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    out["turn_idx"] = out["turn_idx"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["cum_tokens_from_end"] = out["cum_tokens_from_end"].astype("int64")
    return out[
        ["conv_id", "turn_idx", "text", "n_tokens", "cum_tokens_from_end"]
    ]


def q_cdc_retry_distance(sf_dir: str):
    """CDC -> curation composition #3: retry edit distance over the
    committed lake — how far apart consecutive same-role turns are
    AFTER the LWW merge settled each turn's final text. Oracle: lag()
    + levenshtein() over the FINAL_SQL state."""
    from ..functions.transcripts import retry_edit_distance
    from .cdc import apply_changes, read_table

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    out = (
        retry_edit_distance(
            read_table(lake, columns=["conv_id", "turn_idx", "role", "text"]),
            conv_col="conv_id", order_col="turn_idx", role_col="role",
            text_col="text",
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    for c in ("turn_idx", "dist", "len_prev", "len_next"):
        out[c] = out[c].astype("int64")
    return out[
        ["conv_id", "turn_idx", "role", "dist", "len_prev", "len_next"]
    ]


def q_cdc_quarantine_counts(sf_dir: str):
    """M4 bad-record routing: rows by quarantine status (op poisoned
    deterministically for event_id % 97 == 0)."""
    from ..schema import default_spec, normalize_batch

    spec = default_spec()

    def status(b: pa.Table) -> pa.Table:
        n = normalize_batch(b, spec)
        st = pc.fill_null(n["_bad"], "ok")
        return pa.table({"status": st})

    from ray.data.aggregate import Count

    out = (
        _changes_ds(sf_dir, inject_bad=True)
        .map_batches(status, batch_format="pyarrow")
        .groupby("status")
        .aggregate(Count(alias_name="n"))
    )
    return out.sort("status").to_pandas()


def q_cdc_dq_stats(sf_dir: str):
    """A6 DQ aggregate expectations over the committed table, computed
    DISTRIBUTED: one map_batches pass emits per-block partial stats
    (count/nulls/min/max + the block's distinct conv set as rows), a
    small groupby dedups convs globally, and the driver combines only
    block-count-sized partials - the table itself never leaves the
    workers."""
    from .cdc import apply_changes, read_table

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    tbl = read_table(lake)

    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rows": pa.array([len(b)], pa.int64()),
                "null_text": pa.array([b["text"].null_count], pa.int64()),
                "null_conv_id": pa.array([b["conv_id"].null_count], pa.int64()),
                "min_turn": pa.array([pc.min(b["turn_idx"]).as_py()], pa.int32()),
                "max_turn": pa.array([pc.max(b["turn_idx"]).as_py()], pa.int32()),
            }
        )

    parts = tbl.map_batches(partial, batch_format="pyarrow").to_pandas()

    def conv_partial(b: pa.Table) -> pa.Table:
        return pa.table({"conv_id": pc.unique(b["conv_id"])})

    n_convs = (
        tbl.map_batches(conv_partial, batch_format="pyarrow")
        .groupby("conv_id")
        .count()
        .count()
    )
    return pd.DataFrame(
        {
            "row_count": [int(parts["rows"].sum())],
            "null_text": [int(parts["null_text"].sum())],
            "null_conv_id": [int(parts["null_conv_id"].sum())],
            "min_turn": [int(parts["min_turn"].min())],
            "max_turn": [int(parts["max_turn"].max())],
            "n_convs": [int(n_convs)],
        }
    )


def q_cdc_time_travel(sf_dir: str):
    """Time travel: split the stream at seq = max/2, commit each half,
    then read the FIRST committed version by number - must equal the
    pure SQL reduction over only the first half (version pinning is
    the manifest's whole job)."""
    import pyarrow.parquet as pq

    from .cdc import apply_changes, read_table

    changes, lake = _scratch("tt-changes"), _scratch("lake")
    full = pa.concat_tables(
        _changes_ds(sf_dir).iter_batches(batch_format="pyarrow", batch_size=65536)
    )
    cut = pc.max(full["seq"]).as_py() // 2
    lo = full.filter(pc.less(full["seq"], pa.scalar(cut, pa.int64())))
    hi = full.filter(pc.greater_equal(full["seq"], pa.scalar(cut, pa.int64())))
    pq.write_table(lo, os.path.join(changes, "ch-000.parquet"))
    pq.write_table(hi, os.path.join(changes, "ch-001.parquet"))
    spec = _spec(sf_dir)
    m1 = apply_changes([os.path.join(changes, "ch-000.parquet")], lake, spec)[-1]
    apply_changes(changes, lake, spec)  # v2 commits the rest
    df = read_table(lake, version=m1.version).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def q_cdc_changefeed(sf_dir: str):
    """Change data feed between two committed versions: split the
    stream at seq = max/2, commit each half, then diff snapshot v1 ->
    v2 (pruned to partitions whose files differ; bucketed vectorized
    key diff). 'U' rows carry the new payload, 'D' rows null payload."""
    import pyarrow.parquet as pq

    from .cdc import apply_changes
    from .cdf import table_changes

    changes, lake = _scratch("cf-changes"), _scratch("lake")
    full = pa.concat_tables(
        _changes_ds(sf_dir).iter_batches(batch_format="pyarrow", batch_size=65536)
    )
    cut = pc.max(full["seq"]).as_py() // 2
    pq.write_table(
        full.filter(pc.less(full["seq"], pa.scalar(cut, pa.int64()))),
        os.path.join(changes, "ch-000.parquet"),
    )
    pq.write_table(
        full.filter(pc.greater_equal(full["seq"], pa.scalar(cut, pa.int64()))),
        os.path.join(changes, "ch-001.parquet"),
    )
    spec = _spec(sf_dir)
    m1 = apply_changes([os.path.join(changes, "ch-000.parquet")], lake, spec)[-1]
    m2 = apply_changes(changes, lake, spec)[-1]
    df = table_changes(lake, m1.version, m2.version).to_pandas()
    return df.sort_values(["change_op", "conv_id", "turn_idx"]).reset_index(
        drop=True
    )


def q_cdc_forget(sf_dir: str):
    """Right-to-be-forgotten: apply the full stream, then forget two
    conversations through the engine's own D-op path (partition-pruned
    discovery read, winning tombstones, normal exactly-once commit)."""
    from .cdc import apply_changes
    from .forget import forget_keys

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    spec = _spec(sf_dir)
    apply_changes(changes, lake, spec)
    forget_keys(lake, ["conv_1", "conv_2"], spec)
    return _final_df(lake)


def q_cdc_multitable(sf_dir: str):
    """Multi-record-type routing (the reference's (record_type, dt)
    fan-out, lambdas/transform/app.py:93-104): one mixed change stream
    splits into per-type staged changelogs, each applied into its own
    lake with independent checkpoints; both lakes read back, tagged and
    unioned. record_type is derived per conversation so the LWW
    reduction per lake matches the global one."""
    from ..schema import default_spec
    from .cdc import read_table
    from .route import route_and_apply

    def with_type(b: pa.Table) -> pa.Table:
        uid = b["conv_id"].to_pylist()
        rt = np.array(
            ["shipments" if int(c.rsplit("_", 1)[1]) % 2 == 0 else "tracking"
             for c in uid], dtype=object,
        )
        return b.append_column("record_type", pa.array(rt, pa.string()))

    changes, lake_root = _scratch("mt-changes"), _scratch("mt-root")
    _changes_ds(sf_dir).map_batches(
        with_type, batch_format="pyarrow"
    ).repartition(4).write_parquet(changes)
    specs = {
        "shipments": default_spec(name="shipments", num_partitions=8),
        "tracking": default_spec(name="tracking", num_partitions=8),
    }
    route_and_apply(changes, lake_root, specs)
    dfs = []
    for name in specs:
        df = read_table(os.path.join(lake_root, name)).to_pandas()
        df.insert(0, "record_type", name)
        dfs.append(df)
    out = pd.concat(dfs, ignore_index=True)
    return out.sort_values(["record_type", "conv_id", "turn_idx"]).reset_index(
        drop=True
    )


def q_cdc_txn_multitable(sf_dir: str):
    """Cross-lake atomic transaction (state/txn.py): the two per-type
    change streams apply into separate lakes, then ONE exclusive-create
    catalog commit publishes both pins — readers through the catalog
    see all of the transaction or none (the cross-table consistency
    the reference's independent per-type Lambda writes lack). Final
    union must equal the per-type LWW reduction, exactly like the
    route-based multitable path."""
    from ..schema import default_spec
    from ..state.txn import TxnCatalog, read_table_at

    def half(parity: int):
        def fn(b: pa.Table) -> pa.Table:
            uid = b["conv_id"].to_pylist()
            mask = pa.array(
                [int(c.rsplit("_", 1)[1]) % 2 == parity for c in uid]
            )
            return b.filter(mask)

        return fn

    ch_s, ch_t = _scratch("txn-ch-s"), _scratch("txn-ch-t")
    root = _scratch("txn-root")
    base = _changes_ds(sf_dir)
    base.map_batches(half(0), batch_format="pyarrow").repartition(
        2
    ).write_parquet(ch_s)
    base.map_batches(half(1), batch_format="pyarrow").repartition(
        2
    ).write_parquet(ch_t)

    cat = TxnCatalog(root)
    txn = cat.begin()
    txn.apply(
        "shipments", ch_s,
        default_spec(name="shipments", num_partitions=8),
        lake_dir=os.path.join(root, "shipments"),
    )
    txn.apply(
        "tracking", ch_t,
        default_spec(name="tracking", num_partitions=8),
        lake_dir=os.path.join(root, "tracking"),
    )
    txn.commit()
    dfs = []
    for name in ("shipments", "tracking"):
        df = read_table_at(cat, name).to_pandas()
        df.insert(0, "record_type", name)
        dfs.append(df)
    out = pd.concat(dfs, ignore_index=True)
    return out.sort_values(
        ["record_type", "conv_id", "turn_idx"]
    ).reset_index(drop=True)


def q_cdc_bootstrap(sf_dir: str):
    """Initial-snapshot bootstrap then full-stream replay (the
    Debezium snapshot→streaming handoff, pipelines/bootstrap.py): a
    mid-stream snapshot state seeds a FRESH lake as seq-0 inserts,
    then the ENTIRE changelog applies from its beginning — the
    snapshot/stream overlap needs no offset handshake because LWW by
    (ts, seq) makes re-applied rows no-ops. Final state must equal
    the pure SQL reduction of the full stream."""
    import glob

    from .bootstrap import bootstrap_lake
    from .cdc import apply_changes, read_table

    changes = _write_changelog(sf_dir, n_files=6)
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    spec = _spec(sf_dir)
    # the snapshot source: lake state after only half the stream
    source = _scratch("boot-src")
    apply_changes(files[:3], source, spec)
    # fresh lake seeded from the snapshot, then the FULL stream
    lake = _scratch("boot-lake")
    bootstrap_lake(read_table(source), lake, spec)
    apply_changes(files, lake, spec)
    return _final_df(lake)


def q_cdc_rebalance(sf_dir: str):
    """Re-salt / rebalance migration: commit under P=16, migrate to
    P=64 with two conv_ids newly salted hot, then apply MORE changes
    (exercising post-migration key routing) - final state must still
    equal the pure SQL reduction."""
    import glob

    from .cdc import apply_changes
    from .rebalance import rebalance

    changes, lake = _write_changelog(sf_dir, n_files=6), _scratch("lake")
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    spec = _spec(sf_dir)
    apply_changes(files[:3], lake, spec)
    m = rebalance(
        lake, num_partitions=64, hot_keys=("conv_1", "conv_2"), hot_key_salt=4
    )
    assert m.partitioning["num_partitions"] == 64
    apply_changes(changes, lake, spec)  # picks up the NEW partitioning
    return _final_df(lake)


def q_cdc_catalog_sql(sf_dir: str):
    """Catalog/SQL surface (Glue+Athena analogue): register a DuckDB
    view over the committed manifest's files - LWW across delta runs
    and tombstone filtering baked into the view - and query it. Uses
    the LSM path (delta-append runs present) so the view's
    merge-on-read is actually exercised."""
    import glob

    from ..catalog import register_duckdb_view
    from .cdc import apply_changes

    changes, lake = _write_changelog(sf_dir, n_files=10), _scratch("lake")
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    apply_changes(files[:-2], lake, _spec(sf_dir))
    apply_changes(
        changes, lake, _spec(sf_dir), commit_every_files=1, delta_threshold=0.95
    )
    con = register_duckdb_view(lake, view_name="t")
    df = con.execute(
        "SELECT conv_id, turn_idx, role, text, tool, ts FROM t "
        "ORDER BY conv_id, turn_idx"
    ).df()
    con.close()
    return df.reset_index(drop=True)


# ---------------------------------------------------------------------------
# training-data ops: documents
# ---------------------------------------------------------------------------


def _documents(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _corpus_with_exact_dupes(sf_dir: str) -> rd.Dataset:
    """documents ∪ exact copies (doc_id+1000000) of every 5th doc."""
    base = _documents(sf_dir, ["doc_id", "text"])

    def copies(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(ids % 5 == 0))
        return pa.table(
            {
                "doc_id": pc.add(f["doc_id"], 1_000_000),
                "text": f["text"],
            }
        )

    return base.union(base.map_batches(copies, batch_format="pyarrow"))


def q_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition by content hash, keep min doc_id."""
    from ..functions.dedup import exact_dedup

    out = exact_dedup(_corpus_with_exact_dupes(sf_dir))
    return out.sort("doc_id").to_pandas()


def q_dedup_incremental(sf_dir: str):
    """Streaming corpus dedup: two ingest batches applied in sequence
    against a dedup-index lake (CDC first-writer-wins upsert + change
    feed); the union of the per-batch survivor feeds must equal global
    keep-first-by-doc_id - exactly the batch-split-invariance that
    makes the operator safe to run incrementally at 100 TB."""
    import shutil
    import tempfile

    from .dedup_index import ingest_unique

    base = _documents(sf_dir, ["doc_id", "text"])
    mid = int(base.max("doc_id")) // 2

    def first_half(b: pa.Table) -> pa.Table:
        return b.filter(pc.less_equal(b["doc_id"], mid))

    def second_half(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["doc_id"], mid))

    def copies(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(ids % 5 == 0))
        return pa.table(
            {"doc_id": pc.add(f["doc_id"], 1_000_000), "text": f["text"]}
        )

    batch_a = base.map_batches(first_half, batch_format="pyarrow")
    batch_b = base.map_batches(second_half, batch_format="pyarrow").union(
        base.map_batches(copies, batch_format="pyarrow")
    )

    idx = tempfile.mkdtemp(prefix="dedup_index_", dir="/tmp")
    shutil.rmtree(idx, ignore_errors=True)
    try:
        s_a = ingest_unique(
            batch_a, idx, batch_label="batch-a", num_partitions=32,
            now="2026-01-01T00:00:00Z",
        )
        pa_df = s_a.select_columns(["doc_id", "text_hash"]).to_pandas()
        s_b = ingest_unique(
            batch_b, idx, batch_label="batch-b", num_partitions=32,
            now="2026-01-01T00:01:00Z",
        )
        pb_df = s_b.select_columns(["doc_id", "text_hash"]).to_pandas()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    out = pd.concat([pa_df, pb_df], ignore_index=True)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dedup_clusters(sf_dir: str):
    """Connected-components clustering over a deterministic candidate-
    pair graph (near-dup copies d~d+1e6 for d%4==0, chain edges d~d+4
    for d%8==0 when d+4 exists): components of size 4, cluster_id =
    component min. Chain-partner existence is checked with a
    distributed hash_join, not a driver collect."""
    from ..functions.dedup import dedup_clusters
    from ..functions.joins import hash_join

    docs = _documents(sf_dir, ["doc_id"])

    def e1(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        f = ids[ids % 4 == 0]
        return pa.table({"id_a": pa.array(f, pa.int64()),
                         "id_b": pa.array(f + 1_000_000, pa.int64())})

    def shift8(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        f = ids[ids % 8 == 0]
        return pa.table({"doc_id": pa.array(f + 4, pa.int64()),
                         "id_a": pa.array(f, pa.int64())})

    pairs1 = docs.map_batches(e1, batch_format="pyarrow")
    pairs2 = hash_join(
        docs.map_batches(shift8, batch_format="pyarrow"), docs, on="doc_id"
    ).map_batches(
        lambda b: pd.DataFrame(
            {"id_a": b["id_a"].astype("int64"),
             "id_b": b["doc_id"].astype("int64")}
        ),
        batch_format="pandas",
    )
    out = dedup_clusters(pairs1.union(pairs2))
    return out.sort("doc_id").to_pandas()


def q_token_count(sf_dir: str):
    from ..functions.text import TokenCounter

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        TokenCounter, batch_format="pandas", concurrency=(1, 4)
    )
    return ds.select_columns(["doc_id", "n_tokens"]).sort("doc_id").to_pandas()


def q_quality_score(sf_dir: str):
    from ..functions.text import QualityScorer

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pandas", concurrency=(1, 4)
    )
    return (
        ds.select_columns(["doc_id", "n_chars", "n_tokens", "alpha_chars", "ok"])
        .sort("doc_id")
        .to_pandas()
    )


def q_repetition_score(sf_dir: str):
    from ..functions.text import RepetitionScorer

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        RepetitionScorer, batch_format="pandas", concurrency=(1, 4)
    )
    return (
        ds.select_columns(
            ["doc_id", "n_lines", "n_dup_lines", "n_bigrams",
             "top_bigram_n", "repetitive"]
        )
        .sort("doc_id")
        .to_pandas()
    )


def q_lang_id(sf_dir: str):
    from ..functions.text import LangId

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", concurrency=(1, 4)
    )
    return (
        ds.select_columns(["doc_id", "hits_en", "hits_es", "hits_fr", "lang_pred"])
        .sort("doc_id")
        .to_pandas()
    )


def q_fingerprint(sf_dir: str):
    from ..functions.text import Fingerprinter

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        Fingerprinter, batch_format="pandas", concurrency=(1, 4)
    )
    return ds.select_columns(["doc_id", "md5"]).sort("doc_id").to_pandas()


def _corpus_with_near_dupes(sf_dir: str) -> rd.Dataset:
    """documents ∪ perturbed copies (first 2 words dropped) of every
    4th doc - near-duplicates by construction."""
    base = _documents(sf_dir, ["doc_id", "text"])

    def perturb(b: pd.DataFrame) -> pd.DataFrame:
        f = b[b["doc_id"] % 4 == 0].copy()
        f["doc_id"] = f["doc_id"] + 1_000_000
        f["text"] = f["text"].str.split(n=2).str[2].fillna(f["text"])
        return f

    return base.union(base.map_batches(perturb, batch_format="pandas"))


def q_minhash_near_dup(sf_dir: str):
    """MinHash-LSH near-dup candidates + exact-Jaccard verification.
    Returns verified (id_a, id_b) pairs. Rows-only check (no SQL)."""
    from ..functions.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        _corpus_with_near_dupes(sf_dir), threshold=0.5, num_perm=64, bands=16
    )
    return pd.DataFrame(
        {"id_a": [p[0] for p in pairs], "id_b": [p[1] for p in pairs]}
    )


def q_customers_no_orders(sf_dir: str):
    """Anti-join (TPC-H Q22 shape): customers with no orders, counted
    per market segment. The anti side is customer-scale, so counts are
    per-block partials + a tiny driver combine — never the rows."""
    from ..functions.joins import hash_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    def urgent(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
        return pa.table({"c_custkey": f["o_custkey"]})

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(urgent, batch_format="pyarrow")
    no_urgent = hash_join(cust, orders, on="c_custkey", how="anti")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["c_mktsegment"].value_counts()
        return pd.DataFrame({"c_mktsegment": vc.index, "n": vc.to_numpy()})

    parts = no_urgent.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"c_mktsegment": pd.Series(dtype=str),
                             "n": pd.Series(dtype="int64")})
    out = (
        parts.groupby("c_mktsegment", sort=True)["n"].sum().reset_index()
    )
    out["n"] = out["n"].astype("int64")
    return out


def q_chunk_documents(sf_dir: str):
    """Token-window chunking (size 64, overlap 16) over documents —
    RAG/embedding prep; streamed per batch."""
    from ..functions.text import DocumentChunker

    out = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        DocumentChunker,
        fn_constructor_kwargs={"size": 64, "overlap": 16},
        batch_format="pandas",
        concurrency=(1, 4),
    )
    return (
        out.sort(["doc_id", "chunk_idx"]).to_pandas().reset_index(drop=True)
    )


def q_corpus_refinery(sf_dir: str):
    """Flagship composed pipeline: clean -> quality+repetition filter
    -> exact dedup -> 15k-token budget select; every stage SQL-exact."""
    from ..pipelines.refinery import refine_corpus

    out = refine_corpus(
        _documents(sf_dir, ["doc_id", "text"]), token_budget=15_000
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_tokens", "alpha_chars"):
        df[c] = df[c].astype("int64")
    return df


def q_token_budget_select(sf_dir: str):
    """Greedy corpus selection under a 20k global token budget, best
    (alpha_chars) docs first: distributed two-pass prefix sum over the
    sorted stream (driver sees only per-block sums)."""
    from ..functions.mixing import select_by_token_budget

    def score(b: pd.DataFrame) -> pd.DataFrame:
        s = b["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "score": s.str.replace("[^A-Za-z]", "", regex=True)
                .str.len()
                .astype("int64"),
                "n_tokens": s.str.count(r"[A-Za-z0-9]+").astype("int64"),
            }
        )

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )
    out = select_by_token_budget(
        ds, 20_000, score_col="score", token_col="n_tokens"
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def q_paragraph_dedup(sf_dir: str):
    """Corpus-wide paragraph dedup over documents with an injected
    common footer (globally duplicated segment) and a unique tail:
    only the first doc keeps the footer; every doc keeps its own text
    and tail."""
    from ..functions.dedup import paragraph_dedup

    def inject(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "text": b["text"].fillna("")
                + "\nCOMMON FOOTER SEGMENT\ntail-"
                + b["doc_id"].astype(str),
            }
        )

    docs = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        inject, batch_format="pandas"
    )
    out = paragraph_dedup(docs)
    df = out.sort("doc_id").to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


def q_near_dedup(sf_dir: str):
    """One-call near-dedup (minhash pairs -> CC clusters -> keep
    cluster minima): surviving doc ids over the constructed near-dup
    corpus. Rows-only check (minhash is not SQL-expressible)."""
    from ..functions.dedup import near_dedup

    out = near_dedup(
        _corpus_with_near_dupes(sf_dir), threshold=0.5, num_perm=64, bands=16
    )
    return out.select_columns(["doc_id"]).sort("doc_id").to_pandas()


def q_near_dedup_best(sf_dir: str):
    """Quality-aware near-dedup: same minhash->CC clustering, but each
    cluster keeps its LONGEST member (keep_best_by=n_chars, ties ->
    min id) — the keep-the-best-quality survivor policy. Rows-only
    check (minhash is not SQL-expressible)."""
    from ..functions.dedup import near_dedup

    # keep_best_by consumes the corpus three times (pair-gen, score
    # grab, survivor filter); cache the scored corpus in the object
    # store once instead of re-running read+union+perturb per pass
    ds = _corpus_with_near_dupes(sf_dir).map_batches(
        lambda b: b.assign(n_chars=b["text"].fillna("").str.len().astype("int64")),
        batch_format="pandas",
    ).materialize()
    out = near_dedup(
        ds, threshold=0.5, num_perm=64, bands=16, keep_best_by="n_chars"
    )
    return out.select_columns(["doc_id"]).sort("doc_id").to_pandas()


def q_simhash_near_dup(sf_dir: str):
    from ..functions.dedup import simhash_near_dups

    pairs = simhash_near_dups(_corpus_with_near_dupes(sf_dir), max_hamming=12)
    return pd.DataFrame(
        {
            "id_a": [p[0] for p in pairs],
            "id_b": [p[1] for p in pairs],
            "hamming": [p[2] for p in pairs],
        }
    )


def q_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard over the constructed near-dup pairs
    (original, perturbed-copy), scaled x1e6 and floored for exactness.
    Computed inside map_batches - the corpus streams, the driver sees
    only (doc_id, score) rows."""
    from ..functions.dedup import jaccard

    def score(b: pd.DataFrame) -> pd.DataFrame:
        f = b[b["doc_id"] % 4 == 0]
        ids, js = [], []
        for did, t in zip(f["doc_id"], f["text"]):
            parts = t.split(maxsplit=2)
            pt = parts[2] if len(parts) > 2 else t
            ids.append(int(did))
            js.append(int(jaccard(t, pt, k=3) * 1_000_000))
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "jaccard_micro": pd.Series(js, dtype="int64")}
        )

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )
    return ds.sort("doc_id").to_pandas()


def q_contamination_check(sf_dir: str):
    """Benchmark decontamination: every 20th document plays the held-out
    benchmark; all other documents are scored by how many distinct
    word-3-gram shingles they share with it (broadcast bench shingle
    set, streaming corpus scan - no shuffle)."""
    from ..functions.contamination import contamination_check

    def keep(pred):
        def fn(b: pa.Table) -> pa.Table:
            did = b["doc_id"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(pred(did)))

        return fn

    docs = _documents(sf_dir, ["doc_id", "text"])
    bench = docs.map_batches(
        keep(lambda d: d % 20 == 0), batch_format="pyarrow"
    )
    corpus = docs.map_batches(
        keep(lambda d: d % 20 != 0), batch_format="pyarrow"
    )
    out = contamination_check(corpus, bench).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# similarity search: embeddings
# ---------------------------------------------------------------------------


def _embeddings(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def q_ann_cosine_topk(sf_dir: str):
    """Brute-force cosine top-5 for query vectors vec_id < 8 (broadcast
    query matrix, per-batch matmul, tiny global reduce)."""
    from ..functions.similarity import cosine_topk

    top = cosine_topk(_embeddings(sf_dir), list(range(8)), k=5)
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)


def q_ann_ivf_topk(sf_dir: str):
    """IVF-bucketed ANN variant (scale path; approximate - rows-only)."""
    from ..functions.similarity import ivf_topk

    top = ivf_topk(_embeddings(sf_dir), list(range(8)), k=5, nlist=8, nprobe=8)
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)


def q_ann_quantized_topk(sf_dir: str):
    """int8-quantized two-phase ANN: per-dim absmax scales (streaming),
    quantize map, approximate top-(k·oversample) scan over the int8
    corpus, exact float rescore of the candidate union. With this
    oversample the result equals brute force on this corpus, so the
    same SQL top-k oracle verifies it hash-exact."""
    from ..functions.similarity import quantize_embeddings, quantized_topk

    ds = _embeddings(sf_dir)
    dsq, scales = quantize_embeddings(ds)
    top = quantized_topk(dsq, ds, scales, list(range(8)), k=5, oversample=8)
    out = top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def q_kmeans_embeddings(sf_dir: str):
    """Distributed spherical k-means over the embeddings table
    (deterministic init/tie-breaks; rows-only — iterative float
    clustering is not SQL-expressible)."""
    from ..functions.similarity import kmeans_embeddings

    out = kmeans_embeddings(_embeddings(sf_dir), k=8, iters=5)
    df = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
    df["vec_id"] = df["vec_id"].astype("int64")
    return df


def q_semantic_dedup(sf_dir: str):
    """SemDeDup over embeddings ∪ near-identical copies: surviving
    vec ids (rows-only — k-means + float cosine not SQL-expressible)."""
    from ..functions.similarity import semantic_dedup

    base = _embeddings(sf_dir)

    def copies(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(ids % 7 == 0))
        return f.set_column(
            f.schema.get_field_index("vec_id"),
            "vec_id",
            pc.add(f["vec_id"], 1_000_000),
        )

    corpus = base.union(base.map_batches(copies, batch_format="pyarrow"))
    out = semantic_dedup(corpus, threshold=0.9999)
    df = out.to_pandas()[["vec_id"]].sort_values("vec_id").reset_index(drop=True)
    df["vec_id"] = df["vec_id"].astype("int64")
    return df


def q_embedding_near_dup(sf_dir: str):
    """Cosine near-dups among embeddings ∪ noisy copies (rows-only)."""
    from ..functions.dedup import embedding_near_dups

    base = _embeddings(sf_dir)

    def noisy(b: pd.DataFrame) -> pd.DataFrame:
        f = b[b["vec_id"] % 7 == 0].copy()
        rng = np.random.default_rng(5)
        f["embedding"] = [
            (np.asarray(v) + rng.normal(0, 1e-3, len(v))).astype(np.float32)
            for v in f["embedding"]
        ]
        f["vec_id"] = f["vec_id"] + 1_000_000
        return f

    corpus = base.union(base.map_batches(noisy, batch_format="pandas"))
    pairs = embedding_near_dups(corpus, threshold=0.999)
    return pd.DataFrame(
        {"id_a": [p[0] for p in pairs], "id_b": [p[1] for p in pairs]}
    )


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def q_multimodal_bytes(sf_dir: str):
    """Binary-payload plumbing: wrap text as opaque bytes + metadata."""
    from ..functions.multimodal import attach_binary_payload

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        attach_binary_payload, batch_format="pyarrow", batch_size=256
    )
    return ds.select_columns(["media_id", "n_bytes"]).sort("media_id").to_pandas()


def q_multimodal_decode(sf_dir: str):
    """Actor-pool decode stage (deterministic fake codec; rows-only)."""
    from ..functions.multimodal import DecodeStub, attach_binary_payload

    ds = (
        _documents(sf_dir, ["doc_id", "text"])
        .map_batches(attach_binary_payload, batch_format="pyarrow", batch_size=256)
        .map_batches(
            DecodeStub,
            fn_constructor_kwargs={"fake": True},
            batch_format="pyarrow",
            batch_size=128,
            concurrency=(1, 4),
            num_cpus=1,
        )
    )
    return (
        ds.select_columns(["media_id", "width", "height", "n_frames"])
        .sort("media_id")
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# relational / streaming-window ops over the star schema
# ---------------------------------------------------------------------------


def q_window_events_hourly(sf_dir: str):
    """Tumbling 1h event-time window per user: pre-aggregated inside
    map_batches (partial combine), then a small groupby - the
    aggregation-at-scale pattern."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        win = pc.floor_temporal(b["ts"], unit="hour")
        cents = pc.cast(pc.floor(pc.multiply(b["value"], 100.0)), pa.int64())
        t = pa.table(
            {"user_id": b["user_id"], "window_start": win, "value_cents": cents}
        )
        return (
            t.group_by(["user_id", "window_start"])
            .aggregate([("value_cents", "sum"), ("value_cents", "count")])
            .rename_columns(["user_id", "window_start", "value_cents", "n_events"])
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("value_cents", alias_name="value_cents"))
    )
    df = out.sort(["user_id", "window_start"]).to_pandas()
    df["n_events"] = df["n_events"].astype("int64")
    df["value_cents"] = df["value_cents"].astype("int64")
    return df[["user_id", "window_start", "n_events", "value_cents"]]


def q_sessionize_events(sf_dir: str):
    """Gap-based session windows (30-min gap) per user - the streaming
    window op Ray Data lacks natively, as groupby+map_groups."""
    from ..functions.windows import sessionize

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id"],
    )
    out = sessionize(ds, key="user_id", ts_col="ts", tiebreak="event_id")
    df = out.to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    for c in ("user_id", "session_id", "n_events"):
        df[c] = df[c].astype("int64")
    return df[["user_id", "session_id", "n_events", "session_start", "session_end"]]


def q_interval_join_sessions(sf_dir: str):
    """Point-in-interval join: every event matched back to the session
    window containing it (sessions from ``sessionize``, disjoint per
    user by construction, so the join uses the O(n log n) merge_asof
    path). The range-join operator Ray Data lacks natively - one
    tagged-union shuffle, one vectorized match per key bucket."""
    from ..functions.joins import interval_join
    from ..functions.windows import sessionize

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    sess = sessionize(ev, key="user_id", ts_col="ts", tiebreak="event_id")
    out = interval_join(
        ev,
        sess,
        by="user_id",
        on="ts",
        start="session_start",
        end="session_end",
        right_cols=["session_id", "session_start", "session_end"],
        disjoint=True,
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    for c in ("event_id", "user_id", "session_id"):
        df[c] = df[c].astype("int64")
    return df[["event_id", "user_id", "ts", "session_id"]]


def q_join_orders_nation(sf_dir: str):
    """Broadcast (map-side) join: orders -> customer -> nation, small
    sides shipped once via ray.put, groupby count."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nk_to_name = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    lookup = {
        ck: nk_to_name[nk]
        for ck, nk in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    }
    lookup_ref = ray.put(lookup)

    class JoinNation:
        """Broadcast-join + map-side combine: each batch maps custkey ->
        nation through the once-per-actor lookup and emits per-nation
        PARTIAL counts (25 rows), so the exchange aggregates result-sized
        Arrow blocks instead of shuffling one row per order."""

        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, b: pd.DataFrame) -> pa.Table:
            vc = b["o_custkey"].map(self.lookup).value_counts()
            return pa.table(
                {
                    "nation": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                    "n_orders": pa.array(vc.to_numpy(dtype=np.int64), pa.int64()),
                }
            )

    from ray.data.aggregate import Sum

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    )
    out = (
        orders.map_batches(JoinNation, batch_format="pandas", concurrency=(1, 4))
        .groupby("nation")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )
    df = out.sort("nation").to_pandas()
    df["n_orders"] = df["n_orders"].astype("int64")
    return df


def q_assemble_conversations(sf_dir: str):
    """Transcript-native training-data op: assemble each conversation's
    turns (post-CDC-merge final state) into one ordered document with
    role prefixes - the lake-to-training-corpus step. Runs the full
    engine, then a BUCKETED assembly over the committed table: each of
    ~2/CPU group calls assembles ALL its conversations with one
    vectorized pandas pass (per-conversation map_groups would pay one
    Python call per conversation - the anti-pattern at 10^8 convs)."""
    from ..functions.windows import _key_buckets
    from .cdc import apply_changes, read_table

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    NB = 64

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_cb"] = _key_buckets(b["conv_id"], NB)
        return b

    def assemble_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        line = g["role"].astype(str) + ": " + g["text"].astype(str)
        out = (
            g.assign(_line=line)
            .groupby("conv_id", sort=True)
            .agg(n_turns=("turn_idx", "size"), document=("_line", "\n".join))
            .reset_index()
        )
        return out[["conv_id", "n_turns", "document"]]

    out = (
        read_table(lake)
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_cb")
        .map_groups(assemble_bucket, batch_format="pandas")
    )
    df = out.to_pandas().sort_values("conv_id").reset_index(drop=True)
    df["n_turns"] = df["n_turns"].astype("int64")
    return df


def q_asof_join_events(sf_dir: str):
    """As-of join: for each 'query' event (event_id % 5 == 0), the
    latest other event of the same user at or before it (one co-group
    shuffle + vectorized merge_asof per user)."""
    from ..functions.joins import asof_join

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def queries_side(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(eid % 5 == 0))
        return pa.table(
            {"user_id": f["user_id"], "ts": f["ts"], "query_id": f["event_id"]}
        )

    def quotes_side(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(eid % 5 != 0))
        return pa.table(
            {"user_id": f["user_id"], "ts": f["ts"], "quote_id": f["event_id"]}
        )

    left = ev.map_batches(queries_side, batch_format="pyarrow")
    right = ev.map_batches(quotes_side, batch_format="pyarrow")
    out = asof_join(left, right, by="user_id", on="ts", right_cols=["ts", "quote_id"])
    df = out.to_pandas()[["query_id", "user_id", "quote_id"]]
    # inner semantics: drop unmatched queries so quote_id stays a clean
    # int64 in both engines (nullable-int vs float NaN hash ambiguity)
    df = df.dropna(subset=["quote_id"])
    # ints resurface as float64 after riding the null-padded union
    for c in ("query_id", "user_id", "quote_id"):
        df[c] = df[c].astype("int64")
    return df.sort_values("query_id").reset_index(drop=True)


def q_lineitem_rollup(sf_dir: str):
    """Q1-style pruned-read rollup: columns pruned at the read, partial
    aggregation per batch, small final groupby."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], cutoff))
        qty = pc.cast(pc.floor(b["l_quantity"]), pa.int64())
        cents = pc.cast(pc.floor(pc.multiply(b["l_extendedprice"], 100.0)), pa.int64())
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": qty,
                "sum_price_cents": cents,
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("sum_qty", "sum"), ("sum_price_cents", "sum"), ("sum_qty", "count")])
            .rename_columns(
                ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "n_rows"]
            )
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
        )
    )
    df = out.sort(["l_returnflag", "l_linestatus"]).to_pandas()
    for c in ("n_rows", "sum_qty", "sum_price_cents"):
        df[c] = df[c].astype("int64")
    return df


def q_soundex_clusters(sf_dir: str):
    """Phonetic blocking: Soundex code per customer name (vectorized
    column sweep, no per-row Python), min-key canonical grouping —
    the sounds-alike sibling of the edit-distance-1 matcher.
    Rows-only (DuckDB has no soundex); pytest pins the canonical
    Ashcraft/Tymczak/Pfister codes."""
    from ..functions.fuzzy import soundex

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    )

    def code(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"],
                "sx": soundex(b["c_name"].fillna("").to_numpy(dtype=object)),
            }
        )

    def canon(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": g["c_custkey"],
                "sx": g["sx"],
                "canonical": g["c_custkey"].min(),
            }
        )

    out = (
        cust.map_batches(code, batch_format="pandas")
        .groupby("sx")
        .map_groups(canon, batch_format="pandas")
    )
    df = out.to_pandas().sort_values("c_custkey").reset_index(drop=True)
    for c in ("c_custkey", "canonical"):
        df[c] = df[c].astype("int64")
    return df[["c_custkey", "sx", "canonical"]]


def q_weighted_sample_docs(sf_dir: str):
    """Deterministic weighted sample (Efraimidis-Spirakis) of 50 docs
    by character length: hash-derived uniforms, ln(u)/w ranking,
    per-block top-k prune before the result-sized exact sort."""
    from ..functions.mixing import weighted_sample

    docs = _documents(sf_dir, ["doc_id", "text"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_chars": b["text"].fillna("").str.len().astype("int64"),
            }
        )

    out = weighted_sample(
        docs.map_batches(prep, batch_format="pandas"),
        id_col="doc_id",
        weight_col="n_chars",
        k=50,
        seed=7,
    )
    out = out.sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_chars", "key_q"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "n_chars", "key_q"]]


def q_fuzzy_name_pairs(sf_dir: str):
    """All customer-name pairs within Levenshtein distance 1 via
    deletion-neighborhood blocking (SymSpell): variant hashes bucket
    the candidates (complete for ed≤1 by construction), one shuffle,
    vectorized matrix verification — never an all-pairs scan."""
    from ..functions.fuzzy import fuzzy_pairs_ed1

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    )
    out = fuzzy_pairs_ed1(cust, id_col="c_custkey", text_col="c_name")
    df = out.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    for c in ("id_a", "id_b", "dist"):
        df[c] = df[c].astype("int64")
    return df[["id_a", "id_b", "dist"]]


def q_strip_html(sf_dir: str):
    """HTML boilerplate removal (C4-style): docs wrapped in a
    deterministic HTML shell (tags + script + entities), stripped by
    the actor-pool regex stage — SQL mirrors every replace in the
    same order, so recovery is verified bit-for-bit."""
    from ..functions.text import HtmlStripper

    docs = _documents(sf_dir, ["doc_id", "text"])

    def wrap(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "text": (
                    "<html><head><style>p{color:red}</style></head>"
                    "<body><!-- boilerplate --><p class=\"main\">"
                    + t
                    + "</p>&nbsp;&amp;&lt;tail&gt;"
                    + "<script>var x = 1 < 2;</script></body></html>"
                ),
            }
        )

    out = docs.map_batches(wrap, batch_format="pandas").map_batches(
        HtmlStripper, batch_format="pandas", concurrency=(1, 4), num_cpus=1
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["doc_id"] = df["doc_id"].astype("int64")
    return df[["doc_id", "clean"]]


def q_image_dhash_dedup(sf_dir: str):
    """Perceptual image dedup: deterministic synthetic PPM pairs
    (even/odd ids render the same pattern at different brightness),
    actor-pool decode + dHash, one (dhash, id) exchange assigns
    min-id canonical clusters. Rows-only; pytest pins the hash
    invariances."""
    from ..functions.multimodal import image_dhash_clusters

    docs = _documents(sf_dir, ["doc_id"])

    def make_ppm(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            base, off = int(i) // 2, (int(i) % 2) * 23
            px = (
                (np.arange(16)[:, None] * 7
                 + np.arange(16)[None, :] * 3 + base * 5) % 180 + off
            ).astype(np.uint8)
            img = np.stack([px, px, px], axis=2)
            payloads.append(b"P6\n16 16\n255\n" + img.tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = image_dhash_clusters(
        docs.map_batches(make_ppm, batch_format="pyarrow")
    )
    df = out.to_pandas().sort_values("media_id").reset_index(drop=True)
    for c in ("media_id", "canonical_id"):
        df[c] = df[c].astype("int64")
    return df[["media_id", "canonical_id"]]


def q_chunk_chars(sf_dir: str):
    """RAG chunking: 200-char windows with 40-char overlap, one
    char-matrix gather per batch (no per-row Python, no shuffle) —
    the character-window sibling of the token-window chunk_documents."""
    from ..functions.text import chunk_by_chars

    out = chunk_by_chars(
        _documents(sf_dir, ["doc_id", "text"]),
        chunk_size=200,
        overlap=40,
    )
    df = out.to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(
        drop=True
    )
    for c in ("doc_id", "chunk_idx"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "chunk_idx", "chunk_text"]]


def q_bm25_rank(sf_dir: str):
    """Okapi BM25 over a fixed 3-term query: stats pass (doc count,
    Σdl, per-term df as tagged partials), then a broadcast map-side
    scoring pass with one fixed left-associative expression tree per
    term — microbit-floored so the SQL mirror hash-matches despite
    ln()."""
    from ..functions.text import bm25_scores

    out = bm25_scores(
        _documents(sf_dir, ["doc_id", "text"]),
        query_terms=["hash", "join", "vector"],
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "dl", "score_ub"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "dl", "score_ub"]]


def q_novelty_scores(sf_dir: str):
    """Cross-corpus word-trigram novelty per doc (per-mille of grams
    unique to the doc): gram-hash pair exchange + df join — the
    duplicate-text-fraction complement."""
    from ..functions.text import novelty_scores

    out = novelty_scores(_documents(sf_dir, ["doc_id", "text"]), n=3)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_grams", "novelty_pm"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "n_grams", "novelty_pm"]]


def q_tfidf_keywords(sf_dir: str):
    """TF-IDF keyword extraction: top-5 terms per document by integer
    tf/df score (df via one term shuffle, then broadcast to a per-batch
    scoring stage)."""
    from ..functions.text import tfidf_topk_terms

    return tfidf_topk_terms(_documents(sf_dir, ["doc_id", "text"]), k=5)


def q_training_examples(sf_dir: str):
    """Lake -> SFT examples: run the full CDC engine, then emit
    (context = last 3 role-prefixed turns, target = turn text) for
    every turn with history - bucketed, one vectorized pass per bucket
    (groupby().shift is C-level; no Python per turn)."""
    from ..functions.transcripts import conversation_examples
    from .cdc import apply_changes, read_table

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    out = conversation_examples(read_table(lake), context_turns=3)
    df = out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df["turn_idx"] = df["turn_idx"].astype("int64")
    return df[["conv_id", "turn_idx", "context", "target"]]


def q_assign_split(sf_dir: str):
    """Deterministic train/val/test split (80/10/10) by doc_id hash -
    stable across runs, no shuffle, leakage-free per key."""
    from ray.data.aggregate import Sum

    from ..functions.transcripts import assign_split

    ds = assign_split(
        _documents(sf_dir, ["doc_id"]),
        key_col="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.group_by("split")
            .aggregate([("doc_id", "count")])
            .rename_columns(["split", "n_docs"])
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("split")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )
    df = out.sort("split").to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    return df


def q_pack_sequences(sf_dir: str):
    """Sequence packing (context-window assembly): token-count the
    corpus, then greedy first-fit bins per hash bucket - each bucket
    packed in one pass, bins never span buckets. num_buckets fixed at 8
    so the oracle's bucket arithmetic (doc_id % 8) matches."""
    from ..functions.text import TokenCounter, pack_sequences

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        TokenCounter, batch_format="pandas", concurrency=(1, 4)
    )
    out = pack_sequences(
        ds, token_col="n_tokens", id_col="doc_id", max_tokens=256, num_buckets=8
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("n_tokens", "pack_bucket", "bin_id", "bin_tokens"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "n_tokens", "pack_bucket", "bin_id", "bin_tokens"]]


def q_mix_corpora(sf_dir: str):
    """Deterministic training-mixture assembly: documents at 70% +
    event texts at 10%, hash-sampled (nested/reproducible), tagged and
    unioned - no shuffle anywhere."""
    from ..functions.mixing import mix_corpora

    docs = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: pa.table({"sid": b["doc_id"], "text": b["text"]}),
        batch_format="pyarrow",
    )
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "props"]
    ).map_batches(
        lambda b: pa.table({"sid": b["event_id"], "text": b["props"]}),
        batch_format="pyarrow",
    )
    out = mix_corpora(
        {"docs": (docs, 0.7), "events": (ev, 0.1)}, id_col="sid"
    )
    df = out.to_pandas().sort_values(["source", "sid"]).reset_index(drop=True)
    return df[["source", "sid", "text"]]


def q_redact_pii(sf_dir: str):
    """PII redaction over documents with deterministic synthetic PII
    injected (the corpus itself is clean), so the op's replacements are
    observable and oracle-verifiable."""
    from ..functions.text import PIIRedactor

    def inject(b: pd.DataFrame) -> pd.DataFrame:
        did = b["doc_id"].astype("int64")
        b["text"] = (
            b["text"].fillna("")
            + " contact user"
            + did.astype(str)
            + "@example.com from 10.0.0."
            + (did % 256).astype(str)
        )
        return b

    ds = (
        _documents(sf_dir, ["doc_id", "text"])
        .map_batches(inject, batch_format="pandas")
        .map_batches(PIIRedactor, batch_format="pandas", concurrency=(1, 4))
    )
    return (
        ds.select_columns(["doc_id", "pii_hits", "text_redacted"])
        .sort("doc_id")
        .to_pandas()
    )


def q_clean_text(sf_dir: str):
    """Whitespace normalization (collapse runs + strip) - the canonical
    pre-tokenization cleanup stage."""
    from ..functions.text import TextCleaner

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        TextCleaner, batch_format="pandas", concurrency=(1, 4)
    )
    return ds.select_columns(["doc_id", "text_clean"]).sort("doc_id").to_pandas()


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: exactly 3 events per
    event_type, chosen by multiplicative-hash order (a reproducible
    'random' draw with no RNG state, SQL-mirrorable) - implemented as
    topk_per_group over the hash."""
    from ..functions.aggregates import topk_per_group

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "event_type"]
    )

    def add_hash(b: pa.Table) -> pa.Table:
        from ..functions.mixing import knuth_hash32

        h = knuth_hash32(b["event_id"].to_numpy(zero_copy_only=False))
        return b.append_column("h", pa.array(h.astype(np.int64), pa.int64()))

    df = topk_per_group(
        ev.map_batches(add_hash, batch_format="pyarrow"),
        group_col="event_type",
        order_col="h",
        tiebreak_col="event_id",
        k=3,
    )
    df["event_id"] = df["event_id"].astype("int64")
    return df[["event_type", "rank", "event_id"]]


def q_join_orders_mktsegment(sf_dir: str):
    """Distributed hash (co-partition) join: orders ⋈ customer on
    custkey - ONE shuffle co-partitions both sides, one vectorized
    pandas merge per bucket - then a rollup per market segment. The
    large⋈large complement of the broadcast join
    (q_join_orders_nation)."""
    from ..functions.joins import hash_join

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).map_batches(
        lambda b: pa.table(
            {"o_custkey": b["c_custkey"], "c_mktsegment": b["c_mktsegment"]}
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(orders, cust, on="o_custkey", how="inner")

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(b["o_totalprice"], 100.0)), pa.int64())
        t = pa.table({"c_mktsegment": b["c_mktsegment"], "price_cents": cents})
        return (
            t.group_by("c_mktsegment")
            .aggregate([("price_cents", "sum"), ("price_cents", "count")])
            .rename_columns(["c_mktsegment", "price_cents", "n_orders"])
        )

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("price_cents", alias_name="price_cents"),
        )
    )
    df = out.sort("c_mktsegment").to_pandas()
    for c in ("n_orders", "price_cents"):
        df[c] = df[c].astype("int64")
    return df[["c_mktsegment", "n_orders", "price_cents"]]


def q_term_topk(sf_dir: str):
    """Corpus term frequency (map-reduce word count): partial counts
    per block, distributed groupby-sum over terms, global top-100."""
    from ..functions.text import term_frequencies

    return term_frequencies(_documents(sf_dir, ["text"]), top_n=100)


def q_distinct_users_by_type(sf_dir: str):
    """Exact distributed COUNT(DISTINCT user_id) per event_type: local
    Arrow dedup -> one value-bucketed shuffle with a vectorized global
    dedup per bucket -> tiny per-group sum."""
    from ..functions.aggregates import distinct_count

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    df = distinct_count(ev, "event_type", "user_id")
    return df.rename(columns={"n_distinct": "n_users"})


def q_window_events_hopping(sf_dir: str):
    """Sliding (hopping) event-time windows - 1h windows every 30min:
    each event replicated to its 2 windows inside map_batches, partial
    combine per block, one small groupby-sum. Tumbling is the
    size==hop special case (see q_window_events_hourly)."""
    from ..functions.aggregates import hopping_window

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )
    out = hopping_window(ev, size_s=3600, hop_s=1800)
    df = out.sort("window_start").to_pandas()
    for c in ("n_events", "value_cents"):
        df[c] = df[c].astype("int64")
    return df[["window_start", "n_events", "value_cents"]]


def q_trailing_window(sf_dir: str):
    """Per-event trailing 1h count + integer sum per user (RANGE-window
    semantics incl. equal-ts peers), vectorized segment-offset
    searchsorted — no per-key Python."""
    from ..functions.windows import trailing_window

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    ).map_batches(
        lambda b: b.assign(v_int=(b["event_id"] % 97).astype("int64")),
        batch_format="pandas",
    )
    out = trailing_window(
        ev, key="user_id", window=pd.Timedelta(hours=1), value_col="v_int"
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    df["ts"] = df["ts"].astype("datetime64[us]")
    for c in ("event_id", "user_id", "v_int", "trailing_n", "trailing_sum"):
        df[c] = df[c].astype("int64")
    return df


def q_heavy_hitters(sf_dir: str):
    """Misra-Gries heavy hitters: users with > 1/150 of all events,
    exact counts via sketch-merge + candidate recount (no full
    user-cardinality shuffle)."""
    from ..functions.aggregates import heavy_hitters

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    out = heavy_hitters(ev, "user_id", den=150)
    out["user_id"] = out["user_id"].astype("int64")
    return out


def q_topk_events_per_type(sf_dir: str):
    """Per-group top-k: the 3 highest-value events per event_type
    (ties by event_id). Per-batch local prune to k rows per group keeps
    the shuffle result-sized."""
    from ..functions.aggregates import topk_per_group

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )
    df = topk_per_group(
        ev, group_col="event_type", order_col="value", tiebreak_col="event_id", k=3
    )
    df["event_id"] = df["event_id"].astype("int64")
    return df[["event_type", "rank", "event_id"]]


def q_sample_per_group(sf_dir: str):
    """Exact-3-per-stratum deterministic sample (eval-set draw): rank
    by the shared Knuth hash within each event_type, keep rank <= 3;
    the pre-shuffle prune forwards <=3 rows per (block, group)."""
    from ..functions.mixing import sample_per_group

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type"],
    )
    out = sample_per_group(
        ev, group_col="event_type", n=3, id_col="event_id", seed=0
    )
    out = out.sort_values(["event_type", "rank"]).reset_index(drop=True)
    out["rank"] = out["rank"].astype("int64")
    out["event_id"] = out["event_id"].astype("int64")
    return out[["event_type", "rank", "event_id"]]


def q_sample_deterministic(sf_dir: str):
    """Deterministic ~5% sample via multiplicative hashing (Knuth) of
    the key - reproducible across runs/processes (unlike builtin
    hash()), embarrassingly parallel, no shuffle, SQL-mirrorable."""
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def pick(b: pa.Table) -> pa.Table:
        from ..functions.mixing import knuth_hash32

        h = knuth_hash32(b["event_id"].to_numpy(zero_copy_only=False))
        return b.filter(pa.array(h % np.uint64(20) == 0))

    ds = ev.map_batches(pick, batch_format="pyarrow")
    return ds.sort("event_id").to_pandas()


def q_value_quantiles_by_type(sf_dir: str):
    """Exact nearest-rank p50/p90/p99 of value (in integer cents) per
    event_type via a distributed counting histogram - shuffle volume is
    O(distinct values), not O(rows); no approximation sketch needed
    when the measure is discrete."""
    from ..functions.aggregates import grouped_quantiles

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def cents(b: pa.Table) -> np.ndarray:
        return pc.cast(pc.floor(pc.multiply(b["value"], 100.0)), pa.int64()).to_numpy(
            zero_copy_only=False
        )

    return grouped_quantiles(ev, group_col="event_type", cents_expr=cents)


def q_hll_users_sparse(sf_dir: str):
    """Approximate distinct users per event_type via SPARSE grouped
    HLL (p=8): per-(group, register) max partials — the exchange is
    bounded by groups × 256 ROWS, where the dense sibling
    `hll_users_by_type` ships a full 16 KiB register block per group
    per batch (fine for few groups, heavy at 10^6 strata). Rows-only
    (estimate); the pytest pins the error bound and layout-invariant
    determinism."""
    from ..functions.sketch import hll_distinct_by_group

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    return hll_distinct_by_group(
        ev, group_col="event_type", value_col="user_id"
    )


def q_cohort_retention_weekly(sf_dir: str):
    """Weekly cohort retention grid: first-activity week per user
    (min partials + broadcast map), distinct (user, week) exchange,
    grid-sized counts — exact integers end to end."""
    from ..functions.aggregates import cohort_retention

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return cohort_retention(ev, key="user_id", ts_col="ts")


def q_histogram_value(sf_dir: str):
    """Equi-width 20-bin histogram of value cents over [0, 100000):
    per-batch bincount partials, tiny groupby-sum, zeros explicit."""
    from ..functions.aggregates import histogram_fixed

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["value"]
    )

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(b["value"], 100.0)), pa.int64())
        return pa.table({"cents": c})

    return histogram_fixed(
        ev.map_batches(cents, batch_format="pyarrow"),
        col="cents", lo=0, hi=100_000, nbins=20,
    )


def q_gini_value_by_type(sf_dir: str):
    """Gini concentration of value cents per event_type from the
    counting histogram — exact int64 rank-weighted numerator, one
    straight-line ppm division; SQL-exact vs a window mirror."""
    from ..functions.aggregates import grouped_gini

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def cents(b: pa.Table) -> np.ndarray:
        return pc.cast(
            pc.floor(pc.multiply(b["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)

    out = grouped_gini(ev, group_col="event_type", cents_expr=cents)
    num = out["gini_num"].to_numpy(dtype=np.float64)
    nf = out["n"].to_numpy(dtype=np.float64)
    sx = out["sum_x"].to_numpy(dtype=np.float64)
    out["gini_ppm"] = np.floor(num / (nf * sx) * 1e6).astype("int64")
    return out[["event_type", "n", "sum_x", "gini_num", "gini_ppm"]]


def q_mad_value_by_type(sf_dir: str):
    """Robust location/scale per event_type: exact median + MAD of
    value cents via two counting-histogram passes (exchange bounded by
    the value domain) and a broadcast median map."""
    from ..functions.aggregates import grouped_mad

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def cents(b: pa.Table) -> np.ndarray:
        return pc.cast(
            pc.floor(pc.multiply(b["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)

    out = grouped_mad(ev, group_col="event_type", cents_expr=cents)
    out = out.sort_values("event_type").reset_index(drop=True)
    for c in ("median", "mad"):
        out[c] = out[c].astype("int64")
    return out[["event_type", "median", "mad"]]


def q_bloom_semi_join(sf_dir: str):
    """Bloom-pruned semi join: lineitem ⋉ urgent orders. The urgent
    orderkeys build a compact bitset (10 bits/key, broadcast once);
    every lineitem batch is membership-tested vectorized BEFORE the
    join shuffle, so only ~20% of the big side (+ ~1% false positives)
    pays the exchange; the exact semi join removes the false positives.
    Result is byte-identical to the plain semi join — the bloom only
    cuts shuffle volume, the pattern that matters at 100 TB."""
    from ..functions.bloom import bloom_semi_join

    urgent = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.filter(
                    pc.equal(b["o_orderpriority"], "1-URGENT")
                )["o_orderkey"]
            }
        ),
        batch_format="pyarrow",
    )
    items = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity", "l_returnflag"],
    )
    kept = bloom_semi_join(items, urgent, on="l_orderkey")

    def partial(b: pd.DataFrame) -> pa.Table:
        cents = np.floor(b["l_quantity"].to_numpy() * 100.0).astype(np.int64)
        t = pa.table(
            {"l_returnflag": pa.array(b["l_returnflag"]), "qty_cents": pa.array(cents)}
        )
        return (
            t.group_by("l_returnflag")
            .aggregate([("qty_cents", "sum"), ("qty_cents", "count")])
            .rename_columns(["l_returnflag", "qty_cents", "n_items"])
        )

    from ray.data.aggregate import Sum

    out = (
        kept.map_batches(partial, batch_format="pandas")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("qty_cents", alias_name="qty_cents"),
        )
    )
    df = out.sort("l_returnflag").to_pandas()
    for c in ("n_items", "qty_cents"):
        df[c] = df[c].astype("int64")
    return df[["l_returnflag", "n_items", "qty_cents"]]


def q_vocab_coverage(sf_dir: str):
    """Model-based quality filter, corpus-trained: the top-256 corpus
    terms (distributed word count, result-sized) become a broadcast
    vocabulary; each document is scored by its in-vocabulary token
    ratio (integer per-mille — junk/boilerplate/foreign docs score
    low). The train-on-corpus-stats -> broadcast -> score-distributed
    shape of every statistical quality filter (e.g. KenLM-style LM
    scoring), with exact integer math so the oracle matches."""
    from ..functions.text import term_frequencies, vocab_coverage

    docs = _documents(sf_dir, ["doc_id", "text"])
    vocab = term_frequencies(docs, top_n=256)["term"]
    return vocab_coverage(docs, set(vocab))


def q_rank_events_per_user(sf_dir: str):
    """Per-key ranking retained on every row (row_number() OVER
    (PARTITION BY user ORDER BY value DESC, id)): one bucketed shuffle,
    one sort + numpy cumulative masks per bucket - zero per-key
    Python."""
    from ..functions.windows import rank_in_group

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "value"],
    )

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(b["value"], 100.0)), pa.int64())
        return b.drop_columns("value").append_column("value_cents", c)

    out = rank_in_group(
        ev.map_batches(cents, batch_format="pyarrow"),
        key="user_id",
        order_col="value_cents",
        tiebreak="event_id",
        descending=True,
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    for c in ("event_id", "user_id", "value_cents", "rank"):
        df[c] = df[c].astype("int64")
    return df[["event_id", "user_id", "value_cents", "rank"]]


def q_cumsum_user_value(sf_dir: str):
    """Running per-user value total (SUM() OVER ... ROWS UNBOUNDED
    PRECEDING): one bucketed shuffle, one sort + rebased global cumsum
    per bucket — zero per-key Python. Integer cents keep the running
    sums bit-identical to the SQL window."""
    from ..functions.windows import cumulate_in_group

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def prep(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(b["value"], 100.0)), pa.int64())
        ts_us = pc.cast(b["ts"], pa.int64())
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": ts_us,
                "value_cents": c,
            }
        )

    out = cumulate_in_group(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        order_cols=["ts_us", "event_id"],
        value_cols=["value_cents"],
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    for c in ("event_id", "user_id", "cum_n", "cum_value_cents"):
        df[c] = df[c].astype("int64")
    return df[["event_id", "user_id", "cum_n", "cum_value_cents"]]


def q_explode_embeddings(sf_dir: str):
    """UNNEST the embedding list column to (vec_id, idx, val) rows via
    zero-copy Arrow list kernels — no Python per row, no shuffle."""
    from ..functions.aggregates import explode_list

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    out = explode_list(emb, id_col="vec_id", list_col="embedding")
    df = out.to_pandas().sort_values(["vec_id", "idx"]).reset_index(drop=True)
    for c in ("vec_id", "idx"):
        df[c] = df[c].astype("int64")
    return df[["vec_id", "idx", "val"]]


def q_first_last_user(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE per user under the (ts, event_id)
    total order — two boundary gathers after one bucketed sort; every
    row retained."""
    from ..functions.windows import first_last_in_group

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "event_type": b["event_type"],
            }
        )

    out = first_last_in_group(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        order_cols=["ts_us", "event_id"],
        value_cols=["event_type"],
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    for c in ("event_id", "user_id"):
        df[c] = df[c].astype("int64")
    return df[["event_id", "user_id", "first_event_type", "last_event_type"]]


def q_resample_user_6h(sf_dir: str):
    """Gap-filled per-user 6h event counts: partial-agg exchange, then
    a dense repeat/arange grid merge per key bucket — the zeros that a
    plain groupby drops, needed by rate/trend math."""
    from ..functions.windows import resample_fill

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    out = resample_fill(
        ev, key="user_id", ts_col="ts", bucket_us=21_600_000_000
    )
    df = out.to_pandas().sort_values(["user_id", "bs"]).reset_index(drop=True)
    for c in ("user_id", "bs", "n"):
        df[c] = df[c].astype("int64")
    return df[["user_id", "bs", "n"]]


def q_ewma_user_value(sf_dir: str):
    """Per-user EWMA of value cents under the (ts, event_id) total
    order (alpha=0.25, adjust=False streaming recursion): one bucketed
    shuffle, one grouped-Cython ewm pass per bucket. Rows-only — the
    recursion has no order-independent SQL form; pytest pins parity
    with a single-process reference."""
    from ..functions.windows import ewma_in_group

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def prep(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(b["value"], 100.0)), pa.int64())
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "value_cents": c,
            }
        )

    out = ewma_in_group(
        ev.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        order_cols=["ts_us", "event_id"],
        value_col="value_cents",
        alpha=0.25,
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    return df[["event_id", "user_id", "value_cents", "ewma_value_cents"]]


def q_negative_samples_docs(sf_dir: str):
    """Contrastive negative sampling: 3 deterministic hash-drawn
    corpus negatives per anchor doc — broadcast rank array, vectorized
    repeat + gather per batch; SQL mirror = identical hash joined to
    row_number() ranks."""
    from ..functions.mixing import negative_samples

    docs = _documents(sf_dir, ["doc_id"])
    out = negative_samples(docs, id_col="doc_id", m=3, seed=11)
    df = out.to_pandas().sort_values(["doc_id", "j"]).reset_index(drop=True)
    for c in ("doc_id", "j", "neg_id"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "j", "neg_id"]]


def q_percent_rank_events(sf_dir: str):
    """PERCENT_RANK / CUME_DIST per event_type over value cents: the
    rank kernel's one-shuffle shape; both outputs are straight-line
    double divisions of exact integers, so they hash-match the SQL
    windows bit-for-bit (ties share ranks, so no tiebreak order
    dependence)."""
    from ..functions.windows import rank_in_group

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(b["value"], 100.0)), pa.int64())
        return b.drop_columns("value").append_column("value_cents", c)

    out = rank_in_group(
        ev.map_batches(cents, batch_format="pyarrow"),
        key="event_type",
        order_col="value_cents",
        method=["percent_rank", "cume_dist"],
        out_col=["pct_rank", "cume_dist"],
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    for c in ("event_id", "value_cents"):
        df[c] = df[c].astype("int64")
    return df[["event_id", "event_type", "value_cents", "pct_rank", "cume_dist"]]


def q_mmr_select_embeddings(sf_dir: str):
    """Diversity-aware selection (MMR, SIGIR'98): 10 picks at λ=0.5 —
    k embarrassingly-parallel passes with the ≤k selected vectors
    broadcast; deterministic (ties → min id) and layout-invariant.
    Rows-only: greedy float argmax has no SQL form; pytest pins
    cluster coverage + determinism."""
    from ..functions.similarity import mmr_select

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    out = mmr_select(emb, k=10, lam=0.5)
    out["id"] = out["id"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    out["score_ub"] = np.floor(
        out["score"].to_numpy(dtype=np.float64) * 1048576.0
    ).astype("int64")
    return out[["rank", "id", "score_ub"]]


def q_pca_embeddings(sf_dir: str):
    """Distributed PCA: one streaming pass of (sum, X^T X, n) partials
    (d-vector + d x d per block - rows never concentrate), driver
    eigendecomposition of the d x d covariance, broadcast map-side
    projection to 8 components. The dimension-reduction step before
    ANN / clustering at corpus scale. Rows-only: eigendecomposition has
    no SQL oracle; the pytest asserts parity with a single-process
    reference."""
    from ..functions.similarity import pca_embeddings

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    out = pca_embeddings(emb, k=8).to_pandas().sort_values("vec_id")
    out["norm2"] = [float(np.dot(v, v)) for v in out["pca"]]
    return out[["vec_id", "norm2"]].reset_index(drop=True)


def q_compression_score(sf_dir: str):
    """Compression-ratio + byte-entropy quality signals (Gopher-style
    low-entropy filter). zlib has no SQL analogue -> rows-only; the
    pytest pins repetitive vs random inputs."""
    from ..functions.text import CompressionScorer

    docs = _documents(sf_dir, ["doc_id", "text"])
    out = docs.map_batches(
        CompressionScorer, batch_format="pandas", concurrency=(1, 8)
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def q_image_features(sf_dir: str):
    """REAL image decode distributed: deterministic synthetic PPM
    payloads (one 16x16 gradient per doc) decoded, resized and
    feature-extracted by the actor-pool ImageFeatures stage - the
    library-free half of the multimodal path (compressed codecs remain
    stubbed). Rows-only; the pytest asserts pixel-exact decode."""
    from ..functions.multimodal import ImageFeatures

    docs = _documents(sf_dir, ["doc_id"])

    def make_ppm(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            px = (
                (np.arange(16)[:, None] * 16 + np.arange(16)[None, :] + int(i))
                % 256
            ).astype(np.uint8)
            img = np.stack([px, px.T, np.full((16, 16), int(i) % 251, np.uint8)], axis=2)
            payloads.append(b"P6\n16 16\n255\n" + img.tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_ppm, batch_format="pyarrow")
        .map_batches(
            ImageFeatures(target_size=(8, 8)),
            batch_format="pyarrow",
            batch_size=64,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "width", "height", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out[["media_id", "width", "height", "sum_r", "sum_g", "sum_b"]]


def q_image_png_decode(sf_dir: str):
    """REAL compressed-image decode, SQL-exact: per doc a 16x16 RGB
    image with closed-form pixels (per-channel base + vertical gradient
    + right-half step) is PNG-ENCODED with filter type doc_id % 5 — so
    correctness sweeps every PNG defilter path (None/Sub/Up/Average/
    Paeth) through zlib-compressed payloads — then decoded + resized +
    summed by the actor-pool ImageFeatures stage. The oracle computes
    the same sums in closed form from doc_id: any defilter bug breaks
    the hash."""
    from ..functions.multimodal import ImageFeatures, encode_png

    docs = _documents(sf_dir, ["doc_id"])

    def make_png(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        r = np.arange(16)[:, None, None]
        x = np.arange(16)[None, :, None]
        grad = 3 * r + 10 * (x >= 8)
        payloads = []
        for i in ids:
            base = np.array(
                [int(i) % 150, (int(i) * 7) % 150, (int(i) * 13) % 150]
            )[None, None, :]
            img = (base + grad).astype(np.uint8)
            payloads.append(encode_png(img, filter_type=int(i) % 5))
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_png, batch_format="pyarrow")
        .map_batches(
            ImageFeatures(target_size=(8, 8)),
            batch_format="pyarrow",
            batch_size=64,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "width", "height", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out[["media_id", "width", "height", "sum_r", "sum_g", "sum_b"]]


def q_image_webp_decode(sf_dir: str):
    """REAL lossless-WebP (VP8L) decode, SQL-exact: per doc an 8x8 RGB
    image with closed-form pixels (per-channel base + row gradient +
    right-half step) is VP8L-ENCODED with doc_id % 5 selecting the
    feature path (plain literals / subtract-green / predictor+cache /
    palette / LZ77-RLE + RLE code lengths) — so correctness sweeps the
    transform inverses, color cache, backward references and both
    prefix-code length encodings through real bitstreams — then
    decoded + summed by the same actor-pool ImageFeatures stage as
    PNG/JPEG. Lossless decode makes the oracle a closed form of
    doc_id: any bit-reader/Huffman/transform bug breaks the hash."""
    from ..functions.multimodal import ImageFeatures
    from ..functions.webp import encode_webp_lossless

    docs = _documents(sf_dir, ["doc_id"])

    def make_webp(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        r = np.arange(8)[:, None, None]
        x = np.arange(8)[None, :, None]
        grad = 2 * r + 6 * (x >= 4)
        payloads = []
        for i in ids:
            i = int(i)
            base = np.array(
                [i % 140, (i * 11) % 140, (i * 17) % 140]
            )[None, None, :]
            img = (base + grad).astype(np.uint8)
            variant = i % 5
            if variant == 0:
                payloads.append(encode_webp_lossless(img))
            elif variant == 1:
                payloads.append(
                    encode_webp_lossless(img, use_subtract_green=True)
                )
            elif variant == 2:
                payloads.append(
                    encode_webp_lossless(
                        img, predictor_mode=2, cache_bits=3
                    )
                )
            elif variant == 3:
                payloads.append(encode_webp_lossless(img, use_palette=True))
            else:
                payloads.append(
                    encode_webp_lossless(
                        img, lz77_rle=True, rle_code_lengths=True,
                        cache_bits=4,
                    )
                )
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_webp, batch_format="pyarrow")
        .map_batches(
            ImageFeatures(target_size=(8, 8)),
            batch_format="pyarrow",
            batch_size=64,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "width", "height", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out[["media_id", "width", "height", "sum_r", "sum_g", "sum_b"]]


def q_image_webp_lossy_decode(sf_dir: str):
    """REAL lossy-WebP (VP8 key frame) decode, SQL-exact: per doc a
    FLAT 16x16 RGB image (channels closed-form in doc_id) is encoded
    by the in-repo RFC 6386 VP8 encoder (``functions/vp8.py``) with a
    per-doc quantizer index and a nonzero loop-filter level, then
    decoded + summed by the same actor-pool ImageFeatures stage as
    PNG/JPEG/VP8L. A flat image makes the LOSSY chain a closed form
    the oracle replays in integer SQL: RGB→YUV (BT.601), the
    encoder's 16x16 mode pick (DC 128 / V 127 / H 129 edge
    constants), forward-DCT DC, the Y2 WHT round trip, dc-table
    quantization, inverse transforms and the YUV→RGB inverse — any
    bool-coder / token / dequant / transform / filter bug breaks the
    hash. The codec itself is additionally validated bit-exact
    against libwebp-encoded streams in ``tests/test_vp8.py``."""
    from ..functions.multimodal import ImageFeatures
    from ..functions.vp8 import encode_webp_lossy

    docs = _documents(sf_dir, ["doc_id"])

    def make_webp(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            i = int(i)
            rgb = np.full(
                (16, 16, 3),
                [i % 200, (i * 7) % 200, (i * 13) % 200],
                np.uint8,
            )
            payloads.append(
                encode_webp_lossy(rgb, qi=8 + (i % 80), filter_level=9)
            )
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_webp, batch_format="pyarrow")
        .map_batches(
            ImageFeatures(target_size=(16, 16)),
            batch_format="pyarrow",
            batch_size=64,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "width", "height", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out[["media_id", "width", "height", "sum_r", "sum_g", "sum_b"]]


def q_image_gif_decode(sf_dir: str):
    """REAL GIF decode, SQL-exact: per doc an 8x8 four-color
    palettized image with closed-form palette (channel values derived
    from doc_id) and a uniform (row+col)%4 index pattern - 16 pixels
    per color - GIF-encoded by the in-repo LZW encoder (odd doc_ids
    interlaced, exercising the four-pass row order), then decoded +
    summed by the same actor-pool ImageFeatures stage. Lossless
    decode makes the oracle a closed form of doc_id: any LZW / palette
    / interlace bug breaks the hash. The codec is additionally
    validated against SYSTEM-giflib-encoded streams in
    ``tests/test_gif.py``."""
    from ..functions.gif import encode_gif
    from ..functions.multimodal import ImageFeatures

    docs = _documents(sf_dir, ["doc_id"])

    def make_gif(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        rr, cc = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        idx = ((rr + cc) % 4).astype(np.uint8)
        payloads = []
        for i in ids:
            i = int(i)
            pal = np.stack(
                [
                    np.array([(i + 31 * k) % 256 for k in range(4)]),
                    np.array([(i * 3 + 57 * k) % 256 for k in range(4)]),
                    np.array([(i * 7 + 89 * k) % 256 for k in range(4)]),
                ],
                axis=1,
            ).astype(np.uint8)
            payloads.append(
                encode_gif(pal[idx], interlace=bool(i % 2))
            )
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_gif, batch_format="pyarrow")
        .map_batches(
            ImageFeatures(target_size=(8, 8)),
            batch_format="pyarrow",
            batch_size=64,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "width", "height", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out[["media_id", "width", "height", "sum_r", "sum_g", "sum_b"]]


def q_image_jpeg_decode(sf_dir: str):
    """REAL baseline-JPEG decode, SQL-exact: per doc a 16x16 4:2:0
    DC-only JPEG (custom canonical Huffman tables carried in DHT, hand
    -coded entropy bits) with closed-form Y/Cb/Cr levels derived from
    doc_id; decode + resize + sum through the same actor-pool stage as
    PNG. The oracle recomputes the JFIF YCbCr→RGB conversion in SQL -
    any Huffman/dequant/IDCT/upsample/color bug breaks the hash."""
    from ..functions.multimodal import ImageFeatures

    docs = _documents(sf_dir, ["doc_id"])

    def dc_jpeg(y_diff: int, cb_diff: int, cr_diff: int) -> bytes:
        # categories 0..6 at code length 3 (code == symbol)
        dc_bits = bytes([0, 0, 7] + [0] * 13)
        dc_vals = bytes(range(7))
        ac_bits = bytes([0, 1] + [0] * 14)  # EOB only, 2-bit code 00
        ac_vals = bytes([0x00])
        bits: list[int] = []

        def code(length, c):
            bits.extend((c >> i) & 1 for i in range(length - 1, -1, -1))

        def block(diff):
            if diff == 0:
                n, v = 0, 0
            else:
                n = abs(diff).bit_length()
                v = diff if diff > 0 else diff + (1 << n) - 1
            code(3, n)
            code(n, v) if n else None
            code(2, 0)  # EOB

        for d in (y_diff, 0, 0, 0, cb_diff, cr_diff):
            block(d)
        pad = bits + [1] * ((-len(bits)) % 8)
        raw = bytearray()
        for i in range(0, len(pad), 8):
            b = 0
            for j in pad[i:i + 8]:
                b = (b << 1) | j
            raw.append(b)
            if b == 0xFF:
                raw.append(0x00)

        def seg(marker, body):
            return (
                b"\xff" + bytes([marker])
                + (len(body) + 2).to_bytes(2, "big") + body
            )

        head = b"\xff\xd8"
        head += seg(0xDB, bytes([0x00]) + bytes([16] * 64))
        head += seg(0xC4, bytes([0x00]) + dc_bits + dc_vals)
        head += seg(0xC4, bytes([0x10]) + ac_bits + ac_vals)
        head += seg(
            0xC0,
            bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
            + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        head += seg(0xDA, bytes([3, 1, 0, 2, 0, 3, 0, 0, 63, 0]))
        return head + bytes(raw) + b"\xff\xd9"

    def make_jpeg(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            i = int(i)
            y_diff = (i % 30) + 5                 # Y level 138..196 (even)
            cb_diff = ((i % 5) - 2) * 4           # Cb offset {-16,-8,0,8,16}
            cr_diff = ((i % 7) - 3) * 4           # Cr offset {-24..24 step 8}
            payloads.append(dc_jpeg(y_diff, cb_diff, cr_diff))
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_jpeg, batch_format="pyarrow")
        .map_batches(
            ImageFeatures(target_size=(8, 8)),
            batch_format="pyarrow",
            batch_size=64,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "width", "height", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out[["media_id", "width", "height", "sum_r", "sum_g", "sum_b"]]


def q_image_jpeg_progressive(sf_dir: str):
    """REAL progressive-JPEG decode, SQL-exact: the same closed-form
    16x16 4:2:0 DC-only image family as ``image_jpeg_decode``, but
    encoded as SOF2 with FOUR scans - a coarse interleaved DC scan at
    Al=1, a DC successive-approximation refinement (Ah=1, one raw low
    bit per block), and per-component AC scans whose Y scan covers its
    4 blocks with a single EOB4 run - so the oracle hash pins spectral
    selection, successive approximation AND EOB-run decoding. Oracle =
    the identical JFIF conversion SQL as the baseline query."""
    from ..functions.multimodal import ImageFeatures

    docs = _documents(sf_dir, ["doc_id"])

    def prog_jpeg(y_val: int, cb_val: int, cr_val: int) -> bytes:
        dc_bits = bytes([0, 0, 7] + [0] * 13)  # categories 0..6, len 3
        dc_vals = bytes(range(7))
        # AC table: EOB1 (len-2 code 0) + EOB4 symbol 0x20 (len-3 code 4)
        ac_bits = bytes([0, 1, 1] + [0] * 13)
        ac_vals = bytes([0x00, 0x20])

        def seg(marker, body):
            return (
                b"\xff" + bytes([marker])
                + (len(body) + 2).to_bytes(2, "big") + body
            )

        def pack(bits):
            pad = bits + [1] * ((-len(bits)) % 8)
            raw = bytearray()
            for i in range(0, len(pad), 8):
                b = 0
                for j in pad[i:i + 8]:
                    b = (b << 1) | j
                raw.append(b)
                if b == 0xFF:
                    raw.append(0x00)
            return bytes(raw)

        def dc_diff_bits(bits, diff):
            if diff == 0:
                n, v = 0, 0
            else:
                n = abs(diff).bit_length()
                v = diff if diff > 0 else diff + (1 << n) - 1
            bits.extend((n >> i) & 1 for i in range(2, -1, -1))
            bits.extend((v >> i) & 1 for i in range(n - 1, -1, -1))

        # scan 1: interleaved DC, Al=1 - diffs in the SHIFTED domain
        # (all four Y blocks share the value, so diffs are v>>1,0,0,0)
        b1: list[int] = []
        for d in (y_val >> 1, 0, 0, 0, cb_val >> 1, cr_val >> 1):
            dc_diff_bits(b1, d)
        # scan 2: DC refinement, Ah=1 Al=0 - one raw low bit per block
        b2 = [y_val & 1] * 4 + [cb_val & 1, cr_val & 1]
        # scans 3-5: AC bands, all zero - Y: EOB4 (r=2 + 2 bits), C: EOB1
        b3 = [0, 1, 0, 0, 0]  # len-3 canonical code 2 = 0b010, + 2 bits
        b4 = [0, 0]           # len-2 code 0 = EOB1
        b5 = [0, 0]

        head = b"\xff\xd8"
        head += seg(0xDB, bytes([0x00]) + bytes([16] * 64))
        head += seg(0xC4, bytes([0x00]) + dc_bits + dc_vals)
        head += seg(0xC4, bytes([0x10]) + ac_bits + ac_vals)
        head += seg(
            0xC2,
            bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
            + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        out = head
        out += seg(0xDA, bytes([3, 1, 0, 2, 0, 3, 0, 0, 0, 0x01])) + pack(b1)
        out += seg(0xDA, bytes([3, 1, 0, 2, 0, 3, 0, 0, 0, 0x10])) + pack(b2)
        out += seg(0xDA, bytes([1, 1, 0, 1, 63, 0x00])) + pack(b3)
        out += seg(0xDA, bytes([1, 2, 0, 1, 63, 0x00])) + pack(b4)
        out += seg(0xDA, bytes([1, 3, 0, 1, 63, 0x00])) + pack(b5)
        return out + b"\xff\xd9"

    def make_jpeg(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            i = int(i)
            y_val = (i % 30) + 5                  # both parities: exercises
            cb_val = ((i % 5) - 2) * 4            # the refinement bit
            cr_val = ((i % 7) - 3) * 4
            payloads.append(prog_jpeg(y_val, cb_val, cr_val))
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_jpeg, batch_format="pyarrow")
        .map_batches(
            ImageFeatures(target_size=(8, 8)),
            batch_format="pyarrow",
            batch_size=64,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "width", "height", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out[["media_id", "width", "height", "sum_r", "sum_g", "sum_b"]]


def q_video_frames(sf_dir: str):
    """REAL video-column plumbing, SQL-exact on the sampling contract:
    per doc an uncompressed AVI with (doc_id % 5) + 2 frames is
    assembled, decoded frame-by-frame and sampled every 2nd frame by
    the actor-pool ``VideoFrameFeatures`` stage; the oracle generates
    the expected (media_id, frame_idx) grid. Frame-hash math is pinned
    by pytest (analytic dHash)."""
    from ..functions.multimodal import VideoFrameFeatures

    docs = _documents(sf_dir, ["doc_id"])

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    H, W = 8, 6
    stride = (W * 3 + 3) & ~3

    def make_avi(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            n = int(i) % 5 + 2
            avih = bytearray(56)
            avih[32:36] = W.to_bytes(4, "little")
            avih[36:40] = H.to_bytes(4, "little")
            hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", bytes(avih)))
            movi = b"movi"
            for f in range(n):
                px = ((np.arange(H * stride) + int(i) + 31 * f) % 251).astype(np.uint8)
                movi += chunk(b"00db", px.tobytes())
            body = b"AVI " + hdrl + chunk(b"LIST", movi)
            payloads.append(b"RIFF" + len(body).to_bytes(4, "little") + body)
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_avi, batch_format="pyarrow")
        .map_batches(VideoFrameFeatures(every_nth=2), batch_format="pyarrow",
                     batch_size=64)
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    out = out[out["decoded"]]
    out["media_id"] = out["media_id"].astype("int64")
    out["frame_idx"] = out["frame_idx"].astype("int64")
    return out[["media_id", "frame_idx"]].reset_index(drop=True)


def q_audio_quality(sf_dir: str):
    """Audio-curation gates, SQL-exact: per doc a 1000-frame PCM WAV
    with (doc_id%10)*10 leading silent frames, (doc_id%7)*5 trailing
    full-scale (clipped) frames and an alternating ±16384 square wave
    between; the oracle computes silence/clip permille and the exact
    zero-crossing count in closed form. Exercises the real WAV decode
    + AudioQuality DSP stage end to end (centroid is pytest-pinned,
    not SQL-expressible)."""
    from ..functions.multimodal import AudioQuality

    docs = _documents(sf_dir, ["doc_id"])

    def make_wav(b: pa.Table) -> pa.Table:
        import io
        import wave

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            i = int(i)
            z, c = (i % 10) * 10, (i % 7) * 5
            m = 1000 - z - c
            mid = np.where(np.arange(m) % 2 == 0, 16384, -16384)
            samples = np.concatenate(
                [np.zeros(z, np.int16), mid.astype(np.int16),
                 np.full(c, 32767, np.int16)]
            )
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(samples.tobytes())
            payloads.append(buf.getvalue())
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_wav, batch_format="pyarrow")
        .map_batches(AudioQuality(), batch_format="pyarrow", batch_size=64)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "silence_permille", "clip_permille", "zero_crossings"):
        out[c] = out[c].astype("int64")
    return out[
        ["media_id", "silence_permille", "clip_permille", "zero_crossings"]
    ]


def q_audio_flac_features(sf_dir: str):
    """REAL FLAC decode, SQL-exact: per doc a mono square wave
    (amplitude and length closed-form in doc_id) is FLAC-ENCODED with
    doc_id % 5 selecting the subframe path (fixed orders 1/2/0,
    VERBATIM, raw-escape residuals) — sweeping Rice coding, the fixed
    predictors and frame CRCs through real bitstreams — then decoded +
    reduced by the actor-pool AudioFeatures stage. The oracle computes
    n_frames / duration / peak / energy in closed form: any
    bit-reader/Rice/predictor/CRC bug breaks the hash."""
    from ..functions.flac import encode_flac
    from ..functions.multimodal import AudioFeatures

    docs = _documents(sf_dir, ["doc_id"])

    def make_flac(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            i = int(i)
            n = 400 + (i % 11) * 20
            a = 1000 + (i % 40) * 100
            s = np.where(np.arange(n) % 2 == 0, a, -a)
            v = i % 5
            if v == 0:
                payloads.append(encode_flac(s, 8000, order=1))
            elif v == 1:
                payloads.append(encode_flac(s, 8000, order=2))
            elif v == 2:
                payloads.append(encode_flac(s, 8000, order=0, rice_param=13))
            elif v == 3:
                payloads.append(encode_flac(s, 8000, verbatim=True))
            else:
                payloads.append(
                    encode_flac(s, 8000, order=2, escape_raw_bits=16)
                )
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_flac, batch_format="pyarrow")
        .map_batches(AudioFeatures(), batch_format="pyarrow", batch_size=64)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "n_frames", "sample_rate", "duration_ms", "peak",
              "energy"):
        out[c] = out[c].astype("int64")
    return out[
        ["media_id", "n_frames", "sample_rate", "duration_ms", "peak",
         "energy"]
    ]


def q_audio_metadata(sf_dir: str):
    """Header-only audio metadata scan, SQL-exact: per doc one of four
    container formats (doc_id % 4: PCM WAV / FLAC / MPEG-1-Layer-III
    MP3 with an ID3v2 tag / ADTS AAC) is synthesized with closed-form
    frame counts and rates, then scanned by the AudioMetadata stage —
    which reads ONLY headers (frame walks, STREAMINFO, fmt chunk), the
    way a 100-TB corpus is triaged before paying for decode. The
    oracle computes format/frames/rate/channels/duration/bitrate
    directly from doc_id."""
    from ..functions.flac import encode_flac
    from ..functions.multimodal import AudioMetadata

    docs = _documents(sf_dir, ["doc_id"])

    def make_payloads(b: pa.Table) -> pa.Table:
        import io
        import wave

        def mp3_frame(kbps_idx: int) -> bytes:
            from ..functions.multimodal import _MP3_BITRATES, _MP3_RATES

            kbps = _MP3_BITRATES[kbps_idx]
            h = ((0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
                 | (kbps_idx << 12) | (0 << 10) | (3 << 6))
            size = 144_000 * kbps // _MP3_RATES[0]
            return h.to_bytes(4, "big") + b"\x00" * (size - 4)

        def adts_frame() -> bytes:
            ln = 64
            hdr = bytearray(7)
            hdr[0] = 0xFF
            hdr[1] = 0xF1
            hdr[2] = (1 << 6) | (8 << 2)  # 16 kHz
            hdr[3] = (1 << 6) | ((ln >> 11) & 3)  # 1 channel
            hdr[4] = (ln >> 3) & 0xFF
            hdr[5] = ((ln & 7) << 5) | 0x1F
            hdr[6] = 0xFC
            return bytes(hdr) + b"\x00" * (ln - 7)

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            i = int(i)
            v = i % 4
            if v == 0:
                n = 800 + (i % 5) * 160
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(16000)
                    w.writeframes(np.zeros(n, np.int16).tobytes())
                payloads.append(buf.getvalue())
            elif v == 1:
                n = 400 + (i % 11) * 20
                payloads.append(
                    encode_flac(np.arange(n, dtype=np.int64) % 97, 8000)
                )
            elif v == 2:
                k = 2 + i % 4
                tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
                payloads.append(tag + mp3_frame(9) * k)
            else:
                k = 1 + i % 3
                payloads.append(adts_frame() * k)
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_payloads, batch_format="pyarrow")
        .map_batches(AudioMetadata(), batch_format="pyarrow", batch_size=128)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "n_frames", "sample_rate", "channels",
              "duration_ms"):
        out[c] = out[c].astype("int64")
    # -1 sentinel for not-applicable bitrates: the driver hash treats
    # pandas NA and SQL NULL differently, so the mirror stays int64
    out["bitrate_kbps"] = out["bitrate_kbps"].fillna(-1).astype("int64")
    return out[
        ["media_id", "format", "n_frames", "sample_rate", "channels",
         "duration_ms", "bitrate_kbps"]
    ]


def q_image_metadata(sf_dir: str):
    """Header-only image triage (the dimension/format gate run BEFORE
    decode cost): doc_id%6 sweeps PNG / JPEG-SOF-walk / GIF / BMP /
    PPM / WebP-VP8L header paths with closed-form dims. SQL mirror:
    CASE arithmetic on doc_id."""
    from ..functions.multimodal import ImageMetadata, encode_png
    from ..functions.webp import encode_webp_lossless

    docs = _documents(sf_dir, ["doc_id"])

    def make_payloads(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            i = int(i)
            w, h = 4 + i % 7, 3 + i % 5
            v = i % 6
            if v == 0:
                payloads.append(
                    encode_png(np.zeros((h, w, 3), np.uint8))
                )
            elif v == 1:  # JPEG: SOF0 is all the header scan needs
                sof = (b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
                       + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                       + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
                payloads.append(b"\xff\xd8" + sof + b"\xff\xd9")
            elif v == 2:  # GIF logical screen descriptor
                payloads.append(
                    b"GIF89a" + w.to_bytes(2, "little")
                    + h.to_bytes(2, "little") + bytes([0x77, 0, 0])
                )
            elif v == 3:  # BMP BITMAPINFOHEADER
                hdr = (b"BM" + (54).to_bytes(4, "little") + b"\x00" * 4
                       + (54).to_bytes(4, "little")
                       + (40).to_bytes(4, "little")
                       + w.to_bytes(4, "little") + h.to_bytes(4, "little")
                       + (1).to_bytes(2, "little")
                       + (24).to_bytes(2, "little") + b"\x00" * 24)
                payloads.append(hdr)
            elif v == 4:  # PPM with a comment line
                payloads.append(
                    f"P6\n# fixture\n{w} {h}\n255\n".encode()
                    + b"\x00" * (3 * w * h)
                )
            else:
                payloads.append(
                    encode_webp_lossless(np.zeros((h, w, 3), np.uint8))
                )
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_payloads, batch_format="pyarrow")
        .map_batches(ImageMetadata(), batch_format="pyarrow", batch_size=128)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for c in ("media_id", "width", "height", "bit_depth", "channels"):
        out[c] = out[c].astype("int64")
    return out[
        ["media_id", "format", "width", "height", "bit_depth", "channels"]
    ]


def q_conversation_windows(sf_dir: str):
    """Sliding turn-window packing over per-user event sequences
    (conv=user, turn order=event_id, text=event_type): window 4,
    stride 2 - the transcript→training-context windowing step. One
    conv-bucketed shuffle; each turn replicates to its ≤2 covering
    windows map-side. SQL mirror joins a generated stride grid on the
    0-based dense rank and string_aggs in rank order."""
    from ..functions.transcripts import conversation_windows

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv": b["user_id"].astype("int64"),
                "ord": b["event_id"].astype("int64"),  # emission order
                "text": b["event_type"],
            }
        )

    out = (
        conversation_windows(
            ev.map_batches(prep, batch_format="pandas"),
            conv_col="conv", order_col="ord", text_col="text",
            window=4, stride=2,
        )
        .to_pandas()
        .sort_values(["conv", "window_start"])
        .reset_index(drop=True)
    )
    out["conv"] = out["conv"].astype("int64")
    out["window_start"] = out["window_start"].astype("int64")
    out["n_turns"] = out["n_turns"].astype("int64")
    return out[["conv", "window_start", "n_turns", "text"]]


def q_chunk_sentences(sf_dir: str):
    """Sentence-boundary chunking (the third chunking mode): terminal
    punctuation is first injected after every 3 words with a regex both
    engines run identically, then ONE vectorized findall extracts
    sentences and windows of 3 assemble per chunk. SQL mirror:
    regexp_replace + regexp_extract_all + list slicing."""
    import re as _re

    from ..functions.text import chunk_by_sentences

    docs = _documents(sf_dir, ["doc_id", "text"])
    pat = _re.compile(r"([a-z]+ [a-z]+ [a-z]+) ")

    def punct(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "text": b["text"].str.replace(pat, r"\1. ", regex=True),
            }
        )

    out = (
        chunk_by_sentences(
            docs.map_batches(punct, batch_format="pandas"),
            max_sentences=3, overlap=0,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["chunk_idx"] = out["chunk_idx"].astype("int64")
    out["n_sentences"] = out["n_sentences"].astype("int64")
    return out[["doc_id", "chunk_idx", "n_sentences", "chunk_text"]]


def q_collapse_turns(sf_dir: str):
    """Consecutive same-role turn collapse (gaps-and-islands) over
    per-user event sequences: conv=user, order=event_id,
    role=event_type, text=props. One conv-bucketed shuffle; islands
    are cumcount arithmetic. SQL mirror: the classic
    rn − rn-per-(conv,role) island id + ordered string_agg."""
    from ..functions.transcripts import collapse_consecutive_turns

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "props"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv": b["user_id"].astype("int64"),
                "ord": b["event_id"].astype("int64"),
                "role": b["event_type"],
                "text": b["props"],
            }
        )

    out = (
        collapse_consecutive_turns(
            ev.map_batches(prep, batch_format="pandas"),
            conv_col="conv", order_col="ord", role_col="role",
            text_col="text",
        )
        .to_pandas()
        .sort_values(["conv", "turn_seq"])
        .reset_index(drop=True)
    )
    out["conv"] = out["conv"].astype("int64")
    out["turn_seq"] = out["turn_seq"].astype("int64")
    out["n_merged"] = out["n_merged"].astype("int64")
    return out[["conv", "turn_seq", "role", "n_merged", "text"]]


def _conv_stream(sf_dir: str, with_text: bool = True) -> rd.Dataset:
    """Per-user event sequence viewed as a transcript: conv=user_id,
    ord=event_id, role=event_type, text=props — the shared input of
    the transcript-curation query family."""
    cols = ["event_id", "user_id", "event_type"] + (["props"] if with_text else [])
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=cols)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "conv": b["user_id"].astype("int64"),
                "ord": b["event_id"].astype("int64"),
                "role": b["event_type"],
            }
        )
        if with_text:
            out["text"] = b["props"]
        return out

    return ev.map_batches(prep, batch_format="pandas")


def q_conversation_lint(sf_dir: str):
    """Structural transcript lint (truncation / role-alternation /
    numbering-gap / null-text validation) over per-user event
    sequences: opener must be 'view', closer 'click'. One
    conv-bucketed shuffle; stats are shift arithmetic. SQL mirror:
    lead() + arg_min/arg_max conditional aggregation."""
    from ..functions.transcripts import conversation_lint

    out = (
        conversation_lint(
            _conv_stream(sf_dir),
            conv_col="conv", order_col="ord", role_col="role",
            text_col="text", opener_role="view", closer_role="click",
        )
        .to_pandas()
        .sort_values("conv")
        .reset_index(drop=True)
    )
    for c in ("conv", "n_turns", "n_order_gaps", "n_role_repeats", "n_null_text"):
        out[c] = out[c].astype("int64")
    out["ok"] = out["ok"].astype(bool)
    return out[
        ["conv", "n_turns", "first_role", "last_role",
         "n_order_gaps", "n_role_repeats", "n_null_text", "ok"]
    ]


def q_boilerplate_turns(sf_dir: str):
    """Cross-conversation boilerplate-turn detection: texts used in
    >= 3 distinct conversations with distinct-conv and occurrence
    counts. Map-side (text, conv) partials; ONE text-bucketed shuffle
    of deduped pairs. SQL mirror: GROUP BY text HAVING
    COUNT(DISTINCT conv)."""
    from ..functions.transcripts import boilerplate_turns

    out = (
        boilerplate_turns(
            _conv_stream(sf_dir), conv_col="conv", text_col="text",
            min_convs=3,
        )
        .to_pandas()
        .sort_values("text")
        .reset_index(drop=True)
    )
    out["n_convs"] = out["n_convs"].astype("int64")
    out["n_occurrences"] = out["n_occurrences"].astype("int64")
    return out[["text", "n_convs", "n_occurrences"]]


def q_repeated_turn_runs(sf_dir: str):
    """Retry-loop detection (gaps-and-islands on (conv, role, text)):
    runs of >= 2 consecutive identical turns per conversation. Text is
    coarsened to the props length so real runs exist at toy scale; the
    operator itself is cardinality-agnostic. SQL mirror: the double
    row_number island id."""
    from ..functions.transcripts import repeated_turn_runs

    src = _conv_stream(sf_dir)

    def coarsen(b: pd.DataFrame) -> pd.DataFrame:
        # null props stay null (the operator excludes them, matching
        # the oracle's WHERE props IS NOT NULL)
        b = b.copy()
        b["text"] = (
            b["text"].str.len().astype("Int64").astype("string").astype(object)
        )
        b["text"] = b["text"].where(b["text"].notna(), None)
        return b

    out = (
        repeated_turn_runs(
            src.map_batches(coarsen, batch_format="pandas"),
            conv_col="conv", order_col="ord", role_col="role",
            text_col="text", min_run=2,
        )
        .to_pandas()
        .sort_values(["conv", "first_ord"])
        .reset_index(drop=True)
    )
    for c in ("conv", "run_len", "first_ord"):
        out[c] = out[c].astype("int64")
    return out[["conv", "role", "text", "run_len", "first_ord"]]


def q_instruction_pairs(sf_dir: str):
    """Instruction->response adjacency-pair extraction: every 'view'
    turn immediately followed by a 'click' turn becomes (conv, ord,
    prompt, response). One conv-bucketed shuffle; follower via
    per-conv shift(-1). SQL mirror: lead() over (conv ORDER BY ord)."""
    from ..functions.transcripts import instruction_pairs

    out = (
        instruction_pairs(
            _conv_stream(sf_dir),
            conv_col="conv", order_col="ord", role_col="role",
            text_col="text", user_role="view", assistant_role="click",
        )
        .to_pandas()
        .sort_values(["conv", "ord"])
        .reset_index(drop=True)
    )
    out["conv"] = out["conv"].astype("int64")
    out["ord"] = out["ord"].astype("int64")
    return out[["conv", "ord", "prompt", "response"]]


def q_prefix_fork_groups(sf_dir: str):
    """Shared-prefix (fork/regeneration) grouping: conversations whose
    first 2 turns are textually identical are annotated with the fork
    group size. Two bounded shuffles, the second over ONE row per
    conversation. SQL mirror: ranked string_agg prefix + self-join on
    the prefix."""
    from ..functions.transcripts import prefix_fork_groups

    out = (
        prefix_fork_groups(
            _conv_stream(sf_dir),
            conv_col="conv", order_col="ord", text_col="text",
            prefix_turns=2,
        )
        .to_pandas()
        .sort_values("conv")
        .reset_index(drop=True)
    )
    out["conv"] = out["conv"].astype("int64")
    out["n_convs_sharing"] = out["n_convs_sharing"].astype("int64")
    return out[["conv", "prefix", "n_convs_sharing"]]


def q_conversation_lang_consistency(sf_dir: str):
    """Per-conversation language-consistency screen, SQL-exact: every
    turn gets a deterministic language-marker suffix (event_id % 3
    picks English/Spanish/French stopwords disjoint across the three
    pattern lists), the per-turn heuristic is the shared LangId
    stopword count, and the conversation rollup (majority language,
    minority-turn count, consistent flag) shuffles only per-block
    (conv, lang, n) partials. Oracle mirrors the hit CASEs and the
    count/priority tie-break."""
    from ..functions.transcripts import conversation_language_consistency

    src = _conv_stream(sf_dir)

    def suffix(b: pd.DataFrame) -> pd.DataFrame:
        mod = (b["ord"] % 3).to_numpy()
        sfx = np.where(
            mod == 0, " the and you",
            np.where(mod == 1, " el por los", " le pour dans"),
        )
        # null-safe concat (SQL `props || suffix` yields NULL; LangId
        # downstream fillna's, classifying the turn as 'en' either way)
        return pd.DataFrame(
            {"conv": b["conv"], "text": b["text"].fillna("").to_numpy() + sfx}
        )

    out = (
        conversation_language_consistency(
            src.map_batches(suffix, batch_format="pandas"),
            conv_col="conv", text_col="text",
        )
        .to_pandas()
        .sort_values("conv")
        .reset_index(drop=True)
    )
    out["conv"] = out["conv"].astype("int64")
    out["n_turns"] = out["n_turns"].astype("int64")
    out["n_minority"] = out["n_minority"].astype("int64")
    out["consistent"] = out["consistent"].astype(bool)
    return out[
        ["conv", "majority_lang", "n_turns", "n_minority", "consistent"]
    ]


def q_echo_pairs(sf_dir: str):
    """Assistant-echo token overlap on adjacent 'view'->'click' pairs:
    distinct lowercase whitespace tokens shared between the two turn
    texts, integer counts only. Vectorized explode+merge inside each
    conv bucket. SQL mirror: list_distinct(string_split(...)) +
    list_intersect."""
    from ..functions.transcripts import echo_pairs

    out = (
        echo_pairs(
            _conv_stream(sf_dir),
            conv_col="conv", order_col="ord", role_col="role",
            text_col="text", user_role="view", assistant_role="click",
        )
        .to_pandas()
        .sort_values(["conv", "ord"])
        .reset_index(drop=True)
    )
    for c in ("conv", "ord", "n_user_tokens", "n_assistant_tokens", "n_shared"):
        out[c] = out[c].astype("int64")
    return out[
        ["conv", "ord", "n_user_tokens", "n_assistant_tokens", "n_shared"]
    ]


def q_fix_mojibake(sf_dir: str):
    """Mojibake repair, SQL-exact: every doc gets a deterministic
    accented suffix CORRUPTED the way real web text is (UTF-8 bytes
    re-decoded as Latin-1; every third doc doubly so); the repair must
    reproduce the clean literal the oracle concatenates directly."""
    from ..functions.text import fix_mojibake

    docs = _documents(sf_dir, ["doc_id", "text"])
    clean = " déjà — naïve"
    single = clean.encode("utf-8").decode("latin-1")
    double = single.encode("utf-8").decode("latin-1")

    def corrupt(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        suffix = np.where(ids % 3 == 0, double, single)
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "text": b["text"].to_numpy() + suffix}
        )

    out = (
        fix_mojibake(docs.map_batches(corrupt, batch_format="pandas"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "text", "had_mojibake"]]


def q_unicode_normalize(sf_dir: str):
    """Unicode canonicalization (NFD -> strip combining diacritics ->
    lowercase) with deterministic accented suffixes injected (the
    corpus is ASCII), oracle-mirrored by DuckDB's utf8proc
    lower(strip_accents(...))."""
    from ..functions.text import UnicodeNormalizer

    TAGS = np.array([" Élan", " Grüße", " FAÇADE", " Señor"])

    def inject(b: pd.DataFrame) -> pd.DataFrame:
        i = b["doc_id"].astype("int64").to_numpy()
        b["text"] = b["text"].fillna("") + pd.Series(TAGS[i % 4], index=b.index)
        return b

    ds = (
        _documents(sf_dir, ["doc_id", "text"])
        .map_batches(inject, batch_format="pandas")
        .map_batches(UnicodeNormalizer, batch_format="pandas", concurrency=(1, 4))
    )
    return (
        ds.select_columns(["doc_id", "text_norm"]).sort("doc_id").to_pandas()
    )


def q_quantile_band_filter(sf_dir: str):
    """Drop-the-tails corpus curation: keep documents whose length lies
    inside the exact nearest-rank [p10, p90] band. Thresholds come from
    a distributed counting histogram (shuffle bounded by the value
    domain); the corpus itself never shuffles — the second pass is a
    broadcast map-side filter."""
    from ..functions.aggregates import filter_by_quantile

    docs = _documents(sf_dir, ["doc_id", "n_chars"])
    df = (
        filter_by_quantile(docs, col="n_chars", q_lo=0.1, q_hi=0.9)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "n_chars"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "n_chars"]]


def q_global_percentile_doclen(sf_dir: str):
    """Global percent rank of every doc's length WITHOUT a global
    sort: one histogram exchange builds the exact CDF, broadcast, one
    searchsorted per batch."""
    from ..functions.aggregates import global_percentile

    docs = _documents(sf_dir, ["doc_id", "n_chars"])
    df = (
        global_percentile(docs, col="n_chars")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "n_chars"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "n_chars", "pct_rank"]]


def q_winsorize_doc_len(sf_dir: str):
    """Winsorization: clamp doc lengths into the exact nearest-rank
    [p5, p95] band (keep every row, tame the tails) — histogram
    thresholds, then a broadcast map-side LEAST/GREATEST clamp."""
    from ..functions.aggregates import winsorize_by_quantile

    docs = _documents(sf_dir, ["doc_id", "n_chars"])
    df = (
        winsorize_by_quantile(docs, col="n_chars", q_lo=0.05, q_hi=0.95)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "n_chars", "n_chars_w"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "n_chars", "n_chars_w"]]


def q_url_dedup(sf_dir: str):
    """C4-style web-preprocessing front half over deterministic
    synthetic URLs (the corpus has none): canonicalize (drop query and
    fragment, lowercase scheme://host, strip trailing slashes) ->
    blocklist-filter by registrable domain (broadcast via ray.put) ->
    URL dedup keeping min doc_id per canonical URL (the bucketed
    exact-dedup kernel keyed on canon_url). Triples of consecutive
    doc_ids share a canonical URL but differ in raw suffix noise, so
    canonicalization does real unification work."""
    from ..functions.dedup import exact_dedup
    from ..functions.text import UrlCanonicalizer, filter_blocked_domains

    HOSTS = np.array(
        ["WWW.Alpha.COM", "www.Beta.NET", "WWW.gamma.ORG",
         "Www.Delta.COM", "WWW.Blocked.EXAMPLE"]
    )

    def make_url(b: pd.DataFrame) -> pd.DataFrame:
        i = b["doc_id"].astype("int64").to_numpy()
        b["url"] = (
            "HTTPS://"
            + pd.Series(HOSTS[(i // 3) % 5], index=b.index)
            + "/Path/"
            + pd.Series((i // 3).astype(str), index=b.index)
            + np.where(i % 2 == 0, "/", "")
            + np.where(i % 3 == 0, "?utm_source=x", "")
            + np.where(i % 4 == 0, "#frag", "")
        )
        return b

    ds = (
        _documents(sf_dir, ["doc_id"])
        .map_batches(make_url, batch_format="pandas")
        .map_batches(UrlCanonicalizer, batch_format="pandas", concurrency=(1, 4))
    )
    ds = filter_blocked_domains(ds, ["blocked.example"])
    out = exact_dedup(ds, text_col="canon_url", id_col="doc_id")
    df = (
        out.select_columns(["doc_id", "canon_url", "host", "domain"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


def q_audio_coverage(sf_dir: str):
    """Decode-coverage report, SQL-exact (round-3 verdict item 5): per
    doc a payload in one of four audio families - PCM WAV (decodable),
    ID3-tagged MP3, raw-framesync MP3, ADTS AAC (all three compressed
    families deliberately undecoded: Layer-III/AAC need the ISO Huffman
    tables, untranscribable offline) - then the corpus-level
    ``audio_decode_coverage`` aggregate reports, per sniffed format,
    how many payloads the native WAV-only path actually decodes. The
    oracle mirrors the classification and rates in closed form."""
    import ray.data as rd

    from ..functions.multimodal import audio_decode_coverage

    docs = _documents(sf_dir, ["doc_id"])

    def make_payload(b: pa.Table) -> pa.Table:
        import io
        import wave

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            i = int(i)
            k = i % 4
            if k == 0:  # decodable PCM WAV
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(
                        np.arange(-4, 4, dtype=np.int16).tobytes()
                    )
                payloads.append(buf.getvalue())
            elif k == 1:  # ID3v2-tagged MP3
                payloads.append(b"ID3\x04\x00\x00\x00\x00\x00\x00" + bytes(16))
            elif k == 2:  # raw MPEG-1 Layer-III frame sync
                payloads.append(b"\xff\xfb\x90\x00" + bytes(16))
            else:  # ADTS AAC
                payloads.append(b"\xff\xf1\x50\x80" + bytes(16))
        return pa.table({"payload": pa.array(payloads, pa.binary())})

    ds = docs.map_batches(make_payload, batch_format="pyarrow")
    out = audio_decode_coverage(ds)
    return out[["format", "n", "n_decoded", "decode_permille"]]


def q_audio_features(sf_dir: str):
    """REAL audio decode distributed: deterministic synthetic PCM WAV
    payloads (one 256-frame integer sawtooth per doc) decoded and
    feature-extracted by the actor-pool AudioFeatures stage — the
    library-free audio half of the multimodal path (compressed codecs
    remain stubbed). Rows-only; the pytest asserts sample-exact decode
    against the stdlib wave writer."""
    from ..functions.multimodal import AudioFeatures

    docs = _documents(sf_dir, ["doc_id"])

    def make_wav(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        t = np.arange(256, dtype=np.int64)
        for i in ids:
            samples = (((t * (int(i) % 17 + 3)) % 4096) - 2048).astype("<i2")
            body = samples.tobytes()
            fmt = (
                b"fmt " + (16).to_bytes(4, "little")
                + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
                + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
                + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            )
            data = b"data" + len(body).to_bytes(4, "little") + body
            riff_body = b"WAVE" + fmt + data
            payloads.append(
                b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body
            )
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        docs.map_batches(make_wav, batch_format="pyarrow")
        .map_batches(AudioFeatures(), batch_format="pyarrow", batch_size=64)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    cols = ["media_id", "n_frames", "sample_rate", "duration_ms", "peak", "energy"]
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[cols]


def q_model_score(sf_dir: str):
    """Batched model-inference plumbing: weights broadcast via ray.put
    and loaded once per actor, per-batch scoring, narrow (id, score)
    output. The model is a deterministic integer stub the oracle
    verifies exactly - the plumbing is real, the weights are not
    (no torch in the sandbox; swap scorer_cls in a real env)."""
    from ..functions.inference import score_with_model

    docs = _documents(sf_dir, ["doc_id", "text"])
    out = score_with_model(docs, weights=b"stub-weights-v1")
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "model_score"):
        df[c] = df[c].astype("int64")
    return df[["doc_id", "model_score"]]


def q_mean_pool_embeddings(sf_dir: str):
    """Per-label embedding centroids via distributed mean-pooling: one
    (key, d-vector, n) partial per (block, key), one bucketed combine -
    raw vectors never shuffle. Rows-only (float means have no SQL
    oracle; pytest asserts pandas parity)."""
    from ..functions.similarity import mean_pool

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["label", "embedding"],
    )
    out = mean_pool(emb, key_col="label").to_pandas().sort_values("label")
    out["norm2"] = [float(np.dot(v, v)) for v in out["embedding"]]
    out["label"] = out["label"].astype("int64")
    out["n_vectors"] = out["n_vectors"].astype("int64")
    return out[["label", "n_vectors", "norm2"]].reset_index(drop=True)


def q_skew_join_events_segment(sf_dir: str):
    """Skew-aware join: event stream x customer dimension. Heavy-hitter
    user ids (Misra-Gries detect + exact recount) join map-side against
    a broadcast slice of the dimension - the skewed mass never enters
    an exchange; cold ids take the bucketed hash join; the union is
    lazy. Result identical to a plain LEFT JOIN."""
    from ..functions.joins import skew_join

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).map_batches(
        lambda b: b.rename(columns={"c_custkey": "user_id"}),
        batch_format="pandas",
    )
    out = skew_join(ev, cust, on="user_id", how="left", hot_den=16)
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    for c in ("event_id", "user_id"):
        df[c] = df[c].astype("int64")
    return df[["event_id", "user_id", "c_mktsegment"]]


def q_pivot_user_event_counts(sf_dir: str):
    """Crosstab pivot: users x event types -> wide count columns. Per-
    block C-level partial counts (the exchange carries (block, user,
    type) rows, not events), one groupby-sum, vectorized unstack per
    user bucket."""
    from ..functions.aggregates import pivot_counts

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    df = (
        pivot_counts(ev, row_col="user_id", col_col="event_type")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df["user_id"] = df["user_id"].astype("int64")
    return df


def q_shuffle_shards(sf_dir: str):
    """Deterministic global shuffle into 8 training shards: per-batch
    multiplicative hash assigns the shard (no sampling pass, no
    driver), ONE groupby exchange co-locates each shard, within-shard
    order is a vectorized (hash, id) sort - a reproducible
    pseudo-random permutation, re-emittable shard by shard."""
    from ..functions.mixing import shuffle_shards

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )
    out = shuffle_shards(ev, id_col="event_id", num_shards=8, seed=7)
    df = out.to_pandas().sort_values(["shard", "pos"]).reset_index(drop=True)
    for c in ("shard", "pos", "event_id"):
        df[c] = df[c].astype("int64")
    return df[["shard", "pos", "event_id"]]


def q_lm_bigram_score(sf_dir: str):
    """Bigram-LM quality scoring, corpus-trained in one token pass:
    per-batch partial gram counts -> one (kind, gram) groupby-sum
    shuffle -> top-50k bigram model broadcast via ray.put -> per-doc
    floor-mean conditional probability (ppm) scored vectorized. The
    statistical-LM quality filter with exact integer math."""
    from ..functions.text import lm_score

    docs = _documents(sf_dir, ["doc_id", "text"])
    out = lm_score(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_bigrams", "score_ppm"):
        out[c] = out[c].astype("int64")
    return out


def q_bpe_tokenize(sf_dir: str):
    """Distributed BPE: train merges on the corpus word-frequency
    table (one shuffle of distinct words), broadcast the ranked merge
    list, count subword tokens per doc with per-actor word caching.
    Rows-only check: the iterative merge loop has no SQL oracle; the
    pytest asserts exact parity with a from-scratch reference."""
    from ..functions.tokenizer import bpe_token_counts, train_bpe

    docs = _documents(sf_dir, ["doc_id", "text"])
    merges = train_bpe(docs, num_merges=150, min_freq=2)
    out = (
        bpe_token_counts(docs, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "n_words", "n_bpe_tokens"):
        out[c] = out[c].astype("int64")
    return out


def q_kcore_links(sf_dir: str):
    """Dense-community extraction: the 25-core of the derived link
    graph by iterative peeling (distinct-degree exchange + broadcast
    survivor filter per round; 175 of 500 nodes survive). Rows-only
    (iterative fixpoint has no SQL oracle); pytest pins parity with a
    from-scratch peeler."""
    from ..functions.graph import k_core

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    )
    n_users = 500

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["user_id"].to_numpy().astype(np.int64) % n_users
        dst = (src * 31 + b["event_id"].to_numpy().astype(np.int64)) % n_users
        out = pd.DataFrame({"src": src, "dst": dst})
        return out[out["src"] != out["dst"]]

    out = k_core(ev.map_batches(edges, batch_format="pandas"), k=25)
    return out[["node", "deg"]]


def q_bfs_links(sf_dir: str):
    """Single-source BFS hop distances (≤4) over the derived link
    graph: frontier joins against the materialized edge list, visited
    set node-sized on the driver. SQL-exact vs a depth-capped
    recursive CTE taking min(depth)."""
    from ..functions.graph import bfs_distances

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    )
    n_users = 500

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["user_id"].to_numpy().astype(np.int64) % n_users
        dst = (src * 31 + b["event_id"].to_numpy().astype(np.int64)) % n_users
        out = pd.DataFrame({"src": src, "dst": dst})
        return out[out["src"] != out["dst"]]

    out = bfs_distances(
        ev.map_batches(edges, batch_format="pandas"), source=0, max_depth=4
    )
    return out[["node", "dist"]]


def q_label_propagation_links(sf_dir: str):
    """Community detection over the derived link graph: synchronous
    label propagation with deterministic min-label ties — per round
    one label→edge join + count partials + grouped-mode argmax.
    Rows-only (iterative mode has no SQL oracle); pytest pins the
    two-clique ground truth and single-process parity."""
    from ..functions.graph import label_propagation

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    )
    n_users = 500

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["user_id"].to_numpy().astype(np.int64) % n_users
        dst = (src * 31 + b["event_id"].to_numpy().astype(np.int64)) % n_users
        out = pd.DataFrame({"src": src, "dst": dst})
        return out[out["src"] != out["dst"]]

    out = label_propagation(
        ev.map_batches(edges, batch_format="pandas"), rounds=4
    )
    out["node"] = out["node"].astype("int64")
    out["label"] = out["label"].astype("int64")
    return out[["node", "label"]]


def q_triangle_count_links(sf_dir: str):
    """Exact distributed triangle count over the derived link graph
    (compact-forward: degree-ordered orientation bounds the wedge
    explosion, one center-bucketed self-merge, one closing semi-join).
    SQL-exact vs a three-way self-join."""
    from ..functions.graph import triangle_count

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    )
    n_users = 500

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["user_id"].to_numpy().astype(np.int64) % n_users
        dst = (src * 31 + b["event_id"].to_numpy().astype(np.int64)) % n_users
        out = pd.DataFrame({"src": src, "dst": dst})
        return out[out["src"] != out["dst"]]

    n = triangle_count(ev.map_batches(edges, batch_format="pandas"))
    return pd.DataFrame({"n_triangles": [np.int64(n)]})


def q_ppr_links(sf_dir: str):
    """Personalized PageRank (TrustRank-style seed prior): teleport +
    dangling mass flow to seeds {0,1,2} only — rank-relative-to-
    trusted-sites curation. Rows-only; pytest pins single-process
    parity at 1e-9."""
    from ..functions.graph import pagerank

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    )
    n_users = 500

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["user_id"].to_numpy().astype(np.int64) % n_users
        dst = (src * 31 + b["event_id"].to_numpy().astype(np.int64)) % n_users
        out = pd.DataFrame({"src": src, "dst": dst})
        return out[out["src"] != out["dst"]]

    ranks = pagerank(
        ev.map_batches(edges, batch_format="pandas"),
        iterations=8,
        personalization=[0, 1, 2],
    )
    ranks["rank_ppb"] = (ranks["rank"] * 1e9).round().astype("int64")
    ranks["node"] = ranks["node"].astype("int64")
    return ranks[["node", "rank_ppb"]]


def q_pagerank_links(sf_dir: str):
    """Link-graph authority ranking: a deterministic user->user edge
    list derived from events (who triggers whom: user_id ->
    (user_id*31+event_id) % n_users) ranked by distributed PageRank
    (per-iteration: one rank->edge bucketed join + one dst partial-sum
    combine). Rows-only: iterative float ranking has no SQL oracle;
    the pytest asserts 1e-9 parity with a single-process reference."""
    from ..functions.graph import pagerank

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    )
    n_users = 500

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["user_id"].to_numpy().astype(np.int64) % n_users
        dst = (src * 31 + b["event_id"].to_numpy().astype(np.int64)) % n_users
        out = pd.DataFrame({"src": src, "dst": dst})
        return out[out["src"] != out["dst"]]

    ranks = pagerank(
        ev.map_batches(edges, batch_format="pandas"), iterations=8
    )
    ranks["rank_ppb"] = (ranks["rank"] * 1e9).round().astype("int64")
    ranks["node"] = ranks["node"].astype("int64")
    return ranks[["node", "rank_ppb"]]


def q_pagerank_links_pagescale(sf_dir: str):
    """The PAGE-SCALE PageRank path under the driver gate: same link
    graph as pagerank_links but with node_state='dataset' forced - the
    rank frame stays a keyed Dataset joined per iteration (nothing
    node-sized on the driver until the final collect). ppb-rounded
    ranks are identical to the driver-state path at this scale, so a
    regression in either path breaks the shared pytest parity AND this
    query's row hash vs its driver-mode twin."""
    from ..functions.graph import pagerank

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    )
    n_users = 500

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["user_id"].to_numpy().astype(np.int64) % n_users
        dst = (src * 31 + b["event_id"].to_numpy().astype(np.int64)) % n_users
        out = pd.DataFrame({"src": src, "dst": dst})
        return out[out["src"] != out["dst"]]

    ranks = pagerank(
        ev.map_batches(edges, batch_format="pandas"),
        iterations=3,  # the path under test is state residency, not depth
        node_state="dataset",
    )
    ranks["rank_ppb"] = (ranks["rank"] * 1e9).round().astype("int64")
    ranks["node"] = ranks["node"].astype("int64")
    return ranks[["node", "rank_ppb"]]


def q_hits_links(sf_dir: str):
    """Hub/authority scoring of the same deterministic user->user link
    graph as pagerank_links, via distributed HITS (per half-step: one
    bucketed rank->edge join + per-target partial sums). Rows-only:
    iterative L2-normalized ranking has no SQL oracle; the pytest
    asserts 1e-9 parity with a single-process reference."""
    from ..functions.graph import hits

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    )
    n_users = 500

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["user_id"].to_numpy().astype(np.int64) % n_users
        dst = (src * 31 + b["event_id"].to_numpy().astype(np.int64)) % n_users
        out = pd.DataFrame({"src": src, "dst": dst})
        return out[out["src"] != out["dst"]]

    scores = hits(ev.map_batches(edges, batch_format="pandas"), iterations=4)
    scores["hub_ppb"] = (scores["hub"] * 1e9).round().astype("int64")
    scores["authority_ppb"] = (scores["authority"] * 1e9).round().astype("int64")
    scores["node"] = scores["node"].astype("int64")
    return scores[["node", "hub_ppb", "authority_ppb"]]


def q_sequence_fingerprint(sf_dir: str):
    """Behavioral sequence dedup: each user's ordered event-type path
    hashes to an md5 fingerprint; users sharing a fingerprint form a
    duplicate-behavior group keyed by its min user id. One key-bucketed
    shuffle; paths assemble per bucket (groups partition-local by
    construction, same shape as conversation assembly)."""
    import hashlib

    from ..functions.windows import _buckets_for_cluster, _key_buckets

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    nb = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_fb"] = _key_buckets(b["user_id"], nb)
        return b

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        agg = g.groupby("user_id", sort=False)["event_type"].agg(">".join)
        fp = [hashlib.md5(p.encode()).hexdigest() for p in agg]
        return pd.DataFrame(
            {"user_id": agg.index.to_numpy(), "fp": fp}
        )

    fps = (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("_fb")
        .map_groups(paths, batch_format="pandas")
    )

    def canon(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": g["user_id"], "canonical_user": g["user_id"].min()}
        )

    out = fps.groupby("fp").map_groups(canon, batch_format="pandas")
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    for c in ("user_id", "canonical_user"):
        df[c] = df[c].astype("int64")
    return df[["user_id", "canonical_user"]]


def q_event_transitions(sf_dir: str):
    """Markov transition counts: (previous event_type -> event_type)
    per user under the (ts, event_id) total order — pure composition
    of the lag_lead kernel with a partial-agg rollup. SQL-exact vs
    LAG() + GROUP BY."""
    from ray.data.aggregate import Sum

    from ..functions.windows import lag_lead

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": b["ts"].astype("datetime64[us]").view("int64"),
                "event_type": b["event_type"],
            }
        )

    lagged = lag_lead(
        ds.map_batches(prep, batch_format="pandas"),
        key="user_id",
        order_cols=["ts_us", "event_id"],
        cols=["event_type"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["lag_event_type"].notna()]
        g = (
            b.groupby(["lag_event_type", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return g.rename(columns={"lag_event_type": "prev_type"})

    out = (
        lagged.map_batches(partial, batch_format="pandas")
        .groupby(["prev_type", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )
    df = out.sort(["prev_type", "event_type"]).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df[["prev_type", "event_type", "n"]]


def q_event_trigrams(sf_dir: str):
    """Frequent behavior trigrams: (prev2, prev1, cur) event-type
    windows per user under the (ts, event_id) total order — BOTH lags
    from ONE shuffle + sort (lag_lead shifts=(1,2)), then a partial-agg
    rollup. The sequence-pattern-mining step over event streams."""
    from ray.data.aggregate import Sum

    from ..functions.windows import lag_lead

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": b["ts"].astype("datetime64[us]").view("int64"),
                "event_type": b["event_type"],
            }
        )

    lagged = lag_lead(
        ds.map_batches(prep, batch_format="pandas"),
        key="user_id",
        order_cols=["ts_us", "event_id"],
        cols=["event_type"],
        shifts=(1, 2),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["lag2_event_type"].notna()]
        g = (
            b.groupby(
                ["lag2_event_type", "lag_event_type", "event_type"],
                sort=False,
            )
            .size()
            .reset_index(name="n")
        )
        return g.rename(
            columns={"lag2_event_type": "t1", "lag_event_type": "t2",
                     "event_type": "t3"}
        )

    out = (
        lagged.map_batches(partial, batch_format="pandas")
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
    )
    df = out.sort(["t1", "t2", "t3"]).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df[["t1", "t2", "t3", "n"]]


def q_wau_sliding(sf_dir: str):
    """Sliding 7-day active users at daily hops (the WAU curve): each
    event replicates to its 7 covering windows inside map_batches
    (numpy repeat), locally-deduped (window, user) pairs exchange once
    for the global dedup, per-window count partials finish — COUNT
    (DISTINCT) under a sliding window without ever shuffling raw
    events."""
    from ray.data.aggregate import Count, Sum

    DAY = 86_400_000_000
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].astype("datetime64[us]").view("int64")
        day = (t // DAY) * DAY
        uid = b["user_id"].to_numpy()
        # windows [day-6d .. day] each contain this event
        rep_day = np.repeat(day, 7)
        rep_uid = np.repeat(uid, 7)
        off = np.tile(np.arange(7, dtype=np.int64) * DAY, len(b))
        return pd.DataFrame(
            {"win": rep_day - off, "user_id": rep_uid}
        ).drop_duplicates()

    deduped = (
        ev.map_batches(pairs, batch_format="pandas")
        .groupby(["win", "user_id"])
        .aggregate(Count(alias_name="_n"))
    )

    def win_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["win"].value_counts()
        return pd.DataFrame(
            {"win": vc.index.to_numpy(), "n_users": vc.to_numpy(np.int64)}
        )

    out = (
        deduped.map_batches(win_partial, batch_format="pandas")
        .groupby("win")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )
    df = out.to_pandas().sort_values("win").reset_index(drop=True)
    for c in ("win", "n_users"):
        df[c] = df[c].astype("int64")
    return df[["win", "n_users"]]


def q_interevent_gap(sf_dir: str):
    """Mean inter-event gap per user (integer µs, floor division):
    lag kernel supplies consecutive deltas, exact int sums finish —
    the activity-cadence feature for engagement curation."""
    from ray.data.aggregate import Sum

    from ..functions.windows import lag_lead

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": b["ts"].astype("datetime64[us]").view("int64"),
            }
        )

    lagged = lag_lead(
        ds.map_batches(prep, batch_format="pandas"),
        key="user_id",
        order_cols=["ts_us", "event_id"],
        cols=["ts_us"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["lag_ts_us"].notna()]
        gap = (b["ts_us"] - b["lag_ts_us"].astype("int64")).astype("int64")
        g = pd.DataFrame({"user_id": b["user_id"], "gap": gap})
        out = g.groupby("user_id", sort=False).agg(
            n_gaps=("gap", "size"), sum_gap=("gap", "sum")
        )
        return out.reset_index()

    agg = (
        lagged.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(Sum("n_gaps", alias_name="n_gaps"),
                   Sum("sum_gap", alias_name="sum_gap"))
    )
    df = agg.to_pandas().sort_values("user_id").reset_index(drop=True)
    for c in ("user_id", "n_gaps", "sum_gap"):
        df[c] = df[c].astype("int64")
    df["mean_gap_us"] = df["sum_gap"] // df["n_gaps"]
    return df[["user_id", "n_gaps", "mean_gap_us"]]


def q_funnel_signup_purchase(sf_dir: str):
    """Ordered conversion funnel signup -> view -> purchase per user:
    greedy earliest-completion matching, step i+1 strictly after step
    i's time, no step skipping. One bucketed shuffle, one vectorized
    pass per step. SQL-exact vs a chain of min-ts self-joins."""
    from ..functions.windows import funnel_steps

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id", "event_type"],
    )
    out = (
        funnel_steps(
            ds,
            key="user_id",
            ts_col="ts",
            type_col="event_type",
            steps=["signup", "view", "purchase"],
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["last_ts_us"] = (
        out["last_step_ts"].astype("datetime64[us]").view("int64")
    )
    return out[["user_id", "steps_completed", "last_ts_us"]]


def q_time_to_convert(sf_dir: str):
    """Signup→purchase conversion latency per converting user: funnel
    kernel (greedy, strictly-after) gives the completion ts, a
    groupby-min gives the anchor, ONE bucketed hash_join pairs them —
    exact integer microsecond deltas."""
    from ..functions.joins import hash_join
    from ..functions.windows import funnel_steps

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    fun = funnel_steps(
        ev, key="user_id", ts_col="ts", type_col="event_type",
        steps=["signup", "purchase"],
    ).filter(lambda r: r["steps_completed"] == 2)

    from ray.data.aggregate import Min

    def s1_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"] == "signup"]
        g = b.groupby("user_id", sort=False)["ts"].min().reset_index()
        g["t1_us"] = g["ts"].astype("datetime64[us]").view("int64")
        return g[["user_id", "t1_us"]]

    s1 = (
        ev.map_batches(s1_partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(Min("t1_us", alias_name="t1_us"))
    )
    joined = hash_join(fun, s1, on="user_id")
    df = joined.to_pandas().sort_values("user_id").reset_index(drop=True)
    t2 = df["last_step_ts"].astype("datetime64[us]").view("int64")
    df["delta_us"] = (t2 - df["t1_us"].astype("int64")).astype("int64")
    df["user_id"] = df["user_id"].astype("int64")
    return df[["user_id", "delta_us"]]


def q_ntile_user_events(sf_dir: str):
    """NTILE(4) per user over (ts, event_id): quartile-bins each
    user's events — one bucketed shuffle, per-bucket single sort,
    closed-form vectorized tile assignment. SQL-exact."""
    from ..functions.windows import ntile_in_group

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": b["ts"].astype("datetime64[us]").view("int64"),
            }
        )

    out = (
        ntile_in_group(
            ds.map_batches(prep, batch_format="pandas"),
            key="user_id",
            order_col="ts_us",
            tiebreak="event_id",
            n_tiles=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out["event_id"] = out["event_id"].astype("int64")
    out["tile"] = out["tile"].astype("int64")
    return out[["event_id", "tile"]]


def q_corr_value_hour(sf_dir: str):
    """Per-event-type Pearson correlation between value (cents) and
    hour-of-day, from EXACT int64 moment partials (one pass, one tiny
    groupby-sum); the float formula runs only on the group-sized sums,
    so the result is bitwise order-independent and SQL-mirrorable.
    Reported as floor(r * 1e6) ppm."""
    from ..functions.aggregates import grouped_moments, pearson_from_moments

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "cents": np.floor(b["value"].to_numpy() * 100.0).astype("int64"),
                "hour": b["ts"].dt.hour.astype("int64"),
            }
        )

    m = grouped_moments(
        ds.map_batches(prep, batch_format="pandas"),
        group_col="event_type",
        x_col="cents",
        y_col="hour",
    )
    m["corr_ppm"] = np.floor(pearson_from_moments(m) * 1e6).astype("int64")
    m = m.sort_values("event_type").reset_index(drop=True)
    return m[["event_type", "n", "corr_ppm"]]


def q_mi_type_hour(sf_dir: str):
    """Mutual information between event_type and hour-of-day in
    integer microbits: distinct-cell count exchange only, per-cell
    quantized log terms summed exactly — order-independent and
    SQL-mirrorable."""
    from ..functions.aggregates import mutual_information

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "hour": b["ts"].dt.hour.astype("int64"),
            }
        )

    return mutual_information(
        ev.map_batches(prep, batch_format="pandas"),
        col_a="event_type",
        col_b="hour",
    )


def q_profile_events(sf_dir: str):
    """ANALYZE-style column profile of the events table: counts +
    typed min/max as one-row wide partials, exact distinct via a
    locally-deduped (col, value) exchange."""
    from ..functions.aggregates import profile_table

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type"],
    )
    out = profile_table(ev, columns=["event_id", "user_id", "event_type"])
    out = out.sort_values("col").reset_index(drop=True)
    for c in ("n", "n_null", "n_distinct"):
        out[c] = out[c].astype("int64")
    return out[["col", "n", "n_null", "n_distinct", "min", "max"]]


def q_chi2_type_hour(sf_dir: str):
    """Pearson χ² independence test between event_type and hour over
    the COMPLETE contingency grid (zero cells contribute E), per-cell
    micro-quantized terms — order-independent and SQL-exact."""
    from ..functions.aggregates import chi2_independence

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "hour": b["ts"].dt.hour.astype("int64"),
            }
        )

    return chi2_independence(
        ev.map_batches(prep, batch_format="pandas"),
        col_a="event_type",
        col_b="hour",
    )


def q_mode_event_type(sf_dir: str):
    """Exact per-user MODE with deterministic min-value tiebreak: the
    exchange carries distinct (user, type) count partials, the finisher
    is one sort + drop_duplicates per bucket — zero per-key Python."""
    from ..functions.aggregates import grouped_mode

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    out = grouped_mode(ev, key="user_id", value_col="event_type")
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    for c in ("user_id", "n"):
        df[c] = df[c].astype("int64")
    return df[["user_id", "mode_value", "n"]]


def q_entropy_user_events(sf_dir: str):
    """Shannon entropy of each user's event-type mix in integer
    microbits: per-term floor-quantization makes the log-sum an exact
    int64, so the SQL mirror hash-matches despite float logs."""
    from ..functions.aggregates import grouped_entropy

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    out = grouped_entropy(ev, key="user_id", value_col="event_type")
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    for c in ("user_id", "n", "entropy_ub"):
        df[c] = df[c].astype("int64")
    return df[["user_id", "n", "entropy_ub"]]


def q_outliers_value_by_type(sf_dir: str):
    """Per-type 3σ outlier rows: exact int64 moments (tiny partial
    exchange), then a broadcast map-side filter with one fixed double
    expression tree — the corpus streams, never shuffles, and the SQL
    mirror matches row-for-row."""
    from ..functions.aggregates import zscore_outliers

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(b["value"], 100.0)), pa.int64())
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "value_cents": c,
            }
        )

    prepped = ev.map_batches(cents, batch_format="pyarrow")
    out = zscore_outliers(
        prepped, group_col="event_type", value_col="value_cents", z=3.0
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    for c in ("event_id", "value_cents"):
        df[c] = df[c].astype("int64")
    return df[["event_id", "event_type", "value_cents"]]


def q_cooccur_event_types(sf_dir: str):
    """Market-basket co-occurrence of event types within a user: pair
    counts, item supports, and ppm-floored lift — all from exact int64
    counts; one basket-bucketed shuffle of locally-deduped rows, pairs
    emitted with a vectorized self-merge per bucket."""
    from ..functions.aggregates import cooccurrence

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    out = cooccurrence(ev, basket_col="user_id", item_col="event_type")
    nab = out["n_ab"].to_numpy(dtype=np.float64)
    na = out["n_a"].to_numpy(dtype=np.float64)
    nb = out["n_b"].to_numpy(dtype=np.float64)
    tot = out["n_baskets"].to_numpy(dtype=np.float64)
    out["lift_ppm"] = np.floor((nab * tot) / (na * nb) * 1e6).astype("int64")
    return out[["item_a", "item_b", "n_ab", "n_a", "n_b", "lift_ppm"]]


def q_pmi_event_types(sf_dir: str):
    """Pointwise mutual information per co-occurring event-type pair
    (collocation strength): exact counts from the co-occurrence
    kernel, pmi_ub = floor(log2(n_ab·N/(n_a·n_b))·2^20) — one fixed
    double tree over ints, SQL-exact."""
    from ..functions.aggregates import cooccurrence

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    out = cooccurrence(ev, basket_col="user_id", item_col="event_type")
    nab = out["n_ab"].to_numpy(dtype=np.float64)
    na = out["n_a"].to_numpy(dtype=np.float64)
    nb = out["n_b"].to_numpy(dtype=np.float64)
    tot = out["n_baskets"].to_numpy(dtype=np.float64)
    out["pmi_ub"] = np.floor(
        np.log2((nab * tot) / (na * nb)) * 1048576.0
    ).astype("int64")
    return out[["item_a", "item_b", "n_ab", "pmi_ub"]]


def q_ols_value_by_type(sf_dir: str):
    """Per-event-type OLS of value (cents) on hour-of-day from exact
    int64 moment partials: slope / intercept / R² are straight-line
    double formulas over the group-sized sums (ppm-floored), bitwise
    order-independent and SQL-mirrorable."""
    from ..functions.aggregates import grouped_moments, ols_from_moments

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "hour": b["ts"].dt.hour.astype("int64"),
                "cents": np.floor(b["value"].to_numpy() * 100.0).astype("int64"),
            }
        )

    m = grouped_moments(
        ds.map_batches(prep, batch_format="pandas"),
        group_col="event_type",
        x_col="hour",
        y_col="cents",
    )
    o = ols_from_moments(m)
    o["slope_ppm"] = np.floor(o["slope"].to_numpy() * 1e6).astype("int64")
    o["intercept_ppm"] = np.floor(o["intercept"].to_numpy() * 1e6).astype("int64")
    o["r2_ppm"] = np.floor(o["r2"].to_numpy() * 1e6).astype("int64")
    o = o.sort_values("event_type").reset_index(drop=True)
    return o[["event_type", "n", "slope_ppm", "intercept_ppm", "r2_ppm"]]


_SET_COLS = ["user_id", "event_type", "dt"]


def _events_halves(sf_dir: str):
    """(user_id, event_type, dt) key streams from the even / odd
    event-id halves — sparse enough that INTERSECT and EXCEPT are both
    non-trivial."""
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def half(parity):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["event_id"] % 2 == parity]
            return pd.DataFrame(
                {
                    "user_id": b["user_id"],
                    "event_type": b["event_type"],
                    "dt": b["ts"].dt.strftime("%Y-%m-%d"),
                }
            )

        return ev.map_batches(f, batch_format="pandas")

    return half(0), half(1)


def _set_result(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    if df.empty:
        df = pd.DataFrame({c: pd.Series(dtype="object") for c in _SET_COLS})
    df = df.sort_values(_SET_COLS).reset_index(drop=True)
    df["user_id"] = df["user_id"].astype("int64")
    return df[_SET_COLS]


def q_set_intersect_pairs(sf_dir: str):
    """SQL INTERSECT: distinct (user_id, event_type, dt) keys present
    in BOTH event-id-parity halves — per-batch local dedup, vectorized
    distinct groupby, one bucketed semi-join."""
    from ..functions.joins import set_intersect

    left, right = _events_halves(sf_dir)
    return _set_result(set_intersect(left, right, on=_SET_COLS))


def q_set_except_pairs(sf_dir: str):
    """SQL EXCEPT: distinct keys in the even half with no match in
    the odd half — distinct + one bucketed anti-join."""
    from ..functions.joins import set_except

    left, right = _events_halves(sf_dir)
    return _set_result(set_except(left, right, on=_SET_COLS))


def q_unpivot_user_counts(sf_dir: str):
    """Round-trip pivot -> UNPIVOT: the wide users x event-type count
    matrix melts back to (user_id, event_type, n) long rows — one
    vectorized pd.melt per batch, no shuffle, zero-count cells kept
    (pivot semantics). SQL-exact vs a users x types cross join."""
    from ..functions.aggregates import pivot_counts, unpivot

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    wide = pivot_counts(ev, row_col="user_id", col_col="event_type")
    vcols = [c for c in wide.schema().names if c.startswith("n_")]
    long = unpivot(
        wide,
        id_cols=["user_id"],
        value_cols=vcols,
        var_name="event_type",
        value_name="n",
    )

    def strip(b: pd.DataFrame) -> pd.DataFrame:
        b["event_type"] = b["event_type"].str.removeprefix("n_")
        return b

    df = (
        long.map_batches(strip, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    df["user_id"] = df["user_id"].astype("int64")
    df["n"] = df["n"].astype("int64")
    return df[["user_id", "event_type", "n"]]


def q_json_extract_rollup(sf_dir: str):
    """Semi-structured flatten: pull the scalar $.k field out of the
    JSON props column (per-record parse inside the batch, vectorized
    assembly), then the usual partial-agg -> small groupby rollup.
    SQL-exact vs DuckDB json_extract_string."""
    from ..functions.text import JsonFieldExtractor

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "props"],
    )
    extract = JsonFieldExtractor({"k": "k"}, json_col="props")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        e = extract(b)
        e["k"] = pd.to_numeric(e["k"], errors="coerce").fillna(0).astype("int64")
        g = e.groupby("event_type", sort=False)["k"]
        return pd.DataFrame(
            {
                "event_type": g.sum().index,
                "sum_k": g.sum().to_numpy(np.int64),
                "n": g.size().to_numpy(np.int64),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"))
    )
    df = out.sort("event_type").to_pandas()
    df["n"] = df["n"].astype("int64")
    df["sum_k"] = df["sum_k"].astype("int64")
    return df[["event_type", "n", "sum_k"]]


def q_lag_user_events(sf_dir: str):
    """Per-user LAG navigation (prev event's value + inter-event gap)
    under a total order (ts, event_id): one key-bucketed shuffle, each
    bucket sorts once and shifts whole columns — zero per-key Python.
    SQL-exact vs LAG() OVER (PARTITION BY ... ORDER BY ...); nullable
    firsts coalesced to -1 so the compare stays int64."""
    from ..functions.windows import lag_lead

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": b["ts"].astype("datetime64[us]").view("int64"),
                "cents": np.floor(b["value"].to_numpy() * 100.0).astype("int64"),
            }
        )

    out = lag_lead(
        ds.map_batches(prep, batch_format="pandas"),
        key="user_id",
        order_cols=["ts_us", "event_id"],
        cols=["cents", "ts_us"],
    ).to_pandas()
    out["prev_cents"] = out["lag_cents"].fillna(-1).astype("int64")
    lag_ts = out["lag_ts_us"]
    out["delta_us"] = (
        (out["ts_us"] - lag_ts).where(lag_ts.notna(), -1).astype("int64")
    )
    out = out.sort_values("event_id").reset_index(drop=True)
    out["event_id"] = out["event_id"].astype("int64")
    return out[["event_id", "prev_cents", "delta_us"]]


def q_cube_event_stats(sf_dir: str):
    """Full CUBE over (event_type, dt) in one pass: every batch emits
    partials for all 4 grouping sets with 'ALL' placeholders, one
    shuffle of per-(block, set, group) partials, one groupby finishes
    every level. Sums in integer cents so multi-level totals are
    summation-order independent (SQL-exact vs GROUP BY CUBE)."""
    from ..functions.aggregates import grouping_sets

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "dt": b["ts"].dt.strftime("%Y-%m-%d"),
                "cents": np.floor(b["value"].to_numpy() * 100.0).astype("int64"),
            }
        )

    out = grouping_sets(
        ds.map_batches(prep, batch_format="pandas"),
        keys=["event_type", "dt"],
        sum_cols=["cents"],
    )
    df = out.to_pandas().sort_values(["event_type", "dt"]).reset_index(drop=True)
    df["event_type"] = df["event_type"].astype(str)
    df["dt"] = df["dt"].astype(str)
    df["n"] = df["n"].astype("int64")
    df["sum_cents"] = df["sum_cents"].astype("int64")
    return df[["event_type", "dt", "n", "sum_cents"]]


def q_hll_users_by_type(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) per event_type via
    HyperLogLog (p=14, ~0.8% err): fixed 16 KiB register partials per
    batch, merged by max — NO shuffle at all, driver sees only
    registers. The scale path when even locally-deduped pairs are too
    many to exchange (cf. distinct_users_by_type, the exact path).
    Rows-only check: approximation has no SQL oracle; the pytest
    asserts tolerance against the exact count."""
    from ..functions.sketch import hll_distinct

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    df = hll_distinct(ev, "user_id", group_col="event_type")
    df["n_approx"] = df["n_approx"].astype("int64")
    return df


def q_inverted_index(sf_dir: str):
    """Posting-list inverted index over the corpus (exact-match search
    / contamination lookup): distinct (term, doc) pairs per batch, one
    term-bucketed shuffle, per-bucket df count + tail filter + sorted
    posting-list join. Postings stay distributed (returned Dataset is
    write_parquet-able as a sharded index)."""
    from ..functions.text import inverted_index

    idx = inverted_index(_documents(sf_dir, ["doc_id", "text"]), min_df=100)
    df = idx.to_pandas().sort_values("term").reset_index(drop=True)
    df["df"] = df["df"].astype("int64")
    return df[["term", "df", "postings"]]


_WD_FOOTER = (
    "this boilerplate sentence repeats across every single document in corpus"
)


def q_window_dedup(sf_dir: str):
    """Sliding-window substring dedup (Lee et al. arXiv:2107.06499,
    stride-1 window form): every non-first occurrence of an 8-token
    window is cut at token granularity and docs are rebuilt from the
    surviving tokens. A shared 10-token footer is injected (as in
    paragraph_dedup) so the corpus demonstrably contains >=w-token
    cross-doc repeats; only the globally first doc keeps it."""
    from ..functions.dedup import window_dedup

    docs = _documents(sf_dir, ["doc_id", "text"])

    def inject(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "text": b["text"].fillna("")
                + " "
                + _WD_FOOTER
                + " tail-"
                + b["doc_id"].astype(str),
            }
        )

    out = window_dedup(docs.map_batches(inject, batch_format="pandas"), w=8)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["doc_id"] = df["doc_id"].astype("int64")
    return df[["doc_id", "text_dedup"]]


def q_value_quantiles_sketch(sf_dir: str):
    """DDSketch approximate p50/p90/p99 of the raw event value per
    type: log-bucketed histogram partials (relative error <= alpha=1%,
    mergeable by addition) -> tiny groupby-sum -> driver CDF walk.
    The float-domain path when exact value-binning can't bound the
    shuffle. Rows-only: approximation has no SQL oracle; pytest
    asserts the relative-error bound against exact quantiles."""
    from ..functions.sketch import dd_quantiles

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def vals(b: pd.DataFrame) -> np.ndarray:
        return b["value"].to_numpy(dtype=np.float64)

    df = dd_quantiles(ev, vals, group_col="event_type", alpha=0.01)
    return df.round({c: 4 for c in df.columns if c.startswith("q")})


def q_preference_pairs(sf_dir: str):
    """Preference-pair mining from shared-prefix forks: conversations
    with an identical (coarsened) first turn are regenerations; their
    differing second turns become (response_a, response_b) candidate
    pairs. Texts are coarsened to the props' 7-char head so fork
    groups exist at toy scale; the operator is cardinality-agnostic.
    SQL mirror: ranked substr prefix + self-join with conv_a <
    conv_b."""
    from ..functions.transcripts import preference_pairs

    src = _conv_stream(sf_dir)

    def coarsen(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["text"] = b["text"].str.slice(0, 7)
        return b

    out = (
        preference_pairs(
            src.map_batches(coarsen, batch_format="pandas"),
            conv_col="conv", order_col="ord", role_col="role",
            text_col="text", prefix_turns=1, max_group=1000,
        )
        .to_pandas()
        .sort_values(["conv_a", "conv_b"])
        .reset_index(drop=True)
    )
    out["conv_a"] = out["conv_a"].astype("int64")
    out["conv_b"] = out["conv_b"].astype("int64")
    return out[["prefix", "conv_a", "conv_b", "response_a", "response_b"]]


def q_turn_gap_stats(sf_dir: str):
    """Per-conversation inter-turn timing screen: turn count, wall
    span, max gap, sub-60s burst count, out-of-order timestamp count
    — all int64 microseconds. One conv-bucketed shuffle. SQL mirror:
    lead(ts) over epoch_us diffs."""
    from ..functions.transcripts import turn_gap_stats

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv": b["user_id"].astype("int64"),
                "ord": b["event_id"].astype("int64"),
                "ts": b["ts"],
            }
        )

    out = (
        turn_gap_stats(
            ev.map_batches(prep, batch_format="pandas"),
            conv_col="conv", order_col="ord", ts_col="ts",
            burst_us=60_000_000,
        )
        .to_pandas()
        .sort_values("conv")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out[
        ["conv", "n_turns", "span_us", "max_gap_us", "n_bursts",
         "n_out_of_order"]
    ]


def q_context_truncate(sf_dir: str):
    """Context-window trimming: keep each conversation's most recent
    turns fitting a 24-token budget (the last turn always survives).
    Token counts are single-space splits, SQL-exact. One conv-bucketed
    shuffle; the scan is a reverse cumsum. SQL mirror: windowed SUM
    over ord DESC."""
    from ..functions.transcripts import context_truncate

    out = (
        context_truncate(
            _conv_stream(sf_dir),
            conv_col="conv", order_col="ord", text_col="text",
            budget_tokens=24,
        )
        .to_pandas()
        .sort_values(["conv", "ord"])
        .reset_index(drop=True)
    )
    out["conv"] = out["conv"].astype("int64")
    out["ord"] = out["ord"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["cum_tokens_from_end"] = out["cum_tokens_from_end"].astype("int64")
    return out[["conv", "ord", "text", "n_tokens", "cum_tokens_from_end"]]


def q_refusal_screen(sf_dir: str):
    """Canned-refusal screen: per conversation, assistant-turn count
    and refusal-pattern hits (pattern string shared VERBATIM with the
    DuckDB regexp_matches mirror). Map-side partials; one
    bounded-fanout bucketed_agg shuffle."""
    from ..functions.transcripts import refusal_screen

    out = (
        refusal_screen(
            _conv_stream(sf_dir),
            conv_col="conv", role_col="role", text_col="text",
            assistant_role="click", pattern='(?i)"k": 8[0-9]',
        )
        .to_pandas()
        .sort_values("conv")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out[["conv", "n_assistant_turns", "n_refusal_turns"]]


def _conv_tool_stream(sf_dir: str) -> rd.Dataset:
    """Per-user event sequence with a SYNTHETIC deterministic tool
    column (click events call tool_<event_id % 3>; other events carry
    no tool) — the shared input of the agent-trajectory queries, with
    the identical CASE expression in the SQL mirrors."""
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        tool = np.where(
            (b["event_type"] == "click").to_numpy(),
            "tool_" + (b["event_id"] % 3).astype(str),
            None,
        )
        return pd.DataFrame(
            {
                "conv": b["user_id"].astype("int64"),
                "ord": b["event_id"].astype("int64"),
                "tool": tool,
            }
        )

    return ev.map_batches(prep, batch_format="pandas")


def q_fork_best_of_n(sf_dir: str):
    """Best-of-N rejection sampling within shared-prefix fork groups:
    one winner per group by fork-turn length (ties by conv asc). Two
    bounded shuffles. SQL mirror: ranked self-join over the same
    prefix CTEs as preference_pairs."""
    from ..functions.transcripts import fork_best_of_n

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "props"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv": b["user_id"].astype("int64"),
                "ord": b["event_id"].astype("int64"),
                # 7-char prefix key so regenerated "responses" collide
                # into fork groups, like the preference_pairs fixture;
                # the score is the FULL text's length so winners vary
                "text": b["props"].str[:7],
                "sc": b["props"].str.len(),
            }
        )

    out = (
        fork_best_of_n(
            ev.map_batches(prep, batch_format="pandas"),
            conv_col="conv", order_col="ord", text_col="text",
            prefix_turns=1, score_col="sc",
        )
        .to_pandas()
        .sort_values("prefix")
        .reset_index(drop=True)
    )
    for c in ("conv", "score", "n_candidates"):
        out[c] = out[c].astype("int64")
    return out[["prefix", "conv", "score", "n_candidates"]]


def q_tool_usage_stats(sf_dir: str):
    """Per-conversation tool-call profile: tool-turn/distinct-tool
    counts, dominant tool (ties by name), longest consecutive
    same-tool run (the stuck-agent loop screen). One conv-bucketed
    shuffle; runs are double-cumcount islands. SQL mirror: double
    row_number islands + ranked counts."""
    from ..functions.transcripts import tool_usage_stats

    out = (
        tool_usage_stats(
            _conv_tool_stream(sf_dir),
            conv_col="conv", order_col="ord", tool_col="tool",
        )
        .to_pandas()
        .sort_values("conv")
        .reset_index(drop=True)
    )
    for c in ("conv", "n_turns", "n_tool_turns", "n_distinct_tools",
              "max_tool_run"):
        out[c] = out[c].astype("int64")
    return out[
        ["conv", "n_turns", "n_tool_turns", "n_distinct_tools",
         "top_tool", "max_tool_run"]
    ]


def q_tool_transitions(sf_dir: str):
    """Global tool->tool adjacency counts over per-conversation tool
    turns (the tool-chain graph). Conv-bucketed pair assembly, then
    one bucketed_agg over (from, to) partials. SQL mirror: lead()
    over tool turns + GROUP BY."""
    from ..functions.transcripts import tool_transitions

    out = (
        tool_transitions(
            _conv_tool_stream(sf_dir),
            conv_col="conv", order_col="ord", tool_col="tool",
        )
        .to_pandas()
        .sort_values(["tool_from", "tool_to"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out[["tool_from", "tool_to", "n"]]


def _fork_score_stream(sf_dir: str):
    """Shared fixture for the fork-group RL-data queries: the same
    7-char-prefix / full-length-score shape as q_fork_best_of_n."""
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "props"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv": b["user_id"].astype("int64"),
                "ord": b["event_id"].astype("int64"),
                "text": b["props"].str[:7],
                "sc": b["props"].str.len(),
            }
        )

    return ev.map_batches(prep, batch_format="pandas")


def q_fork_advantage(sf_dir: str):
    """GRPO-style group-relative advantage over shared-prefix fork
    groups: exact-integer numerator (score*n - sum) divided once, so
    the float column hash-matches the SQL window mirror."""
    from ..functions.transcripts import fork_advantage

    out = (
        fork_advantage(
            _fork_score_stream(sf_dir),
            conv_col="conv", order_col="ord", text_col="text",
            prefix_turns=1, score_col="sc",
        )
        .to_pandas()
        .sort_values(["prefix", "conv"])
        .reset_index(drop=True)
    )
    for c in ("conv", "score", "n_candidates"):
        out[c] = out[c].astype("int64")
    out["advantage"] = out["advantage"].astype("float64")
    return out[["prefix", "conv", "score", "n_candidates", "advantage"]]


def q_fork_zscore(sf_dir: str):
    """GRPO z-score normalization (normalize="std"): advantage =
    (score − mean)/std_pop, hash-exact via the algebraic form
    (sc·n − s)/sqrt(n·ss − s²) over exact ints; zero-variance
    groups get 0."""
    from ..functions.transcripts import fork_advantage

    out = (
        fork_advantage(
            _fork_score_stream(sf_dir),
            conv_col="conv", order_col="ord", text_col="text",
            prefix_turns=1, score_col="sc", normalize="std",
        )
        .to_pandas()
        .sort_values(["prefix", "conv"])
        .reset_index(drop=True)
    )
    for c in ("conv", "score", "n_candidates"):
        out[c] = out[c].astype("int64")
    out["advantage"] = out["advantage"].astype("float64")
    return out[["prefix", "conv", "score", "n_candidates", "advantage"]]


def q_fork_pass_rate(sf_dir: str):
    """Per-fork-group pass@k table (threshold = 9, the fixture's max
    score, so pass means the fork scored at the ceiling); pass_rate is
    one exact-int division."""
    from ..functions.transcripts import fork_pass_rate

    out = (
        fork_pass_rate(
            _fork_score_stream(sf_dir),
            conv_col="conv", order_col="ord", text_col="text",
            prefix_turns=1, score_col="sc", threshold=9,
        )
        .to_pandas()
        .sort_values("prefix")
        .reset_index(drop=True)
    )
    for c in ("n_candidates", "n_pass"):
        out[c] = out[c].astype("int64")
    out["pass_rate"] = out["pass_rate"].astype("float64")
    return out[["prefix", "n_candidates", "n_pass", "pass_rate"]]


def q_retry_edit_distance(sf_dir: str):
    """Edit distance between consecutive same-role turns (retry
    divergence). The engine DP is byte-level to match DuckDB's
    levenshtein(); pairs are lag() matches within a conversation."""
    from ..functions.transcripts import retry_edit_distance

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "props"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv": b["user_id"].astype("int64"),
                "ord": b["event_id"].astype("int64"),
                "role": b["event_type"],
                "text": b["props"],
            }
        )

    out = (
        retry_edit_distance(
            ev.map_batches(prep, batch_format="pandas"),
            conv_col="conv", order_col="ord", role_col="role",
            text_col="text",
        )
        .to_pandas()
        .sort_values(["conv", "ord"])
        .reset_index(drop=True)
    )
    for c in ("conv", "ord", "dist", "len_prev", "len_next"):
        out[c] = out[c].astype("int64")
    return out[["conv", "ord", "role", "dist", "len_prev", "len_next"]]


def q_discounted_returns(sf_dir: str):
    """RL credit assignment: horizon-16 gamma=0.5 discounted return
    per turn. Power-of-two gamma makes every term dyadic, so the
    float column is hash-exact vs the SQL join-sum."""
    from ..functions.transcripts import discounted_returns

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "props"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv": b["user_id"].astype("int64"),
                "ord": b["event_id"].astype("int64"),
                "reward": b["props"].str.len().astype("int64"),
            }
        )

    out = (
        discounted_returns(
            ev.map_batches(prep, batch_format="pandas"),
            conv_col="conv", order_col="ord", reward_col="reward",
            gamma=0.5, horizon=16,
        )
        .to_pandas()
        .sort_values(["conv", "ord"])
        .reset_index(drop=True)
    )
    for c in ("conv", "ord", "reward"):
        out[c] = out[c].astype("int64")
    out["ret"] = out["ret"].astype("float64")
    return out[["conv", "ord", "reward", "ret"]]


def q_pseudonymize_ids(sf_dir: str):
    """Keyed de-identification: user ids replaced by md5(key|id)
    tokens — deterministic (joins still line up) and irreversible
    without the key. Per-batch map, no shuffle."""
    from ..functions.text import pseudonymize

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "user_token": b["user_id"].astype("int64").astype(str),
            }
        )

    out = (
        pseudonymize(
            ev.map_batches(prep, batch_format="pandas"),
            ["user_token"], key="k1",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out["event_id"] = out["event_id"].astype("int64")
    return out[["event_id", "user_token"]]


def q_fence_lint(sf_dir: str):
    """Code-fence balance / truncated-generation screen: per
    conversation, fenced-turn and odd-fence-count (truncated) turn
    counts plus the final-turn-truncated flag. Texts derived as
    repeat('```', event_id % 4) || props so fence parity varies; the
    shuffle carries 4 int columns, never the texts. SQL mirror:
    (length - length(replace)) // 3 + arg_max parity."""
    from ..functions.transcripts import fence_lint

    src = _conv_stream(sf_dir)

    def fence_text(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        k = (b["ord"].to_numpy() % 4).astype(np.int64)
        fences = np.array(
            ["", "```", "``````", "`````````"], dtype=object
        )[k]
        txt = b["text"]
        notna = txt.notna().to_numpy()
        out = np.full(len(b), None, dtype=object)
        out[notna] = fences[notna] + txt.to_numpy(dtype=object)[notna]
        b["text"] = out
        return b

    out = (
        fence_lint(
            src.map_batches(fence_text, batch_format="pandas"),
            conv_col="conv", order_col="ord", text_col="text",
        )
        .to_pandas()
        .sort_values("conv")
        .reset_index(drop=True)
    )
    for c in ("conv", "n_turns", "n_fenced_turns", "n_unbalanced"):
        out[c] = out[c].astype("int64")
    out["last_unbalanced"] = out["last_unbalanced"].astype(bool)
    out["ok"] = out["ok"].astype(bool)
    return out[
        ["conv", "n_turns", "n_fenced_turns", "n_unbalanced",
         "last_unbalanced", "ok"]
    ]


def q_system_prompt_inventory(sf_dir: str):
    """Opening-turn (system-prompt) template inventory: distinct
    first-turn texts with conversation counts and a representative
    conv. Two bounded shuffles: per-conv candidates, then one row per
    CONVERSATION grouped by text. SQL mirror: row_number()=1 +
    GROUP BY."""
    from ..functions.transcripts import system_prompt_inventory

    out = (
        system_prompt_inventory(
            _conv_stream(sf_dir),
            conv_col="conv", order_col="ord", text_col="text",
        )
        .to_pandas()
        .sort_values("prompt", na_position="last")
        .reset_index(drop=True)
    )
    out["n_convs"] = out["n_convs"].astype("int64")
    out["example_conv"] = out["example_conv"].astype("int64")
    return out[["prompt", "n_convs", "example_conv"]]


def q_dialogue_acts(sf_dir: str):
    """Per-conversation dialogue-act profile (question / command /
    statement) over 'view' turns. Texts derived per event_id % 3 so
    every act branch is exercised; classification + partials are
    map-side, ONE bounded shuffle. SQL mirror: CASE + LIKE +
    string_split first token."""
    from ..functions.transcripts import dialogue_acts

    src = _conv_stream(sf_dir)

    def acts_text(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        txt = b["text"]
        k = (b["ord"].to_numpy() % 3).astype(np.int64)
        raw = txt.to_numpy(dtype=object)
        out = np.full(len(b), None, dtype=object)
        nn = txt.notna().to_numpy()
        qm, cm = nn & (k == 0), nn & (k == 1)
        out[qm] = "what is " + raw[qm] + "?"
        out[cm] = "Write " + raw[cm]
        rest = nn & (k == 2)
        out[rest] = raw[rest]
        b["text"] = out
        return b

    out = (
        dialogue_acts(
            src.map_batches(acts_text, batch_format="pandas"),
            conv_col="conv", role_col="role", text_col="text",
            user_role="view",
        )
        .to_pandas()
        .sort_values("conv")
        .reset_index(drop=True)
    )
    for c in ("conv", "n_questions", "n_commands", "n_statements"):
        out[c] = out[c].astype("int64")
    return out[["conv", "n_questions", "n_commands", "n_statements"]]


def q_response_length_trend(sf_dir: str):
    """Verbosity-drift slope per conversation over 'click' turns:
    exact-int OLS numerator/denominator, ONE float division — the
    float column hash-matches the SQL window mirror."""
    from ..functions.transcripts import response_length_trend

    out = (
        response_length_trend(
            _conv_stream(sf_dir),
            conv_col="conv", order_col="ord", text_col="text",
            role_col="role", role="click",
        )
        .to_pandas()
        .sort_values("conv")
        .reset_index(drop=True)
    )
    out["conv"] = out["conv"].astype("int64")
    out["n_turns"] = out["n_turns"].astype("int64")
    out["slope"] = out["slope"].astype("float64")
    return out[["conv", "n_turns", "slope"]]


def q_loss_mask_spans(sf_dir: str):
    """Packed-sequence loss-mask spans: per turn, [span_start,
    span_end) char offsets in the conversation's packed text plus the
    assistant-mask flag — all exact int64, hash-exact vs the windowed
    SUM mirror. Texts never enter the shuffle."""
    from ..functions.transcripts import loss_mask_spans

    out = (
        loss_mask_spans(
            _conv_stream(sf_dir),
            conv_col="conv", order_col="ord", text_col="text",
            role_col="role", mask_role="click",
        )
        .to_pandas()
        .sort_values(["conv", "ord"])
        .reset_index(drop=True)
    )
    for c in ("conv", "ord", "span_start", "span_end"):
        out[c] = out[c].astype("int64")
    out["mask"] = out["mask"].astype(bool)
    return out[["conv", "ord", "span_start", "span_end", "mask"]]


def q_cdc_schema_evolve(sf_dir: str):
    """Mid-stream schema evolution through the full engine: phase-0
    changelog files carry the base schema, phase-1 files ADD a `score`
    column (phases split on (event_id // 40) % 2, so the SAME keys
    straddle the evolution and LWW interleaves across it). Two
    sequential applies into one lake; read_table pads pre-evolution
    winners with NULL score from footers. Oracle: global LWW over the
    union with CASE-derived score."""
    from .cdc import apply_changes, read_table

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props",
                 "value"],
    )

    def derive(batch: pa.Table, phase: int) -> pa.Table:
        base = _derive_batch(batch)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        keep = pa.array(((eid // 40) % 2) == phase)
        base = base.filter(keep)
        if phase == 1:
            score = batch["value"].combine_chunks() if isinstance(
                batch["value"], pa.ChunkedArray) else batch["value"]
            base = base.append_column(
                pa.field("score", pa.float64()), pc.filter(score, keep)
            )
        return base

    ch_a, ch_b, lake = _scratch("chA"), _scratch("chB"), _scratch("lake")
    ev.map_batches(
        lambda b: derive(b, 0), batch_format="pyarrow"
    ).write_parquet(ch_a)
    ev.map_batches(
        lambda b: derive(b, 1), batch_format="pyarrow"
    ).write_parquet(ch_b)
    spec = _spec(sf_dir)
    apply_changes(ch_a, lake, spec)
    apply_changes(ch_b, lake, spec)
    df = (
        read_table(lake)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["score"] = df["score"].astype("float64")
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts",
               "score"]]


def q_cdc_clone_branch(sf_dir: str):
    """Zero-copy branch isolation under the oracle gate: apply
    phase-0 events, clone (hard-link branch) the lake, apply phase-1
    events to the ORIGINAL only, then read the BRANCH — it must equal
    the LWW state over phase-0 events alone (writes after the branch
    point are invisible to it)."""
    from .cdc import apply_changes, read_table
    from .clone import clone_lake

    ev = _events(sf_dir)

    def derive_phase(batch: pa.Table, phase: int) -> pa.Table:
        base = _derive_batch(batch)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        return base.filter(pa.array(((eid // 40) % 2) == phase))

    ch_a, ch_b = _scratch("cl-chA"), _scratch("cl-chB")
    lake, branch = _scratch("cl-lake"), _scratch("cl-branch")
    shutil.rmtree(branch)  # clone_lake wants a fresh dir
    ev.map_batches(
        lambda b: derive_phase(b, 0), batch_format="pyarrow"
    ).write_parquet(ch_a)
    ev.map_batches(
        lambda b: derive_phase(b, 1), batch_format="pyarrow"
    ).write_parquet(ch_b)
    spec = _spec(sf_dir)
    apply_changes(ch_a, lake, spec)
    clone_lake(lake, branch)
    apply_changes(ch_b, lake, spec)  # diverges AFTER the branch point
    df = (
        read_table(branch)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


def q_cdc_gc_read(sf_dir: str):
    """GC safety under the oracle gate: apply the changelog as three
    chunked commits, garbage-collect every superseded version's
    unreferenced files (keep_versions=1, no age grace), and read —
    the surviving files must still serve the exact LWW state."""
    from ..state.manifest import ManifestStore
    from .cdc import apply_changes, read_table

    changes, lake = _write_changelog(sf_dir, n_files=6), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir), commit_every_files=2)
    ManifestStore(lake).gc(keep_versions=1, min_age_seconds=0.0)
    df = (
        read_table(lake)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


def q_cdc_export_read(sf_dir: str):
    """Snapshot-export fidelity under the oracle gate: apply, export
    the visible state to plain partitioned Parquet (the engine-less
    consumer hand-off), and read the EXPORT back with a plain
    read_parquet — it must equal the LWW state byte-for-byte."""
    import glob as _glob

    from .cdc import apply_changes
    from .export import export_snapshot

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    out = _scratch("export")
    apply_changes(changes, lake, _spec(sf_dir))
    export_snapshot(lake, out)
    files = sorted(_glob.glob(os.path.join(out, "part=*", "*.parquet")))
    df = (
        rd.read_parquet(files)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


def q_fork_margin(sf_dir: str):
    """Best-vs-runner-up margin per fork group (RM-label confidence):
    same fixture as the other fork ops; ranking (score DESC, conv ASC)
    mirrors the SQL row_number; singleton groups get NULL
    second/margin."""
    from ..functions.transcripts import fork_margin

    out = (
        fork_margin(
            _fork_score_stream(sf_dir),
            conv_col="conv", order_col="ord", text_col="text",
            prefix_turns=1, score_col="sc",
        )
        .to_pandas()
        .sort_values("prefix")
        .reset_index(drop=True)
    )
    out["n_candidates"] = out["n_candidates"].astype("int64")
    out["best_conv"] = out["best_conv"].astype("int64")
    out["best_score"] = out["best_score"].astype("int64")
    # DOUBLE on both sides: DuckDB's pandas dtype for a nullable int
    # column flips int64/float64 with NULL presence (scale-dependent),
    # so the stable hash contract is float64 + NaN.
    out["second_score"] = out["second_score"].astype("float64")
    out["margin"] = out["margin"].astype("float64")
    return out[
        ["prefix", "n_candidates", "best_conv", "best_score",
         "second_score", "margin"]
    ]


def q_pack_conversations(sf_dir: str):
    """Conversation packing: one row per conversation, role-prefixed
    turn texts joined in turn order. SQL mirror: string_agg ORDER BY."""
    from ..functions.transcripts import pack_conversations

    out = (
        pack_conversations(
            _conv_stream(sf_dir),
            conv_col="conv", order_col="ord", text_col="text",
            role_col="role",
        )
        .to_pandas()
        .sort_values("conv")
        .reset_index(drop=True)
    )
    out["conv"] = out["conv"].astype("int64")
    out["n_turns"] = out["n_turns"].astype("int64")
    return out[["conv", "n_turns", "text"]]


def q_conv_near_dup(sf_dir: str):
    """Conversation-level near-dedup: every conversation gets a
    lightly perturbed twin (conv+100000, every 7th turn text altered),
    the corpus is packed one-row-per-conversation, and MinHash-LSH +
    exact-Jaccard + connected-components keeps one survivor per
    near-dup cluster — originals win by min-id. Rows-only check (the
    LSH pipeline is not SQL-expressible); deterministic fixture."""
    from ..functions.dedup import near_dedup
    from ..functions.transcripts import pack_conversations

    src = _conv_stream(sf_dir)

    def twin(b: pd.DataFrame) -> pd.DataFrame:
        alt = b.copy()
        alt["conv"] = alt["conv"] + 100_000
        perturb = (alt["ord"] % 7 == 0) & alt["text"].notna()
        alt.loc[perturb, "text"] = alt.loc[perturb, "text"] + " X"
        return pd.concat([b, alt], ignore_index=True)

    packed = pack_conversations(
        src.map_batches(twin, batch_format="pandas"),
        conv_col="conv", order_col="ord", text_col="text", sep="\n",
    )
    survivors = near_dedup(
        packed, threshold=0.6, text_col="text", id_col="conv",
        num_perm=64, bands=16,
    )
    out = survivors.to_pandas().sort_values("conv").reset_index(drop=True)
    out["conv"] = out["conv"].astype("int64")
    out["n_turns"] = out["n_turns"].astype("int64")
    return out[["conv", "n_turns"]]


def q_cdc_transcript_refinery(sf_dir: str):
    """Flagship CDC -> training-shards composition: full engine apply
    (exactly-once LWW lake), then the transcript refinery — collapse
    consecutive same-role turns, pack role-prefixed conversations,
    deterministic split assignment. Every stage SQL-mirrorable, so the
    END-TO-END composition is hash-exact against one oracle CTE."""
    from .cdc import apply_changes, read_table
    from .refinery import transcript_refinery

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    out = (
        transcript_refinery(read_table(lake))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    out["n_turns"] = out["n_turns"].astype("int64")
    out["packed_chars"] = out["packed_chars"].astype("int64")
    return out[["conv_id", "n_turns", "packed_chars", "text", "split"]]


def q_cdc_rollback(sf_dir: str):
    """Rollback under the oracle gate (the DQ-demotion path): commit
    the stream as two halves, roll CURRENT back to v1, and read — the
    lake must serve exactly the LWW state over the first half, with
    v2's files demoted but not destroyed."""
    import pyarrow.parquet as pq

    from ..state.manifest import ManifestStore
    from .cdc import apply_changes, read_table

    changes, lake = _scratch("rb-changes"), _scratch("lake")
    full = pa.concat_tables(
        _changes_ds(sf_dir).iter_batches(
            batch_format="pyarrow", batch_size=65536
        )
    )
    cut = pc.max(full["seq"]).as_py() // 2
    pq.write_table(
        full.filter(pc.less(full["seq"], pa.scalar(cut, pa.int64()))),
        os.path.join(changes, "ch-000.parquet"),
    )
    pq.write_table(
        full.filter(pc.greater_equal(full["seq"], pa.scalar(cut, pa.int64()))),
        os.path.join(changes, "ch-001.parquet"),
    )
    spec = _spec(sf_dir)
    m1 = apply_changes(
        [os.path.join(changes, "ch-000.parquet")], lake, spec
    )[-1]
    apply_changes(changes, lake, spec)
    ManifestStore(lake).rollback(m1.version)
    df = read_table(lake).to_pandas()  # CURRENT, not a pinned version
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def q_cdc_schema_widen(sf_dir: str):
    """Type-widening evolution under the oracle gate: phase-0 files
    carry `score` as float32, phase-1 files as float64 — the lake
    column widens monotonically (promote_type), old float32 values
    surviving LWW are served exactly (float32 -> float64 is lossless).
    Oracle: LWW with CASE-phased CAST(REAL)/DOUBLE derivation."""
    from .cdc import apply_changes, read_table

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props",
                 "value"],
    )

    def derive(batch: pa.Table, phase: int) -> pa.Table:
        base = _derive_batch(batch)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        keep = pa.array(((eid // 40) % 2) == phase)
        typ = pa.float32() if phase == 0 else pa.float64()
        score = batch["value"].combine_chunks() if isinstance(
            batch["value"], pa.ChunkedArray) else batch["value"]
        return base.filter(keep).append_column(
            pa.field("score", typ), pc.filter(score, keep).cast(typ)
        )

    ch_a, ch_b, lake = _scratch("wA"), _scratch("wB"), _scratch("lake")
    ev.map_batches(
        lambda b: derive(b, 0), batch_format="pyarrow"
    ).write_parquet(ch_a)
    ev.map_batches(
        lambda b: derive(b, 1), batch_format="pyarrow"
    ).write_parquet(ch_b)
    spec = _spec(sf_dir)
    apply_changes(ch_a, lake, spec)
    apply_changes(ch_b, lake, spec)
    df = (
        read_table(lake)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    assert str(df["score"].dtype) == "float64", df["score"].dtype
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts",
               "score"]]


def q_cdc_maintain_read(sf_dir: str):
    """Policy-driven maintenance under the oracle gate: apply as many
    small chunked commits (stacking LSM runs / small files), run the
    `maintain` decision loop until it reports nothing left to do, and
    read — every corrective rewrite (compact or rebalance) must
    preserve the exact LWW state."""
    from .cdc import apply_changes, read_table
    from .maintain import maintain

    changes, lake = _write_changelog(sf_dir, n_files=8), _scratch("lake")
    apply_changes(
        changes, lake, _spec(sf_dir),
        commit_every_files=2, max_rows_per_file=400,
    )
    for _ in range(4):  # at most one action per call; run to fixpoint
        if maintain(
            lake, max_files_per_partition=2, target_rows_per_file=4000,
        )["action"] == "none":
            break
    df = (
        read_table(lake)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


def q_cdc_incremental_refinery(sf_dir: str):
    """Incremental curation == full recompute, under the oracle gate:
    run the transcript refinery over snapshot v1, commit more changes,
    then re-curate ONLY the conversations the v1->v2 change feed names
    (CDF-pruned; the re-read is partition+zone-map pruned point
    lookups) and splice over the v1 results. The spliced table must
    hash-match the full-recompute oracle over the final state — the
    100-TB re-curation pattern: work scales with the delta, not the
    corpus."""
    import pyarrow.parquet as pq

    from .cdc import apply_changes, read_conversations, read_table
    from .cdf import table_changes
    from .refinery import transcript_refinery

    changes, lake = _scratch("ir-changes"), _scratch("lake")
    full = pa.concat_tables(
        _changes_ds(sf_dir).iter_batches(
            batch_format="pyarrow", batch_size=65536
        )
    )
    cut = pc.max(full["seq"]).as_py() // 2
    pq.write_table(
        full.filter(pc.less(full["seq"], pa.scalar(cut, pa.int64()))),
        os.path.join(changes, "ch-000.parquet"),
    )
    pq.write_table(
        full.filter(pc.greater_equal(full["seq"], pa.scalar(cut, pa.int64()))),
        os.path.join(changes, "ch-001.parquet"),
    )
    spec = _spec(sf_dir)
    m1 = apply_changes(
        [os.path.join(changes, "ch-000.parquet")], lake, spec
    )[-1]
    m2 = apply_changes(changes, lake, spec)[-1]

    base = transcript_refinery(
        read_table(lake, version=m1.version)
    ).to_pandas()
    changed = (
        table_changes(lake, m1.version, m2.version)
        .select_columns(["conv_id"])
        .to_pandas()["conv_id"]
        .unique()
        .tolist()
    )
    redone = transcript_refinery(
        read_conversations(lake, changed)
    ).to_pandas()
    out = (
        pd.concat([base[~base["conv_id"].isin(changed)], redone])
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    out["n_turns"] = out["n_turns"].astype("int64")
    out["packed_chars"] = out["packed_chars"].astype("int64")
    return out[["conv_id", "n_turns", "packed_chars", "text", "split"]]


def q_rater_agreement(sf_dir: str):
    """Cohen's kappa between two derived categorical raters per event
    type — the label-quality gate for judged/annotated data; exact-int
    rational with ONE float division, so the float column hash-matches
    the SQL contingency mirror."""
    from ..functions.aggregates import cohens_kappa

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "props"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["props"].notna()]
        eid = b["event_id"].to_numpy()
        return pd.DataFrame(
            {
                "grp": b["event_type"],
                "ra": (eid % 3).astype("int64"),
                "rb": (
                    (eid + b["props"].str.len().to_numpy()) % 3
                ).astype("int64"),
            }
        )

    out = (
        cohens_kappa(
            ev.map_batches(prep, batch_format="pandas"),
            label_a_col="ra", label_b_col="rb", group_col="grp",
        )
        .to_pandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    return out[["grp", "n_items", "n_agree", "kappa"]]


def q_bradley_terry_rank(sf_dir: str):
    """Bradley-Terry strengths over derived pairwise outcomes between
    the 5 event types (winner = row's type, loser = the type at
    (event_id % 5) among the others; rows where both coincide are
    self-pairs and dropped). Deterministic MM fit; integer win/loss
    columns and ranks are stable — rows-only check (the MM iteration
    is not SQL-expressible)."""
    from ..functions.aggregates import bradley_terry

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type"],
    )
    types = ["click", "error", "purchase", "signup", "view"]

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        loser = pd.Series(
            np.array(types, dtype=object)[
                (b["event_id"].to_numpy() % 5).astype(np.int64)
            ],
            index=b.index,
        )
        out = pd.DataFrame({"w": b["event_type"], "l": loser})
        return out[out["w"] != out["l"]]

    out = bradley_terry(
        ev.map_batches(prep, batch_format="pandas"),
        winner_col="w", loser_col="l",
    )
    out = out.sort_values("item").reset_index(drop=True)
    out["strength"] = out["strength"].round(9)
    return out[["item", "wins", "losses", "strength", "rank"]]


def _pairwise_fixture(sf_dir: str) -> rd.Dataset:
    """Shared derived pairwise-outcome stream for the eval-analytics
    queries: winner = row's event type, loser = the type at
    (event_id % 5); self-pairs dropped (same derivation as
    ``bradley_terry_rank``, kept verbatim in the SQL mirrors)."""
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type"],
    )
    types = ["click", "error", "purchase", "signup", "view"]

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        loser = pd.Series(
            np.array(types, dtype=object)[
                (b["event_id"].to_numpy() % 5).astype(np.int64)
            ],
            index=b.index,
        )
        out = pd.DataFrame(
            {"event_id": b["event_id"], "w": b["event_type"], "l": loser}
        )
        return out[out["w"] != out["l"]]

    return ev.map_batches(prep, batch_format="pandas")


def q_ann_pq_topk(sf_dir: str):
    """Product-quantization ANN with exact re-rank: codebooks train
    distributed (corpus never shuffles), search is one fused
    encode+shortlist+rerank pass — m LUT lookups per vector for the
    shortlist, exact cosines for everything returned. The
    memory-scale path for billion-vector search (m bytes/vector).
    Rows-only gate (shortlist membership is approximate; recall and
    score exactness are pytest-asserted)."""
    from ..functions.similarity import pq_topk

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    # iters=3: each Lloyd's round is a full map_batches pass (fixed Ray
    # overhead dominates at gate scale); codebook quality converges in
    # 2-3 rounds on this fixture and the recall bar lives in pytest
    return pq_topk(ds, [0, 1, 2, 3, 4], k=5, m=8, kc=16, refine=4, iters=3)


def q_cms_user_counts(sf_dir: str):
    """Count-Min point-frequency estimates for a fixed probe set of
    user ids — the sketch path for frequency queries over an unbounded
    key domain: fixed 64 KB partials per block, elementwise-sum merge
    (associative ⇒ bitwise deterministic at any partitioning), never a
    key shuffle. Rows-only gate (the ε-bound guarantee is asserted in
    pytest; estimates are deterministic but not SQL-reproducible)."""
    from ..functions.sketch import cms_counts

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    probes = [0, 1, 2, 3, 5, 8, 13, 21, 34, 10 ** 9]
    return cms_counts(ev, "user_id", probes)


def q_rm_calibration(sf_dir: str):
    """Monotone score calibration (distributed PAV): fit P(purchase |
    floor(value)) as a non-decreasing step function over the integer
    score — the reward-model/judge calibration step. Distinct-score
    outcome totals reduce map-side; per-range PAV stacks compose
    exactly across ranges (driver merges POOLS, never rows). Rows-only
    gate (PAV is not SQL-expressible); the pytest suite proves
    bit-equality with the brute-force global fit."""
    from ..functions.calibrate import isotonic_fit

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["value", "event_type"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "x": np.floor(b["value"].to_numpy()).astype(np.int64),
                "y": (b["event_type"] == "purchase").astype("int64"),
            }
        )

    pools = isotonic_fit(
        ev.map_batches(prep, batch_format="pandas"), x_col="x", y_col="y"
    )
    pools["value"] = pools["value"].round(12)
    return pools.reset_index(drop=True)


def q_cdc_history(sf_dir: str):
    """DESCRIBE-HISTORY surface (Delta-parity lake metadata): the
    change stream lands in four seq-quartile chunks committed one per
    version, and each version's LIVE row count (time-travel read,
    tombstones filtered) must equal the LWW state of the corresponding
    event-id PREFIX — the oracle recomputes every prefix from scratch,
    so this gates both ``ManifestStore.history``'s version chain and
    time-travel read correctness at every intermediate version.
    Fixture chunking is driver-side (it IS the fixture); event_id is
    dense 0..N-1 so the quartile cuts are ``v * N / 4``."""
    import glob

    import pyarrow.parquet as _pq

    from ..state.manifest import ManifestStore
    from .cdc import apply_changes, read_table

    lake = _scratch("lake")
    ch_dir = _scratch("hist_ch")
    changes = _write_changelog(sf_dir)
    tbl = pa.concat_tables(
        [_pq.read_table(p) for p in sorted(glob.glob(os.path.join(changes, "*.parquet")))]
    )
    n = pc.max(tbl["seq"]).as_py() + 1  # event_id is dense 0..N-1
    for v in range(4):
        lo, hi = v * n // 4, (v + 1) * n // 4
        part = tbl.filter(
            pc.and_(
                pc.greater_equal(tbl["seq"], pa.scalar(lo, pa.int64())),
                pc.less(tbl["seq"], pa.scalar(hi, pa.int64())),
            )
        )
        _pq.write_table(part, os.path.join(ch_dir, f"chunk-{v:05d}.parquet"))
    apply_changes(ch_dir, lake, _spec(sf_dir), commit_every_files=1)

    rows = []
    for h in ManifestStore(lake).history():
        v = int(h["version"])
        rows.append(
            {"version": v, "n_rows": int(read_table(lake, version=v).count())}
        )
    return pd.DataFrame(rows).sort_values("version").reset_index(drop=True)


def q_referential_violations(sf_dir: str):
    """Cross-table referential-integrity audit: orders whose custkey
    has no surviving customer row (the parent is filtered to simulate
    lost dimension rows — custkey % 7 == 0 dropped). Child fk counts
    and parent keys both reduce to key-vocabulary size map-side; the
    anti hash_join never sees fact rows."""
    from .dq import referential_check

    child = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    )

    def surviving(b: pa.Table) -> pa.Table:
        # pyarrow.compute has no modulo kernel — numpy, zero-copy in
        m = np.asarray(b["c_custkey"]) % 7 != 0
        return b.filter(pa.array(m))

    parent = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).map_batches(surviving, batch_format="pyarrow")
    out = referential_check(child, parent, fk="o_custkey", pk="c_custkey")
    df = (
        out.to_pandas()
        .sort_values(["n_rows", "o_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    for c in ("o_custkey", "n_rows"):
        df[c] = df[c].astype("int64")
    return df[["o_custkey", "n_rows"]]


def q_winrate_matrix(sf_dir: str):
    """Head-to-head win matrix over the derived pairwise outcomes:
    per unordered type pair, each side's exact win count and the win
    rate (one float division of exact ints). Map-side directed-pair
    partials, ONE bounded shuffle of pair counts."""
    from ..functions.aggregates import pairwise_winrate

    out = pairwise_winrate(
        _pairwise_fixture(sf_dir), winner_col="w", loser_col="l"
    )
    return (
        out.to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )


def q_judge_position_bias(sf_dir: str):
    """Presentation-order bias probe: the winner is presented FIRST on
    even event_ids and SECOND on odd ones, so each item's
    first-position vs second-position win rates (and the __overall__
    first-win rate) are fully determined — the judge-pipeline sanity
    report, computed from 4 int counters per item."""
    from ..functions.aggregates import position_bias

    def present(b: pd.DataFrame) -> pd.DataFrame:
        even = (b["event_id"] % 2 == 0).to_numpy()
        f = b["w"].where(even, b["l"])
        s = b["l"].where(even, b["w"])
        return pd.DataFrame({"f": f, "s": s, "w": b["w"]})

    judged = _pairwise_fixture(sf_dir).map_batches(
        present, batch_format="pandas"
    )
    return position_bias(
        judged, first_col="f", second_col="s", winner_col="w"
    )


def q_running_total_by_seq(sf_dir: str):
    """Global running total over a total order (SUM() OVER (ORDER BY
    event_id)) — the distributed Blelloch scan: range-partition on the
    order column, per-range partials, driver combines P scalars, each
    range finishes with one vectorized cumsum + broadcast offset. ONE
    shuffle; the driver never sees a row. Money floors to cents per
    row first so the running sum is exact at any combine order."""
    from ..functions.scan import ordered_prefix_scan

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "cents": np.floor(b["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    out = ordered_prefix_scan(
        ev.map_batches(prep, batch_format="pandas"),
        order_col="event_id",
        val_col="cents",
        op="sum",
        out_col="running_cents",
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    for c in ("event_id", "cents", "running_cents"):
        df[c] = df[c].astype("int64")
    return df[["event_id", "cents", "running_cents"]]


def q_late_arrivals(sf_dir: str):
    """Watermark / late-data screen (SURVEY §2.9): rows whose event time
    regressed > 21 days behind the max event time of all earlier
    ARRIVALS. The fixture stream is time-ordered, so arrival order is
    simulated by a deterministic hash permutation of event_id — the
    identical expression sits in the SQL mirror's ORDER BY. The
    exclusive running max is the distributed prefix scan (`scan.py`)."""
    from ..functions.scan import late_arrivals

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"]
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy().astype(np.uint64)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "arrival": ((eid * np.uint64(2654435761)) % np.uint64(4294967296)).astype(
                    "int64"
                ),
                "ts_us": b["ts"].astype("datetime64[us]").view("int64"),
            }
        )

    out = late_arrivals(
        ev.map_batches(prep, batch_format="pandas"),
        seq_col="arrival",
        ts_col="ts_us",
        tolerance_us=21 * 24 * 3600 * 1_000_000,
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    df["ts"] = df["ts_us"].astype("datetime64[us]")
    df["watermark"] = df["watermark_us"].astype("datetime64[us]")
    for c in ("event_id",):
        df[c] = df[c].astype("int64")
    return df[["event_id", "ts", "watermark"]]


def q_scd2_history(sf_dir: str):
    """SCD type-2 dimension build from the change stream: per user_id
    ordered by (ts, event_id), consecutive unchanged event_type rows
    collapse, survivors get [valid_from, valid_to) validity windows and
    an is_current flag — the silver->dimensional hop. One key-bucketed
    shuffle, whole-column shifts (functions/windows.scd2_intervals)."""
    from ..functions.windows import scd2_intervals

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    out = scd2_intervals(
        ev,
        key="user_id",
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_col="event_id",
    )
    df = out.to_pandas().sort_values(["user_id", "valid_from"]).reset_index(drop=True)
    df["user_id"] = df["user_id"].astype("int64")
    df["is_current"] = df["is_current"].astype(bool)
    return df[["user_id", "event_type", "valid_from", "valid_to", "is_current"]]


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

from .tpch import (  # noqa: E402
    q_tpch_q3_shipping,
    q_tpch_q5_local_supplier,
    q_tpch_q10_returned,
    q_tpch_q14_promo,
    q_tpch_q17_small_qty,
    q_tpch_q18_big_orders,
    q_tpch_q19_bands,
)
from .tpch2 import (  # noqa: E402
    q_tpch_q4_order_priority,
    q_tpch_q6_forecast,
    q_tpch_q12_shipmode,
    q_tpch_q13_custdist,
    q_tpch_q15_top_supplier,
    q_tpch_q22_global_sales,
)
def q_psi_event_drift(sf_dir: str):
    """Population-stability / Jensen-Shannon drift of the event_type
    mix between the two halves of the observed ts range: domain-sized
    (bin, side) histogram exchange, Laplace-smoothed proportions,
    per-bin terms floor-quantized to integer nanos (the
    grouped_entropy convention) so the SQL mirror hash-matches
    despite logarithms."""
    from ..functions.drift import categorical_drift

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )
    out = categorical_drift(ev, col="event_type")
    return out[["event_type", "n_a", "n_b", "psi_nano", "js_nano"]]


def q_ks_value_drift(sf_dir: str):
    """Exact two-sample Kolmogorov-Smirnov drift of value cents
    between the ts-range halves: D as the exact rational
    d_num/(n_a*n_b) folded from a value-domain-sized histogram with
    Python-int arithmetic (cum*N products pass int64 at 10^10
    events) — no floats anywhere, fully hash-exact."""
    from ..functions.drift import ks_drift

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["value", "ts"]
    )

    def cents(b: pd.DataFrame) -> pd.Series:
        return pd.Series(
            np.floor(b["value"].to_numpy(dtype=np.float64) * 100.0).astype(
                np.int64
            )
        )

    return ks_drift(
        ev, value_fn=cents, value_col="v", cols=["value", "ts"]
    )


def q_mwu_value_drift(sf_dir: str):
    """Exact Mann-Whitney U rank-sum drift of value cents between the
    ts-range halves (doubled U so midrank tie credit stays integral)
    plus the exact ppm-floored AUC effect size — same domain-sized
    histogram shape as the KS query."""
    from ..functions.drift import mannwhitney_drift

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["value", "ts"]
    )

    def cents(b: pd.DataFrame) -> pd.Series:
        return pd.Series(
            np.floor(b["value"].to_numpy(dtype=np.float64) * 100.0).astype(
                np.int64
            )
        )

    return mannwhitney_drift(
        ev, value_fn=cents, value_col="v", cols=["value", "ts"]
    )


def q_embedding_drift(sf_dir: str):
    """Embedding-centroid drift between the two parity halves of the
    corpus: cosine of the per-side mean vectors + mean-norm ratio,
    from exact int64 micro-quantized per-dimension sums (the exchange
    carries dims × 2 rows per block, never vectors) — each statistic
    is one straight-line double expression floored to nanos, SQL-exact
    vs a HUGEINT unnest mirror."""
    from ..functions.drift import embedding_drift

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return embedding_drift(emb, id_col="vec_id", vec_col="embedding")


def q_cdc_branch_merge(sf_dir: str):
    """Git-for-data three-way merge (``pipelines/branch.py``): main is
    built from the standard changelog and cloned; the BRANCH applies
    'B:'-prefixed edits (user_id%3==0) plus deletes (%3!=0 and %7==3,
    +90min) while MAIN concurrently applies 'M:'-prefixed edits
    (%5==0, +2h); ``merge_branch(policy="lww")`` folds the branch back.
    With authentic (ts, seq) credentials the merged state equals the
    global LWW over the UNION of all three change streams — which is
    exactly what the SQL mirror ranks — so conflicts (%15==0 keys,
    where main's +2h beats the branch's +1h) resolve identically on
    both sides, hash-exact."""
    from .branch import merge_branch
    from .cdc import apply_changes
    from .clone import clone_lake

    changes = _write_changelog(sf_dir)
    main, branch = _scratch("mergemain"), _scratch("mergebranch")
    apply_changes(changes, main, _spec(sf_dir))
    clone_lake(main, branch)

    ev = _events(sf_dir)

    def _branch_edits(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        ts = b["ts"].to_pandas()
        conv = np.char.add("conv_", uid.astype("U20")).astype(object)
        mu = uid % 3 == 0
        md = (uid % 3 != 0) & (uid % 7 == 3)
        props = b["props"].to_pandas()
        frames = []
        if mu.any():
            frames.append(pd.DataFrame({
                "op": "U", "seq": eid[mu] + 1_000_000_000,
                "conv_id": conv[mu],
                "turn_idx": (eid[mu] % 40).astype(np.int32),
                "role": b["event_type"].to_pandas()[mu].to_numpy(),
                "text": ("B:" + props[mu].astype("string")).to_numpy(
                    dtype=object, na_value=None),
                "tool": None,
                "ts": (ts[mu] + pd.Timedelta(hours=1)).to_numpy(),
            }))
        if md.any():
            frames.append(pd.DataFrame({
                "op": "D", "seq": eid[md] + 3_000_000_000,
                "conv_id": conv[md],
                "turn_idx": (eid[md] % 40).astype(np.int32),
                "role": None, "text": None, "tool": None,
                "ts": (ts[md] + pd.Timedelta(minutes=90)).to_numpy(),
            }))
        out = pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame(columns=["op", "seq", "conv_id", "turn_idx",
                                  "role", "text", "tool", "ts"])
        return _edit_tbl(out)

    def _main_edits(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        mm = uid % 5 == 0
        props = b["props"].to_pandas()
        out = pd.DataFrame({
            "op": "U", "seq": eid[mm] + 2_000_000_000,
            "conv_id": np.char.add(
                "conv_", uid[mm].astype("U20")).astype(object),
            "turn_idx": (eid[mm] % 40).astype(np.int32),
            "role": b["event_type"].to_pandas()[mm].to_numpy(),
            "text": ("M:" + props[mm].astype("string")).to_numpy(
                dtype=object, na_value=None),
            "tool": None,
            "ts": (b["ts"].to_pandas()[mm] + pd.Timedelta(hours=2)).to_numpy(),
        })
        return _edit_tbl(out)

    def _edit_tbl(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "op": pa.array(df["op"].astype(object), pa.string()),
            "seq": pa.array(df["seq"].astype("int64"), pa.int64()),
            "conv_id": pa.array(df["conv_id"].astype(object), pa.string()),
            "turn_idx": pa.array(df["turn_idx"], pa.int32()),
            "role": pa.array(df["role"].astype(object), pa.string()),
            "text": pa.array(df["text"].astype(object), pa.string()),
            "tool": pa.nulls(len(df), pa.string()),
            "ts": pa.array(pd.to_datetime(df["ts"])).cast(pa.timestamp("us")),
        })

    bdir, mdir = _scratch("bedits"), _scratch("medits")
    ev.map_batches(_branch_edits, batch_format="pyarrow").write_parquet(bdir)
    ev.map_batches(_main_edits, batch_format="pyarrow").write_parquet(mdir)
    apply_changes(bdir, branch)
    apply_changes(mdir, main)

    merge_branch(branch, main, policy="lww")
    return _final_df(main)


BRANCH_MERGE_SQL = f"""
  WITH ch AS ({CH_SQL}),
  be AS (
    SELECT 'U' AS op, event_id + 1000000000 AS seq,
           'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
           CAST(event_id % 40 AS INTEGER) AS turn_idx,
           event_type AS role, 'B:' || props AS text,
           CAST(NULL AS VARCHAR) AS tool,
           ts + INTERVAL 1 HOUR AS ts
    FROM events WHERE user_id % 3 = 0
  ),
  bd AS (
    SELECT 'D' AS op, event_id + 3000000000 AS seq,
           'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
           CAST(event_id % 40 AS INTEGER) AS turn_idx,
           CAST(NULL AS VARCHAR) AS role, CAST(NULL AS VARCHAR) AS text,
           CAST(NULL AS VARCHAR) AS tool,
           ts + INTERVAL 90 MINUTE AS ts
    FROM events WHERE user_id % 3 <> 0 AND user_id % 7 = 3
  ),
  me AS (
    SELECT 'U' AS op, event_id + 2000000000 AS seq,
           'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
           CAST(event_id % 40 AS INTEGER) AS turn_idx,
           event_type AS role, 'M:' || props AS text,
           CAST(NULL AS VARCHAR) AS tool,
           ts + INTERVAL 2 HOUR AS ts
    FROM events WHERE user_id % 5 = 0
  ),
  allch AS (
    SELECT * FROM ch UNION ALL SELECT * FROM be
    UNION ALL SELECT * FROM bd UNION ALL SELECT * FROM me
  ),
  ranked AS (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
    FROM allch
  )
  SELECT conv_id, turn_idx, role, text, tool, ts
  FROM ranked WHERE rn = 1 AND op <> 'D'
  ORDER BY conv_id, turn_idx
"""


def q_cdc_delete_where(sf_dir: str):
    """Predicate DELETE (``pipelines/dml.py``): tombstone every current
    row with role='click' AND turn_idx BETWEEN 5 AND 20 through the one
    exactly-once apply path — candidate files zone-map pruned where
    LWW-safe, matched rows streamed (never driver-collected), winning
    tombstones committed as an ordinary version. Result = the SQL final
    state with the same WHERE negated (NULL predicate columns never
    match, SQL semantics on both sides)."""
    from .cdc import apply_changes
    from .dml import delete_where

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    delete_where(
        lake, [("role", "==", "click"), ("turn_idx", "between", (5, 20))],
        _spec(sf_dir),
    )
    return _final_df(lake)


def q_cdc_update_where(sf_dir: str):
    """Predicate UPDATE (``pipelines/dml.py``): rewrite text ->
    'X:' || text and role -> 'edited' on every current row with
    turn_idx < 7, via winning upsert events that carry the committed
    row's own ts (the surviving row keeps its timestamp — asserted by
    the hash). NULL text stays NULL ('X:' || NULL), matching SQL
    concat semantics."""
    from .cdc import apply_changes
    from .dml import update_where

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    update_where(
        lake,
        [("turn_idx", "<", 7)],
        {
            "text": lambda b: pc.binary_join_element_wise(
                pa.scalar("X:"), b["text"], ""
            ),
            "role": "edited",
        },
        _spec(sf_dir),
    )
    return _final_df(lake)


def q_cdc_merge_into(sf_dir: str):
    """MERGE INTO (``pipelines/dml.py``): the source is derived from the
    committed state itself — keys with turn_idx%5==2 become matched
    UPDATEs ('S:' || text, ts shifted +1h to prove the unconditional
    clause overrides regardless of source ts: the merged row must keep
    the COMMITTED ts), keys with turn_idx%7==3 re-keyed to turn_idx+100
    become NOT-MATCHED INSERTs ('N:' || text, source ts carried). Match
    detection is ONE co-partitioning hash_join against a key-projection
    scan of the lake."""
    from .cdc import apply_changes, read_table
    from .dml import merge_into

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))

    state = read_table(lake)

    def to_source(b: pa.Table) -> pa.Table:
        ti = b["turn_idx"].to_numpy(zero_copy_only=False)
        upd = b.filter(pa.array(ti % 5 == 2))
        upd = upd.set_column(
            upd.column_names.index("text"), "text",
            pc.binary_join_element_wise(pa.scalar("S:"), pc.fill_null(upd["text"], ""), ""),
        )
        one_h = pa.scalar(3_600_000_000, pa.duration("us"))
        upd = upd.set_column(
            upd.column_names.index("ts"), "ts", pc.add(upd["ts"], one_h)
        )
        ins = b.filter(pa.array(ti % 7 == 3))
        ins = ins.set_column(
            ins.column_names.index("turn_idx"), "turn_idx",
            pc.add(ins["turn_idx"], pa.scalar(100, pa.int32())).cast(pa.int32()),
        )
        ins = ins.set_column(
            ins.column_names.index("text"), "text",
            pc.binary_join_element_wise(pa.scalar("N:"), pc.fill_null(ins["text"], ""), ""),
        )
        return pa.concat_tables([upd, ins])

    source = state.map_batches(to_source, batch_format="pyarrow")
    merge_into(lake, source, _spec(sf_dir))
    return _final_df(lake)



def q_cdc_row_provenance(sf_dir: str):
    """Row-level provenance audit (``stats.row_provenance``): the
    stream lands in four seq-quartile chunks committed one per version
    (the ``cdc_history`` fixture), then every surviving row is
    annotated with the commit version that wrote it — its winning
    event's seq bucketed over the per-version watermarks. event_id is
    dense 0..N-1, so the oracle recomputes the same bucketing as
    1 + how many quartile cuts lie at or below the winning seq."""
    import glob

    import pyarrow.parquet as _pq

    from .cdc import apply_changes
    from .stats import row_provenance

    lake = _scratch("lake")
    ch_dir = _scratch("prov_ch")
    changes = _write_changelog(sf_dir)
    tbl = pa.concat_tables(
        [_pq.read_table(p) for p in sorted(glob.glob(os.path.join(changes, "*.parquet")))]
    )
    n = pc.max(tbl["seq"]).as_py() + 1
    for v in range(4):
        lo, hi = v * n // 4, (v + 1) * n // 4
        part = tbl.filter(
            pc.and_(
                pc.greater_equal(tbl["seq"], pa.scalar(lo, pa.int64())),
                pc.less(tbl["seq"], pa.scalar(hi, pa.int64())),
            )
        )
        _pq.write_table(part, os.path.join(ch_dir, f"chunk-{v:05d}.parquet"))
    apply_changes(ch_dir, lake, _spec(sf_dir), commit_every_files=1)
    df = row_provenance(lake).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


ROW_PROVENANCE_SQL = f"""
  WITH ch AS ({CH_SQL}),
  n AS (SELECT max(seq) + 1 AS n FROM ch),
  ranked AS (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
    FROM ch
  )
  SELECT conv_id, turn_idx, role, text, tool, ts,
         CAST(1 + CASE WHEN seq >= 1 * n // 4 THEN 1 ELSE 0 END
                + CASE WHEN seq >= 2 * n // 4 THEN 1 ELSE 0 END
                + CASE WHEN seq >= 3 * n // 4 THEN 1 ELSE 0 END
              AS BIGINT) AS wrote_version
  FROM ranked, n WHERE rn = 1 AND op <> 'D'
  ORDER BY conv_id, turn_idx
"""


DELETE_WHERE_SQL = f"""
  WITH final AS ({FINAL_SQL})
  SELECT conv_id, turn_idx, role, text, tool, ts
  FROM final
  WHERE NOT coalesce(role = 'click' AND turn_idx BETWEEN 5 AND 20, false)
  ORDER BY conv_id, turn_idx
"""


def q_cdc_delete_where_or(sf_dir: str):
    """Disjunctive predicate DELETE (DNF): (role='click' AND turn_idx<10)
    OR turn_idx>=35 — file pruning keeps a file when ANY disjunct group
    may match; the row mask ORs the group masks (NULL never matches,
    SQL semantics)."""
    from .cdc import apply_changes
    from .dml import delete_where

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    delete_where(
        lake,
        [
            [("role", "==", "click"), ("turn_idx", "<", 10)],
            [("turn_idx", ">=", 35)],
        ],
        _spec(sf_dir),
    )
    return _final_df(lake)



def q_cdc_ddl_cycle(sf_dir: str):
    """Metadata-only DDL composed with DML (``pipelines/ddl.py``):
    ADD COLUMN score (O(1), no data files touched; reads null-pad),
    UPDATE fills it for turn_idx < 10 (the DML events carry the evolved
    schema), DROP COLUMN tool (readers project it away). The oracle
    mirrors the whole cycle over the SQL final state."""
    import pyarrow as _pa

    from .cdc import apply_changes
    from .ddl import add_column, drop_column
    from .dml import update_where

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))
    add_column(lake, "score", _pa.float64())
    update_where(lake, [("turn_idx", "<", 10)], {"score": 2.5}, _spec(sf_dir))
    drop_column(lake, "tool")
    return _final_df(lake)



def q_cdc_scan_dnf(sf_dir: str):
    """Generalized predicate scan (``dml.scan_where``): a disjunctive
    multi-column predicate — (role='view' AND turn_idx BETWEEN 10 AND
    25) OR (role='error') — over the committed state, zone-map +
    Bloom pruned, projection pushed into the read."""
    from .cdc import apply_changes
    from .dml import scan_where

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir), max_rows_per_file=500)
    df = scan_where(
        lake,
        [
            [("role", "==", "view"), ("turn_idx", "between", (10, 25))],
            [("role", "==", "error")],
        ],
        columns=["conv_id", "turn_idx", "role", "ts"],
    ).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)



#: the one WHERE text both the engine and the oracle evaluate — NOT /
#: parens / IN / NOT BETWEEN exercise the parser's negation + DNF
#: normalization end-to-end
SQL_FRONTEND_WHERE = (
    "NOT (role IN ('click', 'view') OR turn_idx NOT BETWEEN 5 AND 30)"
)


def q_cdc_sql_frontend(sf_dir: str):
    """SQL text front-end (``sqlpred.parse_where``): the WHERE text in
    ``SQL_FRONTEND_WHERE`` parses to the engine's DNF predicate and
    runs through the same pruned ``scan_where`` path; the oracle
    evaluates the IDENTICAL text in DuckDB."""
    from ..sqlpred import parse_where
    from .cdc import apply_changes
    from .dml import scan_where

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir), max_rows_per_file=500)
    df = scan_where(
        lake,
        parse_where(SQL_FRONTEND_WHERE),
        columns=["conv_id", "turn_idx", "role", "ts"],
    ).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)



def q_cdc_delete_by_aggregate(sf_dir: str):
    """Aggregate-driven DML composition: conversations whose surviving
    turn count exceeds 30 are deleted WHOLE — the victim set comes from
    a distributed groupby over the committed state, its keys feed
    ``merge_into(when_matched="delete")``, and the tombstones ride the
    exactly-once apply. The "DELETE WHERE key IN (SELECT ... HAVING)"
    shape, engine-level."""
    from .cdc import apply_changes, read_table
    from .dml import merge_into

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))

    state = read_table(lake, columns=["conv_id", "turn_idx", "ts"])

    def conv_counts(b: pa.Table) -> pa.Table:
        t = b.group_by("conv_id").aggregate([("turn_idx", "count")])
        return t.rename_columns(["conv_id", "n"])

    import pandas as pd_

    # map-side partials -> tiny driver reduce (conv-count-sized)
    parts = state.map_batches(conv_counts, batch_format="pyarrow").to_pandas()
    totals = parts.groupby("conv_id", as_index=False)["n"].sum()
    victims = set(totals.loc[totals["n"] > 30, "conv_id"])
    if victims:
        vic_arr = pa.array(sorted(victims), pa.string())

        def keys_of_victims(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["conv_id"], value_set=vic_arr))

        source = state.map_batches(keys_of_victims, batch_format="pyarrow")
        merge_into(
            lake, source, _spec(sf_dir),
            when_matched="delete", when_not_matched="ignore",
        )
    return _final_df(lake)



def q_cdc_lake_diff(sf_dir: str):
    """Anti-entropy audit (``pipelines/diff.py``): lake B is a clone of
    A plus a DELETE (turn_idx>=35) and a text-prefix UPDATE (turn_idx<3)
    — ``diff_lakes`` must report exactly the deleted keys as only_a and
    exactly the text-changed keys as changed (NULL text is unchanged by
    the prefix: 'X:' || NULL = NULL, null-safe compare on both sides)."""
    from .cdc import apply_changes
    from .clone import clone_lake
    from .diff import diff_lakes
    from .dml import delete_where, update_where

    changes = _write_changelog(sf_dir)
    a, b = _scratch("diffa"), _scratch("diffb")
    apply_changes(changes, a, _spec(sf_dir))
    clone_lake(a, b)
    delete_where(b, [("turn_idx", ">=", 35)], _spec(sf_dir))
    update_where(
        b, [("turn_idx", "<", 3)],
        {"text": lambda t: pc.binary_join_element_wise(
            pa.scalar("X:"), t["text"], "")},
        _spec(sf_dir),
    )
    df = diff_lakes(a, b, _spec(sf_dir)).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)



def q_preference_cycles(sf_dir: str):
    """Intransitivity audit (``aggregates.preference_cycles``): the
    derived judgments are engineered rock-paper-scissors — A beats B,
    B beats C, C beats A on event_id%3, with every 7th judgment
    reversed as noise — so the majority digraph must contain exactly
    the (A,B,C) 3-cycle; the SQL mirror recomputes the majority edges
    and triple-joins them."""
    from ..functions.aggregates import preference_cycles

    ev = _events(sf_dir)

    def judge(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy()
        m = (eid % 3).astype(np.int64)
        first = np.array(["A", "B", "C"], dtype=object)[m]
        second = np.array(["B", "C", "A"], dtype=object)[m]
        rev = eid % 7 == 0
        return pd.DataFrame(
            {
                "w": np.where(rev, second, first),
                "l": np.where(rev, first, second),
            }
        )

    out = preference_cycles(
        ev.map_batches(judge, batch_format="pandas"),
        winner_col="w", loser_col="l",
    )
    return out.to_pandas()


def q_judge_length_bias(sf_dir: str):
    """Verbosity-bias probe (``aggregates.length_bias``): first-answer
    length = len(props), second = event_id % 83, winner = 'first'
    unless event_id % 3 == 0 — per length-gap bucket (width 10,
    FLOOR division so negative gaps bucket below zero), n /
    first_wins exact ints and the rate one float division."""
    from ..functions.aggregates import length_bias

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "props"],
    )

    def judged(b: pd.DataFrame) -> pd.DataFrame:
        eid = b["event_id"].to_numpy()
        lf = b["props"].fillna("").str.len().astype("int64")
        return pd.DataFrame(
            {
                "lf": lf,
                "ls": (eid % 83).astype(np.int64),
                "win": np.where(eid % 3 == 0, "second", "first"),
            }
        )

    out = length_bias(
        ev.map_batches(judged, batch_format="pandas"),
        len_first_col="lf", len_second_col="ls", winner_col="win",
        bucket_width=10,
    )
    return (
        out.to_pandas().sort_values("gap_bucket").reset_index(drop=True)
    )



def q_fleiss_kappa(sf_dir: str):
    """Multi-rater agreement (``aggregates.fleiss_kappa``): items are
    dense event_id triples (item = event_id // 3, rater = event_id % 3
    — exactly 3 ratings each once the trailing partial triple is
    dropped), category = the event's type. The kappa is an exact-int
    numerator/denominator with ONE double division, so it hash-matches
    the SQL mirror bitwise."""
    from ..functions.aggregates import fleiss_kappa

    ev = _events(sf_dir)

    def ratings(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "item": (b["event_id"].to_numpy() // 3).astype(np.int64),
                "cat": b["event_type"],
            }
        )

    n_events = int(ev.max("event_id")) + 1
    full = (n_events // 3) * 3

    def keep_full(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_id"] < full]
        return ratings(b)

    out = fleiss_kappa(
        ev.map_batches(keep_full, batch_format="pandas"),
        item_col="item", category_col="cat",
    )
    return pd.DataFrame([out])



def q_distinct_ngrams(sf_dir: str):
    """Corpus diversity (``text.distinct_ngram_stats``): distinct-1/2/3
    over the documents table — whitespace tokens shared verbatim with
    the mirror; rows shorter than n contribute nothing; ratios are one
    float division of exact ints."""
    from ..functions.text import distinct_ngram_stats

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    return distinct_ngram_stats(docs, text_col="text", ns=(1, 2, 3)).to_pandas()



def q_embedding_outliers(sf_dir: str):
    """Embedding-outlier screen (``drift.embedding_outliers``): top-20
    vectors by exact-integer ||n·x − S||² distance-to-centroid ranking
    (micros quantization; d2 exceeds int64 so both sides carry it as a
    decimal string), ties by vec_id."""
    from ..functions.drift import embedding_outliers

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return embedding_outliers(emb, id_col="vec_id", vec_col="embedding", k=20)



def q_cdc_drop_boilerplate(sf_dir: str):
    """CDC -> curation -> DML composition #4, full circle: boilerplate
    turns (same text in at least a quarter of all conversations — a
    scale-relative threshold, integer-floored on both sides) are
    detected over the COMMITTED lake by
    ``transcripts.boilerplate_turns`` and then REMOVED from it by
    ``merge_into(when_matched="delete")`` — the curation signal drives
    row-level DML through the exactly-once apply, and the cleaned lake
    is the result."""
    from ..functions.transcripts import boilerplate_turns
    from .cdc import apply_changes, read_table
    from .dml import merge_into

    changes, lake = _write_changelog(sf_dir), _scratch("lake")
    apply_changes(changes, lake, _spec(sf_dir))

    state = read_table(lake)
    n_convs = len(state.unique("conv_id"))
    thresh = max(n_convs // 4, 2)
    hits = boilerplate_turns(
        state, conv_col="conv_id", text_col="text", min_convs=thresh
    ).to_pandas()
    texts = set(hits["text"]) if "text" in hits.columns else set()
    if texts:
        vic = pa.array(sorted(texts), pa.string())

        def victims(b: pa.Table) -> pa.Table:
            return b.filter(
                pc.fill_null(pc.is_in(b["text"], value_set=vic), False)
            )

        source = state.map_batches(victims, batch_format="pyarrow")
        merge_into(
            lake, source, _spec(sf_dir),
            when_matched="delete", when_not_matched="ignore",
        )
    return _final_df(lake)


DROP_BOILERPLATE_SQL = f"""
  WITH final AS ({FINAL_SQL}),
  boiler AS (
    SELECT text FROM final WHERE text IS NOT NULL
    GROUP BY text
    HAVING count(DISTINCT conv_id) >= greatest(
      (SELECT count(DISTINCT conv_id) FROM final) // 4, 2)
  )
  SELECT conv_id, turn_idx, role, text, tool, ts
  FROM final
  WHERE text IS NULL OR text NOT IN (SELECT text FROM boiler)
  ORDER BY conv_id, turn_idx
"""


EMBEDDING_OUTLIERS_SQL = """
  WITH e AS (
    SELECT vec_id,
           CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) AS dim,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
             AS q
    FROM embeddings),
  s AS (SELECT dim, CAST(sum(q) AS HUGEINT) AS sd FROM e GROUP BY dim),
  n AS (SELECT CAST(count(*) AS HUGEINT) AS nv FROM embeddings),
  d AS (
    SELECT e.vec_id,
           sum((n.nv * CAST(e.q AS HUGEINT) - s.sd)
               * (n.nv * CAST(e.q AS HUGEINT) - s.sd)) AS d2
    FROM e JOIN s USING (dim), n
    GROUP BY e.vec_id)
  SELECT CAST(vec_id AS BIGINT) AS id, CAST(d2 AS VARCHAR) AS d2
  FROM d ORDER BY d.d2 DESC, vec_id LIMIT 20
"""


DISTINCT_NGRAMS_SQL = r"""
  WITH w AS (
    SELECT regexp_extract_all(coalesce(text, ''), '\S+') AS t
    FROM documents),
  n1 AS (SELECT unnest(t) AS g FROM w),
  n2 AS (
    SELECT unnest(list_transform(range(1, len(t)),
                  i -> t[i] || ' ' || t[i+1])) AS g
    FROM w WHERE len(t) >= 2),
  n3 AS (
    SELECT unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
    FROM w WHERE len(t) >= 3),
  s AS (
    SELECT 1 AS n, count(*) AS total_ngrams,
           count(DISTINCT g) AS distinct_ngrams FROM n1
    UNION ALL
    SELECT 2, count(*), count(DISTINCT g) FROM n2
    UNION ALL
    SELECT 3, count(*), count(DISTINCT g) FROM n3)
  SELECT CAST(n AS BIGINT) AS n,
         CAST(total_ngrams AS BIGINT) AS total_ngrams,
         CAST(distinct_ngrams AS BIGINT) AS distinct_ngrams,
         CAST(distinct_ngrams AS DOUBLE) / CAST(total_ngrams AS DOUBLE)
           AS distinct_ratio
  FROM s ORDER BY n
"""


FLEISS_SQL = """
  WITH lim AS (
    SELECT 3 * ((CAST(max(event_id) AS BIGINT) + 1) // 3) AS full
    FROM events),
  r AS (
    SELECT event_id // 3 AS item, event_type AS cat
    FROM events, lim WHERE event_id < lim.full),
  ic AS (SELECT item, cat, count(*) AS n_ik FROM r GROUP BY 1, 2),
  sums AS (
    SELECT CAST(count(DISTINCT item) AS HUGEINT) AS n_items,
           CAST(sum(n_ik * n_ik) AS HUGEINT) AS s
    FROM ic),
  cats AS (
    SELECT CAST(count(*) AS HUGEINT) AS n_cats,
           CAST(sum(ct * ct) AS HUGEINT) AS csq
    FROM (SELECT cat, CAST(sum(n_ik) AS HUGEINT) AS ct
          FROM ic GROUP BY cat)),
  k AS (
    SELECT n_items, 3 AS n_raters, n_cats,
           n_items * 3 AS m, s, csq
    FROM sums, cats)
  SELECT CAST(n_items AS BIGINT) AS n_items,
         CAST(n_raters AS BIGINT) AS n_raters,
         CAST(n_cats AS BIGINT) AS n_categories,
         CAST((s - m) * m * m - m * 2 * csq AS DOUBLE)
           / CAST(m * 2 * (m * m - csq) AS DOUBLE) AS kappa
  FROM k
"""


PREFERENCE_CYCLES_SQL = """
  WITH j AS (
    SELECT CASE WHEN event_id % 7 = 0
                THEN (['B','C','A'])[CAST(event_id % 3 AS INT) + 1]
                ELSE (['A','B','C'])[CAST(event_id % 3 AS INT) + 1]
           END AS w,
           CASE WHEN event_id % 7 = 0
                THEN (['A','B','C'])[CAST(event_id % 3 AS INT) + 1]
                ELSE (['B','C','A'])[CAST(event_id % 3 AS INT) + 1]
           END AS l
    FROM events),
  d AS (SELECT w, l, count(*) AS n FROM j GROUP BY 1, 2),
  e AS (
    SELECT a.w AS src, a.l AS dst
    FROM d a LEFT JOIN d b ON a.w = b.l AND a.l = b.w
    WHERE a.n > coalesce(b.n, 0)
  )
  SELECT e1.src AS item_a, e1.dst AS item_b, e2.dst AS item_c
  FROM e e1
  JOIN e e2 ON e2.src = e1.dst
  JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src
  WHERE e1.src < e2.src AND e1.src < e3.src
  ORDER BY 1, 2, 3
"""

LENGTH_BIAS_SQL = """
  WITH j AS (
    SELECT CAST(length(coalesce(props, '')) AS BIGINT) AS lf,
           CAST(event_id % 83 AS BIGINT) AS ls,
           CASE WHEN event_id % 3 = 0 THEN 'second' ELSE 'first' END AS win
    FROM events),
  b AS (
    SELECT CAST(floor((lf - ls) / 10.0) AS BIGINT) AS gap_bucket,
           count(*) AS n,
           CAST(sum(CASE WHEN win = 'first' THEN 1 ELSE 0 END) AS BIGINT)
             AS first_wins
    FROM j GROUP BY 1)
  SELECT gap_bucket, n, first_wins,
         CAST(first_wins AS DOUBLE) / CAST(n AS DOUBLE) AS first_win_rate
  FROM b ORDER BY gap_bucket
"""


LAKE_DIFF_SQL = f"""
  WITH final AS ({FINAL_SQL})
  SELECT conv_id, turn_idx, 'only_a' AS diff
  FROM final WHERE turn_idx >= 35
  UNION ALL
  SELECT conv_id, turn_idx, 'changed' AS diff
  FROM final WHERE turn_idx < 3 AND text IS NOT NULL
  ORDER BY conv_id, turn_idx
"""


DELETE_BY_AGG_SQL = f"""
  WITH final AS ({FINAL_SQL}),
  big AS (
    SELECT conv_id FROM final GROUP BY conv_id HAVING count(*) > 30
  )
  SELECT conv_id, turn_idx, role, text, tool, ts
  FROM final
  WHERE conv_id NOT IN (SELECT conv_id FROM big)
  ORDER BY conv_id, turn_idx
"""


SCAN_DNF_SQL = f"""
  WITH final AS ({FINAL_SQL})
  SELECT conv_id, turn_idx, role, ts
  FROM final
  WHERE (role = 'view' AND turn_idx BETWEEN 10 AND 25)
     OR role = 'error'
  ORDER BY conv_id, turn_idx
"""


SQL_FRONTEND_SQL = f"""
  WITH final AS ({FINAL_SQL})
  SELECT conv_id, turn_idx, role, ts
  FROM final
  WHERE NOT (role IN ('click', 'view') OR turn_idx NOT BETWEEN 5 AND 30)
  ORDER BY conv_id, turn_idx
"""


DDL_CYCLE_SQL = f"""
  WITH final AS ({FINAL_SQL})
  SELECT conv_id, turn_idx, role, text, ts,
         CASE WHEN turn_idx < 10 THEN 2.5 END AS score
  FROM final
  ORDER BY conv_id, turn_idx
"""


DELETE_WHERE_OR_SQL = f"""
  WITH final AS ({FINAL_SQL})
  SELECT conv_id, turn_idx, role, text, tool, ts
  FROM final
  WHERE NOT coalesce(
    (role = 'click' AND turn_idx < 10) OR turn_idx >= 35, false)
  ORDER BY conv_id, turn_idx
"""


UPDATE_WHERE_SQL = f"""
  WITH final AS ({FINAL_SQL})
  SELECT conv_id, turn_idx,
         CASE WHEN turn_idx < 7 THEN 'edited' ELSE role END AS role,
         CASE WHEN turn_idx < 7 THEN 'X:' || text ELSE text END AS text,
         tool, ts
  FROM final
  ORDER BY conv_id, turn_idx
"""

MERGE_INTO_SQL = f"""
  WITH final AS ({FINAL_SQL}),
  upd AS (
    SELECT conv_id, turn_idx, role,
           'S:' || coalesce(text, '') AS text, tool, ts
    FROM final WHERE turn_idx % 5 = 2
  ),
  ins AS (
    SELECT conv_id, CAST(turn_idx + 100 AS INTEGER) AS turn_idx, role,
           'N:' || coalesce(text, '') AS text, tool, ts
    FROM final WHERE turn_idx % 7 = 3
  )
  SELECT f.conv_id, f.turn_idx,
         coalesce(u.role, f.role) AS role,
         coalesce(u.text, f.text) AS text,
         CASE WHEN u.conv_id IS NOT NULL THEN u.tool ELSE f.tool END AS tool,
         f.ts
  FROM final f LEFT JOIN upd u USING (conv_id, turn_idx)
  UNION ALL
  SELECT conv_id, turn_idx, role, text, tool, ts FROM ins
  ORDER BY conv_id, turn_idx
"""



from .tpch3 import (  # noqa: E402
    q_tpch_q2_min_cost_supplier,
    q_tpch_q7_volume_shipping,
    q_tpch_q8_market_share,
    q_tpch_q9_product_profit,
    q_tpch_q11_important_stock,
    q_tpch_q16_supplier_count,
    q_tpch_q20_quota_suppliers,
    q_tpch_q21_waiting_supplier,
)

QUERIES = {
    "cdc_apply_full": q_cdc_apply_full,
    "cdc_apply_objstore": q_cdc_apply_objstore,
    "cdc_apply_inflight": q_cdc_apply_inflight,
    "cdc_apply_debezium": q_cdc_apply_debezium,
    "cdc_apply_orc": q_cdc_apply_orc,
    "cdc_apply_chunked_resume": q_cdc_apply_chunked_resume,
    "cdc_point_lookup": q_cdc_point_lookup,
    "cdc_range_scan": q_cdc_range_scan,
    "cdc_time_range": q_cdc_time_range,
    "cdc_search_index": q_cdc_search_index,
    "cdc_expire": q_cdc_expire,
    "cdc_predicate_scan": q_cdc_predicate_scan,
    "cdc_clustered_scan": q_cdc_clustered_scan,
    "cdc_coalesce_merge": q_cdc_coalesce_merge,
    "cdc_incremental_rollup": q_cdc_incremental_rollup,
    "cdc_apply_delta_lsm": q_cdc_apply_delta_lsm,
    "cdc_replay_idempotent": q_cdc_replay_idempotent,
    "cdc_normalize": q_cdc_normalize,
    "cdc_lww_latest": q_cdc_lww_latest,
    "cdc_cojoin": q_cdc_cojoin,
    "cdc_op_counts": q_cdc_op_counts,
    "cdc_dt_rollup": q_cdc_dt_rollup,
    "cdc_sorted_recent": q_cdc_sorted_recent,
    "cdc_distinct_roles": q_cdc_distinct_roles,
    "cdc_top_convs": q_cdc_top_convs,
    "cdc_quarantine_counts": q_cdc_quarantine_counts,
    "cdc_lint_rollup": q_cdc_lint_rollup,
    "cdc_context_truncate": q_cdc_context_truncate,
    "cdc_retry_distance": q_cdc_retry_distance,
    "cdc_dq_stats": q_cdc_dq_stats,
    "cdc_time_travel": q_cdc_time_travel,
    "cdc_changefeed": q_cdc_changefeed,
    "cdc_forget": q_cdc_forget,
    "cdc_multitable": q_cdc_multitable,
    "cdc_txn_multitable": q_cdc_txn_multitable,
    "cdc_bootstrap": q_cdc_bootstrap,
    "cdc_rebalance": q_cdc_rebalance,
    "cdc_catalog_sql": q_cdc_catalog_sql,
    "dedup_exact": q_dedup_exact,
    "dedup_incremental": q_dedup_incremental,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "repetition_score": q_repetition_score,
    "dedup_clusters": q_dedup_clusters,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "minhash_near_dup": q_minhash_near_dup,
    "near_dedup": q_near_dedup,
    "paragraph_dedup": q_paragraph_dedup,
    "token_budget_select": q_token_budget_select,
    "corpus_refinery": q_corpus_refinery,
    "customers_no_orders": q_customers_no_orders,
    "chunk_documents": q_chunk_documents,
    "simhash_near_dup": q_simhash_near_dup,
    "ngram_jaccard": q_ngram_jaccard,
    "contamination_check": q_contamination_check,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_quantized_topk": q_ann_quantized_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "kmeans_embeddings": q_kmeans_embeddings,
    "semantic_dedup": q_semantic_dedup,
    "embedding_near_dup": q_embedding_near_dup,
    "multimodal_bytes": q_multimodal_bytes,
    "multimodal_decode": q_multimodal_decode,
    "assemble_conversations": q_assemble_conversations,
    "asof_join_events": q_asof_join_events,
    "window_events_hourly": q_window_events_hourly,
    "sessionize_events": q_sessionize_events,
    "interval_join_sessions": q_interval_join_sessions,
    "join_orders_nation": q_join_orders_nation,
    "lineitem_rollup": q_lineitem_rollup,
    "tpch_q3_shipping": q_tpch_q3_shipping,
    "tpch_q5_local_supplier": q_tpch_q5_local_supplier,
    "tpch_q10_returned": q_tpch_q10_returned,
    "tpch_q18_big_orders": q_tpch_q18_big_orders,
    "tpch_q14_promo": q_tpch_q14_promo,
    "tpch_q17_small_qty": q_tpch_q17_small_qty,
    "tpch_q19_bands": q_tpch_q19_bands,
    "tpch_q4_order_priority": q_tpch_q4_order_priority,
    "tpch_q6_forecast": q_tpch_q6_forecast,
    "tpch_q12_late_lines": q_tpch_q12_shipmode,
    "tpch_q13_custdist": q_tpch_q13_custdist,
    "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
    "tpch_q22_global_sales": q_tpch_q22_global_sales,
    "tpch_q2_min_cost_supplier": q_tpch_q2_min_cost_supplier,
    "tpch_q7_volume_shipping": q_tpch_q7_volume_shipping,
    "tpch_q8_market_share": q_tpch_q8_market_share,
    "tpch_q9_product_profit": q_tpch_q9_product_profit,
    "tpch_q11_important_stock": q_tpch_q11_important_stock,
    "tpch_q16_supplier_count": q_tpch_q16_supplier_count,
    "tpch_q20_quota_suppliers": q_tpch_q20_quota_suppliers,
    "tpch_q21_waiting_supplier": q_tpch_q21_waiting_supplier,
    "running_total_by_seq": q_running_total_by_seq,
    "late_arrivals": q_late_arrivals,
    "scd2_history": q_scd2_history,
    "tfidf_keywords": q_tfidf_keywords,
    "novelty_scores": q_novelty_scores,
    "bm25_rank": q_bm25_rank,
    "chunk_chars": q_chunk_chars,
    "image_dhash_dedup": q_image_dhash_dedup,
    "strip_html": q_strip_html,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "weighted_sample_docs": q_weighted_sample_docs,
    "soundex_clusters": q_soundex_clusters,
    "training_examples": q_training_examples,
    "assign_split": q_assign_split,
    "pack_sequences": q_pack_sequences,
    "mix_corpora": q_mix_corpora,
    "redact_pii": q_redact_pii,
    "clean_text": q_clean_text,
    "stratified_sample": q_stratified_sample,
    "join_orders_mktsegment": q_join_orders_mktsegment,
    "term_topk": q_term_topk,
    "distinct_users_by_type": q_distinct_users_by_type,
    "window_events_hopping": q_window_events_hopping,
    "trailing_window": q_trailing_window,
    "heavy_hitters": q_heavy_hitters,
    "topk_events_per_type": q_topk_events_per_type,
    "sample_deterministic": q_sample_deterministic,
    "sample_per_group": q_sample_per_group,
    "value_quantiles_by_type": q_value_quantiles_by_type,
    "bloom_semi_join": q_bloom_semi_join,
    "vocab_coverage": q_vocab_coverage,
    "lm_bigram_score": q_lm_bigram_score,
    "shuffle_shards": q_shuffle_shards,
    "pivot_user_event_counts": q_pivot_user_event_counts,
    "skew_join_events_segment": q_skew_join_events_segment,
    "rank_events_per_user": q_rank_events_per_user,
    "cumsum_user_value": q_cumsum_user_value,
    "percent_rank_events": q_percent_rank_events,
    "ewma_user_value": q_ewma_user_value,
    "resample_user_6h": q_resample_user_6h,
    "first_last_user": q_first_last_user,
    "explode_embeddings": q_explode_embeddings,
    "negative_samples_docs": q_negative_samples_docs,
    "pca_embeddings": q_pca_embeddings,
    "mmr_select_embeddings": q_mmr_select_embeddings,
    "mean_pool_embeddings": q_mean_pool_embeddings,
    "model_score": q_model_score,
    "compression_score": q_compression_score,
    "image_features": q_image_features,
    "image_png_decode": q_image_png_decode,
    "image_webp_decode": q_image_webp_decode,
    "image_webp_lossy_decode": q_image_webp_lossy_decode,
    "image_gif_decode": q_image_gif_decode,
    "image_jpeg_decode": q_image_jpeg_decode,
    "image_jpeg_progressive": q_image_jpeg_progressive,
    "video_frames": q_video_frames,
    "audio_quality": q_audio_quality,
    "audio_flac_features": q_audio_flac_features,
    "audio_metadata": q_audio_metadata,
    "audio_coverage": q_audio_coverage,
    "conversation_windows": q_conversation_windows,
    "chunk_sentences": q_chunk_sentences,
    "collapse_turns": q_collapse_turns,
    "conversation_lint": q_conversation_lint,
    "boilerplate_turns": q_boilerplate_turns,
    "repeated_turn_runs": q_repeated_turn_runs,
    "instruction_pairs": q_instruction_pairs,
    "prefix_fork_groups": q_prefix_fork_groups,
    "echo_pairs": q_echo_pairs,
    "conversation_lang_consistency": q_conversation_lang_consistency,
    "preference_pairs": q_preference_pairs,
    "turn_gap_stats": q_turn_gap_stats,
    "context_truncate": q_context_truncate,
    "refusal_screen": q_refusal_screen,
    "fork_best_of_n": q_fork_best_of_n,
    "fork_advantage": q_fork_advantage,
    "fork_zscore": q_fork_zscore,
    "fork_pass_rate": q_fork_pass_rate,
    "retry_edit_distance": q_retry_edit_distance,
    "pseudonymize_ids": q_pseudonymize_ids,
    "discounted_returns": q_discounted_returns,
    "fence_lint": q_fence_lint,
    "system_prompt_inventory": q_system_prompt_inventory,
    "dialogue_acts": q_dialogue_acts,
    "response_length_trend": q_response_length_trend,
    "loss_mask_spans": q_loss_mask_spans,
    "cdc_schema_evolve": q_cdc_schema_evolve,
    "cdc_clone_branch": q_cdc_clone_branch,
    "cdc_gc_read": q_cdc_gc_read,
    "cdc_export_read": q_cdc_export_read,
    "fork_margin": q_fork_margin,
    "pack_conversations": q_pack_conversations,
    "conv_near_dup": q_conv_near_dup,
    "cdc_transcript_refinery": q_cdc_transcript_refinery,
    "cdc_rollback": q_cdc_rollback,
    "cdc_schema_widen": q_cdc_schema_widen,
    "cdc_maintain_read": q_cdc_maintain_read,
    "cdc_incremental_refinery": q_cdc_incremental_refinery,
    "rater_agreement": q_rater_agreement,
    "bradley_terry_rank": q_bradley_terry_rank,
    "winrate_matrix": q_winrate_matrix,
    "judge_position_bias": q_judge_position_bias,
    "referential_violations": q_referential_violations,
    "cdc_history": q_cdc_history,
    "rm_calibration": q_rm_calibration,
    "cms_user_counts": q_cms_user_counts,
    "ann_pq_topk": q_ann_pq_topk,
    "tool_usage_stats": q_tool_usage_stats,
    "tool_transitions": q_tool_transitions,
    "image_metadata": q_image_metadata,
    "fix_mojibake": q_fix_mojibake,
    "audio_features": q_audio_features,
    "url_dedup": q_url_dedup,
    "quantile_band_filter": q_quantile_band_filter,
    "winsorize_doc_len": q_winsorize_doc_len,
    "global_percentile_doclen": q_global_percentile_doclen,
    "mad_value_by_type": q_mad_value_by_type,
    "gini_value_by_type": q_gini_value_by_type,
    "histogram_value": q_histogram_value,
    "cohort_retention_weekly": q_cohort_retention_weekly,
    "hll_users_sparse": q_hll_users_sparse,
    "unicode_normalize": q_unicode_normalize,
    "bpe_tokenize": q_bpe_tokenize,
    "near_dedup_best": q_near_dedup_best,
    "pagerank_links": q_pagerank_links,
    "pagerank_links_pagescale": q_pagerank_links_pagescale,
    "ppr_links": q_ppr_links,
    "triangle_count_links": q_triangle_count_links,
    "label_propagation_links": q_label_propagation_links,
    "bfs_links": q_bfs_links,
    "kcore_links": q_kcore_links,
    "hits_links": q_hits_links,
    "cube_event_stats": q_cube_event_stats,
    "lag_user_events": q_lag_user_events,
    "json_extract_rollup": q_json_extract_rollup,
    "unpivot_user_counts": q_unpivot_user_counts,
    "event_transitions": q_event_transitions,
    "sequence_fingerprint": q_sequence_fingerprint,
    "event_trigrams": q_event_trigrams,
    "funnel_signup_purchase": q_funnel_signup_purchase,
    "time_to_convert": q_time_to_convert,
    "interevent_gap": q_interevent_gap,
    "wau_sliding": q_wau_sliding,
    "ntile_user_events": q_ntile_user_events,
    "corr_value_hour": q_corr_value_hour,
    "mode_event_type": q_mode_event_type,
    "mi_type_hour": q_mi_type_hour,
    "chi2_type_hour": q_chi2_type_hour,
    "profile_events": q_profile_events,
    "entropy_user_events": q_entropy_user_events,
    "ols_value_by_type": q_ols_value_by_type,
    "cooccur_event_types": q_cooccur_event_types,
    "pmi_event_types": q_pmi_event_types,
    "outliers_value_by_type": q_outliers_value_by_type,
    "set_intersect_pairs": q_set_intersect_pairs,
    "set_except_pairs": q_set_except_pairs,
    "hll_users_by_type": q_hll_users_by_type,
    "inverted_index": q_inverted_index,
    "window_dedup": q_window_dedup,
    "value_quantiles_sketch": q_value_quantiles_sketch,
    "psi_event_drift": q_psi_event_drift,
    "ks_value_drift": q_ks_value_drift,
    "mwu_value_drift": q_mwu_value_drift,
    "embedding_drift": q_embedding_drift,
    "cdc_branch_merge": q_cdc_branch_merge,
    "cdc_delete_where": q_cdc_delete_where,
    "cdc_update_where": q_cdc_update_where,
    "cdc_merge_into": q_cdc_merge_into,
    "cdc_row_provenance": q_cdc_row_provenance,
    "cdc_delete_where_or": q_cdc_delete_where_or,
    "cdc_ddl_cycle": q_cdc_ddl_cycle,
    "cdc_scan_dnf": q_cdc_scan_dnf,
    "cdc_sql_frontend": q_cdc_sql_frontend,
    "cdc_delete_by_aggregate": q_cdc_delete_by_aggregate,
    "cdc_lake_diff": q_cdc_lake_diff,
    "preference_cycles": q_preference_cycles,
    "judge_length_bias": q_judge_length_bias,
    "fleiss_kappa": q_fleiss_kappa,
    "distinct_ngrams": q_distinct_ngrams,
    "embedding_outliers": q_embedding_outliers,
    "cdc_drop_boilerplate": q_cdc_drop_boilerplate,
}

_LANG_SQL_CASES = """
    len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|you|that|it|for)\\b')) AS hits_en,
    len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|en|un|por|con|los)\\b')) AS hits_es,
    len(regexp_extract_all(lower(text), '\\b(le|la|de|et|un|être|que|pour|dans|ce)\\b')) AS hits_fr
"""

ORACLES = {
    "cdc_apply_full": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_gc_read": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_maintain_read": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_export_read": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_apply_objstore": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_apply_inflight": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_apply_debezium": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_apply_orc": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_apply_chunked_resume": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_point_lookup": f"""
      SELECT * FROM ({FINAL_SQL})
      WHERE conv_id IN ('conv_3', 'conv_7', 'conv_11')
      ORDER BY conv_id, turn_idx
    """,
    "cdc_range_scan": f"""
      SELECT * FROM ({FINAL_SQL})
      WHERE conv_id BETWEEN 'conv_2' AND 'conv_39'
      ORDER BY conv_id, turn_idx
    """,
    "cdc_time_range": f"""
      WITH bounds AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events)
      SELECT f.* FROM ({FINAL_SQL}) f, bounds b
      WHERE epoch_us(f.ts) >= b.lo + (b.hi - b.lo) // 4
        AND epoch_us(f.ts) <= b.lo + (3 * (b.hi - b.lo)) // 4
      ORDER BY conv_id, turn_idx
    """,
    "cdc_coalesce_merge": f"""
      WITH ch0 AS ({CH_SQL}),
      ch AS (
        SELECT op, seq, conv_id, turn_idx,
               CASE WHEN op = 'U' THEN NULL ELSE role END AS role,
               text, tool, ts,
               CAST(epoch_us(ts) AS HUGEINT) * 100000000 + seq AS ord
        FROM ch0),
      dmax AS (
        SELECT conv_id, turn_idx,
               max(CASE WHEN op = 'D' THEN ord END) AS d_horizon
        FROM ch GROUP BY conv_id, turn_idx),
      alive AS (
        SELECT ch.* FROM ch JOIN dmax USING (conv_id, turn_idx)
        WHERE ch.op <> 'D'
          AND (dmax.d_horizon IS NULL OR ch.ord > dmax.d_horizon))
      SELECT conv_id, turn_idx,
             last(role ORDER BY ord) FILTER (WHERE role IS NOT NULL) AS role,
             last(text ORDER BY ord) FILTER (WHERE text IS NOT NULL) AS text,
             last(tool ORDER BY ord) FILTER (WHERE tool IS NOT NULL) AS tool,
             last(ts ORDER BY ord) AS ts
      FROM alive GROUP BY conv_id, turn_idx
      ORDER BY conv_id, turn_idx
    """,
    "cdc_predicate_scan": f"""
      SELECT * FROM ({FINAL_SQL})
      WHERE turn_idx BETWEEN 5 AND 9
      ORDER BY conv_id, turn_idx
    """,
    "cdc_clustered_scan": f"""
      SELECT * FROM ({FINAL_SQL})
      WHERE turn_idx BETWEEN 5 AND 9
      ORDER BY conv_id, turn_idx
    """,
    "cdc_expire": f"""
      WITH bounds AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events)
      SELECT f.* FROM ({FINAL_SQL}) f, bounds b
      WHERE epoch_us(f.ts) > b.lo + (b.hi - b.lo) // 2
      ORDER BY conv_id, turn_idx
    """,
    "cdc_search_index": f"""
      WITH f AS ({FINAL_SQL}),
      toks AS (
        SELECT conv_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM f)
      SELECT term, conv_id, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM toks GROUP BY term, conv_id ORDER BY term, conv_id
    """,
    "cdc_incremental_rollup": f"""
      SELECT conv_id,
             CAST(count(*) AS BIGINT) AS n_turns,
             CAST(count(*) FILTER (WHERE role = 'click') AS BIGINT)
               AS n_user_turns,
             CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS n_chars,
             max(ts) AS last_ts
      FROM ({FINAL_SQL})
      GROUP BY conv_id ORDER BY conv_id
    """,
    "cdc_apply_delta_lsm": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_replay_idempotent": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_normalize": f"WITH ch AS ({CH_SQL}) SELECT op, seq, conv_id, turn_idx, role, text, tool, ts FROM ch ORDER BY seq",
    "cdc_cojoin": f"""
      WITH a AS ({FINAL_SQL}),
      chb AS (
        SELECT CASE WHEN event_id % 5 >= 3 THEN 'U' ELSE 'I' END AS op,
               event_id AS seq,
               'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
               event_type AS role, ts
        FROM events
      ),
      rb AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id ORDER BY ts DESC, seq DESC) AS rn
        FROM chb
      ),
      b AS (SELECT conv_id, role FROM rb WHERE rn = 1)
      SELECT a.conv_id, a.turn_idx, a.role, b.role AS role_b
      FROM a JOIN b USING (conv_id)
      ORDER BY a.conv_id, a.turn_idx
    """,
    "cdc_lww_latest": f"""
      WITH ch AS ({CH_SQL}),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
        FROM ch)
      SELECT conv_id, turn_idx, op AS last_op, text AS last_text, ts AS last_ts, seq AS last_seq
      FROM ranked WHERE rn = 1 ORDER BY conv_id, turn_idx
    """,
    "cdc_op_counts": f"WITH ch AS ({CH_SQL}) SELECT op, count(*) AS n FROM ch GROUP BY op ORDER BY op",
    "cdc_dt_rollup": f"WITH ch AS ({CH_SQL}) SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n FROM ch GROUP BY dt ORDER BY dt",
    "cdc_sorted_recent": f"WITH ch AS ({CH_SQL}) SELECT seq, conv_id, turn_idx, ts FROM ch ORDER BY ts DESC, seq DESC LIMIT 20",
    "cdc_distinct_roles": f"WITH ch AS ({CH_SQL}) SELECT DISTINCT role FROM ch WHERE role IS NOT NULL ORDER BY role",
    "cdc_top_convs": f"""
      WITH ch AS ({CH_SQL})
      SELECT conv_id, count(*) AS n FROM ch GROUP BY conv_id
      ORDER BY n DESC, conv_id LIMIT 10
    """,
    "cdc_quarantine_counts": """
      SELECT CASE WHEN event_id % 97 = 0 THEN 'unknown_op' ELSE 'ok' END AS status,
             count(*) AS n
      FROM events GROUP BY status ORDER BY status
    """,
    "cdc_schema_widen": """
      WITH ch AS (
        SELECT
          CASE WHEN event_id % 10 = 9 THEN 'D'
               WHEN event_id % 10 >= 6 THEN 'U'
               ELSE 'I' END AS op,
          event_id AS seq,
          'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
          CAST(event_id % 40 AS INTEGER) AS turn_idx,
          event_type AS role,
          props AS text,
          CAST(NULL AS VARCHAR) AS tool,
          ts,
          CASE WHEN (event_id // 40) % 2 = 0
               THEN CAST(CAST(value AS REAL) AS DOUBLE)
               ELSE value END AS score
        FROM events
      ),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
        FROM ch
      )
      SELECT conv_id, turn_idx, role, text, tool, ts, score
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY conv_id, turn_idx
    """,
    "cdc_rollback": f"""
      WITH ch AS ({CH_SQL}),
      lo AS (SELECT * FROM ch WHERE seq < (SELECT max(seq) FROM ch) // 2),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
        FROM lo)
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY conv_id, turn_idx
    """,
    "cdc_time_travel": f"""
      WITH ch AS ({CH_SQL}),
      lo AS (SELECT * FROM ch WHERE seq < (SELECT max(seq) FROM ch) // 2),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
        FROM lo)
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY conv_id, turn_idx
    """,
    "cdc_changefeed": f"""
      WITH ch AS ({CH_SQL}),
      ra AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
        FROM ch WHERE seq < (SELECT max(seq) FROM ch) // 2),
      fa AS (SELECT conv_id, turn_idx, role, text, tool, ts
             FROM ra WHERE rn = 1 AND op <> 'D'),
      rb AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
        FROM ch),
      fb AS (SELECT conv_id, turn_idx, role, text, tool, ts
             FROM rb WHERE rn = 1 AND op <> 'D'),
      ups AS (
        SELECT 'U' AS change_op, b.*
        FROM fb b LEFT JOIN fa a USING (conv_id, turn_idx)
        WHERE a.conv_id IS NULL
           OR a.role IS DISTINCT FROM b.role
           OR a.text IS DISTINCT FROM b.text
           OR a.tool IS DISTINCT FROM b.tool
           OR a.ts IS DISTINCT FROM b.ts),
      dels AS (
        SELECT 'D' AS change_op, a.conv_id, a.turn_idx,
               CAST(NULL AS VARCHAR) AS role, CAST(NULL AS VARCHAR) AS text,
               CAST(NULL AS VARCHAR) AS tool, CAST(NULL AS TIMESTAMP) AS ts
        FROM fa a LEFT JOIN fb b USING (conv_id, turn_idx)
        WHERE b.conv_id IS NULL)
      SELECT * FROM ups UNION ALL SELECT * FROM dels
      ORDER BY change_op, conv_id, turn_idx
    """,
    "cdc_forget": f"""
      WITH f AS ({FINAL_SQL})
      SELECT * FROM f WHERE conv_id NOT IN ('conv_1', 'conv_2')
      ORDER BY conv_id, turn_idx
    """,
    "cdc_multitable": f"""
      WITH ch AS ({CH_SQL}),
      typed AS (
        SELECT CASE WHEN CAST(substr(conv_id, 6) AS BIGINT) % 2 = 0
                    THEN 'shipments' ELSE 'tracking' END AS record_type, *
        FROM ch),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
        FROM typed)
      SELECT record_type, conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY record_type, conv_id, turn_idx
    """,
    "cdc_txn_multitable": f"""
      WITH ch AS ({CH_SQL}),
      typed AS (
        SELECT CASE WHEN CAST(substr(conv_id, 6) AS BIGINT) % 2 = 0
                    THEN 'shipments' ELSE 'tracking' END AS record_type, *
        FROM ch),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
        FROM typed)
      SELECT record_type, conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY record_type, conv_id, turn_idx
    """,
    "cdc_bootstrap": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_rebalance": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_catalog_sql": f"{FINAL_SQL} ORDER BY conv_id, turn_idx",
    "cdc_dq_stats": f"""
      WITH final AS ({FINAL_SQL})
      SELECT count(*) AS row_count,
             CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
             CAST(sum(CASE WHEN conv_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_conv_id,
             min(turn_idx) AS min_turn,
             max(turn_idx) AS max_turn,
             count(DISTINCT conv_id) AS n_convs
      FROM final
    """,
    "dedup_exact": """
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
      )
      SELECT min(doc_id) AS doc_id, text FROM corpus GROUP BY text ORDER BY doc_id
    """,
    "dedup_incremental": """
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
      ), ranked AS (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM corpus WHERE text IS NOT NULL
      )
      SELECT doc_id, md5(text) AS text_hash FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    "token_count": """
      SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens
      FROM documents ORDER BY doc_id
    """,
    "quality_score": """
      SELECT doc_id,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
             (len(regexp_extract_all(text, '[A-Za-z0-9]+')) BETWEEN 5 AND 1000
              AND length(text) < 5000) AS ok
      FROM documents ORDER BY doc_id
    """,
    "chunk_documents": """
      WITH t AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
        FROM documents),
      c AS (
        SELECT doc_id, tk,
               unnest(range(0,
                 greatest(CAST(ceil((len(tk) - 16) / 48.0) AS BIGINT), 1))) AS chunk_idx
        FROM t)
      SELECT doc_id, chunk_idx,
             array_to_string(list_slice(tk, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ')
               AS chunk_text,
             len(list_slice(tk, chunk_idx * 48 + 1, chunk_idx * 48 + 64)) AS n_tokens
      FROM c ORDER BY doc_id, chunk_idx
    """,
    "customers_no_orders": """
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "corpus_refinery": r"""
      WITH cleaned AS (
        SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
        FROM documents),
      toks AS (
        SELECT doc_id, t, regexp_extract_all(lower(t), '[a-z0-9]+') AS tk
        FROM cleaned),
      bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS b
        FROM toks),
      cnt AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b),
      top AS (SELECT doc_id, max(n) AS top_n FROM cnt GROUP BY doc_id),
      m AS (
        SELECT c.doc_id, c.t,
               length(c.t) AS n_chars,
               len(regexp_extract_all(c.t, '[A-Za-z0-9]+')) AS n_tokens,
               length(regexp_replace(c.t, '[^A-Za-z]', '', 'g')) AS alpha_chars,
               len(string_split(c.t, chr(10))) AS n_lines,
               len(string_split(c.t, chr(10)))
                 - len(list_distinct(string_split(c.t, chr(10)))) AS n_dup,
               greatest(len(tk.tk) - 1, 0) AS n_bigrams,
               coalesce(top.top_n, 0) AS top_n
        FROM cleaned c JOIN toks tk USING (doc_id) LEFT JOIN top USING (doc_id)),
      f AS (
        SELECT * FROM m
        WHERE n_tokens BETWEEN 5 AND 1000 AND n_chars < 5000
          AND NOT ((n_lines >= 2 AND 2 * n_dup >= n_lines)
                   OR (n_bigrams >= 10 AND 5 * top_n >= n_bigrams))),
      d AS (
        SELECT *, row_number() OVER (PARTITION BY t ORDER BY doc_id) AS rn
        FROM f),
      sel AS (
        SELECT doc_id, t, n_tokens, alpha_chars,
               sum(n_tokens) OVER (ORDER BY alpha_chars DESC, doc_id) AS c
        FROM d WHERE rn = 1)
      SELECT doc_id, t AS text_clean, n_tokens, alpha_chars
      FROM sel WHERE c <= 15000 ORDER BY doc_id
    """,
    "token_budget_select": """
      WITH t AS (
        SELECT doc_id,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS score,
               len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens
        FROM documents)
      SELECT doc_id, score, n_tokens FROM (
        SELECT *, sum(n_tokens) OVER (ORDER BY score DESC, doc_id) AS c FROM t)
      WHERE c <= 20000 ORDER BY doc_id
    """,
    "paragraph_dedup": """
      WITH base AS (
        SELECT doc_id,
               text || chr(10) || 'COMMON FOOTER SEGMENT' || chr(10)
                    || 'tail-' || CAST(doc_id AS VARCHAR) AS text
        FROM documents),
      occ AS (
        SELECT doc_id,
               unnest(string_split(text, chr(10))) AS para,
               unnest(range(0, len(string_split(text, chr(10))))) AS pos
        FROM base),
      win AS (SELECT para, min(doc_id * 1048576 + pos) AS keep
              FROM occ GROUP BY para),
      kept AS (
        SELECT o.doc_id, o.pos, o.para
        FROM occ o JOIN win w
          ON o.para = w.para AND o.doc_id * 1048576 + o.pos = w.keep)
      SELECT b.doc_id,
             coalesce(string_agg(k.para, chr(10) ORDER BY k.pos), '') AS text_dedup
      FROM base b LEFT JOIN kept k USING (doc_id)
      GROUP BY b.doc_id ORDER BY b.doc_id
    """,
    "dedup_clusters": """
      WITH RECURSIVE edges AS (
        SELECT doc_id AS a, doc_id + 1000000 AS b FROM documents WHERE doc_id % 4 = 0
        UNION ALL
        SELECT d.doc_id AS a, e.doc_id AS b
        FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 4
        WHERE d.doc_id % 8 = 0),
      sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      FROM reach GROUP BY a ORDER BY doc_id
    """,
    "repetition_score": """
      WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents),
      lines AS (
        SELECT doc_id,
               len(string_split(text, chr(10))) AS n_lines,
               len(string_split(text, chr(10)))
                 - len(list_distinct(string_split(text, chr(10)))) AS n_dup_lines
        FROM documents),
      bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
        FROM toks),
      cnt AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b),
      top AS (SELECT doc_id, max(n) AS top_bigram_n FROM cnt GROUP BY doc_id)
      SELECT d.doc_id, l.n_lines, l.n_dup_lines,
             greatest(len(t.t) - 1, 0) AS n_bigrams,
             CAST(coalesce(top.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
             ((l.n_lines >= 2 AND 2 * l.n_dup_lines >= l.n_lines)
              OR (greatest(len(t.t) - 1, 0) >= 10
                  AND 5 * coalesce(top.top_bigram_n, 0) >= greatest(len(t.t) - 1, 0)))
               AS repetitive
      FROM documents d
      JOIN lines l USING (doc_id) JOIN toks t USING (doc_id)
      LEFT JOIN top USING (doc_id)
      ORDER BY doc_id
    """,
    "lang_id": f"""
      WITH scored AS (
        SELECT doc_id, {_LANG_SQL_CASES}
        FROM documents)
      SELECT doc_id, hits_en, hits_es, hits_fr,
             CASE WHEN hits_es > hits_en AND hits_es >= hits_fr THEN 'es'
                  WHEN hits_fr > hits_en AND hits_fr > hits_es THEN 'fr'
                  ELSE 'en' END AS lang_pred
      FROM scored ORDER BY doc_id
    """,
    "fingerprint": "SELECT doc_id, md5(text) AS md5 FROM documents ORDER BY doc_id",
    "ann_cosine_topk": """
      WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 8),
      sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(q.embedding, e.embedding) AS cos
        FROM q, embeddings e WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM sims)
      SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank
    """,
    "ann_quantized_topk": """
      WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 8),
      sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(q.embedding, e.embedding) AS cos
        FROM q, embeddings e WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM sims)
      SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank
    """,
    "multimodal_bytes": """
      SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
      FROM documents ORDER BY media_id
    """,
    "assemble_conversations": f"""
      WITH final AS ({FINAL_SQL})
      SELECT conv_id,
             count(*) AS n_turns,
             string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS document
      FROM final GROUP BY conv_id ORDER BY conv_id
    """,
    "asof_join_events": """
      WITH q AS (
        SELECT event_id AS query_id, user_id, ts FROM events WHERE event_id % 5 = 0),
      qt AS (
        SELECT event_id AS quote_id, user_id, ts FROM events WHERE event_id % 5 <> 0)
      SELECT q.query_id, q.user_id, qt.quote_id
      FROM q ASOF JOIN qt
        ON q.user_id = qt.user_id AND qt.ts <= q.ts
      ORDER BY q.query_id
    """,
    "window_events_hourly": """
      SELECT user_id, date_trunc('hour', ts) AS window_start,
             count(*) AS n_events,
             CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events GROUP BY user_id, window_start ORDER BY user_id, window_start
    """,
    "sessionize_events": """
      WITH e AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      m AS (
        SELECT user_id, ts,
               CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM e),
      s AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                 PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM m)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end
      FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
    "interval_join_sessions": """
      WITH e AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      m AS (
        SELECT user_id, ts,
               CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM e),
      s AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                 PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM m),
      sess AS (
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_id)
      SELECT ev.event_id, ev.user_id, ev.ts, sess.session_id
      FROM events ev
      JOIN sess ON ev.user_id = sess.user_id
              AND ev.ts BETWEEN sess.session_start AND sess.session_end
      ORDER BY ev.event_id
    """,
    "join_orders_nation": """
      SELECT n.n_name AS nation, count(*) AS n_orders
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name ORDER BY nation
    """,
    "event_trigrams": """
      SELECT t1, t2, t3, count(*) AS n
      FROM (
        SELECT lag(event_type, 2) OVER w AS t1,
               lag(event_type, 1) OVER w AS t2,
               event_type AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
      WHERE t1 IS NOT NULL
      GROUP BY t1, t2, t3
      ORDER BY t1, t2, t3
    """,
    "sequence_fingerprint": """
      WITH p AS (
        SELECT user_id,
               md5(string_agg(event_type, '>' ORDER BY ts, event_id)) AS fp
        FROM events GROUP BY user_id
      )
      SELECT user_id,
             min(user_id) OVER (PARTITION BY fp) AS canonical_user
      FROM p ORDER BY user_id
    """,
    "event_transitions": """
      SELECT prev_type, event_type, count(*) AS n
      FROM (
        SELECT LAG(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type,
               event_type
        FROM events
      )
      WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
      ORDER BY prev_type, event_type
    """,
    "wau_sliding": """
      WITH p AS (
        SELECT DISTINCT
               (epoch_us(ts) // 86400000000) * 86400000000
                 - k * 86400000000 AS win,
               user_id
        FROM events
        CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k)
      )
      SELECT win, CAST(count(*) AS BIGINT) AS n_users
      FROM p GROUP BY win ORDER BY win
    """,
    "interevent_gap": """
      WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
      )
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap_us
      FROM g WHERE gap IS NOT NULL
      GROUP BY user_id ORDER BY user_id
    """,
    "time_to_convert": """
      WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
      ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s1.t1
        GROUP BY e.user_id
      )
      SELECT s1.user_id,
             CAST(epoch_us(t2) - epoch_us(t1) AS BIGINT) AS delta_us
      FROM s1 JOIN s2 USING (user_id)
      ORDER BY s1.user_id
    """,
    "funnel_signup_purchase": """
      WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
      ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2 FROM events e
        JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id
      ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3 FROM events e
        JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
      )
      SELECT s1.user_id,
             CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  ELSE 1 END AS steps_completed,
             CAST(epoch_us(COALESCE(s3.t3, s2.t2, s1.t1)) AS BIGINT) AS last_ts_us
      FROM s1
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
      ORDER BY s1.user_id
    """,
    "ntile_user_events": """
      SELECT event_id,
             NTILE(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tile
      FROM events
      ORDER BY event_id
    """,
    "profile_events": """
      SELECT 'event_id' AS col, CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
             CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
             CAST(min(event_id) AS VARCHAR) AS min,
             CAST(max(event_id) AS VARCHAR) AS max
      FROM events
      UNION ALL
      SELECT 'user_id', CAST(count(*) AS BIGINT),
             CAST(count(*) - count(user_id) AS BIGINT),
             CAST(count(DISTINCT user_id) AS BIGINT),
             CAST(min(user_id) AS VARCHAR),
             CAST(max(user_id) AS VARCHAR)
      FROM events
      UNION ALL
      SELECT 'event_type', CAST(count(*) AS BIGINT),
             CAST(count(*) - count(event_type) AS BIGINT),
             CAST(count(DISTINCT event_type) AS BIGINT),
             CAST(min(event_type) AS VARCHAR),
             CAST(max(event_type) AS VARCHAR)
      FROM events
      ORDER BY col
    """,
    "chi2_type_hour": """
      WITH cells AS (
        SELECT event_type AS a, CAST(hour(ts) AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY a, b
      ), grid AS (
        SELECT av.a, bv.b, COALESCE(cells.c, 0) AS c
        FROM (SELECT DISTINCT a FROM cells) av
        CROSS JOIN (SELECT DISTINCT b FROM cells) bv
        LEFT JOIN cells USING (a, b)
      ), j AS (
        SELECT c,
               CAST(sum(c) OVER (PARTITION BY a) AS BIGINT) AS ca,
               CAST(sum(c) OVER (PARTITION BY b) AS BIGINT) AS cb,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM grid
      ), s AS (
        SELECT max(n) AS n,
               CAST(sum(CAST(FLOOR(
                 (CAST(c AS DOUBLE)
                    - CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)
                      / CAST(n AS DOUBLE))
                 * (CAST(c AS DOUBLE)
                    - CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)
                      / CAST(n AS DOUBLE))
                 / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)
                    / CAST(n AS DOUBLE))
                 * 1048576.0) AS BIGINT)) AS BIGINT) AS chi2_uq
        FROM j
      ), d AS (
        SELECT CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1)
                    AS BIGINT) AS dof
        FROM cells
      )
      SELECT s.n, d.dof, s.chi2_uq FROM s, d
    """,
    "mi_type_hour": """
      WITH cells AS (
        SELECT event_type AS a, CAST(hour(ts) AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY a, b
      ), j AS (
        SELECT c,
               CAST(sum(c) OVER (PARTITION BY a) AS BIGINT) AS ca,
               CAST(sum(c) OVER (PARTITION BY b) AS BIGINT) AS cb,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM cells
      ), s AS (
        SELECT max(n) AS n,
               CAST(sum(CAST(FLOOR(CAST(c AS DOUBLE)
                 * log2((CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
                        / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)))
                 * 1048576.0) AS BIGINT)) AS BIGINT) AS t_sum
        FROM j
      )
      SELECT n, t_sum,
             CAST(FLOOR((CAST(t_sum AS DOUBLE) / 1048576.0)
                  / CAST(n AS DOUBLE) * 1048576.0) AS BIGINT) AS mi_ub
      FROM s
    """,
    "mode_event_type": """
      SELECT user_id, event_type AS mode_value, CAST(n AS BIGINT) AS n
      FROM (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
      )
      QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, mode_value
      ) = 1
      ORDER BY user_id
    """,
    "entropy_user_events": """
      WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY user_id, event_type
      ), s AS (
        SELECT user_id,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CAST(FLOOR(CAST(c AS DOUBLE)
                     * log2(CAST(c AS DOUBLE)) * 1048576.0) AS BIGINT))
                    AS BIGINT) AS t
        FROM c GROUP BY user_id
      )
      SELECT user_id, n,
             CAST(FLOOR((log2(CAST(n AS DOUBLE))
                   - (CAST(t AS DOUBLE) / 1048576.0) / CAST(n AS DOUBLE))
                   * 1048576.0) AS BIGINT) AS entropy_ub
      FROM s ORDER BY user_id
    """,
    "outliers_value_by_type": """
      WITH p AS (
        SELECT event_id, event_type,
               CAST(FLOOR(value * 100) AS BIGINT) AS value_cents
        FROM events
      ), m AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS nf,
               CAST(sum(value_cents) AS DOUBLE) AS sx,
               CAST(sum(value_cents * value_cents) AS DOUBLE) AS sxx
        FROM p GROUP BY event_type
      )
      SELECT event_id, event_type, value_cents
      FROM p JOIN m USING (event_type)
      WHERE (CAST(value_cents AS DOUBLE) - sx / nf)
            * (CAST(value_cents AS DOUBLE) - sx / nf)
            > 9.0 * GREATEST(sxx / nf - (sx / nf) * (sx / nf), 0.0)
      ORDER BY event_id
    """,
    "pmi_event_types": """
      WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
           s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                 FROM d GROUP BY event_type),
           p AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
                        CAST(count(*) AS BIGINT) AS n_ab
                 FROM d a JOIN d b
                   ON a.user_id = b.user_id AND a.event_type < b.event_type
                 GROUP BY 1, 2),
           t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nb FROM d)
      SELECT item_a, item_b, n_ab,
             CAST(FLOOR(log2(
               (CAST(n_ab AS DOUBLE) * CAST(nb AS DOUBLE))
               / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE))
             ) * 1048576.0) AS BIGINT) AS pmi_ub
      FROM p JOIN s sa ON item_a = sa.event_type
             JOIN s sb ON item_b = sb.event_type, t
      ORDER BY item_a, item_b
    """,
    "cooccur_event_types": """
      WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
           s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                 FROM d GROUP BY event_type),
           p AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
                        CAST(count(*) AS BIGINT) AS n_ab
                 FROM d a JOIN d b
                   ON a.user_id = b.user_id AND a.event_type < b.event_type
                 GROUP BY 1, 2),
           t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nb FROM d)
      SELECT item_a, item_b, n_ab, sa.n AS n_a, sb.n AS n_b,
             CAST(FLOOR(
               (CAST(n_ab AS DOUBLE) * CAST(nb AS DOUBLE))
               / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) * 1e6
             ) AS BIGINT) AS lift_ppm
      FROM p JOIN s sa ON item_a = sa.event_type
             JOIN s sb ON item_b = sb.event_type, t
      ORDER BY item_a, item_b
    """,
    "ols_value_by_type": """
      SELECT event_type, n,
             CAST(FLOOR(
               (nf * sxy - sx * sy) / (nf * sxx - sx * sx) * 1e6
             ) AS BIGINT) AS slope_ppm,
             CAST(FLOOR(
               (sy - ((nf * sxy - sx * sy) / (nf * sxx - sx * sx)) * sx)
               / nf * 1e6
             ) AS BIGINT) AS intercept_ppm,
             CAST(FLOOR(
               ((nf * sxy - sx * sy) * (nf * sxy - sx * sy))
               / ((nf * sxx - sx * sx) * (nf * syy - sy * sy)) * 1e6
             ) AS BIGINT) AS r2_ppm
      FROM (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) AS DOUBLE) AS nf,
               CAST(sum(hour) AS DOUBLE) AS sx,
               CAST(sum(hour * hour) AS DOUBLE) AS sxx,
               CAST(sum(cents) AS DOUBLE) AS sy,
               CAST(sum(cents * cents) AS DOUBLE) AS syy,
               CAST(sum(hour * cents) AS DOUBLE) AS sxy
        FROM (
          SELECT event_type,
                 CAST(hour(ts) AS BIGINT) AS hour,
                 CAST(FLOOR(value * 100) AS BIGINT) AS cents
          FROM events
        )
        GROUP BY event_type
      )
      ORDER BY event_type
    """,
    "corr_value_hour": """
      SELECT event_type, n,
             CAST(FLOOR(
               (CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
                  - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sum_xx AS DOUBLE)
                         - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(sum_yy AS DOUBLE)
                           - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)))
               * 1e6) AS BIGINT) AS corr_ppm
      FROM (
        SELECT event_type,
               count(*) AS n,
               sum(cents) AS sum_x, sum(cents * cents) AS sum_xx,
               sum(hour) AS sum_y, sum(hour * hour) AS sum_yy,
               sum(cents * hour) AS sum_xy
        FROM (
          SELECT event_type,
                 CAST(FLOOR(value * 100) AS BIGINT) AS cents,
                 CAST(hour(ts) AS BIGINT) AS hour
          FROM events
        )
        GROUP BY event_type
      )
      ORDER BY event_type
    """,
    "set_intersect_pairs": """
      SELECT user_id, event_type, strftime(ts, '%Y-%m-%d') AS dt
      FROM events WHERE event_id % 2 = 0
      INTERSECT
      SELECT user_id, event_type, strftime(ts, '%Y-%m-%d') AS dt
      FROM events WHERE event_id % 2 = 1
      ORDER BY user_id, event_type, dt
    """,
    "set_except_pairs": """
      SELECT user_id, event_type, strftime(ts, '%Y-%m-%d') AS dt
      FROM events WHERE event_id % 2 = 0
      EXCEPT
      SELECT user_id, event_type, strftime(ts, '%Y-%m-%d') AS dt
      FROM events WHERE event_id % 2 = 1
      ORDER BY user_id, event_type, dt
    """,
    "unpivot_user_counts": """
      SELECT u.user_id, t.event_type, COALESCE(c.n, 0) AS n
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (SELECT DISTINCT event_type FROM events) t
      LEFT JOIN (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
      ) c USING (user_id, event_type)
      ORDER BY u.user_id, t.event_type
    """,
    "json_extract_rollup": """
      SELECT event_type,
             count(*) AS n,
             CAST(sum(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS sum_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """,
    "lag_user_events": """
      SELECT event_id,
             COALESCE(LAG(cents) OVER w, -1) AS prev_cents,
             COALESCE(ts_us - LAG(ts_us) OVER w, -1) AS delta_us
      FROM (
        SELECT event_id, user_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
      )
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      ORDER BY event_id
    """,
    "cube_event_stats": """
      SELECT COALESCE(event_type, 'ALL') AS event_type,
             COALESCE(dt, 'ALL') AS dt,
             count(*) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM (
        SELECT event_type,
               strftime(ts, '%Y-%m-%d') AS dt,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
      )
      GROUP BY CUBE (event_type, dt)
      ORDER BY event_type, dt
    """,
    "lineitem_rollup": """
      SELECT l_returnflag, l_linestatus,
             count(*) AS n_rows,
             CAST(sum(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """,
    # TPC-H-shape join analytics (pipelines/tpch.py): money floors to
    # integer cents per ROW before any sum on both sides, so aggregates
    # are order-independent and hash-exact; literals are the module's
    # Q*_ constants verbatim.
    "tpch_q3_shipping": """
      SELECT l_orderkey AS o_orderkey,
             CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
             o_orderdate, o_orderpriority
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-06-15'
        AND l_shipdate  > TIMESTAMP '1998-06-15'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue_cents DESC, o_orderkey
      LIMIT 10
    """,
    "tpch_q5_local_supplier": """
      SELECT n_name,
             CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'AFRICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue_cents DESC, n_name
    """,
    "tpch_q10_returned": """
      SELECT c_custkey, c_name,
             CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
             n_name
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND c_nationkey = n_nationkey
        AND l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-07-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY c_custkey, c_name, acctbal_cents, n_name
      ORDER BY revenue_cents DESC, c_custkey
      LIMIT 20
    """,
    # ordered-prefix-scan family: the running aggregate's frame is
    # ROWS UNBOUNDED PRECEDING (event_id is unique, so RANGE==ROWS);
    # cents floor per row keeps the running sum exact.
    "running_total_by_seq": """
      SELECT event_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents,
             CAST(sum(CAST(FLOOR(value * 100) AS BIGINT))
                  OVER (ORDER BY event_id) AS BIGINT) AS running_cents
      FROM events
      ORDER BY event_id
    """,
    # late_arrivals: arrival order is the deterministic hash
    # permutation (event_id * 2654435761) % 2^32 — a bijection for
    # event_id < 2^32, shared VERBATIM with the Ray side.
    "late_arrivals": """
      SELECT event_id, ts, mx AS watermark
      FROM (
        SELECT event_id, ts,
               max(ts) OVER (ORDER BY (event_id * 2654435761) % 4294967296
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
        FROM events)
      WHERE ts < mx - INTERVAL 21 DAYS
      ORDER BY event_id
    """,
    "scd2_history": """
      WITH s AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        FROM events),
      k AS (SELECT * FROM s WHERE pts IS NULL OR pv <> event_type)
      SELECT user_id, event_type,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
               AS is_current
      FROM k
      ORDER BY user_id, valid_from
    """,
    "tpch_q14_promo": """
      SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS promo_cents,
             CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
             CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS DOUBLE)
               / sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS promo_ratio
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    # tpch_q17: the correlated AVG decorrelates to the exact-int
    # cross-multiplication 5*qty*n < sum_qty — no float average on
    # either side of the comparison.
    "tpch_q17_small_qty": """
      WITH t AS (
        SELECT l_partkey,
               sum(CAST(FLOOR(l_quantity) AS BIGINT)) AS sum_qty,
               count(*) AS n
        FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_brand = 'Brand#13'
        GROUP BY l_partkey)
      SELECT 'Brand#13' AS p_brand,
             count(*) AS n_lines,
             COALESCE(CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT), 0)
               AS lost_cents
      FROM lineitem l, t
      WHERE l.l_partkey = t.l_partkey
        AND 5 * CAST(FLOOR(l.l_quantity) AS BIGINT) * t.n < t.sum_qty
    """,
    "tpch_q19_bands": """
      SELECT count(*) AS n_lines,
             COALESCE(CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS BIGINT), 0) AS revenue_cents
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND (
            (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30))
    """,
    "tpch_q18_big_orders": """
      SELECT c_name, c_custkey, o_orderkey, o_orderdate,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
             CAST(t.sum_qty AS BIGINT) AS sum_qty
      FROM customer, orders,
           (SELECT l_orderkey, sum(CAST(FLOOR(l_quantity) AS BIGINT)) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250) t
      WHERE o_orderkey = t.l_orderkey AND c_custkey = o_custkey
      ORDER BY totalprice_cents DESC, o_orderkey
      LIMIT 100
    """,
    # cdc_history: each committed version's live-row count equals the
    # LWW state of the event-id prefix it folded (quartile cuts
    # v*N/4 over the dense 0..N-1 ids), recomputed from scratch here.
    "cdc_history": f"""
      WITH ch AS ({CH_SQL}),
      n AS (SELECT count(*) AS c FROM events),
      v(version) AS (VALUES (1), (2), (3), (4)),
      pref AS (
        SELECT v.version, ch.conv_id, ch.turn_idx, ch.op,
               row_number() OVER (
                 PARTITION BY v.version, ch.conv_id, ch.turn_idx
                 ORDER BY ch.ts DESC, ch.seq DESC) AS rn
        FROM v, ch, n
        WHERE ch.seq < CAST(v.version * n.c / 4 AS BIGINT))
      SELECT version,
             CAST(count(*) FILTER (WHERE rn = 1 AND op <> 'D') AS BIGINT)
               AS n_rows
      FROM pref GROUP BY version ORDER BY version
    """,
    "referential_violations": """
      SELECT o_custkey, count(*) AS n_rows
      FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                              WHERE c_custkey % 7 <> 0)
      GROUP BY o_custkey
      ORDER BY n_rows DESC, o_custkey
    """,
    # eval-analytics over the derived pairwise-outcome stream (same
    # winner/loser derivation as bradley_terry_rank, mirrored
    # verbatim); win rates are single float divisions of exact ints.
    "winrate_matrix": """
      WITH p AS (
        SELECT event_type AS w,
               (['click','error','purchase','signup','view'])
                 [CAST(event_id % 5 AS INT) + 1] AS l
        FROM events),
      q AS (SELECT * FROM p WHERE w <> l),
      c AS (SELECT CASE WHEN w < l THEN w ELSE l END AS item_a,
                   CASE WHEN w < l THEN l ELSE w END AS item_b,
                   CASE WHEN w < l THEN 1 ELSE 0 END AS wa
            FROM q)
      SELECT item_a, item_b,
             CAST(sum(wa) AS BIGINT) AS wins_a,
             CAST(sum(1 - wa) AS BIGINT) AS wins_b,
             count(*) AS n,
             CAST(sum(wa) AS DOUBLE) / count(*) AS winrate_a
      FROM c GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "judge_position_bias": """
      WITH p AS (
        SELECT event_id, event_type AS w,
               (['click','error','purchase','signup','view'])
                 [CAST(event_id % 5 AS INT) + 1] AS l
        FROM events),
      q AS (SELECT * FROM p WHERE w <> l),
      j AS (SELECT CASE WHEN event_id % 2 = 0 THEN w ELSE l END AS f,
                   CASE WHEN event_id % 2 = 0 THEN l ELSE w END AS s,
                   w
            FROM q),
      per AS (
        SELECT item,
               CAST(sum(fw) AS BIGINT) AS first_wins,
               CAST(sum(fn) AS BIGINT) AS first_n,
               CAST(sum(sw) AS BIGINT) AS second_wins,
               CAST(sum(sn) AS BIGINT) AS second_n
        FROM (SELECT f AS item, CASE WHEN w = f THEN 1 ELSE 0 END AS fw,
                     1 AS fn, 0 AS sw, 0 AS sn FROM j
              UNION ALL
              SELECT s, 0, 0, CASE WHEN w = s THEN 1 ELSE 0 END, 1 FROM j)
        GROUP BY item),
      tot AS (SELECT '__overall__' AS item,
                     CAST(sum(first_wins) AS BIGINT),
                     CAST(sum(first_n) AS BIGINT),
                     CAST(sum(second_wins) AS BIGINT),
                     CAST(sum(second_n) AS BIGINT)
              FROM per)
      SELECT item, first_wins, first_n, second_wins, second_n,
             CAST(first_wins AS DOUBLE) / first_n AS first_winrate,
             CAST(second_wins AS DOUBLE) / second_n AS second_winrate
      FROM (SELECT * FROM per UNION ALL SELECT * FROM tot)
      ORDER BY item
    """,
    # tpch2 batch (pipelines/tpch2.py): EXISTS/scalar-subquery shapes
    # decorrelate to aggregates + joins on the Ray side; the oracles
    # keep the textbook correlated form so DuckDB plans them its own
    # way — equivalence is the point of the gate.
    "tpch_q4_order_priority": """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1996-07-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """,
    "tpch_q6_forecast": """
      SELECT COALESCE(CAST(sum(CAST(FLOOR(l_extendedprice * l_discount * 100) AS BIGINT))
               AS BIGINT), 0) AS revenue_cents,
             count(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.02 AND 0.06
        AND l_quantity < 24
    """,
    "tpch_q12_late_lines": """
      SELECT l_returnflag,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_count
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_shipdate >  o_orderdate + INTERVAL 60 DAYS
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """,
    "tpch_q13_custdist": """
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q15_top_supplier": """
      WITH rev AS (
        SELECT l_suppkey AS s_suppkey,
               CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                 AS BIGINT) AS revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s.s_suppkey, s_name, revenue_cents
      FROM supplier s, rev
      WHERE s.s_suppkey = rev.s_suppkey
        AND revenue_cents = (SELECT max(revenue_cents) FROM rev)
      ORDER BY s.s_suppkey
    """,
    # tpch_q22: the scalar AVG decorrelates to the exact-int
    # cross-multiplication acctbal_cents * n > sum_cents on both sides.
    "tpch_q22_global_sales": """
      WITH c AS (
        SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM customer WHERE c_nationkey IN (10, 11, 12, 13, 14)),
      a AS (SELECT sum(acctbal_cents) AS s, count(*) AS n
            FROM c WHERE acctbal_cents > 0)
      SELECT c_nationkey, count(*) AS numcust,
             CAST(sum(acctbal_cents) AS BIGINT) AS totacctbal_cents
      FROM c, a
      WHERE acctbal_cents * n > s
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2001-01-01')
      GROUP BY c_nationkey
      ORDER BY c_nationkey
    """,
    # tpch3 batch (pipelines/tpch3.py): partsupp-family shapes over the
    # DERIVED part↔supplier relation (distinct lineitem pairs). The
    # oracles keep the textbook correlated/nested form.
    "tpch_q2_min_cost_supplier": """
      WITH ps AS (SELECT DISTINCT l_partkey AS p_partkey, l_suppkey AS s_suppkey
                  FROM lineitem),
      pb AS (SELECT ps.p_partkey, ps.s_suppkey,
                    CAST(FLOOR(s_acctbal * 100) AS BIGINT) AS acctbal_cents
             FROM ps, supplier WHERE ps.s_suppkey = supplier.s_suppkey)
      SELECT pb.p_partkey, pb.s_suppkey, s_name, n_name, acctbal_cents
      FROM pb, part, supplier, nation
      WHERE pb.p_partkey = part.p_partkey AND p_type = 'STANDARD' AND p_size <= 25
        AND pb.s_suppkey = supplier.s_suppkey AND s_nationkey = n_nationkey
        AND acctbal_cents = (SELECT min(acctbal_cents) FROM pb p2
                             WHERE p2.p_partkey = pb.p_partkey)
      ORDER BY acctbal_cents DESC, pb.p_partkey, pb.s_suppkey
      LIMIT 100
    """,
    "tpch_q7_volume_shipping": """
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS BIGINT) AS revenue_cents
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_nationkey = 3 AND n2.n_nationkey = 8)
          OR (n1.n_nationkey = 8 AND n2.n_nationkey = 3))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """,
    "tpch_q8_market_share": """
      WITH x AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
               s_nationkey
        FROM lineitem, orders, customer, part, supplier, nation n2
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_partkey = p_partkey AND l_suppkey = s_suppkey
          AND c_nationkey = n2.n_nationkey
          AND n2.n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
          AND p_type = 'MEDIUM'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01')
      SELECT o_year,
             CAST(sum(CASE WHEN s_nationkey = 2 THEN cents ELSE 0 END) AS BIGINT)
               AS nation_cents,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             CAST(sum(CASE WHEN s_nationkey = 2 THEN cents ELSE 0 END) AS DOUBLE)
               / sum(cents) AS mkt_share
      FROM x GROUP BY o_year ORDER BY o_year
    """,
    "tpch_q9_product_profit": """
      SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                    - CAST(FLOOR(p_retailprice * 100) AS BIGINT)
                      * CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS profit_cents
      FROM lineitem, orders, part, supplier, nation
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%widget%'
      GROUP BY 1, 2
      ORDER BY n_name, o_year DESC
    """,
    # tpch_q11: the fraction-of-global HAVING is the exact-int
    # cross-multiplication 1000*value > total on both sides.
    "tpch_q11_important_stock": """
      WITH v AS (
        SELECT l_partkey AS p_partkey,
               CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM lineitem, supplier, nation, region
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey AND r_name = 'AFRICA'
        GROUP BY 1)
      SELECT p_partkey, value_cents FROM v
      WHERE 1000 * value_cents > (SELECT sum(value_cents) FROM v)
      ORDER BY value_cents DESC, p_partkey
    """,
    "tpch_q16_supplier_count": """
      WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM ps, part
      WHERE l_partkey = p_partkey
        AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        AND p_size IN (1, 3, 5, 7, 9, 11, 13, 15)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    # tpch_q20: the availqty 0.5x test becomes the share-of-total test
    # 10*sq > 3*tq on the derived relation (exact ints on both sides).
    "tpch_q20_quota_suppliers": """
      WITH q AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sq
        FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2),
      t AS (SELECT l_partkey, sum(sq) AS tq FROM q GROUP BY 1)
      SELECT DISTINCT s_suppkey, s_name
      FROM supplier, q, t
      WHERE s_suppkey = q.l_suppkey AND q.l_partkey = t.l_partkey
        AND 10 * q.sq > 3 * t.tq
      ORDER BY s_suppkey
    """,
    "tpch_q21_waiting_supplier": """
      WITH pm AS (
        SELECT l_orderkey, l_suppkey, max(l_shipdate) AS m
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F'
        GROUP BY 1, 2),
      om AS (SELECT l_orderkey, max(m) AS ms, count(*) AS nsupp FROM pm GROUP BY 1),
      ach AS (SELECT pm.l_orderkey, count(*) AS nmax
              FROM pm, om WHERE pm.l_orderkey = om.l_orderkey AND pm.m = om.ms
              GROUP BY 1)
      SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM pm, om, ach, supplier
      WHERE pm.l_orderkey = om.l_orderkey AND pm.l_orderkey = ach.l_orderkey
        AND om.nsupp > 1 AND ach.nmax = 1 AND pm.m = om.ms
        AND pm.l_suppkey = s_suppkey
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100
    """,
    # ngram_jaccard: word-3-gram shingle sets built with DuckDB list
    # comprehension; the perturbation regexp falls back to the original
    # text when there are <3 words, exactly like split(maxsplit=2).
    # Division order matches jaccard() (inter/union first, then *1e6).
    "ngram_jaccard": r"""
      WITH d AS (
        SELECT doc_id, text AS t,
               regexp_replace(text, '^\s*\S+\s+\S+\s+(\S.*)$', '\1', 's') AS pt
        FROM documents WHERE doc_id % 4 = 0),
      w AS (
        SELECT doc_id,
               regexp_extract_all(t, '\S+') AS wa,
               regexp_extract_all(pt, '\S+') AS wb
        FROM d),
      g AS (
        SELECT doc_id,
          CASE WHEN len(wa) < 3 THEN [array_to_string(wa, ' ')]
               ELSE list_distinct(list_transform(range(1, len(wa) - 1),
                    i -> wa[i] || ' ' || wa[i+1] || ' ' || wa[i+2])) END AS ga,
          CASE WHEN len(wb) < 3 THEN [array_to_string(wb, ' ')]
               ELSE list_distinct(list_transform(range(1, len(wb) - 1),
                    i -> wb[i] || ' ' || wb[i+1] || ' ' || wb[i+2])) END AS gb
        FROM w)
      SELECT doc_id,
             CAST(FLOOR((CAST(len(list_intersect(ga, gb)) AS DOUBLE)
                         / CAST(len(list_distinct(list_concat(ga, gb))) AS DOUBLE))
                        * 1000000.0) AS BIGINT) AS jaccard_micro
      FROM g ORDER BY doc_id
    """,
    # contamination_check: same word-3-gram shingle construction as the
    # ngram_jaccard oracle; the bench set is the distinct shingles of
    # every 20th doc, and each other doc counts its shingles in it.
    "contamination_check": r"""
      WITH w AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS wa FROM documents),
      g AS (
        SELECT doc_id,
          CASE WHEN len(wa) < 3 THEN [array_to_string(wa, ' ')]
               ELSE list_distinct(list_transform(range(1, len(wa) - 1),
                    i -> wa[i] || ' ' || wa[i+1] || ' ' || wa[i+2])) END AS ga
        FROM w),
      bl AS (
        SELECT list(DISTINCT s.sh) AS bs
        FROM g, unnest(g.ga) AS s(sh) WHERE g.doc_id % 20 = 0)
      SELECT doc_id,
             CAST(len(list_intersect(ga, bs)) AS BIGINT)
               AS n_bench_shingles
      FROM g CROSS JOIN bl WHERE doc_id % 20 <> 0 ORDER BY doc_id
    """,
    # ann_ivf_topk probes nprobe=nlist lists here, i.e. the probe filter
    # admits every vector - the result is exact and shares the
    # brute-force oracle (recall-lossy only when nprobe < nlist).
    "ann_ivf_topk": """
      WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 8),
      sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(q.embedding, e.embedding) AS cos
        FROM q, embeddings e WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM sims)
      SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank
    """,
    "weighted_sample_docs": """
      SELECT doc_id, n_chars, key_q FROM (
        SELECT doc_id, n_chars,
               ln((CAST((CAST(doc_id + 7 AS HUGEINT) * 2654435761)
                        % 4294967296 AS DOUBLE) + 0.5) / 4294967296.0)
               / GREATEST(CAST(n_chars AS DOUBLE), 1.0) AS key,
               CAST(FLOOR(
                 ln((CAST((CAST(doc_id + 7 AS HUGEINT) * 2654435761)
                          % 4294967296 AS DOUBLE) + 0.5) / 4294967296.0)
                 / GREATEST(CAST(n_chars AS DOUBLE), 1.0)
                 * 1073741824.0) AS BIGINT) AS key_q
        FROM (
          SELECT doc_id,
                 CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars
          FROM documents
        )
        ORDER BY key DESC, doc_id LIMIT 50
      )
      ORDER BY doc_id
    """,
    "fuzzy_name_pairs": """
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY id_a, id_b
    """,
    "chunk_chars": """
      WITH s AS (
        SELECT doc_id, COALESCE(text, '') AS t FROM documents
      )
      SELECT doc_id,
             CAST(start / 160 AS BIGINT) AS chunk_idx,
             substr(t, CAST(start AS BIGINT) + 1, 200) AS chunk_text
      FROM (
        SELECT doc_id, t,
               unnest(generate_series(
                 0, CAST(GREATEST(length(t) - 1, 0) AS BIGINT), 160
               )) AS start
        FROM s
      )
      ORDER BY doc_id, chunk_idx
    """,
    "bm25_rank": """
      WITH base AS (
        SELECT doc_id,
               regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+') AS toks
        FROM documents
      ), d AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS dl,
               CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE) AS tf1,
               CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS tf2,
               CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf3
        FROM base
      ), s AS (
        SELECT CAST(count(*) AS DOUBLE) AS nf,
               CAST(sum(dl) AS DOUBLE) AS sdl,
               CAST(count(*) FILTER (tf1 > 0) AS DOUBLE) AS df1,
               CAST(count(*) FILTER (tf2 > 0) AS DOUBLE) AS df2,
               CAST(count(*) FILTER (tf3 > 0) AS DOUBLE) AS df3
        FROM d
      )
      SELECT doc_id, dl, score_ub FROM (
        SELECT doc_id, dl,
               CAST(FLOOR((
                   ln((nf - df1 + 0.5) / (df1 + 0.5) + 1.0)
                     * (tf1 * (1.2 + 1.0))
                     / (tf1 + 1.2 * (1.0 - 0.75
                          + 0.75 * CAST(dl AS DOUBLE) / (sdl / nf)))
                 + ln((nf - df2 + 0.5) / (df2 + 0.5) + 1.0)
                     * (tf2 * (1.2 + 1.0))
                     / (tf2 + 1.2 * (1.0 - 0.75
                          + 0.75 * CAST(dl AS DOUBLE) / (sdl / nf)))
                 + ln((nf - df3 + 0.5) / (df3 + 0.5) + 1.0)
                     * (tf3 * (1.2 + 1.0))
                     / (tf3 + 1.2 * (1.0 - 0.75
                          + 0.75 * CAST(dl AS DOUBLE) / (sdl / nf)))
               ) * 1048576.0) AS BIGINT) AS score_ub
        FROM d, s
      )
      WHERE score_ub > 0
      ORDER BY doc_id
    """,
    "novelty_scores": """
      WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+')
                 AS t
        FROM documents
      ), tri AS (
        SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
        FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
        WHERE len(t) >= 3
      ), df AS (
        SELECT g, count(*) AS df FROM tri GROUP BY g
      )
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(FLOOR(1000.0
               * sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)
               / count(*)) AS BIGINT) AS novelty_pm
      FROM tri JOIN df USING (g)
      GROUP BY doc_id ORDER BY doc_id
    """,
    "tfidf_keywords": """
      WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
      scored AS (
        SELECT t.doc_id, t.term, (t.tf * 1000000) // d.df AS score
        FROM tf t JOIN df d USING (term)),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        FROM scored)
      SELECT doc_id, rank, term, CAST(score AS BIGINT) AS score
      FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank
    """,
    "training_examples": f"""
      WITH final AS ({FINAL_SQL}),
      lines AS (
        SELECT conv_id, turn_idx, text, role || ': ' || text AS line
        FROM final),
      lagged AS (
        SELECT conv_id, turn_idx, text,
               lag(line, 1) OVER w AS p1,
               lag(line, 2) OVER w AS p2,
               lag(line, 3) OVER w AS p3
        FROM lines WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
      SELECT conv_id, turn_idx,
             concat_ws(chr(10), p3, p2, p1) AS context,
             text AS target
      FROM lagged WHERE p1 IS NOT NULL
      ORDER BY conv_id, turn_idx
    """,
    "assign_split": """
      WITH h AS (
        SELECT (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS hv
        FROM documents),
      labeled AS (
        SELECT CASE
          WHEN hv < CAST(floor(0.8 * 4294967296) AS BIGINT) THEN 'train'
          WHEN hv < CAST(floor((0.8 + 0.1) * 4294967296) AS BIGINT) THEN 'val'
          ELSE 'test' END AS split
        FROM h)
      SELECT split, count(*) AS n_docs FROM labeled
      GROUP BY split ORDER BY split
    """,
    # greedy first-fit packing is a sequential recurrence; the oracle
    # expresses it as a recursive CTE walking each bucket in id order
    # (recursion depth = docs per bucket, driver gate scale only)
    "pack_sequences": """
      WITH RECURSIVE tok AS (
        SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
               doc_id % 8 AS pack_bucket
        FROM documents),
      t AS (
        SELECT *, row_number() OVER (PARTITION BY pack_bucket ORDER BY doc_id) AS rn
        FROM tok),
      acc AS (
        SELECT pack_bucket, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS bin_id, n_tokens AS cur_sum
        FROM t WHERE rn = 1
        UNION ALL
        SELECT t.pack_bucket, t.rn, t.doc_id, t.n_tokens,
               CASE WHEN a.cur_sum > 0 AND a.cur_sum + t.n_tokens > 256
                    THEN a.bin_id + 1 ELSE a.bin_id END,
               CASE WHEN a.cur_sum > 0 AND a.cur_sum + t.n_tokens > 256
                    THEN t.n_tokens ELSE a.cur_sum + t.n_tokens END
        FROM acc a JOIN t ON t.pack_bucket = a.pack_bucket AND t.rn = a.rn + 1)
      SELECT doc_id, n_tokens, pack_bucket, bin_id,
             CAST(sum(n_tokens) OVER (PARTITION BY pack_bucket, bin_id) AS BIGINT) AS bin_tokens
      FROM acc ORDER BY doc_id
    """,
    "mix_corpora": """
      SELECT 'docs' AS source, doc_id AS sid, text FROM documents
      WHERE (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 < CAST(floor(0.7 * 4294967296) AS BIGINT)
      UNION ALL
      SELECT 'events' AS source, event_id AS sid, props AS text FROM events
      WHERE (CAST(event_id AS HUGEINT) * 2654435761) % 4294967296 < CAST(floor(0.1 * 4294967296) AS BIGINT)
      ORDER BY source, sid
    """,
    # mirrors PIIRedactor's sequential replace: count hits on the
    # CURRENT text before each pattern's own replacement, in
    # PII_PATTERNS order (email -> phone -> ipv4)
    "redact_pii": r"""
      WITH injected AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS s0
        FROM documents),
      e AS (
        SELECT doc_id,
               len(regexp_extract_all(s0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS h1,
               regexp_replace(s0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s1
        FROM injected),
      p AS (
        SELECT doc_id, h1,
               len(regexp_extract_all(s1, '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS h2,
               regexp_replace(s1, '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS s2
        FROM e),
      i AS (
        SELECT doc_id, h1, h2,
               len(regexp_extract_all(s2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS h3,
               regexp_replace(s2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS s3
        FROM p)
      SELECT doc_id, CAST(h1 + h2 + h3 AS BIGINT) AS pii_hits, s3 AS text_redacted
      FROM i ORDER BY doc_id
    """,
    "clean_text": r"""
      SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS text_clean
      FROM documents ORDER BY doc_id
    """,
    "image_png_decode": """
      SELECT doc_id AS media_id,
             CAST(16 AS BIGINT) AS width,
             CAST(16 AS BIGINT) AS height,
             CAST(64 * (doc_id % 150) + 1664 AS BIGINT) AS sum_r,
             CAST(64 * ((doc_id * 7) % 150) + 1664 AS BIGINT) AS sum_g,
             CAST(64 * ((doc_id * 13) % 150) + 1664 AS BIGINT) AS sum_b
      FROM documents
      ORDER BY media_id
    """,
    "image_webp_decode": """
      SELECT doc_id AS media_id,
             CAST(8 AS BIGINT) AS width,
             CAST(8 AS BIGINT) AS height,
             CAST(64 * (doc_id % 140) + 640 AS BIGINT) AS sum_r,
             CAST(64 * ((doc_id * 11) % 140) + 640 AS BIGINT) AS sum_g,
             CAST(64 * ((doc_id * 17) % 140) + 640 AS BIGINT) AS sum_b
      FROM documents
      ORDER BY media_id
    """,
    "image_webp_lossy_decode": """
      WITH c0 AS (
        SELECT doc_id AS i, doc_id % 200 AS R, (doc_id*7) % 200 AS G,
               (doc_id*13) % 200 AS B, 8 + (doc_id % 80) AS qi
        FROM documents
      ),
      c1 AS (
        SELECT *,
          CAST(floor((66*R + 129*G + 25*B + 128)/256.0) AS BIGINT) + 16 AS Yv,
          CAST(floor((-38*R - 74*G + 112*B + 128)/256.0) AS BIGINT) + 128 AS Uv,
          CAST(floor((112*R - 94*G - 18*B + 128)/256.0) AS BIGINT) + 128 AS Vv,
          list_extract([4,5,6,7,8,9,10,10,11,12,13,14,15,16,17,17,18,19,20,20,21,21,22,22,23,23,24,25,25,26,27,28,29,30,31,32,33,34,35,36,37,37,38,39,40,41,42,43,44,45,46,46,47,48,49,50,51,52,53,54,55,56,57,58,59,60,61,62,63,64,65,66,67,68,69,70,71,72,73,74,75,76,76,77,78,79,80,81,82,83,84,85,86,87,88,89,91,93,95,96,98,100,101,102,104,106,108,110,112,114,116,118,122,124,126,128,130,132,134,136,138,140,143,145,148,151,154,157], qi + 1) AS dcq
        FROM c0
      ),
      c2 AS (
        SELECT *,
          CASE WHEN abs(Yv-129) < least(abs(Yv-128), abs(Yv-127)) THEN 129
               WHEN abs(Yv-127) < abs(Yv-128) THEN 127 ELSE 128 END AS P,
          CASE WHEN abs(Uv-129)+abs(Vv-129)
                    < least(abs(Uv-128)+abs(Vv-128), abs(Uv-127)+abs(Vv-127))
               THEN 129
               WHEN abs(Uv-127)+abs(Vv-127) < abs(Uv-128)+abs(Vv-128) THEN 127
               ELSE 128 END AS Pc
        FROM c1
      ),
      c3 AS (
        SELECT *,
          64*(8*(Yv-P)) + CASE WHEN Yv != P THEN 4 ELSE 0 END AS a2,
          2*dcq AS q2, least(dcq, 132) AS qv
        FROM c2
      ),
      c4 AS (
        SELECT *,
          CAST(floor((a2 + CASE WHEN a2 < 0 THEN 1 ELSE 0 END + 3)/8.0)
               AS BIGINT) AS cy0,
          8*(Uv-Pc) AS cu0, 8*(Vv-Pc) AS cv0
        FROM c3
      ),
      c5 AS (
        SELECT *,
          CASE WHEN cy0 < 0 THEN -((abs(cy0) + q2//2) // q2)
               ELSE (cy0 + q2//2) // q2 END * q2 AS ty,
          CASE WHEN cu0 < 0 THEN -((abs(cu0) + qv//2) // qv)
               ELSE (cu0 + qv//2) // qv END * qv AS tu,
          CASE WHEN cv0 < 0 THEN -((abs(cv0) + qv//2) // qv)
               ELSE (cv0 + qv//2) // qv END * qv AS tv
        FROM c4
      ),
      c6 AS (
        SELECT *,
          greatest(0, least(255, P + CAST(floor((CAST(floor((ty + 3)/8.0)
            AS BIGINT) + 4)/8.0) AS BIGINT))) AS Yr,
          greatest(0, least(255, Pc + CAST(floor((tu + 4)/8.0) AS BIGINT))) AS Ur,
          greatest(0, least(255, Pc + CAST(floor((tv + 4)/8.0) AS BIGINT))) AS Vr
        FROM c5
      )
      SELECT i AS media_id, CAST(16 AS BIGINT) AS width,
             CAST(16 AS BIGINT) AS height,
             256*greatest(0, least(255, CAST(floor((298*(Yr-16) + 409*(Vr-128)
               + 128)/256.0) AS BIGINT))) AS sum_r,
             256*greatest(0, least(255, CAST(floor((298*(Yr-16) - 100*(Ur-128)
               - 208*(Vr-128) + 128)/256.0) AS BIGINT))) AS sum_g,
             256*greatest(0, least(255, CAST(floor((298*(Yr-16) + 516*(Ur-128)
               + 128)/256.0) AS BIGINT))) AS sum_b
      FROM c6
      ORDER BY media_id
    """,
    "image_gif_decode": """
      SELECT doc_id AS media_id,
             CAST(8 AS BIGINT) AS width,
             CAST(8 AS BIGINT) AS height,
             CAST(16 * ((doc_id) % 256 + (doc_id + 31) % 256
                        + (doc_id + 62) % 256 + (doc_id + 93) % 256)
                  AS BIGINT) AS sum_r,
             CAST(16 * ((doc_id * 3) % 256 + (doc_id * 3 + 57) % 256
                        + (doc_id * 3 + 114) % 256 + (doc_id * 3 + 171) % 256)
                  AS BIGINT) AS sum_g,
             CAST(16 * ((doc_id * 7) % 256 + (doc_id * 7 + 89) % 256
                        + (doc_id * 7 + 178) % 256 + (doc_id * 7 + 267) % 256)
                  AS BIGINT) AS sum_b
      FROM documents
      ORDER BY media_id
    """,
    "image_jpeg_decode": """
      WITH lv AS (
        SELECT doc_id,
               2 * ((doc_id % 30) + 5) + 128 AS y,
               2 * (((doc_id % 5) - 2) * 4) AS cb,
               2 * (((doc_id % 7) - 3) * 4) AS cr
        FROM documents
      )
      SELECT doc_id AS media_id,
             CAST(16 AS BIGINT) AS width,
             CAST(16 AS BIGINT) AS height,
             CAST(64 * ROUND(y + 1.402 * cr) AS BIGINT) AS sum_r,
             CAST(64 * ROUND(y - 0.344136 * cb - 0.714136 * cr) AS BIGINT) AS sum_g,
             CAST(64 * ROUND(y + 1.772 * cb) AS BIGINT) AS sum_b
      FROM lv
      ORDER BY media_id
    """,
    "image_jpeg_progressive": """
      WITH lv AS (
        SELECT doc_id,
               2 * ((doc_id % 30) + 5) + 128 AS y,
               2 * (((doc_id % 5) - 2) * 4) AS cb,
               2 * (((doc_id % 7) - 3) * 4) AS cr
        FROM documents
      )
      SELECT doc_id AS media_id,
             CAST(16 AS BIGINT) AS width,
             CAST(16 AS BIGINT) AS height,
             CAST(64 * ROUND(y + 1.402 * cr) AS BIGINT) AS sum_r,
             CAST(64 * ROUND(y - 0.344136 * cb - 0.714136 * cr) AS BIGINT) AS sum_g,
             CAST(64 * ROUND(y + 1.772 * cb) AS BIGINT) AS sum_b
      FROM lv
      ORDER BY media_id
    """,
    "fix_mojibake": """
      SELECT doc_id,
             text || ' déjà — naïve' AS text,
             TRUE AS had_mojibake
      FROM documents
      ORDER BY doc_id
    """,
    "conversation_lint": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord, event_type AS role,
               props AS text
        FROM events
      ),
      s AS (
        SELECT conv, ord, role, text,
               lead(ord)  OVER (PARTITION BY conv ORDER BY ord) AS next_ord,
               lead(role) OVER (PARTITION BY conv ORDER BY ord) AS next_role
        FROM t
      )
      SELECT conv,
             CAST(COUNT(*) AS BIGINT) AS n_turns,
             arg_min(role, ord) AS first_role,
             arg_max(role, ord) AS last_role,
             CAST(SUM(CASE WHEN next_ord IS NOT NULL AND next_ord <> ord + 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_order_gaps,
             CAST(SUM(CASE WHEN next_role = role THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_role_repeats,
             CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null_text,
             (arg_min(role, ord) = 'view' AND arg_max(role, ord) = 'click'
              AND SUM(CASE WHEN next_ord IS NOT NULL AND next_ord <> ord + 1
                           THEN 1 ELSE 0 END) = 0
              AND SUM(CASE WHEN next_role = role THEN 1 ELSE 0 END) = 0
              AND SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) = 0) AS ok
      FROM s GROUP BY conv ORDER BY conv
    """,
    "boilerplate_turns": """
      SELECT props AS text,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_convs,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM events
      WHERE props IS NOT NULL
      GROUP BY props
      HAVING COUNT(DISTINCT user_id) >= 3
      ORDER BY text
    """,
    "repeated_turn_runs": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord, event_type AS role,
               CAST(LENGTH(props) AS VARCHAR) AS text,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS rn,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type, LENGTH(props)
                 ORDER BY event_id) AS rnrt
        FROM events WHERE props IS NOT NULL
      )
      SELECT conv, role, text,
             CAST(COUNT(*) AS BIGINT) AS run_len,
             CAST(MIN(ord) AS BIGINT) AS first_ord
      FROM t
      GROUP BY conv, role, text, rn - rnrt
      HAVING COUNT(*) >= 2
      ORDER BY conv, first_ord
    """,
    "instruction_pairs": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord, event_type AS role,
               props AS text
        FROM events
      ),
      s AS (
        SELECT conv, ord, role, text,
               lead(role) OVER (PARTITION BY conv ORDER BY ord) AS next_role,
               lead(text) OVER (PARTITION BY conv ORDER BY ord) AS next_text
        FROM t
      )
      SELECT conv, ord, text AS prompt, next_text AS response
      FROM s WHERE role = 'view' AND next_role = 'click'
      ORDER BY conv, ord
    """,
    "prefix_fork_groups": """
      WITH t AS (
        SELECT user_id AS conv, props AS text,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
      ),
      pre AS (
        SELECT conv, string_agg(text, chr(10) ORDER BY rn) AS prefix
        FROM t WHERE rn <= 2 GROUP BY conv
      ),
      g AS (SELECT prefix, COUNT(*) AS n FROM pre GROUP BY prefix)
      SELECT pre.conv, pre.prefix,
             CAST(g.n AS BIGINT) AS n_convs_sharing
      FROM pre JOIN g USING (prefix)
      ORDER BY conv
    """,
    "conversation_lang_consistency": """
      WITH t AS (
        SELECT user_id AS conv,
               props || CASE event_id % 3
                          WHEN 0 THEN ' the and you'
                          WHEN 1 THEN ' el por los'
                          ELSE ' le pour dans'
                        END AS text
        FROM events
      ),
      scored AS (SELECT conv, {_LANG} FROM t),
      pred AS (
        SELECT conv,
               CASE WHEN hits_es > hits_en AND hits_es >= hits_fr THEN 'es'
                    WHEN hits_fr > hits_en AND hits_fr > hits_es THEN 'fr'
                    ELSE 'en' END AS lang
        FROM scored
      ),
      counts AS (SELECT conv, lang, COUNT(*) AS n FROM pred GROUP BY conv, lang),
      ranked AS (
        SELECT conv, lang, n,
               SUM(n) OVER (PARTITION BY conv) AS tot,
               row_number() OVER (
                 PARTITION BY conv
                 ORDER BY n DESC,
                   CASE lang WHEN 'en' THEN 0 WHEN 'es' THEN 1 ELSE 2 END
               ) AS rn
        FROM counts
      )
      SELECT conv, lang AS majority_lang,
             CAST(tot AS BIGINT) AS n_turns,
             CAST(tot - n AS BIGINT) AS n_minority,
             (tot - n = 0) AS consistent
      FROM ranked WHERE rn = 1 ORDER BY conv
    """.replace("{_LANG}", _LANG_SQL_CASES),
    "echo_pairs": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord, event_type AS role,
               props AS text
        FROM events
      ),
      s AS (
        SELECT conv, ord, role, text,
               lead(role) OVER (PARTITION BY conv ORDER BY ord) AS next_role,
               lead(text) OVER (PARTITION BY conv ORDER BY ord) AS next_text
        FROM t
      ),
      p AS (
        SELECT conv, ord,
               list_distinct(string_split(lower(text), ' ')) AS ut,
               list_distinct(string_split(lower(next_text), ' ')) AS lt
        FROM s
        WHERE role = 'view' AND next_role = 'click'
          AND text IS NOT NULL AND next_text IS NOT NULL
      )
      SELECT conv, ord,
             CAST(len(ut) AS BIGINT) AS n_user_tokens,
             CAST(len(lt) AS BIGINT) AS n_assistant_tokens,
             CAST(len(list_intersect(ut, lt)) AS BIGINT) AS n_shared
      FROM p ORDER BY conv, ord
    """,
    "preference_pairs": """
      WITH t AS (
        SELECT user_id AS conv, substr(props, 1, 7) AS text,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
      ),
      pre AS (
        SELECT conv, string_agg(text, chr(10) ORDER BY rn) AS prefix
        FROM t WHERE rn <= 1 GROUP BY conv
      ),
      fork AS (
        SELECT conv, text AS resp FROM t WHERE rn = 2 AND text IS NOT NULL
      ),
      pc AS (
        SELECT pre.conv, pre.prefix, fork.resp
        FROM pre JOIN fork USING (conv)
      ),
      g AS (SELECT prefix, COUNT(*) AS n FROM pc GROUP BY prefix)
      SELECT a.prefix,
             a.conv AS conv_a, b.conv AS conv_b,
             a.resp AS response_a, b.resp AS response_b
      FROM pc a
      JOIN pc b ON a.prefix = b.prefix AND a.conv < b.conv
      JOIN g ON g.prefix = a.prefix
      WHERE a.resp <> b.resp AND g.n <= 1000
      ORDER BY conv_a, conv_b
    """,
    "turn_gap_stats": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord, ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS nts
        FROM events
      )
      SELECT conv,
             CAST(COUNT(*) AS BIGINT) AS n_turns,
             CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
               AS span_us,
             CAST(COALESCE(MAX(epoch_us(nts) - epoch_us(ts)), 0) AS BIGINT)
               AS max_gap_us,
             CAST(SUM(CASE WHEN nts IS NOT NULL
                            AND epoch_us(nts) - epoch_us(ts) < 60000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
             CAST(SUM(CASE WHEN nts IS NOT NULL
                            AND epoch_us(nts) - epoch_us(ts) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_order
      FROM t GROUP BY conv ORDER BY conv
    """,
    "fork_best_of_n": """
      WITH t AS (
        SELECT user_id AS conv, substr(props, 1, 7) AS text,
               length(props) AS sc,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
      ),
      pre AS (
        SELECT conv, string_agg(text, chr(10) ORDER BY rn) AS prefix
        FROM t WHERE rn <= 1 GROUP BY conv
      ),
      fork AS (
        SELECT conv, sc FROM t WHERE rn = 2 AND text IS NOT NULL
      ),
      pc AS (
        SELECT pre.conv, pre.prefix, fork.sc
        FROM pre JOIN fork USING (conv)
      ),
      g AS (SELECT prefix, COUNT(*) AS n FROM pc GROUP BY prefix),
      r AS (
        SELECT conv, prefix, sc,
               ROW_NUMBER() OVER (
                 PARTITION BY prefix ORDER BY sc DESC, conv) AS rk
        FROM pc
      )
      SELECT r.prefix, r.conv, CAST(r.sc AS BIGINT) AS score,
             CAST(g.n AS BIGINT) AS n_candidates
      FROM r JOIN g USING (prefix)
      WHERE rk = 1 ORDER BY prefix
    """,
    "fork_advantage": """
      WITH t AS (
        SELECT user_id AS conv, substr(props, 1, 7) AS text,
               length(props) AS sc,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
      ),
      pre AS (
        SELECT conv, string_agg(text, chr(10) ORDER BY rn) AS prefix
        FROM t WHERE rn <= 1 GROUP BY conv
      ),
      fork AS (
        SELECT conv, sc FROM t
        WHERE rn = 2 AND text IS NOT NULL AND sc IS NOT NULL
      ),
      pc AS (
        SELECT pre.conv, pre.prefix, fork.sc
        FROM pre JOIN fork USING (conv)
      ),
      w AS (
        SELECT prefix, conv, sc,
               COUNT(*) OVER (PARTITION BY prefix) AS n,
               SUM(sc) OVER (PARTITION BY prefix) AS s
        FROM pc
      )
      SELECT prefix, conv, CAST(sc AS BIGINT) AS score,
             CAST(n AS BIGINT) AS n_candidates,
             CAST(sc * n - s AS DOUBLE) / n AS advantage
      FROM w ORDER BY prefix, conv
    """,
    "fork_zscore": """
      WITH t AS (
        SELECT user_id AS conv, substr(props, 1, 7) AS text,
               length(props) AS sc,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
      ),
      pre AS (
        SELECT conv, string_agg(text, chr(10) ORDER BY rn) AS prefix
        FROM t WHERE rn <= 1 GROUP BY conv
      ),
      fork AS (
        SELECT conv, sc FROM t
        WHERE rn = 2 AND text IS NOT NULL AND sc IS NOT NULL
      ),
      pc AS (
        SELECT pre.conv, pre.prefix, fork.sc
        FROM pre JOIN fork USING (conv)
      ),
      w AS (
        SELECT prefix, conv, sc,
               COUNT(*) OVER (PARTITION BY prefix) AS n,
               SUM(sc) OVER (PARTITION BY prefix) AS s,
               SUM(sc * sc) OVER (PARTITION BY prefix) AS ss
        FROM pc
      )
      SELECT prefix, conv, CAST(sc AS BIGINT) AS score,
             CAST(n AS BIGINT) AS n_candidates,
             CASE WHEN n * ss - s * s = 0 THEN 0.0
                  ELSE CAST(sc * n - s AS DOUBLE)
                       / sqrt(CAST(n * ss - s * s AS DOUBLE))
             END AS advantage
      FROM w ORDER BY prefix, conv
    """,
    "fork_pass_rate": """
      WITH t AS (
        SELECT user_id AS conv, substr(props, 1, 7) AS text,
               length(props) AS sc,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
      ),
      pre AS (
        SELECT conv, string_agg(text, chr(10) ORDER BY rn) AS prefix
        FROM t WHERE rn <= 1 GROUP BY conv
      ),
      fork AS (
        SELECT conv, sc FROM t
        WHERE rn = 2 AND text IS NOT NULL AND sc IS NOT NULL
      ),
      pc AS (
        SELECT pre.conv, pre.prefix, fork.sc
        FROM pre JOIN fork USING (conv)
      )
      SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(SUM(CASE WHEN sc >= 9 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass,
             CAST(SUM(CASE WHEN sc >= 9 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS pass_rate
      FROM pc GROUP BY prefix ORDER BY prefix
    """,
    "retry_edit_distance": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord, event_type AS role,
               props AS text
        FROM events
      ),
      p AS (
        SELECT conv, ord, role, text,
               lag(role) OVER (PARTITION BY conv ORDER BY ord) AS prole,
               lag(text) OVER (PARTITION BY conv ORDER BY ord) AS ptext
        FROM t
      )
      SELECT conv, ord, role,
             CAST(levenshtein(ptext, text) AS BIGINT) AS dist,
             CAST(strlen(ptext) AS BIGINT) AS len_prev,
             CAST(strlen(text) AS BIGINT) AS len_next
      FROM p
      WHERE role = prole AND text IS NOT NULL AND ptext IS NOT NULL
      ORDER BY conv, ord
    """,
    "pseudonymize_ids": """
      SELECT event_id,
             md5('k1|' || CAST(user_id AS VARCHAR)) AS user_token
      FROM events ORDER BY event_id
    """,
    "system_prompt_inventory": """
      WITH t AS (
        SELECT user_id AS conv, props AS text,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
      )
      SELECT text AS prompt,
             CAST(COUNT(*) AS BIGINT) AS n_convs,
             CAST(MIN(conv) AS BIGINT) AS example_conv
      FROM t WHERE rn = 1
      GROUP BY text ORDER BY prompt
    """,
    "cdc_clone_branch": """
      WITH ch AS (
        SELECT
          CASE WHEN event_id % 10 = 9 THEN 'D'
               WHEN event_id % 10 >= 6 THEN 'U'
               ELSE 'I' END AS op,
          event_id AS seq,
          'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
          CAST(event_id % 40 AS INTEGER) AS turn_idx,
          event_type AS role, props AS text,
          CAST(NULL AS VARCHAR) AS tool, ts
        FROM events
        WHERE (event_id // 40) % 2 = 0
      ),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
        FROM ch
      )
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY conv_id, turn_idx
    """,
    "pack_conversations": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord,
               event_type || ': ' || props AS line
        FROM events
        WHERE props IS NOT NULL AND event_type IS NOT NULL
      )
      SELECT conv,
             CAST(COUNT(*) AS BIGINT) AS n_turns,
             string_agg(line, chr(10) ORDER BY ord) AS text
      FROM t GROUP BY conv ORDER BY conv
    """,
    "cdc_transcript_refinery": f"""
      WITH final AS ({FINAL_SQL}),
      t AS (
        SELECT conv_id, turn_idx, role, text,
               ROW_NUMBER() OVER (
                 PARTITION BY conv_id ORDER BY turn_idx) AS rn,
               ROW_NUMBER() OVER (
                 PARTITION BY conv_id, role ORDER BY turn_idx) AS rnr
        FROM final
      ),
      i AS (
        SELECT conv_id, role,
               STRING_AGG(text, ' ' ORDER BY turn_idx) AS text,
               MIN(turn_idx) AS first_idx
        FROM t GROUP BY conv_id, role, rn - rnr
      ),
      lines AS (
        SELECT conv_id, first_idx, role || ': ' || text AS line
        FROM i WHERE text IS NOT NULL
      ),
      packed AS (
        SELECT conv_id,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               string_agg(line, chr(10) ORDER BY first_idx) AS text
        FROM lines GROUP BY conv_id
      ),
      sp AS (
        SELECT conv_id, n_turns, text,
               CAST(length(text) AS BIGINT) AS packed_chars,
               (CAST(CAST(substr(conv_id, 6) AS BIGINT) AS HUGEINT)
                * 2654435761) % 4294967296 AS hv
        FROM packed
      )
      SELECT conv_id, n_turns, packed_chars, text,
             CASE
               WHEN hv < CAST(floor(0.8 * 4294967296) AS BIGINT)
                 THEN 'train'
               WHEN hv < CAST(floor((0.8 + 0.1) * 4294967296) AS BIGINT)
                 THEN 'val'
               ELSE 'test' END AS split
      FROM sp ORDER BY conv_id
    """,
    "cdc_incremental_refinery": f"""
      WITH final AS ({FINAL_SQL}),
      t AS (
        SELECT conv_id, turn_idx, role, text,
               ROW_NUMBER() OVER (
                 PARTITION BY conv_id ORDER BY turn_idx) AS rn,
               ROW_NUMBER() OVER (
                 PARTITION BY conv_id, role ORDER BY turn_idx) AS rnr
        FROM final
      ),
      i AS (
        SELECT conv_id, role,
               STRING_AGG(text, ' ' ORDER BY turn_idx) AS text,
               MIN(turn_idx) AS first_idx
        FROM t GROUP BY conv_id, role, rn - rnr
      ),
      lines AS (
        SELECT conv_id, first_idx, role || ': ' || text AS line
        FROM i WHERE text IS NOT NULL
      ),
      packed AS (
        SELECT conv_id,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               string_agg(line, chr(10) ORDER BY first_idx) AS text
        FROM lines GROUP BY conv_id
      ),
      sp AS (
        SELECT conv_id, n_turns, text,
               CAST(length(text) AS BIGINT) AS packed_chars,
               (CAST(CAST(substr(conv_id, 6) AS BIGINT) AS HUGEINT)
                * 2654435761) % 4294967296 AS hv
        FROM packed
      )
      SELECT conv_id, n_turns, packed_chars, text,
             CASE
               WHEN hv < CAST(floor(0.8 * 4294967296) AS BIGINT)
                 THEN 'train'
               WHEN hv < CAST(floor((0.8 + 0.1) * 4294967296) AS BIGINT)
                 THEN 'val'
               ELSE 'test' END AS split
      FROM sp ORDER BY conv_id
    """,
    "rater_agreement": """
      WITH t AS (
        SELECT event_type AS grp,
               event_id % 3 AS la,
               (event_id + length(props)) % 3 AS lb
        FROM events WHERE props IS NOT NULL
      ),
      pairs AS (
        SELECT grp, la, lb, COUNT(*) AS n FROM t GROUP BY grp, la, lb
      ),
      tot AS (SELECT grp, SUM(n) AS n FROM pairs GROUP BY grp),
      agr AS (
        SELECT grp,
               COALESCE(SUM(CASE WHEN la = lb THEN n END), 0) AS a
        FROM pairs GROUP BY grp
      ),
      ma AS (SELECT grp, la, SUM(n) AS na FROM pairs GROUP BY grp, la),
      mb AS (SELECT grp, lb, SUM(n) AS nb FROM pairs GROUP BY grp, lb),
      pe AS (
        SELECT ma.grp, SUM(ma.na * mb.nb) AS p
        FROM ma JOIN mb ON ma.grp = mb.grp AND ma.la = mb.lb
        GROUP BY ma.grp
      )
      SELECT tot.grp,
             CAST(tot.n AS BIGINT) AS n_items,
             CAST(agr.a AS BIGINT) AS n_agree,
             CASE WHEN tot.n * tot.n - pe.p = 0 THEN NULL
                  ELSE CAST(agr.a * tot.n - pe.p AS DOUBLE)
                       / (tot.n * tot.n - pe.p) END AS kappa
      FROM tot JOIN agr ON tot.grp = agr.grp
               JOIN pe ON tot.grp = pe.grp
      ORDER BY tot.grp
    """,
    "fork_margin": """
      WITH t AS (
        SELECT user_id AS conv, substr(props, 1, 7) AS text,
               length(props) AS sc,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
      ),
      pre AS (
        SELECT conv, string_agg(text, chr(10) ORDER BY rn) AS prefix
        FROM t WHERE rn <= 1 GROUP BY conv
      ),
      fork AS (
        SELECT conv, sc FROM t
        WHERE rn = 2 AND text IS NOT NULL AND sc IS NOT NULL
      ),
      pc AS (
        SELECT pre.conv, pre.prefix, fork.sc
        FROM pre JOIN fork USING (conv)
      ),
      r AS (
        SELECT prefix, conv, sc,
               ROW_NUMBER() OVER (
                 PARTITION BY prefix ORDER BY sc DESC, conv ASC) AS rk,
               COUNT(*) OVER (PARTITION BY prefix) AS n
        FROM pc
      )
      SELECT a.prefix,
             CAST(a.n AS BIGINT) AS n_candidates,
             a.conv AS best_conv,
             CAST(a.sc AS BIGINT) AS best_score,
             CAST(b.sc AS DOUBLE) AS second_score,
             CAST(a.sc - b.sc AS DOUBLE) AS margin
      FROM r a LEFT JOIN r b ON a.prefix = b.prefix AND b.rk = 2
      WHERE a.rk = 1
      ORDER BY a.prefix
    """,
    "cdc_schema_evolve": """
      WITH ch AS (
        SELECT
          CASE WHEN event_id % 10 = 9 THEN 'D'
               WHEN event_id % 10 >= 6 THEN 'U'
               ELSE 'I' END AS op,
          event_id AS seq,
          'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
          CAST(event_id % 40 AS INTEGER) AS turn_idx,
          event_type AS role,
          props AS text,
          CAST(NULL AS VARCHAR) AS tool,
          ts,
          CASE WHEN (event_id // 40) % 2 = 1 THEN value
               ELSE NULL END AS score
        FROM events
      ),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
        FROM ch
      )
      SELECT conv_id, turn_idx, role, text, tool, ts, score
      FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY conv_id, turn_idx
    """,
    "loss_mask_spans": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord, event_type AS role,
               CAST(length(props) AS BIGINT) AS len
        FROM events WHERE props IS NOT NULL
      )
      SELECT conv, ord,
             CAST(COALESCE(SUM(len + 1) OVER (
                    PARTITION BY conv ORDER BY ord
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS span_start,
             CAST(COALESCE(SUM(len + 1) OVER (
                    PARTITION BY conv ORDER BY ord
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) + len AS BIGINT) AS span_end,
             (role = 'click') AS mask
      FROM t ORDER BY conv, ord
    """,
    "response_length_trend": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord,
               CAST(length(props) AS BIGINT) AS y
        FROM events WHERE event_type = 'click' AND props IS NOT NULL
      ),
      r AS (
        SELECT conv, y,
               ROW_NUMBER() OVER (PARTITION BY conv ORDER BY ord) - 1 AS x
        FROM t
      ),
      a AS (
        SELECT conv, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM r GROUP BY conv
      )
      SELECT conv, CAST(n AS BIGINT) AS n_turns,
             CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                  ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                       / (n * sxx - sx * sx) END AS slope
      FROM a ORDER BY conv
    """,
    "dialogue_acts": """
      WITH t AS (
        SELECT user_id AS conv,
               CASE event_id % 3
                 WHEN 0 THEN 'what is ' || props || '?'
                 WHEN 1 THEN 'Write ' || props
                 ELSE props END AS text
        FROM events
        WHERE event_type = 'view' AND props IS NOT NULL
      ),
      c AS (
        SELECT conv,
               CASE WHEN text LIKE '%?' THEN 'q'
                    WHEN lower(string_split(text, ' ')[1]) IN
                      ('write','create','make','fix','add','generate',
                       'explain','list','show','give','update','delete',
                       'run','implement','translate','summarize') THEN 'c'
                    ELSE 's' END AS act
        FROM t
      )
      SELECT conv,
             CAST(SUM(CASE WHEN act = 'q' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_questions,
             CAST(SUM(CASE WHEN act = 'c' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_commands,
             CAST(SUM(CASE WHEN act = 's' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_statements
      FROM c GROUP BY conv ORDER BY conv
    """,
    "fence_lint": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord,
               CASE WHEN props IS NULL THEN NULL
                    ELSE repeat('```', CAST(event_id % 4 AS INT)) || props
               END AS text
        FROM events
      ),
      f AS (
        SELECT conv, ord,
               CASE WHEN text IS NULL THEN 0
                    ELSE (length(text) - length(replace(text, '```', '')))
                         // 3
               END AS nf
        FROM t
      )
      SELECT conv,
             CAST(COUNT(*) AS BIGINT) AS n_turns,
             CAST(SUM(CASE WHEN nf > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fenced_turns,
             CAST(SUM(nf % 2) AS BIGINT) AS n_unbalanced,
             (arg_max(nf, ord) % 2 = 1) AS last_unbalanced,
             (SUM(nf % 2) = 0) AS ok
      FROM f GROUP BY conv ORDER BY conv
    """,
    "discounted_returns": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord, length(props) AS r
        FROM events WHERE props IS NOT NULL
      ),
      rk AS (
        SELECT conv, ord, r,
               ROW_NUMBER() OVER (PARTITION BY conv ORDER BY ord) - 1
                 AS rn
        FROM t
      )
      SELECT a.conv, a.ord, CAST(a.r AS BIGINT) AS reward,
             SUM(b.r * power(0.5, b.rn - a.rn)) AS ret
      FROM rk a JOIN rk b
        ON a.conv = b.conv AND b.rn >= a.rn AND b.rn <= a.rn + 16
      GROUP BY a.conv, a.ord, a.r
      ORDER BY a.conv, a.ord
    """,
    "tool_usage_stats": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord,
               CASE WHEN event_type = 'click'
                    THEN 'tool_' || CAST(event_id % 3 AS VARCHAR) END AS tool
        FROM events
      ),
      base AS (
        SELECT conv, CAST(COUNT(*) AS BIGINT) AS n_turns FROM t GROUP BY conv
      ),
      tt AS (SELECT conv, ord, tool FROM t WHERE tool IS NOT NULL),
      i AS (
        SELECT conv, tool,
               ROW_NUMBER() OVER (PARTITION BY conv ORDER BY ord)
             - ROW_NUMBER() OVER (PARTITION BY conv, tool ORDER BY ord) AS isl
        FROM tt
      ),
      runs AS (
        SELECT conv, tool, isl, COUNT(*) AS rl FROM i GROUP BY conv, tool, isl
      ),
      mr AS (SELECT conv, MAX(rl) AS max_run FROM runs GROUP BY conv),
      agg AS (
        SELECT conv, COUNT(*) AS n_tool,
               COUNT(DISTINCT tool) AS n_dist
        FROM tt GROUP BY conv
      ),
      cnt AS (SELECT conv, tool, COUNT(*) AS n FROM tt GROUP BY conv, tool),
      top AS (
        SELECT conv, tool AS top_tool FROM (
          SELECT conv, tool,
                 ROW_NUMBER() OVER (
                   PARTITION BY conv ORDER BY n DESC, tool) AS rn
          FROM cnt
        ) WHERE rn = 1
      )
      SELECT b.conv, b.n_turns,
             CAST(COALESCE(a.n_tool, 0) AS BIGINT) AS n_tool_turns,
             CAST(COALESCE(a.n_dist, 0) AS BIGINT) AS n_distinct_tools,
             top.top_tool,
             CAST(COALESCE(mr.max_run, 0) AS BIGINT) AS max_tool_run
      FROM base b
      LEFT JOIN agg a USING (conv)
      LEFT JOIN top USING (conv)
      LEFT JOIN mr USING (conv)
      ORDER BY conv
    """,
    "tool_transitions": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord,
               CASE WHEN event_type = 'click'
                    THEN 'tool_' || CAST(event_id % 3 AS VARCHAR) END AS tool
        FROM events
      ),
      tt AS (SELECT conv, ord, tool FROM t WHERE tool IS NOT NULL),
      p AS (
        SELECT conv, tool AS tool_from,
               lead(tool) OVER (PARTITION BY conv ORDER BY ord) AS tool_to
        FROM tt
      )
      SELECT tool_from, tool_to, CAST(COUNT(*) AS BIGINT) AS n
      FROM p WHERE tool_to IS NOT NULL
      GROUP BY tool_from, tool_to
      ORDER BY tool_from, tool_to
    """,
    "context_truncate": """
      WITH t AS (
        SELECT user_id AS conv, event_id AS ord, props AS text,
               CASE WHEN props IS NULL THEN 0
                    ELSE len(string_split(props, ' ')) END AS n_tokens,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id DESC) AS rnd
        FROM events
      ),
      c AS (
        SELECT conv, ord, text, n_tokens, rnd,
               SUM(n_tokens) OVER (
                 PARTITION BY conv ORDER BY ord DESC
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
      )
      SELECT conv, ord, text,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(cum AS BIGINT) AS cum_tokens_from_end
      FROM c WHERE cum <= 24 OR rnd = 1
      ORDER BY conv, ord
    """,
    "cdc_lint_rollup": f"""
      WITH fin AS ({FINAL_SQL}),
      s AS (
        SELECT conv_id, turn_idx, role, text,
               lead(turn_idx) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx) AS next_ord,
               lead(role) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx) AS next_role
        FROM fin
      )
      SELECT conv_id,
             CAST(COUNT(*) AS BIGINT) AS n_turns,
             arg_min(role, turn_idx) AS first_role,
             arg_max(role, turn_idx) AS last_role,
             CAST(SUM(CASE WHEN next_ord IS NOT NULL
                            AND next_ord <> turn_idx + 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_order_gaps,
             CAST(SUM(CASE WHEN next_role = role THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_role_repeats,
             CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null_text,
             (arg_min(role, turn_idx) = 'view'
              AND arg_max(role, turn_idx) = 'click'
              AND SUM(CASE WHEN next_ord IS NOT NULL
                            AND next_ord <> turn_idx + 1
                           THEN 1 ELSE 0 END) = 0
              AND SUM(CASE WHEN next_role = role THEN 1 ELSE 0 END) = 0
              AND SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) = 0) AS ok
      FROM s GROUP BY conv_id ORDER BY conv_id
    """,
    "cdc_retry_distance": f"""
      WITH fin AS ({FINAL_SQL}),
      p AS (
        SELECT conv_id, turn_idx, role, text,
               lag(role) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx) AS prole,
               lag(text) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx) AS ptext
        FROM fin
      )
      SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
             CAST(levenshtein(ptext, text) AS BIGINT) AS dist,
             CAST(strlen(ptext) AS BIGINT) AS len_prev,
             CAST(strlen(text) AS BIGINT) AS len_next
      FROM p
      WHERE role = prole AND text IS NOT NULL AND ptext IS NOT NULL
      ORDER BY conv_id, turn_idx
    """,
    "cdc_context_truncate": f"""
      WITH fin AS ({FINAL_SQL}),
      t AS (
        SELECT conv_id, turn_idx, text,
               CASE WHEN text IS NULL THEN 0
                    ELSE len(string_split(text, ' ')) END AS n_tokens,
               ROW_NUMBER() OVER (
                 PARTITION BY conv_id ORDER BY turn_idx DESC) AS rnd
        FROM fin
      ),
      c AS (
        SELECT conv_id, turn_idx, text, n_tokens, rnd,
               SUM(n_tokens) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx DESC
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
      )
      SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, text,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(cum AS BIGINT) AS cum_tokens_from_end
      FROM c WHERE cum <= 24 OR rnd = 1
      ORDER BY conv_id, turn_idx
    """,
    "image_metadata": """
      SELECT doc_id AS media_id,
             CASE doc_id % 6
               WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
               WHEN 3 THEN 'bmp' WHEN 4 THEN 'ppm' ELSE 'webp'
             END AS format,
             CAST(4 + doc_id % 7 AS BIGINT) AS width,
             CAST(3 + doc_id % 5 AS BIGINT) AS height,
             CAST(8 AS BIGINT) AS bit_depth,
             CAST(3 AS BIGINT) AS channels
      FROM documents ORDER BY media_id
    """,
    "refusal_screen": """
      SELECT user_id AS conv,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_assistant_turns,
             CAST(SUM(CASE WHEN event_type = 'click' AND props IS NOT NULL
                            AND regexp_matches(props, '(?i)"k": 8[0-9]')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_refusal_turns
      FROM events GROUP BY user_id ORDER BY conv
    """,
    "collapse_turns": """
      WITH t AS (
        SELECT user_id AS conv, event_id, event_type AS role, props AS text,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type ORDER BY event_id
               ) AS rnr
        FROM events
      ),
      i AS (
        SELECT conv, role, rn - rnr AS island,
               COUNT(*) AS n_merged,
               STRING_AGG(text, chr(10) ORDER BY event_id) AS text,
               MIN(event_id) AS first_id
        FROM t GROUP BY conv, role, rn - rnr
      )
      SELECT conv,
             CAST(ROW_NUMBER() OVER (PARTITION BY conv ORDER BY first_id) - 1
                  AS BIGINT) AS turn_seq,
             role,
             CAST(n_merged AS BIGINT) AS n_merged,
             text
      FROM i
      ORDER BY conv, turn_seq
    """,
    "chunk_sentences": """
      WITH p AS (
        SELECT doc_id,
               regexp_extract_all(
                 regexp_replace(text, '([a-z]+ [a-z]+ [a-z]+) ', '\\1. ', 'g'),
                 '[^.!?]+[.!?]+'
               ) AS sents
        FROM documents
      ),
      e AS (SELECT doc_id, sents, len(sents) AS n FROM p WHERE len(sents) > 0)
      SELECT e.doc_id AS doc_id,
             CAST(g.j AS BIGINT) AS chunk_idx,
             CAST(len(e.sents[g.j * 3 + 1 : LEAST(g.j * 3 + 3, e.n)]) AS BIGINT)
               AS n_sentences,
             array_to_string(
               e.sents[g.j * 3 + 1 : LEAST(g.j * 3 + 3, e.n)], ''
             ) AS chunk_text
      FROM e
      JOIN (SELECT UNNEST(generate_series(0, 999)) AS j) g ON g.j * 3 < e.n
      ORDER BY doc_id, chunk_idx
    """,
    "conversation_windows": """
      WITH t AS (
        SELECT user_id AS conv,
               event_type AS text,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id
               ) - 1 AS rn
        FROM events
      ),
      starts AS (
        SELECT conv, UNNEST(generate_series(0, CAST(MAX(rn) AS BIGINT), 2)) AS s
        FROM t GROUP BY conv
      )
      SELECT t.conv AS conv,
             CAST(s.s AS BIGINT) AS window_start,
             CAST(COUNT(*) AS BIGINT) AS n_turns,
             STRING_AGG(t.text, ' ' ORDER BY t.rn) AS text
      FROM starts s
      JOIN t ON t.conv = s.conv AND t.rn >= s.s AND t.rn < s.s + 4
      GROUP BY t.conv, s.s
      ORDER BY conv, window_start
    """,
    "audio_metadata": """
      WITH v AS (
        SELECT doc_id, doc_id % 4 AS variant,
               800 + (doc_id % 5) * 160 AS wav_n,
               400 + (doc_id % 11) * 20 AS flac_n,
               2 + doc_id % 4 AS mp3_k,
               1 + doc_id % 3 AS aac_k
        FROM documents
      )
      SELECT doc_id AS media_id,
             CASE variant WHEN 0 THEN 'wav' WHEN 1 THEN 'flac'
                          WHEN 2 THEN 'mp3' ELSE 'aac' END AS format,
             CAST(CASE variant WHEN 0 THEN wav_n WHEN 1 THEN flac_n
                               WHEN 2 THEN mp3_k ELSE aac_k END
                  AS BIGINT) AS n_frames,
             CAST(CASE variant WHEN 0 THEN 16000 WHEN 1 THEN 8000
                               WHEN 2 THEN 44100 ELSE 16000 END
                  AS BIGINT) AS sample_rate,
             CAST(1 AS BIGINT) AS channels,
             CAST(CASE variant
                    WHEN 0 THEN (wav_n * 1000) // 16000
                    WHEN 1 THEN (flac_n * 1000) // 8000
                    WHEN 2 THEN (mp3_k * 1152 * 1000) // 44100
                    ELSE (aac_k * 1024 * 1000) // 16000
                  END AS BIGINT) AS duration_ms,
             CASE WHEN variant = 2 THEN CAST(128 AS BIGINT)
                  ELSE CAST(-1 AS BIGINT) END AS bitrate_kbps
      FROM v
      ORDER BY media_id
    """,
    "audio_flac_features": """
      WITH p AS (
        SELECT doc_id,
               400 + (doc_id % 11) * 20 AS n,
               1000 + (doc_id % 40) * 100 AS a
        FROM documents
      )
      SELECT doc_id AS media_id,
             CAST(n AS BIGINT) AS n_frames,
             CAST(8000 AS BIGINT) AS sample_rate,
             CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
             CAST(a AS BIGINT) AS peak,
             CAST(n * a * a AS BIGINT) AS energy
      FROM p
      ORDER BY media_id
    """,
    "audio_quality": """
      WITH p AS (
        SELECT doc_id,
               (doc_id % 10) * 10 AS z,
               (doc_id % 7) * 5 AS c,
               1000 - (doc_id % 10) * 10 - (doc_id % 7) * 5 AS m
        FROM documents
      )
      SELECT doc_id AS media_id,
             CAST(z AS BIGINT) AS silence_permille,
             CAST(c AS BIGINT) AS clip_permille,
             CAST(
               m - 1
               + CASE WHEN c > 0 AND m % 2 = 0 THEN 1 ELSE 0 END
               AS BIGINT
             ) AS zero_crossings
      FROM p
      ORDER BY media_id
    """,
    "audio_coverage": """
      WITH cls AS (
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'wav'
                               WHEN 3 THEN 'aac'
                               ELSE 'mp3' END AS format
        FROM documents
      )
      SELECT format,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CASE WHEN format = 'wav' THEN COUNT(*) ELSE 0 END AS BIGINT)
               AS n_decoded,
             CAST(CASE WHEN format = 'wav' THEN 1000 ELSE 0 END AS BIGINT)
               AS decode_permille
      FROM cls
      GROUP BY format
      ORDER BY format
    """,
    "video_frames": """
      SELECT d.doc_id AS media_id, CAST(g.f AS BIGINT) AS frame_idx
      FROM documents d
      JOIN (SELECT UNNEST(generate_series(0, 6)) AS f) g
        ON g.f % 2 = 0 AND g.f < (d.doc_id % 5) + 2
      ORDER BY media_id, frame_idx
    """,
    "unicode_normalize": """
      SELECT doc_id,
             lower(strip_accents(text ||
               CASE CAST(doc_id % 4 AS INT)
                 WHEN 0 THEN ' Élan' WHEN 1 THEN ' Grüße'
                 WHEN 2 THEN ' FAÇADE' ELSE ' Señor' END)) AS text_norm
      FROM documents ORDER BY doc_id
    """,
    "strip_html": """
      WITH w AS (
        SELECT doc_id,
               '<html><head><style>p{color:red}</style></head>'
               || '<body><!-- boilerplate --><p class="main">'
               || COALESCE(text, '')
               || '</p>&nbsp;&amp;&lt;tail&gt;'
               || '<script>var x = 1 < 2;</script></body></html>' AS t
        FROM documents
      ),
      s1 AS (SELECT doc_id,
               regexp_replace(t, '<script[^>]*>.*?</script>', ' ', 'gis') AS t
             FROM w),
      s2 AS (SELECT doc_id,
               regexp_replace(t, '<style[^>]*>.*?</style>', ' ', 'gis') AS t
             FROM s1),
      s3 AS (SELECT doc_id,
               regexp_replace(t, '<!--.*?-->', ' ', 'gs') AS t FROM s2),
      s4 AS (SELECT doc_id,
               regexp_replace(t, '<[^>]+>', ' ', 'gs') AS t FROM s3),
      s5 AS (SELECT doc_id,
               replace(replace(replace(replace(replace(replace(t,
                 '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'),
                 '&gt;', '>'), '&quot;', '"'), '&#39;', '''') AS t
             FROM s4)
      SELECT doc_id,
             trim(regexp_replace(t, '\\s+', ' ', 'g')) AS clean
      FROM s5 ORDER BY doc_id
    """,
    "bfs_links": """
      WITH RECURSIVE raw AS (
        SELECT user_id % 500 AS s,
               ((user_id % 500) * 31 + event_id) % 500 AS d
        FROM events
      ), e AS (
        SELECT u, v FROM (
          SELECT s AS u, d AS v FROM raw WHERE s <> d
          UNION
          SELECT d AS u, s AS v FROM raw WHERE s <> d
        )
      ), walk(node, dep) AS (
        SELECT CAST(0 AS BIGINT) AS node, 0 AS dep
        UNION
        SELECT e.v, walk.dep + 1
        FROM walk JOIN e ON e.u = walk.node
        WHERE walk.dep < 4
      )
      SELECT node, CAST(min(dep) AS BIGINT) AS dist
      FROM walk GROUP BY node ORDER BY node
    """,
    "triangle_count_links": """
      WITH raw AS (
        SELECT user_id % 500 AS s,
               ((user_id % 500) * 31 + event_id) % 500 AS d
        FROM events
      ), e0 AS (
        SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
        FROM raw WHERE s <> d
      )
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM e0 x
      JOIN e0 y ON x.b = y.a
      JOIN e0 z ON z.a = x.a AND z.b = y.b
    """,
    "cohort_retention_weekly": """
      WITH f AS (
        SELECT user_id,
               min((epoch_us(ts) // 604800000000) * 604800000000) AS cohort
        FROM events GROUP BY user_id
      ), cs AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY cohort
      ), a AS (
        SELECT DISTINCT user_id,
               (epoch_us(ts) // 604800000000) * 604800000000 AS bucket
        FROM events
      )
      SELECT f.cohort, a.bucket,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(max(cs.n) AS BIGINT) AS n_cohort
      FROM a JOIN f USING (user_id) JOIN cs USING (cohort)
      GROUP BY f.cohort, a.bucket
      ORDER BY f.cohort, a.bucket
    """,
    "histogram_value": """
      WITH p AS (
        SELECT LEAST(GREATEST(
                 (CAST(FLOOR(value * 100) AS BIGINT) - 0) // 5000, 0), 19)
               AS bin
        FROM events
      ), bins AS (
        SELECT unnest(generate_series(0, 19)) AS bin
      )
      SELECT CAST(b.bin AS BIGINT) AS bin,
             CAST(b.bin * 5000 AS BIGINT) AS bin_lo,
             CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      FROM bins b LEFT JOIN (
        SELECT bin, count(*) AS n FROM p GROUP BY bin
      ) c USING (bin)
      ORDER BY bin
    """,
    "gini_value_by_type": """
      WITH p AS (
        SELECT event_type AS g,
               CAST(FLOOR(value * 100) AS BIGINT) AS v
        FROM events
      ), r AS (
        SELECT g, v,
               row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
               count(*) OVER (PARTITION BY g) AS n,
               sum(v) OVER (PARTITION BY g) AS sx
        FROM p
      )
      SELECT g AS event_type,
             CAST(max(n) AS BIGINT) AS n,
             CAST(max(sx) AS BIGINT) AS sum_x,
             CAST(sum((2 * rn - n - 1) * v) AS BIGINT) AS gini_num,
             CAST(FLOOR(
               CAST(sum((2 * rn - n - 1) * v) AS DOUBLE)
               / (CAST(max(n) AS DOUBLE) * CAST(max(sx) AS DOUBLE))
               * 1e6) AS BIGINT) AS gini_ppm
      FROM r GROUP BY g ORDER BY g
    """,
    "mad_value_by_type": """
      WITH p AS (
        SELECT event_type,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
      ), med AS (
        SELECT event_type, quantile_disc(cents, 0.5) AS median
        FROM p GROUP BY event_type
      )
      SELECT event_type, median,
             quantile_disc(abs(cents - median), 0.5) AS mad
      FROM p JOIN med USING (event_type)
      GROUP BY event_type, median
      ORDER BY event_type
    """,
    "global_percentile_doclen": """
      SELECT doc_id, n_chars,
             percent_rank() OVER (ORDER BY n_chars) AS pct_rank
      FROM documents ORDER BY doc_id
    """,
    "winsorize_doc_len": """
      WITH th AS (
        SELECT quantile_disc(n_chars, 0.05) AS lo,
               quantile_disc(n_chars, 0.95) AS hi
        FROM documents
      )
      SELECT doc_id, n_chars,
             LEAST(GREATEST(n_chars, lo), hi) AS n_chars_w
      FROM documents, th
      ORDER BY doc_id
    """,
    "quantile_band_filter": """
      WITH th AS (
        SELECT quantile_disc(n_chars, 0.1) AS lo,
               quantile_disc(n_chars, 0.9) AS hi
        FROM documents)
      SELECT doc_id, n_chars FROM documents, th
      WHERE n_chars BETWEEN th.lo AND th.hi
      ORDER BY doc_id
    """,
    "url_dedup": r"""
      WITH urls AS (
        SELECT doc_id,
               'HTTPS://'
               || CASE CAST((doc_id // 3) % 5 AS INT)
                    WHEN 0 THEN 'WWW.Alpha.COM' WHEN 1 THEN 'www.Beta.NET'
                    WHEN 2 THEN 'WWW.gamma.ORG' WHEN 3 THEN 'Www.Delta.COM'
                    ELSE 'WWW.Blocked.EXAMPLE' END
               || '/Path/' || CAST(doc_id // 3 AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
               || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x' ELSE '' END
               || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
        FROM documents),
      stripped AS (
        SELECT doc_id, regexp_replace(url, '[#?].*$', '') AS u FROM urls),
      canon AS (
        SELECT doc_id,
               lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)', 1))
               || rtrim(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(.*)$', 1), '/')
                 AS canon_url
        FROM stripped),
      hostd AS (
        SELECT doc_id, canon_url,
               regexp_replace(
                 regexp_extract(canon_url, '^[a-z][a-z0-9+.\-]*://([^/]*)', 1),
                 ':[0-9]+$', '') AS host
        FROM canon),
      domd AS (
        SELECT doc_id, canon_url, host,
               coalesce(nullif(regexp_extract(host, '([^.]+\.[^.]+)$', 1), ''), host)
                 AS domain
        FROM hostd)
      SELECT min(doc_id) AS doc_id, canon_url, host, domain
      FROM domd WHERE domain <> 'blocked.example'
      GROUP BY canon_url, host, domain
      ORDER BY doc_id
    """,
    "stratified_sample": """
      WITH ranked AS (
        SELECT event_type, event_id,
               row_number() OVER (
                 PARTITION BY event_type
                 ORDER BY (CAST(event_id AS HUGEINT) * 2654435761) % 4294967296 DESC, event_id) AS rank
        FROM events)
      SELECT event_type, rank, event_id FROM ranked WHERE rank <= 3
      ORDER BY event_type, rank
    """,
    "join_orders_mktsegment": """
      SELECT c_mktsegment, count(*) AS n_orders,
             CAST(sum(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "term_topk": """
      WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents)
      SELECT term, count(*) AS n FROM toks
      GROUP BY term ORDER BY n DESC, term LIMIT 100
    """,
    "distinct_users_by_type": """
      SELECT event_type, count(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type ORDER BY event_type
    """,
    "heavy_hitters": """
      WITH t AS (SELECT count(*) AS total FROM events)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events, t GROUP BY user_id, t.total
      HAVING count(*) * 150 > t.total
      ORDER BY n DESC, user_id
    """,
    "trailing_window": """
      WITH e AS (
        SELECT event_id, ts, user_id,
               CAST(event_id % 97 AS BIGINT) AS v_int,
               epoch_us(ts) AS tus
        FROM events)
      SELECT event_id, ts, user_id, v_int,
             CAST(count(*) OVER w AS BIGINT) AS trailing_n,
             CAST(sum(v_int) OVER w AS BIGINT) AS trailing_sum
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tus
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id
    """,
    "window_events_hopping": """
      WITH e AS (
        SELECT CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS w0,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events),
      x AS (
        SELECT make_timestamp((w0 - k * 1800) * 1000000) AS window_start, cents
        FROM e, (VALUES (0), (1)) t(k))
      SELECT window_start, count(*) AS n_events,
             CAST(sum(cents) AS BIGINT) AS value_cents
      FROM x GROUP BY window_start ORDER BY window_start
    """,
    "topk_events_per_type": """
      WITH ranked AS (
        SELECT event_type, event_id,
               row_number() OVER (
                 PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
        FROM events)
      SELECT event_type, rank, event_id FROM ranked WHERE rank <= 3
      ORDER BY event_type, rank
    """,
    "sample_deterministic": """
      SELECT event_id, user_id, ts FROM events
      WHERE (CAST(event_id AS HUGEINT) * 2654435761) % 4294967296 % 20 = 0
      ORDER BY event_id
    """,
    "sample_per_group": """
      WITH h AS (
        SELECT event_type, event_id,
               (CAST(event_id AS HUGEINT) * 2654435761) % 4294967296 AS hv
        FROM events),
      ranked AS (
        SELECT event_type, event_id,
               row_number() OVER (
                 PARTITION BY event_type ORDER BY hv, event_id) AS rank
        FROM h)
      SELECT event_type, rank, event_id FROM ranked
      WHERE rank <= 3 ORDER BY event_type, rank
    """,
    "value_quantiles_by_type": """
      WITH e AS (
        SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events)
      SELECT event_type,
             quantile_disc(cents, 0.5) AS p50_cents,
             quantile_disc(cents, 0.9) AS p90_cents,
             quantile_disc(cents, 0.99) AS p99_cents
      FROM e GROUP BY event_type ORDER BY event_type
    """,
    "bloom_semi_join": """
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_cents
      FROM lineitem
      WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "vocab_coverage": """
      WITH toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents),
      vocab AS (
        SELECT term FROM toks GROUP BY term
        ORDER BY count(*) DESC, term LIMIT 256),
      per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(*) FILTER (
                 WHERE term IN (SELECT term FROM vocab)) AS BIGINT) AS n_invocab
        FROM toks GROUP BY doc_id)
      SELECT d.doc_id,
             COALESCE(p.n_tokens, 0) AS n_tokens,
             CASE WHEN COALESCE(p.n_tokens, 0) = 0 THEN 0
                  ELSE (p.n_invocab * 1000) // p.n_tokens END AS score
      FROM documents d LEFT JOIN per_doc p USING (doc_id)
      ORDER BY d.doc_id
    """,
    "model_score": """
      SELECT doc_id,
             CAST(((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
                   + length(COALESCE(text, ''))) % 1000 AS BIGINT)
               AS model_score
      FROM documents ORDER BY doc_id
    """,
    "rank_events_per_user": """
      SELECT event_id, user_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS value_cents,
             CAST(row_number() OVER (
               PARTITION BY user_id
               ORDER BY CAST(FLOOR(value * 100) AS BIGINT) DESC, event_id
             ) AS BIGINT) AS rank
      FROM events ORDER BY event_id
    """,
    "cumsum_user_value": """
      SELECT event_id, user_id,
             CAST(count(*) OVER w AS BIGINT) AS cum_n,
             CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)) OVER w
                  AS BIGINT) AS cum_value_cents
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY event_id
    """,
    "explode_embeddings": """
      SELECT vec_id,
             CAST(unnest(generate_series(1, len(embedding))) AS BIGINT)
               AS idx,
             unnest(embedding) AS val
      FROM embeddings
      ORDER BY vec_id, idx
    """,
    "first_last_user": """
      SELECT event_id, user_id,
             first_value(event_type) OVER w AS first_event_type,
             last_value(event_type) OVER w AS last_event_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
      ORDER BY event_id
    """,
    "resample_user_6h": """
      WITH c AS (
        SELECT user_id,
               (epoch_us(ts) // 21600000000) * 21600000000 AS bs,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, bs
      ), span AS (
        SELECT user_id, min(bs) AS mn, max(bs) AS mx FROM c GROUP BY user_id
      ), grid AS (
        SELECT user_id,
               unnest(generate_series(mn, mx, 21600000000)) AS bs
        FROM span
      )
      SELECT g.user_id, g.bs, COALESCE(c.n, 0) AS n
      FROM grid g LEFT JOIN c USING (user_id, bs)
      ORDER BY g.user_id, g.bs
    """,
    "negative_samples_docs": """
      WITH ids AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS r
        FROM documents
      ), n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
      a AS (
        SELECT doc_id, j
        FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
      )
      SELECT a.doc_id, CAST(a.j AS BIGINT) AS j, i.doc_id AS neg_id
      FROM a, n
      JOIN ids i
        ON i.r = CAST(((CAST(a.doc_id AS HUGEINT) * 3 + a.j + 11)
                       * 2654435761) % 4294967296 AS BIGINT) % n.c
      ORDER BY a.doc_id, j
    """,
    "percent_rank_events": """
      SELECT event_id, event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS value_cents,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume_dist
      FROM events
      WINDOW w AS (PARTITION BY event_type
                   ORDER BY CAST(FLOOR(value * 100) AS BIGINT))
      ORDER BY event_id
    """,
    "skew_join_events_segment": """
      SELECT e.event_id, e.user_id, c.c_mktsegment
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY e.event_id
    """,
    "pivot_user_event_counts": """
      SELECT user_id,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
             CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
             CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
             CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
      FROM events GROUP BY user_id ORDER BY user_id
    """,
    "shuffle_shards": """
      WITH h AS (
        SELECT event_id,
               (CAST(event_id + 7 AS HUGEINT) * 2654435761) % 4294967296 AS h
        FROM events)
      SELECT CAST(h % 8 AS BIGINT) AS shard,
             CAST(row_number() OVER (
               PARTITION BY h % 8 ORDER BY h, event_id) - 1 AS BIGINT) AS pos,
             event_id
      FROM h ORDER BY shard, pos
    """,
    "lm_bigram_score": """
      WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents),
      bg AS (
        SELECT doc_id, t[pos + 1] AS w1,
               t[pos + 1] || ' ' || t[pos + 2] AS bigram
        FROM (SELECT doc_id, t,
                     unnest(range(0, greatest(len(t) - 1, 0))) AS pos
              FROM toks)),
      bcnt AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram),
      pcnt AS (SELECT w1, count(*) AS n FROM bg GROUP BY w1),
      model AS (
        SELECT bigram, n FROM bcnt ORDER BY n DESC, bigram LIMIT 50000),
      scored AS (
        SELECT g.doc_id,
               (COALESCE(m.n, 0) * 1000000) // p.n AS ppm
        FROM bg g
        JOIN pcnt p USING (w1)
        LEFT JOIN model m USING (bigram)),
      agg AS (
        SELECT doc_id, count(*) AS nb, sum(ppm) AS tot
        FROM scored GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(COALESCE(a.nb, 0) AS BIGINT) AS n_bigrams,
             CAST(COALESCE(a.tot // a.nb, 0) AS BIGINT) AS score_ppm
      FROM documents d LEFT JOIN agg a USING (doc_id)
      ORDER BY d.doc_id
    """,
    "inverted_index": """
      WITH toks AS (
        SELECT DISTINCT doc_id, term FROM (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents))
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings
      FROM toks GROUP BY term HAVING count(*) >= 100
      ORDER BY term
    """,
    "window_dedup": f"""
      WITH base AS (
        SELECT doc_id,
               COALESCE(text, '') || ' {_WD_FOOTER} tail-'
                 || CAST(doc_id AS VARCHAR) AS text
        FROM documents),
      toks AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM base),
      occ AS (
        SELECT doc_id, t,
               unnest(range(0, greatest(len(t) - 7, 0))) AS pos
        FROM toks),
      occw AS (
        SELECT doc_id, pos,
               array_to_string(t[pos + 1 : pos + 8], ' ') AS w1
        FROM occ),
      firsts AS (
        SELECT w1, min(doc_id * 1048576 + pos) AS keep
        FROM occw GROUP BY w1),
      spans AS (
        SELECT o.doc_id, o.pos FROM occw o JOIN firsts f USING (w1)
        WHERE o.doc_id * 1048576 + o.pos <> f.keep),
      covered AS (
        SELECT DISTINCT doc_id, pos + k AS cpos
        FROM spans,
             (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) ku(k)),
      toklist AS (
        SELECT doc_id, unnest(t) AS tok,
               unnest(range(0, len(t))) AS p
        FROM toks),
      kept AS (
        SELECT tl.doc_id, tl.tok, tl.p FROM toklist tl
        LEFT JOIN covered c ON c.doc_id = tl.doc_id AND c.cpos = tl.p
        WHERE c.doc_id IS NULL)
      SELECT b.doc_id,
             COALESCE(string_agg(k.tok, ' ' ORDER BY k.p), '') AS text_dedup
      FROM base b LEFT JOIN kept k USING (doc_id)
      GROUP BY b.doc_id ORDER BY b.doc_id
    """,
    "psi_event_drift": """
      WITH bnd AS (
        SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS tmin,
               CAST(max(epoch_us(ts)) AS BIGINT) AS tmax
        FROM events
      ),
      s AS (
        SELECT event_type,
               CASE WHEN epoch_us(ts) >=
                    tmin + (tmax - tmin) // 2 THEN 1 ELSE 0 END AS side
        FROM events, bnd
      ),
      c AS (
        SELECT event_type,
               CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_a,
               CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_b
        FROM s GROUP BY event_type
      ),
      t AS (
        SELECT *,
               CAST((SELECT sum(n_a) FROM c) AS DOUBLE)
                 + CAST((SELECT count(*) FROM c) AS DOUBLE) AS ta,
               CAST((SELECT sum(n_b) FROM c) AS DOUBLE)
                 + CAST((SELECT count(*) FROM c) AS DOUBLE) AS tb
        FROM c
      ),
      pq AS (
        SELECT event_type, n_a, n_b,
               (CAST(n_a AS DOUBLE) + 1.0) / ta AS p,
               (CAST(n_b AS DOUBLE) + 1.0) / tb AS q
        FROM t
      )
      SELECT event_type, n_a, n_b,
             CAST(FLOOR((p - q) * ln(p / q) * 1e9) AS BIGINT) AS psi_nano,
             CAST(FLOOR((0.5 * p * ln(p / ((p + q) / 2.0))
                         + 0.5 * q * ln(q / ((p + q) / 2.0))) * 1e9)
                  AS BIGINT) AS js_nano
      FROM pq ORDER BY event_type
    """,
    "ks_value_drift": """
      WITH bnd AS (
        SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS tmin,
               CAST(max(epoch_us(ts)) AS BIGINT) AS tmax
        FROM events
      ),
      p AS (
        SELECT CAST(FLOOR(value * 100) AS BIGINT) AS v,
               CASE WHEN epoch_us(ts) >=
                    tmin + (tmax - tmin) // 2 THEN 1 ELSE 0 END AS side
        FROM events, bnd
      ),
      h AS (
        SELECT v,
               CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS HUGEINT)
                 AS na,
               CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                 AS nb
        FROM p GROUP BY v
      ),
      c AS (
        SELECT v,
               sum(na) OVER (ORDER BY v) AS ca,
               sum(nb) OVER (ORDER BY v) AS cb,
               (SELECT sum(na) FROM h) AS ta,
               (SELECT sum(nb) FROM h) AS tb
        FROM h
      )
      SELECT CAST(v AS BIGINT) AS at_value,
             CAST(abs(ca * tb - cb * ta) AS BIGINT) AS d_num,
             CAST(ta AS BIGINT) AS n_a,
             CAST(tb AS BIGINT) AS n_b,
             CAST(abs(ca * tb - cb * ta) * 1000000 // (ta * tb) AS BIGINT)
               AS d_ppm
      FROM c
      ORDER BY abs(ca * tb - cb * ta) DESC, v ASC
      LIMIT 1
    """,
    "mwu_value_drift": """
      WITH bnd AS (
        SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS tmin,
               CAST(max(epoch_us(ts)) AS BIGINT) AS tmax
        FROM events
      ),
      p AS (
        SELECT CAST(FLOOR(value * 100) AS BIGINT) AS v,
               CASE WHEN epoch_us(ts) >=
                    tmin + (tmax - tmin) // 2 THEN 1 ELSE 0 END AS side
        FROM events, bnd
      ),
      h AS (
        SELECT v,
               CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS HUGEINT)
                 AS na,
               CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                 AS nb
        FROM p GROUP BY v
      ),
      c AS (
        SELECT na, nb,
               COALESCE(sum(nb) OVER (
                 ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS cumb
        FROM h
      )
      SELECT CAST(sum(na * (2 * cumb + nb)) AS BIGINT) AS u2_a,
             CAST((SELECT sum(na) FROM h) AS BIGINT) AS n_a,
             CAST((SELECT sum(nb) FROM h) AS BIGINT) AS n_b,
             CAST(sum(na * (2 * cumb + nb)) * 1000000
                  // (2 * (SELECT sum(na) FROM h)
                        * (SELECT sum(nb) FROM h)) AS BIGINT) AS auc_ppm
      FROM c
    """,
    "embedding_drift": """
      WITH e AS (
        SELECT vec_id % 2 AS side,
               CAST(unnest(generate_series(1, len(embedding))) AS BIGINT)
                 AS dim,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6)
                    AS BIGINT) AS q
        FROM embeddings
      ),
      s AS (
        SELECT dim,
               CAST(sum(CASE WHEN side = 0 THEN q ELSE 0 END) AS HUGEINT)
                 AS sa,
               CAST(sum(CASE WHEN side = 1 THEN q ELSE 0 END) AS HUGEINT)
                 AS sb
        FROM e GROUP BY dim
      ),
      agg AS (
        SELECT sum(sa * sb) AS dot,
               sum(sa * sa) AS qa,
               sum(sb * sb) AS qb
        FROM s
      ),
      n AS (
        SELECT CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b
        FROM embeddings
      )
      SELECT n_a, n_b,
             CAST(FLOOR(CAST(dot AS DOUBLE)
                        / (sqrt(CAST(qa AS DOUBLE))
                           * sqrt(CAST(qb AS DOUBLE))) * 1e9)
                  AS BIGINT) AS cos_nano,
             CAST(FLOOR(sqrt(CAST(qb AS DOUBLE)) * CAST(n_a AS DOUBLE)
                        / (sqrt(CAST(qa AS DOUBLE)) * CAST(n_b AS DOUBLE))
                        * 1e9)
                  AS BIGINT) AS scale_nano
      FROM agg, n
    """,
    "cdc_branch_merge": BRANCH_MERGE_SQL,
    "cdc_delete_where": DELETE_WHERE_SQL,
    "cdc_update_where": UPDATE_WHERE_SQL,
    "cdc_merge_into": MERGE_INTO_SQL,
    "cdc_row_provenance": ROW_PROVENANCE_SQL,
    "cdc_delete_where_or": DELETE_WHERE_OR_SQL,
    "cdc_ddl_cycle": DDL_CYCLE_SQL,
    "cdc_scan_dnf": SCAN_DNF_SQL,
    "cdc_sql_frontend": SQL_FRONTEND_SQL,
    "cdc_delete_by_aggregate": DELETE_BY_AGG_SQL,
    "cdc_lake_diff": LAKE_DIFF_SQL,
    "preference_cycles": PREFERENCE_CYCLES_SQL,
    "judge_length_bias": LENGTH_BIAS_SQL,
    "fleiss_kappa": FLEISS_SQL,
    "distinct_ngrams": DISTINCT_NGRAMS_SQL,
    "embedding_outliers": EMBEDDING_OUTLIERS_SQL,
    "cdc_drop_boilerplate": DROP_BOILERPLATE_SQL,
    # minhash_near_dup / simhash_near_dup / embedding_near_dup /
    # multimodal_decode / hll_users_by_type / value_quantiles_sketch:
    # not SQL-expressible -> rows-only checks (the driver records the
    # weaker check).
}


def cleanup_scratch() -> None:
    shutil.rmtree(SCRATCH, ignore_errors=True)
