"""Round-2 hardening tests: checkpoint watermark compaction, age-gated
gc, lossless schema round-trip, redrive cleanup, DQ key-cols fix and
the dq_gate notify hook."""

import glob
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
    Manifest,
    ManifestStore,
    manifest_payload_schema,
    parse_type_string,
    schema_from_ipc,
    schema_to_ipc,
)

from test_cdc_e2e import assert_matches_oracle


# ---------------------------------------------------------------------------
# checkpoint watermark compaction
# ---------------------------------------------------------------------------


def test_checkpoint_stays_bounded_over_many_micro_commits(tmp_path):
    """The DDB-TTL analogue: an always-on tailer micro-committing must
    not grow the manifest O(files ever applied). 60 single-file commits
    -> applied stays empty, watermark advances, manifest bytes flat."""
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=6000, n_convs=60, n_files=60, seed=3)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(changes, lake, spec, commit_every_files=1)
    store = ManifestStore(lake)
    m = store.load()
    assert m.version == 60
    assert m.applied == []
    assert len(m.applied_watermarks) == 1
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    assert all(m.is_applied(f) for f in files)
    # the CHECKPOINT's byte size does not trend with commit count
    # (pre-compaction manifests still list accumulated LSM run files -
    # that part is bounded by compaction cadence, below)
    ck_bytes = len(
        json.dumps({"applied": m.applied, "wm": m.applied_watermarks})
    )
    assert ck_bytes < 500, ck_bytes
    # compaction folds the accumulated runs: the post-compact manifest
    # is back to O(P) size
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact

    cm = compact(lake, spec)
    sz10 = os.path.getsize(os.path.join(lake, "_manifest", "manifest-000010.json"))
    szc = os.path.getsize(
        os.path.join(lake, "_manifest", f"manifest-{cm.version:06d}.json")
    )
    assert szc < sz10 * 2, (sz10, szc)
    assert_matches_oracle(lake, changes)


def test_out_of_order_apply_keeps_exception_then_absorbs(tmp_path):
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=2000, n_convs=40, n_files=5, seed=11)
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    spec = engine.default_spec(num_partitions=4)
    # apply the LAST file first: watermark cannot advance, exception kept
    engine.apply_changes([files[4]], lake, spec)
    store = ManifestStore(lake)
    m = store.load()
    assert m.applied == [os.path.abspath(files[4])]
    assert m.is_applied(files[4]) and not m.is_applied(files[0])
    # applying the rest closes the gap: watermark jumps to the end,
    # the exception is absorbed
    engine.apply_changes(changes, lake, spec)
    m = store.load()
    assert m.applied == []
    assert all(m.is_applied(f) for f in files)
    assert_matches_oracle(lake, changes)


def test_future_file_below_watermark_is_producer_error(tmp_path):
    """The watermark contract: producers emit monotone names. A file
    landing BELOW the watermark is (correctly) treated as applied."""
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=500, n_convs=10, n_files=2, seed=5)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=2))
    m = ManifestStore(lake).load()
    assert m.is_applied(os.path.join(changes, "changes-000000.parquet"))
    # a name sorting above the watermark is pending
    assert not m.is_applied(os.path.join(changes, "zz-next.parquet"))


# ---------------------------------------------------------------------------
# gc: age gate + quarantine sweep
# ---------------------------------------------------------------------------


def test_gc_age_gate_protects_inflight_writes(tmp_path):
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=1000, n_convs=20, n_files=2, seed=9)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=2))
    store = ManifestStore(lake)
    # a fresh orphan models an in-flight apply's pre-commit write:
    # default gc must NOT touch it
    orphan = os.path.join(lake, "data", "part=00000", "f-inflight.parquet")
    pq.write_table(pa.table({"x": [1]}), orphan)
    removed = store.gc()
    assert os.path.exists(orphan) and removed == []
    # an old orphan is collected
    os.utime(orphan, (time.time() - 3600, time.time() - 3600))
    removed = store.gc()
    assert not os.path.exists(orphan)
    assert any("f-inflight" in r for r in removed)


def test_gc_sweeps_unreferenced_quarantine_files(tmp_path):
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=1000, n_convs=20, n_files=2, seed=13, bad_ratio=0.1)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=2))
    store = ManifestStore(lake)
    qfiles = glob.glob(os.path.join(lake, "_quarantine", "part=*", "*.parquet"))
    assert qfiles, "bad rows should be quarantined"
    # referenced quarantine files survive gc
    store.gc(min_age_seconds=0)
    assert all(os.path.exists(q) for q in qfiles)
    # an unreferenced one (e.g. left by a failed attempt) is swept
    stray = os.path.join(lake, "_quarantine", "part=00000", "q-stray.parquet")
    os.makedirs(os.path.dirname(stray), exist_ok=True)
    pq.write_table(pa.table({"x": [1]}), stray)
    removed = store.gc(min_age_seconds=0)
    assert not os.path.exists(stray)
    assert any("q-stray" in r for r in removed)
    # DQ markers are never swept
    marker = os.path.join(lake, "_quarantine", "dq", "version-000001.json")
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as f:
        f.write("{}")
    store.gc(min_age_seconds=0)
    assert os.path.exists(marker)


def test_redrive_deletes_source_quarantine_files(tmp_path):
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=1000, n_convs=20, n_files=2, seed=13, bad_ratio=0.1)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=2))
    qfiles = glob.glob(os.path.join(lake, "_quarantine", "part=*", "*.parquet"))
    assert qfiles
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.redrive import redrive

    res = redrive(lake, changes)
    assert res["rows"] > 0
    assert not any(os.path.exists(q) for q in qfiles)
    # monotone naming: redrive file sorts above the applied watermark
    m = ManifestStore(lake).load()
    assert not m.is_applied(res["file"])


# ---------------------------------------------------------------------------
# lossless schema round-trip
# ---------------------------------------------------------------------------


def test_schema_ipc_roundtrip_exotic_types():
    sch = pa.schema(
        [
            pa.field("a", pa.date32()),
            pa.field("b", pa.decimal128(10, 2)),
            pa.field("c", pa.list_(pa.float32())),
            pa.field("d", pa.int16()),
        ]
    )
    assert schema_from_ipc(schema_to_ipc(sch)).equals(sch)


def test_parse_type_string_raises_on_lossy():
    assert parse_type_string("int32") == pa.int32()
    with pytest.raises(RuntimeError, match="not losslessly parseable"):
        parse_type_string("list<item: float>")


def test_evolved_exotic_column_type_survives_two_applies(tmp_path):
    """ADVICE scenario: an additive int16 column must keep its type
    across a second apply (legacy stringified schema would degrade it
    to string)."""
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    files = gen_changes(
        changes, n_events=1000, n_convs=20, n_files=4, seed=21, duplicate_ratio=0.0
    )

    def widen(path):
        t = pq.read_table(path)
        t = t.append_column(
            "score16", pa.array(list(range(len(t))), pa.int16())
        )
        pq.write_table(t, path)

    for p in files[2:]:
        widen(p)
    spec = engine.default_spec(num_partitions=2)
    engine.apply_changes(files[:3], lake, spec)
    store = ManifestStore(lake)
    m1 = store.load()
    assert manifest_payload_schema(m1).field("score16").type == pa.int16()
    engine.apply_changes(changes, lake, spec)
    m2 = store.load()
    assert manifest_payload_schema(m2).field("score16").type == pa.int16()
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import read_table

    tbl = pa.concat_tables(
        list(read_table(lake).iter_batches(batch_format="pyarrow", batch_size=4096))
    )
    assert tbl.schema.field("score16").type == pa.int16()


# ---------------------------------------------------------------------------
# DQ: merge key + notify hook
# ---------------------------------------------------------------------------


def test_dq_multi_run_uses_partition_key_not_unique_rule(tmp_path):
    """With delta-append runs present and a dq.unique rule NARROWER
    than the merge key, the pre-check reduce must use the manifest's
    key_cols: reducing by the unique rule would collapse the very
    duplicates the gate counts (vacuously passing) and corrupt
    row_count."""
    import glob as g

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dq import run_dq
    from aws_serverless_elt_pipeline_enterprise_ray.schema import DQRules

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=4000, n_convs=30, n_files=6, seed=31)
    files = sorted(g.glob(os.path.join(changes, "*.parquet")))
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(files[:-2], lake, spec)
    # force delta-append runs for the tail
    engine.apply_changes(
        changes, lake, spec, commit_every_files=1, delta_threshold=0.95
    )
    # conv_id alone is NOT unique (many turns per conv): the gate must
    # report duplicates for it instead of merging them away
    narrow = engine.default_spec(
        num_partitions=4,
        dq=DQRules(unique=(("conv_id",),), not_null=("conv_id",), ranges={}),
    )
    report = run_dq(lake, narrow)
    assert report["checks"]["unique"]["dup_keys"] > 0
    # and with the true key the lake is clean
    report2 = run_dq(lake, engine.default_spec(num_partitions=4))
    assert report2["ok"], report2


def test_dq_gate_on_fail_hook(tmp_path):
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dq import dq_gate
    from aws_serverless_elt_pipeline_enterprise_ray.schema import DQRules

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=500, n_convs=10, n_files=1, seed=41)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=2))
    seen = []
    bad_spec = engine.default_spec(
        num_partitions=2, dq=DQRules(ranges={"turn_idx": (0, 1)})
    )
    report = dq_gate(lake, bad_spec, on_fail=seen.append)
    assert not report["ok"]
    assert seen and seen[0]["version"] == report["version"]
    # a raising hook is swallowed
    ManifestStore(lake)  # lake demoted to empty; re-apply for a clean gate
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=2))

    def boom(_):
        raise RuntimeError("notifier down")

    report2 = dq_gate(lake, bad_spec, on_fail=boom)
    assert not report2["ok"]


# ---------------------------------------------------------------------------
# multi-record-type routing
# ---------------------------------------------------------------------------


def _mixed_changelog(tmp_path, n_files=4, seed=51):
    """gen_changes output with a record_type column derived from
    conv_id parity, plus a few unroutable rows."""
    changes = str(tmp_path / "mixed")
    files = gen_changes(changes, n_events=3000, n_convs=40, n_files=n_files, seed=seed)
    import pyarrow.compute as pc

    for p in files:
        t = pq.read_table(p)
        parity = [
            "shipments" if int(c.rsplit("_", 1)[1]) % 2 == 0 else "tracking"
            for c in t["conv_id"].to_pylist()
        ]
        # poison a couple of rows with an unregistered type
        for i in range(0, len(parity), 997):
            parity[i] = "weird"
        t = t.append_column("record_type", pa.array(parity, pa.string()))
        pq.write_table(t, p)
    return changes


def test_route_and_apply_splits_types_and_checkpoints(tmp_path):
    from aws_serverless_elt_pipeline_enterprise_ray.gen import oracle_final_state
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import read_table
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.route import route_and_apply

    changes = _mixed_changelog(tmp_path)
    lake_root = str(tmp_path / "root")
    specs = {
        "shipments": engine.default_spec(name="shipments", num_partitions=4),
        "tracking": engine.default_spec(name="tracking", num_partitions=4),
    }
    res = route_and_apply(changes, lake_root, specs)
    assert res["staged"]["shipments"] > 0 and res["staged"]["tracking"] > 0
    assert res["staged"].get("_unknown", 0) > 0  # unroutable rows quarantined
    assert res["manifests"]["shipments"] and res["manifests"]["tracking"]
    # each per-type lake equals the LWW oracle over ITS staged changelog
    for name in specs:
        staged = os.path.join(lake_root, "_staged", name)
        oracle = oracle_final_state(staged).to_pandas()
        got = read_table(os.path.join(lake_root, name)).to_pandas()
        oracle = oracle.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        import pandas.testing as pdt

        pdt.assert_frame_equal(got[oracle.columns.tolist()], oracle, check_dtype=False)
    # idempotent re-run: nothing staged, no new versions
    v1 = ManifestStore(os.path.join(lake_root, "shipments")).current_version()
    res2 = route_and_apply(changes, lake_root, specs)
    assert res2["pending_files"] == 0 and res2["staged"] == {}
    assert not res2["manifests"]["shipments"]
    assert ManifestStore(os.path.join(lake_root, "shipments")).current_version() == v1


# ---------------------------------------------------------------------------
# rebalance migration
# ---------------------------------------------------------------------------


def test_rebalance_migrates_partitioning_and_preserves_state(tmp_path):
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.rebalance import rebalance

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=4000, n_convs=30, n_files=6, seed=61)
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    spec = engine.default_spec(num_partitions=8)
    engine.apply_changes(files[:3], lake, spec)
    store = ManifestStore(lake)
    assert store.load().partitioning["num_partitions"] == 8
    m = rebalance(lake, num_partitions=32, hot_keys=("conv_000003",), hot_key_salt=4)
    assert m.partitioning["num_partitions"] == 32
    assert m.partitioning["hot_keys"] == ["conv_000003"]
    # post-migration applies route by the NEW partitioning and still
    # converge (deletes/out-of-order included in the generated stream)
    engine.apply_changes(changes, lake, spec)
    assert store.load().partitioning["num_partitions"] == 32
    assert_matches_oracle(lake, changes)
    # the hot conversation's rows are spread across its salt sub-partitions
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import (
        read_conversations,
    )

    hot_rows = read_conversations(lake, ["conv_000003"]).to_pandas()
    assert len(hot_rows) > 0


def test_rebalance_requires_commit(tmp_path):
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.rebalance import rebalance

    with pytest.raises(RuntimeError, match="nothing committed"):
        rebalance(str(tmp_path / "empty-lake"), num_partitions=4)


# ---------------------------------------------------------------------------
# duckdb catalog view
# ---------------------------------------------------------------------------


def test_catalog_view_matches_engine_read(tmp_path):
    from aws_serverless_elt_pipeline_enterprise_ray.catalog import register_duckdb_view
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import read_table

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=3000, n_convs=30, n_files=6, seed=71)
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(files[:-2], lake, spec)
    # delta-append runs so the view's merge-on-read matters
    engine.apply_changes(changes, lake, spec, commit_every_files=1, delta_threshold=0.95)
    con = register_duckdb_view(lake, view_name="t")
    via_sql = con.execute(
        "SELECT conv_id, turn_idx, role, text, tool, ts FROM t ORDER BY conv_id, turn_idx"
    ).df().reset_index(drop=True)
    con.close()
    via_engine = (
        read_table(lake).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(
        via_sql, via_engine[via_sql.columns.tolist()], check_dtype=False
    )


# ---------------------------------------------------------------------------
# tombstone GC: observed-lateness watermark
# ---------------------------------------------------------------------------


def _write_change_file(path, rows):
    """rows: list of (op, seq, conv_id, turn_idx, ts_us)."""
    import pyarrow as pa

    tbl = pa.table(
        {
            "op": pa.array([r[0] for r in rows], pa.string()),
            "seq": pa.array([r[1] for r in rows], pa.int64()),
            "conv_id": pa.array([r[2] for r in rows], pa.string()),
            "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "tool": pa.nulls(len(rows), pa.string()),
            "ts": pa.array([r[4] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, path)


def test_auto_tombstone_purge_uses_observed_lateness(tmp_path):
    """The manifest tracks max event ts + max CROSS-commit lateness;
    compact(purge_tombstones_auto=True) purges only tombstones below
    max_ts - max(2*lateness, floor)."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import read_table
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    os.makedirs(changes)
    HOUR = 3_600_000_000
    T0 = 1_700_000_000_000_000  # base us epoch
    # commit 1: two inserts then deletes - one tombstone far in the
    # past (T0-10h), one recent (T0-1h); max event ts T0
    _write_change_file(
        os.path.join(changes, "changes-000000.parquet"),
        [
            ("I", 1, "a", 0, T0 - 11 * HOUR),
            ("D", 2, "a", 0, T0 - 10 * HOUR),
            ("I", 3, "b", 0, T0 - 2 * HOUR),
            ("D", 4, "b", 0, T0 - 1 * HOUR),
            ("I", 5, "c", 0, T0),
        ],
    )
    spec = engine.default_spec(num_partitions=2)
    engine.apply_changes(changes, lake, spec)
    store = ManifestStore(lake)
    m1 = store.load()
    assert m1.max_event_ts_us == T0
    assert m1.max_lateness_us == 0  # within-commit disorder doesn't count
    # commit 2: an event arriving 2h later than the observed max
    _write_change_file(
        os.path.join(changes, "changes-000001.parquet"),
        [("I", 6, "d", 0, T0 - 2 * HOUR)],
    )
    engine.apply_changes(changes, lake, spec)
    m2 = store.load()
    assert m2.max_event_ts_us == T0
    assert m2.max_lateness_us == 2 * HOUR
    # auto purge: horizon = T0 - max(2 * 2h, 1h) = T0 - 4h
    cm = compact(lake, spec, purge_tombstones_auto=True)
    tbl = pa.concat_tables(
        list(
            read_table(lake, include_internal=True, keep_tombstones=True)
            .iter_batches(batch_format="pyarrow", batch_size=4096)
        )
    )
    tombs = tbl.filter(tbl["_deleted"]).to_pylist()
    convs = {t["conv_id"] for t in tombs}
    assert "a" not in convs, "old tombstone (T0-10h) should be purged"
    assert "b" in convs, "recent tombstone (T0-1h) must survive the horizon"
    assert cm.max_event_ts_us == T0 and cm.max_lateness_us == 2 * HOUR


def test_forget_keys_deletes_and_prunes_partitions(tmp_path):
    """Targeted deletion: forget two conversations; their rows vanish,
    everything else is untouched, only the keys' partitions were read,
    and a second forget is a no-op."""
    import duckdb

    from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import (
        conv_partitions,
        read_table,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.forget import (
        forget_keys,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
        ManifestStore,
    )

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=4000, n_convs=50, n_files=3, seed=55)
    spec = engine.default_spec(num_partitions=16)
    engine.apply_changes(changes, lake, spec)

    before = read_table(lake).to_pandas()
    victims = sorted(before["conv_id"].unique())[:2]
    m = ManifestStore(lake).load()
    pids = conv_partitions(m, victims)
    assert 0 < len(pids) < 16  # pruned read, not a scan

    ms = forget_keys(lake, victims, spec)
    assert ms, "forget should commit"
    after = read_table(lake).to_pandas()
    assert not set(victims) & set(after["conv_id"])
    kept = before[~before["conv_id"].isin(victims)]
    a = after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    k = kept.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, k[a.columns.tolist()])
    # idempotent: nothing left to forget
    assert forget_keys(lake, victims, spec) == []


def test_changefeed_replays_a_to_b(tmp_path):
    """CDF invariant: applying the emitted change feed to snapshot A
    reproduces snapshot B exactly (upserts replace, deletes remove)."""
    import glob

    import pandas as pd

    from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import read_table
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdf import (
        table_changes,
    )

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=3000, n_convs=40, n_files=4, seed=77,
                delete_ratio=0.15, out_of_order=0.3)
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    spec = engine.default_spec(num_partitions=8)
    m1 = engine.apply_changes(files[:2], lake, spec)[-1]
    m2 = engine.apply_changes(changes, lake, spec)[-1]

    a = read_table(lake, version=m1.version).to_pandas()
    b = read_table(lake, version=m2.version).to_pandas()
    feed = table_changes(lake, m1.version, m2.version).to_pandas()
    assert set(feed["change_op"]) <= {"U", "D"}

    key = ["conv_id", "turn_idx"]
    ups = feed[feed["change_op"] == "U"].drop(columns=["change_op"])
    dels = feed[feed["change_op"] == "D"][key]
    replayed = a.merge(dels.assign(_d=1), on=key, how="left")
    replayed = replayed[replayed["_d"].isna()].drop(columns=["_d"])
    replayed = replayed.merge(ups[key].assign(_u=1), on=key, how="left")
    replayed = replayed[replayed["_u"].isna()].drop(columns=["_u"])
    replayed = pd.concat([replayed, ups[a.columns.tolist()]], ignore_index=True)

    r = replayed.sort_values(key).reset_index(drop=True)
    bb = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        r.astype({"ts": "datetime64[us]"}), bb[r.columns.tolist()].astype({"ts": "datetime64[us]"})
    )


def test_changefeed_empty_across_compaction_and_follow_loop(tmp_path):
    """Physical rewrites are not changes: a compaction-only version
    diff emits zero rows. follow_changes delivers each commit once and
    advances its checkpoint only after the callback."""
    import glob
    import json

    from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdf import (
        follow_changes,
        table_changes,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact
    from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
        ManifestStore,
    )

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=2000, n_convs=30, n_files=4, seed=91)
    files = sorted(glob.glob(os.path.join(changes, "*.parquet")))
    spec = engine.default_spec(num_partitions=4)
    # LSM-ish: several commits so partitions hold multiple runs
    engine.apply_changes(files[:2], lake, spec)
    engine.apply_changes(changes, lake, spec,
                         commit_every_files=1, delta_threshold=0.95)
    store = ManifestStore(lake)
    v_before = store.current_version()
    m = compact(lake, spec)
    assert m is not None and m.version > v_before
    feed = table_changes(lake, v_before, m.version).to_pandas()
    assert len(feed) == 0, feed.head()

    # subscriber: sees exactly the new commits after its checkpoint
    seen = []
    gen_changes(changes + "2", n_events=300, n_convs=30, n_files=1, seed=93)
    engine.apply_changes(changes + "2", lake, spec)
    stats = follow_changes(
        lake,
        checkpoint_path=str(tmp_path / "ckpt.json"),
        on_changes=lambda a, b, ds: seen.append((a, b, ds.count())),
        poll_seconds=0.05,
        max_idle_rounds=2,
    )
    # fresh checkpoint initializes at CURRENT -> no redelivery of history
    assert stats["batches"] == 0 and seen == []
    gen_changes(changes + "3", n_events=300, n_convs=30, n_files=1, seed=95)
    engine.apply_changes(changes + "3", lake, spec)
    stats2 = follow_changes(
        lake,
        checkpoint_path=str(tmp_path / "ckpt.json"),
        on_changes=lambda a, b, ds: seen.append((a, b, ds.count())),
        poll_seconds=0.05,
        max_idle_rounds=2,
    )
    assert stats2["batches"] == 1 and len(seen) == 1
    assert seen[0][2] > 0
    ck = json.load(open(tmp_path / "ckpt.json"))
    assert ck["version"] == stats2["to_version"]


def test_changefeed_initial_snapshot_from_version_zero(tmp_path):
    """from_version=0 is the empty snapshot: the feed is every visible
    row as an upsert - the bootstrap path for a new subscriber."""
    from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import read_table
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdf import (
        table_changes,
    )

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=1000, n_convs=20, n_files=2, seed=13)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=4))
    feed = table_changes(lake, 0).to_pandas()
    table = read_table(lake).to_pandas()
    assert set(feed["change_op"]) == {"U"}
    assert len(feed) == len(table)


def test_compact_drop_columns_migration(tmp_path):
    """Schema-narrowing migration: the column vanishes from the
    manifest schema and every read; key/order columns are refused;
    a later change file still carrying the column re-adds it
    additively."""
    import pandas as pd
    import pytest as _pytest

    changes = str(tmp_path / "ch")
    lake = str(tmp_path / "lake")
    gen_changes(changes, n_events=2000, n_convs=30, n_files=2, seed=43,
                evolve_after_file=1, duplicate_ratio=0.0)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(changes, lake, spec)
    before = engine.read_table(lake).to_pandas()
    assert "tool_call_id" in before.columns

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact

    with _pytest.raises(ValueError):
        compact(lake, spec, drop_columns=["conv_id"])

    m = compact(lake, spec, drop_columns=["tool_call_id"])
    assert m is not None
    after = engine.read_table(lake).to_pandas()
    assert "tool_call_id" not in after.columns
    key = lambda df: df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        key(after), key(before.drop(columns=["tool_call_id"]))
    )

    # a future change batch carrying the column re-adds it additively
    engine.apply_dataset(
        pd.DataFrame(
            [{
                "op": "I", "seq": 99_999, "conv_id": "conv_readd",
                "turn_idx": 0, "role": "user", "text": "x", "tool": None,
                "ts": pd.Timestamp("2027-01-01"), "tool_call_id": "tc1",
            }]
        ),
        lake, spec, label="readd",
    )
    re_read = engine.read_table(lake).to_pandas()
    assert "tool_call_id" in re_read.columns
    assert re_read[re_read["conv_id"] == "conv_readd"]["tool_call_id"].iloc[0] == "tc1"


def test_expire_rows_retention(tmp_path):
    """Bulk retention: rows at or before the cutoff disappear, newer
    rows survive, replaying the expiry is a no-op on visible state."""
    import pandas as pd

    lake = str(tmp_path / "lake")
    spec = engine.default_spec(num_partitions=4)
    rows = []
    for i in range(40):
        rows.append(
            {
                "op": "I", "seq": i, "conv_id": f"c{i % 8}", "turn_idx": i // 8,
                "role": "user", "text": f"t{i}", "tool": None,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(days=i),
            }
        )
    engine.apply_dataset(pd.DataFrame(rows), lake, spec, label="seed")

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.forget import (
        expire_rows,
    )

    cutoff = pd.Timestamp("2026-01-01") + pd.Timedelta(days=19)
    ms = expire_rows(lake, cutoff, spec)
    assert ms
    after = engine.read_table(lake).to_pandas()
    assert len(after) == 20
    assert (after["ts"] > cutoff).all()
    # second expiry with the same cutoff finds nothing
    assert expire_rows(lake, cutoff, spec) == []


def test_clone_lake_branches_without_copy(tmp_path):
    """Hard-link clone: same visible state, shared inodes, independent
    evolution on both sides, idempotent changelog carry-over, and gc on
    the diverged source never breaks the clone."""
    import pandas as pd

    changes = str(tmp_path / "ch")
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    gen_changes(changes, n_events=2000, n_convs=30, n_files=2, seed=61)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(changes, src, spec)

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.clone import (
        clone_lake,
    )

    m = clone_lake(src, dst)
    assert m.version == 1 and m.metrics["files_linked"] > 0

    key = lambda df: df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    a = key(engine.read_table(src).to_pandas())
    b = key(engine.read_table(dst).to_pandas())
    pd.testing.assert_frame_equal(a, b)

    # shared inode (zero-copy), not a byte copy
    f = m.partitions[next(iter(m.partitions))][0]["path"]
    assert os.stat(os.path.join(dst, f)).st_nlink >= 2

    # the source's original changelog is already applied on the clone
    assert engine.apply_changes(changes, dst, spec) == []

    # divergence: new data lands only where applied
    engine.apply_dataset(
        pd.DataFrame([{
            "op": "I", "seq": 50_000, "conv_id": "branch_only", "turn_idx": 0,
            "role": "user", "text": "clone", "tool": None,
            "ts": pd.Timestamp("2027-01-01"),
        }]),
        dst, spec, label="branch",
    )
    assert "branch_only" in set(engine.read_table(dst).to_pandas()["conv_id"])
    assert "branch_only" not in set(engine.read_table(src).to_pandas()["conv_id"])

    # source rewrites (compact) + gc: clone still reads its snapshot
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact

    compact(src, spec)
    ManifestStore(src).gc(keep_versions=1, min_age_seconds=0)
    dstdf = key(engine.read_table(dst).to_pandas())
    assert "branch_only" in set(dstdf["conv_id"]) and len(dstdf) == len(a) + 1


def test_gc_sweeps_applied_staging_files(tmp_path):
    """Staged changelogs (_ingest/_staged) whose files the CURRENT
    manifest covers are debris once the age gate passes; gc removes
    them and leaves un-applied staging alone."""
    import pandas as pd

    lake = str(tmp_path / "lake")
    spec = engine.default_spec(num_partitions=2)
    engine.apply_dataset(
        pd.DataFrame([{
            "op": "I", "seq": 1, "conv_id": "c1", "turn_idx": 0,
            "role": "user", "text": "x", "tool": None,
            "ts": pd.Timestamp("2026-01-01"),
        }]),
        lake, spec, label="b1",
    )
    staged = glob.glob(os.path.join(lake, "_ingest", "b1", "*.parquet"))
    assert staged

    # an un-applied staged dir must survive
    other = os.path.join(lake, "_ingest", "pending", "later.parquet")
    os.makedirs(os.path.dirname(other))
    pd.DataFrame([{
        "op": "I", "seq": 2, "conv_id": "c2", "turn_idx": 0,
        "role": "user", "text": "y", "tool": None,
        "ts": pd.Timestamp("2026-01-02"),
    }]).to_parquet(other)

    removed = ManifestStore(lake).gc(min_age_seconds=0)
    assert any("_ingest" in r for r in removed)
    assert not glob.glob(os.path.join(lake, "_ingest", "b1", "*"))
    assert os.path.exists(other)  # not applied -> kept
    # replaying the same label after the sweep is still a no-op
    assert engine.apply_dataset(
        pd.DataFrame([{
            "op": "I", "seq": 1, "conv_id": "c1", "turn_idx": 0,
            "role": "user", "text": "x", "tool": None,
            "ts": pd.Timestamp("2026-01-01"),
        }]),
        lake, spec, label="b1",
    ) == []


# ---------------------------------------------------------------------------
# co-partitioned (storage-partitioned) join
# ---------------------------------------------------------------------------


def _two_lakes(tmp_path, p_b=4):
    """Two lakes over overlapping conv populations, same partitioning
    unless p_b differs."""
    ch_a, lake_a = str(tmp_path / "cha"), str(tmp_path / "la")
    ch_b, lake_b = str(tmp_path / "chb"), str(tmp_path / "lb")
    gen_changes(ch_a, n_events=3000, n_convs=50, n_files=3, seed=21)
    gen_changes(ch_b, n_events=800, n_convs=30, n_files=2, seed=22)
    engine.apply_changes(ch_a, lake_a, engine.default_spec(num_partitions=4))
    engine.apply_changes(ch_b, lake_b, engine.default_spec(num_partitions=p_b))
    return lake_a, lake_b


def test_copartitioned_join_matches_hash_join(tmp_path):
    import pandas as pd

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cojoin import (
        copartitioned_join,
    )

    lake_a, lake_b = _two_lakes(tmp_path)
    got = (
        copartitioned_join(lake_a, lake_b, on=["conv_id", "turn_idx"],
                           how="inner")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    a = engine.read_table(lake_a).to_pandas()
    b = engine.read_table(lake_b).to_pandas()
    want = (
        a.merge(b, on=["conv_id", "turn_idx"], suffixes=("", "_b"))
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )

    # left join keeps every A row; B payload is nullable everywhere
    left = (
        copartitioned_join(lake_a, lake_b, on=["conv_id", "turn_idx"],
                           how="left")
        .to_pandas()
    )
    assert len(left) == len(a)
    assert str(left["role_b"].dtype) in ("object", "string")
    assert left["role_b"].isna().sum() == len(a) - len(want)


def test_copartitioned_join_guards(tmp_path):
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cojoin import (
        copartitioned_join,
    )

    lake_a, lake_b = _two_lakes(tmp_path, p_b=8)
    with pytest.raises(ValueError, match="partition counts differ"):
        copartitioned_join(lake_a, lake_b, on=["conv_id"])
    with pytest.raises(ValueError, match="must start with"):
        copartitioned_join(lake_a, lake_a, on=["turn_idx"])


def test_publish_branch_write_audit_publish(tmp_path):
    """WAP: branch main -> apply new changes + DQ on the branch ->
    publish -> main shows the branch state atomically; the absorbed
    changelog stays a no-op on main; a stale branch refuses."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.clone import (
        clone_lake,
        publish_branch,
    )

    main, branch = str(tmp_path / "main"), str(tmp_path / "branch")
    ch1, ch2 = str(tmp_path / "ch1"), str(tmp_path / "ch2")
    gen_changes(ch1, n_events=1500, n_convs=30, n_files=2, seed=31)
    gen_changes(ch2, n_events=800, n_convs=30, n_files=1, seed=32)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(ch1, main, spec)

    clone_lake(main, branch)
    engine.apply_changes(ch2, branch, spec)
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dq import run_dq

    report = run_dq(branch)
    assert report["ok"]

    before = engine.read_table(main).to_pandas()
    m = publish_branch(branch, main)
    assert m.version == 2 and m.metrics["published_from_version"] >= 2
    after = (
        engine.read_table(main)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        engine.read_table(branch)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(after) != len(before) or not after.equals(before)
    assert after.equals(want)
    # the branch-absorbed changelog is a no-op on main now
    assert engine.apply_changes(ch2, main, spec) == []
    # stale branch: main advanced past the clone point -> refuse
    branch2 = str(tmp_path / "branch2")
    clone_lake(main, branch2)
    ch3 = str(tmp_path / "ch3")
    gen_changes(ch3, n_events=300, n_convs=10, n_files=1, seed=33)
    engine.apply_changes(ch3, main, spec)  # main moves on
    with pytest.raises(RuntimeError, match="advanced"):
        publish_branch(branch2, main)
    # unrelated lake: no lineage -> refuse
    with pytest.raises(ValueError, match="not branched"):
        publish_branch(main, branch)
