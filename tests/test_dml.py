"""Row-level DML (``pipelines/dml.py``): DELETE WHERE / UPDATE WHERE /
MERGE INTO semantics against a DuckDB mirror of the same statement."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray import apply_changes, default_spec, read_table
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes, oracle_final_state
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml import (
    delete_where,
    merge_into,
    update_where,
)

SPEC = default_spec(num_partitions=8)


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    root = tmp_path_factory.mktemp("dml")
    changes = str(root / "changes")
    gen_changes(changes, n_events=4000, n_convs=60, n_files=4, seed=71)
    final = oracle_final_state(changes).to_pandas()
    return root, changes, final


def _fresh_lake(root, changes, name):
    lake = str(root / name)
    apply_changes(changes, lake, SPEC)
    return lake


def _state(lake):
    df = read_table(lake).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _canon(df):
    return (
        df.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .reindex(columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    )


def test_delete_where_matches_sql(base):
    root, changes, final = base
    lake = _fresh_lake(root, changes, "del")
    ms = delete_where(
        lake, [("role", "==", "assistant"), ("turn_idx", "between", (5, 20))], SPEC
    )
    assert ms, "matched rows must commit a new version"
    want = final[
        ~(
            (final["role"] == "assistant")
            & final["turn_idx"].between(5, 20)
        )
    ]
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(want))


def test_delete_where_no_match_is_noop(base):
    root, changes, final = base
    lake = _fresh_lake(root, changes, "delnoop")
    from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

    v0 = ManifestStore(lake).load().version
    assert delete_where(lake, [("turn_idx", ">", 10_000)], SPEC) == []
    assert ManifestStore(lake).load().version == v0
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(final))


def test_delete_where_null_pred_col_never_matches(base):
    root, changes, final = base
    lake = _fresh_lake(root, changes, "delnull")
    # tool is null on most generator rows: != 'x' is NULL there ->
    # SQL semantics, null rows never match and survive the delete
    delete_where(lake, [("tool", "!=", "x")], SPEC)
    want = final[~(final["tool"].notna() & (final["tool"] != "x"))]
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(want))


def test_update_where_matches_sql_and_keeps_ts(base):
    root, changes, final = base
    lake = _fresh_lake(root, changes, "upd")
    ms = update_where(
        lake,
        [("turn_idx", "<", 7)],
        {
            "text": lambda b: pc.binary_join_element_wise(
                pa.scalar("X:"), b["text"], ""
            ),
            "role": "edited",
        },
        SPEC,
    )
    assert ms
    want = final.copy()
    hit = want["turn_idx"] < 7
    want.loc[hit, "text"] = "X:" + want.loc[hit, "text"]  # NaN propagates
    want.loc[hit, "role"] = "edited"
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(want))


def test_update_where_rejects_key_and_ts_assignment(base):
    root, changes, _ = base
    lake = _fresh_lake(root, changes, "updbad")
    with pytest.raises(ValueError):
        update_where(lake, [("turn_idx", "<", 7)], {"conv_id": "x"}, SPEC)
    with pytest.raises(ValueError):
        update_where(lake, [("turn_idx", "<", 7)], {"ts": None}, SPEC)
    with pytest.raises(KeyError):
        update_where(lake, [("turn_idx", "<", 7)], {"nope": 1}, SPEC)


def test_merge_into_update_and_insert(base):
    root, changes, final = base
    lake = _fresh_lake(root, changes, "merge")
    upd = final.head(25).copy()
    upd["text"] = "S:" + upd["text"].fillna("")
    # stale source ts: unconditional update must still win and the
    # surviving row must keep the COMMITTED ts
    upd["ts"] = upd["ts"] - pd.Timedelta(days=1)
    ins = final.head(25).copy()
    ins["turn_idx"] = (ins["turn_idx"] + 1000).astype(ins["turn_idx"].dtype)
    ins["text"] = "N:" + ins["text"].fillna("")
    src = pd.concat([upd, ins], ignore_index=True)
    ms = merge_into(lake, rd.from_pandas(src), SPEC)
    assert ms

    want_upd = upd.copy()
    want_upd["ts"] = final.head(25)["ts"].values  # committed ts survives
    keymask = final.set_index(["conv_id", "turn_idx"]).index.isin(
        want_upd.set_index(["conv_id", "turn_idx"]).index
    )
    want = pd.concat([final[~keymask], want_upd, ins], ignore_index=True)
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(want))


def test_merge_into_update_if_newer_is_conditional(base):
    root, changes, final = base
    lake = _fresh_lake(root, changes, "mergeifn")
    stale = final.head(10).copy()
    stale["text"] = "STALE"
    stale["ts"] = stale["ts"] - pd.Timedelta(days=1)
    newer = final.iloc[10:20].copy()
    newer["text"] = "NEWER"
    newer["ts"] = newer["ts"] + pd.Timedelta(days=1)
    src = pd.concat([stale, newer], ignore_index=True)
    ms = merge_into(
        lake, rd.from_pandas(src), SPEC,
        when_matched="update_if_newer", when_not_matched="ignore",
    )
    assert ms
    got = _state(lake)
    k = got.set_index(["conv_id", "turn_idx"])
    for _, r in stale.iterrows():
        row = k.loc[(r["conv_id"], r["turn_idx"])]
        assert row["text"] != "STALE"  # stale source lost LWW
    for _, r in newer.iterrows():
        row = k.loc[(r["conv_id"], r["turn_idx"])]
        assert row["text"] == "NEWER"
        assert row["ts"] == r["ts"]  # source ts carried


def test_merge_into_delete_clause(base):
    root, changes, final = base
    lake = _fresh_lake(root, changes, "mergedel")
    victims = final.head(15).copy()
    src = victims
    ms = merge_into(
        lake, rd.from_pandas(src), SPEC,
        when_matched="delete", when_not_matched="ignore",
    )
    assert ms
    keymask = final.set_index(["conv_id", "turn_idx"]).index.isin(
        victims.set_index(["conv_id", "turn_idx"]).index
    )
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(final[~keymask]))


def test_dml_is_time_travelable(base):
    """DML rides the ordinary commit path: the pre-DML version is still
    readable and the version chain is gapless."""
    root, changes, final = base
    lake = _fresh_lake(root, changes, "ttravel")
    from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

    v0 = ManifestStore(lake).load().version
    delete_where(lake, [("turn_idx", ">=", 30)], SPEC)
    v1 = ManifestStore(lake).load().version
    assert v1 == v0 + 1
    before = read_table(lake, version=v0).to_pandas()
    pd.testing.assert_frame_equal(_canon(before), _canon(final))


def test_duckdb_mirror_end_to_end(base):
    """The composed statement (delete + update) equals DuckDB running
    the same DML on the same starting state."""
    root, changes, final = base
    lake = _fresh_lake(root, changes, "mirror")
    delete_where(lake, [("turn_idx", "in", [2, 3, 5])], SPEC)
    update_where(
        lake, [("role", "==", "user")],
        {"text": lambda b: pc.binary_join_element_wise(pa.scalar("U:"), b["text"], "")},
        SPEC,
    )
    con = duckdb.connect()
    con.register("final", final)
    want = con.execute(
        """
        WITH afterdel AS (
          SELECT * FROM final WHERE turn_idx NOT IN (2, 3, 5)
        )
        SELECT conv_id, turn_idx,
               CASE WHEN role = 'user' THEN role ELSE role END AS role,
               CASE WHEN role = 'user' THEN 'U:' || text ELSE text END AS text,
               tool, ts
        FROM afterdel
        ORDER BY conv_id, turn_idx
        """
    ).df()
    con.close()
    got = _canon(_state(lake))
    want = _canon(want)
    pd.testing.assert_frame_equal(got, want)


def test_row_provenance_tracks_dml_writes(base):
    """wrote_version: baseline rows carry v1; a predicate UPDATE bumps
    exactly the touched rows to v2 (seq-order landing -> exact)."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.stats import row_provenance

    root, changes, final = base
    lake = _fresh_lake(root, changes, "prov")
    df0 = row_provenance(lake).to_pandas()
    assert (df0["wrote_version"] == 1).all()

    update_where(lake, [("turn_idx", "==", 4)], {"role": "touched"}, SPEC)
    df1 = row_provenance(lake).to_pandas()
    hit = df1["turn_idx"] == 4
    assert (df1.loc[hit, "wrote_version"] == 2).all()
    assert (df1.loc[~hit, "wrote_version"] == 1).all()
    # time travel back to v1: provenance capped at the traveled version
    dfv1 = row_provenance(lake, version=1).to_pandas()
    assert (dfv1["wrote_version"] == 1).all()


def test_dml_feeds_cdf_and_matview(base):
    """Composition: DML writes flow through the change data feed — an
    incrementally refreshed rollup after DELETE/UPDATE/MERGE equals the
    from-scratch recompute (the matview never saw the statements, only
    the versions they committed)."""
    from tests.test_matview import _assert_synced
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.matview import refresh_rollup

    root, changes, final = base
    lake = _fresh_lake(root, changes, "mvdml")
    rollup = str(root / "mvdml_rollup")
    refresh_rollup(lake, rollup, num_partitions=4)

    delete_where(lake, [("turn_idx", ">=", 25)], SPEC)
    refresh_rollup(lake, rollup)
    _assert_synced(lake, rollup)

    update_where(lake, [("role", "==", "user")], {"role": "USER"}, SPEC)
    src = final.head(12).copy()
    src["turn_idx"] = (src["turn_idx"] + 500).astype(src["turn_idx"].dtype)
    merge_into(lake, rd.from_pandas(src), SPEC)
    refresh_rollup(lake, rollup)  # one refresh folds BOTH versions
    _assert_synced(lake, rollup)


def test_concurrent_dml_statements_serialize(base, monkeypatch):
    """Two DML statements race: both synthesize from the SAME snapshot
    (a barrier inside the gated apply guarantees the overlap), one
    loses the commit and must re-synthesize from the winner's state —
    the final table equals the serial execution, never the interleaved
    anomaly (a stale replay would let the loser's (ts, seq)=(committed
    ts, wm+1) events tie the winner's rows and resurrect/overwrite by
    sort luck)."""
    import threading

    import aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml as dml

    root, changes, final = base
    lake = _fresh_lake(root, changes, "race")

    bar = threading.Barrier(2, timeout=120)
    tl = threading.local()
    real_apply = dml.apply_changes

    def gated(*a, **kw):
        if not getattr(tl, "waited", False):
            tl.waited = True
            bar.wait()  # both statements synthesized from v1 by now
        return real_apply(*a, **kw)

    monkeypatch.setattr(dml, "apply_changes", gated)

    errs = []

    def upd():
        try:
            update_where(lake, [("role", "==", "user")], {"role": "A"}, SPEC)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def dele():
        try:
            delete_where(lake, [("turn_idx", ">=", 20)], SPEC)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ta, tb = threading.Thread(target=upd), threading.Thread(target=dele)
    ta.start(); tb.start(); ta.join(120); tb.join(120)
    assert not errs, errs

    # both serial orders produce the same state here; the interleaved
    # anomaly (surviving turn>=20 rows, or un-updated user rows) differs
    want = final[final["turn_idx"] < 20].copy()
    want.loc[want["role"] == "user", "role"] = "A"
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(want))

    from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

    hist = ManifestStore(lake).history()
    assert [h["version"] for h in hist] == [1, 2, 3]  # gapless, both landed


def test_dml_snapshot_fence_forces_resynthesis(base, monkeypatch):
    """The stale-window anomaly, deterministically: a concurrent writer
    commits BETWEEN a statement's synthesis and its apply (no physical
    commit race, so only the snapshot-validation fence can catch it).
    The statement must re-synthesize from the fresh version — without
    the fence its stale events (ts, seq)=(committed ts, old wm+1) would
    tie the winner's rows and survive by sort luck."""
    import aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml as dml

    root, changes, final = base
    lake = _fresh_lake(root, changes, "fence")

    real_apply = dml.apply_changes
    calls = {"n": 0}

    def gated(files, lake_dir, spec, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # interleaved writer: commits v2 after the delete synthesized
            # from v1 but before its apply
            monkeypatch.setattr(dml, "apply_changes", real_apply)
            update_where(lake, [("role", "==", "user")], {"role": "A"}, SPEC)
            monkeypatch.setattr(dml, "apply_changes", gated)
        return real_apply(files, lake_dir, spec, **kw)

    monkeypatch.setattr(dml, "apply_changes", gated)
    delete_where(lake, [("turn_idx", ">=", 20)], SPEC)

    assert calls["n"] == 2, "stale apply must be fenced and retried once"
    want = final[final["turn_idx"] < 20].copy()
    want.loc[want["role"] == "user", "role"] = "A"
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(want))


def test_dml_on_object_store_scheme(base, tmp_path):
    """The whole DML path on an object-scheme lake (``s3sim://``):
    worker-side staging shards land by atomic PUT, the statement
    commits through the exclusive-create arbiter, and the result
    matches the POSIX-lake run of the same statements."""
    root, changes, final = base
    lake = "s3sim://" + str(tmp_path).lstrip("/") + "/dmllake"
    apply_changes(changes, lake, SPEC)

    delete_where(lake, [("turn_idx", ">=", 30)], SPEC)
    update_where(lake, [("role", "==", "user")], {"role": "A"}, SPEC)
    src = final.head(10).copy()
    src["turn_idx"] = (src["turn_idx"] + 700).astype(src["turn_idx"].dtype)
    merge_into(lake, rd.from_pandas(src), SPEC)

    want = final[final["turn_idx"] < 30].copy()
    want.loc[want["role"] == "user", "role"] = "A"
    want = pd.concat([want, src], ignore_index=True)
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(want))


def test_cli_dml_subcommands(base, capsys):
    import json

    from aws_serverless_elt_pipeline_enterprise_ray import cli

    root, changes, final = base
    lake = _fresh_lake(root, changes, "clidml")

    assert cli.main(["delete", "--lake", lake, "--where", "turn_idx:>=:30"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["committed"] == [2]

    assert cli.main([
        "update", "--lake", lake,
        "--where", "role:==:user", "--set", 'role="E"',
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["committed"] == [3]

    want = final[final["turn_idx"] < 30].copy()
    want.loc[want["role"] == "user", "role"] = "E"
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(want))


def test_explain_where_prunes_and_counts(base, tmp_path):
    """EXPLAIN: zone maps prune key-range-disjoint files for a key
    predicate, and matched_rows equals the exact count."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml import explain_where

    root, changes, final = base
    # small files so zone maps have something to prune
    lake = str(tmp_path / "xlake")
    apply_changes(changes, lake, SPEC, max_rows_per_file=120)

    ex = explain_where(lake, [("turn_idx", "between", (0, 3))])
    assert ex["matched_rows"] == int((final["turn_idx"] <= 3).sum())
    assert ex["files_pruned"] + ex["files_scanned"] == ex["files_total"]

    # a conv_id point predicate prunes across key-sorted chunk files
    conv = final["conv_id"].iloc[0]
    ex2 = explain_where(lake, [("conv_id", "==", conv)])
    assert ex2["matched_rows"] == int((final["conv_id"] == conv).sum())
    assert ex2["files_pruned"] > 0, "key-disjoint files must prune"


def test_dml_predicate_fuzz_vs_duckdb(base):
    """Seeded fuzz: 25 random conjunctions over (role, turn_idx, ts,
    text) — delete_where's surviving state must equal DuckDB deleting
    with the same WHERE from the same starting state (SQL NULL
    semantics included)."""
    import numpy as np

    rng = np.random.default_rng(1234)
    root, changes, final = base
    con = duckdb.connect()
    con.register("final", final)

    roles = [r for r in final["role"].dropna().unique()][:4]
    tmin, tmax = final["ts"].min(), final["ts"].max()

    def rand_conjunct():
        kind = rng.integers(0, 4)
        if kind == 0:
            r = roles[int(rng.integers(0, len(roles)))]
            op = ["==", "!="][int(rng.integers(0, 2))]
            return ("role", op, r), f"role {'=' if op == '==' else '<>'} '{r}'"
        if kind == 1:
            lo = int(rng.integers(0, 30))
            hi = lo + int(rng.integers(0, 15))
            return ("turn_idx", "between", (lo, hi)), \
                f"turn_idx BETWEEN {lo} AND {hi}"
        if kind == 2:
            cut = tmin + (tmax - tmin) * float(rng.random())
            op = ["<=", ">"][int(rng.integers(0, 2))]
            return ("ts", op, cut), f"ts {op} TIMESTAMP '{cut}'"
        vals = [int(v) for v in rng.integers(0, 40, size=3)]
        return ("turn_idx", "in", vals), \
            f"turn_idx IN ({','.join(map(str, vals))})"

    for trial in range(25):
        n = int(rng.integers(1, 3))
        conjs, sqls = zip(*[rand_conjunct() for _ in range(n)])
        lake = _fresh_lake(root, changes, f"fuzz{trial}")
        delete_where(lake, list(conjs), SPEC)
        want = con.execute(
            "SELECT * FROM final WHERE NOT coalesce("
            + " AND ".join(sqls) + ", false) ORDER BY conv_id, turn_idx"
        ).df()
        got = _canon(_state(lake))
        pd.testing.assert_frame_equal(got, _canon(want)), (conjs,)
    con.close()


def test_delete_where_or_predicate(base):
    """DNF: [[a,b],[c]] = (a AND b) OR c — both the file pruning and
    the row mask honor the disjunction."""
    root, changes, final = base
    lake = _fresh_lake(root, changes, "delor")
    delete_where(
        lake,
        [
            [("role", "==", "assistant"), ("turn_idx", "<", 10)],
            [("turn_idx", ">=", 35)],
        ],
        SPEC,
    )
    hit = ((final["role"] == "assistant") & (final["turn_idx"] < 10)) | (
        final["turn_idx"] >= 35
    )
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(final[~hit]))


def test_dml_bloom_prunes_straddled_key_miss(base, tmp_path):
    """A conv_id lexically inside several files' [key_min, key_max] but
    absent from the lake: zone maps keep those straddling files, the
    Bloom sidecars drop them — EXPLAIN shows deeper pruning and the
    delete is a no-op."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml import (
        _check_pred, _file_may_match, explain_where,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
        ManifestStore, manifest_payload_schema,
    )

    root, changes, final = base
    lake = str(tmp_path / "bloomlake")
    apply_changes(changes, lake, SPEC, max_rows_per_file=150)

    # a key that sorts inside the population but does not exist
    ghost = "conv_1x"
    assert ghost not in set(final["conv_id"])
    m = ManifestStore(lake).load()
    pred = _check_pred([(("conv_id"), "==", ghost)], manifest_payload_schema(m))
    zone_keep = sum(
        1 for files in m.partitions.values() for f in files
        if _file_may_match(pred[0])(f)
    )
    ex = explain_where(lake, [("conv_id", "==", ghost)])
    assert ex["matched_rows"] == 0
    assert ex["files_scanned"] < zone_keep or zone_keep == 0, (
        "blooms must prune past the zone maps for a straddled miss"
    )
    assert delete_where(lake, [("conv_id", "==", ghost)], SPEC) == []


def test_zorder_compact_enables_value_pruning(base, tmp_path):
    """Value-predicate pruning story end-to-end: hash-partitioned files
    span every turn_idx (0 files pruned), but after
    ``compact(cluster_by=("turn_idx",))`` Z-orders the partitions into
    multiple value-clustered chunks, the same predicate prunes files —
    and the DELETE result is unchanged."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml import explain_where

    root, changes, final = base
    lake = str(tmp_path / "zlake")
    apply_changes(changes, lake, SPEC)

    where = [("turn_idx", "between", (0, 4))]
    before = explain_where(lake, where)

    compact(lake, SPEC, min_files_to_compact=1, cluster_by=("turn_idx",),
            target_rows_per_file=120)
    after = explain_where(lake, where)
    assert after["matched_rows"] == before["matched_rows"]
    assert after["files_pruned"] > before["files_pruned"], (before, after)

    delete_where(lake, where, SPEC)
    want = final[~final["turn_idx"].between(0, 4)]
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(want))


def test_dml_predicate_validation_errors(base):
    """Review-pass hardening: empty predicates and NULL range values
    fail/behave cleanly instead of crashing in workers."""
    root, changes, final = base
    lake = _fresh_lake(root, changes, "valid")
    with pytest.raises(ValueError):
        delete_where(lake, [], SPEC)
    with pytest.raises(ValueError):
        delete_where(lake, [[("turn_idx", "<", 3)], []], SPEC)
    # NULL comparison value: SQL semantics, matches nothing, no commit
    assert delete_where(lake, [("turn_idx", "<", None)], SPEC) == []
    assert delete_where(lake, [("turn_idx", "between", (None, 5))], SPEC) == []
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(final))


def test_cross_lake_dml_atomic_visibility(base, tmp_path):
    """DML composes with the transactional catalog: deletes on TWO
    lakes become visible to catalog readers in ONE atomic catalog
    commit — at the old catalog version both lakes read pre-DML, at the
    new one both read post-DML; never a torn mix."""
    from aws_serverless_elt_pipeline_enterprise_ray.state.txn import TxnCatalog, read_table_at
    from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

    root, changes, final = base
    a = _fresh_lake(root, changes, "txna")
    b = _fresh_lake(root, changes, "txnb")
    cat = TxnCatalog(str(tmp_path / "cat"))
    cat.commit_pins(
        {"a": {"lake_dir": a, "version": 1},
         "b": {"lake_dir": b, "version": 1}},
        None,
    )
    v0 = cat.current_version()

    txn = cat.begin()
    ms_a = delete_where(a, [("turn_idx", ">=", 30)], SPEC)
    ms_b = delete_where(b, [("turn_idx", "<", 5)], SPEC)
    txn.pin("a", a, ms_a[-1].version)
    txn.pin("b", b, ms_b[-1].version)
    # before the catalog commit: catalog readers still see v1 on both
    assert read_table_at(cat, "a").count() == len(final)
    assert read_table_at(cat, "b").count() == len(final)
    v1 = txn.commit()

    na = int((final["turn_idx"] < 30).sum())
    nb = int((final["turn_idx"] >= 5).sum())
    assert read_table_at(cat, "a", catalog_version=v0).count() == len(final)
    assert read_table_at(cat, "b", catalog_version=v0).count() == len(final)
    assert read_table_at(cat, "a", catalog_version=v1).count() == na
    assert read_table_at(cat, "b", catalog_version=v1).count() == nb


def test_dml_compact_gc_lifecycle(base, tmp_path):
    """Full lifecycle after DML: tombstones purge via compact, gc
    drops the superseded files, the surviving state is exact, and the
    surviving manifest versions still read."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact
    from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

    root, changes, final = base
    lake = str(tmp_path / "lc")
    apply_changes(changes, lake, SPEC)
    delete_where(lake, [("turn_idx", ">=", 25)], SPEC)
    update_where(lake, [("role", "==", "user")], {"role": "Z"}, SPEC)

    compact(lake, SPEC, min_files_to_compact=1, purge_tombstones=True)
    removed = ManifestStore(lake).gc(keep_versions=1, min_age_seconds=0)
    assert removed, "gc must drop superseded COW files"

    want = final[final["turn_idx"] < 25].copy()
    want.loc[want["role"] == "user", "role"] = "Z"
    pd.testing.assert_frame_equal(_canon(_state(lake)), _canon(want))
    # the kept (current) version reads; its tombstones are gone
    m = ManifestStore(lake).load()
    assert m.total_rows() == len(want)
