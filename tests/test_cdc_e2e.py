"""End-to-end CDC correctness vs the single-process duckdb oracle
(FIXTURES.md F5): full replay, chunked application, idempotent
re-submission, kill-and-resume, schema evolution, quarantine.

The invariant throughout is the north rule's: per-turn text equality
under stable (conv_id, turn_idx) ordering.
"""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes, oracle_final_state
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore


def final_table(
    lake_dir,
    columns=("conv_id", "turn_idx", "role", "text", "tool", "ts"),
    version=None,
):
    ds = engine.read_table(lake_dir, version=version)
    tbl = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536)]
        or [ds.schema().base_schema.empty_table()]
    )
    tbl = tbl.select(list(columns))
    return tbl.sort_by([(c, "ascending") for c in ("conv_id", "turn_idx")])


def assert_matches_oracle(lake_dir, changes_dir, extra_cols=()):
    cols = ("conv_id", "turn_idx", "role", "text", "tool", "ts") + tuple(extra_cols)
    got = final_table(lake_dir, cols)
    want = oracle_final_state(changes_dir).select(list(cols))
    assert got.num_rows == want.num_rows, f"{got.num_rows} != {want.num_rows}"
    for c in cols:
        g, w = got[c].to_pylist(), want[c].to_pylist()
        assert g == w, f"column {c} mismatch (first diff at {next(i for i,(a,b) in enumerate(zip(g,w)) if a!=b)})"


@pytest.fixture(scope="module")
def small_stream(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream"))
    gen_changes(d, n_events=8000, n_convs=120, n_files=6, seed=7)
    return d


def test_full_apply_matches_oracle(small_stream, tmp_lake):
    spec = engine.default_spec(num_partitions=8)
    manifests = engine.apply_changes(small_stream, tmp_lake, spec)
    assert len(manifests) == 1
    assert_matches_oracle(tmp_lake, small_stream)
    m = manifests[0]
    assert m.metrics["events_applied"] > 0
    assert m.watermark == 7999  # max seq
    files = sorted(glob.glob(os.path.join(small_stream, "*.parquet")))
    assert all(m.is_applied(f) for f in files)
    # watermark-compacted checkpoint: no per-file exception entries
    assert m.applied == [] and len(m.applied_watermarks) == 1


def test_chunked_apply_equals_full(small_stream, tmp_lake):
    spec = engine.default_spec(num_partitions=8)
    manifests = engine.apply_changes(
        small_stream, tmp_lake, spec, commit_every_files=2
    )
    assert len(manifests) == 3
    assert manifests[-1].version == 3
    assert_matches_oracle(tmp_lake, small_stream)


def test_idempotent_resubmission(small_stream, tmp_lake):
    spec = engine.default_spec(num_partitions=8)
    engine.apply_changes(small_stream, tmp_lake, spec)
    store = ManifestStore(tmp_lake)
    v1 = store.current_version()
    # second run with nothing new: no-op, no new version (the
    # reference's verify-idempotency: second invoke -> skipped>=1,
    # Makefile:344-359)
    again = engine.apply_changes(small_stream, tmp_lake, spec)
    assert again == []
    assert store.current_version() == v1
    assert_matches_oracle(tmp_lake, small_stream)


def test_kill_and_resume(small_stream, tmp_lake):
    """Apply half the files (simulating a crash after one commit), then
    resume: resumed run must apply only the remainder and converge to
    the oracle state."""
    spec = engine.default_spec(num_partitions=8)
    files = sorted(glob.glob(os.path.join(small_stream, "*.parquet")))
    engine.apply_changes(files[:3], tmp_lake, spec)
    store = ManifestStore(tmp_lake)
    m = store.load()
    assert all(m.is_applied(f) for f in files[:3])
    assert not any(m.is_applied(f) for f in files[3:])
    # resume over the whole directory: already-applied files skipped
    manifests = engine.apply_changes(small_stream, tmp_lake, spec)
    assert len(manifests) == 1
    assert all(store.load().is_applied(f) for f in files)
    assert_matches_oracle(tmp_lake, small_stream)


def test_orphan_files_invisible_and_gc(small_stream, tmp_lake):
    """Files written without a manifest commit are invisible (exactly-
    once visibility point) and collected by gc."""
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(small_stream, tmp_lake, spec)
    rows_before = final_table(tmp_lake).num_rows
    # drop an orphan into a partition dir (backend-agnostic write)
    from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import lakefs

    fs = lakefs(tmp_lake)
    orphan = fs.full("data", "part=00000", "f-orphan.parquet")
    fs.makedirs(fs.full("data", "part=00000"))
    fs.write_parquet(pa.table({"x": [1]}), orphan)
    assert final_table(tmp_lake).num_rows == rows_before
    removed = ManifestStore(tmp_lake).gc(min_age_seconds=0)
    assert any("f-orphan" in r for r in removed)
    assert final_table(tmp_lake).num_rows == rows_before


def test_schema_evolution_backfills_nulls(tmp_path):
    changes = str(tmp_path / "ch")
    lake = str(tmp_path / "lake")
    # duplicate_ratio=0: a re-emitted duplicate straddling the evolution
    # boundary would carry different columns at identical (ts, seq) -
    # genuinely ambiguous under LWW, so the fixture excludes it.
    gen_changes(changes, n_events=3000, n_convs=50, n_files=4, seed=11,
                evolve_after_file=2, duplicate_ratio=0.0)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(changes, lake, spec)
    got = final_table(
        lake, ("conv_id", "turn_idx", "text", "tool_call_id", "meta_tokens")
    )
    assert "tool_call_id" in got.column_names
    # some rows (won by pre-evolution events) have nulls, some don't
    nulls = got["tool_call_id"].null_count
    assert 0 < nulls < got.num_rows
    assert_matches_oracle(lake, changes, extra_cols=("tool_call_id", "meta_tokens"))


def test_quarantine_bad_rows(tmp_path):
    changes = str(tmp_path / "ch")
    lake = str(tmp_path / "lake")
    gen_changes(changes, n_events=2000, n_convs=40, n_files=3, seed=13,
                bad_ratio=0.05)
    spec = engine.default_spec(num_partitions=4)
    manifests = engine.apply_changes(changes, lake, spec)
    m = manifests[-1]
    assert m.metrics["quarantined"] > 0
    qfiles = glob.glob(os.path.join(lake, "_quarantine", "*", "*.parquet"))
    assert qfiles
    import pyarrow.parquet as pq

    qrows = sum(pq.read_metadata(f).num_rows for f in qfiles)
    assert qrows == m.metrics["quarantined"]
    # good rows still converge to oracle (oracle filters bad rows too)
    assert_matches_oracle(lake, changes)


def test_hot_key_detection_preserves_correctness(tmp_path):
    changes = str(tmp_path / "ch")
    lake = str(tmp_path / "lake")
    gen_changes(changes, n_events=4000, n_convs=60, n_files=4, seed=17,
                hot_fraction=0.5, n_hot=2)
    spec = engine.default_spec(num_partitions=8, hot_key_salt=4)
    engine.apply_changes(changes, lake, spec, detect_hot_keys=True)
    assert_matches_oracle(lake, changes)


def test_rollback(small_stream, tmp_lake):
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(small_stream, tmp_lake, spec, commit_every_files=3)
    store = ManifestStore(tmp_lake)
    assert store.current_version() == 2
    rows_v2 = final_table(tmp_lake).num_rows
    want_v1 = final_table(tmp_lake, version=1).num_rows
    store.rollback(1)
    rows_now = final_table(tmp_lake).num_rows
    # POSIX re-points CURRENT at 1; the object backend commits a
    # RESTORE version 3 whose content IS version 1 (Delta semantics) -
    # either way readers see the demoted-to snapshot
    if "://" in tmp_lake:
        assert store.current_version() == 3
        assert store.load().metrics["restored_from"] == 1
    else:
        assert store.current_version() == 1
    assert rows_now == want_v1
    assert rows_now != rows_v2 or rows_now > 0


def test_partitioning_is_sticky(tmp_path):
    """A later apply with a different spec P / hot-key config must keep
    the lake's original partitioning (else keys duplicate across
    partitions)."""
    ch1, ch2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    lake = str(tmp_path / "lake")
    gen_changes(ch1, n_events=2000, n_convs=40, n_files=2, seed=41)
    gen_changes(ch2, n_events=2000, n_convs=40, n_files=2, seed=43)
    engine.apply_changes(ch1, lake, engine.default_spec(num_partitions=4))
    # second apply asks for 64 partitions + hot keys: must be ignored
    engine.apply_changes(
        ch2, lake, engine.default_spec(num_partitions=64, hot_keys=("conv_000001",))
    )
    store = ManifestStore(lake)
    m = store.load()
    assert m.partitioning["num_partitions"] == 4
    assert m.partitioning["hot_keys"] == []
    assert max(int(p) for p in m.partitions) < 4
    # and the combined state is still key-unique / oracle-correct
    import duckdb
    both = str(tmp_path / "both")
    os.makedirs(both)
    for d in (ch1, ch2):
        for f in glob.glob(os.path.join(d, "*.parquet")):
            os.link(f, os.path.join(both, os.path.basename(d) + "_" + os.path.basename(f)))
    got = final_table(lake)
    keys = list(zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()))
    assert len(keys) == len(set(keys))


def test_actor_pool_merge_matches_oracle(small_stream, tmp_lake):
    """merge_compute='actors' (the actor-pool path) must produce the
    identical committed state as the default task path."""
    spec = engine.default_spec(num_partitions=8)
    engine.apply_changes(
        small_stream, tmp_lake, spec, merge_compute="actors",
        merge_concurrency=2,
    )
    assert_matches_oracle(tmp_lake, small_stream)


def test_direct_exchange_matches_oracle(small_stream, tmp_lake):
    """exchange='direct' (sort-free known-boundary shuffle,
    stages/exchange.py) must produce the identical committed state as
    the default sort-based groupby path — including chunked commits
    and idempotent re-submission."""
    spec = engine.default_spec(num_partitions=8)
    ms = engine.apply_changes(
        small_stream, tmp_lake, spec, commit_every_files=2, exchange="direct"
    )
    assert len(ms) == 3
    assert_matches_oracle(tmp_lake, small_stream)
    assert engine.apply_changes(small_stream, tmp_lake, exchange="direct") == []


def test_direct_exchange_fan_in_tree(small_stream, tmp_path, monkeypatch):
    """A tiny fan_in forces multiple combine tiers between split and
    reduce; committed state must still match the oracle exactly."""
    monkeypatch.setenv("GRAFT_EXCHANGE_FANIN", "2")
    lake = str(tmp_path / "lake")
    spec = engine.default_spec(num_partitions=8)
    engine.apply_changes(small_stream, lake, spec, exchange="direct")
    assert_matches_oracle(lake, small_stream)


def test_lsm_delta_append_and_compact(tmp_path):
    """A small tail against a large base must APPEND delta runs (no
    partition rewrite), reads must LWW-merge runs, and compaction must
    merge runs back down - all oracle-identical."""
    import json as _json

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    files = gen_changes(changes, n_events=20_000, n_convs=80, n_files=40, seed=71)
    spec = engine.default_spec(num_partitions=4)
    # base: 39 files; tail: 1 file (~2.5% of volume -> delta per
    # partition well under the 0.2 threshold after the base merges)
    engine.apply_changes(files[:39], lake, spec)
    store = ManifestStore(lake)
    base = store.load()
    base_file_count = {pid: len(fs) for pid, fs in base.partitions.items()}

    ms = engine.apply_changes(changes, lake, spec)
    m = ms[-1]
    assert m.metrics.get("delta_appends", 0) >= 1, m.metrics
    grew = [
        pid for pid, fs in m.partitions.items()
        if len(fs) > base_file_count.get(pid, 0)
    ]
    assert grew, "delta commits should add run files"
    # base run files are still referenced (not rewritten) for delta'd parts
    for pid in grew:
        base_paths = {f["path"] for f in base.partitions[pid]}
        new_paths = {f["path"] for f in m.partitions[pid]}
        assert base_paths <= new_paths

    assert_matches_oracle(lake, changes)

    # point lookup across runs
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import (
        read_conversations,
    )

    one = read_conversations(lake, ["conv_000001"]).to_pandas()
    want = oracle_final_state(changes).to_pandas()
    assert len(one) == (want.conv_id == "conv_000001").sum()

    # DQ sees no duplicate keys across runs
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dq import run_dq

    report = run_dq(lake, spec)
    assert report["ok"], report

    # compaction merges runs down to one per partition
    c = compact(lake, spec, min_files_to_compact=2)
    assert c is not None
    for pid, fs in c.partitions.items():
        assert len(fs) == 1, f"partition {pid} still has {len(fs)} runs"
    assert_matches_oracle(lake, changes)


def test_schema_evolution_across_delta_runs(tmp_path):
    """Additive columns appearing mid-stream while partitions carry
    delta-append runs: old runs lack the new columns, the reader must
    unify and the final state must match the oracle."""
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=12_000, n_convs=400, n_files=24, seed=79,
                evolve_after_file=20, duplicate_ratio=0.0)
    spec = engine.default_spec(num_partitions=4)
    # many small commits so late chunks take the delta-append path
    ms = engine.apply_changes(changes, lake, spec, commit_every_files=2)
    assert any(m.metrics.get("delta_appends", 0) for m in ms), \
        "fixture should have triggered delta appends"
    assert_matches_oracle(lake, changes,
                          extra_cols=("tool_call_id", "meta_tokens"))


def test_read_table_column_pushdown(tmp_path):
    """read_table(columns=...) pushes projection into the parquet read
    and must agree with the full read projected — across LSM delta
    runs (merge-on-read needs the internal cols) and evolved schemas
    (old files lack the new column; footer-checked, null-padded)."""
    import pandas as pd

    lake = str(tmp_path / "lake")
    spec = engine.default_spec(num_partitions=4)
    base = pd.DataFrame(
        [
            {"op": "I", "seq": i, "conv_id": f"c{i % 7}", "turn_idx": i,
             "role": "user", "text": f"t{i}", "tool": None,
             "ts": pd.Timestamp("2026-01-01")}
            for i in range(3000)
        ]
    )
    engine.apply_dataset(base, lake, spec, label="base")
    # small delta -> LSM run; carries a NEW column (schema evolution)
    delta = base.head(120).copy()
    delta["seq"] = delta["seq"] + 10_000
    delta["ts"] = pd.Timestamp("2026-01-02")
    delta["lang"] = "en"
    engine.apply_dataset(delta, lake, label="delta")

    full = (
        engine.read_table(lake).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    proj = (
        engine.read_table(lake, columns=["conv_id", "text", "lang"]).to_pandas()
        .sort_values(["conv_id", "text"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        full[["conv_id", "text", "lang"]]
        .sort_values(["conv_id", "text"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(proj, want)
    assert list(proj.columns) == ["conv_id", "text", "lang"]
    # updated rows carry the evolved value through the pruned read
    assert (proj["lang"] == "en").sum() == 120

    with pytest.raises(KeyError):
        engine.read_table(lake, columns=["nope"])


def test_auto_commit_chunking_by_bytes(small_stream, tmp_path, monkeypatch):
    """commit_every_files='auto' packs pending files into byte-bounded
    commits; a tiny cap forces one commit per file and the final state
    still matches the oracle."""
    monkeypatch.setenv("GRAFT_AUTO_COMMIT_BYTES", "1")
    lake = str(tmp_path / "lake")
    spec = engine.default_spec(num_partitions=4)
    ms = engine.apply_changes(small_stream, lake, spec, commit_every_files="auto")
    files = sorted(glob.glob(os.path.join(small_stream, "*.parquet")))
    assert len(ms) == len(files)  # cap smaller than any file -> 1 each
    assert_matches_oracle(lake, small_stream)


def test_pipelined_commits_equal_serial(tmp_path):
    """pipeline_commits=True (prefetch chunk k+1's normalize while
    chunk k merges/commits) must produce the same committed state,
    version count and metrics as the serial loop - including a
    mid-stream additive schema evolution, which exercises the folded
    run-spec path (chunk 3+ carries columns first seen in chunk 3
    while chunk 2 is still committing)."""
    changes = str(tmp_path / "ch")
    gen_changes(changes, n_events=6000, n_convs=80, n_files=6, seed=21,
                evolve_after_file=3, duplicate_ratio=0.0)
    spec = engine.default_spec(num_partitions=4)

    lake_s = str(tmp_path / "lake_serial")
    ms_s = engine.apply_changes(changes, lake_s, spec, commit_every_files=2)
    lake_p = str(tmp_path / "lake_pipe")
    ms_p = engine.apply_changes(
        changes, lake_p, spec, commit_every_files=2, pipeline_commits=True
    )
    assert len(ms_p) == len(ms_s) == 3
    assert [m.version for m in ms_p] == [m.version for m in ms_s]
    assert [m.metrics for m in ms_p] == [m.metrics for m in ms_s]
    cols = ("conv_id", "turn_idx", "role", "text", "tool", "ts",
            "tool_call_id", "meta_tokens")
    got_s = final_table(lake_s, cols)
    got_p = final_table(lake_p, cols)
    assert got_p.equals(got_s)
    assert_matches_oracle(lake_p, changes,
                          extra_cols=("tool_call_id", "meta_tokens"))
    # resubmission stays a no-op through the pipelined path too
    assert engine.apply_changes(changes, lake_p, spec,
                                pipeline_commits=True) == []


def test_coalesce_merge_policy_partial_updates(tmp_path):
    """merge_policy="coalesce": an update's null fields keep the
    committed values across commits; the policy is sticky (a later
    apply with a DEFAULT spec adopts it from the manifest); replay
    stays idempotent."""
    import pandas as pd

    lake = str(tmp_path / "lake")
    spec = engine.default_spec(num_partitions=4, merge_policy="coalesce")

    def batch(rows, label):
        engine.apply_dataset(pd.DataFrame(rows), lake, spec, label=label)

    batch(
        [
            {"op": "I", "seq": 1, "conv_id": "c1", "turn_idx": 0,
             "role": "user", "text": "hello", "tool": "t0",
             "ts": pd.Timestamp("2026-01-01")},
            {"op": "I", "seq": 2, "conv_id": "c2", "turn_idx": 0,
             "role": "user", "text": "other", "tool": None,
             "ts": pd.Timestamp("2026-01-01")},
        ],
        "b1",
    )
    # partial update ACROSS commits, applied with a DEFAULT (lww) spec:
    # the manifest's sticky policy must override it
    engine.apply_dataset(
        pd.DataFrame(
            [{"op": "U", "seq": 3, "conv_id": "c1", "turn_idx": 0,
              "role": None, "text": "edited", "tool": None,
              "ts": pd.Timestamp("2026-01-02")}]
        ),
        lake,
        engine.default_spec(num_partitions=4),
        label="b2",
    )
    df = engine.read_table(lake).to_pandas().set_index("conv_id")
    assert df.loc["c1", "text"] == "edited"
    assert df.loc["c1", "role"] == "user"   # null did NOT override
    assert df.loc["c1", "tool"] == "t0"
    assert df.loc["c2", "text"] == "other"

    # delete resets: re-inserted key does not resurrect old fields
    engine.apply_dataset(
        pd.DataFrame(
            [
                {"op": "D", "seq": 4, "conv_id": "c1", "turn_idx": 0,
                 "role": None, "text": None, "tool": None,
                 "ts": pd.Timestamp("2026-01-03")},
                {"op": "I", "seq": 5, "conv_id": "c1", "turn_idx": 0,
                 "role": "system", "text": None, "tool": None,
                 "ts": pd.Timestamp("2026-01-04")},
            ]
        ),
        lake, spec, label="b3",
    )
    df = engine.read_table(lake).to_pandas().set_index("conv_id")
    assert df.loc["c1", "role"] == "system"
    assert pd.isna(df.loc["c1", "text"]) and pd.isna(df.loc["c1", "tool"])

    # replaying every batch is a no-op
    for label in ("b1", "b2", "b3"):
        assert engine.apply_dataset(
            pd.DataFrame([{"op": "I", "seq": 1, "conv_id": "c1",
                           "turn_idx": 0, "role": "user", "text": "hello",
                           "tool": "t0", "ts": pd.Timestamp("2026-01-01")}]),
            lake, spec, label=label,
        ) == []
    m = ManifestStore(lake).load()
    assert m.partitioning["merge_policy"] == "coalesce"
