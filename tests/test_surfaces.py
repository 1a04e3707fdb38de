"""Surface tests: spec YAML loading, transform hook (M6), JSONL compat
reader (S2), partition-ready events (S6), readiness probes (A3/A4),
scaffold (§2.10)."""

import dataclasses
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.schema import spec_from_yaml
from aws_serverless_elt_pipeline_enterprise_ray.sources.changelog import (
    read_changelog_csv,
    read_changelog_jsonl,
)
from aws_serverless_elt_pipeline_enterprise_ray.state.events import (
    files_added_since,
    read_events,
    wait_for_manifest_version,
)


def test_spec_from_yaml_roundtrip():
    spec = spec_from_yaml("/root/repo/specs/transcripts.yaml")
    assert spec.name == "transcripts"
    assert spec.key_cols == ("conv_id", "turn_idx")
    assert spec.payload_schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert spec.dq.unique == (("conv_id", "turn_idx"),)
    assert spec.dq.ranges["turn_idx"] == (0, 100000)
    assert spec.num_partitions == 64


def test_transform_hook_applies(tmp_path):
    """M6: a vectorized per-table UDF (fallback-chain mapping) runs
    inside normalize and its output lands in the lake."""
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=500, n_convs=10, n_files=1, seed=3)

    def fill_tool(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("tool")
        return batch.set_column(
            i, "tool", pc.coalesce(batch["tool"], pa.scalar("none"))
        )

    spec = dataclasses.replace(
        engine.default_spec(num_partitions=2), transform=fill_tool
    )
    engine.apply_changes(changes, lake, spec)
    t = pa.concat_tables(
        list(engine.read_table(lake).iter_batches(batch_format="pyarrow"))
    )
    assert t["tool"].null_count == 0
    assert "none" in set(t["tool"].to_pylist())


def test_jsonl_compat_reader(tmp_path):
    """S2: bronze JSONL ingestion - newline-delimited records, blank
    lines skipped, arrays flattened, bad JSON poisoned not fatal."""
    p = tmp_path / "bronze.jsonl"
    rows = [
        {"op": "I", "seq": 1, "conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "hi", "ts": "2024-01-01T00:00:00Z"},
        {"op": "I", "seq": 2, "conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "hello", "ts": "2024-01-01T00:00:01Z"},
    ]
    content = json.dumps(rows[0]) + "\n\n" + json.dumps([rows[1]]) + "\nnot json\n"
    p.write_text(content)
    ds = read_changelog_jsonl([str(p)])
    got = ds.take_all()
    ops = sorted(r.get("op") for r in got)
    assert ops == ["?", "I", "I"]  # 2 good + 1 poisoned


def test_csv_compat_reader_lands_through_normal_apply(tmp_path):
    """CSV bronze drop: header-driven read, ISO timestamps parsed to
    µs, empty strings as nulls; the rows land in a lake through the
    SAME normalize/apply path as Parquet input."""
    p = tmp_path / "bronze.csv"
    p.write_text(
        "op,seq,conv_id,turn_idx,role,text,tool,ts\n"
        "I,1,c1,0,user,hi,,2024-01-01T00:00:00\n"
        "I,2,c1,1,assistant,hello,,2024-01-01T00:00:01\n"
        "U,3,c1,1,assistant,hello again,,2024-01-01T00:00:02\n"
    )
    ds = read_changelog_csv([str(p)])
    sch = ds.schema()
    assert str(sch.base_schema.field("ts").type) == "timestamp[us]"
    assert ds.count() == 3
    got = {r["seq"]: r for r in ds.take_all()}
    assert got[1]["tool"] is None  # empty string -> null

    lake = str(tmp_path / "lake")
    engine.apply_dataset(
        ds, lake, engine.default_spec(num_partitions=2), label="csv-drop-1"
    )
    final = engine.read_table(lake).to_pandas()
    final = final.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(final["text"]) == ["hi", "hello again"]


def test_partition_ready_events_and_probes(tmp_path):
    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=1000, n_convs=20, n_files=2, seed=9)
    ms = engine.apply_changes(changes, lake, engine.default_spec(num_partitions=4),
                              commit_every_files=1)
    events = read_events(lake)
    assert all(e["event"] == "partition_ready" for e in events)
    assert {e["version"] for e in events} == {1, 2}
    # A3: exact files/rows added after v1
    diff = files_added_since(lake, 1)
    assert diff["version"] == 2 and diff["files"] > 0
    total = sum(
        f["rows"] for files in ms[-1].partitions.values() for f in files
    )
    full = files_added_since(lake, 0)
    assert full["rows"] == total
    # A4: readiness wait returns immediately when satisfied
    assert wait_for_manifest_version(lake, 2, timeout_s=5) == 2
    assert wait_for_manifest_version(lake, 99, timeout_s=0.5, poll_s=0.1) is None


def test_scaffold(tmp_path):
    from aws_serverless_elt_pipeline_enterprise_ray.scaffold import scaffold_dataset

    created = scaffold_dataset("agent_logs", str(tmp_path / "specs"))
    assert len(created) == 3
    spec = spec_from_yaml(created[0])
    assert spec.name == "agent_logs"
    assert os.path.exists(created[2])
    # scaffolded sample applies cleanly
    lake = str(tmp_path / "lake")
    ms = engine.apply_changes(
        os.path.dirname(created[2]), lake, dataclasses.replace(spec, num_partitions=2)
    )
    assert ms and ms[0].metrics["events_applied"] > 0


def test_tail_loop_applies_incrementally(tmp_path):
    """§3.1 always-on ingest: files dropped while the tailer runs are
    picked up in later polls; final state matches the oracle."""
    import shutil
    import threading

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tail import tail

    staged = str(tmp_path / "staged")
    changes = str(tmp_path / "ch")
    lake = str(tmp_path / "lake")
    os.makedirs(changes)
    files = gen_changes(staged, n_events=3000, n_convs=30, n_files=6, seed=51)

    # drip files into the watched dir while the tailer polls - landing
    # atomically (temp + rename), per the tailer's producer contract
    def drip():
        for f in files:
            tmp = os.path.join(changes, "." + os.path.basename(f) + ".tmp")
            shutil.copy(f, tmp)
            os.rename(tmp, os.path.join(changes, os.path.basename(f)))
            import time as _t

            _t.sleep(0.3)

    t = threading.Thread(target=drip)
    t.start()
    stats = tail(
        changes, lake, engine.default_spec(num_partitions=4),
        poll_seconds=0.2, max_idle_rounds=20,
    )
    t.join()
    assert stats["commits"] >= 2, "tailer should have committed across polls"
    assert stats["watermark"] == 2999
    from test_cdc_e2e import assert_matches_oracle

    assert_matches_oracle(lake, changes)


def test_read_conversations_partition_pruned(tmp_path):
    """Point lookup reads only the partitions that can hold the keys."""
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.cdc import (
        read_conversations,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.gen import oracle_final_state

    changes, lake = str(tmp_path / "ch"), str(tmp_path / "lake")
    gen_changes(changes, n_events=4000, n_convs=50, n_files=2, seed=61)
    engine.apply_changes(changes, lake, engine.default_spec(num_partitions=16))

    want_full = oracle_final_state(changes).to_pandas()
    targets = ["conv_000003", "conv_000017"]
    got = read_conversations(lake, targets).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = (
        want_full[want_full.conv_id.isin(targets)]
        [["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert got.equals(exp)
    # and a missing conversation returns empty, not an error
    assert len(read_conversations(lake, ["conv_nope"]).to_pandas()) == 0


def test_apply_dataset_merge_into(tmp_path):
    """apply_dataset: MERGE INTO from an in-memory change batch, with
    label-level exactly-once (same label replay is a no-op)."""
    import pandas as pd

    from aws_serverless_elt_pipeline_enterprise_ray import (
        apply_dataset,
        default_spec,
        read_table,
    )

    lake = str(tmp_path / "lake")
    batch = pd.DataFrame(
        [
            {"op": "I", "seq": i, "conv_id": f"c{i % 2}", "turn_idx": i,
             "role": "user", "text": f"t{i}", "tool": None,
             "ts": pd.Timestamp("2026-01-01")}
            for i in range(6)
        ]
    )
    ms = apply_dataset(batch, lake, default_spec(num_partitions=4), label="b1")
    assert len(ms) == 1 and read_table(lake).count() == 6
    # replay same label: staged files reused, apply is a no-op
    assert apply_dataset(batch, lake, label="b1") == []
    # a second batch with a new label upserts normally
    batch2 = batch.assign(seq=batch.seq + 10, text="EDITED",
                          ts=pd.Timestamp("2026-02-01"))
    apply_dataset(batch2, lake, label="b2")
    df = read_table(lake).to_pandas()
    assert len(df) == 6 and set(df["text"]) == {"EDITED"}


def test_lake_stats_report(tmp_path):
    """stats: skew / LSM-depth / zone-map coverage from the manifest
    only (no data read, no Ray execution)."""
    import pandas as pd

    from aws_serverless_elt_pipeline_enterprise_ray import (
        apply_dataset,
        default_spec,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.stats import (
        lake_stats,
    )

    lake = str(tmp_path / "lake")
    batch = pd.DataFrame(
        [
            {"op": "I", "seq": i, "conv_id": f"c{i % 7}", "turn_idx": i,
             "role": "user", "text": "x" * 50, "tool": None,
             "ts": pd.Timestamp("2026-01-01")}
            for i in range(200)
        ]
    )
    apply_dataset(batch, lake, default_spec(num_partitions=8), label="b1")
    s = lake_stats(lake)
    assert s["rows"] == 200 and s["partitions"] == 8
    assert s["zone_map_coverage"] == 1.0
    assert s["row_skew"] >= 1.0 and s["max_files_per_partition"] >= 1
    assert s["hot_partitions"][0]["rows"] == s["max_rows_partition"]
    # delta-append a second batch -> LSM depth grows in the report
    batch2 = batch.assign(seq=batch.seq + 1000, ts=pd.Timestamp("2026-02-01"))
    apply_dataset(batch2, lake, label="b2")
    s2 = lake_stats(lake)
    assert s2["version"] == 2


def test_empty_block_warning_filter():
    """The package-level logging filter drops ONLY Ray's empty-block
    (names=[]) schema-mismatch warning; genuine mismatches between two
    non-empty schemas still pass."""
    import logging

    from aws_serverless_elt_pipeline_enterprise_ray import _EmptyBlockSchemaNoise

    f = _EmptyBlockSchemaNoise()

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "p", 1, msg, (), None)

    noise = (
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: PandasBlockSchema(names=['k'], "
        "types=[dtype('int64')]), new schema: PandasBlockSchema(names=[], "
        "types=[]). This may lead to unexpected behavior."
    )
    real = noise.replace("names=[], types=[]", "names=['x'], types=[dtype('O')]")
    assert f.filter(rec(noise)) is False
    assert f.filter(rec(real)) is True
    assert f.filter(rec("unrelated warning")) is True
    # the filter is actually installed on the executor logger
    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    assert any(isinstance(x, _EmptyBlockSchemaNoise) for x in lg.filters)
