"""Metadata-only schema DDL (``pipelines/ddl.py``)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_serverless_elt_pipeline_enterprise_ray import apply_changes, default_spec, read_table
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.ddl import add_column, drop_column
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import ManifestStore

SPEC = default_spec(num_partitions=8)


@pytest.fixture()
def lake(tmp_path):
    changes = str(tmp_path / "ch")
    gen_changes(changes, n_events=2500, n_convs=40, n_files=2, seed=13)
    lake = str(tmp_path / "lake")
    apply_changes(changes, lake, SPEC)
    return lake


def test_add_column_reads_null_and_is_metadata_only(lake):
    m0 = ManifestStore(lake).load()
    m = add_column(lake, "score", pa.float64())
    assert m.version == m0.version + 1
    assert m.partitions == m0.partitions  # no data file touched
    df = read_table(lake).to_pandas()
    assert "score" in df.columns and df["score"].isna().all()
    with pytest.raises(ValueError):
        add_column(lake, "score", pa.float64())


def test_add_column_then_dml_fills_it(lake):
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml import update_where

    add_column(lake, "score", pa.float64())
    update_where(lake, [("turn_idx", "<", 5)], {"score": 1.5}, SPEC)
    df = read_table(lake).to_pandas()
    hit = df["turn_idx"] < 5
    assert (df.loc[hit, "score"] == 1.5).all()
    assert df.loc[~hit, "score"].isna().all()


def test_drop_column_projects_and_time_travel_keeps_it(lake):
    v0 = ManifestStore(lake).load().version
    drop_column(lake, "tool")
    df = read_table(lake).to_pandas()
    assert "tool" not in df.columns
    old = read_table(lake, version=v0).to_pandas()
    assert "tool" in old.columns  # schema history via time travel


def test_drop_column_protections(lake):
    with pytest.raises(ValueError):
        drop_column(lake, "conv_id", SPEC)
    with pytest.raises(ValueError):
        drop_column(lake, "ts", SPEC)
    with pytest.raises(KeyError):
        drop_column(lake, "never_existed", SPEC)


def test_compact_after_drop_removes_bytes(lake):
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.compact import compact

    from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import lakefs

    drop_column(lake, "tool")
    # min_files_to_compact=1 forces every partition through the rewrite
    # (schema conformance is a side effect of rewriting)
    compact(lake, SPEC, min_files_to_compact=1)
    m = ManifestStore(lake).load()
    fs = lakefs(lake)
    for files in m.partitions.values():
        for f in files:
            names = pq.read_schema(fs.full(f["path"])).names
            assert "tool" not in names, f["path"]
    df = read_table(lake).to_pandas()
    assert "tool" not in df.columns and len(df) > 0
