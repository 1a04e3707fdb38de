"""Row-level lake diff (``pipelines/diff.py``)."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from aws_serverless_elt_pipeline_enterprise_ray import apply_changes, default_spec
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes, oracle_final_state
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.clone import clone_lake
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.diff import diff_lakes, diff_summary
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml import (
    delete_where,
    merge_into,
    update_where,
)

SPEC = default_spec(num_partitions=8)


def test_diff_classifies_dml_delta(tmp_path):
    ch = str(tmp_path / "ch")
    gen_changes(ch, n_events=3000, n_convs=50, n_files=3, seed=31)
    final = oracle_final_state(ch).to_pandas()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    apply_changes(ch, a, SPEC)
    clone_lake(a, b)
    assert diff_summary(a, b, spec=SPEC) == {}

    delete_where(b, [("turn_idx", ">=", 30)], SPEC)
    update_where(
        b, [("turn_idx", "<", 3)],
        {"text": lambda t: pc.binary_join_element_wise(
            pa.scalar("X:"), t["text"], "")},
        SPEC,
    )
    import ray.data as rd

    ins = final.head(8).copy()
    ins["turn_idx"] = (ins["turn_idx"] + 900).astype(ins["turn_idx"].dtype)
    merge_into(b, rd.from_pandas(ins), SPEC, when_not_matched="insert",
               when_matched="ignore")

    df = diff_lakes(a, b, SPEC).to_pandas()
    got = df.set_index(["conv_id", "turn_idx"])["diff"]

    want_only_a = final[final["turn_idx"] >= 30]
    # text-null rows are UNCHANGED by the prefix update (X: || NULL = NULL)
    want_changed = final[(final["turn_idx"] < 3) & final["text"].notna()]
    assert set(got[got == "only_a"].index) == set(
        want_only_a.set_index(["conv_id", "turn_idx"]).index)
    assert set(got[got == "changed"].index) == set(
        want_changed.set_index(["conv_id", "turn_idx"]).index)
    assert (got == "only_b").sum() == len(ins)


def test_diff_time_travel_versions(tmp_path):
    ch = str(tmp_path / "ch")
    gen_changes(ch, n_events=2000, n_convs=30, n_files=2, seed=37)
    lake = str(tmp_path / "lake")
    apply_changes(ch, lake, SPEC)
    delete_where(lake, [("turn_idx", ">=", 20)], SPEC)
    s = diff_summary(lake, lake, spec=SPEC, version_a=1, version_b=2)
    assert set(s) == {"only_a"} and s["only_a"] > 0
    assert diff_summary(lake, lake, spec=SPEC, version_a=2, version_b=2) == {}
