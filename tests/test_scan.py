"""Distributed ordered prefix scan (functions/scan.py) and SCD-2
interval build (functions/windows.scd2_intervals): the cases the
oracle gate can't isolate — exclusive frames at range boundaries,
empty ranges, null-safe change detection, unchanged-row collapse."""

import numpy as np
import pandas as pd
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.scan import (
    late_arrivals,
    ordered_prefix_scan,
)
from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
    scd2_intervals,
)


def _scan_df(df, **kw):
    ds = rd.from_pandas(df).repartition(4)
    out = ordered_prefix_scan(ds, **kw).to_pandas()
    return out.sort_values(kw["order_col"]).reset_index(drop=True)


def test_prefix_sum_inclusive_matches_numpy():
    rng = np.random.default_rng(7)
    order = rng.permutation(200)
    vals = rng.integers(-50, 50, 200)
    df = pd.DataFrame({"o": order, "v": vals})
    out = _scan_df(df, order_col="o", val_col="v", op="sum", out_col="s", num_buckets=5)
    want = df.sort_values("o")["v"].cumsum().to_numpy()
    assert np.array_equal(out["s"].to_numpy().astype(np.int64), want)


def test_prefix_max_exclusive_first_row_null():
    df = pd.DataFrame({"o": [1, 2, 3, 4, 5, 6], "v": [3, 1, 5, 2, 9, 4]})
    out = _scan_df(
        df, order_col="o", val_col="v", op="max", out_col="m",
        inclusive=False, num_buckets=3,
    )
    m = out["m"].tolist()
    assert pd.isna(m[0])
    assert m[1:] == [3, 3, 5, 5, 9]


def test_prefix_scan_with_empty_ranges():
    # order values cluster at the extremes: middle linspace ranges are empty
    df = pd.DataFrame({"o": [1, 2, 1000, 1001], "v": [10, 20, 1, 2]})
    out = _scan_df(df, order_col="o", val_col="v", op="sum", out_col="s", num_buckets=8)
    assert out["s"].tolist() == [10, 30, 31, 33]
    out2 = _scan_df(
        df, order_col="o", val_col="v", op="min", out_col="s",
        inclusive=False, num_buckets=8,
    )
    vals = out2["s"].tolist()
    assert pd.isna(vals[0]) and vals[1:] == [10, 10, 1]


def test_late_arrivals_flags_regressions():
    # arrival order o; event times regress at o=3 (ts 5 < max(10,20)-4)
    df = pd.DataFrame(
        {"o": [1, 2, 3, 4], "t": [10_000_000, 20_000_000, 5_000_000, 21_000_000]}
    )
    ds = rd.from_pandas(df).repartition(2)
    out = late_arrivals(
        ds, seq_col="o", ts_col="t", tolerance_us=4_000_000
    ).to_pandas()
    assert out["o"].tolist() == [3]
    assert out["watermark_us"].tolist() == [20_000_000]


def test_scd2_collapses_unchanged_and_nulls():
    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 2,
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05",
                 "2024-01-01", "2024-01-02"]
            ),
            "tb": [1, 2, 3, 4, 5, 1, 2],
            # a: x -> x (collapse) -> null -> null (collapse) -> y
            "attr": ["x", "x", None, None, "y", "z", "z"],
        }
    )
    out = (
        scd2_intervals(
            rd.from_pandas(df).repartition(3),
            key="k", ts_col="ts", attr_cols=["attr"], tiebreak_col="tb",
        )
        .to_pandas()
        .sort_values(["k", "valid_from"])
        .reset_index(drop=True)
    )
    a = out[out["k"] == "a"]
    assert a["attr"].tolist() == ["x", None, "y"]
    assert a["valid_from"].dt.day.tolist() == [1, 3, 5]
    # valid_to chains to the NEXT version's valid_from; last is open
    assert a["valid_to"].dt.day.tolist()[:2] == [3, 5]
    assert pd.isna(a["valid_to"].iloc[-1]) and bool(a["is_current"].iloc[-1])
    b = out[out["k"] == "b"]
    assert len(b) == 1 and bool(b["is_current"].iloc[0])
