"""Isotonic regression (PAV) — monotone score calibration at scale.

The reward-model / judge-score calibration step of a training-data
pipeline: fit the best monotone (non-decreasing) step function from a
raw score ``x`` to an outcome ``y`` (pass/fail, preference win, human
label), then map scores through it. Classic pool-adjacent-violators,
decomposed for Ray Data:

1. distinct-``x`` outcome totals reduce map-side (per-batch group
   partials) through ONE bounded shuffle (``bucketed_agg``) — raw rows
   never move;
2. the distinct-x rows range-partition on x (equal-width over
   [min, max], like ``ordered_prefix_scan``) and each range runs the
   linear PAV stack locally, emitting POOLS (x_lo, x_hi, num, den);
3. the driver concatenates per-range pool lists in x order and
   continues the SAME stack merge across range boundaries — PAV's
   stack algorithm is left-to-right, so locally-pooled prefixes
   compose exactly: the result is bit-identical to a single global
   PAV pass.

Exactness: ``y`` must be integer (0/1 labels, cents); pool means are
the rationals num/den and every violation test is the exact-int
cross-multiplication ``num_a * den_b >= num_b * den_a`` — no float
enters until the final reported ``value`` column.

Scale contract: the driver sees POOLS (≤ distinct plateaus; for noisy
outcome data, orders of magnitude below distinct-x). The worst case
(strictly increasing means) is distinct-x-sized — bin or quantize the
score upstream if its domain is unbounded, as every calibration
pipeline does anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _pav_stack(
    xs: np.ndarray, nums: np.ndarray, dens: np.ndarray
) -> list[list[int]]:
    """Linear PAV over rows sorted by x: merge any adjacent pools where
    mean(left) > mean(right) (strict — equal means stay separate pools;
    the fitted values are equal either way). Exact-int comparisons.
    Returns pools as [x_lo, x_hi, num, den] lists."""
    pools: list[list[int]] = []
    for x, n, d in zip(xs, nums, dens):
        cur = [int(x), int(x), int(n), int(d)]
        while pools and pools[-1][2] * cur[3] > cur[2] * pools[-1][3]:
            prev = pools.pop()
            cur = [prev[0], cur[1], prev[2] + cur[2], prev[3] + cur[3]]
        pools.append(cur)
    return pools


def isotonic_fit(
    ds: rd.Dataset,
    *,
    x_col: str,
    y_col: str,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Fit weighted isotonic (non-decreasing) regression of integer
    outcome ``y_col`` on integer score ``x_col``. Returns the pool
    table (x_lo, x_hi, num, den, value): the fitted value for any x in
    [x_lo, x_hi] is num/den; between pools the step function is
    right-continuous (``isotonic_transform`` maps by pool upper
    bound). Ties in x pool first, like every PAV implementation."""
    from .windows import _buckets_for_cluster, bucketed_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"x": b[x_col].astype("int64"), "num": b[y_col].astype("int64")}
        ).dropna()
        g = t.groupby("x", sort=False)["num"].agg(["sum", "size"]).reset_index()
        g.columns = ["x", "num", "den"]
        return g

    per_x = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        "x",
        {"num": "sum", "den": "sum"},
        nb=num_buckets,
    ).materialize()
    if per_x.count() == 0:
        return pd.DataFrame(columns=["x_lo", "x_hi", "num", "den", "value"])

    mm = per_x.aggregate(
        rd.aggregate.Min("x", alias_name="lo"),
        rd.aggregate.Max("x", alias_name="hi"),
    )
    lo, hi = float(mm["lo"]), float(mm["hi"])
    P = num_buckets or _buckets_for_cluster()
    cuts = np.linspace(lo, hi, P + 1)[1:-1]

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_rng"] = np.searchsorted(cuts, b["x"].to_numpy(), side="right")
        return b

    def range_pav(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("x", kind="mergesort")
        pools = _pav_stack(
            g["x"].to_numpy(), g["num"].to_numpy(), g["den"].to_numpy()
        )
        arr = np.array(pools, dtype=np.int64).reshape(-1, 4)
        return pd.DataFrame(
            {
                "_rng": int(g["_rng"].iloc[0]),
                "x_lo": arr[:, 0],
                "x_hi": arr[:, 1],
                "num": arr[:, 2],
                "den": arr[:, 3],
            }
        )

    per_range = (
        per_x.map_batches(tag, batch_format="pandas")
        .groupby("_rng")
        .map_groups(range_pav, batch_format="pandas")
        .to_pandas()
        .sort_values(["_rng", "x_lo"], kind="mergesort")
    )
    # driver-side continuation of the SAME stack across range borders:
    # pool counts, never rows
    pools: list[list[int]] = []
    for x_lo, x_hi, n, d in per_range[["x_lo", "x_hi", "num", "den"]].itertuples(
        index=False
    ):
        cur = [int(x_lo), int(x_hi), int(n), int(d)]
        while pools and pools[-1][2] * cur[3] > cur[2] * pools[-1][3]:
            prev = pools.pop()
            cur = [prev[0], cur[1], prev[2] + cur[2], prev[3] + cur[3]]
        pools.append(cur)
    out = pd.DataFrame(pools, columns=["x_lo", "x_hi", "num", "den"]).astype(
        "int64"
    )
    out["value"] = out["num"].astype("float64") / out["den"]
    return out


def isotonic_transform(
    ds: rd.Dataset,
    pools: pd.DataFrame,
    *,
    x_col: str,
    out_col: str = "calibrated",
) -> rd.Dataset:
    """Map ``x_col`` through a fitted pool table: x below the first
    pool clamps to the first value, above the last to the last; inside
    the fitted domain each x takes the value of the pool whose
    [x_lo, x_hi] covers it (gaps between pools take the NEXT pool's
    value — the right-continuous step convention). The pool table
    broadcasts once via ``ray.put``; per batch it's one searchsorted."""
    his = pools["x_hi"].to_numpy(dtype=np.int64)
    vals = pools["value"].to_numpy(dtype=np.float64)
    ref = ray.put((his, vals))

    class Apply:
        def __init__(self):
            self.his, self.vals = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            x = np.asarray(b[x_col]).astype(np.int64)
            idx = np.searchsorted(self.his, x, side="left")
            idx = np.clip(idx, 0, len(self.vals) - 1)
            return b.append_column(out_col, pa.array(self.vals[idx], pa.float64()))

    return ds.map_batches(Apply, batch_format="pyarrow", concurrency=(1, 8))
