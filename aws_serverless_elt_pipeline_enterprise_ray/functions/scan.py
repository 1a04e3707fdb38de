"""Global ordered prefix scan (running SUM/MAX/MIN over a total order).

SQL's ``agg() OVER (ORDER BY ...)`` with an unbounded-preceding frame is
inherently sequential, but it decomposes exactly like a parallel scan:
range-partition on the order column, aggregate each range, exclusive-
combine the P range partials on the driver (P values, not rows), then
each range finishes its own rows with one vectorized cumulative pass
plus its broadcast offset. ONE shuffle (the range exchange), two passes
over the data, and the driver never sees a row — the classic
Blelloch scan lifted onto Ray Data blocks.

Streaming-semantics consumer (SURVEY §2.9): ``late_arrivals`` — the
watermark screen "did this event's timestamp regress behind the maximum
timestamp already seen in arrival order?" is exactly an EXCLUSIVE
running max over the arrival sequence.

Scale notes: ranges come from equal-width splits of [min, max] of the
order column (right for dense sequence numbers / event ids; pass
explicit ``boundaries`` for skewed domains). The order column must be
UNIQUE (it is the total order; ties would make "preceding" ambiguous —
use a composite/sequence column). The max/min paths run in float64 so
the first row's empty frame can be NULL; exact for magnitudes < 2^53
(timestamps-as-microseconds qualify through year ~2255).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .windows import _buckets_for_cluster

# partial-agg is named by STRING ("sum"/"max"/"min"): handing pandas
# the numpy/builtin callable hits the "provided callable will be used
# directly" FutureWarning, and when pandas flips that behavior the
# combine semantics would change silently
_OPS = {
    "sum": (lambda s: s.cumsum(), 0.0),
    "max": (lambda s: s.cummax(), -np.inf),
    "min": (lambda s: s.cummin(), np.inf),
}


def ordered_prefix_scan(
    ds: rd.Dataset,
    *,
    order_col: str,
    val_col: str,
    op: str = "sum",
    out_col: str = "scan",
    inclusive: bool = True,
    boundaries: np.ndarray | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Add ``out_col`` = running ``op`` of ``val_col`` over the total
    order of ``order_col``. ``inclusive=False`` gives SQL's
    ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` (first row of
    the whole stream = NULL/NaN). Output value dtype is float64 —
    exact for |values| < 2^53; cast downstream if int is wanted."""
    assert op in _OPS, op
    cum_fn, identity = _OPS[op]
    P = num_buckets or _buckets_for_cluster()

    if boundaries is None:
        mm = ds.aggregate(
            rd.aggregate.Min(order_col, alias_name="lo"),
            rd.aggregate.Max(order_col, alias_name="hi"),
        )
        lo, hi = float(mm["lo"]), float(mm["hi"])
        # interior cut points; searchsorted maps order -> range id
        boundaries = np.linspace(lo, hi, P + 1)[1:-1]
    else:
        boundaries = np.asarray(boundaries, dtype=np.float64)

    def bucket_of(v: pd.Series) -> np.ndarray:
        return np.searchsorted(boundaries, v.to_numpy().astype(np.float64), "right")

    # pass 1: per-(batch, range) partials — P-bounded rows per batch
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rb = bucket_of(b[order_col])
        v = b[val_col].to_numpy().astype(np.float64)
        out = (
            pd.DataFrame({"_rb": rb, "_v": v})
            .groupby("_rb", sort=True)["_v"]
            .agg(op)
            .reset_index()
        )
        return out

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    # driver combine: P values -> exclusive offsets per range
    per_range = np.full(len(boundaries) + 1, identity, dtype=np.float64)
    if len(parts):
        combined = parts.groupby("_rb", sort=True)["_v"].agg(op)
        per_range[combined.index.to_numpy()] = combined.to_numpy()
    nonempty = np.zeros(len(per_range), dtype=bool)
    if len(parts):
        nonempty[parts["_rb"].unique()] = True
    if op == "sum":
        offsets = np.concatenate([[0.0], np.cumsum(per_range)[:-1]])
    else:
        acc = np.concatenate([[identity], (np.maximum if op == "max" else np.minimum).accumulate(per_range)[:-1]])
        offsets = acc
    # a range has a defined offset only if SOME lower range held rows
    has_lower = np.concatenate([[False], np.cumsum(nonempty)[:-1] > 0])

    # pass 2: one range-exchange, each range finishes with a cum pass
    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_rb"] = bucket_of(b[order_col])
        return b

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        rb = int(g["_rb"].iloc[0])
        g = g.sort_values(order_col, kind="mergesort").drop(columns="_rb")
        v = g[val_col].astype(np.float64)
        cum = cum_fn(v)
        if not inclusive:
            cum = cum.shift(1)
        off, defined = offsets[rb], has_lower[rb]
        if op == "sum":
            res = cum + (off if defined else 0.0)
            if not inclusive and not defined:
                pass  # first range's first row stays NaN
            elif not inclusive:
                res = res.fillna(off)
        else:
            comb = np.fmax if op == "max" else np.fmin
            res = pd.Series(
                comb(cum.to_numpy(), off) if defined else cum.to_numpy(),
                index=g.index,
            )
        g[out_col] = res
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_rb")
        .map_groups(finish, batch_format="pandas")
    )


def late_arrivals(
    ds: rd.Dataset,
    *,
    seq_col: str,
    ts_col: str,
    tolerance_us: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Watermark screen (SURVEY §2.9 late-data semantics): rows whose
    event time regressed more than ``tolerance_us`` behind the maximum
    event time of ALL earlier arrivals (arrival order = ``seq_col``).
    ``ts_col`` must already be int64 microseconds. Emits the late rows
    with ``watermark_us`` (the exclusive running max) — the side
    output a windowed aggregate would route to a late-data sink."""
    scanned = ordered_prefix_scan(
        ds,
        order_col=seq_col,
        val_col=ts_col,
        op="max",
        out_col="watermark_us",
        inclusive=False,
        num_buckets=num_buckets,
    )

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        wm = b["watermark_us"]
        late = wm.notna() & (b[ts_col] < wm - float(tolerance_us))
        out = b[late].copy()
        out["watermark_us"] = out["watermark_us"].astype("int64")
        return out

    return scanned.map_batches(flag, batch_format="pandas")
