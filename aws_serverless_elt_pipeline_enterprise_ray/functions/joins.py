"""Distributed join patterns the Dataset API lacks as primitives.

``asof_join`` — for each left row, the latest right row of the same
key with ``on <= left.on`` (market-data-style as-of semantics). Ray
Data has no co-group primitive, so both sides are tagged, unioned and
hash-grouped by key in ONE shuffle; inside each group a vectorized
``pandas.merge_asof`` over the time-sorted halves does the matching.

Partitioning assumption (documented per SURVEY's custom-operator
rule): the join key's groups must individually fit a worker (same
assumption as any ``map_groups``); skewed keys can be salted by a
coarse time-bucket IF the right side is replicated into the following
bucket (not needed at current scales, noted for 100 TB).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

_TAG = "__asof_side"


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    on: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> rd.Dataset:
    """Left as-of join: latest right row per key with on <= left.on."""

    lcols = left.schema().names
    rcols = right.schema().names
    allcols = list(dict.fromkeys(lcols + rcols))

    def tag(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.reindex(columns=allcols)  # pad to the union schema
            b[_TAG] = side
            return b

        return fn

    lt = left.map_batches(tag("l"), batch_format="pandas")
    rt = right.map_batches(tag("r"), batch_format="pandas")
    both = lt.union(rt)

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g[_TAG] == "l"][lcols]
        rg = g[g[_TAG] == "r"][rcols]
        if len(lg) == 0:
            return lg
        lg = lg.sort_values(on, kind="mergesort")
        if len(rg) == 0:
            return lg
        rg = rg.sort_values(on, kind="mergesort")
        keep = rg[[c for c in (right_cols or rg.columns) if c != by]]
        out = pd.merge_asof(
            lg, keep, on=on, direction="backward", suffixes=("", suffix)
        )
        return out

    return both.groupby(by).map_groups(merge_group, batch_format="pandas")
