"""Distributed join patterns the Dataset API lacks as primitives.

(``Dataset.join`` exists in Ray 2.49 but its Acero field-reference bug
makes it unusable - see functions/dedup.py; these operators express
the same semantics through the shuffle primitives that do work.)

``asof_join`` — for each left row, the latest right row of the same
key with ``on <= left.on`` (market-data-style as-of semantics). Ray
Data has no co-group primitive, so both sides are tagged, unioned and
co-partitioned in ONE shuffle; keys are hash-BUCKETED (~2 buckets per
CPU) and each bucket is matched with a single vectorized
``pandas.merge_asof(by=key)`` call over its time-sorted halves - one
Python call per bucket, never per key.

``hash_join`` — generic equi-join (inner/left/right/full-outer/semi/
anti) by the same tagged-union co-partition: one shuffle, then one
vectorized ``pandas.merge`` per bucket.

``skew_join`` — hot/cold split: heavy-hitter keys join MAP-SIDE
against a broadcast right subset (no exchange for the skewed mass),
cold keys take the bucketed ``hash_join``; lazy union.

``interval_join`` — point-in-interval (range) join by the same
co-partition: ``merge_asof`` + end-bound mask when intervals are
disjoint per key, equi-merge + range mask when they may overlap.

Partitioning assumption (documented per SURVEY's custom-operator
rule): a BUCKET (not a key) must fit a worker; bucket count scales
with the cluster. A skewed hot key that overflows its bucket is
handled outside: broadcast-join the hot subset (see
``q_join_orders_nation``) and union, or salt the key upstream the way
the CDC merge salts hot conversations (schema.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .windows import _buckets_for_cluster, _key_buckets

_TAG = "__asof_side"


def _schema_dtypes(ds: rd.Dataset, exclude: list[str]) -> dict:
    """Pandas dtype per column of a Dataset (arrow- or pandas-backed),
    minus ``exclude`` - the dtypes the tagged union's null padding will
    degrade and the merge must restore."""
    import pyarrow as _pa

    base = getattr(ds.schema(), "base_schema", None)
    if isinstance(base, _pa.Schema):
        return {
            f.name: f.type.to_pandas_dtype() for f in base if f.name not in exclude
        }
    if base is not None:  # PandasBlockSchema
        return {n: t for n, t in zip(base.names, base.types) if n not in exclude}
    return {}  # pragma: no cover


def _nullable_name(dt) -> str | None:
    """Pandas nullable-extension dtype name for an integer/bool numpy
    dtype (int64 -> Int64, uint32 -> UInt32, bool -> boolean)."""
    import numpy as _np

    try:
        s = _np.dtype(dt).name
    except TypeError:  # pragma: no cover
        return None
    if s.startswith("uint"):
        return "UInt" + s[4:]
    if s.startswith("int"):
        return "Int" + s[3:]
    if s == "bool":
        return "boolean"
    return None


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    on: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Left as-of join: latest right row per key with on <= left.on."""
    lcols = left.schema().names
    rcols = right.schema().names
    allcols = list(dict.fromkeys(lcols + rcols))
    nb = num_buckets or _buckets_for_cluster()

    def tag(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.reindex(columns=allcols)  # pad to the union schema
            b[_TAG] = side
            b["_jb"] = _key_buckets(b[by], nb)
            return b

        return fn

    lt = left.map_batches(tag("l"), batch_format="pandas")
    rt = right.map_batches(tag("r"), batch_format="pandas")
    both = lt.union(rt)

    keep_cols = [c for c in (right_cols or rcols) if c != by]
    # merge_asof emits lcols + keep_cols (the on key once, collisions
    # suffixed); every bucket must emit THIS schema, including buckets
    # where one side is empty, or downstream arrow unification breaks
    out_cols = list(lcols) + [
        (c + suffix if c in lcols else c) for c in keep_cols if c != on
    ]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g[_TAG] == "l"][lcols]
        rg = g[g[_TAG] == "r"][rcols]
        if len(lg) == 0:
            return pd.DataFrame(columns=out_cols)
        # merge_asof(by=...) matches within each key after ONE stable
        # sort by the time column per side - all keys in the bucket in
        # a single vectorized call
        lg = lg.sort_values(on, kind="mergesort")
        if len(rg) == 0:
            return lg.reindex(columns=out_cols)  # right cols all-NaN
        rg = rg.sort_values(on, kind="mergesort")
        out = pd.merge_asof(
            lg,
            rg[[by] + keep_cols],
            on=on,
            by=by,
            direction="backward",
            suffixes=("", suffix),
        )
        return out[out_cols]

    return both.groupby("_jb").map_groups(merge_bucket, batch_format="pandas")


def interval_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    by: str,
    on: str,
    start: str,
    end: str,
    how: str = "inner",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    disjoint: bool = False,
    num_buckets: int | None = None,
    hot_key_intervals: int | None = 50_000,
) -> rd.Dataset:
    """Point-in-interval join: each ``points`` row matches the
    ``intervals`` rows of the same ``by`` key with
    ``start <= points[on] <= end`` (SQL ``BETWEEN`` semantics, both
    ends closed). Ray Data has no range-join primitive, so both sides
    are tagged, unioned and co-partitioned in ONE shuffle (the
    asof/hash-join pattern), then each key bucket is matched with one
    vectorized pandas pass - never per key, never per row.

    ``how``: ``inner`` (drop unmatched points) | ``left`` (keep them,
    interval columns null).

    ``disjoint=True`` asserts the caller's intervals never overlap
    within a key (sessions, validity ranges, SCD-2 dimensions): the
    bucket match is then a single ``merge_asof`` on the interval start
    plus an end-bound mask - O(n log n), each point emits <= 1 row.

    With ``disjoint=False`` (default) overlapping intervals are
    supported via an equi-merge on the key followed by the range mask -
    per-key cost is points x intervals IN ONE BUCKET WORKER, so a hot
    key would blow up its bucket. Keys holding more than
    ``hot_key_intervals`` intervals therefore take the skew_join-style
    hot path instead: their intervals are collected once and broadcast
    (``ray.put``), and their points match MAP-SIDE in bounded tiles
    (batch x tile booleans, never key x key), streaming with the point
    scan. Memory contract: the broadcast is bounded by the hot keys'
    total interval count - the usual small-side contract. Pass
    ``hot_key_intervals=None`` to disable detection (one extra
    intervals-side pass)."""
    assert how in ("inner", "left"), how
    if not disjoint and hot_key_intervals is not None:
        hot = _interval_hot_keys(intervals, by, hot_key_intervals)
        if hot:
            return _interval_join_hot_cold(
                points, intervals, hot,
                by=by, on=on, start=start, end=end, how=how,
                right_cols=right_cols, suffix=suffix,
                num_buckets=num_buckets,
            )
    lcols = points.schema().names
    rcols = intervals.schema().names
    allcols = list(dict.fromkeys(lcols + rcols))
    nb = num_buckets or _buckets_for_cluster()

    def tag(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.reindex(columns=allcols)
            b[_TAG] = side
            b["_jb"] = _key_buckets(b[by], nb)
            return b

        return fn

    both = points.map_batches(tag("l"), batch_format="pandas").union(
        intervals.map_batches(tag("r"), batch_format="pandas")
    )

    keep = [c for c in (right_cols or rcols) if c != by]
    out_cols = list(lcols) + [(c + suffix if c in lcols else c) for c in keep]
    ldtypes = _schema_dtypes(points, exclude=[])
    rdtypes = _schema_dtypes(intervals, exclude=[by])
    casts: dict[str, object] = dict(ldtypes)
    for c in keep:
        dt = rdtypes.get(c)
        if dt is None:
            continue
        name = c + suffix if c in lcols else c
        # left-join interval columns can be legitimately null in every
        # bucket -> nullable extension dtype, bucket-independently
        casts[name] = (_nullable_name(dt) or dt) if how == "left" else dt

    def match_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g[_TAG] == "l"][lcols]
        bounds = [c for c in (start, end) if c not in keep]
        rg = g[g[_TAG] == "r"][[by] + keep + bounds]
        if len(lg) == 0:
            return pd.DataFrame(columns=out_cols)
        if len(rg) == 0:
            out = lg.reindex(columns=out_cols)
            return out if how == "left" else out.iloc[0:0]
        if disjoint:
            lg = lg.sort_values(on, kind="mergesort")
            rg = rg.sort_values(start, kind="mergesort")
            out = pd.merge_asof(
                lg,
                rg,
                left_on=on,
                right_on=start,
                by=by,
                direction="backward",
                suffixes=("", suffix),
            )
            end_c = end + suffix if end in lcols else end
            hit = (out[end_c] >= out[on]).fillna(False).to_numpy()
            if how == "inner":
                out = out[hit]
            else:
                miss_cols = [c for c in out.columns if c not in lcols]
                out.loc[~hit, miss_cols] = None
        else:
            lg = lg.assign(_pt=np.arange(len(lg)))
            out = lg.merge(rg, on=by, how="left", suffixes=("", suffix))
            s_c = start + suffix if start in lcols else start
            e_c = end + suffix if end in lcols else end
            hit = (
                (out[s_c] <= out[on]) & (out[on] <= out[e_c])
            ).fillna(False).to_numpy()
            if how == "inner":
                out = out[hit]
            else:
                matched = set(out.loc[hit, "_pt"])
                unmatched = lg[~lg["_pt"].isin(matched)].reindex(
                    columns=out.columns
                )
                out = pd.concat([out[hit], unmatched], ignore_index=True)
            out = out.drop(columns="_pt")
        out = out.reindex(columns=out_cols)
        for c, dt in casts.items():
            if c in out.columns and str(out[c].dtype) != str(dt):
                try:
                    out = out.assign(**{c: out[c].astype(dt)})
                except (TypeError, ValueError):  # pragma: no cover
                    pass
        return out

    return both.groupby("_jb").map_groups(match_bucket, batch_format="pandas")


def _interval_hot_keys(intervals: rd.Dataset, by: str, threshold: int) -> set:
    """Keys whose interval count exceeds ``threshold``. One cheap pass
    over the (small) intervals side: per-batch count partials, tiny
    groupby-sum, only above-threshold keys reach the driver."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b[by].value_counts()
        return pd.DataFrame({by: c.index, "_n": c.to_numpy()})

    from ray.data.aggregate import Sum

    counts = (
        intervals.map_batches(partial, batch_format="pandas")
        .groupby(by)
        .aggregate(Sum("_n", alias_name="_n"))
    )
    hot = counts.filter(
        lambda r, t=threshold: r["_n"] > t
    ).to_pandas()
    return set(hot[by]) if len(hot) else set()


def _interval_join_hot_cold(
    points: rd.Dataset,
    intervals: rd.Dataset,
    hot: set,
    *,
    by: str,
    on: str,
    start: str,
    end: str,
    how: str,
    right_cols: list[str] | None,
    suffix: str,
    num_buckets: int | None,
    tile: int = 4096,
) -> rd.Dataset:
    """skew_join's hot/cold split for the overlapping-interval path:
    hot keys' intervals broadcast once, their points matched map-side
    in bounded (batch x tile) boolean tiles; cold keys take the
    ordinary one-shuffle bucketed path. Result rows equal the plain
    path exactly - only the routing differs."""
    import numpy as np
    import ray

    lcols = points.schema().names
    rcols = intervals.schema().names
    keep = [c for c in (right_cols or rcols) if c != by]
    out_cols = list(lcols) + [(c + suffix if c in lcols else c) for c in keep]
    rdtypes = _schema_dtypes(intervals, exclude=[by])
    casts: dict[str, object] = dict(_schema_dtypes(points, exclude=[]))
    for c in keep:
        dt = rdtypes.get(c)
        if dt is None:
            continue
        name = c + suffix if c in lcols else c
        casts[name] = (_nullable_name(dt) or dt) if how == "left" else dt

    # cold side: the ordinary bucketed exchange, detection disabled
    cold_pts = points.map_batches(
        lambda b, h=frozenset(hot): b[~b[by].isin(h)], batch_format="pandas"
    )
    cold_ivs = intervals.map_batches(
        lambda b, h=frozenset(hot): b[~b[by].isin(h)], batch_format="pandas"
    )
    cold = interval_join(
        cold_pts, cold_ivs,
        by=by, on=on, start=start, end=end, how=how,
        right_cols=right_cols, suffix=suffix, disjoint=False,
        num_buckets=num_buckets, hot_key_intervals=None,
    )

    # hot side: collect ONLY the hot keys' intervals, broadcast once
    bounds = [c for c in (start, end) if c not in keep]
    ikeep = [by] + keep + bounds

    def ihot(b: pd.DataFrame) -> pd.DataFrame:
        return b[b[by].isin(hot)][ikeep]

    hot_ivs = (
        intervals.map_batches(ihot, batch_format="pandas")
        .to_pandas()
        .reset_index(drop=True)
    )
    per_key = {
        k: (
            g[start].to_numpy(),
            g[end].to_numpy(),
            g.reset_index(drop=True),
        )
        for k, g in hot_ivs.groupby(by, sort=False)
    }
    hot_ref = ray.put((frozenset(hot), per_key))

    class HotMatch:
        """Actor-pool stage: broadcast intervals fetched once per actor."""

        def __init__(self):
            self.hot, self.per_key = ray.get(hot_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            lb = b[b[by].isin(self.hot)]
            outs = []
            for k, g in lb.groupby(by, sort=False):
                starts, ends, attrs = self.per_key[k]
                t = g[on].to_numpy()
                pidx: list[np.ndarray] = []
                iidx: list[np.ndarray] = []
                for lo in range(0, len(starts), tile):
                    s_t = starts[lo: lo + tile]
                    e_t = ends[lo: lo + tile]
                    m = (s_t[None, :] <= t[:, None]) & (t[:, None] <= e_t[None, :])
                    pi, ii = np.nonzero(m)
                    if len(pi):
                        pidx.append(pi)
                        iidx.append(ii + lo)
                if pidx:
                    pi = np.concatenate(pidx)
                    ii = np.concatenate(iidx)
                    left_part = g.iloc[pi].reset_index(drop=True)
                    right_part = attrs.iloc[ii].reset_index(drop=True)
                    right_part = right_part.rename(
                        columns={
                            c: (c + suffix if c in lcols else c)
                            for c in right_part.columns
                            if c != by
                        }
                    ).drop(columns=[by])
                    matched = pd.concat([left_part, right_part], axis=1)
                else:
                    pi = np.array([], dtype=np.int64)
                    matched = g.iloc[0:0].reindex(columns=out_cols)
                if how == "left":
                    miss = g.iloc[~np.isin(np.arange(len(g)), pi)]
                    matched = pd.concat(
                        [matched, miss.reindex(columns=matched.columns)],
                        ignore_index=True,
                    )
                outs.append(matched)
            out = (
                pd.concat(outs, ignore_index=True)
                if outs
                else lb.reindex(columns=out_cols)
            )
            out = out.reindex(columns=out_cols)
            for c, dt in casts.items():
                if c in out.columns and str(out[c].dtype) != str(dt):
                    try:
                        out = out.assign(**{c: out[c].astype(dt)})
                    except (TypeError, ValueError):  # pragma: no cover
                        pass
            return out

    hot_out = points.map_batches(
        HotMatch, batch_format="pandas", concurrency=(1, 8)
    )
    return cold.union(hot_out)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str | list[str],
    how: str = "inner",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    num_buckets: int | None = None,
    coalesce: bool | int = False,
) -> rd.Dataset:
    """Distributed hash equi-join: both sides tagged and unioned so
    co-partitioning costs ONE shuffle, keys hash-bucketed (~2
    buckets/CPU), one vectorized ``pandas.merge``/``isin`` per bucket.

    ``how``: ``inner`` | ``left`` | ``right`` | ``outer`` (full outer)
    | ``semi`` (left rows WITH a right match, left columns only, no
    duplication from multi-matches) | ``anti`` (left rows WITHOUT a
    right match — the dedup/"not yet processed" filter join).

    For a small right side prefer the broadcast pattern
    (``q_join_orders_nation``) - no shuffle at all. Use this when both
    sides are large."""
    assert how in ("inner", "left", "right", "outer", "semi", "anti"), how
    on_cols = [on] if isinstance(on, str) else list(on)
    lschema, rschema = left.schema(), right.schema()
    if lschema is None:
        raise ValueError("hash_join: left dataset is empty with no schema")
    if rschema is None:
        # empty right with unknown schema: inner/semi/right match
        # nothing; left/anti/outer keep every left row (right columns
        # are unknowable, so the result carries left columns only)
        return left.limit(0) if how in ("inner", "semi", "right") else left
    lcols = lschema.names
    rcols = rschema.names
    allcols = list(dict.fromkeys(lcols + rcols))
    nb = num_buckets or _buckets_for_cluster()

    def tag(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.reindex(columns=allcols)
            b[_TAG] = side
            b["_jb"] = _key_buckets(b[on_cols[0]], nb)
            return b

        return fn

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )
    if coalesce:
        # Pre-sort coalesce for BOUNDED-size inputs: the sort-shuffle
        # emits in-blocks x out-blocks split objects whose driver-side
        # metadata dominates iterative algorithms (graph state). True
        # coalesces to nb blocks; an int gives the block target (use
        # a size-aware value for mixed-size joins). Opt-in because it
        # caps total block count — never set it blind on corpus-scale
        # joins.
        both = both.repartition(
            nb if coalesce is True else int(coalesce), shuffle=False
        )

    # BOTH sides' payload dtypes degrade to float64 through the
    # null-padded tagged union; restore them after the merge. The cast
    # policy must be bucket-INDEPENDENT so every block agrees: a
    # payload column that can carry JOIN-INDUCED nulls (right payload
    # in a left join, left payload in a right join, both in a full
    # outer) goes to the pandas NULLABLE extension dtype (Int64/
    # boolean) in EVERY bucket, matched or not; the rest cast back to
    # their original dtype.
    ldtypes = _schema_dtypes(left, exclude=on_cols)
    rdtypes = _schema_dtypes(right, exclude=on_cols)
    casts: dict[str, object] = {
        c: (_nullable_name(dt) or dt) if how in ("right", "outer") else dt
        for c, dt in ldtypes.items()
    }
    for c, dt in rdtypes.items():
        if how in ("left", "outer"):
            casts[c] = _nullable_name(dt) or dt
        else:
            casts[c] = dt

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g[_TAG] == "l"][lcols]
        keep = on_cols + [
            c for c in (right_cols or rcols) if c not in on_cols
        ]
        rg = g[g[_TAG] == "r"][keep]
        if how in ("semi", "anti"):
            rk = rg[on_cols].drop_duplicates()
            mask = (
                lg[on_cols]
                .merge(rk.assign(_hit=1), on=on_cols, how="left")["_hit"]
                .notna()
                .to_numpy()
            )
            out = lg[mask if how == "semi" else ~mask]
            for c, dt in ldtypes.items():
                if c in out.columns and str(out[c].dtype) != str(dt):
                    out = out.assign(**{c: out[c].astype(dt)})
            return out
        out = lg.merge(rg, on=on_cols, how=how, suffixes=("", suffix))
        for c, dt in casts.items():
            if c in out.columns and str(out[c].dtype) != str(dt):
                try:
                    out[c] = out[c].astype(dt)
                except (TypeError, ValueError):  # pragma: no cover
                    pass
        return out

    return both.groupby("_jb").map_groups(merge_bucket, batch_format="pandas")


def skew_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    how: str = "inner",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    hot_den: int = 1000,
    hot_keys: set | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Skew-aware equi-join: keys holding more than ``1/hot_den`` of
    the left side short-circuit the shuffle entirely - their right-side
    rows are collected once, broadcast via ``ray.put``, and joined
    MAP-SIDE per batch (the hot rows, by definition most of the data,
    never enter an exchange); the remaining cold keys take the ordinary
    bucketed ``hash_join``. The union of the two streams is lazy block
    concatenation - no further exchange. This is the hot/cold split
    engines apply internally for skewed joins, exposed as a composable
    operator (the CDC merge's hot-conversation salting is the same idea
    on the write path, schema.py).

    Hot detection uses ``heavy_hitters`` (Misra-Gries + exact recount,
    sketch-sized traffic) unless the caller passes ``hot_keys``.
    Cost shape, stated: the left side is scanned twice (hot pass + cold
    pass; three times when detection runs) - scans are cheap, exchanges
    are not; the broadcast is bounded by (#hot keys x right rows per
    key), the same small-side contract as any broadcast join.

    ``how``: ``inner`` | ``left``. Result rows equal
    ``hash_join(left, right, on, how)`` exactly; only the routing
    differs."""
    assert how in ("inner", "left"), how
    if hot_keys is None:
        from .aggregates import heavy_hitters

        hot_keys = set(heavy_hitters(left, on, den=hot_den)[on])
    if not hot_keys:
        return hash_join(
            left, right, on=on, how=how, right_cols=right_cols,
            suffix=suffix, num_buckets=num_buckets,
        )
    import ray

    rcols = right.schema().names
    keep = [on] + [c for c in (right_cols or rcols) if c != on]
    hot_list = sorted(hot_keys)

    def rhot(b: pd.DataFrame) -> pd.DataFrame:
        return b[b[on].isin(hot_keys)][keep]

    right_hot = right.map_batches(rhot, batch_format="pandas").to_pandas()
    hot_ref = ray.put((frozenset(hot_list), right_hot))
    rdtypes = _schema_dtypes(right, exclude=[on])
    casts = {
        c: (_nullable_name(rdtypes[c]) or rdtypes[c]) if how == "left" else rdtypes[c]
        for c in keep
        if c != on and c in rdtypes
    }

    class HotJoin:
        def __init__(self):
            self.hot, self.rh = ray.get(hot_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            lb = b[b[on].isin(self.hot)]
            out = lb.merge(self.rh, on=on, how=how, suffixes=("", suffix))
            for c, dt in casts.items():
                name = c + suffix if c in b.columns and c != on else c
                if name in out.columns and str(out[name].dtype) != str(dt):
                    try:
                        out[name] = out[name].astype(dt)
                    except (TypeError, ValueError):  # pragma: no cover
                        pass
            return out

    hot_stream = left.map_batches(HotJoin, batch_format="pandas",
                                  concurrency=(1, 8))

    def lcold(b: pd.DataFrame) -> pd.DataFrame:
        return b[~b[on].isin(hot_keys)]

    def rcold(b: pd.DataFrame) -> pd.DataFrame:
        return b[~b[on].isin(hot_keys)]

    cold_stream = hash_join(
        left.map_batches(lcold, batch_format="pandas"),
        right.map_batches(rcold, batch_format="pandas"),
        on=on,
        how=how,
        right_cols=right_cols,
        suffix=suffix,
        num_buckets=num_buckets,
    )
    return hot_stream.union(cold_stream)


def _distinct_on(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """DISTINCT over ``cols``: per-batch local dedup (drop_duplicates,
    C-level) shrinks the stream, then one groupby over the key columns
    keeps one row per group — the exchange carries distinct rows per
    block, not the raw stream."""
    local = ds.map_batches(
        lambda b: b[cols].drop_duplicates(), batch_format="pandas"
    )
    # count() is a fully vectorized aggregate (no per-group Python);
    # the count column is dropped — one row per distinct key remains
    return local.groupby(cols).count().drop_columns(["count()"])


def set_intersect(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``INTERSECT`` (distinct): rows of ``on`` present on BOTH
    sides — distinct left, then one bucketed semi-join against the
    right keys. Two exchanges total, both carrying distinct keys."""
    return hash_join(
        _distinct_on(left, on), right, on=on, how="semi",
        num_buckets=num_buckets,
    )


def set_except(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``EXCEPT`` (distinct): distinct left rows with NO match on
    the right — distinct left + one bucketed anti-join."""
    return hash_join(
        _distinct_on(left, on), right, on=on, how="anti",
        num_buckets=num_buckets,
    )
