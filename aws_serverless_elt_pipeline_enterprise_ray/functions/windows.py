"""Event-time window operators over keyed streams.

Ray Data has no event-time windows or watermarks (SURVEY §2.9), so
stream-shaped semantics are expressed as bucketed group reductions:

* ``sessionize`` - gap-based session windows: a new session starts
  when the gap to the previous event of the same key exceeds ``gap``.

Scale shape: keys are hash-bucketed into a BOUNDED number of groups
(~2/CPU), and each group call computes sessions for ALL its keys with
one vectorized pandas pass (sort -> key-boundary + gap masks -> cumsum
-> C-level groupby aggregate). The naive ``groupby(key).map_groups``
form pays one Python call per key - at 10^8 users that per-key overhead
dominates everything; this form pays ~2 calls per CPU total.

Tumbling windows need no grouping at all (floor the timestamp inside
``map_batches`` + a small groupby - see ``q_window_events_hourly``).
Ordering assumption: windows are computed per key after an in-group
sort by (ts, tiebreak); late events are simply sorted into place, so
re-running after late data lands gives the corrected windows (no
incremental watermark state - this is a batch-over-log engine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _key_buckets(v: pd.Series, nb: int) -> np.ndarray:
    """Cross-process-deterministic bucket of a key column (Python's
    builtin hash is per-process salted and must never shuffle). Null
    keys land deterministically in bucket 0 — they are a single group
    and must co-locate like any other key."""
    isna = v.isna().to_numpy()
    if pd.api.types.is_integer_dtype(v):
        arr = (v.fillna(0) if isna.any() else v).to_numpy().astype(np.int64)
        out = ((arr % nb) + nb) % nb
    else:
        from ..schema import hash_strings

        # polars rejects mixed str/NaN object arrays; nulls get their
        # bucket overwritten below, so hash a placeholder for them.
        if isna.any() and not pd.api.types.is_numeric_dtype(v):
            v = v.fillna("")
        out = (hash_strings(v.to_numpy()) % np.uint64(nb)).astype(np.int64)
    if isna.any():
        out = np.where(isna, 0, out)
    return out


def _buckets_for_cluster() -> int:
    """Canonical bucket count for bucketed group reductions: ~2 per
    CPU so per-group Python overhead stays constant while every core
    keeps a group. Shared by sessionize, joins, aggregates, packing."""
    try:
        import ray

        return max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:  # pragma: no cover
        return 32


def bucketed_agg(
    ds: rd.Dataset,
    key: str | list[str],
    aggs: dict[str, str],
    *,
    nb: int | None = None,
    bucket_key: str | None = None,
) -> rd.Dataset:
    """High-cardinality group reduction: sum/min/max/count ``aggs``
    value columns per ``key`` with ONE bounded-fanout shuffle.

    Ray 2.49's built-in ``groupby(key).aggregate(...)`` pays per-
    DISTINCT-KEY Python in its combine step (``table_block.iter_groups``
    + a pandas ``take`` per group): measured 40s for 200k rows / 50k
    keys at 16 CPUs where this shape takes ~1s, and it gets linearly
    worse with key cardinality — unusable for node-keyed graph state.
    Here each block first combines locally (C-level pandas groupby),
    rows are hash-bucketed into ``nb`` (~2/CPU) partitions on the FIRST
    key, and each bucket reduces all its keys with one vectorized
    groupby — per-group Python cost is ~2 calls per CPU total,
    independent of key cardinality.

    ``aggs``: {value_col: 'sum' | 'min' | 'max' | 'count'}; 'count'
    counts rows per key into a NEW column of that name (the value_col
    need not pre-exist). Output columns: keys + list(aggs), int/float
    dtypes preserved (counts are int64). ``bucket_key``: which key
    column to hash-bucket on (default the first) — pick a HIGH-
    cardinality one, or every row lands in a handful of buckets."""
    keys = [key] if isinstance(key, str) else list(key)
    bucket_key = bucket_key or keys[0]
    assert bucket_key in keys, (bucket_key, keys)
    P = nb or _buckets_for_cluster()
    count_cols = [c for c, op in aggs.items() if op == "count"]
    other = {c: op for c, op in aggs.items() if op != "count"}
    bad = set(other.values()) - {"sum", "min", "max"}
    assert not bad, f"unsupported agg ops: {bad}"

    def _combine(b: pd.DataFrame, counts_are_sums: bool) -> pd.DataFrame:
        # dropna=False: null keys are a group like any other (matches
        # both SQL GROUP BY and the Ray groupby().aggregate() this
        # replaced); pandas' default silently drops those rows.
        g = b.groupby(keys, sort=False, dropna=False)
        parts = []
        if other:
            parts.append(g.agg(other))
        if count_cols:
            if counts_are_sums:
                parts.append(g[count_cols].sum())
            else:
                s = g.size()
                parts.append(
                    pd.DataFrame({c: s for c in count_cols}, index=s.index)
                )
        out = pd.concat(parts, axis=1).reset_index()
        return out[keys + list(aggs)]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = _combine(b, counts_are_sums=False)
        out["_gb"] = _key_buckets(out[bucket_key], P)
        return out

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return _combine(g, counts_are_sums=True)

    return (
        ds.map_batches(partial, batch_format="pandas")
        # Coalesce partials to P blocks BEFORE the sort-shuffle: the
        # sort emits input-blocks x output-blocks split objects whose
        # driver-side metadata dominates at high block counts (a
        # 256-block input cost ~1.4GB of driver heap in refs alone);
        # P blocks in -> P^2 splits, bounded by cluster size.
        .repartition(P, shuffle=False)
        .groupby("_gb")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def bucketed_distinct(
    ds: rd.Dataset,
    keys: str | list[str],
    *,
    nb: int | None = None,
    bucket_key: str | None = None,
) -> rd.Dataset:
    """DISTINCT over ``keys`` with one bounded-fanout shuffle (the
    high-cardinality-safe replacement for ``groupby(keys).count()``;
    see ``bucketed_agg`` for why the built-in path is unusable at node
    cardinality). Rows dedupe per block first, bucket on ``bucket_key``
    (default the first key; a key tuple always lands in its bucket
    column's bucket — pick a high-cardinality one), then dedupe once
    per bucket — the shuffle carries per-block distincts."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    bucket_key = bucket_key or ks[0]
    assert bucket_key in ks, (bucket_key, ks)
    P = nb or _buckets_for_cluster()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[ks].drop_duplicates().copy()
        out["_gb"] = _key_buckets(out[bucket_key], P)
        return out

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g[ks].drop_duplicates()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(P, shuffle=False)  # see bucketed_agg: P^2 splits
        .groupby("_gb")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def sessionize(
    ds: rd.Dataset,
    *,
    key: str,
    ts_col: str = "ts",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    tiebreak: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key session aggregation: one row per (key, session_id) with
    n_events, session_start, session_end. ``session_id`` is 1-based in
    time order within each key."""
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_sb"] = _key_buckets(b[key], num_buckets)
        return b

    def build_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = [key, ts_col] + ([tiebreak] if tiebreak else [])
        g = g.sort_values(order, kind="mergesort")
        key_change = (g[key] != g[key].shift()).to_numpy()
        gap_break = (g[ts_col].diff() > gap).to_numpy()
        sid = np.cumsum(key_change | gap_break)
        out = (
            g.assign(_sid=sid)
            .groupby("_sid", sort=True)
            .agg(
                **{
                    key: (key, "first"),
                    "n_events": (ts_col, "size"),
                    "session_start": (ts_col, "min"),
                    "session_end": (ts_col, "max"),
                }
            )
            .reset_index(drop=True)
        )
        # 1-based session numbering within each key (groups arrive in
        # (key, time) order, so cumcount is the per-key session rank)
        out.insert(1, "session_id", out.groupby(key, sort=False).cumcount() + 1)
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sb")
        .map_groups(build_bucket, batch_format="pandas")
    )


def trailing_window(
    ds: rd.Dataset,
    *,
    key: str,
    ts_col: str = "ts",
    window: pd.Timedelta = pd.Timedelta(hours=1),
    value_col: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-event trailing-window aggregate: for every event, the count
    (and sum of ``value_col``) of the key's events in
    ``[ts - window, ts]`` — ANSI ``RANGE BETWEEN window PRECEDING AND
    CURRENT ROW`` semantics, peers (equal timestamps) included.

    Fully vectorized per bucket with ZERO per-key Python: rows sort by
    (key, ts) once, each key segment's timestamps are shifted by
    ``segment_id * OFFSET`` (OFFSET > global span + window) so the
    shifted array is globally monotone and two ``np.searchsorted``
    calls find every row's window boundaries without ever crossing a
    key boundary; sums come from a prefix-sum difference. One bucketed
    shuffle total (~2 buckets/CPU)."""
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()
    win_us = np.int64(window // pd.Timedelta(microseconds=1))

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_wb"] = _key_buckets(b[key], num_buckets)
        return b

    def window_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort").drop(columns="_wb")
        ts = g[ts_col].astype("datetime64[us]").to_numpy().view("i8")
        seg = np.cumsum((g[key] != g[key].shift()).to_numpy())
        span = np.int64((ts.max() - ts.min()) if len(ts) else 0)
        offset = span + win_us + np.int64(1)
        shifted = ts + seg * offset
        start = np.searchsorted(shifted, shifted - win_us, side="left")
        end = np.searchsorted(shifted, shifted, side="right")
        g["trailing_n"] = (end - start).astype("int64")
        if value_col is not None:
            v = g[value_col].to_numpy()
            if np.issubdtype(v.dtype, np.integer):
                # integer prefix sums are exact (and SQL-hash-stable)
                csum = np.concatenate(
                    [np.zeros(1, np.int64), np.cumsum(v.astype(np.int64))]
                )
                g["trailing_sum"] = (csum[end] - csum[start]).astype("int64")
            else:
                csum = np.concatenate(
                    [[0.0], np.cumsum(v.astype(np.float64))]
                )
                g["trailing_sum"] = csum[end] - csum[start]
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_wb")
        .map_groups(window_bucket, batch_format="pandas")
    )


def rank_in_group(
    ds: rd.Dataset,
    *,
    key: str,
    order_col: str,
    tiebreak: str | None = None,
    descending: bool = False,
    method: str | list[str] = "row_number",
    out_col: str | list[str] = "rank",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key ranking (the ``row_number()/rank()/dense_rank()/
    percent_rank()/cume_dist() OVER (PARTITION BY key ORDER BY ...)``
    family) without per-key Python: keys hash-bucket into ~2 groups
    per CPU, each group sorts ONCE by (key, order, tiebreak) and ranks
    every key with numpy cumulative masks - key boundaries reset the
    counter, equal order values share a rank for ``rank``/
    ``dense_rank``. 1-based, like SQL. ``percent_rank``/``cume_dist``
    reduce to straight-line double divisions of exact integers, so
    they hash-match SQL engines computing the standard formulas.

    ``method``/``out_col`` accept parallel LISTS to emit several
    window functions from the same single shuffle + sort.

    ``topk_per_group`` (aggregates.py) is the better tool when only the
    first k rows per key are needed (it prunes before the shuffle);
    this operator RETAINS every row, annotated - sampling curricula,
    per-user recency indexes, "nth attempt" features."""
    methods = [method] if isinstance(method, str) else list(method)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    assert len(methods) == len(out_cols), (methods, out_cols)
    for m in methods:
        assert m in (
            "row_number",
            "rank",
            "dense_rank",
            "percent_rank",
            "cume_dist",
        ), m
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_rb"] = _key_buckets(b[key], num_buckets)
        return b

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = [key, order_col] + ([tiebreak] if tiebreak else [])
        asc = [True, not descending] + ([True] if tiebreak else [])
        g = g.sort_values(order, ascending=asc, kind="mergesort").drop(
            columns="_rb"
        )
        key_change = (g[key] != g[key].shift()).to_numpy()
        n = len(g)
        pos = np.arange(n, dtype=np.int64)
        # index of each row's key-segment start
        seg_start = np.maximum.accumulate(np.where(key_change, pos, 0))
        row_number = pos - seg_start + 1
        order_change = key_change | (
            (g[order_col] != g[order_col].shift()).to_numpy()
        )
        first_peer = np.maximum.accumulate(np.where(order_change, pos, 0))
        cnt = None
        for m, oc in zip(methods, out_cols):
            if m == "row_number":
                g[oc] = row_number
                continue
            if m == "rank":
                # rank = row_number of the first peer in the segment
                g[oc] = first_peer - seg_start + 1
                continue
            if m == "dense_rank":
                # count of order changes within the segment
                changes = np.cumsum(order_change)
                at_start = np.maximum.accumulate(
                    np.where(key_change, changes, 0)
                )
                g[oc] = changes - at_start + 1
                continue
            if not n:
                g[oc] = np.zeros(0, np.float64)
                continue
            if cnt is None:
                seg_id = np.cumsum(key_change)
                cnt = np.bincount(seg_id)[seg_id]
            if m == "percent_rank":
                # (rank - 1) / (count - 1); 0.0 for single-row keys
                rank = first_peer - seg_start + 1
                denom = np.maximum(cnt - 1, 1)
                g[oc] = np.where(cnt > 1, (rank - 1) / denom, 0.0)
            else:  # cume_dist = (# rows ordered <= current) / count
                # position AFTER each row's last peer = first change
                # strictly after it (key_change folds into order_change,
                # so segments bound the scan)
                chg_pos = np.where(order_change, pos, n)
                first_chg_at_or_after = np.minimum.accumulate(
                    chg_pos[::-1]
                )[::-1]
                peers_end = np.concatenate(
                    [first_chg_at_or_after[1:], [n]]
                )
                # rows whose NEXT change is beyond the segment end stop
                # at the segment end: segment end = seg_start + cnt
                peers_end = np.minimum(peers_end, seg_start + cnt)
                g[oc] = (peers_end - seg_start) / cnt
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_rb")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def cumulate_in_group(
    ds: rd.Dataset,
    *,
    key: str,
    order_cols: list[str],
    value_cols: list[str] | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Running per-key aggregates under a total order — the SQL
    ``SUM(v) / COUNT(*) OVER (PARTITION BY key ORDER BY ... ROWS
    UNBOUNDED PRECEDING)`` family. Adds ``cum_n`` (running row count)
    and ``cum_<col>`` (running sum) for each of ``value_cols``.

    Include a unique tiebreaker in ``order_cols`` for a total order:
    ROWS-frame running sums are order-sensitive across ties, so only a
    total order gives a deterministic (and SQL-comparable) result.

    Same one-bucketed-shuffle shape as ``rank_in_group``: each bucket
    sorts once by (key, *order_cols); the running sum is one global
    ``np.cumsum`` rebased at key boundaries (cumsum minus the cumsum
    just before each row's segment start) — zero per-key Python.
    Integer columns accumulate in exact int64 (bit-identical to any
    SQL engine); float columns accumulate in float64 via the global
    cumsum rebased per segment, which can differ from a per-partition
    sequential sum in the last ulp — use integerized units (cents,
    micros) when exact SQL parity matters."""
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()
    value_cols = list(value_cols or [])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_cb"] = _key_buckets(b[key], num_buckets)
        return b

    def cum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_cols], kind="mergesort").drop(
            columns="_cb"
        )
        n = len(g)
        key_change = (g[key] != g[key].shift()).to_numpy()
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(key_change, pos, 0))
        g["cum_n"] = pos - seg_start + 1
        for c in value_cols:
            v = g[c].to_numpy()
            if np.issubdtype(v.dtype, np.integer):
                total = np.cumsum(v.astype(np.int64))
            else:
                total = np.cumsum(v.astype(np.float64))
            # running-within-segment = total - total[just before start]
            base = np.where(seg_start > 0, total[seg_start - 1], 0)
            g[f"cum_{c}"] = total - base
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_cb")
        .map_groups(cum_bucket, batch_format="pandas")
    )


def first_last_in_group(
    ds: rd.Dataset,
    *,
    key: str,
    order_cols: list[str],
    value_cols: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``FIRST_VALUE / LAST_VALUE OVER (PARTITION BY key ORDER BY
    ... ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)``:
    every row annotated with its key's first and last value under the
    total order — "time since first touch", "final state on every
    row" features without a self-join.

    One bucketed shuffle; per bucket one sort, then first/last are two
    numpy gathers at segment boundaries (seg_start forward-fill and
    its reverse twin) — zero per-key Python. Adds ``first_<col>`` /
    ``last_<col>``."""
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_fb"] = _key_buckets(b[key], num_buckets)
        return b

    def fl_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_cols], kind="mergesort").drop(
            columns="_fb"
        )
        n = len(g)
        key_change = (g[key] != g[key].shift()).to_numpy()
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(key_change, pos, 0))
        # segment end (inclusive): reverse of the start trick
        key_change_rev = np.r_[key_change[1:], True]
        seg_end = np.minimum.accumulate(
            np.where(key_change_rev, pos, n - 1)[::-1]
        )[::-1]
        for c in value_cols:
            v = g[c].to_numpy()
            g[f"first_{c}"] = v[seg_start] if n else v
            g[f"last_{c}"] = v[seg_end] if n else v
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_fb")
        .map_groups(fl_bucket, batch_format="pandas")
    )


def ewma_in_group(
    ds: rd.Dataset,
    *,
    key: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key exponentially-weighted moving average in event order —
    the streaming recursion y_t = (1−α)·y_{t−1} + α·x_t (pandas
    ``ewm(adjust=False)``), the smoothing/trend primitive for per-user
    rates and drift monitors.

    Same one-bucketed-shuffle shape as the other window kernels; the
    recursion runs as ONE grouped-Cython ``groupby(...).ewm(...)``
    pass per bucket (pandas GroupbyIndexer — per-group boundaries over
    a single concatenated array, no per-key Python). Adds
    ``ewma_<col>``. Float output ⇒ verified against a single-process
    reference in pytest rather than a SQL oracle (the recursion has no
    order-independent SQL form)."""
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_eb"] = _key_buckets(b[key], num_buckets)
        return b

    def ewma_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_cols], kind="mergesort").drop(
            columns="_eb"
        )
        g[f"ewma_{value_col}"] = (
            g.groupby(key, sort=False)[value_col]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .reset_index(level=0, drop=True)
        )
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_eb")
        .map_groups(ewma_bucket, batch_format="pandas")
    )


def lag_lead(
    ds: rd.Dataset,
    *,
    key: str,
    order_cols: list[str],
    cols: list[str],
    num_buckets: int | None = None,
    shifts: tuple[int, ...] = (1,),
) -> rd.Dataset:
    """SQL navigation window functions: per-key LAG/LEAD of ``cols``
    under ``ORDER BY order_cols`` (include a unique tiebreaker for a
    total order — SQL leaves ties unspecified; this kernel is
    deterministic for whatever order you give it).

    Same scale shape as ``trailing_window``: ONE key-bucketed shuffle
    (~2 buckets/CPU), then each bucket sorts by (key, *order_cols)
    once and shifts whole columns by ±k with key-boundary rows masked
    to null — zero per-key Python. For shift 1 the columns are
    ``lag_<col>`` / ``lead_<col>`` (back-compat); further ``shifts``
    add ``lag<k>_<col>`` / ``lead<k>_<col>`` — n-gram sequence mining
    gets all its offsets from the same single shuffle + sort.
    """
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_wb"] = _key_buckets(b[key], num_buckets)
        return b

    def shift_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_cols], kind="mergesort").drop(
            columns="_wb"
        )
        for s in shifts:
            same_prev = (g[key] == g[key].shift(s)).to_numpy()
            same_next = (g[key] == g[key].shift(-s)).to_numpy()
            tag = "" if s == 1 else str(s)
            for c in cols:
                g[f"lag{tag}_{c}"] = g[c].shift(s).where(same_prev)
                g[f"lead{tag}_{c}"] = g[c].shift(-s).where(same_next)
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_wb")
        .map_groups(shift_bucket, batch_format="pandas")
    )


def ntile_in_group(
    ds: rd.Dataset,
    *,
    key: str,
    order_col: str,
    n_tiles: int,
    tiebreak: str | None = None,
    descending: bool = False,
    out_col: str = "tile",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY ...)``: rows of
    each key split into ``n`` tiles as evenly as possible, the first
    ``count % n`` tiles one row larger (the SQL remainder rule).

    Same one-bucketed-shuffle shape as ``rank_in_group``: each bucket
    sorts once; row numbers and per-key counts come from cumulative
    masks, and the tile is a closed-form vectorized function of
    (row_number, key_count, n) — zero per-key Python. Curriculum /
    difficulty binning per stratum is the LLM-pipeline use."""
    assert n_tiles >= 1
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_nb"] = _key_buckets(b[key], num_buckets)
        return b

    def tile_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = [key, order_col] + ([tiebreak] if tiebreak else [])
        asc = [True, not descending] + ([True] if tiebreak else [])
        g = g.sort_values(order, ascending=asc, kind="mergesort").drop(
            columns="_nb"
        )
        key_change = (g[key] != g[key].shift()).to_numpy()
        n = len(g)
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(key_change, pos, 0))
        rn0 = pos - seg_start  # 0-based row number within key
        # per-key count, broadcast back to rows: segment end - start
        seg_id = np.cumsum(key_change)
        cnt = np.bincount(seg_id)[seg_id]
        base = cnt // n_tiles
        rem = cnt % n_tiles
        big = rem * (base + 1)  # rows covered by the (base+1)-sized tiles
        in_big = rn0 < big
        with np.errstate(divide="ignore", invalid="ignore"):
            tile_big = rn0 // np.maximum(base + 1, 1)
            tile_small = rem + (rn0 - big) // np.maximum(base, 1)
        g[out_col] = np.where(in_big, tile_big, tile_small).astype("int64") + 1
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_nb")
        .map_groups(tile_bucket, batch_format="pandas")
    )


def resample_fill(
    ds: rd.Dataset,
    *,
    key: str,
    ts_col: str,
    bucket_us: int = 3_600_000_000,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key time-series resampling with GAP FILLING: event counts
    per fixed bucket (default 1h), with every empty bucket between a
    key's first and last event emitted as an explicit 0 — downstream
    rate/trend math (EWMA, drift monitors) needs the zeros that a
    plain groupby silently drops.

    One exchange of per-(key, bucket) count partials (partial-agg
    before the shuffle, the tumbling-window shape), then a key-bucketed
    fill: per bucket the dense grid is ONE repeat/arange explode + a
    merge against the observed counts — zero per-key Python. Returns
    (key, bucket_start_us, n). Span is bounded by (max−min)/bucket per
    key; keys whose span explodes the grid are the caller's signal to
    coarsen ``bucket_us``."""
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[ts_col].astype("datetime64[us]").view("int64")
        d = pd.DataFrame(
            {key: b[key], "bs": (t // bucket_us) * bucket_us}
        )
        return d.groupby([key, "bs"], sort=False).size().reset_index(name="n")

    from ray.data.aggregate import Sum as _Sum

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([key, "bs"])
        .aggregate(_Sum("n", alias_name="n"))
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_sb"] = _key_buckets(b[key], num_buckets)
        return b

    def fill_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_sb")
        span = g.groupby(key, sort=False)["bs"].agg(["min", "max"])
        k = ((span["max"] - span["min"]) // bucket_us + 1).to_numpy(np.int64)
        total = int(k.sum())
        rows = np.repeat(np.arange(len(span)), k)
        j = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(k) - k, k)
        grid = pd.DataFrame(
            {
                key: span.index.to_numpy()[rows],
                "bs": span["min"].to_numpy()[rows] + j * bucket_us,
            }
        )
        out = grid.merge(g, on=[key, "bs"], how="left")
        out["n"] = out["n"].fillna(0).astype("int64")
        return out

    return (
        counts.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sb")
        .map_groups(fill_bucket, batch_format="pandas")
    )


def funnel_steps(
    ds: rd.Dataset,
    *,
    key: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Ordered-funnel analysis (MATCH_RECOGNIZE-lite): for each key,
    greedily match ``steps`` in order — step i+1 must occur STRICTLY
    after the earliest completion time of step i. Returns one row per
    key: ``(key, steps_completed, last_step_ts)`` (ts of the deepest
    completed step; keys with zero matches are omitted — every key
    with at least one step-0 event appears).

    One key-bucketed shuffle; within each bucket every step is ONE
    vectorized pass (boolean mask + ``groupby(key).min`` + map back),
    so cost is O(len(steps)) passes with zero per-key Python. The
    conversion-rate / sequence-mining primitive over event streams.
    """
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_fb"] = _key_buckets(b[key], num_buckets)
        return b

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_fb")
        ts = g[ts_col].to_numpy()
        first = g[g[type_col] == steps[0]].groupby(key, sort=False)[ts_col].min()
        if len(first) == 0:
            return pd.DataFrame(
                {key: [], "steps_completed": [], "last_step_ts": []}
            )
        depth = pd.Series(np.int64(1), index=first.index)
        cur_ts = first.copy()
        for i in range(1, len(steps)):
            # only keys whose frontier is EXACTLY step i may advance —
            # no step-skipping
            elig_ts = cur_ts[depth == i]
            if len(elig_ts) == 0:
                break
            pmap = g[key].map(elig_ts).to_numpy()
            mask = (
                (g[type_col] == steps[i]).to_numpy()
                & pd.notna(pmap)
                & (ts > pmap)
            )
            hit = g[mask]
            if len(hit) == 0:
                break
            cur = hit.groupby(key, sort=False)[ts_col].min()
            depth.loc[cur.index] = i + 1
            cur_ts.loc[cur.index] = cur
        return pd.DataFrame(
            {
                key: depth.index,
                "steps_completed": depth.to_numpy(np.int64),
                "last_step_ts": cur_ts.reindex(depth.index).to_numpy(),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_fb")
        .map_groups(funnel_bucket, batch_format="pandas")
    )


def scd2_intervals(
    ds: rd.Dataset,
    *,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Build a slowly-changing-dimension (SCD type 2) history from a
    change stream: per key ordered by (ts, tiebreaker), consecutive
    rows whose ``attr_cols`` are unchanged COLLAPSE into one version
    (an upsert that changes nothing opens no new validity window), and
    each surviving version gets ``valid_from`` = its ts, ``valid_to`` =
    the next version's ts (null while current) and ``is_current`` —
    the warehouse-dimension build step downstream of a CDC lake
    (reference analogue: the silver->dimensional hop its Athena
    consumers script by hand).

    Scale shape: ONE key-bucketed shuffle (~2 buckets/CPU); each bucket
    sorts once and does the change detection + interval assignment with
    whole-column shifts — zero per-key Python. Null attr values compare
    null-safely (null -> null is NOT a change)."""
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_sb"] = _key_buckets(b[key], num_buckets)
        return b

    def build_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, tiebreak_col], kind="mergesort").drop(
            columns="_sb"
        )
        same_key = (g[key] == g[key].shift(1)).to_numpy()
        changed = ~same_key
        for c in attr_cols:
            a, p = g[c], g[c].shift(1)
            diff = (a != p) & ~(a.isna() & p.isna())
            changed |= diff.to_numpy()
        k = g[changed].copy()
        same_next = (k[key] == k[key].shift(-1)).to_numpy()
        k["valid_from"] = k[ts_col]
        k["valid_to"] = k[ts_col].shift(-1).where(same_next)
        k["is_current"] = ~same_next
        return k[[key, *attr_cols, "valid_from", "valid_to", "is_current"]]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sb")
        .map_groups(build_bucket, batch_format="pandas")
    )
