"""Distributed aggregate operators beyond Ray Data's builtins.

Each operator follows the aggregation-at-scale pattern the engine uses
everywhere (SURVEY §2.6): a VECTORIZED per-batch partial (Arrow
``Table.group_by`` - C++ hash aggregation, no Python per row) shrinks
the stream before the one distributed ``groupby``, and any final
driver-visible step touches only result-sized data.

* ``distinct_count`` - exact COUNT(DISTINCT value) per group: local
  per-batch dedup -> one shuffle dedups globally -> per-block partial
  counts -> tiny groupby-sum. The shuffle carries only the distinct
  (group, value) pairs that survived local dedup, not the raw stream.
* ``hopping_window`` - fixed-size / fixed-hop (sliding) event-time
  windows: each event is replicated to its ``size/hop`` windows inside
  ``map_batches`` (numpy tile), partially combined per block, then one
  small groupby-sum. The tumbling window is the ``size == hop`` case.
* ``topk_per_group`` - top-k rows per group under an (order_col desc,
  tiebreak asc) order: per-batch local prune to k (so the shuffle sees
  at most k rows per group per block), then a per-group final prune.
* ``grouped_quantiles`` - EXACT discrete quantiles (nearest-rank,
  DuckDB ``quantile_disc`` semantics) over an integer-valued column per
  group, via a distributed counting histogram: per-batch (group, value)
  counts -> groupby-sum over the bounded-cardinality histogram -> a
  tiny per-group CDF walk. Exactness without a per-group sort of the
  raw data - the shuffle is O(distinct values), not O(rows).

Reference parity: the reference exposes rollup-style analytics over
silver via Athena SQL (Instructions.md:122-131); these cover the
GROUP-BY shapes (count-distinct, sliding windows, per-group top-k,
percentiles) that SQL gives its users for free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from .windows import bucketed_agg


def distinct_count(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Exact per-group count of distinct ``value_col``. Returns a small
    DataFrame (group_col, n_distinct) sorted by group.

    Scale shape: per-batch Arrow dedup first (the shuffle carries only
    locally-distinct pairs), then ONE shuffle bucketed by hash(value) -
    every surviving copy of a (group, value) pair lands in the same
    bucket, where a single vectorized pandas pass dedups globally and
    emits per-group partial counts. One Python call per bucket (~2 per
    CPU), never per pair; the final sum sees n_buckets * n_groups rows.

    NULL semantics match SQL COUNT(DISTINCT): null values are excluded
    from the count; rows with a null group still form their own group
    (``dropna=False``)."""
    from .windows import _buckets_for_cluster, _key_buckets

    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def local_dedupe(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col])
        t = t.filter(pc.is_valid(t[value_col]))  # SQL: nulls don't count
        return t.group_by([group_col, value_col]).aggregate([])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_b"] = _key_buckets(b[value_col], num_buckets)
        return b

    def dedupe_count(g: pd.DataFrame) -> pd.DataFrame:
        vc = (
            g.drop_duplicates([group_col, value_col])
            .groupby(group_col, sort=False, dropna=False)
            .size()
        )
        out = pd.DataFrame(
            {group_col: vc.index, "n_distinct": vc.to_numpy(dtype=np.int64)}
        )
        # a null group can't ride Ray's sort-based aggregate next to
        # real keys (mixed NaN/str won't sort): split into a null flag
        # + a filled key, restored after the (result-sized) rollup
        out["_gnull"] = out[group_col].isna()
        fill = "" if out[group_col].dtype == object else 0
        out[group_col] = out[group_col].fillna(fill)
        return out

    partials = (
        ds.map_batches(local_dedupe, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(dedupe_count, batch_format="pandas")
    )
    out = partials.groupby([group_col, "_gnull"]).aggregate(
        Sum("n_distinct", alias_name="n_distinct")
    )
    df = out.sort(group_col).to_pandas()
    df.loc[df["_gnull"], group_col] = None
    df = df.drop(columns=["_gnull"]).reset_index(drop=True)
    df["n_distinct"] = df["n_distinct"].astype("int64")
    return df


def hopping_window(
    ds: rd.Dataset,
    *,
    ts_col: str = "ts",
    value_cents_expr=None,
    size_s: int = 3600,
    hop_s: int = 1800,
) -> rd.Dataset:
    """Sliding event-time windows of ``size_s`` seconds every ``hop_s``
    seconds (size must be a multiple of hop). Returns a Dataset of
    (window_start, n_events, value_cents) - count and exact integer-cent
    sum per window. ``value_cents_expr(batch) -> int64 numpy`` extracts
    the summed measure (defaults to floor(value*100))."""
    assert size_s % hop_s == 0, "window size must be a multiple of the hop"
    reps = size_s // hop_s

    if value_cents_expr is None:

        def value_cents_expr(b: pa.Table) -> np.ndarray:
            return pc.cast(
                pc.floor(pc.multiply(b["value"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)

    def expand_and_combine(b: pa.Table) -> pa.Table:
        # normalize to us regardless of source unit (parquet us, pandas ns)
        us = (
            b[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        w0 = (us // (hop_s * 1_000_000)) * hop_s  # newest window start, s
        cents = value_cents_expr(b)
        starts = np.concatenate([w0 - k * hop_s for k in range(reps)])
        t = pa.table(
            {
                "window_start": pa.array(starts * 1_000_000, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "value_cents": pa.array(np.tile(cents, reps), pa.int64()),
            }
        )
        return (
            t.group_by("window_start")
            .aggregate([("value_cents", "sum"), ("value_cents", "count")])
            .rename_columns(["window_start", "value_cents", "n_events"])
        )

    return (
        ds.map_batches(expand_and_combine, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )


def topk_per_group(
    ds: rd.Dataset,
    *,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    k: int = 3,
    out_cols: list[str] | None = None,
) -> pd.DataFrame:
    """Top-k rows per group ordered by (order_col DESC, tiebreak ASC).
    Per-batch local prune keeps the shuffle at <= k rows per (group,
    block); the final per-group prune sees <= k * n_blocks rows."""
    from .windows import _buckets_for_cluster, _key_buckets

    sort_cols = [group_col, order_col, tiebreak_col]
    ascending = [True, False, True]
    nb = _buckets_for_cluster()

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        b = b.groupby(group_col, sort=False).head(k).copy()
        b["_kb"] = _key_buckets(b[group_col], nb)
        return b

    def final_top(g: pd.DataFrame) -> pd.DataFrame:
        # ALL of the bucket's groups pruned and ranked in one
        # vectorized pass - one Python call per bucket, not per group
        g = g.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        g = g.groupby(group_col, sort=False).head(k).copy()
        g["rank"] = g.groupby(group_col, sort=False).cumcount() + 1
        return g[[group_col, "rank"] + (out_cols or [tiebreak_col])]

    out = (
        ds.map_batches(local_top, batch_format="pandas")
        .groupby("_kb")
        .map_groups(final_top, batch_format="pandas")
    )
    df = out.to_pandas().sort_values([group_col, "rank"]).reset_index(drop=True)
    df["rank"] = df["rank"].astype("int64")
    return df


def grouped_quantiles(
    ds: rd.Dataset,
    *,
    group_col: str,
    cents_expr,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    col_names: tuple[str, ...] = ("p50_cents", "p90_cents", "p99_cents"),
) -> pd.DataFrame:
    """Exact nearest-rank quantiles of an integer measure per group.

    ``cents_expr(batch) -> int64 numpy`` extracts the measure. The
    distributed part is a counting histogram over (group, value) - the
    shuffle volume is bounded by the measure's value domain, never the
    row count. The CDF walk per group handles result-sized data only.

    Nearest-rank: the q-quantile is the value at 1-based rank
    ceil(q * n) in the sorted multiset (DuckDB ``quantile_disc``)."""

    def partial_hist(b: pa.Table) -> pa.Table:
        t = pa.table(
            {group_col: b[group_col], "cents": pa.array(cents_expr(b), pa.int64())}
        )
        return (
            t.group_by([group_col, "cents"])
            .aggregate([("cents", "count")])
            .rename_columns([group_col, "cents", "n"])
        )

    from .windows import _buckets_for_cluster, _key_buckets

    nb = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_qb"] = _key_buckets(b[group_col], nb)
        return b

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        # CDF walk for EVERY group in the bucket in one vectorized
        # pass: the global cumsum is monotone, so each group's
        # nearest-rank index is ONE searchsorted against
        # (total-before-group + target) - no per-group Python
        g = g.sort_values([group_col, "cents"], kind="mergesort").reset_index(
            drop=True
        )
        n = g["n"].to_numpy(dtype=np.int64)
        codes, keys = pd.factorize(g[group_col], sort=False)
        starts = np.flatnonzero(np.r_[True, np.diff(codes) != 0])
        ends = np.r_[starts[1:], len(g)]
        cum = n.cumsum()
        prev = np.r_[0, cum[ends[:-1] - 1]]  # total before each group
        totals = cum[ends - 1] - prev
        vals = g["cents"].to_numpy(dtype=np.int64)
        row = {group_col: keys[codes[starts]]}
        for q, name in zip(quantiles, col_names):
            # rank >= 1: q=0.0 means the group minimum, not the
            # previous group's last value (ceil(0)=0 would land there)
            targets = np.maximum(np.ceil(q * totals).astype(np.int64), 1)
            idx = np.searchsorted(cum, prev + targets)
            row[name] = vals[idx]
        return pd.DataFrame(row)

    hist = bucketed_agg(
        ds.map_batches(partial_hist, batch_format="pyarrow"),
        [group_col, "cents"], {"n": "sum"},
    )
    out = (
        hist.map_batches(add_bucket, batch_format="pandas")
        .groupby("_qb")
        .map_groups(walk, batch_format="pandas")
    )
    df = out.to_pandas().sort_values(group_col).reset_index(drop=True)
    for c in col_names:
        df[c] = df[c].astype("int64")
    return df


def grouped_mad(
    ds: rd.Dataset,
    *,
    group_col: str,
    cents_expr,
) -> pd.DataFrame:
    """Robust per-group location/scale: exact nearest-rank MEDIAN and
    MAD (median absolute deviation) of an integer measure — the
    outlier-resistant alternative to mean/σ when heavy tails would
    drag both (`zscore_outliers`' robust sibling).

    Two counting-histogram passes (each exchange bounded by the value
    domain, never rows): medians first, broadcast as a driver-sized
    map, then the same machinery over |x − median(group)|. Integer in,
    integer out — hash-exact vs `quantile_disc` mirrors."""
    med = grouped_quantiles(
        ds, group_col=group_col, cents_expr=cents_expr,
        quantiles=(0.5,), col_names=("median",),
    )
    mmap = dict(zip(med[group_col], med["median"].astype(np.int64)))

    def dev_expr(b: pa.Table) -> np.ndarray:
        x = np.asarray(cents_expr(b), dtype=np.int64)
        g = b[group_col].to_numpy(zero_copy_only=False)
        m = pd.Series(g).map(mmap).to_numpy(dtype=np.int64)
        return np.abs(x - m)

    mad = grouped_quantiles(
        ds, group_col=group_col, cents_expr=dev_expr,
        quantiles=(0.5,), col_names=("mad",),
    )
    return med.merge(mad, on=group_col)


def grouped_gini(
    ds: rd.Dataset,
    *,
    group_col: str,
    cents_expr,
) -> pd.DataFrame:
    """Gini concentration coefficient of a non-negative integer
    measure per group — "do 1% of the docs hold 90% of the tokens?"
    — from the same counting histogram the quantile ops use (exchange
    bounded by the value domain, never rows).

    For sorted values the numerator is Σ(2i − n − 1)·x_i; over a
    histogram run of count c at value v starting after s prior rows it
    collapses to v·c·(2s + c − n) — an exact int64 sum, vectorized
    over runs. gini = numerator / (n · Σx) evaluates as ONE
    straight-line double division of exact ints (ppm-floored by
    callers), so a SQL window mirror hash-matches. Returns
    (group, n, sum_x, gini_num)."""

    def partial_hist(b: pa.Table) -> pa.Table:
        t = pa.table(
            {group_col: b[group_col],
             "v": pa.array(cents_expr(b), pa.int64())}
        )
        return (
            t.group_by([group_col, "v"])
            .aggregate([("v", "count")])
            .rename_columns([group_col, "v", "c"])
        )

    from .windows import _buckets_for_cluster, _key_buckets

    nb = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_gb"] = _key_buckets(b[group_col], nb)
        return b

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "v"], kind="mergesort").reset_index(
            drop=True
        )
        c = g["c"].to_numpy(dtype=np.int64)
        v = g["v"].to_numpy(dtype=np.int64)
        codes, keys = pd.factorize(g[group_col], sort=False)
        starts = np.flatnonzero(np.r_[True, np.diff(codes) != 0])
        ends = np.r_[starts[1:], len(g)]
        cum = c.cumsum()
        prev_total = np.r_[0, cum[ends[:-1] - 1]]
        n_per = cum[ends - 1] - prev_total          # rows per group
        # s = rows before this run WITHIN the group
        s = cum - c - np.repeat(prev_total, ends - starts)
        n_rep = np.repeat(n_per, ends - starts)
        term = v * c * (2 * s + c - n_rep)
        # reduceat keeps int64 exact (bincount weights would go float)
        num = np.add.reduceat(term, starts)
        sx = np.add.reduceat(v * c, starts)
        return pd.DataFrame(
            {
                group_col: keys[codes[starts]],
                "n": n_per,
                "sum_x": sx,
                "gini_num": num,
            }
        )

    hist = bucketed_agg(
        ds.map_batches(partial_hist, batch_format="pyarrow"),
        [group_col, "v"], {"c": "sum"},
    )
    out = (
        hist.map_batches(add_bucket, batch_format="pandas")
        .groupby("_gb")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    for col in ("n", "sum_x", "gini_num"):
        out[col] = out[col].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


def heavy_hitters(
    ds: "rd.Dataset",
    col: str,
    *,
    den: int = 100,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Frequent-items at scale: every value occurring in more than
    ``1/den`` of all rows (exact integer threshold ``count * den >
    total``), with its EXACT count — without ever shuffling
    one row per occurrence (contrast ``term_frequencies``: this is the
    path when the value space is too large to groupby).

    Two passes, both sketch-sized:
      1. a Misra-Gries summary with k = den counters per BLOCK
         (one C-level value_counts + truncation — the classic streaming
         reduction; MG guarantees any value with global frequency
         > n/den survives in the merged summary), merged on the driver
         over B tiny sketches;
      2. an exact recount of only the surviving candidates (broadcast
         candidate set, per-batch filtered value_counts partials).
    The result is therefore EXACT and complete — the sketch only
    bounds which values need recounting. Returns (value, n) sorted by
    (-n, value) for values with n * den > total_rows.
    """
    import ray

    k = max(1, int(den))

    def mg_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[col].dropna().value_counts()
        if len(vc) > k:
            # Misra-Gries decrement: subtracting the (k+1)-th count
            # from the top-k over-approximates the standard per-item
            # decrement (keeps the survival guarantee; counts are
            # lower bounds, exactness comes from the recount pass)
            vc = (vc.iloc[:k] - vc.iloc[k]).clip(lower=0)
            vc = vc[vc > 0]
        return pd.DataFrame({col: vc.index, "n": vc.to_numpy(dtype=np.int64)})

    parts = ds.map_batches(mg_partial, batch_format="pandas").to_pandas()
    total = ds.count()
    merged = parts.groupby(col, sort=False)["n"].sum()
    if len(merged) > k:
        merged = merged.sort_values(ascending=False)
        merged = (merged.iloc[:k] - merged.iloc[k]).clip(lower=0)
        merged = merged[merged > 0]
    candidates = set(merged.index)
    if not candidates:
        return pd.DataFrame({col: pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})
    cand_ref = ray.put(candidates)

    class Recount:
        def __init__(self):
            self.cand = ray.get(cand_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            vc = b.loc[b[col].isin(self.cand), col].value_counts()
            return pd.DataFrame({col: vc.index, "n": vc.to_numpy(dtype=np.int64)})

    counts = (
        ds.map_batches(Recount, batch_format="pandas", concurrency=concurrency)
        .to_pandas()
        .groupby(col, sort=False)["n"]
        .sum()
    )
    out = counts[counts * k > total].reset_index()
    out["n"] = out["n"].astype("int64")
    return (
        out.sort_values(["n", col], ascending=[False, True])
        .reset_index(drop=True)
    )


def pivot_counts(
    ds,
    *,
    row_col: str,
    col_col: str,
    prefix: str = "n_",
) -> rd.Dataset:
    """Crosstab / wide pivot: one output row per ``row_col`` value, one
    integer count column per distinct ``col_col`` value (SQL
    ``count(*) FILTER (WHERE col = v)``). Scale shape: each block
    contributes a C-level (row, col, n) partial count - the exchange
    carries one row per (block, row, col) pair, never per input row -
    then one groupby-sum and a vectorized unstack per row bucket.

    The WIDE dimension (#distinct ``col_col``) must be small - it
    becomes the schema, which is the nature of a pivot. The row
    dimension is unbounded (it stays distributed until the caller
    collects)."""
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pa.Table:
        vc = (
            b.groupby([row_col, col_col], sort=False, observed=True)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                row_col: pa.array(vc[row_col]),
                col_col: pa.array(vc[col_col]),
                "n": pa.array(vc["n"].to_numpy(np.int64)),
            }
        )

    agg = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [row_col, col_col], {"n": "sum"},
    ).materialize()  # consumed twice: column domain + widen
    # the wide schema = sorted distinct col values (small by contract);
    # every bucket emits exactly these columns so blocks stay uniform
    domain = sorted(agg.unique(col_col))
    out_cols = [row_col] + [f"{prefix}{v}" for v in domain]

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        w = g.pivot_table(
            index=row_col, columns=col_col, values="n",
            aggfunc="sum", fill_value=0,
        ).reindex(columns=domain, fill_value=0).astype("int64").reset_index()
        w.columns = [row_col] + [f"{prefix}{v}" for v in domain]
        return w[out_cols]

    from .windows import _buckets_for_cluster, _key_buckets

    nb = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_pb"] = _key_buckets(b[row_col], nb)
        return b

    return (
        agg.map_batches(add_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(lambda g: widen(g.drop(columns="_pb")), batch_format="pandas")
    )


def quantile_thresholds(
    ds: rd.Dataset,
    *,
    col: str,
    quantiles: tuple[float, ...],
) -> dict[float, int]:
    """Exact nearest-rank quantile thresholds of an integer column:
    distributed counting-histogram partials per block (shuffle volume
    bounded by the value domain, never the row count), combined with
    one tiny groupby-sum; the CDF walk sees result-sized data only.
    Nearest-rank = value at 1-based rank ceil(q*n) (DuckDB
    ``quantile_disc``)."""

    def partial_hist(b: pa.Table) -> pa.Table:
        t = pa.table({"v": pc.cast(b[col], pa.int64())})
        return (
            t.group_by(["v"]).aggregate([("v", "count")])
            .rename_columns(["v", "n"])
        )

    hist = bucketed_agg(
        ds.map_batches(partial_hist, batch_format="pyarrow"),
        "v", {"n": "sum"},
    ).to_pandas()
    if len(hist) == 0 or "v" not in hist.columns:
        # Empty input: no ranks exist (an empty Dataset's to_pandas also
        # drops the schema entirely); callers (filter/winsorize) treat
        # the zero band as "keep nothing", matching the empty result.
        return {q: 0 for q in quantiles}
    hist = hist.sort_values("v")
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1])
    vals = hist["v"].to_numpy()
    out = {}
    for q in quantiles:
        rank = max(1, int(np.ceil(q * total)))
        out[q] = int(vals[np.searchsorted(cum, rank)])
    return out


def filter_by_quantile(
    ds: rd.Dataset,
    *,
    col: str,
    q_lo: float = 0.0,
    q_hi: float = 1.0,
) -> rd.Dataset:
    """Keep rows whose integer measure lies inside the nearest-rank
    quantile band [q_lo, q_hi] — the drop-the-tails corpus-curation
    filter ("cut the shortest 10% and longest 10%"). Two passes:
    ``quantile_thresholds`` (histogram shuffle bounded by the value
    domain) then a broadcast map-side filter; the corpus itself never
    shuffles and streams through the second pass."""
    th = quantile_thresholds(ds, col=col, quantiles=(q_lo, q_hi))
    lo, hi = th[q_lo], th[q_hi]

    def band(b: pa.Table) -> pa.Table:
        v = pc.cast(b[col], pa.int64())
        return b.filter(
            pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi))
        )

    return ds.map_batches(band, batch_format="pyarrow")


def histogram_fixed(
    ds: rd.Dataset,
    *,
    col: str,
    lo: int,
    hi: int,
    nbins: int,
) -> pd.DataFrame:
    """Equi-width histogram of an integer measure over [lo, hi):
    values clamp into the edge bins (no silent drops), EMPTY bins are
    emitted as explicit zeros — the profile/monitoring companion to
    the exact-quantile ops. One pass of per-batch ``np.bincount``
    partials, one tiny groupby-sum; the exchange carries ≤ nbins rows
    per block. Returns (bin, bin_lo, n) for every bin."""
    width = (hi - lo) // nbins
    assert width > 0, "need hi - lo >= nbins"

    def partial(b: pa.Table) -> pd.DataFrame:
        v = pc.cast(b[col], pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.clip((v - lo) // width, 0, nbins - 1)
        c = np.bincount(idx, minlength=nbins)
        return pd.DataFrame(
            {"bin": np.arange(nbins, dtype=np.int64), "n": c.astype(np.int64)}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    out.insert(1, "bin_lo", lo + out["bin"].to_numpy() * width)
    return out


def global_percentile(
    ds: rd.Dataset,
    *,
    col: str,
    out_col: str = "pct_rank",
) -> rd.Dataset:
    """Annotate every row with its GLOBAL percent rank — SQL
    ``percent_rank() OVER (ORDER BY col)`` — WITHOUT a global sort:
    one counting-histogram exchange (bounded by the value domain)
    builds the exact CDF, which broadcasts and resolves per batch with
    one ``searchsorted``. The cross-corpus normalization feature
    ("this doc is longer than 93% of the corpus") at streaming cost.

    pct_rank = (# rows strictly below) / (n − 1), ties share the rank
    (exactly SQL's definition) — a straight-line double division of
    exact ints, so the SQL mirror hash-matches."""
    th = (
        bucketed_agg(
            ds.map_batches(
                lambda b: pa.table(
                    {"v": pc.cast(b[col], pa.int64())}
                ).group_by(["v"]).aggregate([("v", "count")])
                .rename_columns(["v", "n"]),
                batch_format="pyarrow",
            ),
            "v", {"n": "sum"},
        )
        .to_pandas()
        .sort_values("v")
    )
    vals = th["v"].to_numpy(dtype=np.int64)
    cum = th["n"].to_numpy(dtype=np.int64).cumsum()
    below = np.r_[0, cum[:-1]]  # rows strictly below each distinct value
    n = int(cum[-1]) if len(cum) else 0

    def annotate(b: pa.Table) -> pa.Table:
        v = pc.cast(b[col], pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vals, v)
        less = below[idx].astype(np.float64)
        pr = less / (n - 1) if n > 1 else np.zeros(len(v))
        return b.append_column(out_col, pa.array(pr, pa.float64()))

    return ds.map_batches(annotate, batch_format="pyarrow")


def winsorize_by_quantile(
    ds: rd.Dataset,
    *,
    col: str,
    q_lo: float = 0.01,
    q_hi: float = 0.99,
    out_col: str | None = None,
) -> rd.Dataset:
    """Winsorization: CLAMP an integer measure into the nearest-rank
    [q_lo, q_hi] quantile band instead of dropping the tails
    (``filter_by_quantile``'s sibling — keeps every row, tames the
    outliers that would dominate means/losses). Two passes: the
    histogram-shuffle threshold pass, then a broadcast map-side
    LEAST/GREATEST clamp; the corpus streams and never shuffles."""
    th = quantile_thresholds(ds, col=col, quantiles=(q_lo, q_hi))
    lo, hi = th[q_lo], th[q_hi]
    dst = out_col or f"{col}_w"

    def clamp(b: pa.Table) -> pa.Table:
        v = pc.cast(b[col], pa.int64())
        w = pc.min_element_wise(pc.max_element_wise(v, lo), hi)
        if dst in b.column_names:
            b = b.drop_columns(dst)
        return b.append_column(dst, w)

    return ds.map_batches(clamp, batch_format="pyarrow")


def grouping_sets(
    ds: rd.Dataset,
    *,
    keys: list[str],
    sets: list[tuple[int, ...]] | None = None,
    sum_cols: list[str] | None = None,
    all_token: str = "ALL",
) -> rd.Dataset:
    """Multi-level aggregation in ONE pass — SQL ``GROUP BY GROUPING
    SETS`` / ``CUBE`` / ``ROLLUP`` (Athena rollup analytics are the
    reference's user-facing query surface, Instructions.md:122-131).

    ``sets`` lists the grouping sets as index tuples into ``keys``
    (default: the full cube, all 2^len(keys) subsets). Each batch emits
    its partial (count + sums) for EVERY set with rolled-up key columns
    replaced by ``all_token``, so the single shuffle carries
    per-(block, set, group) partials — the map-side-combine shape — and
    one groupby over the key columns finishes every level at once
    (the placeholder keeps levels disjoint without a grouping-id
    column; key values equal to ``all_token`` would collide — pick a
    sentinel outside the domain).

    ``sum_cols`` must be integer-valued (pre-scale floats to cents)
    so multi-level sums are summation-order-independent.

    Returns a Dataset with ``keys`` (strings with ``all_token``
    placeholders), ``n`` and ``sum_<col>`` columns.
    """
    from ray.data.aggregate import Sum

    ks = list(keys)
    scols = list(sum_cols or [])
    if sets is None:
        sets = [
            tuple(i for i in range(len(ks)) if (mask >> i) & 1)
            for mask in range(1 << len(ks))
        ]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for s in sets:
            kept = [ks[i] for i in s]
            g = b.groupby(kept, sort=False, dropna=False) if kept else None
            if kept:
                agg = g.size().rename("n").reset_index()
                for c in scols:
                    agg[f"sum_{c}"] = g[c].sum().to_numpy()
            else:
                agg = pd.DataFrame({"n": [len(b)]})
                for c in scols:
                    agg[f"sum_{c}"] = [b[c].sum()]
            for k in ks:
                if k in kept:
                    agg[k] = agg[k].astype("string")
                else:
                    agg[k] = all_token
            outs.append(agg[ks + ["n"] + [f"sum_{c}" for c in scols]])
        return pd.concat(outs, ignore_index=True)

    aggs = [Sum("n", alias_name="n")] + [
        Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in scols
    ]
    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(ks)
        .aggregate(*aggs)
    )


def explode_list(
    ds: rd.Dataset,
    *,
    id_col: str,
    list_col: str,
    idx_col: str = "idx",
    val_col: str = "val",
) -> rd.Dataset:
    """UNNEST a list column into (id, 1-based index, value) rows —
    embedding dims, token lists, frame arrays — with ZERO-COPY Arrow
    kernels: ``list_flatten`` reuses the child buffer,
    ``list_parent_indices`` gathers ids, and the within-list index is
    one arange minus the repeated offsets. No Python per row, no
    shuffle (embarrassingly parallel); output is rows × list-length —
    size the batch accordingly."""

    def explode(b: pa.Table) -> pa.Table:
        col = b[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        parents = pc.list_parent_indices(col)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        idx = np.arange(int(lens.sum()), dtype=np.int64) - starts + 1
        ids = pc.take(b[id_col], parents)
        return pa.table({id_col: ids, idx_col: pa.array(idx), val_col: flat})

    return ds.map_batches(explode, batch_format="pyarrow")


def unpivot(
    ds: rd.Dataset,
    *,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> rd.Dataset:
    """UNPIVOT / melt — the inverse of ``pivot_counts``: wide columns
    back to (id_cols, variable, value) long rows. Embarrassingly
    parallel: one vectorized ``pd.melt`` per batch, NO shuffle, row
    count multiplies by ``len(value_cols)`` (plan downstream block
    sizes accordingly)."""

    def melt(b: pd.DataFrame) -> pd.DataFrame:
        return pd.melt(
            b,
            id_vars=id_cols,
            value_vars=value_cols,
            var_name=var_name,
            value_name=value_name,
        )

    return ds.map_batches(melt, batch_format="pandas")


def grouped_moments(
    ds: rd.Dataset,
    *,
    group_col: str,
    x_col: str,
    y_col: str | None = None,
) -> pd.DataFrame:
    """Exact second-moment statistics per group from INTEGER columns:
    one pass of per-batch int64 partials (n, Σx, Σx², and with
    ``y_col`` Σy, Σy², Σxy), one tiny groupby-sum — variance, stddev,
    and Pearson correlation then derive on the driver from the
    group-sized sums with a fixed float formula, so results are
    bitwise-reproducible regardless of row order or partitioning
    (float accumulation never touches the data path).

    Columns must be integer-valued (scale floats to cents first);
    Σx² stays exact while n·max(x)² < 2^63 — beyond that, pre-shift
    to coarser units.

    Returns a driver-sized DataFrame: group, n, sum_x, sum_xx and, if
    ``y_col``, sum_y, sum_yy, sum_xy.
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[x_col].to_numpy(dtype=np.int64)
        d = pd.DataFrame(
            {
                group_col: b[group_col],
                "n": np.int64(1),
                "sum_x": x,
                "sum_xx": x * x,
            }
        )
        if y_col is not None:
            y = b[y_col].to_numpy(dtype=np.int64)
            d["sum_y"] = y
            d["sum_yy"] = y * y
            d["sum_xy"] = x * y
        g = d.groupby(group_col, sort=False).sum().reset_index()
        return g

    names = ["n", "sum_x", "sum_xx"] + (
        ["sum_y", "sum_yy", "sum_xy"] if y_col is not None else []
    )
    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .aggregate(*[Sum(c, alias_name=c) for c in names])
        .to_pandas()
    )
    for c in names:
        out[c] = out[c].astype("int64")
    return out


def grouped_mode(
    ds: rd.Dataset,
    *,
    key: str,
    value_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Exact per-key MODE (most frequent value) with a DETERMINISTIC
    min-value tiebreak — SQL's ``mode()`` leaves ties unspecified, so
    the mirror is an explicit argmax (``row_number() OVER (ORDER BY n
    DESC, value)``) rather than the aggregate.

    Scale shape: per-batch (key, value) partial counts (C-level
    groupby) shrink the stream to distinct pairs, ONE groupby-sum over
    those pairs, then a key-bucketed finisher sorts each bucket once by
    (key, n desc, value) and keeps the first row per key — zero
    per-key Python anywhere. Returns (key, mode_value, n)."""
    from .windows import _buckets_for_cluster, _key_buckets

    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby([key, value_col], sort=False)
            .size()
            .reset_index(name="n")
        )

    counts = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [key, value_col], {"n": "sum"},
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_mb"] = _key_buckets(b[key], num_buckets)
        return b

    def mode_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key, "n", value_col],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop(columns="_mb")
        out = g.drop_duplicates(subset=[key], keep="first")
        out = out.rename(columns={value_col: "mode_value"})
        out["n"] = out["n"].astype("int64")
        return out.reset_index(drop=True)

    return (
        counts.map_batches(add_bucket, batch_format="pandas")
        .groupby("_mb")
        .map_groups(mode_bucket, batch_format="pandas")
    )


def grouped_entropy(
    ds: rd.Dataset,
    *,
    key: str,
    value_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Shannon entropy of each key's value distribution, in integer
    MICROBITS so a SQL mirror hash-matches despite logarithms.

    H = log2(n) - (Σ c·log2(c)) / n over the per-(key, value) counts
    c. Raw float sums are order-dependent, so each term is quantized
    FIRST — t = floor(c·log2(c)·2^20), an exact int64 — and the sums
    Σc, Σt are exact integers; the final entropy is one straight-line
    double expression of those two ints, floored to microbits. Both
    sides (numpy here, SQL there) evaluate identical expression trees,
    so results are bitwise order-independent (a 1-ulp libm divergence
    would need the term to land within ~1e-10 of an integer to change
    a floor — negligible).

    Scale shape: per-batch (key, value) partial counts, ONE groupby-sum
    over distinct pairs, per-batch term quantization + partial (key)
    sums, one tiny second groupby-sum — the exchanges carry distinct
    pairs, then key-sized partials. Returns (key, n, entropy_ub)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby([key, value_col], sort=False)
            .size()
            .reset_index(name="c")
        )

    counts = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [key, value_col], {"c": "sum"},
    )

    def quantize(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(dtype=np.float64)
        t = np.floor(c * np.log2(c) * 1048576.0).astype(np.int64)
        d = pd.DataFrame(
            {key: b[key], "n": b["c"].astype("int64"), "t": t}
        )
        return d.groupby(key, sort=False).sum().reset_index()

    sums = bucketed_agg(
        counts.map_batches(quantize, batch_format="pandas"),
        key, {"n": "sum", "t": "sum"},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(dtype=np.float64)
        t = b["t"].to_numpy(dtype=np.float64)
        h = np.log2(n) - (t / 1048576.0) / n
        return pd.DataFrame(
            {
                key: b[key],
                "n": b["n"].astype("int64"),
                "entropy_ub": np.floor(h * 1048576.0).astype("int64"),
            }
        )

    return sums.map_batches(finish, batch_format="pandas")


def zscore_outliers(
    ds: rd.Dataset,
    *,
    group_col: str,
    value_col: str,
    z: float = 3.0,
) -> rd.Dataset:
    """Per-group z-score outlier filter: keep rows whose integer
    measure deviates more than ``z`` standard deviations from their
    group's mean — the statistical quality gate for anomalous lengths,
    prices, or scores.

    Two passes, corpus never shuffles: ``grouped_moments`` computes
    exact int64 (n, Σx, Σx²) per group (tiny exchange of partials),
    then a broadcast map-side filter evaluates
    ``(x − μ)² > z²·max(σ², 0)`` with μ = Σx/n and σ² = Σx²/n − μ²
    — one fixed straight-line double tree over exact integers, so a
    SQL mirror computing the same expressions matches row-for-row
    (constant groups clamp σ² at 0 and flag nothing). Group stats are
    driver-sized (one row per group) and ship once per task."""
    m = grouped_moments(ds, group_col=group_col, x_col=value_col)
    nf = m["n"].to_numpy(dtype=np.float64)
    sx = m["sum_x"].to_numpy(dtype=np.float64)
    sxx = m["sum_xx"].to_numpy(dtype=np.float64)
    mean = sx / nf
    var = np.maximum(sxx / nf - mean * mean, 0.0)
    mean_map = dict(zip(m[group_col], mean))
    var_map = dict(zip(m[group_col], var))
    zz = float(z) * float(z)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        mu = b[group_col].map(mean_map).to_numpy(dtype=np.float64)
        v = b[group_col].map(var_map).to_numpy(dtype=np.float64)
        x = b[value_col].to_numpy(dtype=np.float64)
        d = x - mu
        return b[d * d > zz * v]

    return ds.map_batches(flag, batch_format="pandas")


def cohort_retention(
    ds: rd.Dataset,
    *,
    key: str,
    ts_col: str,
    bucket_us: int = 604_800_000_000,
) -> pd.DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    bucket (the cohort), counted in every bucket they were active —
    the classic "week-0 cohort, % active in week k" analytics grid,
    exact integers only.

    Two streaming passes: (1) per-key first bucket via min partials +
    one groupby-min, broadcast as a key→cohort map (`ray.put`, ~16 B
    per key — swap for a hash_join beyond ~10^8 keys); (2) per-batch
    locally-deduped (key, bucket) pairs → cohort lookup → count
    partials per (cohort, bucket) → one tiny groupby-sum. Returns
    (cohort, bucket, n_active, n_cohort)."""
    import ray
    from ray.data.aggregate import Min

    def first_partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[ts_col].astype("datetime64[us]").view("int64")
        d = pd.DataFrame({key: b[key], "bs": (t // bucket_us) * bucket_us})
        return d.groupby(key, sort=False)["bs"].min().reset_index()

    first = bucketed_agg(
        ds.map_batches(first_partial, batch_format="pandas"),
        key, {"bs": "min"},
    ).to_pandas()
    cohort_map = dict(zip(first[key], first["bs"].astype(np.int64)))
    sizes = first.groupby("bs").size()
    cohort_ref = ray.put(cohort_map)

    def active_partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[ts_col].astype("datetime64[us]").view("int64")
        d = pd.DataFrame(
            {key: b[key], "bucket": (t // bucket_us) * bucket_us}
        ).drop_duplicates()
        d["cohort"] = d[key].map(ray.get(cohort_ref)).astype(np.int64)
        return d

    from ray.data.aggregate import Count

    deduped = (
        ds.map_batches(active_partial, batch_format="pandas")
        .groupby([key, "bucket", "cohort"])
        .aggregate(Count(alias_name="_n"))
    )

    def grid_partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["cohort", "bucket"], sort=False)
            .size()
            .reset_index(name="n_active")
        )

    grid = (
        deduped.map_batches(grid_partial, batch_format="pandas")
        .groupby(["cohort", "bucket"])
        .aggregate(Sum("n_active", alias_name="n_active"))
        .to_pandas()
    )
    grid["n_cohort"] = grid["cohort"].map(sizes).astype(np.int64)
    for c in ("cohort", "bucket", "n_active"):
        grid[c] = grid[c].astype("int64")
    return grid.sort_values(["cohort", "bucket"]).reset_index(drop=True)


def cooccurrence(
    ds: rd.Dataset,
    *,
    basket_col: str,
    item_col: str,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Market-basket co-occurrence: for every unordered item pair
    (a < b), the number of baskets containing both, plus per-item
    basket counts and the total basket count — enough to derive
    support / confidence / lift exactly. The association-mining step
    behind "documents tagged X are usually also tagged Y" corpus
    curation.

    Scale shape: rows locally dedup per batch, then ONE basket-bucketed
    shuffle co-locates each basket; every bucket dedups globally (all
    rows of a basket share its bucket), emits its pairs with one
    vectorized self-merge, and pre-counts pairs/items/baskets into a
    tagged partial frame; one tiny groupby-sum finishes. The exchange
    carries distinct (basket, item) rows; the pair table is
    O(items²)-bounded — driver-sized for bounded vocabularies (use a
    per-basket item cap upstream for unbounded ones)."""
    from .windows import _buckets_for_cluster, _key_buckets

    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[basket_col, item_col]].drop_duplicates()
        b = b.copy()
        b["_ab"] = _key_buckets(b[basket_col], num_buckets)
        return b

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_ab").drop_duplicates()
        ga = g.rename(columns={item_col: "a"})
        gb = g.rename(columns={item_col: "b"})
        m = ga.merge(gb, on=basket_col)
        m = m[m["a"] < m["b"]]
        pair = (
            m.groupby(["a", "b"], sort=False)
            .size()
            .reset_index(name="n")
            .assign(kind="pair")
        )
        item = (
            g.groupby(item_col, sort=False)
            .size()
            .reset_index(name="n")
            .rename(columns={item_col: "a"})
            .assign(b="", kind="item")
        )
        total = pd.DataFrame(
            {
                "a": [""],
                "b": [""],
                "n": [g[basket_col].nunique()],
                "kind": ["total"],
            }
        )
        return pd.concat(
            [pair[["kind", "a", "b", "n"]], item[["kind", "a", "b", "n"]],
             total[["kind", "a", "b", "n"]]],
            ignore_index=True,
        )

    partials = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_ab")
        .map_groups(pairs_bucket, batch_format="pandas")
        .groupby(["kind", "a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    partials["n"] = partials["n"].astype("int64")
    pairs = partials[partials["kind"] == "pair"][["a", "b", "n"]].rename(
        columns={"a": "item_a", "b": "item_b", "n": "n_ab"}
    )
    items = partials[partials["kind"] == "item"][["a", "n"]]
    n_baskets = int(partials.loc[partials["kind"] == "total", "n"].iloc[0])
    out = pairs.merge(
        items.rename(columns={"a": "item_a", "n": "n_a"}), on="item_a"
    ).merge(items.rename(columns={"a": "item_b", "n": "n_b"}), on="item_b")
    out["n_baskets"] = np.int64(n_baskets)
    return out.sort_values(["item_a", "item_b"]).reset_index(drop=True)


def profile_table(
    ds: rd.Dataset,
    *,
    columns: list[str],
) -> pd.DataFrame:
    """Column profiling (the ANALYZE / data-quality summary): per
    column, row count, null count, exact distinct count, and min/max
    — the first look at any new table before wiring it into a
    pipeline.

    Two streaming passes, nothing row-sized ever concentrates:
      1. counts + TYPED min/max as per-block one-row wide partials
         (each stat keeps its own dtype so numeric min is numeric,
         not lexicographic) finished by one global aggregate;
      2. exact distinct via locally-deduped (col, value) pairs — the
         exchange carries distinct pairs per block, a tiny per-col
         count finishes.
    Returns a long frame (col, n, n_null, n_distinct, min, max) with
    min/max stringified only at the very end for a uniform schema."""
    from ray.data.aggregate import Max, Min

    def wide_partial(b: pd.DataFrame) -> pd.DataFrame:
        row = {}
        for c in columns:
            s = b[c]
            sv = s.dropna()
            row[f"{c}__n"] = [np.int64(len(s))]
            row[f"{c}__null"] = [np.int64(s.isna().sum())]
            row[f"{c}__min"] = [sv.min() if len(sv) else None]
            row[f"{c}__max"] = [sv.max() if len(sv) else None]
        return pd.DataFrame(row)

    aggs = []
    for c in columns:
        aggs += [
            Sum(f"{c}__n", alias_name=f"{c}__n"),
            Sum(f"{c}__null", alias_name=f"{c}__null"),
            Min(f"{c}__min", alias_name=f"{c}__min"),
            Max(f"{c}__max", alias_name=f"{c}__max"),
        ]
    wide = ds.map_batches(wide_partial, batch_format="pandas").aggregate(*aggs)

    def distinct_partial(b: pd.DataFrame) -> pd.DataFrame:
        frames = [
            pd.DataFrame(
                {"col": c, "v": b[c].dropna().astype(str).unique()}
            )
            for c in columns
        ]
        return pd.concat(frames, ignore_index=True)

    from ray.data.aggregate import Count

    pairs = (
        ds.map_batches(distinct_partial, batch_format="pandas")
        .groupby(["col", "v"])
        .aggregate(Count(alias_name="_n"))
    )

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["col"].value_counts()
        return pd.DataFrame(
            {"col": vc.index.to_numpy(), "nd": vc.to_numpy(np.int64)}
        )

    nd = (
        pairs.map_batches(count_partial, batch_format="pandas")
        .groupby("col")
        .aggregate(Sum("nd", alias_name="nd"))
        .to_pandas()
    )
    ndmap = dict(zip(nd["col"], nd["nd"].astype(np.int64)))

    rows = []
    for c in columns:
        rows.append(
            {
                "col": c,
                "n": np.int64(wide[f"{c}__n"]),
                "n_null": np.int64(wide[f"{c}__null"]),
                "n_distinct": np.int64(ndmap.get(c, 0)),
                "min": None if wide[f"{c}__min"] is None
                else str(wide[f"{c}__min"]),
                "max": None if wide[f"{c}__max"] is None
                else str(wide[f"{c}__max"]),
            }
        )
    return pd.DataFrame(rows)


def mutual_information(
    ds: rd.Dataset,
    *,
    col_a: str,
    col_b: str,
) -> pd.DataFrame:
    """Mutual information I(A;B) between two bounded-domain
    categorical columns, in integer microbits — the dependence /
    redundancy signal between labels (is `lang` just `domain` in
    disguise?).

    I = (1/N)·Σ_cells c·log2(c·N / (c_a·c_b)). Per-CELL terms are
    floor-quantized to int64 microbit units before summing (float
    log-sums are order-dependent; quantized terms sum exactly), so the
    result is bitwise order-independent and a SQL mirror evaluating
    the same tree hash-matches. Scale shape: per-batch (a, b) count
    partials, ONE groupby-sum over distinct cells; marginals and the
    finish touch only the O(|A|·|B|) cell table on the driver.
    Returns one row: (n, t_sum, mi_ub)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby([col_a, col_b], sort=False)
            .size()
            .reset_index(name="c")
        )

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([col_a, col_b])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    cells["c"] = cells["c"].astype("int64")
    n = int(cells["c"].sum())
    ca = cells.groupby(col_a)["c"].transform("sum").to_numpy(np.float64)
    cb = cells.groupby(col_b)["c"].transform("sum").to_numpy(np.float64)
    cf = cells["c"].to_numpy(dtype=np.float64)
    nf = np.float64(n)
    t = np.floor(
        cf * np.log2((cf * nf) / (ca * cb)) * 1048576.0
    ).astype(np.int64)
    t_sum = int(t.sum())
    mi_ub = int(
        np.floor((np.float64(t_sum) / 1048576.0) / nf * 1048576.0)
    )
    return pd.DataFrame(
        {"n": [np.int64(n)], "t_sum": [np.int64(t_sum)],
         "mi_ub": [np.int64(mi_ub)]}
    )


def chi2_independence(
    ds: rd.Dataset,
    *,
    col_a: str,
    col_b: str,
) -> pd.DataFrame:
    """Pearson χ² test of independence between two bounded-domain
    categorical columns — the drift / association screen alongside
    ``mutual_information``.

    χ² = Σ_cells (O − E)²/E with E = c_a·c_b/N, summed over the FULL
    |A|×|B| grid (zero-observed cells contribute E). Same
    order-independence discipline as entropy/MI: per-cell terms are
    floor-quantized to int64 micro-units before the exact integer sum,
    and every float step is one fixed straight-line tree, so a SQL
    mirror hash-matches. Exchange carries distinct observed cells
    only; grid completion + finish happen on the O(|A|·|B|) driver
    table. Returns one row: (n, dof, chi2_uq)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby([col_a, col_b], sort=False)
            .size()
            .reset_index(name="c")
        )

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([col_a, col_b])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    cells["c"] = cells["c"].astype("int64")
    # complete the grid: zero-observed cells still contribute E
    avals = np.sort(cells[col_a].unique())
    bvals = np.sort(cells[col_b].unique())
    full = cells.set_index([col_a, col_b])["c"].reindex(
        pd.MultiIndex.from_product([avals, bvals]), fill_value=0
    )
    n = int(full.sum())
    grid = full.to_numpy(dtype=np.float64).reshape(len(avals), len(bvals))
    ca = grid.sum(axis=1)
    cb = grid.sum(axis=0)
    nf = np.float64(n)
    e = ca[:, None] * cb[None, :] / nf
    t = np.floor((grid - e) * (grid - e) / e * 1048576.0).astype(np.int64)
    dof = (len(avals) - 1) * (len(bvals) - 1)
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "dof": [np.int64(dof)],
            "chi2_uq": [np.int64(t.sum())],
        }
    )


def ols_from_moments(m: pd.DataFrame) -> pd.DataFrame:
    """Per-group simple linear regression (y on x) from a
    ``grouped_moments(..., y_col=...)`` frame: slope, intercept, and
    R² via the textbook sums formulas evaluated in doubles — exact
    int64 sums in, one straight-line float expression out, so a SQL
    mirror computing the same tree matches bit-for-bit (DuckDB's
    ``regr_slope``/``regr_intercept`` family, without relying on its
    internal accumulation order)."""
    n = m["n"].to_numpy(dtype=np.float64)
    sx = m["sum_x"].to_numpy(dtype=np.float64)
    sy = m["sum_y"].to_numpy(dtype=np.float64)
    sxx = m["sum_xx"].to_numpy(dtype=np.float64)
    syy = m["sum_yy"].to_numpy(dtype=np.float64)
    sxy = m["sum_xy"].to_numpy(dtype=np.float64)
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    out = m.copy()
    out["slope"] = cov_n / var_x
    out["intercept"] = (sy - (cov_n / var_x) * sx) / n
    out["r2"] = (cov_n * cov_n) / (var_x * var_y)
    return out


def pearson_from_moments(m: pd.DataFrame) -> np.ndarray:
    """Pearson r per row of a ``grouped_moments(..., y_col=...)``
    frame, via the textbook sums formula evaluated in doubles — the
    exact expression a SQL mirror can reproduce bit-for-bit."""
    n = m["n"].to_numpy(dtype=np.float64)
    sx = m["sum_x"].to_numpy(dtype=np.float64)
    sy = m["sum_y"].to_numpy(dtype=np.float64)
    sxx = m["sum_xx"].to_numpy(dtype=np.float64)
    syy = m["sum_yy"].to_numpy(dtype=np.float64)
    sxy = m["sum_xy"].to_numpy(dtype=np.float64)
    return (n * sxy - sx * sy) / (
        np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    )


def cohens_kappa(
    ds: rd.Dataset,
    *,
    label_a_col: str,
    label_b_col: str,
    group_col: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Cohen's kappa inter-rater agreement between two categorical
    label columns — the label-quality gate a human-feedback / LLM-judge
    pipeline runs before trusting its ratings (kappa ~0 = raters agree
    no better than chance; 1 = perfect). Optionally per ``group_col``
    (e.g. per task family or per annotator pair).

    Hash-exact by construction: with ``n`` items, ``a`` agreements and
    ``pe_num = sum_c count_a(c) * count_b(c)``, kappa is the exact-int
    rational ``(a*n − pe_num) / (n² − pe_num)`` evaluated with ONE
    float64 division (NULL when the denominator is 0 — both raters
    constant on the same single category). Exactness needs n < ~9.4e7
    per group (n² < 2^53) — per-group sizes, not corpus size.

    Scale: per-block (group, label_a, label_b) contingency partials
    map-side; ONE bounded shuffle (``bucketed_agg`` keyed on the group)
    carries contingency-cell cardinality, never items; each bucket
    holds complete groups so the kappa arithmetic is block-local.
    Null labels / null groups are excluded (SQL WHERE ... IS NOT NULL).
    """
    gcol = group_col or "_all"
    nb = num_buckets

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        cols = [label_a_col, label_b_col] + (
            [group_col] if group_col else []
        )
        b = b[cols].dropna()
        if group_col is None:
            b = b.assign(_all=0)
        g = (
            b.groupby([gcol, label_a_col, label_b_col], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return g

    cells = bucketed_agg(
        ds.map_batches(partials, batch_format="pandas"),
        [gcol, label_a_col, label_b_col],
        {"n": "sum"},
        nb=nb,
        bucket_key=gcol,
    )

    def kappa(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for grp, g in b.groupby(gcol, sort=False):
            n = int(g["n"].sum())
            agree = int(g.loc[g[label_a_col] == g[label_b_col], "n"].sum())
            na = g.groupby(label_a_col)["n"].sum()
            nbb = g.groupby(label_b_col)["n"].sum()
            cats = na.index.union(nbb.index)
            pe_num = int(
                (
                    na.reindex(cats, fill_value=0)
                    * nbb.reindex(cats, fill_value=0)
                ).sum()
            )
            den = n * n - pe_num
            k = float(agree * n - pe_num) / den if den != 0 else np.nan
            out.append((grp, n, agree, k))
        res = pd.DataFrame(
            out, columns=[gcol, "n_items", "n_agree", "kappa"]
        )
        res["n_items"] = res["n_items"].astype("int64")
        res["n_agree"] = res["n_agree"].astype("int64")
        res["kappa"] = res["kappa"].astype("float64")
        if group_col is None:
            res = res.drop(columns=[gcol])
        return res

    return cells.map_batches(kappa, batch_format="pandas")


def bradley_terry(
    ds: rd.Dataset,
    *,
    winner_col: str,
    loser_col: str,
    iters: int = 100,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Bradley-Terry strength fitting from pairwise outcomes — the
    ranking step after preference mining: given (winner, loser) rows
    (model A beat model B, template X preferred over Y), fit each
    item's strength p_i such that P(i beats j) = p_i/(p_i+p_j), via
    the classic MM / Zermelo iteration. Deterministic: fixed uniform
    start, fixed iteration count, geometric-mean normalization.

    Scale contract: raw outcome rows stream through ONE bounded
    shuffle (``bucketed_agg`` over (winner, loser)) that reduces them
    to distinct-PAIR counts; only the pair-count matrix reaches the
    driver, so the ITEM vocabulary must be driver-sized (policies,
    model ids, prompt templates — not raw texts). Items that only ever
    win (or only lose) get the MM fixed-point behavior (strength
    diverges toward the simplex edge; bounded by ``iters``).

    Returns a pandas DataFrame (item, wins, losses, strength, rank) —
    driver-sized by the contract above. Null winners/losers excluded.
    """
    from .windows import bucketed_agg

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[winner_col, loser_col]].dropna()
        g = (
            b.groupby([winner_col, loser_col], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return g

    pairs = bucketed_agg(
        ds.map_batches(partials, batch_format="pandas"),
        [winner_col, loser_col],
        {"n": "sum"},
        nb=num_buckets,
    ).to_pandas()

    items = sorted(
        set(pairs[winner_col]).union(pairs[loser_col])
    )
    idx = {it: i for i, it in enumerate(items)}
    k = len(items)
    wmat = np.zeros((k, k), dtype=np.float64)  # wins of i over j
    for w, l, n in pairs.itertuples(index=False):
        wmat[idx[w], idx[l]] += n
    nmat = wmat + wmat.T  # games between i and j
    wins = wmat.sum(axis=1)
    p = np.ones(k, dtype=np.float64)
    for _ in range(iters):
        denom = (nmat / (p[:, None] + p[None, :])).sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            newp = np.where(denom > 0, wins / denom, p)
        newp = np.where(newp > 0, newp, 1e-12)
        p = newp / np.exp(np.log(newp).mean())  # geometric-mean norm
    order = np.lexsort((np.array(items, dtype=object), -p))
    rank = np.empty(k, dtype=np.int64)
    rank[order] = np.arange(1, k + 1)
    return pd.DataFrame(
        {
            "item": items,
            "wins": wins.astype(np.int64),
            "losses": wmat.sum(axis=0).astype(np.int64),
            "strength": p,
            "rank": rank,
        }
    )


def pairwise_winrate(
    ds: rd.Dataset,
    *,
    winner_col: str,
    loser_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Head-to-head win matrix from (winner, loser) outcome rows — the
    eval-analytics companion to ``bradley_terry``: per UNORDERED pair
    {a, b} (canonicalized a < b), how many times each side won and the
    resulting win rate. Raw outcomes reduce map-side to directed-pair
    partials, ONE bounded shuffle carries distinct-pair counts, and
    the unordered fold is a per-bucket vectorized regroup — the matrix
    is pair-vocabulary-sized, never outcome-row-sized.

    Returns a Dataset of (item_a, item_b, wins_a, wins_b, n,
    winrate_a) with winrate_a the single float division of exact int
    counts. Null winners/losers excluded; self-pairs dropped."""
    from .windows import bucketed_agg

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[winner_col, loser_col]].dropna()
        b = b[b[winner_col] != b[loser_col]]
        a = b[winner_col].where(b[winner_col] < b[loser_col], b[loser_col])
        z = b[loser_col].where(b[winner_col] < b[loser_col], b[winner_col])
        first_won = (b[winner_col] < b[loser_col]).astype("int64")
        out = pd.DataFrame(
            {
                "item_a": a,
                "item_b": z,
                "wins_a": first_won,
                "wins_b": 1 - first_won,
            }
        )
        return (
            out.groupby(["item_a", "item_b"], sort=False)[["wins_a", "wins_b"]]
            .sum()
            .reset_index()
        )

    agg = bucketed_agg(
        ds.map_batches(partials, batch_format="pandas"),
        ["item_a", "item_b"],
        {"wins_a": "sum", "wins_b": "sum"},
        nb=num_buckets,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n"] = (b["wins_a"] + b["wins_b"]).astype("int64")
        b["winrate_a"] = b["wins_a"].astype("float64") / b["n"]
        return b[["item_a", "item_b", "wins_a", "wins_b", "n", "winrate_a"]]

    return agg.map_batches(finish, batch_format="pandas")


def position_bias(
    ds: rd.Dataset,
    *,
    first_col: str,
    second_col: str,
    winner_col: str,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Presentation-order bias probe for pairwise judgments — the
    standard LLM-judge sanity check: given rows carrying WHICH item was
    shown first, which second, and which won, report per item its win
    rate when presented first vs when presented second, plus an
    ``__overall__`` row (first-position win rate across all
    judgments). An unbiased judge shows first≈second; a large gap
    flags position bias in the labeling pipeline.

    Map-side partials carry 4 int counters per item per batch; ONE
    bounded shuffle reduces them. Returns a driver-sized pandas frame
    (item vocabulary must be driver-sized: model ids, templates):
    (item, first_wins, first_n, second_wins, second_n,
    first_winrate, second_winrate) — rates are single float divisions
    of exact ints (NaN when never presented in that slot). Rows where
    the winner is neither presented item are excluded."""
    from .windows import bucketed_agg

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[first_col, second_col, winner_col]].dropna()
        b = b[
            (b[winner_col] == b[first_col]) | (b[winner_col] == b[second_col])
        ]
        fw = (b[winner_col] == b[first_col]).astype("int64")
        f = pd.DataFrame(
            {
                "item": b[first_col],
                "first_wins": fw,
                "first_n": 1,
                "second_wins": 0,
                "second_n": 0,
            }
        )
        s = pd.DataFrame(
            {
                "item": b[second_col],
                "first_wins": 0,
                "first_n": 0,
                "second_wins": 1 - fw,
                "second_n": 1,
            }
        )
        both = pd.concat([f, s], ignore_index=True)
        return (
            both.groupby("item", sort=False)
            .sum()
            .reset_index()
        )

    agg = bucketed_agg(
        ds.map_batches(partials, batch_format="pandas"),
        "item",
        {
            "first_wins": "sum",
            "first_n": "sum",
            "second_wins": "sum",
            "second_n": "sum",
        },
        nb=num_buckets,
    ).to_pandas()
    total = pd.DataFrame(
        {
            "item": ["__overall__"],
            "first_wins": [int(agg["first_wins"].sum())],
            "first_n": [int(agg["first_n"].sum())],
            "second_wins": [int(agg["second_wins"].sum())],
            "second_n": [int(agg["second_n"].sum())],
        }
    )
    out = pd.concat([agg, total], ignore_index=True)
    for c in ("first_wins", "first_n", "second_wins", "second_n"):
        out[c] = out[c].astype("int64")
    out["first_winrate"] = out["first_wins"].astype("float64") / out["first_n"]
    out["second_winrate"] = (
        out["second_wins"].astype("float64") / out["second_n"]
    )
    return out.sort_values("item").reset_index(drop=True)


def preference_cycles(
    ds: rd.Dataset,
    *,
    winner_col: str,
    loser_col: str,
    num_buckets: int | None = None,
) -> "pa.Table":
    """Intransitivity audit over pairwise outcomes: directed 3-cycles
    in the MAJORITY digraph (edge a->b iff a beat b strictly more often
    than b beat a; ties draw no edge) — the rock-paper-scissors triples
    that break any total ranking (Bradley-Terry, ELO) fitted to the
    same judgments.

    Scale shape: outcomes reduce through ``pairwise_winrate`` (one
    bounded shuffle of distinct-pair counts); only the PAIR MATRIX —
    item-vocabulary-squared, model-eval-sized by nature — reaches the
    driver, where cycle enumeration is a vectorized adjacency pass.
    Returns a pa.Table (item_a, item_b, item_c): each cycle once,
    rotated so item_a is its lexicographic minimum, following edge
    direction a->b->c->a."""
    import numpy as np
    import pyarrow as pa

    mat = pairwise_winrate(
        ds, winner_col=winner_col, loser_col=loser_col,
        num_buckets=num_buckets,
    ).to_pandas()
    items = sorted(set(mat["item_a"]) | set(mat["item_b"]))
    idx = {v: i for i, v in enumerate(items)}
    k = len(items)
    adj = np.zeros((k, k), dtype=bool)
    for _, r in mat.iterrows():
        a, b = idx[r["item_a"]], idx[r["item_b"]]
        if r["wins_a"] > r["wins_b"]:
            adj[a, b] = True
        elif r["wins_b"] > r["wins_a"]:
            adj[b, a] = True
    rows = []
    for a in range(k):
        bs = np.nonzero(adj[a])[0]
        for b in bs[bs > a]:
            cs = np.nonzero(adj[b] & adj[:, a])[0]
            for c in cs[cs > a]:
                rows.append((items[a], items[b], items[c]))
    rows.sort()
    return pa.table(
        {
            "item_a": pa.array([r[0] for r in rows], pa.string()),
            "item_b": pa.array([r[1] for r in rows], pa.string()),
            "item_c": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def length_bias(
    ds: rd.Dataset,
    *,
    len_first_col: str,
    len_second_col: str,
    winner_col: str,
    first_value: str = "first",
    bucket_width: int = 10,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Judge verbosity-bias probe: first-presented win rate as a
    function of the LENGTH GAP between the presented answers — a judge
    that rewards longer answers shows first-win rate rising with
    (len_first − len_second). Rows carry the two lengths and which side
    won; gaps bucket by ``bucket_width`` (floor division, so negative
    gaps land in negative buckets); per-bucket int partials map-side,
    ONE bounded shuffle, win rate a single float division of exact
    ints. Returns (gap_bucket, n, first_wins, first_win_rate)."""
    from .windows import bucketed_agg

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[len_first_col, len_second_col, winner_col]].dropna()
        gap = (
            b[len_first_col].astype("int64")
            - b[len_second_col].astype("int64")
        )
        out = pd.DataFrame(
            {
                "gap_bucket": np.floor_divide(gap, bucket_width),
                "n": 1,
                "first_wins": (b[winner_col] == first_value).astype("int64"),
            }
        )
        return (
            out.groupby("gap_bucket", sort=False)[["n", "first_wins"]]
            .sum()
            .reset_index()
        )

    agg = bucketed_agg(
        ds.map_batches(partials, batch_format="pandas"),
        ["gap_bucket"],
        {"n": "sum", "first_wins": "sum"},
        nb=num_buckets,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["first_win_rate"] = (
            b["first_wins"].astype("float64") / b["n"].astype("float64")
        )
        return b[["gap_bucket", "n", "first_wins", "first_win_rate"]]

    return agg.map_batches(finish, batch_format="pandas")


def fleiss_kappa(
    ds: rd.Dataset,
    *,
    item_col: str,
    category_col: str,
    num_buckets: int | None = None,
) -> dict:
    """Fleiss' kappa: chance-corrected agreement for N items each rated
    by the SAME number n of raters into categories — the multi-rater
    generalization of Cohen's kappa (``cohen_kappa`` handles 2 raters).
    Input: one row per rating (item, category). Raises if item rating
    counts differ (Fleiss is undefined there).

    Hash-exact by construction: with S = Σ_i Σ_k n_ik², c_k = category
    totals and M = N·n,

        kappa = [ (S − M)·M² − M·(n−1)·Σ_k c_k² ]
                / [ M·(n−1)·(M² − Σ_k c_k²) ]

    — every term an exact integer (Python bigints, no overflow), ONE
    float division at the end, so the value matches a SQL mirror
    bitwise. Scale shape: ratings reduce map-side to (item, category)
    count partials, ONE bounded shuffle (``bucketed_agg`` on the item
    key), per-bucket vectorized squares, and only per-bucket SCALAR
    partials (Σn², category totals, item count) reach the driver."""
    from .windows import bucketed_agg

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[item_col, category_col]].dropna()
        out = b.groupby([item_col, category_col], sort=False).size()
        return out.rename("cnt").reset_index()

    counts = bucketed_agg(
        ds.map_batches(partials, batch_format="pandas"),
        [item_col, category_col],
        {"cnt": "sum"},
        nb=num_buckets,
        bucket_key=item_col,
    )

    def bucket_scalars(b: pd.DataFrame) -> pd.DataFrame:
        per_item = b.groupby(item_col, sort=False)["cnt"].agg(["sum"])
        sq = b.assign(sq=b["cnt"].astype("int64") ** 2)
        per_cat = b.groupby(category_col, sort=False)["cnt"].sum()
        return pd.DataFrame(
            {
                "n_items": [len(per_item)],
                "rater_min": [int(per_item["sum"].min())],
                "rater_max": [int(per_item["sum"].max())],
                "sum_sq": [int(sq["sq"].sum())],
                "cats": [per_cat.index.tolist()],
                "cat_counts": [per_cat.astype("int64").tolist()],
            }
        )

    N = n_min = n_max = S = 0
    cat_totals: dict = {}
    for b in counts.map_batches(
        bucket_scalars, batch_format="pandas"
    ).iter_batches(batch_format="pandas", batch_size=4096):
        for _, r in b.iterrows():
            N += int(r["n_items"])
            n_min = min(n_min or r["rater_min"], r["rater_min"])
            n_max = max(n_max, r["rater_max"])
            S += int(r["sum_sq"])
            for c, v in zip(r["cats"], r["cat_counts"]):
                cat_totals[c] = cat_totals.get(c, 0) + int(v)
    if N == 0:
        raise ValueError("no ratings")
    if n_min != n_max:
        raise ValueError(
            f"Fleiss' kappa needs a constant rater count per item; "
            f"saw {n_min}..{n_max}"
        )
    n = n_max
    if n < 2:
        raise ValueError("need at least 2 raters per item")
    M = N * n
    csq = sum(v * v for v in cat_totals.values())
    num = (S - M) * M * M - M * (n - 1) * csq
    den = M * (n - 1) * (M * M - csq)
    return {
        "n_items": N,
        "n_raters": n,
        "n_categories": len(cat_totals),
        "kappa": float(num) / float(den) if den else 1.0,
    }
