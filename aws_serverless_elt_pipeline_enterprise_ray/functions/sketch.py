"""Mergeable cardinality sketches: HyperLogLog COUNT(DISTINCT ~).

``distinct_count`` (functions/aggregates.py) is EXACT but shuffles the
locally-distinct (group, value) pairs — at 100 TB a high-cardinality
column (URLs, user ids, shingles) can make even that exchange the
bottleneck. HyperLogLog is the standard answer: a fixed ``2^p``-byte
register array per (group), built per batch with no shuffle at all and
merged by element-wise max — the canonical mergeable summary, so the
combine is a byte-bounded tree exactly like the Bloom build. Standard
error ≈ 1.04/sqrt(2^p) (p=14 → ~0.8%).

Hashing is pandas SipHash (deterministic across processes — builtin
``hash`` is salted per process and must never feed a distributed
sketch). Estimator: Flajolet et al. 2007 with the small-range linear
counting correction; no large-range correction needed at 64-bit
hashes.

This is deliberately a REGISTER-level public API (``hll_partials`` →
``hll_merge`` → ``hll_estimate``) so callers can persist per-partition
registers in a lake table and maintain incremental distinct counts the
way matview.py maintains sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    out = np.zeros(v.shape, dtype=np.int64)
    v = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        out[big] += shift
        v[big] >>= np.uint64(shift)
    out[v > 0] += 1
    return out


def _registers(values: pd.Series, p: int) -> np.ndarray:
    """One batch's HLL registers (uint8[2^p])."""
    regs = np.zeros(1 << p, dtype=np.uint8)
    vals = values.dropna()
    if not len(vals):
        return regs
    h = pd.util.hash_pandas_object(vals, index=False).to_numpy(dtype=np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    # rank of first set bit from the top of the (64-p)-bit suffix
    rho = ((64 - p) - _bit_length_u64(rest) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate from one register array."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:  # small-range: linear counting
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_merge(reg_list) -> np.ndarray:
    return np.maximum.reduce([np.asarray(r, dtype=np.uint8) for r in reg_list])


def dd_partials(
    ds: rd.Dataset,
    cents_expr,
    *,
    group_col: str | None = None,
    alpha: float = 0.01,
) -> rd.Dataset:
    """DDSketch-style log-bucketed histogram partials (Masson et al.,
    VLDB 2019): value v > 0 lands in bucket ceil(log_gamma(v)) with
    gamma = (1+alpha)/(1-alpha), guaranteeing RELATIVE error <= alpha
    on every quantile. Mergeable by bucket-count addition; partial size
    is O(log(value range)/alpha), independent of rows. The float-domain
    complement of the EXACT integer counting histogram
    (aggregates.grouped_quantiles): use this when the measure is
    continuous/unbounded so exact value-binning can't bound the
    shuffle. Zero/negative values get the reserved bucket 0 (DDSketch's
    zero bucket; extend with a mirrored negative store if needed).

    ``cents_expr(batch) -> float/int numpy`` extracts the measure."""
    gamma_log = np.log((1 + alpha) / (1 - alpha))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = np.asarray(cents_expr(b), dtype=np.float64)
        key = np.zeros(len(v), dtype=np.int64)
        pos = v > 0
        key[pos] = np.ceil(np.log(v[pos]) / gamma_log).astype(np.int64)
        if group_col is None:
            ks, ns = np.unique(key, return_counts=True)
            return pd.DataFrame({"bucket": ks, "n": ns.astype(np.int64)})
        df = pd.DataFrame({group_col: b[group_col].to_numpy(), "bucket": key})
        out = df.value_counts([group_col, "bucket"], sort=False).reset_index()
        out.columns = [group_col, "bucket", "n"]
        out["n"] = out["n"].astype(np.int64)
        return out

    return ds.map_batches(partial, batch_format="pandas")


def dd_quantiles(
    ds: rd.Dataset,
    cents_expr,
    *,
    group_col: str | None = None,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    alpha: float = 0.01,
) -> pd.DataFrame:
    """Approximate quantiles with guaranteed relative error <= alpha.
    Partials are SKETCH-sized (<= log-range/alpha buckets per group per
    block, independent of rows), so the combine is a single driver
    groupby-sum over blocks x buckets rows — the `_hot_buckets`
    pattern; a distributed aggregate here would pay Ray's per-group
    combine for no volume reduction. The driver walks result-sized
    CDFs only. Returns one row per group with ``q##`` columns (bucket
    midpoint back-transform)."""
    gamma = (1 + alpha) / (1 - alpha)
    parts = dd_partials(ds, cents_expr, group_col=group_col, alpha=alpha)
    keys = ["bucket"] if group_col is None else [group_col, "bucket"]
    hist = (
        parts.to_pandas().groupby(keys, sort=False)["n"].sum().reset_index()
    )

    def walk(sub: pd.DataFrame) -> dict:
        sub = sub.sort_values("bucket")
        cum = sub["n"].cumsum().to_numpy()
        total = cum[-1]
        row = {}
        for q in quantiles:
            target = max(int(np.ceil(q * total)), 1)
            k = int(sub["bucket"].to_numpy()[np.searchsorted(cum, target)])
            # bucket k covers (gamma^(k-1), gamma^k]; midpoint estimate
            row[f"q{int(q * 100):02d}"] = (
                0.0 if k == 0 else 2 * gamma**k / (gamma + 1)
            )
        return row

    if group_col is None:
        return pd.DataFrame([walk(hist)])
    rows = [
        {group_col: g, **walk(sub)} for g, sub in hist.groupby(group_col, sort=True)
    ]
    return pd.DataFrame(rows).reset_index(drop=True)


def hll_partials(
    ds: rd.Dataset, col: str, *, group_col: str | None = None, p: int = 14
) -> rd.Dataset:
    """Per-batch register partials: one row per (group,) per batch with
    the packed register bytes. No shuffle — partials are fixed-size."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if group_col is None:
            return pd.DataFrame({"regs": [_registers(b[col], p).tobytes()]})
        rows = [
            (g, _registers(sub[col], p).tobytes())
            for g, sub in b.groupby(group_col, sort=False, dropna=False)
        ]
        return pd.DataFrame(rows, columns=[group_col, "regs"])

    return ds.map_batches(partial, batch_format="pandas")


def hll_distinct(
    ds: rd.Dataset, col: str, *, group_col: str | None = None, p: int = 14
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT col) (per ``group_col`` when given).
    Driver sees only register partials: ``blocks × groups × 2^p``
    bytes, independent of row count or cardinality."""
    parts = hll_partials(ds, col, group_col=group_col, p=p).take_all()
    if group_col is None:
        regs = hll_merge([np.frombuffer(r["regs"], np.uint8) for r in parts]) \
            if parts else np.zeros(1 << p, np.uint8)
        return pd.DataFrame({"n_approx": [hll_estimate(regs)]})
    by_group: dict = {}
    for r in parts:
        cur = by_group.get(r[group_col])
        regs = np.frombuffer(r["regs"], np.uint8)
        by_group[r[group_col]] = regs if cur is None else np.maximum(cur, regs)
    out = pd.DataFrame(
        {
            group_col: list(by_group),
            "n_approx": [hll_estimate(v) for v in by_group.values()],
        }
    )
    return out.sort_values(group_col).reset_index(drop=True)


def hll_distinct_by_group(
    ds: rd.Dataset,
    *,
    group_col: str,
    value_col: str,
    p: int = 8,
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT value) per group via HyperLogLog —
    the scale path beside the exact ``aggregates.distinct_count``: the
    exchange carries at most groups × 2^p register rows per block
    (p=8 ⇒ ±~6.5%), regardless of value cardinality, where the exact
    op's shuffle grows with the distinct count itself.

    Per batch: one vectorized hash → (register, rho) pass and a
    C-level per-(group, register) max partial; ONE groupby-max merges
    (max is associative/commutative ⇒ the result is bitwise
    deterministic and layout-invariant); the bias-corrected estimate
    runs on the register-sized driver table. Returns
    (group, n_distinct_est)."""
    from ray.data.aggregate import Max

    mask = (np.uint64(1) << np.uint64(64 - p)) - np.uint64(1)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b[[group_col, value_col]].dropna(subset=[value_col])
        if not len(d):
            return pd.DataFrame({group_col: [], "reg": [], "rho": []})
        h = pd.util.hash_pandas_object(
            d[value_col], index=False
        ).to_numpy(dtype=np.uint64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h & mask
        rho = ((64 - p) - _bit_length_u64(rest) + 1).astype(np.int64)
        f = pd.DataFrame(
            {group_col: d[group_col].to_numpy(), "reg": idx, "rho": rho}
        )
        return (
            f.groupby([group_col, "reg"], sort=False)["rho"]
            .max()
            .reset_index()
        )

    from .windows import bucketed_agg

    merged = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col, "reg"], {"rho": "max"}, bucket_key="reg",
    ).to_pandas()
    rows = []
    for g, sub in merged.groupby(group_col):
        regs = np.zeros(1 << p, dtype=np.uint8)
        regs[sub["reg"].to_numpy(dtype=np.int64)] = sub["rho"].to_numpy(
            dtype=np.uint8
        )
        rows.append({group_col: g, "n_distinct_est": hll_estimate(regs)})
    out = pd.DataFrame(rows).sort_values(group_col).reset_index(drop=True)
    out["n_distinct_est"] = out["n_distinct_est"].astype("int64")
    return out


# -- Count-Min sketch -------------------------------------------------

_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _cms_positions(values: pd.Series, width: int, depth: int) -> np.ndarray:
    """(depth, n) int64 bucket positions via one pandas hash + per-row
    splitmix-style reseeding — deterministic across processes (the same
    contract as every hash in this engine)."""
    h = pd.util.hash_pandas_object(values, index=False).to_numpy(dtype=np.uint64)
    out = np.empty((depth, len(h)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for d in range(depth):
            x = (h ^ _CMS_SEEDS[d]) * np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(33)
            out[d] = (x % np.uint64(width)).astype(np.int64)
    return out


def cms_partials(
    ds: rd.Dataset, col: str, *, width: int = 2048, depth: int = 4
) -> rd.Dataset:
    """Per-batch Count-Min partials: one row per batch carrying the
    flattened ``depth × width`` int64 count matrix. No shuffle —
    partials are fixed-size (64 KB at the defaults) regardless of row
    count or key cardinality; merging is elementwise SUM, so the
    sketch is associative/commutative and bitwise deterministic."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros((depth, width), dtype=np.int64)
        v = b[col].dropna()
        if len(v):
            pos = _cms_positions(v, width, depth)
            for d in range(depth):
                np.add.at(counts[d], pos[d], 1)
        return pd.DataFrame({"counts": [counts.tobytes()]})

    return ds.map_batches(partial, batch_format="pandas")


def cms_merge(parts: list[bytes], *, width: int = 2048, depth: int = 4) -> np.ndarray:
    total = np.zeros((depth, width), dtype=np.int64)
    for raw in parts:
        total += np.frombuffer(raw, np.int64).reshape(depth, width)
    return total


def cms_counts(
    ds: rd.Dataset,
    col: str,
    queries: list,
    *,
    width: int = 2048,
    depth: int = 4,
) -> pd.DataFrame:
    """Approximate frequency of each query key: the classic Count-Min
    guarantee — estimate ≥ true count always, and ≤ true + εN with
    probability 1−δ for ε = e/width, δ = e^−depth. The missing member
    of the sketch family beside HLL (distinct), DDSketch (quantiles),
    Bloom (membership) and Misra-Gries (heavy hitters): use it when
    you need POINT frequency estimates over an unbounded key domain
    (url/user/shingle counts at 100 TB) without a key-cardinality
    shuffle. Driver sees blocks × 64 KB partials, never keys."""
    parts = cms_partials(ds, col, width=width, depth=depth).take_all()
    mat = cms_merge([r["counts"] for r in parts], width=width, depth=depth)
    q = pd.Series(queries)
    pos = _cms_positions(q, width, depth)
    est = np.min(
        np.stack([mat[d, pos[d]] for d in range(depth)], axis=0), axis=0
    )
    return pd.DataFrame({col: queries, "n_approx": est.astype(np.int64)})
