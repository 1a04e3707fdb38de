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
