"""Data-drift monitors between two halves of an event stream.

A production CDC lake needs to notice when the INCOMING distribution
shifts — the reference runs Great Expectations suites per batch
(``glue/jobs`` DQ rules) which catch per-batch range violations but
not gradual population drift. These operators compare a baseline
window against the current window of the same table and emit the
standard drift statistics:

* ``categorical_drift`` — per-bin PSI and Jensen-Shannon terms over a
  categorical column (Laplace-smoothed, per-term floor-quantized to
  integer nanos so a SQL mirror hash-matches despite logarithms — the
  same convention as ``grouped_entropy``).
* ``ks_drift`` — the exact two-sample Kolmogorov-Smirnov statistic
  over an integer-valued column, as a RATIONAL: D = d_num / (n_a*n_b)
  with d_num = max |cum_a*n_b - cum_b*n_a|. No floats anywhere.
* ``mannwhitney_drift`` — the exact Mann-Whitney U rank-sum statistic
  (doubled, so midrank ties stay integral): 2U_A = Σ_v n_a(v) *
  (2·cum_b(<v) + n_b(v)).

Split rule: the window boundary is the midpoint of the OBSERVED
``ts`` range — ``tmin + (tmax - tmin) // 2`` in epoch microseconds,
integer arithmetic on both sides (numpy here, ``epoch_us`` + ``//``
in the SQL mirror). Side 0 = baseline (ts < mid), side 1 = current.

Scale shape: one column-pruned pass computes the ts extrema (tiny
partial min/max exchange); one more pass emits per-batch partial
counts of (bin, side) — the exchange is bounded by the bin/value
DOMAIN, never the row count — and the final statistic is computed on
the driver from the domain-sized histogram with exact Python-int
arithmetic (cum·n products overflow int64 at 10^10-event scale;
object-dtype ints are exact and the frame is domain-sized, not
row-sized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .windows import bucketed_agg

NANO = 1_000_000_000


def ts_midpoint_us(ds: rd.Dataset, ts_col: str = "ts") -> tuple[int, int, int]:
    """(tmin, tmax, mid) of ``ts_col`` in epoch microseconds.

    One column-pruned streaming pass; the exchange carries one
    (min, max) pair per block."""

    def extrema(b: pd.DataFrame) -> pd.DataFrame:
        v = np.asarray(b[ts_col].astype("datetime64[us]")).view("int64")
        return pd.DataFrame({"tmin": [v.min()], "tmax": [v.max()]})

    part = ds.select_columns([ts_col]).map_batches(
        extrema, batch_format="pandas"
    ).to_pandas()
    tmin = int(part["tmin"].min())
    tmax = int(part["tmax"].max())
    return tmin, tmax, tmin + (tmax - tmin) // 2


def _side_counts(
    ds: rd.Dataset,
    *,
    bin_fn,
    bin_col: str,
    ts_col: str,
    mid_us: int,
    cols: list[str],
) -> pd.DataFrame:
    """Domain-sized histogram of (bin, side) counts.

    ``bin_fn(batch) -> Series`` maps each row to its bin; rows with a
    null bin are dropped (both mirrors must agree on that)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = np.asarray(b[ts_col].astype("datetime64[us]")).view("int64")
        side = (t >= mid_us).astype(np.int64)
        d = pd.DataFrame({bin_col: bin_fn(b), "side": side})
        d = d[d[bin_col].notna()]
        return d.groupby([bin_col, "side"], sort=False).size().reset_index(
            name="n"
        )

    hist = bucketed_agg(
        ds.select_columns(cols).map_batches(partial, batch_format="pandas"),
        [bin_col, "side"],
        {"n": "sum"},
    ).to_pandas()
    # pivot to one row per bin with both side counts (missing -> 0)
    wide = (
        hist.pivot_table(
            index=bin_col, columns="side", values="n", aggfunc="sum",
            fill_value=0,
        )
        .reindex(columns=[0, 1], fill_value=0)
        .reset_index()
    )
    wide.columns = [bin_col, "n_a", "n_b"]
    wide["n_a"] = wide["n_a"].astype("int64")
    wide["n_b"] = wide["n_b"].astype("int64")
    return wide.sort_values(bin_col).reset_index(drop=True)


def categorical_drift(
    ds: rd.Dataset,
    *,
    col: str,
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Per-bin PSI and Jensen-Shannon drift terms between the two
    halves of the ``ts`` range, Laplace-smoothed so empty bins stay
    finite: p = (n_a+1)/(N_a+K), q = (n_b+1)/(N_b+K) with K = number
    of observed bins.

    Each term is floor-quantized to integer NANOS before any summing —
    ``psi_nano = floor((p-q)·ln(p/q)·1e9)``, ``js_nano`` likewise with
    m = (p+q)/2 — so the result is an exact int64 frame and the SQL
    mirror (identical straight-line double expression trees) hash-
    matches; a 1-ulp libm divergence would need a term to land within
    ~1e-10 of an integer to flip a floor.

    Returns (bin, n_a, n_b, psi_nano, js_nano) ordered by bin."""
    _, _, mid = ts_midpoint_us(ds, ts_col)
    wide = _side_counts(
        ds,
        bin_fn=lambda b: b[col],
        bin_col=col,
        ts_col=ts_col,
        mid_us=mid,
        cols=[col, ts_col],
    )
    k = len(wide)
    na = wide["n_a"].to_numpy(dtype=np.float64)
    nb = wide["n_b"].to_numpy(dtype=np.float64)
    ta = float(wide["n_a"].sum()) + k
    tb = float(wide["n_b"].sum()) + k
    p = (na + 1.0) / ta
    q = (nb + 1.0) / tb
    wide["psi_nano"] = np.floor((p - q) * np.log(p / q) * NANO).astype(
        "int64"
    )
    m = (p + q) / 2.0
    js = 0.5 * p * np.log(p / m) + 0.5 * q * np.log(q / m)
    wide["js_nano"] = np.floor(js * NANO).astype("int64")
    return wide


def _cum_pairs(wide: pd.DataFrame) -> tuple[list, list, int, int]:
    """Exact Python-int cumulative counts per side over sorted bins."""
    na = [int(x) for x in wide["n_a"]]
    nb = [int(x) for x in wide["n_b"]]
    ca, cb, ta, tb = [], [], 0, 0
    for a, b in zip(na, nb):
        ta += a
        tb += b
        ca.append(ta)
        cb.append(tb)
    return ca, cb, ta, tb


def ks_drift(
    ds: rd.Dataset,
    *,
    value_fn,
    value_col: str,
    cols: list[str],
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Exact two-sample KS between the halves of the ``ts`` range over
    an integer-valued expression ``value_fn(batch) -> Series``.

    D = max_v |F_a(v) - F_b(v)| as the exact rational
    d_num / (n_a·n_b); ``at_value`` is the smallest v attaining the
    max, ``d_ppm = d_num·1e6 // (n_a·n_b)`` (exact integer division).
    Products reach ~N² so the driver-side fold uses Python ints.

    Returns a single row (at_value, d_num, n_a, n_b, d_ppm)."""
    _, _, mid = ts_midpoint_us(ds, ts_col)
    wide = _side_counts(
        ds, bin_fn=value_fn, bin_col=value_col, ts_col=ts_col,
        mid_us=mid, cols=cols,
    )
    ca, cb, ta, tb = _cum_pairs(wide)
    best, at = -1, None
    for v, a, b in zip(wide[value_col], ca, cb):
        d = abs(a * tb - b * ta)
        if d > best:
            best, at = d, v
    return pd.DataFrame(
        {
            "at_value": pd.array([int(at)], dtype="int64"),
            "d_num": pd.array([best], dtype="int64"),
            "n_a": pd.array([ta], dtype="int64"),
            "n_b": pd.array([tb], dtype="int64"),
            "d_ppm": pd.array(
                [best * 1_000_000 // (ta * tb)], dtype="int64"
            ),
        }
    )


def embedding_drift(
    ds: rd.Dataset,
    *,
    id_col: str,
    vec_col: str,
    side_fn=None,
) -> pd.DataFrame:
    """Centroid drift between two halves of an embedding corpus:
    cosine between the per-side MEAN vectors (direction drift) and the
    mean-norm ratio (scale drift).

    Elements are floor-quantized to int64 micros per row, so the
    per-dimension per-side sums are EXACT integers (the count factors
    cancel in the cosine); dot/norm products run in Python ints on the
    driver (they pass int64 at 10^10 rows) and each output statistic
    is ONE straight-line double expression of those exact ints,
    floored to nanos — the SQL mirror (same expression tree over
    HUGEINT sums) hash-matches.

    ``side_fn(batch) -> 0/1 array`` picks the baseline/current side;
    default is ``id_col`` parity (two deterministic interleaved
    snapshots — in a live lake you'd pass the snapshot tag).

    Scale shape: per-batch (dim, side) partial sums — the exchange is
    dims × 2 rows per block, never the corpus — then a domain-sized
    groupby-sum. Returns one row (n_a, n_b, cos_nano, scale_nano)."""
    if side_fn is None:
        def side_fn(b: pd.DataFrame) -> np.ndarray:
            return (
                b[id_col].to_numpy(dtype=np.int64) % 2
            ).astype(np.int64)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(b[vec_col].to_numpy())
        q = np.floor(mat.astype(np.float64) * 1e6).astype(np.int64)
        side = side_fn(b)
        rows = []
        for s in (0, 1):
            mask = side == s
            if not mask.any():
                continue
            sums = q[mask].sum(axis=0)
            d = pd.DataFrame(
                {
                    "dim": np.arange(1, q.shape[1] + 1, dtype=np.int64),
                    "side": np.int64(s),
                    "s": sums,
                    "n": np.int64(mask.sum()),
                }
            )
            rows.append(d)
        return pd.concat(rows, ignore_index=True)

    part = bucketed_agg(
        ds.select_columns([id_col, vec_col]).map_batches(
            partial, batch_format="pandas"
        ),
        ["dim", "side"],
        {"s": "sum", "n": "sum"},
    ).to_pandas()
    wide = (
        part.pivot_table(
            index="dim", columns="side", values="s", aggfunc="sum",
            fill_value=0,
        )
        .reindex(columns=[0, 1], fill_value=0)
        .sort_index()
    )
    sa = [int(x) for x in wide[0]]
    sb = [int(x) for x in wide[1]]
    # n repeats per dim; read it off dim 1 (every vector has dim 1)
    one = part[part["dim"] == 1]
    na = int(one.loc[one["side"] == 0, "n"].sum())
    nb = int(one.loc[one["side"] == 1, "n"].sum())
    dot = sum(a * b for a, b in zip(sa, sb))
    qa = sum(a * a for a in sa)
    qb = sum(b * b for b in sb)
    import math

    cos = float(dot) / (math.sqrt(float(qa)) * math.sqrt(float(qb)))
    scale = (
        math.sqrt(float(qb)) * float(na)
        / (math.sqrt(float(qa)) * float(nb))
    )
    return pd.DataFrame(
        {
            "n_a": pd.array([na], dtype="int64"),
            "n_b": pd.array([nb], dtype="int64"),
            "cos_nano": pd.array(
                [math.floor(cos * NANO)], dtype="int64"
            ),
            "scale_nano": pd.array(
                [math.floor(scale * NANO)], dtype="int64"
            ),
        }
    )


def mannwhitney_drift(
    ds: rd.Dataset,
    *,
    value_fn,
    value_col: str,
    cols: list[str],
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Exact Mann-Whitney U (doubled, so midrank tie credit stays
    integral) of the baseline half vs the current half:

        2·U_a = Σ_v n_a(v) · (2·cum_b(v-) + n_b(v))

    plus the ppm-floored effect size ``auc_ppm = u2_a·1e6 //
    (2·n_a·n_b)`` (the probability a random current value exceeds a
    random baseline value, ties half-credited — exact integer
    division over Python ints).

    Returns a single row (u2_a, n_a, n_b, auc_ppm)."""
    _, _, mid = ts_midpoint_us(ds, ts_col)
    wide = _side_counts(
        ds, bin_fn=value_fn, bin_col=value_col, ts_col=ts_col,
        mid_us=mid, cols=cols,
    )
    na = [int(x) for x in wide["n_a"]]
    nb = [int(x) for x in wide["n_b"]]
    u2, cumb, ta, tb = 0, 0, 0, 0
    # sorted by value ascending; U_a credits pairs where a-value >
    # b-value (full) or ties (half). Iterate ascending keeping the
    # cumulative b-count BELOW the current value.
    for a, b in zip(na, nb):
        u2 += a * (2 * cumb + b)
        cumb += b
        ta += a
        tb += b
    return pd.DataFrame(
        {
            "u2_a": pd.array([u2], dtype="int64"),
            "n_a": pd.array([ta], dtype="int64"),
            "n_b": pd.array([tb], dtype="int64"),
            "auc_ppm": pd.array(
                [u2 * 1_000_000 // (2 * ta * tb)], dtype="int64"
            ),
        }
    )


def embedding_outliers(
    ds: rd.Dataset,
    *,
    id_col: str,
    vec_col: str,
    k: int = 20,
) -> pd.DataFrame:
    """Top-k embedding outliers: the vectors farthest (squared L2) from
    the corpus centroid — the broken-encoder / off-distribution screen
    run before embedding-based dedup or clustering trusts the space.

    Exact by construction: elements floor-quantize to int64 micros
    (same convention as ``embedding_drift``); with S the per-dimension
    integer sum and n the count, ranking by distance to the mean S/n
    equals ranking by ``d2 = ||n·x − S||²`` (the n² scale is shared),
    which is an EXACT integer per vector — no float enters the
    ordering or the output, so ties (identical vectors) break by id
    deterministically and the SQL mirror hash-matches bitwise.

    Scale shape: pass 1 computes (dim, sum) partials (dims-sized
    exchange, never the corpus); S and n broadcast back; pass 2 scores
    each batch vectorized (one int64→object matmul per batch — d2 can
    exceed int64 at web scale, so the per-vector total sums in Python
    ints) and keeps its local top-k; the driver reduces block-count × k
    candidate rows. Returns (id, d2) as decimal strings ordered by
    (d2 desc, id)."""
    # pass 1: exact per-dimension sums + count
    def dim_partials(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"dim": pd.Series([], dtype="int64"),
                 "s": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        mat = np.floor(
            np.stack(b[vec_col].to_numpy()).astype(np.float64) * 1e6
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "dim": np.arange(mat.shape[1], dtype=np.int64),
                "s": mat.sum(axis=0, dtype=np.int64),
                "n": np.full(mat.shape[1], len(b), dtype=np.int64),
            }
        )

    parts = ds.map_batches(dim_partials, batch_format="pandas").to_pandas()
    agg = parts.groupby("dim", sort=True)[["s", "n"]].sum()
    S = agg["s"].to_numpy()
    n = int(agg["n"].iloc[0]) if len(agg) else 0

    def score(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or n == 0:
            return pd.DataFrame(
                {"id": pd.Series([], dtype="int64"),
                 "d2": pd.Series([], dtype=object)}
            )
        mat = np.floor(
            np.stack(b[vec_col].to_numpy()).astype(np.float64) * 1e6
        ).astype(np.int64)
        diff = n * mat.astype(object) - S.astype(object)
        d2 = (diff * diff).sum(axis=1)  # python ints, exact
        out = pd.DataFrame(
            {"id": b[id_col].to_numpy(dtype=np.int64),
             "d2": [str(v) for v in d2]}
        )
        out["_key"] = [
            (-int(v), int(i)) for v, i in zip(out["d2"], out["id"])
        ]
        out = out.sort_values("_key").head(k)
        return out[["id", "d2"]]

    cand = ds.map_batches(score, batch_format="pandas").to_pandas()
    if "d2" not in cand.columns:
        return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                             "d2": pd.Series([], dtype=object)})
    cand["_key"] = [(-int(v), int(i)) for v, i in zip(cand["d2"], cand["id"])]
    cand = cand.sort_values("_key").head(k)[["id", "d2"]]
    return cand.reset_index(drop=True)
