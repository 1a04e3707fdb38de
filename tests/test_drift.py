"""Drift monitors: PSI/JS categorical drift, exact two-sample KS,
exact Mann-Whitney U — brute-force cross-checks on planted inputs."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.drift import (
    categorical_drift,
    ks_drift,
    mannwhitney_drift,
    ts_midpoint_us,
)


def _events(types, values, ts_us):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "event_type": types,
                "value": values,
                "ts": pd.to_datetime(np.asarray(ts_us, dtype="int64"), unit="us"),
            }
        )
    )


def _cents(b: pd.DataFrame) -> pd.Series:
    return pd.Series(
        np.floor(b["value"].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
    )


def test_ts_midpoint_integer_rule():
    ds = _events(["a", "b"], [1.0, 2.0], [100, 301])
    tmin, tmax, mid = ts_midpoint_us(ds)
    assert (tmin, tmax, mid) == (100, 301, 100 + (301 - 100) // 2)


def test_categorical_drift_identical_halves_near_zero():
    # same mix in both halves -> every smoothed term is ~0 (floor can
    # land at -1 for a tiny negative); planted counts come back exact
    types = ["a"] * 6 + ["b"] * 2 + ["a"] * 6 + ["b"] * 2
    ts = list(range(8)) + list(range(1000, 1008))
    ds = _events(types, [0.0] * 16, ts)
    out = categorical_drift(ds, col="event_type")
    assert list(out["event_type"]) == ["a", "b"]
    assert list(out["n_a"]) == [6, 2] and list(out["n_b"]) == [6, 2]
    assert (out["psi_nano"].abs() <= 1).all()
    assert (out["js_nano"].abs() <= 1).all()


def test_categorical_drift_matches_bruteforce():
    rng = np.random.RandomState(7)
    n = 400
    ts = np.arange(n, dtype=np.int64)
    # baseline skews 'a', current skews 'c'; 'd' appears only late
    types = [
        rng.choice(["a", "b", "c"], p=[0.6, 0.3, 0.1])
        if t < n // 2
        else rng.choice(["a", "b", "c", "d"], p=[0.2, 0.3, 0.4, 0.1])
        for t in ts
    ]
    ds = _events(types, [0.0] * n, ts)
    out = categorical_drift(ds, col="event_type")

    df = pd.DataFrame({"event_type": types, "side": (ts >= ts[0] + (ts[-1] - ts[0]) // 2)})
    k = df["event_type"].nunique()
    ta = (~df["side"]).sum() + k
    tb = df["side"].sum() + k
    for _, row in out.iterrows():
        na = ((df["event_type"] == row["event_type"]) & ~df["side"]).sum()
        nb = ((df["event_type"] == row["event_type"]) & df["side"]).sum()
        assert (row["n_a"], row["n_b"]) == (na, nb)
        p, q = (na + 1) / ta, (nb + 1) / tb
        assert row["psi_nano"] == math.floor((p - q) * math.log(p / q) * 1e9)
        m = (p + q) / 2
        js = 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        assert row["js_nano"] == math.floor(js * 1e9)


def _brute_ks(av, bv):
    vals = sorted(set(av) | set(bv))
    na, nb = len(av), len(bv)
    best, at = -1, None
    for v in vals:
        d = abs(sum(x <= v for x in av) * nb - sum(x <= v for x in bv) * na)
        if d > best:
            best, at = d, v
    return at, best, na, nb


def test_ks_drift_matches_bruteforce():
    rng = np.random.RandomState(11)
    n = 300
    ts = np.arange(n, dtype=np.int64)
    # baseline N(5, 1), current N(7, 1) in dollars -> clear drift
    vals = np.where(
        ts < ts[0] + (ts[-1] - ts[0]) // 2,
        rng.normal(5, 1, n),
        rng.normal(7, 1, n),
    ).round(2)
    ds = _events(["x"] * n, vals, ts)
    out = ks_drift(ds, value_fn=_cents, value_col="v", cols=["value", "ts"])

    mid = ts[0] + (ts[-1] - ts[0]) // 2
    cents = np.floor(vals * 100).astype(np.int64)
    av = [int(c) for c, t in zip(cents, ts) if t < mid]
    bv = [int(c) for c, t in zip(cents, ts) if t >= mid]
    at, best, na, nb = _brute_ks(av, bv)
    row = out.iloc[0]
    assert (row["at_value"], row["d_num"]) == (at, best)
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["d_ppm"] == best * 1_000_000 // (na * nb)


def test_embedding_drift_matches_bruteforce():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.drift import (
        embedding_drift,
    )

    rng = np.random.RandomState(3)
    n, d = 120, 8
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    ds = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)}
        )
    )
    out = embedding_drift(ds, id_col="vec_id", vec_col="embedding")

    q = np.floor(vecs.astype(np.float64) * 1e6).astype(object)
    sa = q[::2].sum(axis=0)
    sb = q[1::2].sum(axis=0)
    dot = int(sum(int(a) * int(b) for a, b in zip(sa, sb)))
    qa = int(sum(int(a) * int(a) for a in sa))
    qb = int(sum(int(b) * int(b) for b in sb))
    cos = float(dot) / (math.sqrt(float(qa)) * math.sqrt(float(qb)))
    scale = math.sqrt(float(qb)) * (n / 2) / (math.sqrt(float(qa)) * (n / 2))
    row = out.iloc[0]
    assert (row["n_a"], row["n_b"]) == (60, 60)
    assert row["cos_nano"] == math.floor(cos * 1e9)
    assert row["scale_nano"] == math.floor(scale * 1e9)


def test_embedding_drift_detects_planted_shift():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.drift import (
        embedding_drift,
    )

    rng = np.random.RandomState(5)
    n, d = 200, 4
    base = rng.normal(0, 1, (n, d))
    # even ids centered at +mu, odd ids at -mu -> strong direction drift
    mu = np.array([3.0, 0, 0, 0])
    vecs = np.where(
        (np.arange(n) % 2 == 0)[:, None], base + mu, base - mu
    ).astype(np.float32)
    ds = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)}
        )
    )
    out = embedding_drift(ds, id_col="vec_id", vec_col="embedding")
    assert out.iloc[0]["cos_nano"] < 0  # opposite centroids


def test_mwu_drift_matches_bruteforce():
    rng = np.random.RandomState(13)
    n = 200
    ts = np.arange(n, dtype=np.int64)
    vals = np.where(
        ts < ts[0] + (ts[-1] - ts[0]) // 2,
        rng.randint(0, 20, n),
        rng.randint(10, 30, n),
    ).astype(np.float64) / 100.0
    ds = _events(["x"] * n, vals, ts)
    out = mannwhitney_drift(
        ds, value_fn=_cents, value_col="v", cols=["value", "ts"]
    )

    mid = ts[0] + (ts[-1] - ts[0]) // 2
    cents = np.floor(vals * 100 + 1e-9).astype(np.int64)
    av = [int(c) for c, t in zip(cents, ts) if t < mid]
    bv = [int(c) for c, t in zip(cents, ts) if t >= mid]
    # brute-force doubled U: 2 per (a > b) pair, 1 per tie
    u2 = sum(2 for a in av for b in bv if a > b) + sum(
        1 for a in av for b in bv if a == b
    )
    row = out.iloc[0]
    assert row["u2_a"] == u2
    assert (row["n_a"], row["n_b"]) == (len(av), len(bv))
    assert row["auc_ppm"] == u2 * 1_000_000 // (2 * len(av) * len(bv))
