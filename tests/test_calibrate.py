"""Isotonic (PAV) calibration: distributed fit == brute-force global
PAV (the unique isotonic projection), tie pooling, transform edges."""

import numpy as np
import pandas as pd
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.calibrate import (
    isotonic_fit,
    isotonic_transform,
)


def brute_pav(xs, ys):
    """Reference: per-distinct-x blocks, merge ANY adjacent violator
    until monotone; returns fitted value per sorted distinct x."""
    df = pd.DataFrame({"x": xs, "y": ys}).groupby("x").agg(
        num=("y", "sum"), den=("y", "size")
    ).reset_index().sort_values("x")
    blocks = [[r.x, r.x, r.num, r.den] for r in df.itertuples(index=False)]
    changed = True
    while changed:
        changed = False
        i = 0
        while i < len(blocks) - 1:
            a, b = blocks[i], blocks[i + 1]
            if a[2] * b[3] > b[2] * a[3]:
                blocks[i] = [a[0], b[1], a[2] + b[2], a[3] + b[3]]
                del blocks[i + 1]
                changed = True
            else:
                i += 1
    fitted = {}
    for lo, hi, n, d in blocks:
        for x in df[(df["x"] >= lo) & (df["x"] <= hi)]["x"]:
            fitted[x] = n / d
    return fitted


def _fitted_from_pools(pools, xs):
    out = {}
    for x in sorted(set(xs)):
        row = pools[(pools["x_lo"] <= x) & (pools["x_hi"] >= x)]
        assert len(row) == 1, (x, pools)
        out[x] = float(row["value"].iloc[0])
    return out


def test_isotonic_matches_bruteforce_random():
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 40, size=3000)
    ys = (rng.rand(3000) < (0.2 + 0.6 * (xs / 40.0) + 0.3 * rng.rand(3000))).astype(
        int
    )
    ds = rd.from_pandas(pd.DataFrame({"x": xs, "y": ys})).repartition(7)
    pools = isotonic_fit(ds, x_col="x", y_col="y")
    got = _fitted_from_pools(pools, xs)
    want = brute_pav(xs, ys)
    assert set(got) == set(want)
    for x in got:
        assert abs(got[x] - want[x]) < 1e-12, x
    # monotone non-decreasing
    v = pools["value"].to_numpy()
    assert (np.diff(v) >= -1e-15).all()


def test_isotonic_anti_monotone_collapses_to_one_pool():
    xs = np.arange(100)
    ys = (xs < 50).astype(int)  # decreasing outcome -> single pool
    ds = rd.from_pandas(pd.DataFrame({"x": xs, "y": ys})).repartition(5)
    pools = isotonic_fit(ds, x_col="x", y_col="y")
    assert len(pools) == 1
    assert pools["value"].iloc[0] == 0.5
    assert pools["num"].iloc[0] == 50 and pools["den"].iloc[0] == 100


def test_isotonic_transform_clamps_and_steps():
    pools = pd.DataFrame(
        {"x_lo": [0, 10], "x_hi": [5, 20], "num": [1, 3], "den": [4, 4]}
    )
    pools["value"] = pools["num"] / pools["den"]
    ds = rd.from_pandas(pd.DataFrame({"x": [-3, 0, 5, 7, 10, 20, 99]}))
    out = (
        isotonic_transform(ds, pools, x_col="x")
        .to_pandas()
        .sort_values("x")["calibrated"]
        .tolist()
    )
    # below domain clamps to first; the gap (7) takes the NEXT pool's
    # value; above domain clamps to last
    assert out == [0.25, 0.25, 0.25, 0.75, 0.75, 0.75, 0.75]


def test_count_min_overestimates_within_bound():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.sketch import (
        cms_counts,
    )

    rng = np.random.RandomState(3)
    keys = rng.zipf(1.5, size=20000).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(6)
    qs = [1, 2, 3, 50, 999999]
    out = cms_counts(ds, "k", qs, width=2048, depth=4).set_index("k")
    truth = pd.Series(keys).value_counts()
    n = len(keys)
    eps = np.e / 2048
    for q in qs:
        t = int(truth.get(q, 0))
        e = int(out.loc[q, "n_approx"])
        assert e >= t, (q, e, t)          # never underestimates
        assert e <= t + 3 * eps * n, (q, e, t)  # generous 3x the 1-δ bound


def test_count_min_merge_equals_single_pass():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.sketch import (
        cms_counts,
    )

    df = pd.DataFrame({"k": ["a", "b", "a", "c", "a", "b"] * 50})
    one = cms_counts(rd.from_pandas(df), "k", ["a", "b", "c"])
    many = cms_counts(rd.from_pandas(df).repartition(7), "k", ["a", "b", "c"])
    assert one.equals(many)  # merge is associative => layout-invariant


def test_pq_topk_recall_and_exact_scores():
    import pyarrow.parquet as pq

    from aws_serverless_elt_pipeline_enterprise_ray.functions.similarity import (
        cosine_topk,
        pq_topk,
    )

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ds = rd.from_arrow(t).repartition(5)
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(ds, qids, k=10)
    approx = pq_topk(ds, qids, k=10, m=8, kc=16, refine=4)
    # recall@10 over the shortlist+rerank path
    rec = np.mean(
        [
            len(
                set(exact[exact.query_id == q]["neighbor_id"])
                & set(approx[approx.query_id == q]["neighbor_id"])
            )
            / 10
            for q in qids
        ]
    )
    assert rec >= 0.8, rec
    # every returned score is the EXACT cosine (re-ranked in-batch)
    E = {(r.query_id, r.neighbor_id): r.cosine for r in exact.itertuples()}
    hits = [
        (r.query_id, r.neighbor_id, r.cosine)
        for r in approx.itertuples()
        if (r.query_id, r.neighbor_id) in E
    ]
    assert hits
    for q, n, c in hits:
        assert abs(c - E[(q, n)]) < 1e-9
    # deterministic for a fixed partitioning
    again = pq_topk(ds, qids, k=10, m=8, kc=16, refine=4)
    assert approx.equals(again)
