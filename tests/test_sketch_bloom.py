"""Bloom-pruned semi join + HyperLogLog sketch: exactness / tolerance
against brute-force on multi-block inputs."""

import numpy as np
import pandas as pd
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.bloom import (
    Bloom,
    bloom_semi_join,
    build_bloom,
)
from aws_serverless_elt_pipeline_enterprise_ray.functions.sketch import (
    hll_distinct,
    hll_estimate,
    hll_merge,
)


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(7)
    keys = pd.Series(rng.choice(10**9, size=20_000, replace=False).astype(np.int64))
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    bloom = build_bloom(ds, "k")
    # every inserted key must hit
    assert bloom.contains(keys).all()
    # false-positive rate on fresh keys ~1% at 10 bits/key
    probe = pd.Series((rng.choice(10**9, size=50_000) + 10**9).astype(np.int64))
    fp = bloom.contains(probe).mean()
    assert fp < 0.03, fp
    # nulls never match
    assert not bloom.contains(pd.Series([None], dtype="Int64")).any()


def test_bloom_semi_join_exact():
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5000, size=30_000).astype(np.int64),
            "v": np.arange(30_000, dtype=np.int64),
        }
    )
    right_keys = np.unique(rng.integers(0, 5000, size=800).astype(np.int64))
    right = pd.DataFrame({"k": right_keys})
    got = (
        bloom_semi_join(
            rd.from_pandas(left).repartition(6),
            rd.from_pandas(right).repartition(3),
            on="k",
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        left[left["k"].isin(set(right_keys))]
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v"]], want)


def test_hll_tolerance_large_cardinality():
    rng = np.random.default_rng(5)
    n_distinct = 200_000
    vals = rng.choice(10**12, size=n_distinct, replace=False).astype(np.int64)
    # duplicate a third of them so the stream has repeats across blocks
    stream = np.concatenate([vals, vals[: n_distinct // 3]])
    rng.shuffle(stream)
    ds = rd.from_pandas(pd.DataFrame({"u": stream})).repartition(8)
    df = hll_distinct(ds, "u", p=14)
    approx = int(df["n_approx"].iloc[0])
    assert abs(approx - n_distinct) / n_distinct < 0.05, approx


def test_hll_grouped_matches_exact_small():
    # small-range regime exercises the linear-counting correction,
    # where HLL is near-exact
    df = pd.DataFrame(
        {
            "g": np.repeat(["x", "y"], 5000),
            "u": np.r_[
                np.arange(5000, dtype=np.int64) % 137,
                np.arange(5000, dtype=np.int64) % 911,
            ],
        }
    )
    out = hll_distinct(rd.from_pandas(df).repartition(5), "u", group_col="g")
    got = dict(zip(out["g"], out["n_approx"]))
    assert abs(got["x"] - 137) <= 3 and abs(got["y"] - 911) <= 12, got


def test_dd_quantiles_relative_error_bound():
    rng = np.random.default_rng(13)
    vals = np.exp(rng.normal(3.0, 2.0, size=100_000))  # heavy-tailed
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    from aws_serverless_elt_pipeline_enterprise_ray.functions.sketch import (
        dd_quantiles,
    )

    out = dd_quantiles(ds, lambda b: b["v"].to_numpy(), alpha=0.01,
                       quantiles=(0.5, 0.9, 0.99))
    for q, col in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99")):
        exact = np.quantile(vals, q)
        approx = float(out[col].iloc[0])
        assert abs(approx - exact) / exact < 0.02, (q, approx, exact)


def test_dd_grouped_and_zero_bucket():
    df = pd.DataFrame(
        {
            "g": ["a"] * 1000 + ["b"] * 1000,
            "v": np.r_[np.zeros(1000), np.full(1000, 50.0)],
        }
    )
    from aws_serverless_elt_pipeline_enterprise_ray.functions.sketch import (
        dd_quantiles,
    )

    out = dd_quantiles(
        rd.from_pandas(df).repartition(4),
        lambda b: b["v"].to_numpy(),
        group_col="g",
        quantiles=(0.5,),
    )
    got = dict(zip(out["g"], out["q50"]))
    assert got["a"] == 0.0
    assert abs(got["b"] - 50.0) / 50.0 < 0.01


def test_inverted_index_matches_bruteforce():
    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in range(30)]
    docs = [
        " ".join(rng.choice(words, size=rng.integers(3, 12)))
        for _ in range(400)
    ]
    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64), "text": docs})
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        inverted_index,
    )

    got = (
        inverted_index(rd.from_pandas(df).repartition(5), min_df=30)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    # brute force
    import re

    post: dict = {}
    for i, t in zip(df["doc_id"], df["text"]):
        for w in set(re.findall(r"[a-z0-9]+", t.lower())):
            post.setdefault(w, []).append(int(i))
    want = pd.DataFrame(
        [
            (w, len(ids), ",".join(str(x) for x in sorted(ids)))
            for w, ids in sorted(post.items())
            if len(ids) >= 30
        ],
        columns=["term", "df", "postings"],
    )
    pd.testing.assert_frame_equal(
        got[["term", "df", "postings"]], want, check_dtype=False
    )


def test_window_dedup_matches_bruteforce():
    rng = np.random.default_rng(23)
    words = [f"t{i}" for i in range(40)]
    shared = " ".join(rng.choice(words, size=12))  # >= w-token cross-doc run
    docs = []
    for i in range(120):
        body = " ".join(rng.choice(words, size=int(rng.integers(5, 25))))
        docs.append(body + (" " + shared if i % 3 == 0 else "") + f" end{i}")
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": docs})
    from aws_serverless_elt_pipeline_enterprise_ray.functions.dedup import (
        window_dedup,
    )

    W = 8
    got = (
        window_dedup(rd.from_pandas(df).repartition(5), w=W)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # brute force: first (doc, pos) per window string wins; other
    # occurrences' token ranges are cut
    first: dict = {}
    toks = {int(i): t.split() for i, t in zip(df["doc_id"], df["text"])}
    for i in sorted(toks):
        for p in range(len(toks[i]) - W + 1):
            first.setdefault(" ".join(toks[i][p : p + W]), (i, p))
    want = []
    for i in sorted(toks):
        covered = set()
        for p in range(len(toks[i]) - W + 1):
            if first[" ".join(toks[i][p : p + W])] != (i, p):
                covered.update(range(p, p + W))
        want.append(
            " ".join(t for p, t in enumerate(toks[i]) if p not in covered)
        )
    assert list(got["text_dedup"]) == want
    # the shared run survives only in its first host doc
    n_with_shared = sum(shared in t for t in got["text_dedup"])
    assert n_with_shared == 1


def test_hll_merge_equals_union():
    a = pd.Series(np.arange(0, 60_000, dtype=np.int64))
    b = pd.Series(np.arange(40_000, 100_000, dtype=np.int64))
    from aws_serverless_elt_pipeline_enterprise_ray.functions.sketch import _registers

    ra, rb = _registers(a, 14), _registers(b, 14)
    est = hll_estimate(hll_merge([ra, rb]))
    assert abs(est - 100_000) / 100_000 < 0.05, est


def test_hll_distinct_by_group_accuracy_and_determinism():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.sketch import (
        hll_distinct_by_group,
    )

    rng = np.random.default_rng(97)
    frames = []
    truth = {"a": 50, "b": 1000, "c": 5000}
    for g, card in truth.items():
        vals = rng.choice(card * 10, card, replace=False)
        # repeat values so dedup matters
        rep = np.concatenate([vals, rng.choice(vals, 2000)])
        frames.append(pd.DataFrame({"g": g, "v": rep.astype(np.int64)}))
    df = pd.concat(frames, ignore_index=True)
    got = hll_distinct_by_group(
        rd.from_pandas(df).repartition(6), group_col="g", value_col="v"
    ).set_index("g")["n_distinct_est"]
    for g, card in truth.items():
        assert abs(got[g] - card) / card < 0.15, (g, got[g], card)
    # max-merge is order-free: different layout, identical estimates
    again = hll_distinct_by_group(
        rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(11),
        group_col="g", value_col="v",
    ).set_index("g")["n_distinct_est"]
    assert got.to_dict() == again.to_dict()
