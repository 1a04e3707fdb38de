"""Unit tests for the distributed aggregate operators
(functions/aggregates.py + text.term_frequencies): semantics checked
against brute-force in-memory computation on multi-block inputs (the
oracle-parity sweep at sf scale lives in tools/check_queries.py)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
    distinct_count,
    grouped_quantiles,
    hopping_window,
    topk_per_group,
)
from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
    term_frequencies,
)


def _events_df(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "c"], size=n),
            "user_id": rng.integers(0, 200, size=n).astype(np.int64),
            "value": rng.normal(50, 20, size=n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 86400 * 3, size=n), unit="s"),
        }
    )


def _ds(df, blocks=7):
    # multiple blocks so local partials + the shuffle both do real work
    return rd.from_pandas(df).repartition(blocks)


def test_distinct_count_exact():
    df = _events_df()
    got = distinct_count(_ds(df), "event_type", "user_id", num_buckets=8)
    want = (
        df.groupby("event_type")["user_id"].nunique().sort_index().rename("n_distinct")
    )
    assert list(got["event_type"]) == list(want.index)
    assert list(got["n_distinct"]) == list(want.values)


def test_hopping_window_each_event_in_two_windows():
    df = _events_df(n=2000)
    out = (
        hopping_window(_ds(df[["ts", "value"]]), size_s=3600, hop_s=1800)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # brute force: event with hop-floor w0 belongs to windows w0, w0-1800
    cents = np.floor(df["value"].to_numpy() * 100).astype(np.int64)
    w0 = (df["ts"].astype("int64").to_numpy() // (1800 * 10**9)) * 1800
    rows = pd.DataFrame(
        {
            "window_start": pd.to_datetime(
                np.concatenate([w0, w0 - 1800]), unit="s"
            ),
            "cents": np.tile(cents, 2),
        }
    )
    want = (
        rows.groupby("window_start")
        .agg(n_events=("cents", "size"), value_cents=("cents", "sum"))
        .reset_index()
    )
    assert int(out["n_events"].sum()) == 2 * len(df)
    merged = out.merge(want, on="window_start", suffixes=("", "_w"))
    assert len(merged) == len(want) == len(out)
    assert (merged["n_events"] == merged["n_events_w"]).all()
    assert (merged["value_cents"] == merged["value_cents_w"]).all()


def test_topk_per_group_with_cross_block_ties():
    df = pd.DataFrame(
        {
            "event_id": np.arange(12, dtype=np.int64),
            "event_type": ["a"] * 6 + ["b"] * 6,
            # group a: a three-way tie at the top -> tiebreak by event_id
            "value": [9.0, 9.0, 9.0, 1.0, 2.0, 3.0, 5.0, 6.0, 7.0, 8.0, 8.0, 0.0],
        }
    )
    got = topk_per_group(
        _ds(df, blocks=4),
        group_col="event_type",
        order_col="value",
        tiebreak_col="event_id",
        k=3,
    )
    a = got[got["event_type"] == "a"]
    assert list(a["rank"]) == [1, 2, 3]
    assert list(a["event_id"]) == [0, 1, 2]  # tie broken by id
    b = got[got["event_type"] == "b"]
    assert list(b["event_id"]) == [9, 10, 8]  # 8.0(id9), 8.0(id10), 7.0(id8)


def test_grouped_quantiles_nearest_rank():
    df = _events_df(n=3000)
    cents_np = np.floor(df["value"].to_numpy() * 100).astype(np.int64)
    df = df.assign(cents=cents_np)

    def cents(b: pa.Table):
        import pyarrow.compute as pc

        return pc.cast(
            pc.floor(pc.multiply(b["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)

    got = grouped_quantiles(
        _ds(df[["event_type", "value"]]),
        group_col="event_type",
        cents_expr=cents,
        quantiles=(0.5, 0.9, 0.99),
        col_names=("p50_cents", "p90_cents", "p99_cents"),
    )
    for _, row in got.iterrows():
        vals = np.sort(df.loc[df["event_type"] == row["event_type"], "cents"].to_numpy())
        n = len(vals)
        for q, col in ((0.5, "p50_cents"), (0.9, "p90_cents"), (0.99, "p99_cents")):
            # nearest-rank: 1-based rank ceil(q*n)
            assert row[col] == vals[math.ceil(q * n) - 1], (row["event_type"], col)


def test_term_frequencies_matches_counter():
    from collections import Counter

    texts = [
        "The quick brown fox", "the lazy dog 42", "Fox and DOG and fox",
        "", "punct!!! only???", "a a a b b c",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = term_frequencies(_ds(df, blocks=3), top_n=None)
    want = Counter()
    for t in texts:
        import re

        want.update(re.findall(r"[a-z0-9]+", t.lower()))
    assert dict(zip(got["term"], got["n"])) == dict(want)


def test_hash_join_property_random_frames():
    """Randomized parity with pandas merge across skewed keys, empty
    buckets, unmatched rows and duplicate keys on both sides."""
    import os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import hash_join

    @settings(
        max_examples=int(os.environ.get("HYP_EXAMPLES", "6")),
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        seed=st.integers(0, 10_000),
        nl=st.integers(0, 300),
        nr=st.integers(0, 300),
        key_space=st.integers(1, 40),
        how=st.sampled_from(["inner", "left"]),
    )
    def run(seed, nl, nr, key_space, how):
        rng = np.random.default_rng(seed)
        left = pd.DataFrame(
            {
                "k": rng.integers(0, key_space, size=nl).astype(np.int64),
                "lv": rng.integers(0, 1000, size=nl).astype(np.int64),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, key_space, size=nr).astype(np.int64),
                "rv": rng.integers(0, 1000, size=nr).astype(np.int64),
            }
        )
        if len(left) == 0:
            return  # from_pandas of an empty frame has no schema to join on
        got = hash_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            on="k",
            how=how,
            num_buckets=5,
        ).to_pandas()
        want = left.merge(right, on="k", how=how)
        key = ["k", "lv", "rv"]
        if len(got) == 0:
            # Ray's to_pandas drops column labels on an all-empty
            # dataset; compare as the empty row set
            got = pd.DataFrame(columns=key)
        for c in key:
            # schema-less empty right: left/anti results carry left
            # columns only (documented hash_join semantics)
            if c not in got.columns:
                got[c] = -1
        got_s = sorted(map(tuple, got[key].fillna(-1).astype("int64").to_numpy()))
        want_s = sorted(map(tuple, want[key].fillna(-1).astype("int64").to_numpy()))
        assert got_s == want_s

    run()


def test_pack_sequences_invariants_and_reference():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        pack_sequences,
    )

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "n_tokens": rng.integers(1, 300, size=400).astype(np.int64),
        }
    )
    # one oversized doc must still get its own bin
    df.loc[7, "n_tokens"] = 999
    out = (
        pack_sequences(
            _ds(df, blocks=5),
            token_col="n_tokens",
            id_col="doc_id",
            max_tokens=256,
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(df)
    # greedy reference per bucket
    for bkt, g in out.groupby("pack_bucket"):
        g = g.sort_values("doc_id")
        cur_bin, cur_sum = 0, 0
        for _, r in g.iterrows():
            t = int(r["n_tokens"])
            if cur_sum > 0 and cur_sum + t > 256:
                cur_bin, cur_sum = cur_bin + 1, 0
            assert r["bin_id"] == cur_bin, (bkt, r["doc_id"])
            cur_sum += t
    # bins respect the cap except single-doc oversize bins
    sums = out.groupby(["pack_bucket", "bin_id"]).agg(
        tok=("n_tokens", "sum"), n=("n_tokens", "size")
    )
    bad = sums[(sums["tok"] > 256) & (sums["n"] > 1)]
    assert len(bad) == 0
    assert (out.loc[out["doc_id"] == 7, "bin_tokens"] == 999).all()


def test_mix_corpora_fractions_and_nesting():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.mixing import (
        mix_corpora,
    )

    n = 20000
    df = pd.DataFrame(
        {"sid": np.arange(n, dtype=np.int64), "text": ["x"] * n}
    )
    ds = rd.from_pandas(df).repartition(4)
    half = mix_corpora({"a": (ds, 0.5)}, id_col="sid").to_pandas()
    tenth = mix_corpora({"a": (ds, 0.1)}, id_col="sid").to_pandas()
    assert abs(len(half) / n - 0.5) < 0.02
    assert abs(len(tenth) / n - 0.1) < 0.01
    # nested: the 10% sample is a subset of the 50% sample
    assert set(tenth["sid"]) <= set(half["sid"])
    both = mix_corpora(
        {"a": (ds, 0.2), "b": (ds, 0.3)}, id_col="sid"
    ).to_pandas()
    assert set(both["source"]) == {"a", "b"}


def test_distinct_count_null_semantics_match_sql():
    """NULL values excluded from the count; NULL groups kept - exactly
    COUNT(DISTINCT v) GROUP BY g semantics."""
    import duckdb

    df = pd.DataFrame(
        {
            "g": ["a", "a", None, "b", "b", None, "a"],
            "v": pd.array([1, None, 2, None, 2, None, 1], dtype="Int64"),
        }
    )
    got = distinct_count(_ds(df, blocks=3), "g", "v", num_buckets=4)
    want = duckdb.sql(
        "SELECT g, count(DISTINCT v) AS n_distinct FROM df GROUP BY g ORDER BY g"
    ).df()
    got_map = {
        (None if pd.isna(r["g"]) else r["g"]): int(r["n_distinct"])
        for _, r in got.iterrows()
    }
    want_map = {
        (None if pd.isna(r["g"]) else r["g"]): int(r["n_distinct"])
        for _, r in want.iterrows()
    }
    assert got_map == want_map


def test_conversation_examples_context_windows():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        conversation_examples,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4 + ["c2"] * 2,
            "turn_idx": [0, 1, 2, 3, 0, 1],
            "role": ["user", "assistant", "user", "assistant", "user", "assistant"],
            "text": ["hi", "hello", "how?", "fine", "yo", "hey"],
        }
    )
    out = (
        conversation_examples(_ds(df, blocks=3), context_turns=3, num_buckets=4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # first turns have no history -> skipped
    assert len(out) == 4
    r = out[(out.conv_id == "c1") & (out.turn_idx == 3)].iloc[0]
    assert r["context"] == "user: hi\nassistant: hello\nuser: how?"
    assert r["target"] == "fine"
    r1 = out[(out.conv_id == "c1") & (out.turn_idx == 1)].iloc[0]
    assert r1["context"] == "user: hi"  # single-turn history, no leading \n
    r2 = out[(out.conv_id == "c2") & (out.turn_idx == 1)].iloc[0]
    assert r2["context"] == "user: yo"  # never leaks across conversations


def test_assign_split_stable_and_leakage_free():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        assign_split,
    )

    n = 5000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64)})
    # the same keys repeated across two datasets get the same split
    a = assign_split(
        _ds(df, blocks=4), key_col="k",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    ).to_pandas()
    b = assign_split(
        _ds(df.sample(frac=1.0, random_state=1), blocks=2), key_col="k",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    ).to_pandas()
    ma = dict(zip(a["k"], a["split"]))
    mb = dict(zip(b["k"], b["split"]))
    assert ma == mb
    frac_train = (a["split"] == "train").mean()
    assert abs(frac_train - 0.8) < 0.02
    assert set(a["split"]) == {"train", "val", "test"}


def test_grouped_quantiles_many_groups_vectorized_walk():
    """2000 groups through the bucketed walk - exercises the
    multi-group-per-bucket vectorized CDF path."""
    rng = np.random.default_rng(21)
    n = 30000
    df = pd.DataFrame(
        {
            "event_type": [f"g{int(i):04d}" for i in rng.integers(0, 2000, size=n)],
            "value": rng.normal(100, 30, size=n),
        }
    )

    def cents(b: pa.Table):
        import pyarrow.compute as pc

        return pc.cast(
            pc.floor(pc.multiply(b["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)

    got = grouped_quantiles(
        _ds(df, blocks=6), group_col="event_type", cents_expr=cents,
        quantiles=(0.5, 0.99), col_names=("p50_cents", "p99_cents"),
    )
    assert len(got) == df["event_type"].nunique()
    df = df.assign(cents=np.floor(df["value"].to_numpy() * 100).astype(np.int64))
    sample = got.sample(n=40, random_state=7)
    for _, row in sample.iterrows():
        vals = np.sort(df.loc[df["event_type"] == row["event_type"], "cents"].to_numpy())
        nn = len(vals)
        assert row["p50_cents"] == vals[math.ceil(0.5 * nn) - 1]
        assert row["p99_cents"] == vals[math.ceil(0.99 * nn) - 1]


def test_tfidf_topk_prefers_rare_terms():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        tfidf_topk_terms,
    )

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "common common zebra",      # zebra is unique to doc 1
                "common words here",
                "common words there",
                "common words everywhere",
            ],
        }
    )
    out = tfidf_topk_terms(_ds(df, blocks=2), k=2)
    d1 = out[out["doc_id"] == 1]
    # zebra: tf=1 df=1 -> 1e6; common: tf=2 df=4 -> 5e5
    assert list(d1["term"]) == ["zebra", "common"]
    assert list(d1["score"]) == [1_000_000, 500_000]
    assert list(d1["rank"]) == [1, 2]


def test_grouped_quantiles_zero_quantile_is_group_min():
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 5 + ["b"] * 5,
            "value": [5.0, 1.0, 3.0, 4.0, 2.0, 50.0, 10.0, 30.0, 40.0, 20.0],
        }
    )

    def cents(b: pa.Table):
        import pyarrow.compute as pc

        return pc.cast(
            pc.floor(pc.multiply(b["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)

    got = grouped_quantiles(
        _ds(df, blocks=2), group_col="event_type", cents_expr=cents,
        quantiles=(0.0, 1.0), col_names=("p0", "p100"),
    )
    m = {r["event_type"]: (r["p0"], r["p100"]) for _, r in got.iterrows()}
    assert m["a"] == (100, 500)
    assert m["b"] == (1000, 5000)


def test_conversation_examples_null_text_matches_sql_lag_semantics():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        conversation_examples,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": [0, 1, 2, 3],
            "role": ["user", "assistant", "user", "assistant"],
            "text": ["hi", None, "ok", "done"],
        }
    )
    out = (
        conversation_examples(_ds(df, blocks=1), context_turns=3, num_buckets=2)
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    # turn 1: history exists (turn 0); target is the NULL text, not 'nan'
    r1 = out[out.turn_idx == 1].iloc[0]
    assert r1["context"] == "user: hi" and pd.isna(r1["target"])
    # turn 2: immediate prev line is NULL -> SQL lag(line,1) IS NULL -> skipped
    assert 2 not in set(out["turn_idx"])
    # turn 3: null mid-history line skipped with NO double separator
    r3 = out[out.turn_idx == 3].iloc[0]
    assert r3["context"] == "user: hi\nuser: ok"


def test_heavy_hitters_exact_and_complete():
    """Sketch-merge + recount equals the exact groupby answer on a
    skewed stream split across many blocks (survival guarantee), and
    reports exact counts."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        heavy_hitters,
    )

    rng = np.random.default_rng(8)
    # heavy tail: values 0..4 heavy, 5..5000 noise
    heavy = rng.integers(0, 5, 3_000)
    noise = rng.integers(5, 5_000, 17_000)
    vals = np.concatenate([heavy, noise])
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals.astype(np.int64)})
    ds = rd.from_pandas(df).repartition(16)

    out = heavy_hitters(ds, "v", den=50)  # > 2% of 20k = > 400
    vc = df["v"].value_counts()
    want = vc[vc * 50 > len(df)]
    assert dict(zip(out["v"], out["n"])) == want.to_dict()
    assert set(out["v"]) == set(range(5))


def test_shuffle_shards_deterministic_and_partitioned():
    """Same input + seed => identical shards; different seed permutes;
    every row lands in exactly one shard with dense 0-based positions."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.mixing import (
        shuffle_shards,
    )

    ds = rd.from_items([{"id": i} for i in range(500)])
    a = shuffle_shards(ds, id_col="id", num_shards=4, seed=1).to_pandas()
    b = shuffle_shards(ds, id_col="id", num_shards=4, seed=1).to_pandas()
    key = lambda df: df.sort_values(["shard", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a)[["shard", "pos", "id"]],
                                  key(b)[["shard", "pos", "id"]])
    assert sorted(a["id"]) == list(range(500))           # a permutation
    for _, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))   # dense positions
    c = shuffle_shards(ds, id_col="id", num_shards=4, seed=2).to_pandas()
    assert not key(a)[["id"]].equals(key(c)[["id"]])     # seed changes order


def test_pivot_counts_rectangular_and_exact():
    """Pivot equals a pandas crosstab, emits the full column domain in
    every row bucket (rectangular blocks), zero-fills absent cells."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        pivot_counts,
    )

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 40, 600),
            "t": rng.choice(["a", "b", "c"], 600, p=[0.6, 0.3, 0.1]),
        }
    )
    # guarantee at least one absent (u, t) cell
    df = df[~((df["u"] == 0) & (df["t"] == "c"))]
    got = (
        pivot_counts(rd.from_pandas(df), row_col="u", col_col="t")
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    want = (
        pd.crosstab(df["u"], df["t"])
        .reindex(columns=["a", "b", "c"], fill_value=0)
        .astype("int64")
        .reset_index()
        .rename(columns={"a": "n_a", "b": "n_b", "c": "n_c"})
        .sort_values("u")
        .reset_index(drop=True)
    )
    want.columns.name = None
    got["u"] = got["u"].astype(want["u"].dtype)
    pd.testing.assert_frame_equal(got[["u", "n_a", "n_b", "n_c"]], want)


def test_temperature_mixing_fractions_and_mixture():
    """alpha=0 equalizes sources, alpha=1 keeps proportions; the
    no-target mixture saturates exactly one source; the sampled
    mixture honors the derived fractions via the nested hash sample."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.mixing import (
        mix_corpora_temperature,
        temperature_fractions,
    )

    sizes = {"big": 9000, "mid": 900, "small": 90}
    # alpha=0: uniform shares -> the smallest source is fully used and
    # every source contributes the same row count
    f0 = temperature_fractions(sizes, alpha=0.0)
    rows0 = {s: sizes[s] * f0[s] for s in sizes}
    assert abs(rows0["big"] - rows0["small"]) < 1e-6
    assert f0["small"] == 1.0
    # alpha=1: proportional -> every fraction is 1 (no down-sampling)
    f1 = temperature_fractions(sizes, alpha=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in f1.values())
    # alpha=0.5 up-weights small sources relative to proportional
    fh = temperature_fractions(sizes, alpha=0.5)
    assert fh["small"] == 1.0 and fh["big"] < 1.0
    # explicit target scales everything down proportionally
    ft = temperature_fractions(sizes, alpha=0.5, target_rows=500)
    assert all(0 < v < 1 for v in ft.values())

    srcs = {
        name: rd.from_items([{"id": i + off, "src": name} for i in range(n)])
        for (name, n), off in zip(sizes.items(), (0, 100000, 200000))
    }
    mixture, fracs = mix_corpora_temperature(srcs, id_col="id", alpha=0.0)
    got = mixture.to_pandas()["source"].value_counts()
    for name in sizes:
        want = sizes[name] * fracs[name]
        assert abs(got.get(name, 0) - want) <= max(60, 0.15 * want)


def test_filter_by_quantile_nearest_rank_exact():
    """Thresholds match DuckDB quantile_disc (nearest-rank) on a
    skewed multiset spread over several blocks, and the band filter
    keeps exactly the rows inside [lo, hi]."""
    import duckdb
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        filter_by_quantile,
        quantile_thresholds,
    )

    rng = np.random.default_rng(17)
    vals = np.concatenate(
        [rng.integers(0, 20, 500), rng.integers(100, 2000, 300), [7] * 200]
    ).astype("int64")
    df = pd.DataFrame({"i": np.arange(len(vals), dtype="int64"), "v": vals})
    ds = rd.from_pandas(df).repartition(7)

    th = quantile_thresholds(ds, col="v", quantiles=(0.1, 0.5, 0.9))
    con = duckdb.connect()
    con.register("t", df)
    for q in (0.1, 0.5, 0.9):
        want = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert th[q] == want, (q, th[q], want)

    kept = filter_by_quantile(ds, col="v", q_lo=0.1, q_hi=0.9).to_pandas()
    assert kept["v"].min() >= th[0.1] and kept["v"].max() <= th[0.9]
    want_n = con.execute(
        "SELECT count(*) FROM t WHERE v BETWEEN "
        f"{th[0.1]} AND {th[0.9]}"
    ).fetchone()[0]
    assert len(kept) == want_n


def test_sample_per_group_exact_n_deterministic():
    """Exact-n per stratum: every group with >= n members yields
    exactly n rows, smaller groups yield all their rows; same seed
    reproduces the draw across block layouts, different seeds differ;
    result equals the single-process hash-rank reference."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.mixing import (
        knuth_hash32,
        sample_per_group,
    )

    rng = np.random.default_rng(29)
    df = pd.DataFrame(
        {
            "id": np.arange(500),
            "g": rng.choice(["a", "b", "c", "tiny"], 500, p=[0.4, 0.4, 0.19, 0.01]),
        }
    )
    ds = rd.from_pandas(df).repartition(5)
    out = sample_per_group(ds, group_col="g", n=4, id_col="id", seed=0)

    sizes = df.groupby("g").size()
    got_sizes = out.groupby("g").size()
    for g, sz in sizes.items():
        assert got_sizes.get(g, 0) == min(4, sz), g

    # reference: rank by (knuth_hash(id), id) within group
    ref = df.copy()
    ref["h"] = knuth_hash32(ref["id"].to_numpy().astype(np.uint64)).astype(
        np.int64
    )
    ref = ref.sort_values(["g", "h", "id"])
    ref = ref.groupby("g", sort=False).head(4)
    want = set(map(tuple, ref[["g", "id"]].itertuples(index=False)))
    got = set(map(tuple, out[["g", "id"]].itertuples(index=False)))
    assert got == want

    # layout-invariant and seed-sensitive
    out2 = sample_per_group(
        rd.from_pandas(df).repartition(11), group_col="g", n=4, id_col="id", seed=0
    )
    assert set(map(tuple, out2[["g", "id"]].itertuples(index=False))) == got
    out3 = sample_per_group(ds, group_col="g", n=4, id_col="id", seed=99)
    assert set(map(tuple, out3[["g", "id"]].itertuples(index=False))) != got


def test_grouping_sets_cube_and_rollup_match_pandas():
    """One-pass CUBE equals the four separately-computed levels, and an
    explicit ROLLUP subset only emits its own sets; partials combine
    across blocks (11 partitions) to exact totals."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        grouping_sets,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 400),
            "b": rng.choice(["p", "q"], 400),
            "v": rng.integers(0, 100, 400),
        }
    )
    ds = rd.from_pandas(df).repartition(11)

    got = (
        grouping_sets(ds, keys=["a", "b"], sum_cols=["v"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )

    def level(keys):
        if keys:
            g = df.groupby(keys).agg(n=("v", "size"), sum_v=("v", "sum")).reset_index()
        else:
            g = pd.DataFrame({"n": [len(df)], "sum_v": [df["v"].sum()]})
        for k in ("a", "b"):
            if k not in keys:
                g[k] = "ALL"
        return g[["a", "b", "n", "sum_v"]]

    want = (
        pd.concat([level([]), level(["a"]), level(["b"]), level(["a", "b"])])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()
    assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()
    assert got["sum_v"].astype(int).tolist() == want["sum_v"].astype(int).tolist()

    # ROLLUP(a, b) = {(), (a), (a,b)} — no b-only level
    roll = grouping_sets(
        ds, keys=["a", "b"], sets=[(), (0,), (0, 1)], sum_cols=["v"]
    ).to_pandas()
    assert len(roll) == 1 + 3 + 6
    assert not ((roll["a"] == "ALL") & (roll["b"] != "ALL")).any()


def test_lag_lead_matches_pandas_groupby_shift():
    """Bucketed LAG/LEAD equals pandas per-key shift under a total
    order, with nulls exactly at partition edges."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        lag_lead,
    )

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "id": np.arange(500),
            "k": rng.integers(0, 23, 500),
            "t": rng.integers(0, 40, 500),
            "v": rng.integers(-50, 50, 500),
        }
    )
    got = (
        lag_lead(
            rd.from_pandas(df).repartition(7),
            key="k",
            order_cols=["t", "id"],
            cols=["v"],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )

    want = df.sort_values(["k", "t", "id"]).copy()
    g = want.groupby("k", sort=False)["v"]
    want["lag_v"] = g.shift(1)
    want["lead_v"] = g.shift(-1)
    want = want.sort_values("id").reset_index(drop=True)

    for c in ("lag_v", "lead_v"):
        a, b = got[c], want[c]
        assert (a.isna() == b.isna()).all()
        assert (a.dropna().to_numpy() == b.dropna().to_numpy()).all()


def test_unpivot_roundtrips_pivot():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        pivot_counts,
        unpivot,
    )

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"u": rng.integers(0, 12, 300), "t": rng.choice(["a", "b", "c"], 300)}
    )
    wide = pivot_counts(rd.from_pandas(df).repartition(5), row_col="u", col_col="t")
    long = (
        unpivot(
            wide,
            id_cols=["u"],
            value_cols=["n_a", "n_b", "n_c"],
            var_name="t",
            value_name="n",
        )
        .to_pandas()
        .sort_values(["u", "t"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["u", "t"]).size().rename("n")
        .reindex(
            pd.MultiIndex.from_product(
                [sorted(df["u"].unique()), ["n_a", "n_b", "n_c"]], names=["u", "t"]
            ).map(lambda x: (x[0], x[1][2:])),
            fill_value=0,
        )
        .reset_index()
        .sort_values(["u", "t"])
        .reset_index(drop=True)
    )
    assert long["u"].astype(int).tolist() == want["u"].astype(int).tolist()
    assert long["t"].str.removeprefix("n_").tolist() == want["t"].tolist()
    assert long["n"].astype(int).tolist() == want["n"].astype(int).tolist()


def test_set_intersect_except_match_python_sets():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import (
        set_except,
        set_intersect,
    )

    rng = np.random.default_rng(5)
    la = pd.DataFrame(
        {"k": rng.integers(0, 40, 300), "t": rng.choice(["a", "b"], 300)}
    )
    rb = pd.DataFrame(
        {"k": rng.integers(20, 60, 300), "t": rng.choice(["a", "b"], 300)}
    )
    L = rd.from_pandas(la).repartition(5)
    R = rd.from_pandas(rb).repartition(3)

    lset = set(map(tuple, la.itertuples(index=False)))
    rset = set(map(tuple, rb.itertuples(index=False)))

    inter = set_intersect(L, R, on=["k", "t"]).to_pandas()
    assert set(map(tuple, inter.itertuples(index=False))) == (lset & rset)
    assert not inter.duplicated().any()

    exc = set_except(L, R, on=["k", "t"]).to_pandas()
    assert set(map(tuple, exc.itertuples(index=False))) == (lset - rset)
    assert not exc.duplicated().any()


def test_grouped_moments_exact_and_pearson_matches_numpy():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        grouped_moments,
        pearson_from_moments,
    )

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 1000),
            "x": rng.integers(-1000, 1000, 1000),
            "y": rng.integers(0, 24, 1000),
        }
    )
    m = grouped_moments(
        rd.from_pandas(df).repartition(9), group_col="g", x_col="x", y_col="y"
    ).sort_values("g").reset_index(drop=True)

    for _, row in m.iterrows():
        sub = df[df["g"] == row["g"]]
        assert row["n"] == len(sub)
        assert row["sum_x"] == sub["x"].sum()
        assert row["sum_xx"] == (sub["x"] ** 2).sum()
        assert row["sum_xy"] == (sub["x"] * sub["y"]).sum()

    r = pearson_from_moments(m)
    for i, g in enumerate(m["g"]):
        sub = df[df["g"] == g]
        want = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert abs(r[i] - want) < 1e-12


def test_ntile_matches_sql_remainder_rule():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        ntile_in_group,
    )

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "id": np.arange(700),
            "k": rng.integers(0, 29, 700),  # ragged group sizes incl. < n_tiles
            "o": rng.integers(0, 1000, 700),
        }
    )
    got = (
        ntile_in_group(
            rd.from_pandas(df).repartition(6),
            key="k",
            order_col="o",
            tiebreak="id",
            n_tiles=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )

    def sql_ntile(cnt, rn0, n):
        base, rem = divmod(cnt, n)
        big = rem * (base + 1)
        if rn0 < big:
            return rn0 // (base + 1) + 1
        return rem + (rn0 - big) // base + 1

    want = df.sort_values(["k", "o", "id"]).copy()
    want["rn0"] = want.groupby("k", sort=False).cumcount()
    cnt = want.groupby("k", sort=False)["id"].transform("size")
    want["tile"] = [
        sql_ntile(c, r, 4) for c, r in zip(cnt, want["rn0"])
    ]
    want = want.sort_values("id").reset_index(drop=True)
    assert got["tile"].tolist() == want["tile"].tolist()


def test_funnel_steps_no_skipping_and_greedy_order():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        funnel_steps,
    )

    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        # u1 completes A,B,C in order
        (1, t0, "A"), (1, t0 + h, "B"), (1, t0 + 2 * h, "C"),
        # u2 has A and C but no B after A -> depth 1 (no skipping)
        (2, t0, "A"), (2, t0 + h, "C"),
        # u3: B before A, then A -> only depth 1 (B must be AFTER A)
        (3, t0, "B"), (3, t0 + h, "A"),
        # u4: A, B at SAME ts as A (not strictly after) -> depth 1
        (4, t0, "A"), (4, t0, "B"),
        # u5: no A at all -> omitted
        (5, t0, "B"), (5, t0 + h, "C"),
        # u6: A, B, then C BEFORE B -> depth 2
        (6, t0, "A"), (6, t0 + 2 * h, "B"), (6, t0 + h, "C"),
    ]
    df = pd.DataFrame(rows, columns=["u", "ts", "typ"])
    out = (
        funnel_steps(
            rd.from_pandas(df).repartition(3),
            key="u",
            ts_col="ts",
            type_col="typ",
            steps=["A", "B", "C"],
        )
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert out["u"].tolist() == [1, 2, 3, 4, 6]
    assert out["steps_completed"].tolist() == [3, 1, 1, 1, 2]
    assert out.loc[out["u"] == 1, "last_step_ts"].iloc[0] == t0 + 2 * h
    assert out.loc[out["u"] == 6, "last_step_ts"].iloc[0] == t0 + 2 * h


def test_event_transitions_match_pandas_shift(tmp_path):
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.queries import (
        q_event_transitions,
    )

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 3600, n), unit="s"),
            "user_id": rng.integers(0, 50, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "buy"], n),
            "value": rng.random(n),
            "props": "{}",
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = q_event_transitions(str(tmp_path)).reset_index(drop=True)

    ref = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    prev = ref.groupby("user_id", sort=False)["event_type"].shift(1)
    want = (
        pd.DataFrame({"prev_type": prev, "event_type": ref["event_type"]})
        .dropna(subset=["prev_type"])
        .groupby(["prev_type", "event_type"], sort=True)
        .size()
        .reset_index(name="n")
    )
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_cumulate_in_group_matches_pandas_running_sums():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        cumulate_in_group,
    )

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 40, n).astype(np.int64),
            "o": rng.integers(0, 500, n).astype(np.int64),
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )
    got = (
        cumulate_in_group(
            rd.from_pandas(df).repartition(5),
            key="k",
            order_cols=["o", "id"],
            value_cols=["v"],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "o", "id"], kind="stable")
    g = ref.groupby("k", sort=False)
    ref = ref.assign(cum_n=g.cumcount() + 1, cum_v=g["v"].cumsum())
    ref = ref.sort_values("id").reset_index(drop=True)
    assert got["cum_n"].tolist() == ref["cum_n"].tolist()
    assert got["cum_v"].tolist() == ref["cum_v"].tolist()


def test_percent_rank_and_cume_dist_match_sql_formulas():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        rank_in_group,
    )

    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 25, n).astype(np.int64),
            # narrow domain so ties are common
            "o": rng.integers(0, 12, n).astype(np.int64),
        }
    )
    # one single-row key to exercise the n==1 percent_rank=0 rule
    df.loc[n - 1, "k"] = 999
    ds = rd.from_pandas(df).repartition(4)
    pr = rank_in_group(
        ds, key="k", order_col="o", method="percent_rank", out_col="pr"
    )
    out = (
        rank_in_group(
            pr, key="k", order_col="o", method="cume_dist", out_col="cd"
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    g = df.groupby("k")
    rank_min = g["o"].rank(method="min")
    rank_max = g["o"].rank(method="max")
    cnt = g["o"].transform("size")
    want_pr = np.where(cnt > 1, (rank_min - 1) / np.maximum(cnt - 1, 1), 0.0)
    want_cd = (rank_max / cnt).to_numpy()
    assert np.array_equal(out["pr"].to_numpy(), want_pr)
    assert np.array_equal(out["cd"].to_numpy(), want_cd)


def test_grouped_mode_exact_with_min_value_tiebreak():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        grouped_mode,
    )

    rng = np.random.default_rng(17)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 60, n).astype(np.int64),
            "v": rng.choice(list("abcde"), n),
        }
    )
    # forced tie: key 999 has 'b' and 'a' twice each -> mode must be 'a'
    tie = pd.DataFrame({"k": [999] * 4, "v": ["b", "a", "b", "a"]})
    df = pd.concat([df, tie], ignore_index=True)
    got = (
        grouped_mode(
            rd.from_pandas(df).repartition(6), key="k", value_col="v"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    counts = df.groupby(["k", "v"]).size().reset_index(name="n")
    counts = counts.sort_values(
        ["k", "n", "v"], ascending=[True, False, True], kind="mergesort"
    )
    want = counts.drop_duplicates("k").sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["mode_value"].tolist() == want["v"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got.loc[got["k"] == 999, "mode_value"].iloc[0] == "a"


def test_grouped_entropy_matches_direct_quantized_formula():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        grouped_entropy,
    )

    rng = np.random.default_rng(19)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 30, n).astype(np.int64),
            "v": rng.choice(list("abcdefgh"), n, p=[0.4, 0.2, 0.1, 0.1, 0.08, 0.06, 0.04, 0.02]),
        }
    )
    # single-value key: entropy must be exactly 0 microbits
    df = pd.concat(
        [df, pd.DataFrame({"k": [777] * 5, "v": ["z"] * 5})], ignore_index=True
    )
    got = (
        grouped_entropy(
            rd.from_pandas(df).repartition(5), key="k", value_col="v"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    def direct(sub):
        c = sub.groupby("v").size().to_numpy().astype(np.float64)
        t = np.floor(c * np.log2(c) * 1048576.0).astype(np.int64).sum()
        nn = float(c.sum())
        return int(np.floor((np.log2(nn) - (float(t) / 1048576.0) / nn) * 1048576.0))

    want = (
        df.groupby("k")
        .apply(direct, include_groups=False)
        .sort_index()
    )
    assert got["entropy_ub"].tolist() == want.tolist()
    assert got.loc[got["k"] == 777, "entropy_ub"].iloc[0] == 0
    # uniform 2-value check: H = 1 bit exactly
    two = pd.DataFrame({"k": [1] * 8, "v": ["x"] * 4 + ["y"] * 4})
    g2 = (
        grouped_entropy(rd.from_pandas(two), key="k", value_col="v")
        .to_pandas()
    )
    assert g2["entropy_ub"].iloc[0] == 1048576


def test_ols_from_moments_matches_numpy_lstsq():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        grouped_moments,
        ols_from_moments,
    )

    rng = np.random.default_rng(23)
    n = 3000
    x = rng.integers(0, 24, n).astype(np.int64)
    g = rng.integers(0, 3, n).astype(np.int64)
    noise = rng.integers(-50, 50, n)
    y = (7 * x + 100 * g + noise).astype(np.int64)
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    m = grouped_moments(
        rd.from_pandas(df).repartition(4), group_col="g", x_col="x", y_col="y"
    )
    o = ols_from_moments(m).sort_values("g").reset_index(drop=True)
    for gi in range(3):
        sub = df[df["g"] == gi]
        slope, intercept = np.polyfit(
            sub["x"].to_numpy(float), sub["y"].to_numpy(float), 1
        )
        r = np.corrcoef(sub["x"], sub["y"])[0, 1]
        row = o[o["g"] == gi].iloc[0]
        assert abs(row["slope"] - slope) < 1e-8
        assert abs(row["intercept"] - intercept) < 1e-6
        assert abs(row["r2"] - r * r) < 1e-10


def test_cooccurrence_counts_match_python_sets():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        cooccurrence,
    )
    from itertools import combinations

    rng = np.random.default_rng(29)
    n = 3000
    df = pd.DataFrame(
        {
            "basket": rng.integers(0, 80, n).astype(np.int64),
            "item": rng.choice(list("pqrst"), n),
        }
    )
    got = cooccurrence(
        rd.from_pandas(df).repartition(5), basket_col="basket", item_col="item"
    )
    baskets = df.groupby("basket")["item"].agg(lambda s: frozenset(s))
    from collections import Counter

    pair_n = Counter()
    item_n = Counter()
    for items in baskets:
        for it in items:
            item_n[it] += 1
        for a, b in combinations(sorted(items), 2):
            pair_n[(a, b)] += 1
    assert int(got["n_baskets"].iloc[0]) == len(baskets)
    for _, r in got.iterrows():
        assert pair_n[(r["item_a"], r["item_b"])] == r["n_ab"]
        assert item_n[r["item_a"]] == r["n_a"]
        assert item_n[r["item_b"]] == r["n_b"]
    assert len(got) == len(pair_n)


def test_zscore_outliers_matches_numpy_reference():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        zscore_outliers,
    )

    rng = np.random.default_rng(31)
    n = 5000
    g = rng.integers(0, 4, n).astype(np.int64)
    x = rng.normal(100 * g, 10, n).astype(np.int64)
    # a constant group must flag nothing (sigma clamps to 0)
    g = np.concatenate([g, np.full(20, 9, np.int64)])
    x = np.concatenate([x, np.full(20, 42, np.int64)])
    df = pd.DataFrame({"id": np.arange(len(g)), "g": g, "x": x})
    got = (
        zscore_outliers(
            rd.from_pandas(df).repartition(4), group_col="g", value_col="x", z=2.0
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    stats = df.groupby("g")["x"].agg(["count", "sum", lambda s: (s * s).sum()])
    stats.columns = ["n", "sx", "sxx"]
    mu = stats["sx"] / stats["n"]
    var = np.maximum(stats["sxx"] / stats["n"] - mu * mu, 0.0)
    d = df["x"] - df["g"].map(mu)
    want = df[(d * d) > 4.0 * df["g"].map(var)]
    assert got["id"].tolist() == want["id"].tolist()
    assert (got["g"] != 9).all()
    assert len(got) > 0


def test_weighted_sample_matches_reference_and_prefers_heavy_rows():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.mixing import (
        knuth_hash32,
        weighted_sample,
    )

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    # two strata: heavy rows (w=200) vs light rows (w=2)
    w = np.where(ids % 10 == 0, 200, 2).astype(np.int64)
    df = pd.DataFrame({"id": ids, "w": w})
    got = weighted_sample(
        rd.from_pandas(df).repartition(4),
        id_col="id",
        weight_col="w",
        k=100,
        seed=3,
    )
    # single-process reference: same hash, same key, same top-k
    h = knuth_hash32((ids + 3).astype(np.uint64)).astype(np.float64)
    u = (h + 0.5) / 4294967296.0
    key = np.log(u) / np.maximum(w.astype(np.float64), 1.0)
    order = np.lexsort((ids, -key))[:100]
    want_ids = sorted(ids[order].tolist())
    assert sorted(got["id"].tolist()) == want_ids
    # heavy rows are 10% of the corpus but carry ~91% of the mass:
    # they must dominate the sample
    heavy = (got["id"] % 10 == 0).sum()
    assert heavy > 60
    # determinism + seed sensitivity
    again = weighted_sample(
        rd.from_pandas(df).repartition(7), id_col="id", weight_col="w",
        k=100, seed=3,
    )
    assert got["id"].tolist() == again["id"].tolist()
    other = weighted_sample(
        rd.from_pandas(df), id_col="id", weight_col="w", k=100, seed=4
    )
    assert got["id"].tolist() != other["id"].tolist()


def test_mutual_information_independent_vs_dependent():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        mutual_information,
    )

    rng = np.random.default_rng(41)
    n = 6000
    a = rng.integers(0, 4, n).astype(np.int64)
    # dependent: b mirrors a with a bit of noise
    b_dep = np.where(rng.random(n) < 0.9, a, rng.integers(0, 4, n))
    # independent draw
    b_ind = rng.integers(0, 4, n).astype(np.int64)
    mi_dep = mutual_information(
        rd.from_pandas(pd.DataFrame({"a": a, "b": b_dep})).repartition(4),
        col_a="a", col_b="b",
    )
    mi_ind = mutual_information(
        rd.from_pandas(pd.DataFrame({"a": a, "b": b_ind})).repartition(4),
        col_a="a", col_b="b",
    )
    assert int(mi_dep["n"].iloc[0]) == n and int(mi_ind["n"].iloc[0]) == n
    # dependent MI must be large (> 1 bit here), independent near 0
    assert int(mi_dep["mi_ub"].iloc[0]) > 1048576
    assert abs(int(mi_ind["mi_ub"].iloc[0])) < 1048576 // 50
    # identical copy: MI == H(A); compare against the direct formula
    mi_copy = mutual_information(
        rd.from_pandas(pd.DataFrame({"a": a, "b": a})), col_a="a", col_b="b"
    )
    counts = pd.Series(a).value_counts().to_numpy(np.float64)
    h = -(counts / n * np.log2(counts / n)).sum()
    assert abs(int(mi_copy["mi_ub"].iloc[0]) / 1048576.0 - h) < 1e-4
    # layout invariance: different partitioning, identical result
    again = mutual_information(
        rd.from_pandas(pd.DataFrame({"a": a, "b": b_dep})).repartition(9),
        col_a="a", col_b="b",
    )
    assert int(again["t_sum"].iloc[0]) == int(mi_dep["t_sum"].iloc[0])


def test_ewma_in_group_matches_pandas_reference():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        ewma_in_group,
    )

    rng = np.random.default_rng(43)
    n = 3000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 30, n).astype(np.int64),
            "o": rng.integers(0, 400, n).astype(np.int64),
            "v": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    got = (
        ewma_in_group(
            rd.from_pandas(df).repartition(5),
            key="k",
            order_cols=["o", "id"],
            value_col="v",
            alpha=0.25,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "o", "id"], kind="stable")
    ref = ref.assign(
        want=ref.groupby("k", sort=False)["v"]
        .ewm(alpha=0.25, adjust=False)
        .mean()
        .reset_index(level=0, drop=True)
    ).sort_values("id")
    assert np.allclose(
        got["ewma_v"].to_numpy(), ref["want"].to_numpy(), rtol=0, atol=0
    )


def test_negative_samples_deterministic_and_in_corpus():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.mixing import (
        knuth_hash32,
        negative_samples,
    )

    ids = np.array([3, 7, 11, 20, 21, 35, 50], dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    got = (
        negative_samples(
            rd.from_pandas(df).repartition(3), id_col="doc_id", m=4, seed=5
        )
        .to_pandas()
        .sort_values(["doc_id", "j"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ids) * 4
    assert set(got["neg_id"]) <= set(ids)
    # exact reference: hash -> rank -> sorted id
    srt = np.sort(ids)
    for _, r in got.iterrows():
        h = knuth_hash32(
            np.array([r["doc_id"] * 4 + r["j"] + 5], dtype=np.uint64)
        )[0]
        assert r["neg_id"] == srt[int(h % np.uint64(len(ids)))]
    again = (
        negative_samples(rd.from_pandas(df), id_col="doc_id", m=4, seed=5)
        .to_pandas()
        .sort_values(["doc_id", "j"])
        .reset_index(drop=True)
    )
    assert got["neg_id"].tolist() == again["neg_id"].tolist()


def test_chi2_independence_matches_scipy_formula():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        chi2_independence,
    )

    rng = np.random.default_rng(47)
    n = 5000
    a = rng.integers(0, 3, n).astype(np.int64)
    b_dep = np.where(rng.random(n) < 0.7, a, rng.integers(0, 3, n))
    got = chi2_independence(
        rd.from_pandas(pd.DataFrame({"a": a, "b": b_dep})).repartition(4),
        col_a="a", col_b="b",
    )
    # direct reference over the complete grid
    ct = pd.crosstab(pd.Series(a, name="a"), pd.Series(b_dep, name="b"))
    obs = ct.to_numpy(np.float64)
    e = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    chi2 = ((obs - e) ** 2 / e).sum()
    assert int(got["n"].iloc[0]) == n
    assert int(got["dof"].iloc[0]) == 4
    assert abs(int(got["chi2_uq"].iloc[0]) / 1048576.0 - chi2) < 1e-3
    # a zero-observed cell still contributes: tiny handmade table
    df = pd.DataFrame({"a": [0, 0, 1, 1, 1], "b": [0, 0, 0, 1, 1]})
    g2 = chi2_independence(rd.from_pandas(df), col_a="a", col_b="b")
    ct2 = pd.crosstab(df["a"], df["b"]).reindex(
        index=[0, 1], columns=[0, 1], fill_value=0
    ).to_numpy(np.float64)
    e2 = ct2.sum(1)[:, None] * ct2.sum(0)[None, :] / ct2.sum()
    want2 = ((ct2 - e2) ** 2 / e2).sum()
    assert abs(int(g2["chi2_uq"].iloc[0]) / 1048576.0 - want2) < 1e-3


def test_winsorize_by_quantile_clamps_tails_only():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        quantile_thresholds,
        winsorize_by_quantile,
    )

    rng = np.random.default_rng(53)
    v = np.concatenate(
        [rng.integers(100, 200, 900), [1, 2, 3], [9999, 8888, 7777]]
    ).astype(np.int64)
    df = pd.DataFrame({"id": np.arange(len(v), dtype=np.int64), "v": v})
    ds = rd.from_pandas(df).repartition(4)
    th = quantile_thresholds(ds, col="v", quantiles=(0.05, 0.95))
    got = (
        winsorize_by_quantile(ds, col="v", q_lo=0.05, q_hi=0.95)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    lo, hi = th[0.05], th[0.95]
    want = np.clip(df["v"].to_numpy(), lo, hi)
    assert got["v_w"].tolist() == want.tolist()
    assert len(got) == len(df)               # nothing dropped
    assert got["v_w"].min() == lo and got["v_w"].max() == hi
    mid = (df["v"] > lo) & (df["v"] < hi)    # interior rows untouched
    assert (got.loc[mid, "v_w"] == df.loc[mid, "v"]).all()


def test_grouped_mad_matches_numpy_median_reference():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        grouped_mad,
    )

    rng = np.random.default_rng(61)
    n = 4000
    g = rng.integers(0, 5, n).astype(np.int64)
    # heavy-tailed: a few huge outliers that would wreck mean/sigma
    x = rng.integers(0, 100, n).astype(np.int64) + 1000 * g
    x[:10] = 10_000_000
    df = pd.DataFrame({"g": g, "x": x})

    def expr(b):
        return b["x"].to_numpy(zero_copy_only=False)

    got = (
        grouped_mad(
            rd.from_pandas(df).repartition(4), group_col="g", cents_expr=expr
        )
        .sort_values("g")
        .reset_index(drop=True)
    )

    def nearest_rank(v, q):
        v = np.sort(v)
        return int(v[max(int(np.ceil(q * len(v))), 1) - 1])

    for gi in range(5):
        sub = df.loc[df["g"] == gi, "x"].to_numpy()
        med = nearest_rank(sub, 0.5)
        mad = nearest_rank(np.abs(sub - med), 0.5)
        row = got[got["g"] == gi].iloc[0]
        assert (row["median"], row["mad"]) == (med, mad)
    # outliers moved the max but not the medians: MAD stays small
    assert (got["mad"] < 100).all()


def test_sequence_fingerprint_groups_identical_paths(tmp_path):
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.queries import (
        q_sequence_fingerprint,
    )

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # users 1 and 3 share the exact path; user 2 differs in order
    for uid, types in ((1, ["a", "b", "c"]), (2, ["b", "a", "c"]),
                       (3, ["a", "b", "c"])):
        for i, ty in enumerate(types):
            rows.append((uid * 10 + i, t0 + pd.Timedelta(minutes=i), uid, ty))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["value"] = 0.0
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = q_sequence_fingerprint(str(tmp_path))
    assert got["user_id"].tolist() == [1, 2, 3]
    assert got["canonical_user"].tolist() == [1, 2, 1]


def test_profile_table_counts_nulls_distinct_and_typed_minmax():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        profile_table,
    )

    df = pd.DataFrame(
        {
            # numeric min must be numeric (2 < 10), not lexicographic
            "x": pd.array([10, 2, None, 100, 2], dtype="Int64"),
            "s": ["b", None, "a", "b", None],
        }
    )
    got = (
        profile_table(
            rd.from_pandas(df).repartition(3), columns=["x", "s"]
        )
        .set_index("col")
    )
    assert got.loc["x", "n"] == 5 and got.loc["x", "n_null"] == 1
    assert got.loc["x", "n_distinct"] == 3
    assert got.loc["x", "min"] == "2" and got.loc["x", "max"] == "100"
    assert got.loc["s", "n_null"] == 2 and got.loc["s", "n_distinct"] == 2
    assert got.loc["s", "min"] == "a" and got.loc["s", "max"] == "b"


def test_grouped_gini_matches_direct_formula():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        grouped_gini,
    )

    rng = np.random.default_rng(71)
    n = 3000
    g = rng.integers(0, 3, n).astype(np.int64)
    # group 0: uniform-ish; group 1: one giant holder; group 2: equal
    x = rng.integers(1, 100, n).astype(np.int64)
    x[g == 1] = 1
    first1 = np.flatnonzero(g == 1)[0]
    x[first1] = 1_000_000
    x[g == 2] = 42
    df = pd.DataFrame({"g": g, "x": x})

    def expr(b):
        return b["x"].to_numpy(zero_copy_only=False)

    got = grouped_gini(
        rd.from_pandas(df).repartition(4), group_col="g", cents_expr=expr
    )

    def direct(v):
        v = np.sort(v).astype(np.int64)
        nn = len(v)
        i = np.arange(1, nn + 1, dtype=np.int64)
        return int(((2 * i - nn - 1) * v).sum())

    for gi in range(3):
        sub = df.loc[df["g"] == gi, "x"].to_numpy()
        row = got[got["g"] == gi].iloc[0]
        assert row["gini_num"] == direct(sub)
        assert row["n"] == len(sub) and row["sum_x"] == sub.sum()
    gini = got.set_index("g").apply(
        lambda r: r["gini_num"] / (r["n"] * r["sum_x"]), axis=1
    )
    assert gini[2] == 0.0               # perfectly equal
    assert gini[1] > 0.9                # one holder owns everything
    assert 0.0 < gini[0] < gini[1]


def test_resample_fill_emits_zero_buckets():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        resample_fill,
    )

    H = 3_600_000_000
    t0 = pd.Timestamp("2024-05-01")
    rows = [
        # key 1: events in hours 0, 0, 3  -> zeros at hours 1, 2
        (1, t0), (1, t0 + pd.Timedelta(minutes=20)),
        (1, t0 + pd.Timedelta(hours=3)),
        # key 2: single event -> a single bucket, no fill
        (2, t0 + pd.Timedelta(hours=7)),
    ]
    df = pd.DataFrame(rows, columns=["k", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = (
        resample_fill(
            rd.from_pandas(df).repartition(2), key="k", ts_col="ts",
            bucket_us=H,
        )
        .to_pandas()
        .sort_values(["k", "bs"])
        .reset_index(drop=True)
    )
    base = t0.value // 1000
    want = [
        (1, base, 2), (1, base + H, 0), (1, base + 2 * H, 0),
        (1, base + 3 * H, 1),
        (2, base + 7 * H, 1),
    ]
    assert list(zip(got["k"], got["bs"], got["n"])) == want


def test_first_last_in_group_matches_pandas_transform():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        first_last_in_group,
    )

    rng = np.random.default_rng(83)
    n = 2500
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 40, n).astype(np.int64),
            "o": rng.integers(0, 300, n).astype(np.int64),
            "v": rng.integers(0, 9, n).astype(np.int64),
        }
    )
    got = (
        first_last_in_group(
            rd.from_pandas(df).repartition(5),
            key="k",
            order_cols=["o", "id"],
            value_cols=["v"],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "o", "id"], kind="stable")
    g = ref.groupby("k", sort=False)["v"]
    ref = ref.assign(f=g.transform("first"), l=g.transform("last"))
    ref = ref.sort_values("id").reset_index(drop=True)
    assert got["first_v"].tolist() == ref["f"].tolist()
    assert got["last_v"].tolist() == ref["l"].tolist()


def test_explode_list_roundtrips_and_indexes():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        explode_list,
    )

    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "xs": pa.array(
                [[1.5, 2.5], [], [7.0, 8.0, 9.0]], pa.list_(pa.float32())
            ),
        }
    )
    got = (
        explode_list(rd.from_arrow(tbl), id_col="id", list_col="xs")
        .to_pandas()
        .sort_values(["id", "idx"])
        .reset_index(drop=True)
    )
    assert list(zip(got["id"], got["idx"])) == [(1, 1), (1, 2), (3, 1),
                                                (3, 2), (3, 3)]
    assert got["val"].tolist() == [1.5, 2.5, 7.0, 8.0, 9.0]


def test_histogram_fixed_fills_empty_bins_and_clamps():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        histogram_fixed,
    )

    v = np.array([-5, 0, 3, 7, 7, 12, 99, 1000], dtype=np.int64)
    df = pd.DataFrame({"x": v})
    got = histogram_fixed(
        rd.from_pandas(df).repartition(3), col="x", lo=0, hi=20, nbins=4
    )
    # width 5: bins [0,5) [5,10) [10,15) [15,20); -5 clamps into bin 0,
    # 99/1000 clamp into bin 3; bin 3 otherwise empty of in-range vals
    assert got["bin"].tolist() == [0, 1, 2, 3]
    assert got["bin_lo"].tolist() == [0, 5, 10, 15]
    assert got["n"].tolist() == [3, 2, 1, 2]
    assert int(got["n"].sum()) == len(v)


def test_cohort_retention_counts_match_reference():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        cohort_retention,
    )

    W = pd.Timedelta(days=7)
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # cohort week0: users 1,2 — user1 active weeks 0,1,2; user2 only 0
    rows += [(1, t0), (1, t0 + W), (1, t0 + 2 * W), (2, t0)]
    # cohort week1: user 3 active weeks 1 and 2 (twice in week 1 —
    # dedup must count it once)
    rows += [(3, t0 + W), (3, t0 + W + pd.Timedelta(hours=5)),
             (3, t0 + 2 * W)]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = cohort_retention(
        rd.from_pandas(df).repartition(3), key="user_id", ts_col="ts"
    )
    b0 = (t0.value // 1000 // 604800000000) * 604800000000
    b = lambda k: b0 + k * 604800000000
    want = [
        (b(0), b(0), 2, 2),
        (b(0), b(1), 1, 2),
        (b(0), b(2), 1, 2),
        (b(1), b(1), 1, 1),
        (b(1), b(2), 1, 1),
    ]
    assert list(zip(got["cohort"], got["bucket"],
                    got["n_active"], got["n_cohort"])) == want


def test_lag_lead_multi_shift_masks_key_boundaries():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        lag_lead,
    )

    df = pd.DataFrame(
        {
            "id": np.arange(6, dtype=np.int64),
            "k": np.array([1, 1, 1, 2, 2, 2], dtype=np.int64),
            "v": list("abcdef"),
        }
    )
    got = (
        lag_lead(
            rd.from_pandas(df).repartition(2),
            key="k",
            order_cols=["id"],
            cols=["v"],
            shifts=(1, 2),
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    def vals(col):
        return [None if pd.isna(x) else x for x in got[col]]

    assert vals("lag_v") == [None, "a", "b", None, "d", "e"]
    assert vals("lag2_v") == [None, None, "a", None, None, "d"]
    assert vals("lead2_v") == ["c", None, None, "f", None, None]


def test_negative_samples_empty_corpus_raises():
    import pytest as _pytest

    from aws_serverless_elt_pipeline_enterprise_ray.functions.mixing import (
        negative_samples,
    )

    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.array([], dtype="int64")}))
    with _pytest.raises(ValueError, match="empty corpus"):
        negative_samples(empty, id_col="doc_id", m=2)
