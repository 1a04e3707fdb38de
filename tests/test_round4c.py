"""Round-4 continuation transcript operators: code-fence lint,
system-prompt inventory, dialogue acts, response-length trend,
loss-mask spans."""

import pandas as pd
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
    fence_lint,
)


def _ds(rows, cols=("conv_id", "turn_idx", "role", "text")):
    return rd.from_pandas(pd.DataFrame(rows, columns=list(cols)))


# ---------------------------------------------------------------------------
# fence_lint
# ---------------------------------------------------------------------------


def test_fence_lint_truncation_shapes():
    ds = _ds(
        [
            # a: balanced code turn then clean close -> ok
            ("a", 1, "user", "write code"),
            ("a", 2, "assistant", "```py\nx=1\n```"),
            ("a", 3, "user", "thanks"),
            # b: final turn truncated mid-fence
            ("b", 1, "user", "go"),
            ("b", 2, "assistant", "```py\nx="),
            # c: mid-conversation unbalanced turn, balanced final
            ("c", 1, "assistant", "```"),
            ("c", 2, "assistant", "``` done ```  ```"),
            ("c", 3, "user", "ok"),
            # d: null text and no fences
            ("d", 1, "user", None),
            ("d", 2, "assistant", "plain"),
        ]
    )
    out = fence_lint(ds).to_pandas().set_index("conv_id").sort_index()
    a, b, c, d = out.loc["a"], out.loc["b"], out.loc["c"], out.loc["d"]
    assert a["ok"] and a["n_fenced_turns"] == 1 and a["n_unbalanced"] == 0
    assert not a["last_unbalanced"]
    assert not b["ok"] and b["n_unbalanced"] == 1 and b["last_unbalanced"]
    # c: turn1 odd(1), turn2 has 3 fences -> odd, final turn plain
    assert not c["ok"] and c["n_unbalanced"] == 2 and not c["last_unbalanced"]
    assert c["n_fenced_turns"] == 2
    assert d["ok"] and d["n_fenced_turns"] == 0 and d["n_turns"] == 2


def test_fence_lint_nonoverlapping_count_matches_sql_replace():
    # 5 backticks = ONE non-overlapping ``` (SQL replace semantics):
    # (5*1 - 2) / 3 = 1 -> odd -> unbalanced
    ds = _ds([("a", 1, "assistant", "`````")])
    out = fence_lint(ds).to_pandas()
    assert out.loc[0, "n_unbalanced"] == 1


# ---------------------------------------------------------------------------
# system_prompt_inventory
# ---------------------------------------------------------------------------


def test_system_prompt_inventory_groups_firsts():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        system_prompt_inventory,
    )

    ds = _ds(
        [
            # two convs share prompt P1; order within conv not sorted
            ("a", 2, "user", "later"),
            ("a", 1, "system", "P1"),
            ("b", 1, "system", "P1"),
            ("c", 1, "system", "P2"),
            ("c", 5, "user", "x"),
            # d: null first-turn text forms its own group
            ("d", 1, "system", None),
        ]
    )
    out = (
        system_prompt_inventory(ds)
        .to_pandas()
        .sort_values("prompt", na_position="last")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    p1 = out[out["prompt"] == "P1"].iloc[0]
    assert p1["n_convs"] == 2 and p1["example_conv"] == "a"
    p2 = out[out["prompt"] == "P2"].iloc[0]
    assert p2["n_convs"] == 1 and p2["example_conv"] == "c"
    nul = out[out["prompt"].isna()].iloc[0]
    assert nul["n_convs"] == 1 and nul["example_conv"] == "d"


# ---------------------------------------------------------------------------
# dialogue_acts
# ---------------------------------------------------------------------------


def test_dialogue_acts_classification():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        dialogue_acts,
    )

    ds = _ds(
        [
            ("a", 1, "user", "what is X?"),
            ("a", 2, "assistant", "X is Y"),          # excluded: role
            ("a", 3, "user", "Write a poem"),          # command (case)
            ("a", 4, "user", "the sky is blue"),       # statement
            ("a", 5, "user", None),                    # excluded: null
            ("b", 1, "user", "fix it?"),               # '?' wins over verb
            ("b", 2, "user", ""),                      # statement
        ]
    )
    out = dialogue_acts(ds).to_pandas().set_index("conv_id").sort_index()
    a, b = out.loc["a"], out.loc["b"]
    assert a["n_questions"] == 1 and a["n_commands"] == 1
    assert a["n_statements"] == 1
    assert b["n_questions"] == 1 and b["n_commands"] == 0
    assert b["n_statements"] == 1


# ---------------------------------------------------------------------------
# response_length_trend
# ---------------------------------------------------------------------------


def test_response_length_trend_slope():
    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        response_length_trend,
    )

    ds = _ds(
        [
            # a: lengths 1,3,5 over ranks 0,1,2 -> slope exactly 2
            ("a", 1, "assistant", "x"),
            ("a", 2, "assistant", "xxx"),
            ("a", 3, "assistant", "xxxxx"),
            # b: single turn -> NULL slope
            ("b", 1, "assistant", "hello"),
            # c: role filter drops user turn; lengths 4,2 -> slope -2
            ("c", 1, "user", "ignored!!!!!!"),
            ("c", 2, "assistant", "abcd"),
            ("c", 3, "assistant", "ab"),
            # d: null text only -> conv absent
            ("d", 1, "assistant", None),
        ]
    )
    out = (
        response_length_trend(ds, role_col="role", role="assistant")
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert list(out.index) == ["a", "b", "c"]
    assert out.loc["a", "slope"] == 2.0 and out.loc["a", "n_turns"] == 3
    assert np.isnan(out.loc["b", "slope"])
    assert out.loc["c", "slope"] == -2.0 and out.loc["c", "n_turns"] == 2


# ---------------------------------------------------------------------------
# loss_mask_spans
# ---------------------------------------------------------------------------


def test_loss_mask_spans_offsets():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        loss_mask_spans,
    )

    ds = _ds(
        [
            ("a", 1, "user", "hi"),          # [0, 2)
            ("a", 2, "assistant", "hello"),  # [3, 8) after 1-char sep
            ("a", 3, "user", None),          # excluded
            ("a", 4, "assistant", ""),       # [9, 9): empty text keeps a span
            ("b", 1, "assistant", "x"),      # [0, 1)
        ]
    )
    out = (
        loss_mask_spans(ds)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    rows = out.to_records(index=False).tolist()
    assert rows == [
        ("a", 1, 0, 2, False),
        ("a", 2, 3, 8, True),
        ("a", 4, 9, 9, True),
        ("b", 1, 0, 1, True),
    ]


# ---------------------------------------------------------------------------
# fork_margin
# ---------------------------------------------------------------------------


def test_fork_margin_best_vs_runner_up():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        fork_margin,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b", "b", "c", "c", "d"],
            "turn_idx": [1, 2, 1, 2, 1, 2, 1],
            "text": ["P", "x", "P", "y", "P", "z", "Q"],
            "sc": [None, 7, None, 3, None, 7, None],
        }
    )
    out = (
        fork_margin(
            rd.from_pandas(df), prefix_turns=1, score_col="sc"
        )
        .to_pandas()
        .set_index("prefix")
    )
    # group P: scores 7 (a), 3 (b), 7 (c); best = a by conv tiebreak,
    # runner-up = c (also 7) -> margin 0
    p = out.loc["P"]
    assert p["n_candidates"] == 3 and p["best_conv"] == "a"
    assert p["best_score"] == 7 and p["second_score"] == 7
    assert p["margin"] == 0
    # group Q: fork turn missing -> no candidates -> group absent
    assert "Q" not in out.index


def test_fork_margin_singleton_null():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        fork_margin,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a"],
            "turn_idx": [1, 2],
            "text": ["P", "only"],
            "sc": [None, 5],
        }
    )
    out = fork_margin(
        rd.from_pandas(df), prefix_turns=1, score_col="sc"
    ).to_pandas()
    row = out.iloc[0]
    assert row["n_candidates"] == 1 and row["best_score"] == 5
    assert pd.isna(row["second_score"]) and pd.isna(row["margin"])


# ---------------------------------------------------------------------------
# pack_conversations
# ---------------------------------------------------------------------------


def test_pack_conversations_order_and_nulls():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        pack_conversations,
    )

    ds = _ds(
        [
            ("a", 2, "assistant", "world"),
            ("a", 1, "user", "hello"),
            ("a", 3, "user", None),
            ("b", 1, "user", None),  # all-null -> absent
        ]
    )
    out = pack_conversations(ds).to_pandas().set_index("conv_id")
    assert list(out.index) == ["a"]
    assert out.loc["a", "text"] == "hello\nworld"
    assert out.loc["a", "n_turns"] == 2
    # role-prefixed variant
    out2 = pack_conversations(ds, role_col="role").to_pandas()
    assert out2.loc[0, "text"] == "user: hello\nassistant: world"


# ---------------------------------------------------------------------------
# transcript_refinery (composition)
# ---------------------------------------------------------------------------


def test_transcript_refinery_composition():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.refinery import (
        transcript_refinery,
    )

    ds = _ds(
        [
            # conv_3: double user send collapses; packs to 2 lines
            ("conv_3", 1, "user", "aa"),
            ("conv_3", 2, "user", "bb"),
            ("conv_3", 3, "assistant", "cc"),
            # conv_7: single turn
            ("conv_7", 1, "user", "zz"),
        ]
    )
    out = (
        transcript_refinery(ds)
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert out.loc["conv_3", "text"] == "user: aa bb\nassistant: cc"
    assert out.loc["conv_3", "n_turns"] == 2
    assert out.loc["conv_3", "packed_chars"] == len("user: aa bb\nassistant: cc")
    # split is the deterministic knuth-hash bucket of the conv number
    from aws_serverless_elt_pipeline_enterprise_ray.functions.mixing import (
        knuth_hash32,
    )
    import numpy as np

    for conv, num in (("conv_3", 3), ("conv_7", 7)):
        hv = int(knuth_hash32(np.array([num], dtype=np.int64))[0])
        frac = hv / 4294967296
        want = "train" if frac < 0.8 else ("val" if frac < 0.8 + 0.1 else "test")
        assert out.loc[conv, "split"] == want


# ---------------------------------------------------------------------------
# rollback -> re-apply convergence
# ---------------------------------------------------------------------------


def test_rollback_then_reapply_converges(tmp_path):
    import aws_serverless_elt_pipeline_enterprise_ray as engine
    from aws_serverless_elt_pipeline_enterprise_ray.gen import (
        gen_changes,
        oracle_final_state,
    )
    from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
        ManifestStore,
    )

    ch = str(tmp_path / "ch")
    lake = str(tmp_path / "lake")
    gen_changes(ch, n_events=4000, n_convs=50, n_files=4, seed=11)
    import os

    files = sorted(
        os.path.join(ch, f) for f in os.listdir(ch) if f.endswith(".parquet")
    )
    spec = engine.default_spec(num_partitions=4)
    m1 = engine.apply_changes(files[:2], lake, spec)[-1]
    engine.apply_changes(files, lake, spec)
    store = ManifestStore(lake)
    store.rollback(m1.version)
    # the fence is version-scoped: after demotion the second half is
    # NOT in CURRENT's lineage, so re-apply must pick it up again and
    # converge to the full oracle state
    ms = engine.apply_changes(files, lake, spec)
    assert ms, "re-apply after rollback must not be a no-op"
    got = (
        engine.read_table(lake)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        oracle_final_state(ch)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    cols = sorted(set(got.columns) & set(want.columns))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[cols].astype({c: want[c].dtype for c in cols}), want[cols]
    )


# ---------------------------------------------------------------------------
# type-widening schema evolution
# ---------------------------------------------------------------------------


def test_promote_type_lattice():
    import pyarrow as pa
    import pytest

    from aws_serverless_elt_pipeline_enterprise_ray.schema import promote_type

    assert promote_type(pa.float32(), pa.float64()) == pa.float64()
    assert promote_type(pa.float64(), pa.float32()) == pa.float64()
    assert promote_type(pa.int32(), pa.int64()) == pa.int64()
    assert promote_type(pa.int8(), pa.int8()) == pa.int8()
    # mixed signedness: smallest signed type holding both
    assert promote_type(pa.uint32(), pa.int32()) == pa.int64()
    assert promote_type(pa.uint8(), pa.int8()) == pa.int16()
    assert promote_type(pa.int64(), pa.float32()) == pa.float64()
    with pytest.raises(ValueError):
        promote_type(pa.uint64(), pa.int64())  # nothing holds both
    with pytest.raises(ValueError):
        promote_type(pa.string(), pa.int64())  # not an evolution


def test_schema_union_widens_not_first_seen():
    import pyarrow as pa

    from aws_serverless_elt_pipeline_enterprise_ray.schema import (
        TRANSCRIPT_SCHEMA,
        schema_union,
    )

    narrow = pa.schema([("score", pa.float32())])
    wide = pa.schema([("score", pa.float64())])
    for order in ([narrow, wide], [wide, narrow]):
        extras = schema_union(order, TRANSCRIPT_SCHEMA)
        assert extras == [("score", pa.float64())]


def test_apply_widens_evolved_column_across_commits(tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import aws_serverless_elt_pipeline_enterprise_ray as engine
    from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes

    ch = str(tmp_path / "ch")
    gen_changes(ch, n_events=1500, n_convs=20, n_files=2, seed=7)
    files = sorted(
        os.path.join(ch, f) for f in os.listdir(ch) if f.endswith(".parquet")
    )
    t1, t2 = pq.read_table(files[0]), pq.read_table(files[1])
    pq.write_table(
        t1.append_column("score", pa.array([1.5] * len(t1), pa.float32())),
        files[0],
    )
    pq.write_table(
        t2.append_column("score", pa.array([2.25] * len(t2), pa.float64())),
        files[1],
    )
    spec = engine.default_spec(num_partitions=4)
    # narrow-first as TWO commits (the cross-commit reconciliation),
    # then the same stream into a fresh lake wide-first
    lake_a = str(tmp_path / "lake_a")
    engine.apply_changes([files[0]], lake_a, spec)
    engine.apply_changes(files, lake_a, spec)
    df_a = engine.read_table(lake_a).to_pandas()
    assert str(df_a["score"].dtype) == "float64"
    assert set(df_a["score"].unique()) == {1.5, 2.25}
    lake_b = str(tmp_path / "lake_b")
    engine.apply_changes([files[1]], lake_b, spec)
    engine.apply_changes(files, lake_b, spec)
    df_b = engine.read_table(lake_b).to_pandas()
    assert str(df_b["score"].dtype) == "float64"


def test_promote_type_null_absorbed():
    import pyarrow as pa

    from aws_serverless_elt_pipeline_enterprise_ray.schema import promote_type

    assert promote_type(pa.null(), pa.float64()) == pa.float64()
    assert promote_type(pa.int32(), pa.null()) == pa.int32()


def test_pack_conversations_null_role_drops_line():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
        pack_conversations,
    )

    ds = _ds(
        [
            ("a", 1, "user", "hi"),
            ("a", 2, None, "orphan"),  # null role -> line dropped
            ("a", 3, "assistant", "yo"),
        ]
    )
    out = pack_conversations(ds, role_col="role").to_pandas()
    assert out.loc[0, "text"] == "user: hi\nassistant: yo"
    assert out.loc[0, "n_turns"] == 2


def test_widening_across_lsm_delta_runs(tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import aws_serverless_elt_pipeline_enterprise_ray as engine
    from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes

    ch = str(tmp_path / "ch")
    lake = str(tmp_path / "lake")
    gen_changes(ch, n_events=20000, n_convs=50, n_files=4, seed=9)
    files = sorted(
        os.path.join(ch, f) for f in os.listdir(ch) if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        t = pq.read_table(f)
        if i < 3:  # big float32 base
            t = t.append_column(
                "score", pa.array([float(i)] * len(t), pa.float32())
            )
        else:  # tiny float64 delta -> LSM run, not COW
            t = t.slice(0, 200).append_column(
                "score", pa.array([9.75] * 200, pa.float64())
            )
        pq.write_table(t, f)
    spec = engine.default_spec(num_partitions=4)
    engine.apply_changes(files[:3], lake, spec)
    m2 = engine.apply_changes(files, lake, spec)[-1]
    assert m2.metrics.get("delta_appends", 0) > 0  # merge-on-read path
    df = engine.read_table(lake).to_pandas()
    assert str(df["score"].dtype) == "float64"
    vals = set(df["score"].dropna().unique())
    assert 9.75 in vals and {0.0, 1.0, 2.0} & vals


def test_promote_type_commutative_and_lossless_extremes():
    import itertools

    import pyarrow as pa
    import pyarrow.compute as pc

    from aws_serverless_elt_pipeline_enterprise_ray.schema import promote_type

    numeric = [
        pa.int8(), pa.int16(), pa.int32(), pa.int64(),
        pa.uint8(), pa.uint16(), pa.uint32(),
        pa.float32(), pa.float64(),
    ]
    for a, b in itertools.combinations(numeric, 2):
        p1 = promote_type(a, b)
        assert p1 == promote_type(b, a)  # commutative
        for t in (a, b):
            if pa.types.is_integer(t) and pa.types.is_integer(p1):
                # extremes of each input survive a round-trip
                lo = -(2 ** (t.bit_width - 1)) if pa.types.is_signed_integer(t) else 0
                hi = 2 ** (t.bit_width - (1 if pa.types.is_signed_integer(t) else 0)) - 1
                arr = pa.array([lo, hi], t)
                assert pc.cast(pc.cast(arr, p1), t).equals(arr)


# ---------------------------------------------------------------------------
# cohens_kappa
# ---------------------------------------------------------------------------


def test_cohens_kappa_values():
    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        cohens_kappa,
    )

    # classic 2x2: a=20 yes/yes, d=15 no/no, b=5, c=10 -> kappa = 0.4
    rows = (
        [("yes", "yes")] * 20 + [("no", "no")] * 15
        + [("yes", "no")] * 5 + [("no", "yes")] * 10
    )
    df = pd.DataFrame(rows, columns=["ra", "rb"])
    out = cohens_kappa(
        rd.from_pandas(df), label_a_col="ra", label_b_col="rb"
    ).to_pandas()
    assert out.loc[0, "n_items"] == 50 and out.loc[0, "n_agree"] == 35
    # exact rational: (35*50 - (25*30 + 25*20)) / (2500 - 1250) = 0.4
    assert out.loc[0, "kappa"] == 0.4
    # degenerate: both raters constant same category -> NULL
    dg = pd.DataFrame([("x", "x")] * 4, columns=["ra", "rb"])
    out2 = cohens_kappa(
        rd.from_pandas(dg), label_a_col="ra", label_b_col="rb"
    ).to_pandas()
    assert np.isnan(out2.loc[0, "kappa"])


def test_cohens_kappa_per_group_and_nulls():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        cohens_kappa,
    )

    df = pd.DataFrame(
        {
            "grp": ["g1"] * 4 + ["g2"] * 4 + [None],
            "ra": ["a", "a", "b", "b", "a", "b", "a", "b", "a"],
            "rb": ["a", "a", "b", "b", "b", "a", "b", "a", "a"],
        }
    )
    out = (
        cohens_kappa(
            rd.from_pandas(df), label_a_col="ra", label_b_col="rb",
            group_col="grp",
        )
        .to_pandas()
        .set_index("grp")
    )
    assert out.loc["g1", "kappa"] == 1.0   # perfect agreement
    assert out.loc["g2", "kappa"] == -1.0  # perfect disagreement
    assert len(out) == 2                   # null group excluded


# ---------------------------------------------------------------------------
# bradley_terry
# ---------------------------------------------------------------------------


def test_bradley_terry_recovers_order():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
        bradley_terry,
    )

    # BT-consistent outcomes (odds multiply along the chain):
    # A:B = 3:1, B:C = 3:1, A:C = 9:1 -> strengths 9 : 3 : 1
    rows = (
        [("A", "B")] * 3 + [("B", "A")] * 1
        + [("B", "C")] * 3 + [("C", "B")] * 1
        + [("A", "C")] * 9 + [("C", "A")] * 1
    )
    df = pd.DataFrame(rows, columns=["w", "l"])
    out = bradley_terry(
        rd.from_pandas(df), winner_col="w", loser_col="l"
    ).set_index("item")
    assert list(out.sort_values("rank").index) == ["A", "B", "C"]
    assert out.loc["A", "wins"] == 12 and out.loc["A", "losses"] == 2
    # the MLE reproduces the consistent pairwise odds
    pa_, pb = out.loc["A", "strength"], out.loc["B", "strength"]
    assert abs(pa_ / (pa_ + pb) - 0.75) < 0.02
    # determinism
    out2 = bradley_terry(
        rd.from_pandas(df), winner_col="w", loser_col="l"
    ).set_index("item")
    assert (out2["strength"] == out["strength"]).all()
