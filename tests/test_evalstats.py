"""Eval-analytics ops (aggregates.pairwise_winrate / position_bias):
canonicalization, slot-NaN, and winner-not-presented exclusion edges
the oracle gate can't isolate."""

import numpy as np
import pandas as pd
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import (
    pairwise_winrate,
    position_bias,
)


def test_pairwise_winrate_canonicalizes_and_counts():
    df = pd.DataFrame(
        {
            "w": ["b", "a", "a", "c", "a", None],
            "l": ["a", "b", "b", "a", "a", "b"],
        }
    )  # a-b: a wins 2, b wins 1; a-c: c wins 1; self-pair + null dropped
    out = (
        pairwise_winrate(rd.from_pandas(df).repartition(3), winner_col="w", loser_col="l")
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    assert list(out["item_a"]) == ["a", "a"]
    assert list(out["item_b"]) == ["b", "c"]
    assert list(out["wins_a"]) == [2, 0]
    assert list(out["wins_b"]) == [1, 1]
    assert list(out["n"]) == [3, 1]
    assert out["winrate_a"][0] == 2.0 / 3.0 and out["winrate_a"][1] == 0.0


def test_position_bias_slots_and_exclusions():
    df = pd.DataFrame(
        {
            "f": ["a", "a", "b", "a"],
            "s": ["b", "b", "a", "b"],
            "w": ["a", "b", "a", "c"],  # last row: winner not presented
        }
    )
    out = position_bias(
        rd.from_pandas(df).repartition(2),
        first_col="f", second_col="s", winner_col="w",
    )
    out = out.set_index("item")
    # a: first twice (1 win), second once (1 win); b: first once (0),
    # second twice (1); the w="c" row is excluded everywhere
    assert out.loc["a", "first_wins"] == 1 and out.loc["a", "first_n"] == 2
    assert out.loc["a", "second_wins"] == 1 and out.loc["a", "second_n"] == 1
    assert out.loc["b", "first_wins"] == 0 and out.loc["b", "first_n"] == 1
    assert out.loc["b", "second_wins"] == 1 and out.loc["b", "second_n"] == 2
    assert out.loc["__overall__", "first_n"] == 3
    assert out.loc["__overall__", "first_wins"] == 1


def test_position_bias_nan_for_unseen_slot():
    df = pd.DataFrame({"f": ["a"], "s": ["b"], "w": ["a"]})
    out = position_bias(
        rd.from_pandas(df), first_col="f", second_col="s", winner_col="w"
    ).set_index("item")
    assert np.isnan(out.loc["a", "second_winrate"])
    assert np.isnan(out.loc["b", "first_winrate"])
    assert out.loc["a", "first_winrate"] == 1.0


def test_referential_check_nulls_never_violate():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dq import (
        referential_check,
    )

    child = rd.from_pandas(
        pd.DataFrame({"fk": [1, 1, 2, None, 9, 9, 9]}).astype({"fk": "Int64"})
    ).repartition(2)
    parent = rd.from_pandas(pd.DataFrame({"pk": [1, 2, 3]}))
    out = (
        referential_check(child, parent, fk="fk", pk="pk")
        .to_pandas()
        .sort_values("fk")
        .reset_index(drop=True)
    )
    # only 9 violates (3 rows); the NULL fk is ignored
    assert list(out["fk"]) == [9] and list(out["n_rows"]) == [3]


def test_referential_check_clean_is_empty():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dq import (
        referential_check,
    )

    child = rd.from_pandas(pd.DataFrame({"fk": [1, 2, 2]}))
    parent = rd.from_pandas(pd.DataFrame({"fk": [1, 2]}))
    assert referential_check(child, parent, fk="fk").count() == 0


def test_preference_cycles_finds_rps_triple(ray_session):
    """An engineered rock-paper-scissors majority digraph yields
    exactly its 3-cycle; a transitive set yields none."""
    import pandas as pd
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import preference_cycles

    rps = pd.DataFrame({
        "w": ["A"] * 5 + ["B"] * 5 + ["C"] * 5 + ["B"],
        "l": ["B"] * 5 + ["C"] * 5 + ["A"] * 5 + ["A"],  # noise reversal
    })
    out = preference_cycles(rd.from_pandas(rps), winner_col="w", loser_col="l")
    assert out.to_pydict() == {"item_a": ["A"], "item_b": ["B"], "item_c": ["C"]}

    ordered = pd.DataFrame({
        "w": ["A", "A", "B"], "l": ["B", "C", "C"],
    })
    out2 = preference_cycles(rd.from_pandas(ordered), winner_col="w", loser_col="l")
    assert len(out2) == 0


def test_length_bias_buckets_and_rates(ray_session):
    import pandas as pd
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import length_bias

    df = pd.DataFrame({
        "lf": [100, 100, 5, 5, 50],
        "ls": [10, 10, 50, 50, 50],
        "win": ["first", "second", "second", "second", "first"],
    })
    out = length_bias(
        rd.from_pandas(df), len_first_col="lf", len_second_col="ls",
        winner_col="win", bucket_width=10,
    ).to_pandas().set_index("gap_bucket")
    assert out.loc[9, "n"] == 2 and out.loc[9, "first_wins"] == 1
    assert out.loc[-5, "n"] == 2 and out.loc[-5, "first_wins"] == 0  # floor(-45/10)
    assert out.loc[0, "first_win_rate"] == 1.0


def test_fleiss_kappa_reference_value(ray_session):
    """Fleiss' 1971 textbook example-like check: hand-computed small
    case plus perfect-agreement == 1 and the unequal-count guard."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.aggregates import fleiss_kappa

    # 4 items x 3 raters
    rows = []
    labels = {
        0: ["a", "a", "a"],
        1: ["a", "a", "b"],
        2: ["b", "b", "b"],
        3: ["a", "b", "b"],
    }
    for item, cats in labels.items():
        rows += [{"item": item, "cat": c} for c in cats]
    out = fleiss_kappa(rd.from_pandas(pd.DataFrame(rows)),
                       item_col="item", category_col="cat")
    # closed form: N=4 n=3 S=4+5+9... per-item sums of squares:
    # [9, 5, 9, 5] -> S=28; c_a=6, c_b=6 -> csq=72; M=12
    # kappa = ((28-12)*144 - 12*2*72) / (12*2*(144-72)) = (2304-1728)/1728
    assert out["n_items"] == 4 and out["n_raters"] == 3
    assert abs(out["kappa"] - (576 / 1728)) < 1e-12

    perfect = pd.DataFrame(
        [{"item": i, "cat": "x" if i % 2 else "y"} for i in range(6)
         for _ in range(3)]
    )
    assert fleiss_kappa(rd.from_pandas(perfect), item_col="item",
                        category_col="cat")["kappa"] == 1.0

    bad = pd.DataFrame(rows[:-1])  # one item loses a rating
    with pytest.raises(ValueError):
        fleiss_kappa(rd.from_pandas(bad), item_col="item", category_col="cat")


def test_embedding_outliers_exact_and_tiebreak(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.drift import embedding_outliers

    base = np.zeros((10, 4), dtype=np.float32)
    base[7] = [5, 5, 5, 5]     # far outlier
    base[3] = [2, 0, 0, 0]
    base[9] = [2, 0, 0, 0]     # identical to 3 -> id tiebreak
    df = pd.DataFrame({
        "vec_id": np.arange(10, dtype=np.int64),
        "embedding": [r.copy() for r in base],
    })
    out = embedding_outliers(rd.from_pandas(df), id_col="vec_id",
                             vec_col="embedding", k=4)
    assert out["id"].tolist()[0] == 7
    pos3 = out["id"].tolist().index(3)
    assert out["id"].tolist()[pos3 + 1] == 9  # equal d2, id ascending
    assert out.loc[pos3, "d2"] == out.loc[pos3 + 1, "d2"]
