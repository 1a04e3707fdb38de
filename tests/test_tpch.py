"""TPC-H-shape join analytics (pipelines/tpch.py): structural semantics
the oracle gate can't isolate — semi-join non-duplication, HAVING
threshold edges, top-k tie-breaks, cents flooring."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import hash_join
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch import (
    _revenue_cents,
    _topk,
)

SF = "/root/testdata/sf0.001"


def test_revenue_cents_floors_per_row():
    b = pa.table(
        {
            "l_extendedprice": pa.array([100.0, 0.0, 10.015], pa.float64()),
            "l_discount": pa.array([0.25, 0.5, 0.0], pa.float64()),
        }
    )
    got = _revenue_cents(b).to_pylist()
    # floor((100*0.75)*100)=7500; floor(0)=0; floor(10.015*100)=floor(1001.49..)
    assert got[0] == 7500 and got[1] == 0
    assert got[2] == int(np.floor(10.015 * 100.0))


def test_topk_prunes_with_tiebreak():
    df = pd.DataFrame(
        {"k": [1, 2, 3, 4, 5], "v": [9, 9, 9, 1, 10]},
    )
    ds = rd.from_pandas(df).repartition(3)
    out = _topk(ds, ["v", "k"], [False, True], 3)
    # ties on v=9 break by k ascending: 5(v10), 1, 2
    assert list(out["k"]) == [5, 1, 2]
    assert list(out["v"]) == [10, 9, 9]


def test_semi_join_does_not_duplicate_multimatch():
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2], "x": ["a", "b"]}))
    right = rd.from_pandas(pd.DataFrame({"k": [1, 1, 1]}))
    out = hash_join(left, right, on="k", how="semi").to_pandas()
    assert list(out.sort_values("k")["k"]) == [1]


def test_q18_having_threshold_is_strict():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch import (
        Q18_MIN_QTY,
        q_tpch_q18_big_orders,
    )
    import duckdb

    df = q_tpch_q18_big_orders(SF)
    assert (df["sum_qty"] > Q18_MIN_QTY).all()
    # every qualifying order at this scale fits in the top-100 window,
    # so the result is exactly the HAVING set
    n = duckdb.sql(
        f"""SELECT count(*) FROM (
              SELECT l_orderkey FROM read_parquet('{SF}/lineitem.parquet')
              GROUP BY 1 HAVING sum(CAST(FLOOR(l_quantity) AS BIGINT)) > {Q18_MIN_QTY})"""
    ).fetchone()[0]
    assert len(df) == min(n, 100)


def test_q3_returns_top10_sorted_desc():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch import (
        q_tpch_q3_shipping,
    )

    df = q_tpch_q3_shipping(SF)
    assert len(df) == 10
    r = df["revenue_cents"].to_numpy()
    assert (r[:-1] >= r[1:]).all()
    assert df["revenue_cents"].dtype == np.int64


def test_q14_ratio_is_single_division():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch import (
        q_tpch_q14_promo,
    )

    df = q_tpch_q14_promo(SF)
    assert len(df) == 1
    p, t, r = int(df["promo_cents"][0]), int(df["total_cents"][0]), float(df["promo_ratio"][0])
    assert 0 <= p <= t and t > 0
    assert r == p / t  # bitwise: one float64 division over exact ints


def test_q17_threshold_cross_multiplication():
    # qty < 0.2*avg  <=>  5*qty*n < sum_qty, checked on a hand case:
    # qtys [1, 9] -> sum 10, n 2; 5*1*2=10 !< 10 (strict), 5*9*2=90 !< 10
    # qtys [1, 99] -> sum 100, n 2; 5*1*2=10 < 100 qualifies
    import duckdb
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch import (
        Q17_BRAND,
        q_tpch_q17_small_qty,
    )

    df = q_tpch_q17_small_qty(SF)
    want = duckdb.sql(
        f"""WITH t AS (
              SELECT l_partkey, sum(CAST(FLOOR(l_quantity) AS BIGINT)) s, count(*) n
              FROM read_parquet('{SF}/lineitem.parquet') l,
                   read_parquet('{SF}/part.parquet') p
              WHERE l_partkey = p_partkey AND p_brand = '{Q17_BRAND}'
              GROUP BY 1)
            SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet') l, t
            WHERE l.l_partkey = t.l_partkey
              AND 5 * CAST(FLOOR(l.l_quantity) AS BIGINT) * t.n < t.s"""
    ).fetchone()[0]
    assert int(df["n_lines"][0]) == want


def test_q19_mask_matches_per_clause_sum():
    import duckdb
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch import (
        Q19_CLAUSES,
        q_tpch_q19_bands,
    )

    df = q_tpch_q19_bands(SF)
    per_clause = 0
    for br, slo, shi, qlo, qhi in Q19_CLAUSES:
        per_clause += duckdb.sql(
            f"""SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet') l,
                 read_parquet('{SF}/part.parquet') p
                WHERE l_partkey = p_partkey AND p_brand = '{br}'
                  AND p_size BETWEEN {slo} AND {shi}
                  AND l_quantity BETWEEN {qlo} AND {qhi}"""
        ).fetchone()[0]
    # clauses are brand-disjoint, so the OR'd mask count == sum of clauses
    assert int(df["n_lines"][0]) == per_clause
