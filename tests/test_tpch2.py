"""TPC-H shapes, batches 2-3 (pipelines/tpch2.py, tpch3.py): structural
semantics the oracle gate can't isolate — zero-group completeness,
argmax tie retention, exists/not-exists decorrelation invariants,
fraction-of-global threshold edges."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_q13_distribution_covers_every_customer():
    # left-join completeness: every customer lands in exactly one
    # order-count group, including the zero group
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch2 import (
        q_tpch_q13_custdist,
    )

    df = q_tpch_q13_custdist(SF)
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet')"
    ).fetchone()[0]
    assert int(df["custdist"].sum()) == n_cust


def test_q15_winners_all_tie_at_max():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch2 import (
        q_tpch_q15_top_supplier,
    )

    df = q_tpch_q15_top_supplier(SF)
    assert len(df) >= 1
    assert (df["revenue_cents"] == df["revenue_cents"].max()).all()


def test_q2_ties_preserved_per_part():
    # every returned row carries its part's MINIMUM acctbal — ties all
    # survive the equality join-back, like the correlated SQL form
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch3 import (
        q_tpch_q2_min_cost_supplier,
    )

    df = q_tpch_q2_min_cost_supplier(SF)
    assert len(df) >= 1
    per_part = df.groupby("p_partkey")["acctbal_cents"].nunique()
    assert (per_part == 1).all()


def test_q21_one_waiting_supplier_per_qualifying_order():
    # each qualifying order (multi-supplier, unique latest shipper,
    # status F) contributes EXACTLY one waiting supplier
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch3 import (
        q_tpch_q21_waiting_supplier,
    )

    df = q_tpch_q21_waiting_supplier(SF)
    want = duckdb.sql(
        f"""WITH pm AS (
              SELECT l_orderkey, l_suppkey, max(l_shipdate) AS m
              FROM read_parquet('{SF}/lineitem.parquet') l,
                   read_parquet('{SF}/orders.parquet') o
              WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F'
              GROUP BY 1, 2),
            om AS (SELECT l_orderkey, max(m) AS ms, count(*) AS n
                   FROM pm GROUP BY 1),
            ach AS (SELECT pm.l_orderkey, count(*) AS nmax FROM pm, om
                    WHERE pm.l_orderkey = om.l_orderkey AND pm.m = om.ms
                    GROUP BY 1)
            SELECT count(*) FROM om, ach
            WHERE om.l_orderkey = ach.l_orderkey
              AND om.n > 1 AND ach.nmax = 1"""
    ).fetchone()[0]
    assert int(df["numwait"].sum()) == want


def test_q11_threshold_boundary_is_strict():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch3 import (
        Q11_FRACTION_DEN,
        Q11_REGION,
        q_tpch_q11_important_stock,
    )

    df = q_tpch_q11_important_stock(SF)
    total = duckdb.sql(
        f"""SELECT sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
            FROM read_parquet('{SF}/lineitem.parquet') l,
                 read_parquet('{SF}/supplier.parquet') s,
                 read_parquet('{SF}/nation.parquet') n,
                 read_parquet('{SF}/region.parquet') r
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey AND r_name = '{Q11_REGION}'"""
    ).fetchone()[0]
    assert (df["value_cents"] * Q11_FRACTION_DEN > total).all()


def test_q20_winners_exceed_share():
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tpch3 import (
        Q20_DEN,
        Q20_HI,
        Q20_LO,
        Q20_NAME_PREFIX,
        Q20_NUM,
        q_tpch_q20_quota_suppliers,
    )

    df = q_tpch_q20_quota_suppliers(SF)
    want = duckdb.sql(
        f"""WITH q AS (
              SELECT l_partkey, l_suppkey,
                     sum(CAST(FLOOR(l_quantity) AS BIGINT)) AS sq
              FROM read_parquet('{SF}/lineitem.parquet') l,
                   read_parquet('{SF}/part.parquet') p
              WHERE l_partkey = p_partkey AND p_name LIKE '{Q20_NAME_PREFIX}%'
                AND l_shipdate >= TIMESTAMP '{Q20_LO}'
                AND l_shipdate <  TIMESTAMP '{Q20_HI}'
              GROUP BY 1, 2),
            t AS (SELECT l_partkey, sum(sq) AS tq FROM q GROUP BY 1)
            SELECT count(DISTINCT l_suppkey) FROM q, t
            WHERE q.l_partkey = t.l_partkey
              AND {Q20_DEN} * q.sq > {Q20_NUM} * t.tq"""
    ).fetchone()[0]
    assert len(df) == want
