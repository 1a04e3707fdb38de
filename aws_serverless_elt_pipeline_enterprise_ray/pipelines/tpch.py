"""Decision-support join analytics (TPC-H query shapes) over the lake tables.

The reference's downstream consumers run exactly this class of SQL over the
silver Parquet the pipeline lands (reference README.md's Athena/Glue
examples); these pipelines prove the engine's multi-table join patterns at
Ray-Data level rather than delegating to a SQL engine:

- big x big equi-joins go through ``hash_join`` (ONE co-partitioning
  shuffle, vectorized per-bucket merge);
- fact-table aggregation is ALWAYS map-side-partial first (per-batch
  ``pyarrow`` group_by), so every exchange carries result-sized blocks,
  never fact rows;
- genuinely tiny dims (nation, region, supplier at this schema: fixed
  cardinality) broadcast once via ``ray.put`` and resolve per actor;
  customer/orders are NOT broadcast — at the 100 TB tier they are
  billion-row tables, so they co-partition through ``hash_join``;
- money is floored to integer cents per row BEFORE any sum (the
  ``lineitem_rollup`` convention), so aggregates are order-independent
  and hash-exact against the DuckDB oracle;
- top-k results reduce per-block first (each block ships <= k rows) and
  finish on a single k-row partition — no full sort of the aggregate.

Query shapes and their reference analogues: shipping-priority (Q3),
local-supplier-volume (Q5), returned-item-report (Q10), large-volume
customer (Q18 HAVING subquery).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.joins import hash_join
from ..functions.windows import bucketed_agg

# Fixed analysis parameters (both the Ray pipelines and the SQL oracles
# cite these same literals; the driver compares at several scale factors).
Q3_SEGMENT = "BUILDING"
Q3_CUT = "1998-06-15"
Q5_REGION = "AFRICA"
Q5_LO, Q5_HI = "1996-01-01", "1998-01-01"
Q10_LO, Q10_HI = "1996-07-01", "1997-01-01"
Q18_MIN_QTY = 250


def _ts(s: str) -> pa.Scalar:
    return pa.scalar(pd.Timestamp(s), pa.timestamp("us"))


def _revenue_cents(b: pa.Table) -> pa.ChunkedArray:
    """Per-row integer cents of extendedprice*(1-discount) — floored
    BEFORE summation so any grouping/order of the later sums is exact.
    The oracle mirrors the same association order:
    ``FLOOR(l_extendedprice * (1 - l_discount) * 100)``."""
    rev = pc.multiply(
        pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])),
        pa.scalar(100.0),
    )
    return pc.cast(pc.floor(rev), pa.int64())


def _topk(ds: rd.Dataset, sort_cols: list[str], ascending: list[bool], k: int) -> pd.DataFrame:
    """Distributed top-k: per-block prune to k rows, then one k*n_blocks-row
    final prune — the exchange never carries more than k rows per block."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(sort_cols, ascending=ascending, kind="mergesort").head(k)

    out = (
        ds.map_batches(local, batch_format="pandas")
        .repartition(1)
        .map_batches(local, batch_format="pandas")
    )
    return out.to_pandas().reset_index(drop=True)


def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def q_tpch_q3_shipping(sf_dir: str) -> pd.DataFrame:
    """Shipping-priority (Q3 shape): top-10 not-yet-shipped orders of one
    market segment by outstanding revenue. customer x orders goes through a
    SEMI hash_join (customer is billion-row at the 100 TB tier — never
    broadcast); lineitem revenue partials aggregate map-side per batch so
    the join and the final groupby both see order-sized rows."""
    cut = _ts(Q3_CUT)

    def seg_keys(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["c_mktsegment"], Q3_SEGMENT))
        # renamed to the orders-side key so hash_join co-partitions on it
        return pa.table({"o_custkey": b["c_custkey"]})

    ckeys = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        seg_keys, batch_format="pyarrow"
    )

    def ofilter(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b["o_orderdate"], cut))

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(ofilter, batch_format="pyarrow")
    o2 = hash_join(orders, ckeys, on="o_custkey", how="semi").drop_columns(["o_custkey"])

    def rev_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["l_shipdate"], cut))
        t = pa.table({"o_orderkey": b["l_orderkey"], "revenue_cents": _revenue_cents(b)})
        return (
            t.group_by(["o_orderkey"])
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(["o_orderkey", "revenue_cents"])
        )

    rev = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(rev_partial, batch_format="pyarrow")

    joined = hash_join(rev, o2, on="o_orderkey", how="inner")
    agg = bucketed_agg(
        joined,
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
        {"revenue_cents": "sum"},
        bucket_key="o_orderkey",
    )
    df = _topk(agg, ["revenue_cents", "o_orderkey"], [False, True], 10)
    for c in ("o_orderkey", "revenue_cents"):
        df[c] = df[c].astype("int64")
    return df[["o_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority"]]


def q_tpch_q5_local_supplier(sf_dir: str) -> pd.DataFrame:
    """Local-supplier volume (Q5 shape): revenue per nation of one region
    where the supplying and ordering nation coincide. nation/region/supplier
    are fixed-cardinality dims -> broadcast dicts resolved once per actor;
    customer resolves through a hash_join (billion-row at target scale);
    the c_nationkey == s_nationkey predicate applies AFTER the orderkey
    join, on order-sized rows."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    rkey = reg.filter(pc.equal(reg["r_name"], Q5_REGION))["r_regionkey"][0].as_py()
    nat_f = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    region_nations = dict(
        zip(nat_f["n_nationkey"].to_pylist(), nat_f["n_name"].to_pylist())
    )
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    supp_nat = {
        sk: nk
        for sk, nk in zip(sup["s_suppkey"].to_pylist(), sup["s_nationkey"].to_pylist())
        if nk in region_nations
    }
    supp_ref, nations_ref = ray.put(supp_nat), ray.put(region_nations)
    lo, hi = _ts(Q5_LO), _ts(Q5_HI)

    def ofilter(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi)
        )
        return b.filter(m)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ofilter, batch_format="pyarrow"
    ).drop_columns(["o_orderdate"])

    def cust_proj(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b["c_custkey"], "c_nationkey": b["c_nationkey"]})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_proj, batch_format="pyarrow"
    )
    o2 = hash_join(orders, cust, on="o_custkey", how="inner").drop_columns(["o_custkey"])

    class RevBySupplierNation:
        """Map-side: keep region-supplied lines, resolve s_nationkey through
        the once-per-actor broadcast dict, emit per-(order, nation) partial
        revenue — the exchange carries partials, never lineitem rows."""

        def __init__(self):
            self.supp_nat = ray.get(supp_ref)

        def __call__(self, b: pd.DataFrame) -> pa.Table:
            snat = b["l_suppkey"].map(self.supp_nat)
            keep = snat.notna()
            b, snat = b[keep], snat[keep]
            rev = np.floor(
                b["l_extendedprice"].to_numpy()
                * (1.0 - b["l_discount"].to_numpy())
                * 100.0
            ).astype(np.int64)
            t = pa.table(
                {
                    "o_orderkey": pa.array(b["l_orderkey"].to_numpy(), pa.int64()),
                    "s_nationkey": pa.array(snat.to_numpy(dtype=np.int64), pa.int64()),
                    "revenue_cents": pa.array(rev, pa.int64()),
                }
            )
            return (
                t.group_by(["o_orderkey", "s_nationkey"])
                .aggregate([("revenue_cents", "sum")])
                .rename_columns(["o_orderkey", "s_nationkey", "revenue_cents"])
            )

    rev = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(RevBySupplierNation, batch_format="pandas", concurrency=(1, 8))

    joined = hash_join(rev, o2, on="o_orderkey", how="inner")

    class LocalOnly:
        def __init__(self):
            self.names = ray.get(nations_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["s_nationkey"] == b["c_nationkey"]]
            return pd.DataFrame(
                {
                    "n_name": b["s_nationkey"].map(self.names),
                    "revenue_cents": b["revenue_cents"],
                }
            )

    local = joined.map_batches(LocalOnly, batch_format="pandas", concurrency=(1, 8))
    agg = bucketed_agg(local, "n_name", {"revenue_cents": "sum"})
    df = (
        agg.to_pandas()
        .sort_values(["revenue_cents", "n_name"], ascending=[False, True])
        .reset_index(drop=True)
    )
    df["revenue_cents"] = df["revenue_cents"].astype("int64")
    return df[["n_name", "revenue_cents"]]


def q_tpch_q10_returned(sf_dir: str) -> pd.DataFrame:
    """Returned-item report (Q10 shape): top-20 customers by revenue lost
    to returns in one quarter-window. Two big x big hash_joins (lineitem
    partials x orders, custkey aggregate x customer) and one broadcast dim
    (nation). Revenue partials pre-aggregate per batch on l_orderkey."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nat_ref = ray.put(
        dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    )
    lo, hi = _ts(Q10_LO), _ts(Q10_HI)

    def ofilter(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi)
        )
        b = b.filter(m)
        return pa.table({"o_orderkey": b["o_orderkey"], "c_custkey": b["o_custkey"]})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ofilter, batch_format="pyarrow"
    )

    def rev_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        t = pa.table({"o_orderkey": b["l_orderkey"], "revenue_cents": _revenue_cents(b)})
        return (
            t.group_by(["o_orderkey"])
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(["o_orderkey", "revenue_cents"])
        )

    rev = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
    ).map_batches(rev_partial, batch_format="pyarrow")

    per_order = hash_join(rev, orders, on="o_orderkey", how="inner")
    per_cust = bucketed_agg(per_order, "c_custkey", {"revenue_cents": "sum"})

    def cust_proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_name": b["c_name"],
                "acctbal_cents": pc.cast(
                    pc.floor(pc.multiply(b["c_acctbal"], pa.scalar(100.0))), pa.int64()
                ),
                "c_nationkey": b["c_nationkey"],
            }
        )

    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).map_batches(cust_proj, batch_format="pyarrow")
    joined = hash_join(per_cust, cust, on="c_custkey", how="inner")

    class NatName:
        def __init__(self):
            self.names = ray.get(nat_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["n_name"] = b["c_nationkey"].map(self.names)
            return b.drop(columns=["c_nationkey"])

    named = joined.map_batches(NatName, batch_format="pandas", concurrency=(1, 4))
    df = _topk(named, ["revenue_cents", "c_custkey"], [False, True], 20)
    for c in ("c_custkey", "revenue_cents", "acctbal_cents"):
        df[c] = df[c].astype("int64")
    return df[["c_custkey", "c_name", "revenue_cents", "acctbal_cents", "n_name"]]


def q_tpch_q18_big_orders(sf_dir: str) -> pd.DataFrame:
    """Large-volume customers (Q18 shape: the HAVING-subquery pattern):
    orders whose total lineitem quantity exceeds a threshold, joined back
    to orders + customer for the report. The HAVING runs as a bucketed
    aggregate over map-side quantity partials — orders that fail the
    threshold never enter a join."""

    def qty_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderkey": b["l_orderkey"],
                "sum_qty": pc.cast(pc.floor(b["l_quantity"]), pa.int64()),
            }
        )
        return (
            t.group_by(["o_orderkey"])
            .aggregate([("sum_qty", "sum")])
            .rename_columns(["o_orderkey", "sum_qty"])
        )

    qty = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        qty_partial, batch_format="pyarrow"
    )
    per_order = bucketed_agg(qty, "o_orderkey", {"sum_qty": "sum"})

    def having(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["sum_qty"], Q18_MIN_QTY))

    big = per_order.map_batches(having, batch_format="pyarrow")

    def ord_proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "c_custkey": b["o_custkey"],
                "o_orderdate": b["o_orderdate"],
                "totalprice_cents": pc.cast(
                    pc.floor(pc.multiply(b["o_totalprice"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(ord_proj, batch_format="pyarrow")
    j1 = hash_join(big, orders, on="o_orderkey", how="inner")

    def cust_proj(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": b["c_custkey"], "c_name": b["c_name"]})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        cust_proj, batch_format="pyarrow"
    )
    j2 = hash_join(j1, cust, on="c_custkey", how="inner")
    df = _topk(j2, ["totalprice_cents", "o_orderkey"], [False, True], 100)
    for c in ("o_orderkey", "c_custkey", "totalprice_cents", "sum_qty"):
        df[c] = df[c].astype("int64")
    return df[
        ["c_name", "c_custkey", "o_orderkey", "o_orderdate", "totalprice_cents", "sum_qty"]
    ]
