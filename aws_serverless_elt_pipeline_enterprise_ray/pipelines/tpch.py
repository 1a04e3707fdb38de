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
Q14_LO, Q14_HI = "1997-01-01", "1997-07-01"
Q17_BRAND = "Brand#13"
# (brand, size_lo, size_hi, qty_lo, qty_hi) — OR'd Q19-style clauses
Q19_CLAUSES = (
    ("Brand#1", 1, 5, 1, 11),
    ("Brand#2", 1, 10, 10, 20),
    ("Brand#3", 1, 15, 20, 30),
)


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


def q_tpch_q14_promo(sf_dir: str) -> pd.DataFrame:
    """Promotion-effect (Q14 shape): share of revenue from promo parts in
    a ship-date window. The part dim resolves through a DENSE bitmap
    broadcast (1 bit per partkey — ~25 MB per 2x10^8 parts, far cheaper
    than a join); per-batch output is TWO int64 partial sums, so the
    reduction is a scalar tree — no shuffle at all. The single float
    division happens once, on exact ints, matching the oracle's
    CAST(... AS DOUBLE)/... bitwise."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    keys = np.asarray(part["p_partkey"])
    promo = np.zeros(int(keys.max()) + 1, dtype=bool)
    promo[keys[np.asarray(pc.equal(part["p_type"], "PROMO"))]] = True
    promo_ref = ray.put(promo)
    lo, hi = _ts(Q14_LO), _ts(Q14_HI)

    class Partial:
        def __init__(self):
            self.promo = ray.get(promo_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.greater_equal(b["l_shipdate"], lo), pc.less(b["l_shipdate"], hi)
            )
            b = b.filter(m)
            cents = np.asarray(_revenue_cents(b))
            is_promo = self.promo[np.asarray(b["l_partkey"])]
            return pa.table(
                {
                    "promo_cents": pa.array([int(cents[is_promo].sum())], pa.int64()),
                    "total_cents": pa.array([int(cents.sum())], pa.int64()),
                }
            )

    ds = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(Partial, batch_format="pyarrow", concurrency=(1, 8))
    agg = ds.sum(["promo_cents", "total_cents"])
    p, t = int(agg["sum(promo_cents)"]), int(agg["sum(total_cents)"])
    return pd.DataFrame(
        {
            "promo_cents": pd.array([p], dtype="int64"),
            "total_cents": pd.array([t], dtype="int64"),
            "promo_ratio": pd.array([float(p) / t if t else None], dtype="float64"),
        }
    )


def q_tpch_q17_small_qty(sf_dir: str) -> pd.DataFrame:
    """Small-quantity-order revenue (Q17 shape — the correlated-subquery
    pattern): revenue from one brand's lines whose quantity is below 20%
    of that part's average. The correlated AVG decorrelates into per-part
    (n, sum_qty) partials + ONE bucketed aggregate; the threshold
    predicate is the exact-int cross-multiplication
    ``5 * qty * n < sum_qty`` (no float average on either side), and the
    stats rejoin the brand's lines through ``hash_join`` — scale-safe
    when the brand spans millions of parts."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    bkeys = np.sort(
        np.asarray(part.filter(pc.equal(part["p_brand"], Q17_BRAND))["p_partkey"])
    )
    bk_ref = ray.put(bkeys)

    class BrandLines:
        def __init__(self):
            self.keys = ray.get(bk_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            pk = np.asarray(b["l_partkey"])
            if len(self.keys):
                idx = np.searchsorted(self.keys, pk)
                idx[idx == len(self.keys)] = 0
                b = b.filter(pa.array(self.keys[idx] == pk))
            else:
                b = b.slice(0, 0)
            return pa.table(
                {
                    "l_partkey": b["l_partkey"],
                    "qty": pc.cast(pc.floor(b["l_quantity"]), pa.int64()),
                    "price_cents": pc.cast(
                        pc.floor(pc.multiply(b["l_extendedprice"], pa.scalar(100.0))),
                        pa.int64(),
                    ),
                }
            )

    lines = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(BrandLines, batch_format="pyarrow", concurrency=(1, 8))

    def stat_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"l_partkey": b["l_partkey"], "sum_qty": b["qty"], "n": b["qty"]}
        )
        return (
            t.group_by(["l_partkey"])
            .aggregate([("sum_qty", "sum"), ("n", "count")])
            .rename_columns(["l_partkey", "sum_qty", "n"])
        )

    stats = bucketed_agg(
        lines.map_batches(stat_partial, batch_format="pyarrow"),
        "l_partkey",
        {"sum_qty": "sum", "n": "sum"},
    )
    joined = hash_join(lines, stats, on="l_partkey", how="inner")

    def below(b: pa.Table) -> pa.Table:
        m = pc.less(
            pc.multiply(pc.multiply(b["qty"], pa.scalar(5, pa.int64())), b["n"]),
            b["sum_qty"],
        )
        b = b.filter(m)
        return pa.table(
            {
                "n_lines": pa.array([b.num_rows], pa.int64()),
                "lost_cents": pa.array(
                    [int(np.asarray(b["price_cents"]).sum()) if b.num_rows else 0],
                    pa.int64(),
                ),
            }
        )

    agg = joined.map_batches(below, batch_format="pyarrow").sum(
        ["n_lines", "lost_cents"]
    )
    return pd.DataFrame(
        {
            "p_brand": [Q17_BRAND],
            "n_lines": pd.array([int(agg["sum(n_lines)"])], dtype="int64"),
            "lost_cents": pd.array([int(agg["sum(lost_cents)"])], dtype="int64"),
        }
    )


def q_tpch_q19_bands(sf_dir: str) -> pd.DataFrame:
    """Disjunctive band predicate (Q19 shape): revenue from three OR'd
    (brand, size-band, quantity-band) clauses. Part attributes broadcast
    as DENSE numpy arrays indexed by partkey (brand id int16 + size int8
    ~ 3 bytes/part); the whole disjunction evaluates as one vectorized
    mask per batch and only two int64 partials leave each batch."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand", "p_size"]
    )
    keys = np.asarray(part["p_partkey"])
    n = int(keys.max()) + 1
    brand_of = np.full(n, -1, dtype=np.int16)
    size_of = np.zeros(n, dtype=np.int16)
    brand_ids = {b: i for i, b in enumerate(sorted(set(part["p_brand"].to_pylist())))}
    brand_of[keys] = np.array(
        [brand_ids[b] for b in part["p_brand"].to_pylist()], dtype=np.int16
    )
    size_of[keys] = np.asarray(part["p_size"], dtype=np.int16)
    clauses = [
        (brand_ids.get(br, -2), slo, shi, qlo, qhi) for br, slo, shi, qlo, qhi in Q19_CLAUSES
    ]
    attrs_ref = ray.put((brand_of, size_of, clauses))

    class Bands:
        def __init__(self):
            self.brand_of, self.size_of, self.clauses = ray.get(attrs_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            pk = np.asarray(b["l_partkey"])
            qty = np.asarray(b["l_quantity"])
            br, sz = self.brand_of[pk], self.size_of[pk]
            m = np.zeros(len(pk), dtype=bool)
            for bid, slo, shi, qlo, qhi in self.clauses:
                m |= (br == bid) & (sz >= slo) & (sz <= shi) & (qty >= qlo) & (qty <= qhi)
            cents = np.asarray(_revenue_cents(b))[m]
            return pa.table(
                {
                    "n_lines": pa.array([int(m.sum())], pa.int64()),
                    "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
                }
            )

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(Bands, batch_format="pyarrow", concurrency=(1, 8))
    agg = ds.sum(["n_lines", "revenue_cents"])
    return pd.DataFrame(
        {
            "n_lines": pd.array([int(agg["sum(n_lines)"])], dtype="int64"),
            "revenue_cents": pd.array([int(agg["sum(revenue_cents)"])], dtype="int64"),
        }
    )


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
