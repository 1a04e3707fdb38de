"""Deterministic corpus mixing for training-data assembly.

``mix_corpora`` builds a training mixture from N source datasets, each
down-sampled to its configured fraction by MULTIPLICATIVE HASHING of
the id column (Knuth; reproducible across runs/processes, unlike RNG
state or builtin ``hash()``), tagged with its source name, and unioned.
No shuffle: sampling is a per-batch filter, the union is lazy block
concatenation - the mixture streams at full read bandwidth.

The fraction is enforced per id-hash, so re-running with a larger
fraction yields a SUPERSET of the earlier sample (nested samples -
useful for scaling-law subsets of one fixed corpus).

Reference parity: beyond-reference training-data operator (the
reference's record_type routing, lambdas/shared/schemas.py:25-38,
splits one stream into tables; mixing is the inverse - composing
tables into one weighted training stream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def knuth_hash32(ids: np.ndarray) -> np.ndarray:
    """32-bit multiplicative (Knuth) hash of an integer id array - THE
    deterministic hash every sampling op and its SQL oracle share
    (`(CAST(id AS HUGEINT) * 2654435761) % 4294967296` in DuckDB;
    identical for ids < 2^64 because 2^32 divides 2^64)."""
    return (ids.astype(np.uint64) * _KNUTH) % _M32


def hash_fraction_filter(frac: float, id_col: str):
    """Batch filter keeping rows whose 32-bit multiplicative key hash
    falls below floor(frac * 2^32) (exact integer threshold)."""
    thresh = np.uint64(int(frac * (1 << 32)))

    def fn(b: pa.Table) -> pa.Table:
        h = knuth_hash32(b[id_col].to_numpy(zero_copy_only=False))
        return b.filter(pa.array(h < thresh))

    return fn


def mix_corpora(
    sources: dict[str, tuple[rd.Dataset, float]],
    *,
    id_col: str,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Mixture of ``{source_name: (dataset, fraction)}``: each source is
    hash-sampled to its fraction, tagged with ``source``, and unioned.
    Pass ``columns`` to project every source to a shared schema first."""
    parts = []
    for name, (ds, frac) in sources.items():
        if columns is not None:
            ds = ds.select_columns(columns)

        def tag(b: pa.Table, _name=name) -> pa.Table:
            return b.append_column(
                "source", pa.array([_name] * len(b), pa.string())
            )

        sampled = ds.map_batches(
            hash_fraction_filter(frac, id_col), batch_format="pyarrow"
        ).map_batches(tag, batch_format="pyarrow")
        parts.append(sampled)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def select_by_token_budget(
    ds: rd.Dataset,
    budget: int,
    *,
    score_col: str,
    token_col: str,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Greedy corpus selection under a global token budget: take docs
    in ``(score DESC, id ASC)`` order while the running token sum stays
    <= ``budget`` (the data-mixing primitive "best docs first until the
    budget is spent"; SQL: window cumsum over that order).

    Distributed exact prefix sum, two passes over the SORTED stream:
    pass 1 computes one (token_sum, key_range) row per block — the
    driver sees B tiny rows, never docs — and prefix-sums them to a
    per-block offset; pass 2 re-reads only the blocks whose offset
    still fits the budget (later blocks are skipped entirely, the
    prefix-sum analogue of partition pruning) and applies the exact
    local cumsum cut. Block order is verified against each block's key
    range (defense against an exchange that stopped preserving sort
    order).
    """
    import ray

    sorted_ds = ds.sort([score_col, id_col], descending=[True, False])

    def _as_arrow(tbl) -> pa.Table:
        # blocks arrive as Arrow or pandas depending on the source
        return tbl if isinstance(tbl, pa.Table) else pa.Table.from_pandas(tbl)

    @ray.remote
    def block_stat(tbl):
        tbl = _as_arrow(tbl)
        if len(tbl) == 0:
            return {"tokens": 0, "first": None, "last": None, "n": 0}
        s = tbl[score_col].to_numpy(zero_copy_only=False)
        i = tbl[id_col].to_numpy(zero_copy_only=False)
        return {
            "tokens": int(tbl[token_col].to_numpy(zero_copy_only=False).sum()),
            "first": (float(s[0]), int(i[0])),
            "last": (float(s[-1]), int(i[-1])),
            "n": len(tbl),
        }

    @ray.remote
    def cut_block(tbl, offset: int):
        tbl = _as_arrow(tbl)
        toks = tbl[token_col].to_numpy(zero_copy_only=False)
        keep = offset + np.cumsum(toks, dtype=np.int64) <= budget
        return tbl.filter(pa.array(keep))

    block_refs = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    stats = ray.get([block_stat.remote(r) for r in block_refs])

    prev_last = None
    for st in stats:
        if st["n"] == 0:
            continue
        key = (-st["first"][0], st["first"][1])
        assert prev_last is None or key >= prev_last, (
            "blocks no longer sorted; sort-order contract broken"
        )
        prev_last = (-st["last"][0], st["last"][1])

    out_refs, offset = [], 0
    for ref, st in zip(block_refs, stats):
        if st["n"] == 0 or offset > budget:
            continue  # later blocks pruned: offset only grows
        out_refs.append(cut_block.remote(ref, offset))
        offset += st["tokens"]

    if not out_refs:
        return rd.from_arrow(ds.schema().base_schema.empty_table())
    # blocks stay in the object store (selected rows never concat on
    # the driver — a large budget selects a large corpus)
    return rd.from_arrow_refs(out_refs)


def shuffle_shards(
    ds: rd.Dataset,
    *,
    id_col: str,
    num_shards: int,
    seed: int = 0,
) -> rd.Dataset:
    """Deterministic global example shuffle into training shards - the
    last step before a corpus ships to a trainer. Each row goes to
    shard ``h(id, seed) % num_shards`` and gets a 0-based ``pos``
    within its shard ordered by ``(h, id)``; the induced global order
    ``(shard, pos)`` is a reproducible pseudo-random permutation of
    the corpus (same input + seed => byte-identical shards, unlike
    ``random_shuffle``), so a killed export can re-emit any single
    shard without touching the rest.

    Cost shape: assigning shards is a per-batch hash (no driver, no
    sampling pass); the ONE exchange is the groupby that co-locates
    each shard, and within-shard order is a vectorized sort of one
    shard's rows. ``num_shards`` should scale with the corpus so a
    shard fits a worker (the documented partitioning assumption).

    The seed folds in by hashing ``id + seed`` (seed shifts the id
    space; any seed-dependent permutation would break the SQL mirror:
    ``(CAST(id + seed AS HUGEINT) * 2654435761) % 4294967296``)."""
    s = np.int64(seed)

    def assign(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        h = knuth_hash32((ids.astype(np.int64) + s).astype(np.uint64))
        return b.append_column(
            "shard", pa.array((h % np.uint64(num_shards)).astype(np.int64))
        ).append_column("_h", pa.array(h.astype(np.int64)))

    import pandas as pd

    def order(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col], kind="mergesort").drop(columns="_h")
        g["pos"] = np.arange(len(g), dtype=np.int64)
        return g

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(order, batch_format="pandas")
    )


def temperature_fractions(
    sizes: dict[str, int], *, alpha: float = 0.5, target_rows: int | None = None
) -> dict[str, float]:
    """Temperature-weighted sampling fractions for a corpus mixture:
    source i is sampled with probability mass proportional to
    ``n_i ** alpha`` (alpha<1 up-weights small sources, the multilingual
    /domain-balance trick; alpha=1 is proportional (no reweighting),
    alpha=0 is uniform across sources). Returns per-source FRACTIONS of
    that source to keep so the mixture hits ``target_rows`` total
    (default: the largest feasible mixture with every fraction <= 1).

    Pure integer/float driver math over one count per source - the
    caller feeds the result to ``mix_corpora``, which does the hashed
    sampling with no shuffle."""
    if not sizes:
        return {}
    names = sorted(sizes)
    n = np.array([max(int(sizes[s]), 0) for s in names], dtype=np.float64)
    w = np.where(n > 0, n**alpha, 0.0)
    if w.sum() == 0:
        return {s: 0.0 for s in names}
    p = w / w.sum()  # mixture shares
    if target_rows is None:
        # scale up until the most-demanded source is fully used:
        # rows_i = T * p_i <= n_i  =>  T = min(n_i / p_i)
        with np.errstate(divide="ignore"):
            T = np.min(np.where(p > 0, n / np.maximum(p, 1e-300), np.inf))
    else:
        T = float(target_rows)
    frac = np.clip(np.where(n > 0, (T * p) / np.maximum(n, 1), 0.0), 0.0, 1.0)
    return {s: float(f) for s, f in zip(names, frac)}


def mix_corpora_temperature(
    sources: dict[str, rd.Dataset],
    *,
    id_col: str,
    alpha: float = 0.5,
    target_rows: int | None = None,
    columns: list[str] | None = None,
) -> tuple[rd.Dataset, dict[str, float]]:
    """Temperature mixing end-to-end: count each source (cheap metadata
    count when available), derive ``n**alpha`` fractions, hash-sample +
    tag + union via ``mix_corpora`` (no shuffle anywhere). Returns
    (mixture, fractions) so the recipe is reproducible/loggable."""
    sizes = {name: ds.count() for name, ds in sources.items()}
    fracs = temperature_fractions(sizes, alpha=alpha, target_rows=target_rows)
    mixture = mix_corpora(
        {name: (ds, fracs[name]) for name, ds in sources.items()},
        id_col=id_col,
        columns=columns,
    )
    return mixture, fracs


def sample_per_group(
    ds: "rd.Dataset",
    *,
    group_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
    out_cols: list[str] | None = None,
):
    """Deterministic exact-n sample per group (eval-set construction:
    "n examples from every stratum"): rows rank by the shared Knuth
    hash of ``id + seed`` within their group and the first n survive.
    Rides ``topk_per_group``'s pre-shuffle prune — each block forwards
    at most n rows per group it holds, so the shuffle carries
    O(n × groups × blocks-touching-group), never the corpus. Returns a
    DataFrame (group, rank, out_cols); same-seed runs are identical,
    different seeds draw different samples, and the SQL mirror is
    ``row_number() OVER (PARTITION BY group ORDER BY hash, id)``."""
    import pandas as pd

    from .aggregates import topk_per_group

    s = np.int64(seed)

    def add_h(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        h = knuth_hash32((ids.astype(np.int64) + s).astype(np.uint64))
        # topk_per_group orders DESC; negate so the SMALLEST hash wins
        b["_nh"] = -h.astype(np.int64)
        return b

    out = topk_per_group(
        ds.map_batches(add_h, batch_format="pandas"),
        group_col=group_col,
        order_col="_nh",
        tiebreak_col=id_col,
        k=n,
        out_cols=out_cols or [id_col],
    )
    return out.drop(columns=["_nh"], errors="ignore")


def weighted_sample(
    ds: "rd.Dataset",
    *,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    out_cols: list[str] | None = None,
):
    """Deterministic weighted sampling without replacement (Efraimidis
    & Spirakis, IPL 2006): each row draws a reproducible uniform from
    the shared Knuth hash of ``id + seed`` and ranks by
    ``ln(u) / w`` descending — the top k form an exact weighted
    sample (P(first pick = i) = w_i / Σw). The up-weight-the-long-docs
    / importance-sampling primitive for corpus mixing.

    Integer weights clamp to ≥ 1 both here and in the SQL mirror.
    Scale shape: the rank key is map-side; each block pre-prunes to
    its local top-k, so the final exact top-k sort sees ≤ k rows per
    block, never the corpus. ``ln(u)/w`` is one correctly-rounded ln
    plus one division of exact inputs — a cross-libm last-ulp
    divergence could only flip membership at the k-th boundary between
    two near-identical keys (measure-zero for hash-derived uniforms).
    Returns a DataFrame (id, weight, key_q) with
    key_q = floor(ln(u)/w · 2^30)."""
    import pandas as pd

    s = np.int64(seed)

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        h = knuth_hash32((ids.astype(np.int64) + s).astype(np.uint64))
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        w = np.maximum(b[weight_col].to_numpy(dtype=np.float64), 1.0)
        b = b.copy()
        b["_wk"] = np.log(u) / w
        # local prune: only each block's top-k can reach the global top-k
        b = b.sort_values(["_wk", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        return b

    cols = [id_col, weight_col] + [
        c for c in (out_cols or []) if c not in (id_col, weight_col)
    ]
    out = (
        ds.map_batches(add_key, batch_format="pandas")
        .sort(["_wk", id_col], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["key_q"] = np.floor(
        out["_wk"].to_numpy(dtype=np.float64) * 1073741824.0
    ).astype("int64")
    return out[cols + ["key_q"]].reset_index(drop=True)


def negative_samples(
    ds: "rd.Dataset",
    *,
    id_col: str,
    m: int,
    seed: int = 0,
):
    """Deterministic contrastive negative sampling: each anchor row
    draws ``m`` pseudo-random corpus ids via the shared Knuth hash of
    ``id·m + j + seed`` mapped onto the rank-ordered id list — the
    (anchor, negative) pair generator for contrastive / triplet
    training data. Same-seed runs are bitwise identical; the SQL
    mirror is the identical hash joined to ``row_number() − 1`` ranks.

    Scale shape: the sorted id array is collected once (8 bytes/id —
    fine to ~10^8 ids; beyond that swap the rank lookup for a
    hash-bucketed rank join) and broadcast via ``ray.put``, read once
    per actor; sampling is a vectorized repeat + gather per batch. A
    negative can collide with its own anchor with probability 1/N —
    standard practice is to keep it (loss masks it) rather than
    re-draw, which would break the fixed hash↔rank SQL mirror.
    Returns a Dataset (id, j, neg_id) with m rows per anchor."""
    import pandas as pd
    import ray

    try:
        # an EMPTY Dataset's to_pandas loses its schema -> KeyError
        ids_sorted = np.sort(
            ds.select_columns([id_col]).to_pandas()[id_col].to_numpy()
        )
    except KeyError:
        ids_sorted = np.array([], dtype=np.int64)
    n = len(ids_sorted)
    if n == 0:
        raise ValueError("negative_samples: empty corpus")
    ids_ref = ray.put(ids_sorted)
    mm = np.int64(m)
    s = np.int64(seed)

    class Draw:
        def __init__(self):
            self.ids = ray.get(ids_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            anchors = b[id_col].to_numpy()
            rep = np.repeat(anchors, m)
            j = np.tile(np.arange(m, dtype=np.int64), len(anchors))
            h = knuth_hash32(
                (rep.astype(np.int64) * mm + j + s).astype(np.uint64)
            )
            r = (h % np.uint64(n)).astype(np.int64)
            return pd.DataFrame(
                {id_col: rep, "j": j, "neg_id": self.ids[r]}
            )

    return ds.map_batches(
        Draw, batch_format="pandas", concurrency=(1, 8), num_cpus=1
    )
