"""Distributed link-graph analysis: PageRank over an edge list.

Web-corpus curation ranks domains/pages by link authority (the
quality prior Common-Crawl-derived pipelines use alongside text
quality scores). The scale shape here is the classic one:

* The EDGE LIST is the big data; it never concentrates. Each power
  iteration is (1) a bucketed ``hash_join`` of current ranks onto the
  edges by source (one tagged-union shuffle), (2) a per-(block, dst)
  partial sum inside ``map_batches``, (3) one groupby-sum over
  destinations — so the exchange carries per-(block, dst) partials,
  not per-edge contributions.
* Ranks are node-sized Datasets; dangling mass and the convergence
  delta are two scalar aggregates per iteration.

Deterministic for a fixed iteration count up to float summation order;
the pytest checks parity with a single-process reference at 1e-9.

Related: ``dedup_clusters`` (functions/dedup.py) is the min-label
propagation sibling over the same edge-list representation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .windows import _buckets_for_cluster, bucketed_agg, bucketed_distinct

#: Above this node count the iterative algorithms keep their node state
#: (ranks / labels / visited) as keyed DATASETS joined per iteration
#: instead of driver pandas frames - the swap documented since round 1.
#: Below it, driver residency is the faster constant (domain graphs:
#: the state is megabytes; per-iteration Dataset materialization would
#: dominate). Override per call with ``node_state=``.
DATASET_STATE_THRESHOLD = 2_000_000


def _clamp_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Materialize with a bounded block count: coalesce (shuffle=False,
    a local merge, not an exchange) to ~4 blocks/CPU or ~128MB blocks,
    whichever gives MORE blocks. Iterative Dataset-state algorithms
    compound block counts otherwise: every tagged-union join/sort emits
    ~(left+right) blocks, so state blocks grow geometrically per
    iteration and the next sort's split count (input blocks x output
    blocks) explodes — measured 272s for ONE 200k-node rebuild at 1285
    uncoalesced blocks vs ~4s clamped. The byte floor keeps the clamp
    honest for edge-scale datasets (cluster-proportional via
    ``_buckets_for_cluster``; 128MB is Ray's default target block)."""
    m = ds.materialize()
    target = max(2 * _buckets_for_cluster(), m.size_bytes() // (128 << 20))
    if m.num_blocks() > 1.5 * target:
        m = m.repartition(int(target), shuffle=False).materialize()
    return m


def _resolve_state(node_state: str, n: int) -> str:
    if node_state == "auto":
        return "dataset" if n > DATASET_STATE_THRESHOLD else "driver"
    assert node_state in ("driver", "dataset"), node_state
    return node_state


def _degrees(edges: rd.Dataset, src: str) -> rd.Dataset:
    """Out-degree per source: per-block value_counts partials, one
    groupby-sum — the shuffle carries distinct sources per block."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[src].value_counts()
        return pd.DataFrame(
            {"node": vc.index.to_numpy(), "deg": vc.to_numpy(np.int64)}
        )

    return bucketed_agg(
        edges.map_batches(partial, batch_format="pandas"),
        "node", {"deg": "sum"},
    )


def pagerank(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    num_buckets: int | None = None,
    personalization: list | None = None,
    node_state: str = "auto",
) -> pd.DataFrame:
    """PageRank by power iteration over an (src, dst) edge Dataset.
    Returns a DataFrame (node, rank) over every node that appears as a
    source or destination; ranks sum to 1 (dangling mass redistributed
    uniformly each iteration, the standard treatment).

    ``personalization``: optional seed-node list — teleport (and
    dangling) mass goes uniformly to the SEEDS instead of all nodes
    (personalized PageRank, the "rank relative to trusted sites" /
    TrustRank-style curation prior). Seeds must exist in the graph.

    Each iteration costs two bucketed shuffles (rank→edge join, dst
    partial-sum combine). ``node_state``: where the node-sized rank
    state lives between iterations - ``"driver"`` (pandas frame; the
    faster constant for domain-scale graphs) or ``"dataset"`` (ranks
    stay a keyed Dataset joined per iteration; nothing node-sized ever
    concentrates on the driver until the final collect, the page-scale
    path). ``"auto"`` switches on ``DATASET_STATE_THRESHOLD`` nodes.
    For a Dataset result (no final collect at all), use
    ``pagerank_dataset``.
    """
    from .joins import hash_join

    def nodes_of(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.unique(np.concatenate([b[src].to_numpy(), b[dst].to_numpy()]))}
        )

    nodes_ds = bucketed_distinct(
        edges.map_batches(nodes_of, batch_format="pandas"), "node"
    ).materialize()
    n = nodes_ds.count()
    if n == 0:
        return pd.DataFrame({"node": [], "rank": []})
    if _resolve_state(node_state, n) == "dataset":
        out = pagerank_dataset(
            edges, src=src, dst=dst, damping=damping,
            iterations=iterations, num_buckets=num_buckets,
            personalization=personalization,
            _nodes_ds=nodes_ds, _n=n,
        ).to_pandas()
        return out.sort_values("node").reset_index(drop=True)

    deg = _degrees(edges, src).to_pandas()
    deg["node"] = deg["node"].astype(np.int64)
    nodes = (
        nodes_ds.to_pandas()["node"].astype(np.int64).sort_values().to_numpy()
    )

    if personalization is not None:
        seeds = np.array(sorted(set(int(s) for s in personalization)),
                         dtype=np.int64)
        missing = np.setdiff1d(seeds, nodes)
        if len(missing):
            raise ValueError(f"personalization seeds not in graph: {missing[:5]}")
        tele = np.isin(nodes, seeds).astype(np.float64)
        tele = tele / tele.sum()
    else:
        tele = np.full(n, 1.0 / n)
    ranks = pd.DataFrame({"node": nodes, "rank": tele.copy()})
    deg_map = ranks.merge(deg, on="node", how="left").fillna({"deg": 0})
    dangling_nodes = deg_map.loc[deg_map["deg"] == 0, "node"].to_numpy()

    # The edge list is reused every iteration; materialize the renamed
    # projection ONCE so each power step re-shuffles cached blocks
    # instead of re-reading + re-mapping the source (lazy Datasets
    # re-execute their whole lineage per consumption).
    ed = edges.map_batches(
        lambda b: b.rename(columns={src: "node"})[["node", dst]],
        batch_format="pandas",
    ).materialize()

    for _ in range(iterations):
        # rank mass each source spreads per out-edge
        contrib = ranks.merge(deg, on="node", how="inner")
        contrib = pd.DataFrame(
            {
                "node": contrib["node"],
                "w": contrib["rank"].to_numpy() / contrib["deg"].to_numpy(),
            }
        )
        ranks_ds = rd.from_pandas(contrib)
        joined = hash_join(ed, ranks_ds, on="node", num_buckets=num_buckets)

        def dst_partials(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(dst, sort=False)["w"].sum()
            return pd.DataFrame({"node": g.index.to_numpy(), "m": g.to_numpy()})

        sums = bucketed_agg(
            joined.map_batches(dst_partials, batch_format="pandas"),
            "node", {"m": "sum"},
        ).to_pandas()
        sums["node"] = sums["node"].astype(np.int64)

        dangling = float(
            ranks.loc[ranks["node"].isin(dangling_nodes), "rank"].sum()
        )
        base = (1.0 - damping) * tele + damping * dangling * tele
        nr = ranks[["node"]].merge(sums, on="node", how="left").fillna({"m": 0.0})
        ranks = pd.DataFrame(
            {"node": nr["node"], "rank": base + damping * nr["m"].to_numpy()}
        )
    return ranks.sort_values("node").reset_index(drop=True)


def pagerank_dataset(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    num_buckets: int | None = None,
    personalization: list | None = None,
    _nodes_ds: rd.Dataset | None = None,
    _n: int | None = None,
) -> rd.Dataset:
    """Page-scale PageRank: the rank state is a keyed Dataset joined
    per iteration - NOTHING node-sized touches the driver (the only
    driver scalars are the node count and the per-iteration dangling
    mass). Returns a (node, rank) Dataset; consume with write_parquet
    or further joins at 10^10-page scale.

    Per iteration: one bucketed join of (node, deg, rank) state onto
    the materialized edge projection, per-(block, dst) partial sums,
    one groupby-sum, one state-rebuild join - the same exchange volume
    as the driver-state path, plus a node-sized Dataset materialization
    that replaces the driver frame."""
    import ray

    from .joins import hash_join

    def nodes_of(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.unique(np.concatenate([b[src].to_numpy(), b[dst].to_numpy()]))}
        )

    nodes_ds = _nodes_ds
    if nodes_ds is None:
        nodes_ds = _clamp_blocks(bucketed_distinct(
            edges.map_batches(nodes_of, batch_format="pandas"), "node"
        ))
    n = _n if _n is not None else nodes_ds.count()
    if n == 0:
        return rd.from_pandas(pd.DataFrame({"node": [], "rank": []}))

    if personalization is not None:
        seeds = np.array(sorted(set(int(s) for s in personalization)), dtype=np.int64)
        seeds_ref = ray.put(seeds)
        n_seeds = len(seeds)
        in_graph = (
            nodes_ds.map_batches(
                lambda b, r=seeds_ref: pd.DataFrame(
                    {"_hit": [int(b["node"].isin(ray.get(r)).sum())]}
                ),
                batch_format="pandas",
            ).sum("_hit")
        )
        if in_graph != n_seeds:
            raise ValueError("personalization seeds not in graph")

        def tele_of(node_col: pd.Series) -> np.ndarray:
            return node_col.isin(ray.get(seeds_ref)).to_numpy() / n_seeds
    else:
        def tele_of(node_col: pd.Series) -> np.ndarray:
            return np.full(len(node_col), 1.0 / n)

    # state = (node, deg, rank); deg null/0 marks dangling nodes
    deg_ds = _degrees(edges, src)
    state = _clamp_blocks(hash_join(
        nodes_ds, deg_ds, on="node", how="left", num_buckets=num_buckets,
        coalesce=True,
    ).map_batches(
        lambda b: b.assign(
            deg=b["deg"].fillna(0).astype(np.int64),
            rank=tele_of(b["node"]),
        ),
        batch_format="pandas",
    ))

    ed = _clamp_blocks(edges.map_batches(
        lambda b: b.rename(columns={src: "node"})[["node", dst]],
        batch_format="pandas",
    ))
    # size-aware pre-sort coalesce target for the edge join (ed bytes
    # dominate; contrib is node-sized)
    ed_co = max(
        2 * _buckets_for_cluster(),
        (ed.size_bytes() + state.size_bytes()) // (128 << 20),
    )

    for _ in range(iterations):
        dangling = state.map_batches(
            lambda b: pd.DataFrame(
                {"_d": [float(b.loc[b["deg"] == 0, "rank"].sum())]}
            ),
            batch_format="pandas",
        ).sum("_d")

        contrib = state.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b.loc[b["deg"] > 0, "node"],
                    "w": b.loc[b["deg"] > 0, "rank"].to_numpy()
                    / b.loc[b["deg"] > 0, "deg"].to_numpy(),
                }
            ),
            batch_format="pandas",
        )
        joined = hash_join(
            ed, contrib, on="node", num_buckets=num_buckets, coalesce=ed_co
        )

        def dst_partials(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(dst, sort=False)["w"].sum()
            return pd.DataFrame({"node": g.index.to_numpy(), "m": g.to_numpy()})

        sums = bucketed_agg(
            joined.map_batches(dst_partials, batch_format="pandas"),
            "node", {"m": "sum"},
        )

        def rebuild(b: pd.DataFrame, d=dangling) -> pd.DataFrame:
            tele = tele_of(b["node"])
            base = (1.0 - damping) * tele + damping * d * tele
            m = b["m"].fillna(0.0).to_numpy()
            return pd.DataFrame(
                {
                    "node": b["node"],
                    "deg": b["deg"],
                    "rank": base + damping * m,
                }
            )

        state = _clamp_blocks(
            hash_join(
                state.drop_columns(["rank"]), sums,
                on="node", how="left", num_buckets=num_buckets,
                coalesce=True,
            )
            .map_batches(rebuild, batch_format="pandas")
        )

    return state.map_batches(
        lambda b: b[["node", "rank"]], batch_format="pandas"
    )


def _spread(
    prepared: rd.Dataset,
    weights: pd.DataFrame,
    out_key: str,
    num_buckets: int | None,
) -> pd.DataFrame:
    """One HITS half-step: join driver-resident ``weights``
    (node, w) onto the prepared edge projection (node, <out_key>) by
    ``node``, partial-sum per (block, out_key), one groupby-sum. The
    exchange carries per-block partials keyed by distinct targets."""
    from .joins import hash_join

    joined = hash_join(
        prepared, rd.from_pandas(weights), on="node", num_buckets=num_buckets
    )

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(out_key, sort=False)["w"].sum()
        return pd.DataFrame({"node": g.index.to_numpy(), "m": g.to_numpy()})

    out = bucketed_agg(
        joined.map_batches(partials, batch_format="pandas"),
        "node", {"m": "sum"},
    ).to_pandas()
    out["node"] = out["node"].astype(np.int64)
    return out


def hits(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    num_buckets: int | None = None,
    node_state: str = "auto",
) -> pd.DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) by power iteration
    over an (src, dst) edge Dataset. Returns (node, hub, authority),
    each vector L2-normalized, over every node in the graph.

    Per iteration: authority(d) = Σ hub(s) over in-edges, then
    hub(s) = Σ authority(d) over out-edges — two bucketed-join +
    partial-sum exchanges; the edge list is materialized once per
    orientation and re-shuffled from cache. ``node_state`` as in
    ``pagerank``: score frames on the driver (domain scale) or as
    keyed Datasets joined per iteration with only the L2-norm scalars
    reaching the driver (page scale).
    """
    def project(a: str, b: str):
        return (
            edges.map_batches(
                lambda t, a=a, b=b: t.rename(columns={a: "node"})[["node", b]],
                batch_format="pandas",
            ).materialize()
        )

    ed_by_src = project(src, dst)   # (node=src, dst): spreads hub -> authority
    ed_by_dst = project(dst, src)   # (node=dst, src): spreads authority -> hub

    def nodes_of(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.unique(np.concatenate([b[src].to_numpy(), b[dst].to_numpy()]))}
        )

    nodes_ds = bucketed_distinct(
        edges.map_batches(nodes_of, batch_format="pandas"), "node"
    ).materialize()
    n = nodes_ds.count()
    if n == 0:
        return pd.DataFrame({"node": [], "hub": [], "authority": []})
    if _resolve_state(node_state, n) == "dataset":
        return _hits_ds(nodes_ds, ed_by_src, ed_by_dst, src, dst,
                        iterations, num_buckets)

    nodes = (
        nodes_ds.to_pandas()["node"].astype(np.int64).sort_values().to_numpy()
    )
    base = pd.DataFrame({"node": nodes})
    hub = pd.DataFrame({"node": nodes, "w": np.full(n, 1.0)})
    auth = pd.DataFrame({"node": nodes, "w": np.full(n, 1.0)})

    def l2(frame: pd.DataFrame, sums: pd.DataFrame) -> pd.DataFrame:
        m = base.merge(sums, on="node", how="left").fillna({"m": 0.0})
        v = m["m"].to_numpy()
        norm = float(np.sqrt((v * v).sum()))
        return pd.DataFrame({"node": m["node"], "w": v / norm if norm else v})

    for _ in range(iterations):
        auth = l2(base, _spread(ed_by_src, hub, dst, num_buckets))
        hub = l2(base, _spread(ed_by_dst, auth, src, num_buckets))

    out = pd.DataFrame(
        {"node": base["node"], "hub": hub["w"], "authority": auth["w"]}
    )
    return out.sort_values("node").reset_index(drop=True)


def _hits_ds(
    nodes_ds: rd.Dataset,
    ed_by_src: rd.Dataset,
    ed_by_dst: rd.Dataset,
    src: str,
    dst: str,
    iterations: int,
    num_buckets: int | None,
) -> pd.DataFrame:
    """Page-scale HITS: hub/authority live as keyed Datasets; per
    half-step one bucketed join + per-target partial-sum exchange, one
    L2-norm scalar, one normalize-and-rebuild join against the node
    universe. Only the norms reach the driver between iterations."""
    from .joins import hash_join

    def unit(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["node"], "w": np.ones(len(b))})

    nodes_ds = _clamp_blocks(nodes_ds)
    ed_by_src = _clamp_blocks(ed_by_src)
    ed_by_dst = _clamp_blocks(ed_by_dst)
    ed_co = max(2 * _buckets_for_cluster(),
                ed_by_src.size_bytes() // (128 << 20))
    hub = _clamp_blocks(nodes_ds.map_batches(unit, batch_format="pandas"))
    auth = hub

    def spread_ds(prepared: rd.Dataset, weights: rd.Dataset, out_key: str):
        joined = hash_join(prepared, weights, on="node",
                           num_buckets=num_buckets, coalesce=ed_co)

        def partials(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(out_key, sort=False)["w"].sum()
            return pd.DataFrame({"node": g.index.to_numpy(), "m": g.to_numpy()})

        return bucketed_agg(
            joined.map_batches(partials, batch_format="pandas"),
            "node", {"m": "sum"},
        ).materialize()

    def l2_ds(sums: rd.Dataset) -> rd.Dataset:
        sq = sums.map_batches(
            lambda b: pd.DataFrame({"_s": [float((b["m"] ** 2).sum())]}),
            batch_format="pandas",
        ).sum("_s")
        norm = float(np.sqrt(sq)) if sq else 0.0

        def rebuild(b: pd.DataFrame) -> pd.DataFrame:
            v = b["m"].fillna(0.0).to_numpy()
            return pd.DataFrame(
                {"node": b["node"], "w": v / norm if norm else v}
            )

        return _clamp_blocks(
            hash_join(nodes_ds, sums, on="node", how="left",
                      num_buckets=num_buckets, coalesce=True)
            .map_batches(rebuild, batch_format="pandas")
        )

    for _ in range(iterations):
        auth = l2_ds(spread_ds(ed_by_src, hub, dst))
        hub = l2_ds(spread_ds(ed_by_dst, auth, src))

    out = (
        hub.map_batches(
            lambda b: b.rename(columns={"w": "hub"}), batch_format="pandas"
        ).to_pandas()
        .merge(
            auth.map_batches(
                lambda b: b.rename(columns={"w": "authority"}),
                batch_format="pandas",
            ).to_pandas(),
            on="node",
        )
    )
    return out.sort_values("node").reset_index(drop=True)


def triangle_count(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int | None = None,
) -> int:
    """Exact triangle count of the undirected simple graph induced by
    an edge list — the clustering-coefficient / community-density
    signal for link-graph curation.

    The compact-forward recipe (Latapy 2008; MapReduce form: Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11):
      1. normalize to undirected distinct edges (one groupby over
         locally-deduped (a<b) pairs);
      2. total-order nodes by (degree, id) and orient every edge
         low → high — each triangle survives as exactly ONE wedge
         whose center is its lowest-ordered corner, and oriented
         out-degrees are bounded ~√(2m), taming the wedge explosion;
      3. wedges per center via one center-bucketed self-merge;
      4. ONE bucketed join of wedges against the oriented edges
         closes them.
    The degree table is node-sized and ships as a broadcast map
    (swap for a hash_join at >10^8 nodes); exchanges carry distinct
    edges, then wedges — never raw duplicate edges."""
    import ray

    from .joins import hash_join
    from .windows import _buckets_for_cluster, _key_buckets

    nb = num_buckets or _buckets_for_cluster()

    def normalize(b: pd.DataFrame) -> pd.DataFrame:
        a = b[src].to_numpy()
        c = b[dst].to_numpy()
        lo, hi = np.minimum(a, c), np.maximum(a, c)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[out["a"] != out["b"]].drop_duplicates()

    und = bucketed_distinct(
        edges.map_batches(normalize, batch_format="pandas"), ["a", "b"]
    ).materialize()  # reused: degrees, orientation, closing join

    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = pd.concat([b["a"], b["b"]]).value_counts()
        return pd.DataFrame(
            {"node": vc.index.to_numpy(), "deg": vc.to_numpy(np.int64)}
        )

    deg = bucketed_agg(
        und.map_batches(deg_partial, batch_format="pandas"),
        "node", {"deg": "sum"},
    ).to_pandas()
    deg_ref = ray.put(dict(zip(deg["node"], deg["deg"].astype(np.int64))))

    class Orient:
        """(a, b) -> (u, v) with u strictly before v in (deg, id)."""

        def __init__(self):
            self.deg = ray.get(deg_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            da = b["a"].map(self.deg).to_numpy(np.int64)
            db = b["b"].map(self.deg).to_numpy(np.int64)
            av, bv = b["a"].to_numpy(), b["b"].to_numpy()
            a_first = (da < db) | ((da == db) & (av < bv))
            return pd.DataFrame(
                {
                    "u": np.where(a_first, av, bv),
                    "v": np.where(a_first, bv, av),
                }
            )

    oriented = und.map_batches(
        Orient, batch_format="pandas", concurrency=(1, 8), num_cpus=1
    ).materialize()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_tb"] = _key_buckets(b["u"], nb)
        return b

    def wedge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all ordered out-neighbor pairs per center: one self-merge
        # per bucket; pair order reuses the same (deg, id) total
        # order. ray.get of the broadcast map is an object-store
        # pointer lookup, once per group call.
        degmap = ray.get(deg_ref)
        g = g.drop(columns="_tb")
        m = g.merge(g, on="u", suffixes=("_1", "_2"))
        d1 = m["v_1"].map(degmap).to_numpy(np.int64)
        d2 = m["v_2"].map(degmap).to_numpy(np.int64)
        first = (d1 < d2) | (
            (d1 == d2) & (m["v_1"].to_numpy() < m["v_2"].to_numpy())
        )
        m = m[first]
        return pd.DataFrame({"u": m["v_1"], "v": m["v_2"]})

    wedges = (
        oriented.map_batches(add_bucket, batch_format="pandas")
        .groupby("_tb")
        .map_groups(wedge_bucket, batch_format="pandas")
    )
    closed = hash_join(wedges, oriented, on=["u", "v"], how="semi")
    return closed.count()


def label_propagation(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 5,
    node_state: str = "auto",
) -> pd.DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) with a deterministic min-label tiebreak: labels start
    as node ids; each round every node adopts the most frequent label
    among its neighbors (ties -> smallest label). Synchronous updates
    + deterministic ties make the result reproducible (the async
    variant is run-order dependent); a fixed round budget bounds the
    oscillation the synchronous variant can exhibit on bipartite
    structures.

    Scale shape per round: ONE bucketed hash_join of the node-sized
    label table onto the symmetrized edge list, per-batch partial
    (node, label) counts, one groupby-sum, then the grouped-mode
    argmax (sort + drop_duplicates per bucket) — the exchange carries
    label-count partials, never raw edges twice. ``node_state`` as in
    ``pagerank``: labels live as driver frames (domain scale) or as a
    keyed Dataset joined per round (page scale; only the changed-label
    count reaches the driver). Returns (node, label)."""
    from .joins import hash_join

    def sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b[src].to_numpy()
        c = b[dst].to_numpy()
        keep = a != c
        return pd.DataFrame(
            {
                "u": np.concatenate([a[keep], c[keep]]),
                "v": np.concatenate([c[keep], a[keep]]),
            }
        ).drop_duplicates()


    und = bucketed_distinct(
        edges.map_batches(sym, batch_format="pandas"), ["u", "v"]
    ).materialize()

    nodes_ds = bucketed_distinct(und, "u").materialize()
    n = nodes_ds.count()
    if _resolve_state(node_state, n) == "dataset":
        return _label_propagation_ds(und, nodes_ds, rounds, hash_join)

    nodes = nodes_ds.to_pandas()
    labels = pd.DataFrame(
        {"u": nodes["u"], "label": nodes["u"].astype(np.int64)}
    )

    for _ in range(rounds):
        # neighbor labels: edge (u, v) contributes label(v) to u
        lab_ds = rd.from_pandas(labels.rename(columns={"u": "v"}))
        contrib = hash_join(und, lab_ds, on="v", how="inner")

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            return (
                b.groupby(["u", "label"], sort=False)
                .size()
                .reset_index(name="n")
            )

        counts = bucketed_agg(
            contrib.map_batches(partial, batch_format="pandas"),
            ["u", "label"], {"n": "sum"},
        ).to_pandas()
        counts = counts.sort_values(
            ["u", "n", "label"], ascending=[True, False, True],
            kind="mergesort",
        )
        new = counts.drop_duplicates("u")[["u", "label"]].reset_index(
            drop=True
        )
        new["label"] = new["label"].astype(np.int64)
        if new.sort_values("u")["label"].tolist() == labels.sort_values(
            "u"
        )["label"].tolist():
            labels = new
            break
        labels = new

    out = labels.rename(columns={"u": "node"}).sort_values("node")
    return out.reset_index(drop=True)


def _label_propagation_ds(
    und: rd.Dataset, nodes_ds: rd.Dataset, rounds: int, hash_join
) -> pd.DataFrame:
    """Page-scale LPA rounds: the label frame is a keyed Dataset; per
    round one label→edge join, (node, label) count partials, one
    groupby-sum, and a bucketed vectorized argmax (sort +
    drop_duplicates per hash bucket, min-label ties). The driver sees
    one scalar per round (changed-label count, for early stop)."""
    from .windows import _buckets_for_cluster, _key_buckets

    nb = _buckets_for_cluster()
    und = _clamp_blocks(und)
    ed_co = max(2 * nb, und.size_bytes() // (128 << 20))
    labels = _clamp_blocks(nodes_ds.map_batches(
        lambda b: pd.DataFrame(
            {"u": b["u"], "label": b["u"].astype(np.int64)}
        ),
        batch_format="pandas",
    ))

    for _ in range(rounds):
        lab_v = labels.map_batches(
            lambda b: b.rename(columns={"u": "v"}), batch_format="pandas"
        )
        contrib = hash_join(und, lab_v, on="v", how="inner", coalesce=ed_co)

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            return (
                b.groupby(["u", "label"], sort=False)
                .size()
                .reset_index(name="n")
            )

        counts = bucketed_agg(
            contrib.map_batches(partial, batch_format="pandas"),
            ["u", "label"], {"n": "sum"},
        )

        def argmax_bucket(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(
                ["u", "n", "label"], ascending=[True, False, True],
                kind="mergesort",
            )
            out = g.drop_duplicates("u")[["u", "label"]]
            return out.assign(label=out["label"].astype(np.int64))

        new_labels = _clamp_blocks(
            counts.map_batches(
                lambda b: b.assign(_lb=_key_buckets(b["u"], nb)),
                batch_format="pandas",
            )
            .repartition(nb, shuffle=False)  # bound the argmax sort
            .groupby("_lb")
            .map_groups(argmax_bucket, batch_format="pandas")
        )

        changed = hash_join(
            new_labels.map_batches(
                lambda b: b.rename(columns={"label": "label_new"}),
                batch_format="pandas",
            ),
            labels,
            on="u",
            how="inner",
            coalesce=True,
        ).map_batches(
            lambda b: pd.DataFrame(
                {"_c": [int((b["label_new"] != b["label"]).sum())]}
            ),
            batch_format="pandas",
        ).sum("_c")
        labels = new_labels
        if not changed:
            break

    out = labels.to_pandas().rename(columns={"u": "node"})
    out["label"] = out["label"].astype(np.int64)
    return out.sort_values("node").reset_index(drop=True)


def bfs_distances(
    edges: rd.Dataset,
    *,
    source: int,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    max_depth: int = 32,
    node_state: str = "auto",
) -> pd.DataFrame:
    """Single-source BFS hop distances — reachability / radius-from-seed
    curation (e.g. "within 2 clicks of a trusted seed site").

    Classic frontier iteration: per level ONE bucketed hash_join of the
    node-sized frontier onto the (materialized) edge list, per-batch
    distinct-neighbor partials, a tiny groupby — the exchange carries
    the frontier's out-neighborhood, never the whole graph.
    ``node_state`` as in ``pagerank``: the visited set is a driver
    dict (domain scale) or a keyed Dataset grown by anti-join per
    level (page scale; the driver sees one frontier-size scalar per
    level). Unreached nodes are absent from the result.
    Returns (node, dist)."""

    from .joins import hash_join

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        a = b[src].to_numpy()
        c = b[dst].to_numpy()
        keep = a != c
        if directed:
            return pd.DataFrame({"u": a[keep], "v": c[keep]}).drop_duplicates()
        return pd.DataFrame(
            {
                "u": np.concatenate([a[keep], c[keep]]),
                "v": np.concatenate([c[keep], a[keep]]),
            }
        ).drop_duplicates()

    adj = bucketed_distinct(
        edges.map_batches(prep, batch_format="pandas"), ["u", "v"]
    ).materialize()

    if node_state != "driver":
        # size the decision on the graph's node count only when auto
        n = bucketed_distinct(adj, "u").count()
        if _resolve_state(node_state, n) == "dataset":
            return _bfs_distances_ds(adj, int(source), max_depth, hash_join)

    dist = {int(source): 0}
    frontier = pd.DataFrame({"u": np.array([source], dtype=np.int64)})
    for depth in range(1, max_depth + 1):
        if not len(frontier):
            break
        joined = hash_join(adj, rd.from_pandas(frontier), on="u", how="semi")

        def nbr_partial(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"v": pd.unique(b["v"].to_numpy())})

        neigh = bucketed_distinct(
            joined.map_batches(nbr_partial, batch_format="pandas"), "v"
        ).to_pandas()
        new = [int(v) for v in neigh["v"] if int(v) not in dist]
        for v in new:
            dist[v] = depth
        frontier = pd.DataFrame({"u": np.array(new, dtype=np.int64)})

    out = pd.DataFrame(
        {"node": list(dist.keys()), "dist": list(dist.values())}
    ).astype({"node": "int64", "dist": "int64"})
    return out.sort_values("node").reset_index(drop=True)


def _bfs_distances_ds(
    adj: rd.Dataset, source: int, max_depth: int, hash_join
) -> pd.DataFrame:
    """Page-scale BFS levels: visited is a keyed Dataset; per level one
    semi-join (frontier onto edges), one distinct-neighbor groupby, one
    anti-join against visited, one union. Driver sees one scalar per
    level (new-frontier size)."""

    start = pd.DataFrame(
        {"u": np.array([source], dtype=np.int64),
         "dist": np.array([0], dtype=np.int64)}
    )
    visited = rd.from_pandas(start).materialize()
    frontier = rd.from_pandas(start[["u"]]).materialize()
    adj = _clamp_blocks(adj)
    ed_co = max(2 * _buckets_for_cluster(), adj.size_bytes() // (128 << 20))

    for depth in range(1, max_depth + 1):
        joined = hash_join(adj, frontier, on="u", how="semi", coalesce=ed_co)
        neigh = bucketed_distinct(
            joined.map_batches(
                lambda b: pd.DataFrame({"u": pd.unique(b["v"].to_numpy())}),
                batch_format="pandas",
            ),
            "u",
        )
        new = hash_join(neigh, visited, on="u", how="anti",
                        coalesce=True).materialize()
        if new.count() == 0:
            break
        new_d = new.map_batches(
            lambda b, d=depth: b.assign(dist=np.int64(d)),
            batch_format="pandas",
        )
        visited = _clamp_blocks(visited.union(new_d))
        frontier = new

    out = visited.to_pandas().rename(columns={"u": "node"})
    out = out.astype({"node": "int64", "dist": "int64"})
    return out.sort_values("node").reset_index(drop=True)


def k_core(
    edges: rd.Dataset,
    *,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    node_state: str = "auto",
) -> pd.DataFrame:
    """The k-core: the maximal subgraph where every node keeps degree
    ≥ k — the dense-community extraction / spam-farm screen beside
    PageRank and triangles.

    Iterative peeling: per round ONE distinct-degree exchange over the
    surviving edge list, the node-sized survivor set broadcasts, and a
    map-side filter drops edges touching peeled nodes; converges when
    a round peels nobody (≤ max_rounds guard). The edge list shrinks
    monotonically; nodes/degrees are driver-sized (the pagerank
    residency contract). Returns the surviving (node, deg)."""
    import ray

    def sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b[src].to_numpy()
        c = b[dst].to_numpy()
        keep = a != c
        return pd.DataFrame(
            {
                "u": np.concatenate([a[keep], c[keep]]),
                "v": np.concatenate([c[keep], a[keep]]),
            }
        ).drop_duplicates()


    cur = bucketed_distinct(
        edges.map_batches(sym, batch_format="pandas"), ["u", "v"]
    ).materialize()

    if node_state != "driver":
        deg0 = _degrees(cur, "u").materialize()
        if _resolve_state(node_state, deg0.count()) == "dataset":
            return _k_core_ds(cur, k, max_rounds, deg0)

    for _ in range(max_rounds):
        deg = bucketed_agg(
            cur.map_batches(
                lambda b: pd.DataFrame(
                    {"node": b["u"].value_counts().index.to_numpy(),
                     "deg": b["u"].value_counts().to_numpy(np.int64)}
                ),
                batch_format="pandas",
            ),
            "node", {"deg": "sum"},
        ).to_pandas()
        survivors = deg[deg["deg"] >= k]
        if len(survivors) == len(deg):
            return (
                survivors.sort_values("node")
                .reset_index(drop=True)
                .astype({"node": "int64", "deg": "int64"})
            )
        if not len(survivors):
            return pd.DataFrame({"node": [], "deg": []}).astype(
                {"node": "int64", "deg": "int64"}
            )
        keep_ref = ray.put(frozenset(int(n) for n in survivors["node"]))

        def prune(b: pd.DataFrame) -> pd.DataFrame:
            kept = ray.get(keep_ref)
            return b[b["u"].isin(kept) & b["v"].isin(kept)]

        cur = cur.map_batches(prune, batch_format="pandas").materialize()
    raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")


def _k_core_ds(
    cur: rd.Dataset, k: int, max_rounds: int, deg0: rd.Dataset
) -> pd.DataFrame:
    """Page-scale k-core peeling: degrees and survivors stay keyed
    Datasets; edges touching peeled nodes drop via two semi-joins per
    round. Only the (total, surviving) counts reach the driver."""
    from .joins import hash_join

    deg = deg0
    cur = _clamp_blocks(cur)
    ed_co = max(2 * _buckets_for_cluster(), cur.size_bytes() // (128 << 20))
    for _ in range(max_rounds):
        n_total = deg.count()
        surv = _clamp_blocks(deg.filter(lambda r, kk=k: r["deg"] >= kk))
        n_surv = surv.count()
        if n_surv == 0:
            return pd.DataFrame({"node": [], "deg": []}).astype(
                {"node": "int64", "deg": "int64"}
            )
        if n_surv == n_total:
            out = surv.to_pandas().astype({"node": "int64", "deg": "int64"})
            return out.sort_values("node").reset_index(drop=True)
        surv_u = surv.map_batches(
            lambda b: pd.DataFrame({"u": b["node"]}), batch_format="pandas"
        )
        surv_v = surv.map_batches(
            lambda b: pd.DataFrame({"v": b["node"]}), batch_format="pandas"
        )
        cur = _clamp_blocks(hash_join(
            hash_join(cur, surv_u, on="u", how="semi", coalesce=ed_co),
            surv_v, on="v", how="semi", coalesce=ed_co,
        ))
        deg = _clamp_blocks(_degrees(cur, "u"))
    out = deg.filter(lambda r, kk=k: r["deg"] >= kk).to_pandas()
    return (
        out.astype({"node": "int64", "deg": "int64"})
        .sort_values("node")
        .reset_index(drop=True)
    )
