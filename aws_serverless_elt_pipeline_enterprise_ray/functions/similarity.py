"""Similarity search over an embedding column (``list<float>``).

* ``cosine_topk``  - brute-force cosine top-k: the query matrix is
  broadcast once via ``ray.put``; every batch does ONE numpy matmul
  against it and emits only its local top-k rows; a final tiny
  reduction keeps the global top-k. No shuffle of the corpus.
* ``ivf_topk``     - the scale path: k-means-ish coarse quantizer
  (trained on a sample), vectors assigned to the nearest centroid
  list; queries probe only ``nprobe`` lists. Turns a full scan into a
  ~nprobe/nlist scan at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


class _BatchTopK:
    """map_batches stage: local cosine top-k of each batch against the
    broadcast query matrix (read once per actor in __init__)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.Q = _normalize(q["vecs"].astype(np.float64))
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy()
        V = _normalize(np.stack(batch[self.vec_col].to_numpy()).astype(np.float64))
        S = self.Q @ V.T  # (nq, nbatch)
        k = min(self.k, S.shape[1])
        idx = np.argpartition(-S, k - 1, axis=1)[:, :k]
        rows = {
            "query_id": np.repeat(self.qids, k),
            "neighbor_id": ids[idx].ravel(),
            "cosine": np.take_along_axis(S, idx, axis=1).ravel(),
        }
        return pd.DataFrame(rows)


def cosine_topk(
    ds: rd.Dataset,
    query_ids: list[int],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Global top-k cosine neighbors for each query id (queries drawn
    from the dataset itself). Returns a DataFrame
    (query_id, rank, neighbor_id, cosine) sorted by (query_id, rank)."""
    qset = set(int(i) for i in query_ids)

    def grab(b: pd.DataFrame) -> pd.DataFrame:
        return b[b[id_col].isin(qset)][[id_col, vec_col]]

    qdf = ds.map_batches(grab, batch_format="pandas").to_pandas()
    qdf = qdf.sort_values(id_col)
    queries_ref = ray.put(
        {"ids": qdf[id_col].to_numpy(), "vecs": np.stack(qdf[vec_col].to_numpy())}
    )

    local = ds.map_batches(
        _BatchTopK,
        fn_constructor_kwargs=dict(
            queries_ref=queries_ref, k=k + (1 if exclude_self else 0),
            id_col=id_col, vec_col=vec_col,
        ),
        batch_format="pandas",
        concurrency=concurrency,
        num_cpus=1,
    ).to_pandas()  # tiny: nq * k per batch

    if exclude_self:
        local = local[local["query_id"] != local["neighbor_id"]]
    local = local.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    top = local.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "neighbor_id", "cosine"]]


def ivf_topk(
    ds: rd.Dataset,
    query_ids: list[int],
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
    seed: int = 7,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """IVF-style ANN: coarse centroids from a sample (a few rounds of
    Lloyd's), then per-batch search restricted to vectors whose nearest
    centroid is among each query's ``nprobe`` closest lists. Recall is
    approximate; at scale the assignment becomes the partition key so
    only probed lists are read."""
    rng = np.random.default_rng(seed)
    sample = ds.random_sample(
        min(1.0, sample_size / max(ds.count(), 1)), seed=seed
    ).to_pandas()
    X = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    cent = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)]
    for _ in range(5):
        assign = np.argmax(X @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    cent_ref = ray.put(cent)

    qset = set(int(i) for i in query_ids)

    def grab(b: pd.DataFrame) -> pd.DataFrame:
        return b[b[id_col].isin(qset)][[id_col, vec_col]]

    qdf = ds.map_batches(grab, batch_format="pandas").to_pandas().sort_values(id_col)
    Q = _normalize(np.stack(qdf[vec_col].to_numpy()).astype(np.float64))
    probes = np.argsort(-(Q @ cent.T), axis=1)[:, :nprobe]
    queries_ref = ray.put(
        {
            "ids": qdf[id_col].to_numpy(),
            "vecs": Q,
            "probes": probes,
        }
    )

    class ProbedTopK:
        def __init__(self):
            q = ray.get(queries_ref)
            self.qids, self.Q, self.probes = q["ids"], q["vecs"], q["probes"]
            self.cent = ray.get(cent_ref)
            self.k = k

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch[id_col].to_numpy()
            V = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            lists = np.argmax(V @ self.cent.T, axis=1)
            frames = []
            for qi in range(len(self.qids)):
                mask = np.isin(lists, self.probes[qi])
                if not mask.any():
                    continue
                sims = V[mask] @ self.Q[qi]
                kk = min(self.k + 1, len(sims))
                idx = np.argpartition(-sims, kk - 1)[:kk]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": self.qids[qi],
                            "neighbor_id": ids[mask][idx],
                            "cosine": sims[idx],
                        }
                    )
                )
            if not frames:
                return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
            return pd.concat(frames, ignore_index=True)

    local = ds.map_batches(
        ProbedTopK, batch_format="pandas", concurrency=concurrency, num_cpus=1
    ).to_pandas()
    local = local[local["query_id"] != local["neighbor_id"]]
    local = local.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    top = local.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "neighbor_id", "cosine"]]


class _KMeansPartial:
    """map_batches stage: assign each vector to its nearest centroid
    (cosine, min-index tie-break) and emit per-cluster partial sums —
    k rows of (cluster, count, vector-sum) per batch. Centroids are a
    broadcast ``ray.put`` object read once per actor per iteration."""

    def __init__(self, centroids_ref, vec_col: str):
        self.C = _normalize(ray.get(centroids_ref).astype(np.float64))
        self.vec_col = vec_col

    def assign(self, batch: pd.DataFrame) -> np.ndarray:
        V = _normalize(
            np.stack(batch[self.vec_col].to_numpy()).astype(np.float64)
        )
        return np.argmax(self.C @ V.T, axis=0)  # argmax takes min index on ties

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        V = _normalize(
            np.stack(batch[self.vec_col].to_numpy()).astype(np.float64)
        )
        a = np.argmax(self.C @ V.T, axis=0)
        k, d = self.C.shape
        sums = np.zeros((k, d))
        np.add.at(sums, a, V)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        return pd.DataFrame(
            {
                "cluster": np.arange(k, dtype=np.int64),
                "n": counts,
                "vsum": [sums[i] for i in range(k)],
            }
        )


class _KMeansAssign(_KMeansPartial):
    def __init__(self, centroids_ref, vec_col: str, id_col: str):
        super().__init__(centroids_ref, vec_col)
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "cluster": self.assign(batch).astype(np.int64),
            }
        )


def kmeans_centroids(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd's) over an embedding
    column: the corpus-diversity / semantic-bucketing primitive.

    Scale shape: centroids broadcast via ``ray.put`` (read once per
    actor), assignment + per-cluster partial sums computed per batch
    (one matmul + one scatter-add), and the driver combines only
    blocks x k tiny partial rows per iteration — the corpus never
    shuffles and never lands on the driver. Deterministic: centroids
    initialize from the k smallest ids, ties break to the lowest
    cluster index, iteration stops at exact centroid fixpoint.

    Returns the final k x d centroid matrix (normalized). Empty
    clusters keep their previous centroid.
    """
    init = ds.sort(id_col).limit(k).to_pandas()  # k rows only
    C = np.stack(init[vec_col].to_numpy()).astype(np.float64)

    for _ in range(iters):
        ref = ray.put(C)
        parts = ds.map_batches(
            _KMeansPartial,
            fn_constructor_kwargs={"centroids_ref": ref, "vec_col": vec_col},
            batch_format="pandas",
            concurrency=(1, 8),
        ).to_pandas()  # blocks x k rows
        sums = np.zeros_like(C)
        counts = np.zeros(len(C), dtype=np.int64)
        for cl, n, vs in zip(parts["cluster"], parts["n"], parts["vsum"]):
            sums[cl] += vs
            counts[cl] += n
        C_new = C.copy()
        nz = counts > 0
        C_new[nz] = sums[nz] / counts[nz, None]
        C_new = _normalize(C_new)
        if np.array_equal(C_new, C):
            break
        C = C_new

    return C


def kmeans_embeddings(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Distributed spherical k-means assignment: run
    ``kmeans_centroids`` (see its docstring for the scale shape) and
    map each vector to its cluster. Returns ``(id_col, cluster)``."""
    C = kmeans_centroids(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(C)
    return ds.map_batches(
        _KMeansAssign,
        fn_constructor_kwargs={
            "centroids_ref": ref, "vec_col": vec_col, "id_col": id_col,
        },
        batch_format="pandas",
        concurrency=(1, 8),
    )


def semantic_dedup(
    ds: rd.Dataset,
    *,
    threshold: float = 0.95,
    k: int | None = None,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 4096,
) -> rd.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding space, compare vectors
    ONLY within their cluster (cosine >= ``threshold`` marks a
    semantic duplicate pair), connected-components the pairs, keep
    each component's minimum id. Turns the O(n²) all-pairs problem
    into k independent O((n/k)²) blocks.

    Scale shape: the cluster assignment rides a ``hash_join`` back
    onto the vectors (one co-group shuffle), pair emission is one
    vectorized matmul per cluster bucket inside ``map_groups`` with a
    ``max_cluster`` cap (members beyond the cap — id-sorted — emit no
    pairs; a cluster that big means k is undersized: pick k ~ n/1000),
    and survivor filtering reuses ``dedup_clusters`` + a broadcast
    drop set. Default k scales as sqrt(n)."""
    from .dedup import dedup_clusters

    n = ds.count()
    if n == 0:
        return ds
    if k is None:
        k = max(2, min(256, int(np.sqrt(n))))

    C = kmeans_centroids(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    cref = ray.put(C)

    class AssignCarry(_KMeansPartial):
        """Assign + carry the vector (as a plain list — object-ndarray
        columns break Ray's sort-shuffle block builder) so pairing
        needs no join, just the one cluster shuffle."""

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(),
                    "cluster": self.assign(b).astype(np.int64),
                    "vec": [np.asarray(v, dtype=np.float64).tolist()
                            for v in b[self.vec_col]],
                }
            )

    tagged = ds.map_batches(
        AssignCarry,
        fn_constructor_kwargs={"centroids_ref": cref, "vec_col": vec_col},
        batch_format="pandas",
        concurrency=(1, 8),
    )

    def cluster_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").head(max_cluster)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        V = _normalize(np.stack([np.asarray(v) for v in g["vec"]]).astype(np.float64))
        S = V @ V.T
        ia, ib = np.triu_indices(len(ids), k=1)
        hit = S[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[hit]].astype(np.int64),
             "id_b": ids[ib[hit]].astype(np.int64)}
        )

    pairs = tagged.groupby("cluster").map_groups(
        cluster_pairs, batch_format="pandas"
    ).materialize()
    if pairs.count() == 0:
        return ds

    clusters = dedup_clusters(pairs).to_pandas()
    drop = set(
        clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"]
        .astype("int64").tolist()
    )
    drop_ref = ray.put(drop)

    class DropFilter:
        def __init__(self):
            self.drop = ray.get(drop_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return b[~b[id_col].isin(self.drop)]

    return ds.map_batches(DropFilter, batch_format="pandas", concurrency=(1, 4))


def pca_fit(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    k: int = 16,
) -> dict:
    """Distributed PCA fit in ONE streaming pass: every batch
    contributes (sum x, X^T X, n) partials - d-vector + d x d matrix
    per block, never the rows - the driver combines B tiny partials
    into the covariance and eigendecomposes the d x d matrix (d is the
    embedding width; the corpus never concentrates anywhere).
    Deterministic sign convention: each component's largest-|entry| is
    made positive. Returns {"mean", "components" (k x d),
    "explained_variance", "n"}."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "n": [len(X)],
                "s": [X.sum(axis=0).tobytes()],
                "xtx": [(X.T @ X).tobytes()],
                "d": [X.shape[1]],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    d = int(parts["d"].iloc[0])
    n = int(parts["n"].sum())
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for srow, xrow in zip(parts["s"], parts["xtx"]):
        s += np.frombuffer(srow, dtype=np.float64)
        xtx += np.frombuffer(xrow, dtype=np.float64).reshape(d, d)
    mean = s / max(n, 1)
    cov = (xtx - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: min(k, d)]
    comps = evecs[:, order].T  # (k, d)
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": evals[order],
        "n": n,
    }


def pca_transform(
    ds: rd.Dataset,
    model: dict,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> rd.Dataset:
    """Map-side projection onto a fitted PCA basis: the (k x d) model
    rides ``ray.put`` once, every batch does one centered matmul. The
    dimension-reduction step before ANN indexing / clustering at
    corpus scale."""
    ref = ray.put((model["mean"], model["components"]))

    class Project:
        def __init__(self):
            self.mean, self.comps = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            P = (X - self.mean) @ self.comps.T
            out = b.drop(columns=[vec_col]).copy()
            out[out_col] = list(P.astype(np.float32))
            return out

    return ds.map_batches(Project, batch_format="pandas", concurrency=(1, 8))


def pca_embeddings(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    k: int = 16,
    out_col: str = "pca",
) -> rd.Dataset:
    """Fit + transform in two streaming passes (fit partials, then the
    broadcast projection)."""
    return pca_transform(
        ds, pca_fit(ds, vec_col=vec_col, k=k), vec_col=vec_col, out_col=out_col
    )


def mean_pool(
    ds: rd.Dataset,
    *,
    key_col: str,
    vec_col: str = "embedding",
    out_col: str = "embedding",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key mean of an embedding column (turn -> conversation
    vectors, chunk -> document vectors): every batch contributes one
    (key, d-vector sum, n) partial per key it holds - computed with a
    stable sort + ``np.add.reduceat``, no Python per row - so the ONE
    shuffle carries per-(block, key) partials, never raw vectors. Keys
    hash-bucket (~2/CPU) and each bucket combines all its keys in one
    vectorized pass. Returns (key, out_col, n_vectors)."""
    import pandas as pd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[key_col].to_numpy()
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        order = np.argsort(keys, kind="stable")
        keys_s, X_s = keys[order], X[order]
        change = np.nonzero(np.r_[True, keys_s[1:] != keys_s[:-1]])[0]
        sums = np.add.reduceat(X_s, change, axis=0)
        counts = np.diff(np.r_[change, len(keys_s)]).astype(np.int64)
        return pd.DataFrame(
            {
                key_col: keys_s[change],
                "_s": [v.tobytes() for v in sums],
                "_n": counts,
            }
        )

    from .windows import _buckets_for_cluster, _key_buckets

    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_mb"] = _key_buckets(b[key_col], nb)
        return b

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col, kind="mergesort")
        keys = g[key_col].to_numpy()
        S = np.stack([np.frombuffer(v, dtype=np.float64) for v in g["_s"]])
        n = g["_n"].to_numpy(np.int64)
        change = np.nonzero(np.r_[True, keys[1:] != keys[:-1]])[0]
        sums = np.add.reduceat(S, change, axis=0)
        counts = np.add.reduceat(n, change)
        mean = sums / counts[:, None]
        return pd.DataFrame(
            {
                key_col: keys[change],
                out_col: list(mean.astype(np.float32)),
                "n_vectors": counts.astype(np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_mb")
        .map_groups(combine, batch_format="pandas")
    )


# ------------------------------------------------------------ int8 ANN


def embedding_scales(
    ds: rd.Dataset, *, vec_col: str = "embedding"
) -> np.ndarray:
    """Per-dimension symmetric int8 scales (absmax/127): one streaming
    pass of per-batch absmax partials — the driver combines B tiny
    d-vectors, raw vectors never concentrate."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[vec_col].to_numpy())
        return pd.DataFrame({"_m": [np.abs(X).max(axis=0).astype(np.float64).tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    M = np.stack([np.frombuffer(v, dtype=np.float64) for v in parts["_m"]])
    return np.maximum(M.max(axis=0), 1e-12) / 127.0


def quantize_embeddings(
    ds: rd.Dataset,
    scales: np.ndarray | None = None,
    *,
    vec_col: str = "embedding",
    out_col: str = "embedding_q8",
    keep_float: bool = False,
) -> tuple[rd.Dataset, np.ndarray]:
    """Symmetric per-dimension int8 quantization of an embedding
    column — 4× less memory/IO per vector, the difference between an
    in-RAM and a spilled ANN corpus at 10^9 vectors. Scales are
    computed in one streaming pass (or passed in, e.g. from a prior
    run) and broadcast once per actor; the quantize map is a single
    vectorized round-and-clip. Returns ``(dataset, scales)``; the
    float column is dropped unless ``keep_float``.
    """
    if scales is None:
        scales = embedding_scales(ds, vec_col=vec_col)
    scales_ref = ray.put(scales)

    class Quantize:
        def __init__(self):
            self.inv = (1.0 / ray.get(scales_ref)).astype(np.float32)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            X = np.stack(b[vec_col].to_numpy()).astype(np.float32)
            Q = np.clip(np.rint(X * self.inv), -127, 127).astype(np.int8)
            b[out_col] = list(Q)
            if not keep_float:
                b = b.drop(columns=[vec_col])
            return b

    return (
        ds.map_batches(Quantize, batch_format="pandas", concurrency=(1, 8)),
        scales,
    )


def quantized_topk(
    dsq: rd.Dataset,
    ds_float: rd.Dataset,
    scales: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 5,
    oversample: int = 4,
    id_col: str = "vec_id",
    q8_col: str = "embedding_q8",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Two-phase ANN over the int8 corpus: (1) approximate
    top-(k·oversample) per query by scanning ONLY the quantized
    vectors (dequantize = one row-scale multiply per batch, then the
    same broadcast-matmul local-top-k as ``cosine_topk``); (2) exact
    rescore of the candidate union against the FLOAT corpus — the
    candidate id set (≤ nq·k·oversample) is broadcast, candidate float
    rows are filtered out in one streaming pass (candidate-sized, no
    corpus shuffle), and exact cosine top-k is computed over them.
    With sufficient ``oversample`` the result equals brute force;
    recall is governed by the int8 approximation error (~1e-2 on
    cosine), so candidates beyond rank k·oversample are the only loss.
    """
    qset = set(int(i) for i in query_ids)

    def grab_q(b: pd.DataFrame) -> pd.DataFrame:
        return b[b[id_col].isin(qset)][[id_col, q8_col]]

    qdf = dsq.map_batches(grab_q, batch_format="pandas").to_pandas()
    qdf = qdf.sort_values(id_col)
    Q8 = np.stack(qdf[q8_col].to_numpy()).astype(np.float32) * scales.astype(
        np.float32
    )
    queries_ref = ray.put({"ids": qdf[id_col].to_numpy(), "vecs": Q8})
    scales_ref = ray.put(scales.astype(np.float32))

    class ApproxTopK:
        def __init__(self):
            q = ray.get(queries_ref)
            self.qids = q["ids"]
            self.Q = _normalize(q["vecs"].astype(np.float64))
            self.s = ray.get(scales_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids = b[id_col].to_numpy()
            V = np.stack(b[q8_col].to_numpy()).astype(np.float32) * self.s
            S = self.Q @ _normalize(V.astype(np.float64)).T
            kk = min(k * oversample + (1 if exclude_self else 0), S.shape[1])
            idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            return pd.DataFrame(
                {
                    "query_id": np.repeat(self.qids, kk),
                    "neighbor_id": ids[idx].ravel(),
                    "approx": np.take_along_axis(S, idx, axis=1).ravel(),
                }
            )

    local = dsq.map_batches(
        ApproxTopK, batch_format="pandas", concurrency=concurrency, num_cpus=1
    ).to_pandas()  # nq * k * oversample rows per batch — tiny
    local = local.sort_values(["query_id", "approx"], ascending=[True, False])
    cand = local.groupby("query_id", sort=False).head(k * oversample + 1)
    cand_ids = set(cand["neighbor_id"].tolist()) | qset
    cand_ref = ray.put(frozenset(cand_ids))

    class GrabFloat:
        def __init__(self):
            self.want = ray.get(cand_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return b[b[id_col].isin(self.want)][[id_col, vec_col]]

    fl = ds_float.map_batches(
        GrabFloat, batch_format="pandas", concurrency=concurrency
    ).to_pandas()
    fl = fl.sort_values(id_col).reset_index(drop=True)
    ids = fl[id_col].to_numpy()
    X = _normalize(np.stack(fl[vec_col].to_numpy()).astype(np.float64))
    pos = {int(v): i for i, v in enumerate(ids)}
    qpos = np.array([pos[int(i)] for i in qdf[id_col]], dtype=np.int64)

    # exact rescore restricted to each query's own candidate list
    out = []
    for qid, grp in cand.groupby("query_id", sort=True):
        cidx = np.array(
            [pos[int(n)] for n in grp["neighbor_id"] if int(n) in pos],
            dtype=np.int64,
        )
        s = X[qpos[np.searchsorted(qdf[id_col].to_numpy(), qid)]] @ X[cidx].T
        df = pd.DataFrame(
            {"query_id": qid, "neighbor_id": ids[cidx], "cosine": s}
        )
        if exclude_self:
            df = df[df["neighbor_id"] != qid]
        df = df.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(k)
        df["rank"] = np.arange(1, len(df) + 1)
        out.append(df)
    res = pd.concat(out, ignore_index=True)
    return res[["query_id", "rank", "neighbor_id", "cosine"]]


def mmr_select(
    ds,
    *,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lam: float = 0.5,
) -> pd.DataFrame:
    """Diversity-aware selection by Maximal Marginal Relevance
    (Carbonell & Goldstein, SIGIR'98): greedily pick k items maximizing
    ``lam·centrality − (1−lam)·max_sim_to_already_selected`` — the
    "cover the embedding space, don't pick near-duplicates" sampler
    for eval-set / few-shot selection.

    Centrality = cosine to the corpus mean direction (one streaming
    (Σv, n) pass). Each greedy step is ONE embarrassingly-parallel
    pass: the ≤k selected vectors broadcast (`ray.put`, re-read per
    actor), every batch reduces to its local best candidate, the
    driver picks the global argmax (ties → min id, so the result is
    deterministic and layout-invariant). k passes total — MMR is
    inherently sequential in k; at corpus scale each pass is a cheap
    projection. Returns (rank, id, score) in pick order."""
    # corpus mean direction for the relevance term
    def sum_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = np.stack(b[vec_col].to_numpy())
        return pd.DataFrame({"s": [v.sum(axis=0)], "n": [np.int64(len(b))]})

    parts = ds.map_batches(sum_partial, batch_format="pandas").to_pandas()
    mean = np.sum(np.stack(parts["s"].to_numpy()), axis=0) / float(
        parts["n"].sum()
    )
    mean = mean / max(float(np.linalg.norm(mean)), 1e-12)
    mean_ref = ray.put(mean.astype(np.float64))

    selected_ids: list[int] = []
    selected_vecs: list[np.ndarray] = []
    picks = []
    for step in range(k):
        sel_ref = ray.put(
            np.stack(selected_vecs) if selected_vecs else None
        )
        sel_ids = frozenset(selected_ids)

        def best_local(b: pd.DataFrame) -> pd.DataFrame:
            b = b[~b[id_col].isin(sel_ids)]
            if not len(b):
                return pd.DataFrame({"id": [], "score": [], "vi": []})
            v = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(v, axis=1)
            norms = np.maximum(norms, 1e-12)
            vn = v / norms[:, None]
            rel = vn @ ray.get(mean_ref)
            sel = ray.get(sel_ref)
            if sel is None:
                pen = np.zeros(len(b))
            else:
                sn = sel / np.maximum(
                    np.linalg.norm(sel, axis=1), 1e-12
                )[:, None]
                pen = (vn @ sn.T).max(axis=1)
            score = lam * rel - (1.0 - lam) * pen
            # deterministic: best score, ties -> min id
            order = np.lexsort((b[id_col].to_numpy(), -score))
            i = order[0]
            return pd.DataFrame(
                {
                    "id": [b[id_col].to_numpy()[i]],
                    "score": [score[i]],
                    "vi": [v[i]],
                }
            )

        cands = ds.map_batches(best_local, batch_format="pandas").to_pandas()
        if not len(cands):
            break
        cands = cands.sort_values(
            ["score", "id"], ascending=[False, True], kind="mergesort"
        )
        row = cands.iloc[0]
        selected_ids.append(int(row["id"]))
        selected_vecs.append(np.asarray(row["vi"], dtype=np.float64))
        picks.append((step + 1, int(row["id"]), float(row["score"])))

    return pd.DataFrame(picks, columns=["rank", "id", "score"])


# -- Product quantization (PQ) ANN -------------------------------------


class _PQTrainPartial:
    """Per-batch PQ training partial: for every subspace, assign each
    vector's sub-slice to its nearest code (L2) and emit per-(subspace,
    code) sum + count — m × kc tiny rows per batch."""

    def __init__(self, codebooks_ref, vec_col: str):
        self.C = ray.get(codebooks_ref)  # (m, kc, dsub)
        self.vec_col = vec_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        V = _normalize(np.stack(b[self.vec_col].to_numpy()).astype(np.float64))
        m, kc, dsub = self.C.shape
        rows = []
        for s in range(m):
            sub = V[:, s * dsub:(s + 1) * dsub]
            d2 = (
                (sub * sub).sum(axis=1)[:, None]
                - 2.0 * sub @ self.C[s].T
                + (self.C[s] * self.C[s]).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in np.unique(assign):
                mask = assign == c
                rows.append(
                    (s, int(c), int(mask.sum()), sub[mask].sum(axis=0))
                )
        return pd.DataFrame(rows, columns=["sub", "code", "n", "vsum"])


def pq_train(
    ds: rd.Dataset,
    *,
    m: int = 8,
    kc: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., TPAMI 2011):
    split the (normalized) embedding into ``m`` subspaces and run L2
    k-means with ``kc`` codes independently in each — the memory-scale
    path for billion-vector ANN (``m`` bytes per vector at kc ≤ 256 vs
    4·d for float32). Same scale shape as ``kmeans_centroids``: the
    corpus never shuffles, the driver combines blocks × m × kc partial
    rows per iteration. Deterministic: codebooks initialize from the
    kc smallest-id vectors' sub-slices, exact-fixpoint early stop.
    Returns the (m, kc, d/m) codebook tensor."""
    init = ds.sort(id_col).limit(kc).to_pandas()
    V0 = _normalize(np.stack(init[vec_col].to_numpy()).astype(np.float64))
    d = V0.shape[1]
    assert d % m == 0, (d, m)
    dsub = d // m
    C = np.stack([V0[:, s * dsub:(s + 1) * dsub] for s in range(m)])

    for _ in range(iters):
        ref = ray.put(C)
        parts = ds.map_batches(
            _PQTrainPartial,
            fn_constructor_kwargs={"codebooks_ref": ref, "vec_col": vec_col},
            batch_format="pandas",
            concurrency=(1, 8),
        ).to_pandas()
        sums = np.zeros_like(C)
        counts = np.zeros((m, kc), dtype=np.int64)
        for s, c, n, vs in parts.itertuples(index=False):
            sums[s, c] += vs
            counts[s, c] += n
        C_new = C.copy()
        nz = counts > 0
        C_new[nz] = sums[nz] / counts[nz][:, None]
        if np.array_equal(C_new, C):
            break
        C = C_new
    return C


class _PQSearch:
    """Fused encode+shortlist+rerank: per batch, encode each corpus
    vector's sub-slices to codes; query LUTs (one m × kc table of
    partial dot products per query, broadcast once per actor) turn the
    asymmetric distance into ``m`` table lookups per vector; the ADC
    scores shortlist ``k × refine`` local candidates, which re-rank by
    EXACT dot product against the still-in-memory batch vectors — so
    every emitted score is exact and the approximation only affects
    which candidates survive the shortlist."""

    def __init__(
        self, codebooks_ref, luts_ref, k: int, refine: int,
        id_col: str, vec_col: str,
    ):
        self.C = ray.get(codebooks_ref)                      # (m, kc, dsub)
        self.qids, self.Q, self.luts = ray.get(luts_ref)     # (nq,), (nq,d), (nq,m,kc)
        self.k, self.refine = k, refine
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        V = _normalize(np.stack(b[self.vec_col].to_numpy()).astype(np.float64))
        ids = b[self.id_col].to_numpy()
        m, kc, dsub = self.C.shape
        codes = np.empty((len(V), m), dtype=np.int64)
        for s in range(m):
            sub = V[:, s * dsub:(s + 1) * dsub]
            d2 = -2.0 * sub @ self.C[s].T + (self.C[s] * self.C[s]).sum(axis=1)[None, :]
            codes[:, s] = np.argmin(d2, axis=1)
        out = []
        for qi, qid in enumerate(self.qids):
            score = np.zeros(len(V), dtype=np.float64)
            lut = self.luts[qi]
            for s in range(m):
                score += lut[s, codes[:, s]]
            kr = min(self.k * self.refine, len(V))
            short = np.argpartition(-score, kr - 1)[:kr]
            exact = V[short] @ self.Q[qi]
            k = min(self.k, len(short))
            top = short[np.argpartition(-exact, k - 1)[:k]]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": int(qid),
                        "neighbor_id": ids[top],
                        "cosine": V[top] @ self.Q[qi],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)


def pq_topk(
    ds: rd.Dataset,
    query_ids: list[int],
    *,
    k: int = 5,
    m: int = 8,
    kc: int = 16,
    iters: int = 8,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """PQ approximate top-k (Jégou et al., TPAMI 2011) with exact
    re-rank: train codebooks on the corpus, then ONE fused
    encode+shortlist+rerank pass — per batch the ADC score is ``m``
    LUT lookups per vector instead of a d-dim dot product, the top
    ``k·refine`` local candidates re-score exactly in-batch, and only
    nq × k rows leave each batch. Scores are exact cosines; the
    approximation only affects shortlist membership (recall asserted
    in pytest, not oracle-gated). Like IVF's probe set, the shortlist
    is per-batch, so results can vary with block layout when the
    ``k·refine`` cap binds — deterministic for a fixed partitioning.
    Returns (query_id, rank, neighbor_id, cosine)."""
    codebooks = pq_train(
        ds, m=m, kc=kc, iters=iters, id_col=id_col, vec_col=vec_col
    )
    qset = set(int(i) for i in query_ids)

    def grab(b: pd.DataFrame) -> pd.DataFrame:
        return b[b[id_col].isin(qset)][[id_col, vec_col]]

    qdf = ds.map_batches(grab, batch_format="pandas").to_pandas().sort_values(id_col)
    Q = _normalize(np.stack(qdf[vec_col].to_numpy()).astype(np.float64))
    mq, kcq, dsub = codebooks.shape
    # LUT[q, s, c] = dot(q's subspace s, code c of subspace s)
    Qs = Q.reshape(len(Q), mq, dsub)
    luts = np.einsum("qsd,skd->qsk", Qs, codebooks)
    cb_ref = ray.put(codebooks)
    luts_ref = ray.put((qdf[id_col].to_numpy(), Q, luts))

    local = ds.map_batches(
        _PQSearch,
        fn_constructor_kwargs=dict(
            codebooks_ref=cb_ref, luts_ref=luts_ref,
            k=k + (1 if exclude_self else 0), refine=refine,
            id_col=id_col, vec_col=vec_col,
        ),
        batch_format="pandas",
        concurrency=(1, 8),
        num_cpus=1,
    ).to_pandas()
    if exclude_self:
        local = local[local["query_id"] != local["neighbor_id"]]
    local = local.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    top = local.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    top["cosine"] = top["cosine"].round(9)
    return top[["query_id", "rank", "neighbor_id", "cosine"]]
