"""Deduplication operators for large-scale training-data pipelines.

Strategies, each expressed Ray-Data-first:

* ``exact_dedup``            - content-hash + groupby + per-group first.
* ``minhash_lsh_candidates`` - shingle -> minhash -> banded LSH buckets ->
                               groupby bucket -> candidate pairs -> Jaccard
                               verification. The scale path: only the small
                               (band_id, band_hash) rows shuffle, never
                               full documents.
* ``simhash_dedup``          - 64-bit simhash + bucket-by-prefix near-dup.
* ``ngram_jaccard_pairs``    - exact n-gram Jaccard verification over
                               candidate pairs (used as MinHash's verifier
                               and standalone for small candidate sets).
* ``embedding_near_dups``    - cosine near-dup over an embedding column
                               (see functions/similarity.py for the ANN
                               machinery it shares).

Partitioning assumption (documented per SURVEY's custom-operator rule):
candidate generation shuffles only (bucket_key, doc_id[, signature])
rows; verification re-reads text for candidate pairs via a broadcast
doc->text map when the candidate set is small, else a hash-join by
doc_id. At 100 TB the broadcast side must be the *candidates*, not the
corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .text import content_hash_batch

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Keep one representative (min id) per exact text.

    Shuffle key is a 64-bit content hash, so only (hash, id, payload)
    rows move and groups are exact-duplicate sets. Per-group first is a
    vectorized pandas head. (A left-semi ``Dataset.join`` of the corpus
    against a C-level ``groupby(hash).min(id)`` aggregate would avoid
    the one-python-call-per-singleton-group overhead at billion-doc
    scale, but Ray 2.49.2's hash-join finalize raises an Acero
    field-ref error on this shape - revisit when Dataset.join
    stabilizes.)"""
    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col), batch_format="pyarrow"
    )

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return hashed.groupby("text_hash").map_groups(
        first_per_group, batch_format="pandas"
    ).drop_columns(["text_hash"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _det_hash_strings(strings: list[str]) -> np.ndarray:
    """Deterministic (cross-process) 63-bit hashes of strings. Python's
    builtin ``hash()`` is salted per process and MUST NOT be used for
    anything that shuffles between Ray workers."""
    if not strings:
        return np.array([], dtype=np.uint64)
    h = pd.util.hash_array(np.array(strings, dtype=object), categorize=False)
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.uint64)


_SH_MIX = np.uint64(0x9E3779B97F4A7C15)


def _windowed_shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """k-gram shingle hashes from per-token hashes via a vectorized
    sliding-window polynomial mix (no string joins). Duplicates are
    harmless for MinHash: min over a multiset equals min over its set."""
    n = len(token_hashes)
    if n == 0:
        return np.array([np.uint64(0)], dtype=np.uint64)
    if n < k:
        k = n
    with np.errstate(over="ignore"):
        acc = token_hashes[: n - k + 1].copy()
        for j in range(1, k):
            acc = acc * _SH_MIX ^ token_hashes[j : n - k + 1 + j]
    return acc & np.uint64(0x7FFFFFFFFFFFFFFF)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of the k-word shingles of ``text`` (word-level shingling)."""
    words = text.split()
    if not words:
        return np.array([np.uint64(0)], dtype=np.uint64)
    return _windowed_shingle_hashes(_det_hash_strings(words), k)


class MinHasher:
    """Actor-pool stage: per-document minhash signature + banded LSH
    bucket keys. Permutation parameters are built once per actor from a
    fixed seed (identical across the pool)."""

    def __init__(
        self,
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 3,
        text_col: str = "text",
        id_col: str = "doc_id",
        seed: int = 1234,
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.k, self.text_col, self.id_col = shingle_k, text_col, id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text or "", self.k)
        # (num_perm, n_shingles) universal hashing, min per row
        v = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def _signatures(self, texts) -> np.ndarray:
        """Vectorized batch signatures: one deterministic hash call for
        ALL tokens in the batch, windowed shingle mixing, then chunked
        (num_perm x n_shingles) universal hashing with a segmented
        ``minimum.reduceat`` per document."""
        token_lists = [(t or "").split() for t in texts]
        flat = [w for toks in token_lists for w in toks]
        flat_h = _det_hash_strings(flat)
        sh_per_doc: list[np.ndarray] = []
        pos = 0
        for toks in token_lists:
            th = flat_h[pos : pos + len(toks)]
            pos += len(toks)
            sh_per_doc.append(_windowed_shingle_hashes(th, self.k))
        n_docs = len(texts)
        sigs = np.empty((n_docs, self.num_perm), dtype=np.uint64)
        # chunk docs so (num_perm x n_shingles) stays ~32MB
        budget = max(1, (4 << 20) // self.num_perm)
        i = 0
        while i < n_docs:
            j, tot = i, 0
            while j < n_docs and (tot == 0 or tot + len(sh_per_doc[j]) <= budget):
                tot += len(sh_per_doc[j])
                j += 1
            seg = np.concatenate(sh_per_doc[i:j])
            starts = np.cumsum([0] + [len(s) for s in sh_per_doc[i:j]][:-1])
            v = (self.a[:, None] * seg[None, :] + self.b[:, None]) % _MERSENNE
            sigs[i:j] = np.minimum.reduceat(v, starts, axis=1).T
            i = j
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Emit (id, band_id, band_hash) rows - the ONLY thing that
        shuffles in the LSH groupby."""
        ids = batch[self.id_col].to_numpy()
        sigs = self._signatures(list(batch[self.text_col]))
        banded = sigs.reshape(len(ids), self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            bh = np.zeros((len(ids), self.bands), dtype=np.uint64)
            for j in range(self.rows_per_band):
                bh = bh * _SH_MIX ^ banded[:, :, j]
        bh &= np.uint64(0x7FFFFFFFFFFFFFFF)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, self.bands),
                "band_id": np.tile(np.arange(self.bands), len(ids)),
                "band_hash": bh.reshape(-1).astype(np.int64),
            }
        )


def minhash_lsh_candidates(
    ds: rd.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=None,
) -> list[tuple]:
    """Candidate near-duplicate id pairs via banded MinHash-LSH.

    Returns deduplicated (id_a, id_b) pairs (id_a < id_b). The bucket
    groupby shuffles only signature rows."""
    hasher = MinHasher(
        num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        text_col=text_col, id_col=id_col,
    )
    if concurrency is None:
        # task-based: the hasher state (two small arrays) ships as a
        # serialized-once closure; no actor-pool startup latency
        sig = ds.map_batches(hasher.__call__, batch_format="pandas")
    else:
        sig = ds.map_batches(
            MinHasher,
            fn_constructor_kwargs=dict(
                num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                text_col=text_col, id_col=id_col,
            ),
            batch_format="pandas",
            concurrency=concurrency,
            num_cpus=1,
        )
    sig = sig.materialize()  # small: bands rows per doc; reused below

    # Signature-table size decides the plan. Each extra Ray execution
    # costs ~1-2s of fixed latency; below the threshold the whole
    # signature table (bands x n_docs tiny rows, ~20B each) fits the
    # driver trivially and one pandas groupby beats four distributed
    # stages. Above it, a vectorized count-aggregate finds colliding
    # buckets (NOT map_groups - per-group python calls on the ~all-
    # singleton buckets would dominate) and only those rows come back.
    if sig.count() <= 2_000_000:
        cand = sig.to_pandas()
        sizes = cand.groupby(["band_id", "band_hash"])["doc_id"].transform("size")
        cand = cand[sizes >= 2]
    else:
        from ray.data.aggregate import Count

        counts = sig.groupby(["band_id", "band_hash"]).aggregate(
            Count(alias_name="n")
        )
        dup = counts.filter(expr="n >= 2").to_pandas()  # only real collisions
        if len(dup) == 0:
            return []
        hot = set(zip(dup["band_id"].astype(int), dup["band_hash"].astype(int)))
        hot_ref = ray.put(hot)

        def in_hot(b: pd.DataFrame) -> pd.DataFrame:
            h = ray.get(hot_ref)
            keys = list(zip(b["band_id"].astype(int), b["band_hash"].astype(int)))
            mask = np.fromiter((k in h for k in keys), dtype=bool, count=len(keys))
            return b[mask]

        cand = sig.map_batches(in_hot, batch_format="pandas").to_pandas()

    # pair within buckets, vectorized pandas on the candidate set
    pairs: set[tuple] = set()
    for (_, _), g in cand.groupby(["band_id", "band_hash"], sort=False):
        ids = sorted(set(int(x) for x in g["doc_id"]))
        for i, x in enumerate(ids):
            for y in ids[i + 1 :]:
                pairs.add((x, y))
    return sorted(pairs)


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity."""
    def grams(t):
        w = (t or "").split()
        if len(w) < k:
            return {" ".join(w)}
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    A, B = grams(text_a), grams(text_b)
    if not A and not B:
        return 1.0
    return len(A & B) / len(A | B)


def verify_pairs_jaccard(
    pairs: list[tuple],
    texts: dict,
    threshold: float = 0.8,
    k: int = 3,
) -> list[tuple]:
    """Verify candidate pairs with exact n-gram Jaccard. ``texts`` is a
    broadcast id->text mapping (candidates only, NOT the corpus)."""
    out = []
    for a, b in pairs:
        j = jaccard(texts.get(a), texts.get(b), k)
        if j >= threshold:
            out.append((a, b, j))
    return out


def minhash_dedup_pairs(
    ds: rd.Dataset,
    *,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> list[tuple]:
    """End-to-end MinHash-LSH near-dup: candidates then exact-Jaccard
    verification. Texts for verification are fetched for CANDIDATE ids
    only via a filtered pass over the dataset (broadcast-sized)."""
    cands = minhash_lsh_candidates(ds, text_col=text_col, id_col=id_col, **lsh_kwargs)
    if not cands:
        return []
    need = {i for p in cands for i in p}
    need_ref = ray.put(need)

    def fetch(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = ray.get(need_ref)
        mask = pc.is_in(b[id_col], value_set=pa.array(list(ids), b[id_col].type))
        return b.filter(mask).select([id_col, text_col])

    texts = {}
    for batch in ds.map_batches(fetch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            texts[i] = t
    return verify_pairs_jaccard(cands, texts, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash per document + ``sim_prefix`` bucket column
    (top-16-bits) for near-dup blocking. Batch-vectorized: one hash
    call for all tokens, bit expansion + segmented ``add.reduceat``
    per document."""

    def __init__(self, text_col: str = "text", prefix_bits: int = 16):
        self.text_col = text_col
        self.prefix_bits = prefix_bits

    def simhash(self, text: str) -> int:
        return int(self._simhashes([text])[0])

    def _simhashes(self, texts) -> np.ndarray:
        token_lists = [(t or "").split() for t in texts]
        counts = np.array([len(t) for t in token_lists], dtype=np.int64)
        flat = [w for toks in token_lists for w in toks]
        if not flat:
            return np.zeros(len(texts), dtype=np.uint64)
        H = pd.util.hash_array(
            np.array(flat, dtype=object), categorize=False
        ).astype(np.uint64)
        # (T x 64) sign matrix, summed per doc segment
        bits = (
            (H[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int32)
        signs = 2 * bits - 1
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        # empty docs alias a neighbor's start (clamped in range); their
        # rows are masked out below
        sums = np.add.reduceat(signs, np.clip(starts, 0, len(flat) - 1), axis=0)
        sums[counts == 0] = -1  # all-zero simhash for empty docs
        out = ((sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1
        )
        out[counts == 0] = 0
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = self._simhashes(list(batch[self.text_col]))
        batch["simhash"] = sh.astype("int64")  # two's complement for arrow
        batch["sim_prefix"] = (sh >> np.uint64(64 - self.prefix_bits)).astype("int64")
        return batch


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def simhash_near_dups(
    ds: rd.Dataset,
    *,
    max_hamming: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=None,
) -> list[tuple]:
    """Near-dup pairs whose simhashes agree on the 16-bit prefix bucket
    and differ by <= max_hamming bits overall.

    Same shape as MinHash-LSH candidate generation: a vectorized
    count-aggregate finds colliding prefix buckets (the overwhelming
    majority are singletons and never touch Python), then only those
    rows are collected and pair-checked with a vectorized XOR+popcount.
    """
    hasher = SimHasher(text_col=text_col)
    sh = ds.map_batches(hasher.__call__, batch_format="pandas").select_columns(
        [id_col, "simhash", "sim_prefix"]
    ).materialize()

    from ray.data.aggregate import Count

    counts = sh.groupby("sim_prefix").aggregate(Count(alias_name="n"))
    dup = counts.filter(expr="n >= 2").to_pandas()
    if len(dup) == 0:
        return []
    hot = set(int(x) for x in dup["sim_prefix"])
    hot_ref = ray.put(hot)

    def in_hot(b: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        return b[b["sim_prefix"].isin(h)]

    cand = sh.map_batches(in_hot, batch_format="pandas").to_pandas()

    _POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)

    def popcount64(x: np.ndarray) -> np.ndarray:
        return _POP[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)

    out: set[tuple] = set()
    for _, g in cand.groupby("sim_prefix", sort=False):
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        order = np.argsort(ids)
        ids, hs = ids[order], hs[order]
        n = len(ids)
        iu, ju = np.triu_indices(n, k=1)
        d = popcount64(hs[iu] ^ hs[ju])
        keep = d <= max_hamming
        for a, b, dd in zip(ids[iu[keep]], ids[ju[keep]], d[keep]):
            out.add((int(a), int(b), int(dd)))
    return sorted(out)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds: rd.Dataset,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 8,
    seed: int = 99,
) -> list[tuple]:
    """Cosine near-duplicates via random-hyperplane LSH bucketing:
    vectors shuffle only once into sign-pattern buckets; exact cosine
    runs per-bucket (a vector lands in one bucket; near-identical
    vectors share it with high probability for small angles)."""
    import numpy.linalg as npl

    first = ds.take(1)
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((int(np.log2(n_buckets)) or 1, dim))
    planes_ref = ray.put(planes)

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        P = ray.get(planes_ref)
        V = np.stack(b[vec_col].to_numpy())
        signs = (V @ P.T) > 0
        b["bucket"] = signs.dot(1 << np.arange(signs.shape[1])).astype("int64")
        return b[[id_col, vec_col, "bucket"]]

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        V = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        V = V / np.maximum(npl.norm(V, axis=1, keepdims=True), 1e-12)
        S = V @ V.T
        iu = np.triu_indices(len(ids), k=1)
        mask = S[iu] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][mask]],
                "id_b": ids[iu[1][mask]],
                "cosine": S[iu][mask],
            }
        )

    res = (
        ds.map_batches(bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    return sorted(
        {
            (int(r["id_a"]), int(r["id_b"]), round(float(r["cosine"]), 6))
            for r in res.take_all()
        }
    )
