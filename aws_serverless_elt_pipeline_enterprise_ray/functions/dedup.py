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
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Keep one representative (min id) per exact text. The shuffle
    moves only (hash, id, payload) grouped by the 64-bit content hash;
    per-group first is a vectorized pandas head after sort."""
    ds = ds.map_batches(
        lambda b: content_hash_batch(b, text_col), batch_format="pyarrow"
    )

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return ds.groupby("text_hash").map_groups(
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


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of the k-word shingles of ``text`` (word-level shingling)."""
    words = text.split()
    if len(words) < k:
        return _det_hash_strings([" ".join(words)])
    shingles = list({" ".join(words[i : i + k]) for i in range(len(words) - k + 1)})
    return _det_hash_strings(shingles)


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

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Emit (id, band_id, band_hash) rows - the ONLY thing that
        shuffles in the LSH groupby."""
        import hashlib

        out_id, out_band, out_hash = [], [], []
        for did, text in zip(batch[self.id_col], batch[self.text_col]):
            sig = self.signature(text)
            for band in range(self.bands):
                seg = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                digest = hashlib.blake2b(seg.tobytes(), digest_size=8).digest()
                out_id.append(did)
                out_band.append(band)
                out_hash.append(int.from_bytes(digest, "little") & 0x7FFFFFFFFFFFFFFF)
        return pd.DataFrame(
            {"doc_id": out_id, "band_id": out_band, "band_hash": out_hash}
        )


def minhash_lsh_candidates(
    ds: rd.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 8),
) -> list[tuple]:
    """Candidate near-duplicate id pairs via banded MinHash-LSH.

    Returns deduplicated (id_a, id_b) pairs (id_a < id_b). The bucket
    groupby shuffles only signature rows."""
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

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
        return pd.DataFrame({"id_a": list(a), "id_b": list(b)})

    pair_ds = sig.groupby(["band_id", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    pairs = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in pair_ds.take_all()
    }
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
    (top-16-bits) for near-dup blocking."""

    def __init__(self, text_col: str = "text", prefix_bits: int = 16):
        self.text_col = text_col
        self.prefix_bits = prefix_bits

    def simhash(self, text: str) -> int:
        words = (text or "").split()
        if not words:
            return 0
        hashes = pd.util.hash_array(
            np.array(words, dtype=object), categorize=False
        ).astype(np.uint64)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = np.array([self.simhash(t) for t in batch[self.text_col]], dtype=np.uint64)
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
    concurrency=(1, 8),
) -> list[tuple]:
    """Near-dup pairs whose simhashes agree on the 16-bit prefix bucket
    and differ by <= max_hamming bits overall. Bucketing keeps the
    pairwise check per-group."""
    sh = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pandas",
        concurrency=concurrency,
        num_cpus=1,
    ).select_columns([id_col, "simhash", "sim_prefix"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g[id_col], g["simhash"]))
        out_a, out_b, out_d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = hamming64(rows[i][1], rows[j][1])
                if d <= max_hamming:
                    out_a.append(rows[i][0]); out_b.append(rows[j][0]); out_d.append(d)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_d})

    res = sh.groupby("sim_prefix").map_groups(pairs, batch_format="pandas")
    return sorted(
        {(int(r["id_a"]), int(r["id_b"]), int(r["hamming"])) for r in res.take_all()}
    )


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
