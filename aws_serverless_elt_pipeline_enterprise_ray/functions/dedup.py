"""Deduplication operators for large-scale training-data pipelines.

Strategies, each expressed Ray-Data-first:

* ``exact_dedup``            - content-hash + bucketed shuffle + vectorized
                               keep-first (min id) per hash run.
* ``minhash_lsh_candidates`` - shingle -> minhash -> banded LSH buckets ->
                               count-aggregate collisions -> distributed
                               pair emission -> distributed exact-Jaccard
                               verification. Only (id, band, hash) rows
                               shuffle; documents never do.
* ``simhash_near_dups``      - 64-bit simhash, multi-table rotated-prefix
                               blocking, distributed XOR+popcount pairing.
* ``ngram_jaccard_pairs``    - exact n-gram Jaccard verification over
                               candidate pairs.
* ``embedding_near_dups``    - cosine near-dup via banded random-hyperplane
                               tables; bucket count scales with corpus size.

Partitioning assumptions (documented per SURVEY's custom-operator rule):

- Candidate generation shuffles only (bucket_key, doc_id[, signature])
  rows. Colliding buckets are found with a vectorized count-aggregate
  (the ~all-singleton bucket mass never touches Python), then only
  collision rows are re-shuffled into a bounded number of pairing
  groups where the all-pairs kernel runs vectorized per bucket.
- Degenerate buckets (universal shingles / zero vectors) are CAPPED at
  ``max_bucket`` members; members beyond the cap emit no pairs. This is
  deliberate: a bucket with 10^5 members carries no near-dup signal and
  would otherwise emit 5x10^9 pairs.
- Verification joins candidate ids back to texts DISTRIBUTED: the
  broadcast side is the candidate-id set (small), the texts ride a
  bucketed co-group shuffle; the corpus is never collected to the
  driver.
- Doc ids must be integers (used as bucket keys for the co-group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .text import content_hash_batch
from .windows import bucketed_agg


def _n_shuffle_groups() -> int:
    """Bounded number of pairing/co-group partitions: enough for every
    CPU, few enough that per-group Python overhead stays negligible."""
    try:
        return max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:  # pragma: no cover - ray not initialised
        return 32


def _hot_buckets(ds: rd.Dataset, cols: list[str], min_count: int = 2) -> pd.DataFrame:
    """Bucket keys with >= min_count members: per-block ARROW partial
    counts (C-level group_by) + a tiny driver combine over bucket KEYS
    only - never rows. Measured 0.2s where Ray's distributed
    ``groupby().aggregate(Count)`` took 10.6s on arrow blocks and 197s
    on pandas blocks for the same 400k rows / 33k groups (its combine
    step pays per-group Python). At extreme key cardinality this
    combine would become a second (hierarchical) partial pass."""

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.group_by(cols)
            .aggregate([(cols[-1], "count")])
            .rename_columns([*cols, "n"])
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    tot = parts.groupby(cols, sort=False)["n"].sum().reset_index()
    return tot[tot["n"] >= min_count]


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Keep one representative (min id) per exact text.

    Scale shape: rows shuffle once, bucketed by ``text_hash % P`` (P
    bounded, ~2/CPU), and each bucket is reduced with ONE vectorized
    kernel - sort by (hash, id), keep the first row of every equal-hash
    run - the same run-boundary pattern as ``schema.lww_reduce``. No
    per-duplicate-group Python call (the previous head(1)-per-group
    form paid one pandas call per ~singleton group; a left-semi
    ``Dataset.join`` against groupby(hash).min(id) remains blocked by
    Ray 2.49.2's Acero field-ref bug)."""
    P = num_partitions or _n_shuffle_groups()

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        b = content_hash_batch(b, text_col)
        h = b["text_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "bucket", pa.array((h % np.uint64(P)).astype(np.int32))
        )

    def keep_first(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("text_hash", "ascending"), (id_col, "ascending")]
        )
        s = g.take(idx)
        h = s["text_hash"].to_numpy(zero_copy_only=False)
        first = np.empty(len(s), dtype=bool)
        first[0] = True
        first[1:] = h[1:] != h[:-1]
        return s.filter(pa.array(first)).drop_columns(["text_hash", "bucket"])

    return (
        ds.map_batches(hash_and_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keep_first, batch_format="pyarrow")
    )


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


def _bucket_key(g: pd.DataFrame, bucket_cols: list[str]) -> np.ndarray:
    v = g[bucket_cols[-1]].to_numpy().astype(np.int64)
    if len(bucket_cols) > 1:
        with np.errstate(over="ignore"):
            v = v * np.int64(1000003) + g[bucket_cols[0]].to_numpy().astype(np.int64)
    return v


def _bucket_pairs_ds(
    keyed: rd.Dataset,
    bucket_cols: list[str],
    id_col: str,
    max_bucket: int,
    extra_emit=None,
) -> rd.Dataset:
    """Distributed pair emission from bucketed collision rows.

    ``keyed`` holds only rows of buckets with >= 2 members. Rows are
    re-bucketed into a BOUNDED number of pairing groups (~2/CPU). Each
    group call is fully vectorized: one lexsort by (bucket, id), run-
    boundary detection, triu pair-position generation per run (capped
    at ``max_bucket`` members - a degenerate 10^5-member bucket carries
    no near-dup signal and would emit 5x10^9 pairs), and ONE
    ``extra_emit(g_sorted, IA, IB, df)`` call per group computing any
    pair feature (hamming / cosine) over all pairs at once. No pandas
    call per bucket."""
    NB = _n_shuffle_groups()

    def add_gb(b: pd.DataFrame) -> pd.DataFrame:
        v = _bucket_key(b, bucket_cols)
        b["gb"] = (v % NB + NB) % NB
        return b

    def _empty() -> pd.DataFrame:
        df = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64")}
        )
        if extra_emit is not None:
            df = extra_emit(None, None, None, df)
        return df

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < 2:
            return _empty()
        k = _bucket_key(g, bucket_cols)
        ids = g[id_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, k))
        k, ids = k[order], ids[order]
        keep = np.empty(n, dtype=bool)
        keep[0] = True
        keep[1:] = (k[1:] != k[:-1]) | (ids[1:] != ids[:-1])
        sel = order[keep]
        k, ids = k[keep], ids[keep]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        lens = np.diff(np.r_[starts, len(k)])
        IA, IB = [], []
        tri_cache: dict[int, tuple] = {}
        for s, L in zip(starts, lens):
            if L < 2:
                continue
            L2 = int(min(L, max_bucket))
            tri = tri_cache.get(L2)
            if tri is None:
                tri = np.triu_indices(L2, k=1)
                tri_cache[L2] = tri
            IA.append(tri[0] + s)
            IB.append(tri[1] + s)
        if not IA:
            return _empty()
        IA = np.concatenate(IA)
        IB = np.concatenate(IB)
        # ids sorted ascending within each run => id_a < id_b already
        df = pd.DataFrame({"id_a": ids[IA], "id_b": ids[IB]})
        if extra_emit is not None:
            df = extra_emit(g.iloc[sel], IA, IB, df)
        return df

    return (
        keyed.map_batches(add_gb, batch_format="pandas")
        .groupby("gb")
        .map_groups(emit, batch_format="pandas")
    )


def minhash_lsh_candidate_ds(
    ds: rd.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=None,
    max_bucket: int = 512,
) -> rd.Dataset:
    """Candidate near-duplicate pairs via banded MinHash-LSH, fully
    distributed: returns a Dataset of distinct (id_a, id_b) rows.

    Plan: signature rows (bands per doc) -> vectorized count-aggregate
    finds colliding (band_id, band_hash) buckets (the ~all-singleton
    mass stays in C) -> only collision rows re-shuffle into bounded
    pairing groups -> triu pairs per bucket (capped) -> distinct via a
    C-level count-aggregate. The driver only ever holds the colliding
    BUCKET KEYS (broadcast as a filter set), never rows or texts."""
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

    # Plan selection on the KNOWN materialized size (count is free on a
    # materialized dataset): the hot-bucket prefilter exists to keep
    # the ~all-singleton signature mass out of the pairing shuffle - a
    # volume concern. Below the threshold the whole signature table is
    # one cheap sort, and the prefilter's two extra Ray executions are
    # pure fixed latency; the pairing kernel skips singleton runs
    # either way, so both plans emit IDENTICAL pairs.
    if sig.count() <= 5_000_000:
        cand = sig
    else:
        dup = _hot_buckets(sig, ["band_id", "band_hash"])  # bucket KEYS only
        if len(dup) == 0:
            return rd.from_arrow(
                pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
            )
        hot_by_band = {
            int(t): g["band_hash"].to_numpy().astype(np.int64)
            for t, g in dup.groupby("band_id")
        }
        hot_ref = ray.put(hot_by_band)

        def in_hot(b: pd.DataFrame) -> pd.DataFrame:
            hb = ray.get(hot_ref)
            bid = b["band_id"].to_numpy()
            bh = b["band_hash"].to_numpy()
            mask = np.zeros(len(b), dtype=bool)
            for t, arr in hb.items():
                sel = bid == t
                if sel.any():
                    mask[sel] = np.isin(bh[sel], arr)
            return b[mask]

        cand = sig.map_batches(in_hot, batch_format="pandas")
    pairs = _bucket_pairs_ds(
        cand, ["band_id", "band_hash"], "doc_id", max_bucket
    )
    # distinct (a pair collides in many bands): per-block pandas
    # drop_duplicates (C-level) then a driver dedup over the candidate
    # set - the small side by design
    def dd(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["id_a", "id_b"])

    uniq = pairs.map_batches(dd, batch_format="pandas").to_pandas()
    uniq = uniq.drop_duplicates(["id_a", "id_b"])
    return rd.from_arrow(
        pa.table({"id_a": uniq["id_a"].to_numpy().astype(np.int64),
                  "id_b": uniq["id_b"].to_numpy().astype(np.int64)})
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
    max_bucket: int = 512,
) -> list[tuple]:
    """List form of :func:`minhash_lsh_candidate_ds` (the candidate set
    is small relative to the corpus; collecting IT is the documented
    broadcast direction)."""
    out = minhash_lsh_candidate_ds(
        ds, num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        text_col=text_col, id_col=id_col, concurrency=concurrency,
        max_bucket=max_bucket,
    ).take_all()
    return sorted((int(r["id_a"]), int(r["id_b"])) for r in out)


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
    """Verify candidate pairs with exact n-gram Jaccard against an
    in-memory id->text mapping (for unit tests / tiny candidate sets;
    the engine path is :func:`verify_pairs_distributed`)."""
    out = []
    for a, b in pairs:
        j = jaccard(texts.get(a), texts.get(b), k)
        if j >= threshold:
            out.append((a, b, j))
    return out


def verify_pairs_distributed(
    ds: rd.Dataset,
    cand_pairs: list[tuple],
    *,
    threshold: float = 0.8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple]:
    """Distributed exact-Jaccard verification of candidate pairs.

    The corpus is NEVER collected: the candidate PAIR LIST (the small
    side, per the module's partitioning contract) is broadcast as a
    doc_id -> [(id_a, id_b, side)] map; one streaming pass over the
    corpus emits a (pair, side, text) row per membership, and ONE
    pair-bucketed co-group scores Jaccard. Returns verified
    (id_a, id_b, jaccard) tuples - the final result, which is small."""
    if not cand_pairs:
        return []
    NB = _n_shuffle_groups()
    need_map: dict[int, list[tuple[int, int, int]]] = {}
    for p in cand_pairs:
        a, b = int(p[0]), int(p[1])
        need_map.setdefault(a, []).append((a, b, 0))
        need_map.setdefault(b, []).append((a, b, 1))
    map_ref = ray.put(need_map)

    def emit_sides(batch: pa.Table) -> pd.DataFrame:
        m = ray.get(map_ref)
        ids = batch[id_col].to_pylist()
        texts = None
        ia, ib, side, txt = [], [], [], []
        for row_i, did in enumerate(ids):
            hits = m.get(int(did))
            if not hits:
                continue
            if texts is None:
                texts = batch[text_col].to_pylist()
            for a, b, s in hits:
                ia.append(a)
                ib.append(b)
                side.append(s)
                txt.append(texts[row_i])
        key = np.array(ia, dtype=np.int64) * np.int64(1000003) + np.array(
            ib, dtype=np.int64
        )
        return pd.DataFrame(
            {
                "id_a": pd.Series(ia, dtype="int64"),
                "id_b": pd.Series(ib, dtype="int64"),
                "side": pd.Series(side, dtype="int8"),
                text_col: pd.Series(txt, dtype="object"),
                "pb": pd.Series((key % NB + NB) % NB, dtype="int64"),
            }
        )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0][["id_a", "id_b", text_col]].rename(
            columns={text_col: "text_a"}
        )
        b = g[g["side"] == 1][["id_a", "id_b", text_col]].rename(
            columns={text_col: "text_b"}
        )
        m = a.drop_duplicates(["id_a", "id_b"]).merge(
            b.drop_duplicates(["id_a", "id_b"]), on=["id_a", "id_b"], how="inner"
        )
        # per-pair set ops are inherent to exact Jaccard; they run
        # distributed here, over candidate pairs only
        js = [jaccard(ta, tb, k) for ta, tb in zip(m["text_a"], m["text_b"])]
        m["jaccard"] = js
        m = m[m["jaccard"] >= threshold]
        return m[["id_a", "id_b", "jaccard"]]

    res = (
        ds.map_batches(emit_sides, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(score, batch_format="pandas")
    )
    return sorted(
        (int(r["id_a"]), int(r["id_b"]), float(r["jaccard"]))
        for r in res.take_all()
    )


def minhash_dedup_pairs(
    ds: rd.Dataset,
    *,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> list[tuple]:
    """End-to-end MinHash-LSH near-dup: distributed candidate
    generation then distributed exact-Jaccard verification. Only the
    candidate PAIR LIST and the verified result (both small) ever
    reach the driver."""
    cands = minhash_lsh_candidates(ds, text_col=text_col, id_col=id_col, **lsh_kwargs)
    if not cands:
        return []
    return verify_pairs_distributed(
        ds, cands, threshold=threshold, text_col=text_col, id_col=id_col
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash per document + multi-table rotated-prefix bucket
    keys. Batch-vectorized: one hash call for all tokens, bit expansion
    + segmented ``add.reduceat`` per document.

    ``n_tables`` rotated prefix windows fix the single-table recall
    hole: a pair within ``max_hamming`` whose differing bits all fall
    in THE prefix is missed by one table; with T tables the windows
    tile the word, so any pair with hamming < T is guaranteed at least
    one clean window (and larger distances are caught with high
    probability)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        prefix_bits: int = 16,
        n_tables: int = 4,
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.prefix_bits = prefix_bits
        self.n_tables = n_tables

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
        """Emit (doc_id, table_id, prefix, simhash) rows - one per
        (doc, table); the only thing that shuffles."""
        ids = batch[self.id_col].to_numpy()
        sh = self._simhashes(list(batch[self.text_col]))
        T = self.n_tables
        rot = np.uint64(64 // T)
        prefixes = np.empty((len(ids), T), dtype=np.uint64)
        for t in range(T):
            r = np.uint64(t) * rot
            rotated = (sh << r | sh >> (np.uint64(64) - r)) if t else sh
            prefixes[:, t] = rotated >> np.uint64(64 - self.prefix_bits)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, T),
                "table_id": np.tile(np.arange(T, dtype=np.int64), len(ids)),
                "prefix": prefixes.reshape(-1).astype(np.int64),
                "simhash": np.repeat(sh.astype(np.int64), T),
            }
        )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


_POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POP[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


def simhash_near_dups(
    ds: rd.Dataset,
    *,
    max_hamming: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=None,
    n_tables: int = 4,
    prefix_bits: int = 16,
    max_bucket: int = 1024,
) -> list[tuple]:
    """Near-dup (id_a, id_b, hamming) pairs whose simhashes collide in
    at least one rotated prefix table and differ by <= max_hamming bits.

    Same distributed shape as MinHash-LSH: count-aggregate finds
    colliding (table, prefix) buckets in C; only collision rows
    re-shuffle into bounded pairing groups where the XOR+popcount pair
    check runs vectorized; a final C-level aggregate dedups pairs seen
    by multiple tables. Only bucket keys are broadcast; only the final
    pair list reaches the driver."""
    hasher = SimHasher(
        text_col=text_col, id_col=id_col,
        prefix_bits=prefix_bits, n_tables=n_tables,
    )
    sig = ds.map_batches(hasher.__call__, batch_format="pandas").materialize()

    # same plan selection as MinHash: below the threshold the hot-
    # bucket prefilter is pure fixed latency (identical output - the
    # pairing kernel skips singleton runs)
    if sig.count() <= 5_000_000:
        cand = sig
    else:
        dup = _hot_buckets(sig, ["table_id", "prefix"])
        if len(dup) == 0:
            return []
        hot_by_table = {
            int(t): g["prefix"].to_numpy().astype(np.int64)
            for t, g in dup.groupby("table_id")
        }
        hot_ref = ray.put(hot_by_table)

        def in_hot(b: pd.DataFrame) -> pd.DataFrame:
            ht = ray.get(hot_ref)
            tid = b["table_id"].to_numpy()
            pf = b["prefix"].to_numpy()
            mask = np.zeros(len(b), dtype=bool)
            for t, arr in ht.items():
                sel = tid == t
                if sel.any():
                    mask[sel] = np.isin(pf[sel], arr)
            return b[mask]

        cand = sig.map_batches(in_hot, batch_format="pandas")

    def with_hamming(gs, IA, IB, df: pd.DataFrame):
        if gs is None or not len(df):
            df["hamming"] = pd.Series([], dtype="int64")
            return df
        hs = gs["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        df["hamming"] = _popcount64(hs[IA] ^ hs[IB]).astype(np.int64)
        return df[df["hamming"] <= max_hamming]

    pairs = _bucket_pairs_ds(
        cand, ["table_id", "prefix"], "doc_id", max_bucket,
        extra_emit=with_hamming,
    )
    # hamming-filtered pairs = the final result (small); dedup across
    # tables on the driver
    pr = pairs.to_pandas()
    if not len(pr):
        return []
    uniq = pr.groupby(["id_a", "id_b"], sort=False)["hamming"].min().reset_index()
    return sorted(
        (int(a), int(b), int(h))
        for a, b, h in zip(uniq["id_a"], uniq["id_b"], uniq["hamming"])
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
    n_tables: int = 4,
    target_bucket_rows: int = 128,
    max_bucket: int = 1024,
    seed: int = 99,
    dim: int | None = None,
    corpus_size: int | None = None,
) -> list[tuple]:
    """Cosine near-duplicates via BANDED random-hyperplane LSH tables.

    Scale shape: bucket count grows with the corpus (``bits`` chosen so
    expected bucket size ~= target_bucket_rows, so per-bucket all-pairs
    stays O(n * target_bucket) total, never O((n/const)^2)); ``n_tables``
    independent hyperplane sets give recall a small-angle pair loses to
    any single quantization. Two passes over the corpus: pass 1 shuffles
    only (id, table, bucket) keys into a count-aggregate; pass 2
    re-emits id+vector ONLY for rows in colliding buckets (broadcast
    bucket-key set), which then pair-check vectorized per bucket in
    bounded groups. Pairs dedup via a C-level aggregate; only the final
    pair list reaches the driver."""
    ds = ds.materialize()  # guard: upstream transforms must yield the
    # same rows on both passes; at scale the corpus is a stable parquet
    # table and this materialize is unnecessary (drop it there)
    n = corpus_size or ds.count()
    if n < 2:
        return []
    if dim is None:
        dim = len(ds.take(1)[0][vec_col])
    bits = max(1, int(np.ceil(np.log2(max(n / target_bucket_rows, 2)))))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, bits, dim))
    planes_ref = ray.put(planes)

    def _buckets(V: np.ndarray) -> np.ndarray:
        P = ray.get(planes_ref)
        out = np.empty((len(V), n_tables), dtype=np.int64)
        w = 1 << np.arange(bits, dtype=np.int64)
        for t in range(n_tables):
            signs = (V @ P[t].T) > 0
            out[:, t] = signs.dot(w)
        return out

    def keys_only(b: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        bk = _buckets(V)
        ids = b[id_col].to_numpy()
        return pd.DataFrame(
            {
                "vid": np.repeat(ids, n_tables),
                "table_id": np.tile(np.arange(n_tables, dtype=np.int64), len(ids)),
                "bucket": bk.reshape(-1),
            }
        )

    dup = _hot_buckets(
        ds.map_batches(keys_only, batch_format="pandas"), ["table_id", "bucket"]
    )
    if len(dup) == 0:
        return []
    hot_by_table = {
        int(t): g["bucket"].to_numpy().astype(np.int64)
        for t, g in dup.groupby("table_id")
    }
    hot_ref = ray.put(hot_by_table)

    def emit_hot(b: pd.DataFrame) -> pd.DataFrame:
        ht = ray.get(hot_ref)
        V = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        bk = _buckets(V)
        ids = b[id_col].to_numpy()
        rows = []
        for t in range(n_tables):
            arr = ht.get(t)
            mask = (
                np.isin(bk[:, t], arr) if arr is not None
                else np.zeros(len(ids), dtype=bool)
            )
            if mask.any():
                rows.append(
                    pd.DataFrame(
                        {
                            "vid": ids[mask],
                            "table_id": np.int64(t),
                            "bucket": bk[mask, t],
                            vec_col: list(V[mask]),
                        }
                    )
                )
        if not rows:
            return pd.DataFrame(
                {"vid": pd.Series([], dtype="int64"),
                 "table_id": pd.Series([], dtype="int64"),
                 "bucket": pd.Series([], dtype="int64"),
                 vec_col: pd.Series([], dtype="object")}
            )
        return pd.concat(rows, ignore_index=True)

    cand = ds.map_batches(emit_hot, batch_format="pandas")

    def with_cosine(gs, IA, IB, df: pd.DataFrame):
        if gs is None or not len(df):
            df["cosine"] = pd.Series([], dtype="float64")
            return df
        V = np.stack(gs[vec_col].to_numpy()).astype(np.float64)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        df["cosine"] = np.einsum("ij,ij->i", V[IA], V[IB])
        return df[df["cosine"] >= threshold]

    pairs = _bucket_pairs_ds(
        cand, ["table_id", "bucket"], "vid", max_bucket, extra_emit=with_cosine
    )
    # threshold-filtered pairs = the final result (small); dedup across
    # tables on the driver
    pr = pairs.to_pandas()
    if not len(pr):
        return []
    uniq = pr.groupby(["id_a", "id_b"], sort=False)["cosine"].max().reset_index()
    return sorted(
        (int(a), int(b), round(float(c), 6))
        for a, b, c in zip(uniq["id_a"], uniq["id_b"], uniq["cosine"])
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over candidate pairs
# ---------------------------------------------------------------------------


def dedup_clusters(
    pairs: rd.Dataset,
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 16,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Connected components over near-dup candidate pairs: the survivor-
    selection step between pair generation (minhash/simhash/embedding)
    and dedup output. Returns ``(doc_id, cluster_id)`` for every doc
    appearing in a pair, where ``cluster_id`` is the component's
    minimum doc id - keep ``doc_id == cluster_id`` (the canonical doc),
    drop the rest.

    Distributed min-label propagation (the Spark/GraphX CC recipe):
    labels start at ``min(self, min neighbor)``; each round joins
    current labels onto the symmetrized edge list (``hash_join``,
    one co-partition shuffle), propagates each node's label to its
    neighbors, and takes the per-node min. Labels only ever decrease,
    so the global label SUM is strictly monotone and equal sums mean a
    fixed point - convergence costs one tiny aggregate per round, not
    a compare join. Rounds needed = graph diameter; near-dup components
    are overwhelmingly tiny (a doc and its copies), so 2-3 rounds is
    typical and ``max_rounds`` is a runaway bound for degenerate chains.

    Scale shape: everything stays (node, label) / (src, dst) rows -
    candidate-pair scale, never corpus scale; no driver-side
    materialization. Each round is 2 shuffles of the edge list.
    """

    def sym(b: pd.DataFrame) -> pd.DataFrame:
        u = b[a_col].to_numpy(dtype=np.int64)
        v = b[b_col].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"src": np.concatenate([u, v]), "dst": np.concatenate([v, u])}
        )

    # materialize the symmetrized edge list ONCE: it is re-scanned every
    # round, and a lazy upstream (candidate generation is itself a
    # shuffle pipeline) would re-execute per round otherwise
    edges = pairs.map_batches(sym, batch_format="pandas").materialize()
    # Clamp block count: each round's sort-groupby degrades sharply with
    # many tiny blocks (measured 169s/round at ~170 5-row blocks vs
    # 1.2s/round at 8), so size blocks by BYTES with a per-CPU cap -
    # the same rule the CDC apply uses for its shuffle
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    rp = int(max(2, min(4 * ncpu, -(-edges.size_bytes() // (64 << 20)))))
    if edges.num_blocks() > 2 * rp:
        edges = edges.repartition(rp).materialize()

    # round 1 fused into initialization: label = min(self, min neighbor)
    labels = (
        bucketed_agg(edges, "src", {"dst": "min"})
        .map_batches(
            lambda b: pd.DataFrame(
                {
                    "src": b["src"].astype("int64"),
                    "label": np.minimum(
                        b["src"].to_numpy(dtype=np.int64),
                        b["dst"].to_numpy(dtype=np.int64),
                    ),
                }
            ),
            batch_format="pandas",
        )
        .repartition(rp)
        .materialize()
    )
    prev_sum = labels.sum("label")

    from .joins import hash_join

    nb = num_buckets or rp
    for _ in range(max_rounds):
        joined = hash_join(
            edges, labels, on="src", right_cols=["label"], num_buckets=nb
        )
        prop = joined.map_batches(
            lambda b: pd.DataFrame(
                {"src": b["dst"].astype("int64"),
                 "label": b["label"].astype("int64")}
            ),
            batch_format="pandas",
        )
        labels = (
            bucketed_agg(prop.union(labels).repartition(rp),
                         "src", {"label": "min"})
            .map_batches(
                lambda b: pd.DataFrame(
                    {"src": b["src"].astype("int64"),
                     "label": b["label"].astype("int64")}
                ),
                batch_format="pandas",
            )
            .repartition(rp)
            .materialize()
        )
        s = labels.sum("label")
        if s == prev_sum:  # labels only decrease: fixed point reached
            break
        prev_sum = s

    return labels.map_batches(
        lambda b: pd.DataFrame(
            {"doc_id": b["src"].astype("int64"),
             "cluster_id": b["label"].astype("int64")}
        ),
        batch_format="pandas",
    )


def near_dedup(
    ds: rd.Dataset,
    *,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_best_by: str | None = None,
    **lsh_kwargs,
) -> rd.Dataset:
    """One-call near-duplicate removal: MinHash-LSH candidate pairs ->
    exact-Jaccard verification -> connected-components clustering ->
    keep one survivor per cluster. Returns the surviving corpus as a
    streaming Dataset (schema unchanged).

    Survivor policy: by default the cluster's minimum doc id. With
    ``keep_best_by="<col>"`` the member with the LARGEST value of that
    column survives (ties -> smallest id) — the keep-the-best-quality
    variant real curation pipelines run (score with ``QualityScorer``
    / ``lm_score`` first, then dedup by that signal). Member scores
    are gathered in one streaming pass over the corpus filtered to the
    cluster members (member set is pair-bounded, so driver-sized).

    The drop set (non-canonical cluster members) is bounded by the
    verified-pair count, which already fits on the driver (pair
    generation caps degenerate buckets), so the filter is a broadcast
    ``ray.put`` set + per-batch ``isin`` - no corpus shuffle. If pair
    generation ever becomes fully dataset-native at larger-than-driver
    pair scale, swap the filter for a hash_join anti-join on id.
    """
    pairs = minhash_dedup_pairs(
        ds, threshold=threshold, text_col=text_col, id_col=id_col, **lsh_kwargs
    )
    if not pairs:
        return ds
    pairs_ds = rd.from_pandas(
        pd.DataFrame(
            {"id_a": [p[0] for p in pairs], "id_b": [p[1] for p in pairs]}
        )
    )
    clusters = dedup_clusters(pairs_ds).to_pandas()
    clusters["doc_id"] = clusters["doc_id"].astype("int64")
    if keep_best_by is None:
        drop = set(
            clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"]
            .tolist()
        )
    else:
        # broadcast the member-id ARRAY (numpy -> zero-copy plasma read
        # per task, node-local after the first get); plain task pool —
        # no actor startup, the per-task get costs nothing
        members_ref = ray.put(clusters["doc_id"].to_numpy(dtype=np.int64))

        def grab_scores(b: pd.DataFrame) -> pd.DataFrame:
            return b[b[id_col].isin(ray.get(members_ref))][[id_col, keep_best_by]]

        scores = (
            ds.map_batches(grab_scores, batch_format="pandas")
            .to_pandas()  # member-sized (pair-bounded), not corpus-sized
        )
        j = clusters.merge(scores, left_on="doc_id", right_on=id_col)
        j = j.sort_values(
            ["cluster_id", keep_best_by, "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        winners = j.groupby("cluster_id", sort=False).head(1)["doc_id"]
        drop = set(clusters["doc_id"].tolist()) - set(winners.tolist())
    drop_ref = ray.put(np.fromiter(drop, dtype=np.int64, count=len(drop)))

    def drop_filter(b: pd.DataFrame) -> pd.DataFrame:
        # zero-copy plasma read of the broadcast id array per task
        return b[~b[id_col].isin(ray.get(drop_ref))]

    return ds.map_batches(drop_filter, batch_format="pandas")


def paragraph_dedup(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Corpus-wide paragraph-level dedup (boilerplate removal): keep
    only the globally FIRST occurrence of every ``sep``-separated
    segment — first by ``(doc_id, position)`` — and rebuild each
    document from its surviving segments in order (docs whose every
    segment is a repeat survive with empty text). This is the segment-
    granular exact dedup of Lee et al.'s "Deduplicating Training Data
    Makes Language Models Better" (arXiv:2107.06499), simplified from
    suffix arrays to whole-segment identity.

    Scale shape: documents explode into (id, pos, para) rows once;
    winners = ``groupby(para).min(doc_id * 2^20 + pos)`` (one shuffle
    of segment rows; position must fit 20 bits — a >1M-segment doc is
    pathological); occurrences hash-join winners back on the segment
    (one co-group shuffle); rebuild is a bucketed group concat (~2
    buckets/CPU, vectorized within bucket). The corpus text never
    lands on the driver.

    Returns ``(id_col, text_dedup)``.
    """

    from .joins import hash_join
    from .windows import _buckets_for_cluster, _key_buckets

    nb = num_buckets or _buckets_for_cluster()
    POS_BITS = np.int64(1 << 20)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        s = b[text_col].fillna("").str.split(sep)
        e = s.explode()
        pos = e.groupby(level=0).cumcount().to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: b.loc[e.index, id_col].to_numpy(),
                "pos": pos,
                "para": e.to_numpy(),
            }
        )

    occ = ds.map_batches(explode, batch_format="pandas").materialize()

    winners = bucketed_agg(
        occ.map_batches(
            lambda b: pd.DataFrame(
                {
                    "para": b["para"],
                    "rank": b[id_col].to_numpy(dtype=np.int64) * POS_BITS
                    + b["pos"].to_numpy(dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        "para", {"rank": "min"},
    ).map_batches(
        lambda b: b.rename(columns={"rank": "keep"}), batch_format="pandas"
    )

    kept = hash_join(occ, winners, on="para", num_buckets=nb).map_batches(
        lambda b: b[
            b[id_col].to_numpy(dtype=np.int64) * POS_BITS
            + b["pos"].to_numpy(dtype=np.int64)
            == b["keep"].to_numpy(dtype=np.int64)
        ][[id_col, "pos", "para"]],
        batch_format="pandas",
    )

    # sentinel row per doc so segment-free docs still emit (id, "")
    sentinels = ds.map_batches(
        lambda b: pd.DataFrame(
            {id_col: b[id_col], "pos": np.int64(-1), "para": None}
        ),
        batch_format="pandas",
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g["pos"] >= 0].sort_values([id_col, "pos"], kind="mergesort")
        joined = real.groupby(id_col, sort=False)["para"].agg(sep.join)
        ids = g[id_col].drop_duplicates().sort_values()
        out = joined.reindex(ids).fillna("")
        return pd.DataFrame({id_col: out.index, "text_dedup": out.to_numpy()})

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_pb"] = _key_buckets(b[id_col], nb)
        return b

    return (
        kept.union(sentinels)
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(rebuild, batch_format="pandas")
    )


def window_dedup(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Sliding-window substring dedup: remove every NON-FIRST occurrence
    of any ``w``-token window (first = global min ``(doc_id, pos)``) and
    rebuild each document from its surviving tokens — the stride-1
    window approximation of Lee et al.'s suffix-array substring dedup
    (arXiv:2107.06499): any duplicated run of >= ``w`` tokens shares a
    window, so cross- AND intra-document repeats >= ``w`` tokens are
    cut at token granularity, the level between whole-segment
    (``paragraph_dedup``) and whole-doc (``exact_dedup``) identity.

    Scale shape: one streamed pass computes per-token SipHash (pandas
    ``hash_pandas_object`` — deterministic, vectorized) and rolls
    ``w``-token window keys with one ``sliding_window_view``
    multiply-sum (NO per-row Python, window STRINGS never built); the
    winner aggregate pre-reduces per block (min packed per key) so the
    groupby shuffles O(distinct windows per block) fixed-width rows,
    never text. Occurrence rows re-join winners key-bucketed
    (``hash_join``), surviving spans co-group with their documents in
    ONE more bucketed shuffle, and each bucket rebuilds vectorized
    (explode + anti-merge + C-level group concat). Corpus text crosses
    the wire once (the rebuild co-group); the driver never sees it.

    Window identity is the 64-bit rolling key — exact modulo hash
    collisions (~2^-64 per pair; swap in the raw window string as the
    key for collision-free runs at w x text shuffle cost). Tokens are
    ``\\S+`` runs; rebuilt docs are single-space joined (SQL mirror:
    ``regexp_extract_all(text, '\\S+')`` + ``string_agg(tok, ' ')``).

    Returns ``(id_col, text_dedup)``.
    """
    from .windows import _buckets_for_cluster, _key_buckets

    nb = num_buckets or _buckets_for_cluster()
    POS_BITS = np.int64(1 << 20)
    coeffs = np.multiply.accumulate(
        np.full(w, np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
    )

    def occurrences(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "whash": pd.Series(dtype="int64"),
                id_col: pd.Series(dtype="int64"),
                "pos": pd.Series(dtype="int64"),
            }
        )
        toks = b[text_col].fillna("").str.findall(r"\S+")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat = toks.explode().dropna()
        if len(flat) < w:
            return empty
        th = pd.util.hash_pandas_object(flat, index=False).to_numpy(dtype=np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(th, w)
        wh = (win * coeffs[None, :]).sum(axis=1, dtype=np.uint64)
        starts = np.r_[np.int64(0), np.cumsum(lens)[:-1]]
        gpos = np.arange(len(th) - w + 1, dtype=np.int64)
        owner = np.searchsorted(starts, gpos, side="right") - 1
        local = gpos - starts[owner]
        valid = local <= lens[owner] - w
        if not valid.any():
            return empty
        return pd.DataFrame(
            {
                "whash": wh[valid].view(np.int64),
                id_col: b[id_col].to_numpy()[owner[valid]],
                "pos": local[valid],
            }
        )

    # one whash-bucketed shuffle finds winners AND emits the non-first
    # spans in the same co-group (a whash's occurrences co-locate):
    # transform("min") is one C-level pass per bucket — no distributed
    # aggregate (Ray's combine pays per-group Python at high key
    # cardinality), no winners join.
    def bucket_by_whash(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_sb"] = _key_buckets(b["whash"], nb)
        return b

    def spans_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        packed = (
            g[id_col].to_numpy(dtype=np.int64) * POS_BITS
            + g["pos"].to_numpy(dtype=np.int64)
        )
        g = g.assign(_pk=packed)
        keep = g.groupby("whash", sort=False)["_pk"].transform("min")
        s = g[g["_pk"] != keep.to_numpy()]
        return s[[id_col, "pos"]].assign(_kind="s", **{text_col: None})

    spans = (
        ds.map_batches(occurrences, batch_format="pandas")
        .map_batches(bucket_by_whash, batch_format="pandas")
        .groupby("_sb")
        .map_groups(spans_in_bucket, batch_format="pandas")
    )

    docs = ds.map_batches(
        lambda b: pd.DataFrame(
            {
                id_col: b[id_col],
                "pos": np.int64(-1),
                "_kind": "d",
                text_col: b[text_col],
            }
        ),
        batch_format="pandas",
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["_kind"] == "d"]
        toks = d[text_col].fillna("").str.findall(r"\S+")
        ex = toks.explode().dropna()
        kept = pd.DataFrame(
            {
                id_col: d[id_col].reindex(ex.index).to_numpy(),
                "pos": ex.groupby(level=0).cumcount().to_numpy(dtype=np.int64),
                "tok": ex.to_numpy(),
            }
        )
        s = g[g["_kind"] == "s"]
        if len(s) and len(kept):
            st = s["pos"].to_numpy(dtype=np.int64)
            cov = pd.DataFrame(
                {
                    id_col: np.repeat(s[id_col].to_numpy(), w),
                    "pos": (st[:, None] + np.arange(w, dtype=np.int64)[None, :]).ravel(),
                }
            ).drop_duplicates()
            hit = kept.merge(cov, on=[id_col, "pos"], how="left", indicator=True)
            kept = kept[(hit["_merge"] == "left_only").to_numpy()]
        joined = (
            kept.sort_values([id_col, "pos"], kind="mergesort")
            .groupby(id_col, sort=False)["tok"]
            .agg(" ".join)
        )
        ids = d[id_col].drop_duplicates().sort_values()
        out = joined.reindex(ids).fillna("")
        return pd.DataFrame({id_col: out.index, "text_dedup": out.to_numpy()})

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_wb"] = _key_buckets(b[id_col], nb)
        return b

    return (
        docs.union(spans)
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_wb")
        .map_groups(rebuild, batch_format="pandas")
    )
