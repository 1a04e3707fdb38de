"""Bloom-filter join pruning: drop non-matching big-side rows BEFORE
the join shuffle.

At 100 TB the dominant cost of ``big ⋉ small`` is shuffling the big
side; when the small side is too large to broadcast as an exact hash
set but its KEY SET fits a few megabytes of bits, the classic fix is a
Bloom filter: build a compact bitset over the small side's join keys,
broadcast it once (``ray.put``, read per actor in ``__init__``), and
membership-test every big-side batch vectorized — only survivors (true
matches + the filter's ~1% false positives) enter the exact join,
which removes the false positives. Result is EXACTLY the semi join;
the bloom only cuts exchange volume (by the join's selectivity).

Scale shape: the build is a per-batch partial bitmap OR-combined into
one array — each partial is ``m/8`` bytes regardless of row count, so
a tree combine is only needed when block count × filter size outgrows
the driver (``fan_in`` tier below, same pattern as stages/exchange).
Hashing is pandas' SipHash (``hash_pandas_object``) — deterministic
across processes (unlike builtin ``hash``), vectorized, and turned
into ``k`` probe positions by Kirsch–Mitzenmacher double hashing.

Reference parity: the reference pushes join pruning into Athena/Glue
(engine-internal dynamic filters); this is that optimization made
explicit for pipelines the user composes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _positions(values: pd.Series, num_bits: int, num_hashes: int) -> np.ndarray:
    """(len(values), num_hashes) probe positions. ``num_bits`` must be
    a power of two (mask, not modulo)."""
    h = pd.util.hash_pandas_object(values, index=False).to_numpy(dtype=np.uint64)
    h1 = h
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd => full-period stride
    ks = np.arange(num_hashes, dtype=np.uint64)
    mask = np.uint64(num_bits - 1)
    return (h1[:, None] + ks[None, :] * h2[:, None]) & mask


class Bloom:
    """Immutable bitset + parameters; cheap to ``ray.put`` and share."""

    def __init__(self, bits: np.ndarray, num_bits: int, num_hashes: int):
        self.bits = bits  # packed uint8, little-endian bit order
        self.num_bits = num_bits
        self.num_hashes = num_hashes

    def contains(self, values: pd.Series) -> np.ndarray:
        """Vectorized membership test (no false negatives)."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions(values, self.num_bits, self.num_hashes)
        byte_ = (pos >> np.uint64(3)).astype(np.int64)
        bit_ = pos & np.uint64(7)
        probes = (self.bits[byte_] >> bit_.astype(np.uint8)) & 1
        hit = probes.all(axis=1)
        # null keys never match (SQL IN semantics)
        return hit & values.notna().to_numpy()


def build_bloom(
    keys: rd.Dataset,
    col: str,
    *,
    expected_keys: int | None = None,
    bits_per_key: int = 10,
    num_hashes: int = 7,
    fan_in: int = 64,
) -> Bloom:
    """Build a Bloom filter over ``keys[col]`` (~1% false positives at
    the default 10 bits/key, k=7). ``expected_keys`` defaults to
    ``keys.count()`` — pass it when known to skip that execution.

    Partial bitmaps are fixed-size, so the combine is bytes-bounded:
    driver-OR for few blocks, a ``fan_in``-ary task tree beyond."""
    if expected_keys is None:
        # materialize the (small by definition) key side once: count()
        # comes free from block metadata and the partial pass reuses
        # the same blocks instead of re-executing the upstream
        keys = keys.materialize()
        expected_keys = keys.count()
    num_bits = 1 << max(10, int(np.ceil(np.log2(max(expected_keys, 1) * bits_per_key))))
    nbytes = num_bits // 8

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nbytes, dtype=np.uint8)
        vals = b[col].dropna()
        if len(vals):
            pos = _positions(vals, num_bits, num_hashes).ravel()
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    parts = keys.map_batches(partial, batch_format="pandas").take_all()
    bufs = [np.frombuffer(r["bits"], dtype=np.uint8) for r in parts]

    @ray.remote
    def _or(*chunks):
        return np.bitwise_or.reduce(np.stack(chunks))

    while len(bufs) > fan_in:
        bufs = ray.get(
            [_or.remote(*bufs[lo:lo + fan_in]) for lo in range(0, len(bufs), fan_in)]
        )
    bits = np.bitwise_or.reduce(np.stack(bufs)) if bufs else np.zeros(nbytes, np.uint8)
    return Bloom(bits, num_bits, num_hashes)


def bloom_prefilter_batch(b: pd.DataFrame, *, bloom_ref, col: str) -> pd.DataFrame:
    """Task-based ``map_batches`` stage: keep rows whose key MIGHT be
    in the filter. The Bloom rides the object store (``ray.put`` once,
    the ref ships in the task spec); ``ray.get`` here is a zero-copy
    plasma read cached per node — never a re-ship per batch. Tasks
    (not an actor pool) so the stage scales to every CPU with no
    pool-spawn latency — there is no per-actor state to amortize."""
    bloom: Bloom = ray.get(bloom_ref)
    return b[bloom.contains(b[col])]


def bloom_semi_join(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    *,
    on: str,
    expected_keys: int | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Exact ``left ⋉ right_keys`` on ``on``, with a Bloom prefilter so
    only probable matches pay the join shuffle. ``right_keys`` must
    carry the join column under the same name."""
    from .joins import hash_join

    # one materialization serves both the bloom build and the exact
    # join (the key side is small by definition; without this the lazy
    # upstream re-executes once per consumer)
    right_keys = right_keys.materialize()
    if expected_keys is None:
        expected_keys = right_keys.count()
    bloom = build_bloom(right_keys, on, expected_keys=expected_keys)
    bloom_ref = ray.put(bloom)
    survivors = left.map_batches(
        bloom_prefilter_batch,
        batch_format="pandas",
        fn_kwargs={"bloom_ref": bloom_ref, "col": on},
    )
    # exact semi join over the (much smaller) survivor stream removes
    # the bloom's false positives
    return hash_join(survivors, right_keys, on=on, how="semi",
                     num_buckets=num_buckets)


def sidecar_tester(fs):
    """Cached reader/tester of the per-file key Bloom sidecars written
    by ``stages.merge.file_entry`` — the ONE implementation shared by
    every sidecar consumer (point lookups in ``cdc.read_conversations``,
    DML predicate pruning in ``pipelines.dml``). Returns
    ``may(file_entry, keys) -> bool``: False only when the sidecar
    proves none of ``keys`` (list/Series of strings) is in the file;
    a missing, truncated or unreadable sidecar means "read the file"
    (no false negatives, so dropping a negative file cannot change an
    LWW merge)."""
    import numpy as np
    import pandas as pd

    cache: dict = {}

    def may(f: dict, keys) -> bool:
        bp = f.get("bloom")
        if not bp:
            return True
        bl = cache.get(bp)
        if bl is None:
            try:
                raw = fs.read_bytes(fs.full(bp))
                bl = (
                    Bloom(
                        np.frombuffer(raw, dtype=np.uint8),
                        f["bloom_bits"], f["bloom_k"],
                    )
                    if len(raw) * 8 == f["bloom_bits"]
                    else True  # truncated sidecar: read the file
                )
            except Exception:
                bl = True
            cache[bp] = bl
        if bl is True:
            return True
        return bool(bl.contains(pd.Series(keys)).any())

    return may
