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
