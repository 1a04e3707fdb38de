"""Row-level lake diff — the anti-entropy audit.

``diff_lakes(a, b)`` classifies every key across two lakes (or two
versions/tags of lakes) as ``only_a`` / ``only_b`` / ``changed``
(identical rows are dropped): the tool behind "did the replica
converge", "what exactly did this branch change before I publish it",
"what did that backfill touch", and "does the restored lake equal the
snapshot" — questions the reference answers only by full Athena
re-scans on both sides.

Scale shape: BOTH sides stream through ONE co-partitioning
``hash_join`` (full outer on the key columns; the join carries key +
payload columns, nothing driver-side); presence markers distinguish an
absent row from a present row with NULL payload; the change test is a
vectorized null-safe ``IS DISTINCT FROM`` across the shared payload
columns. Output is a Dataset of (key cols..., diff) — consume it
streaming or count per class.

Time travel composes: ``diff_lakes(lake, lake, version_a=5,
version_b=9)`` is "what changed between v5 and v9" by STATE
comparison — the set-level complement of ``pipelines/cdf`` (which
reports the same delta from file lineage without reading both full
states; use the CDF when versions are adjacent and the lake is huge,
use diff when comparing unrelated lakes/branches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..schema import TableSpec, default_spec
from ..state.manifest import ManifestStore, manifest_payload_schema


def diff_lakes(
    a_dir: str,
    b_dir: str,
    spec: TableSpec | None = None,
    *,
    version_a: int | str | None = None,
    version_b: int | str | None = None,
) -> rd.Dataset:
    """Dataset of (key columns..., ``diff``) for every key whose state
    differs between the two sides; ``diff`` in ``only_a`` / ``only_b``
    / ``changed``. Identical keys produce no row."""
    from ..functions.joins import hash_join
    from .cdc import read_table

    ma = ManifestStore(a_dir).load(version_a)
    mb = ManifestStore(b_dir).load(version_b)
    if ma is None or mb is None:
        raise FileNotFoundError("both sides need a committed version")
    # Key columns are a property of the LAKES (recorded in each
    # manifest's partitioning block), not of the caller's default
    # config: a custom-key lake must diff on its own key grain.
    ka = tuple(ma.partitioning.get("key_cols") or ())
    kb = tuple(mb.partitioning.get("key_cols") or ())
    if ka and kb and ka != kb:
        raise ValueError(
            f"key_cols disagree between sides: {a_dir} has {ka}, "
            f"{b_dir} has {kb}; diff needs one key grain"
        )
    recorded = ka or kb
    if spec is None:
        key_cols = list(recorded) if recorded else list(default_spec().key_cols)
    else:
        if recorded and tuple(spec.key_cols) != recorded:
            raise ValueError(
                f"spec.key_cols {tuple(spec.key_cols)} do not match the "
                f"lakes' recorded key_cols {recorded}"
            )
        key_cols = list(spec.key_cols)
    pa_names = set(manifest_payload_schema(ma).names)
    pb_names = set(manifest_payload_schema(mb).names)
    # compare the shared payload surface; a column present on one side
    # only cannot be equal and is reported via `changed` only when the
    # caller keeps it in BOTH schemas (schema diffs are DDL territory)
    cmp_cols = sorted((pa_names & pb_names) - set(key_cols))

    def mark(col):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                col, pa.array(np.ones(len(t), dtype=np.int8))
            )

        return fn

    da = read_table(a_dir, version=version_a, columns=key_cols + cmp_cols
                    ).map_batches(mark("_pa"), batch_format="pyarrow")
    db = read_table(b_dir, version=version_b, columns=key_cols + cmp_cols
                    ).map_batches(mark("_pb"), batch_format="pyarrow")

    joined = hash_join(da, db, on=key_cols, how="outer", suffix="_b")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        in_a = df["_pa"].notna()
        in_b = df["_pb"].notna()
        changed = pd.Series(False, index=df.index)
        for c in cmp_cols:
            l, r = df[c], df[c + "_b"]
            # null-safe IS DISTINCT FROM, vectorized
            changed |= (l != r) & ~(l.isna() & r.isna())
        out = df[key_cols].copy()
        out["diff"] = np.select(
            [~in_b, ~in_a, changed],
            ["only_a", "only_b", "changed"],
            default="",
        )
        return out[out["diff"] != ""]

    return joined.map_batches(classify, batch_format="pandas")


def diff_summary(a_dir: str, b_dir: str, **kw) -> dict:
    """Count per diff class (empty dict = the sides are identical)."""
    ds = diff_lakes(a_dir, b_dir, **kw)
    out: dict[str, int] = {}
    for b in ds.iter_batches(batch_format="pandas", batch_size=65536):
        for k, v in b["diff"].value_counts().items():
            out[k] = out.get(k, 0) + int(v)
    return out
