"""Incremental corpus dedup: dedupe NEW documents against everything
ever ingested, as a composition of the engine's own CDC primitives.

A 100-TB training-data pipeline never dedupes a static corpus once; it
dedupes a STREAM of crawl/ingest batches against the full history. The
reference has no such surface (its idempotency is object-level only,
``Makefile:344-359`` verify-idempotency); this module supplies it with
zero new distributed machinery:

* The dedup index IS a lake table keyed on ``text_hash`` (md5 hex of
  the exact text bytes), maintained by the same ``apply_changes``
  upsert path as any other table - so it inherits hash partitioning,
  exactly-once manifest commits, kill-resume, rebalance, gc and time
  travel for free. The full document payload rides along in the index
  row, which makes the index table itself the deduped corpus.
* First-writer-wins is expressed THROUGH the engine's LWW merge by
  ordering trick: every change event carries the same constant ``ts``
  and ``seq = -doc_id``, so "greatest (ts, seq)" = "smallest doc_id"
  and the first-ever document for a hash can never be displaced.
  Because a later duplicate never changes the stored row, the change
  data feed between the pre- and post-apply versions contains exactly
  the keys that are NEW - i.e. the change feed IS the survivor stream.
* Exactly-once survivor emission: re-ingesting an already-applied
  batch is a no-op apply (object-level idempotency), the version does
  not advance, and the feed is empty - a downstream consumer appending
  survivors to a training corpus never sees a document twice.

Scale shape: one shuffle of the new batch (hash-partition by
``text_hash``), LSM delta-append against only the touched partitions,
then a change-feed diff that reads only partitions whose file lists
changed. Nothing rereads the full index; the driver never sees row
data.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..schema import TS_TYPE, DQRules, TableSpec, default_spec
from ..state.manifest import ManifestStore
from .cdc import apply_changes
from .cdf import table_changes

#: Constant event time for every index insert: with equal ``ts``, the
#: LWW tie-break on ``seq = -doc_id`` decides, and min-doc_id wins.
_EPOCH_US = 0

INDEX_KEY = "text_hash"


def dedup_index_spec(
    doc_schema: pa.Schema,
    *,
    num_partitions: int = 64,
    name: str = "dedup_index",
) -> TableSpec:
    """TableSpec for a dedup-index lake over documents with the given
    payload schema. Key = md5 content hash; single-column key, so no
    hot-key salting (a cryptographic hash key is uniform)."""
    fields = [pa.field(INDEX_KEY, pa.string())]
    fields += [f for f in doc_schema if f.name != INDEX_KEY]
    if "ts" not in [f.name for f in fields]:
        fields.append(pa.field("ts", TS_TYPE))
    return default_spec(
        name=name,
        key_cols=(INDEX_KEY,),
        payload_schema=pa.schema(fields),
        num_partitions=num_partitions,
        hot_keys=(),
        dq=DQRules(
            not_null=(INDEX_KEY, "ts"),
            unique=((INDEX_KEY,),),
            ranges={},
        ),
    )


def _hash_and_envelope(batch: pd.DataFrame, text_col: str, id_col: str) -> pd.DataFrame:
    """Per-batch event builder: md5 content hash (matches SQL
    ``md5(text)``), CDC envelope op='I', first-writer-wins ordering
    (constant ts, ``seq = -doc_id``). Null texts hash to null and are
    quarantined by normalize's null-key rule, mirroring the oracle's
    ``WHERE text IS NOT NULL``."""
    texts = batch[text_col]
    batch = batch.copy()
    batch[INDEX_KEY] = [
        hashlib.md5(t.encode()).hexdigest() if isinstance(t, str) else None
        for t in texts
    ]
    batch["op"] = "I"
    batch["seq"] = -batch[id_col].astype("int64")
    batch["ts"] = pd.Timestamp(_EPOCH_US, unit="us")
    return batch


def ingest_unique(
    docs: rd.Dataset,
    index_dir: str,
    *,
    batch_label: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    now: str | None = None,
    **apply_kwargs,
) -> rd.Dataset:
    """Ingest a document batch into the dedup-index lake and return the
    SURVIVORS: documents whose content was never seen before (neither
    in any earlier batch nor earlier - by doc_id - in this one).

    ``batch_label`` names the logical batch; the staged change files
    are written once under ``<index>/_ingest/<label>/`` and reused on
    replay, so the whole call is idempotent end-to-end: same label →
    same staged files → no-op apply → empty survivor feed.

    ``doc_id`` must be monotone in arrival order across batches (the
    usual crawl/ingest id discipline); it is the first-writer-wins
    ordering. Returns a Dataset with the index payload columns (hash +
    full document payload).
    """
    base = docs.schema().base_schema
    if isinstance(base, pa.Schema):
        doc_schema = base
    else:  # PandasBlockSchema (e.g. from_pandas input)
        doc_schema = pa.schema(
            [
                pa.field(n, pa.from_numpy_dtype(t) if t != object else pa.string())
                for n, t in zip(base.names, base.types)
            ]
        )
    spec = dedup_index_spec(doc_schema, num_partitions=num_partitions)

    from ..sources.changelog import stage_changes

    events = docs.map_batches(
        _hash_and_envelope,
        batch_format="pandas",
        fn_kwargs={"text_col": text_col, "id_col": id_col},
    )
    from ..state.lakefs import lakefs

    files = stage_changes(events, lakefs(index_dir).full("_ingest", batch_label))

    store = ManifestStore(index_dir)
    before = store.load()
    v_before = before.version if before else 0

    committed = apply_changes(files, index_dir, spec, now=now, **apply_kwargs)
    if not committed:
        # replayed batch: nothing new can have appeared
        empty = spec.payload_schema.empty_table()
        return rd.from_arrow(empty)

    # Under first-writer-wins an existing key's row never changes, so
    # the feed from v_before to CURRENT is exactly the new keys.
    feed = table_changes(index_dir, v_before, key_cols=(INDEX_KEY,))
    out_schema = spec.payload_schema

    def strip(b: pa.Table) -> pa.Table:
        # empty diff groups arrive as schemaless blocks: pin the
        # payload schema so an all-duplicate batch still yields a
        # typed (0-row) survivor Dataset
        if b.num_rows == 0 or "change_op" not in b.column_names:
            return out_schema.empty_table()
        keep = b.filter(pa.compute.equal(b["change_op"], pa.scalar("U")))
        cols = [
            keep[n].cast(f.type) if n in keep.column_names else pa.nulls(len(keep), f.type)
            for n, f in zip(out_schema.names, out_schema)
        ]
        return pa.table(cols, names=list(out_schema.names))

    out = feed.map_batches(strip, batch_format="pyarrow")
    # An all-duplicate batch diffs to only schemaless empty blocks (a
    # Ray sort/map_groups artifact that map_batches never sees and
    # that poisons to_pandas/select downstream). Materialize once -
    # bounded by the INGEST INCREMENT, never the corpus, so it holds
    # at 100 TB - and pin the typed empty when nothing survived; the
    # materialization also saves consumers a second diff execution.
    mat = out.materialize()
    if mat.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    return mat


def read_unique_corpus(
    index_dir: str, columns: list[str] | None = None, version: int | None = None
) -> rd.Dataset:
    """The deduped corpus = the index table itself (payload rides in
    the index rows). Partition-pruned, snapshot-consistent read via the
    ordinary lake read path."""
    from .cdc import read_table

    return read_table(index_dir, columns=columns, version=version)
