"""Incrementally-maintained search index: an inverted-index LAKE kept
in sync with the transcript lake from its change data feed.

``functions.text.inverted_index`` builds postings from scratch - the
right tool once. A 100-TB lake that keeps moving needs the index
MAINTAINED: each refresh folds only the conversations whose visible
state changed since the last refresh, exactly the ``matview`` pattern
(CDF names the work; pruned point-reads do the work; the result lands
through the ordinary exactly-once apply), composed with the text
tokenizer. Zero new distributed machinery:

* The index IS a lake table keyed on ``(term, conv_id)`` - one row per
  term occurrence set, ``n_occurrences`` counting the term across the
  conversation's turns. Hash-partitioned by term, so a term lookup is
  the same pruned point-read every other lake enjoys; it inherits
  exactly-once commits, kill-resume, time travel and its own CDF.
* A refresh diffs each affected conversation's term multiset between
  the PREVIOUS source snapshot (version=last folded) and the current
  one - both via the partition-pruned ``read_conversations`` path - and
  emits an ordinary change stream: U rows for new/changed (term, conv)
  counts, D rows for terms the conversation no longer contains.
  Unchanged terms emit nothing, so refresh cost is O(changed terms).
* Exactly-once refresh: staged changelog behind a ``_STAGED`` marker,
  consumer checkpoint advanced only after the apply commits - a crash
  re-derives the same deterministic range and the apply no-ops (same
  contract as ``refresh_rollup``).

Driver-side bound, stated: the refresh collects the affected conv ids
and the per-(term, conv) diff rows - O(delta terms), independent of
lake or index size.

Reference parity: the reference ships silver to a Glue catalog so
Athena can scan it (`infra/terraform/modules/glue_catalog/main.tf`);
term search there is a full scan per query. This is the maintained
index that setup is missing.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..schema import TS_TYPE, DQRules, TableSpec, default_spec
from ..sources.changelog import list_changelog_files, stage_changes
from ..state.manifest import ManifestStore, _atomic_write
from .cdc import apply_changes, read_conversations
from .cdf import table_changes

TOKEN_RE = r"[a-z0-9]+"  # matches functions.text / the SQL oracles

INDEX_SCHEMA = pa.schema(
    [
        pa.field("term", pa.string()),
        pa.field("conv_id", pa.string()),
        pa.field("n_occurrences", pa.int64()),
    ]
)


def index_spec(num_partitions: int = 16) -> TableSpec:
    """TableSpec for the search-index lake. Keyed (term, conv_id),
    hash-partitioned by term: a term's postings are one pruned point
    lookup. Stop-word-grade terms make hot partitions - cap them out
    with ``max_df`` at refresh time (mirrored in any oracle) or salt
    them via the ordinary hot-key machinery."""
    fields = list(INDEX_SCHEMA)
    fields.append(pa.field("ts", TS_TYPE))
    return default_spec(
        name="search_index",
        key_cols=("term", "conv_id"),
        payload_schema=pa.schema(fields),
        num_partitions=num_partitions,
        hot_keys=(),
        dq=DQRules(
            not_null=("term", "conv_id", "ts"),
            unique=(("term", "conv_id"),),
            ranges={},
        ),
    )


def _version_ts(source_version: int) -> pd.Timestamp:
    return pd.Timestamp(source_version, unit="s")


def _term_counts(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch (conv_id, term, n) partial counts - one findall +
    explode + C-level groupby, no Python per row. Combinable by sum
    (a conversation's turns may span batches)."""
    toks = batch["text"].fillna("").str.lower().str.findall(TOKEN_RE)
    ex = toks.explode().dropna()
    if not len(ex):
        return pd.DataFrame({"conv_id": [], "term": [], "n": []})
    df = pd.DataFrame(
        {"conv_id": batch["conv_id"].reindex(ex.index), "term": ex}
    )
    out = df.groupby(["conv_id", "term"], sort=False).size().reset_index(name="n")
    out["n"] = out["n"].astype("int64")
    return out


def _conv_terms(source_lake: str, conv_ids: list[str], version: int) -> pd.DataFrame:
    """(conv_id, term, n) for the given conversations at a pinned
    snapshot, via the pruned point-read path. Empty for version 0."""
    if version <= 0 or not conv_ids:
        return pd.DataFrame({"conv_id": [], "term": [], "n": []})
    src = read_conversations(
        source_lake, conv_ids, version=version, columns=["conv_id", "text"]
    )
    parts = src.map_batches(_term_counts, batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.DataFrame({"conv_id": [], "term": [], "n": []})
    out = parts.groupby(["conv_id", "term"], sort=False)["n"].sum().reset_index()
    out["n"] = out["n"].astype("int64")
    return out


def _ckpt_path(index_dir: str) -> str:
    from ..state.lakefs import lakefs

    return lakefs(index_dir).full("_source_version.json")


def last_indexed_version(index_dir: str) -> int:
    from ..state.lakefs import fs_for

    p = _ckpt_path(index_dir)
    if fs_for(p).exists(p):
        return json.loads(fs_for(p).read_text(p))["source_version"]
    return 0


def refresh_search_index(
    source_lake: str,
    index_dir: str,
    *,
    num_partitions: int = 16,
    max_df: int | None = None,
    **apply_kwargs,
) -> dict:
    """Fold all source commits since the last refresh into the index.
    ``max_df``: drop terms occurring in more than this many AFFECTED
    conversations per refresh batch (a stop-word valve; exactness
    against a from-scratch oracle requires None or mirroring the cap).
    Returns {"from_version", "to_version", "affected", "upserts",
    "deletes", "committed"}."""
    store = ManifestStore(source_lake)
    cur_m = store.load()
    cur = cur_m.version if cur_m else 0
    last = last_indexed_version(index_dir)
    if cur <= last:
        return {
            "from_version": last,
            "to_version": last,
            "affected": 0,
            "upserts": 0,
            "deletes": 0,
            "committed": 0,
        }

    feed = table_changes(source_lake, last, cur)

    def _keys(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "conv_id" not in b.column_names:
            return pa.table({"conv_id": pa.array([], pa.string())})
        return pa.table({"conv_id": b["conv_id"].cast(pa.string())})

    aff_tbl = feed.map_batches(_keys, batch_format="pyarrow").to_pandas()
    affected = sorted(set(aff_tbl["conv_id"].dropna()))

    spec = index_spec(num_partitions)
    from ..state.lakefs import fs_for, lakefs

    stage_dir = lakefs(index_dir).full("_refresh", f"v{last:08d}-{cur:08d}")
    marker = stage_dir.rstrip("/") + "/_STAGED"
    n_up = n_del = 0

    if affected and not fs_for(marker).exists(marker):
        new = _conv_terms(source_lake, affected, cur)
        old = _conv_terms(source_lake, affected, last)
        if max_df is not None and len(new):
            df_ = new.groupby("term")["conv_id"].nunique()
            new = new[~new["term"].isin(df_[df_ > max_df].index)]
        diff = old.merge(
            new, on=["conv_id", "term"], how="outer", suffixes=("_old", "_new")
        )
        ups = diff[
            diff["n_new"].notna()
            & ((diff["n_old"].isna()) | (diff["n_old"] != diff["n_new"]))
        ]
        dels = diff[diff["n_new"].isna()]
        changes = pd.DataFrame(
            {
                "op": ["U"] * len(ups) + ["D"] * len(dels),
                "term": pd.concat([ups["term"], dels["term"]], ignore_index=True),
                "conv_id": pd.concat(
                    [ups["conv_id"], dels["conv_id"]], ignore_index=True
                ),
                "n_occurrences": pd.array(
                    list(ups["n_new"].astype("int64")) + [pd.NA] * len(dels),
                    dtype="Int64",
                ),
            }
        )
        changes = changes.sort_values(
            ["term", "conv_id"], ignore_index=True
        )
        changes["seq"] = range(len(changes))
        changes["ts"] = _version_ts(cur)
        n_up, n_del = len(ups), len(dels)
        if len(changes):
            tbl = pa.Table.from_pandas(changes, preserve_index=False)
            tbl = tbl.set_column(
                tbl.column_names.index("ts"), "ts", tbl["ts"].cast(TS_TYPE)
            )
            stage_changes(tbl, stage_dir)

    committed = []
    if fs_for(marker).exists(marker):
        committed = apply_changes(
            list_changelog_files(stage_dir), index_dir, spec, **apply_kwargs
        )

    lakefs(index_dir).makedirs(index_dir)
    _atomic_write(_ckpt_path(index_dir), json.dumps({"source_version": cur}))
    return {
        "from_version": last,
        "to_version": cur,
        "affected": len(affected),
        "upserts": n_up,
        "deletes": n_del,
        "committed": len(committed),
    }


def search(index_dir: str, term: str, version: int | None = None) -> rd.Dataset:
    """Postings lookup: the conversations containing ``term`` (with
    occurrence counts) via the pruned point-read path - hash-partition
    pruning on the term plus per-file zone maps inside the partition."""
    return read_conversations(
        index_dir, [term], version=version,
        columns=["term", "conv_id", "n_occurrences"],
    )


def read_index(
    index_dir: str, columns: list[str] | None = None, version: int | None = None
) -> rd.Dataset:
    from .cdc import read_table

    return read_table(index_dir, columns=columns, version=version)
