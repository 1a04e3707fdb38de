"""Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference
serverless ELT pipeline (``wyang10/AWS-Serverless-ELT-Pipeline-Enterprise``)
as idiomatic Ray Data: a changelog tailer reads insert/update/delete
events over conversation-transcript Parquet, hash-partitions by
``conv_id`` (with hot-key salting), and applies idempotent
last-writer-wins upserts keyed on ``(conv_id, turn_idx)`` via
``map_batches`` over zero-copy Arrow batches, with a transactional
manifest commit for exactly-once sink semantics, checkpoint/resume,
additive schema evolution, DQ gates, quarantine, and compaction.

Import as ``import aws_serverless_elt_pipeline_enterprise_ray as engine``.
"""

import logging as _logging


class _EmptyBlockSchemaNoise(_logging.Filter):
    """Drop ONLY the empty-block variant of Ray's schema-mismatch
    warning. Ray's sort exchange emits zero-row, zero-column blocks
    whenever output partitions outnumber distinct sort keys (small
    inputs / many CPUs), and the streaming executor then warns
    ``new schema: ...(names=[], types=[])`` once per empty partition —
    pure spam that buries real schema divergence. Genuine mismatches
    (two non-empty schemas) still pass through."""

    _NOISE = (
        "new schema: PandasBlockSchema(names=[], types=[])",
        "new schema: Schema([])",
    )

    def filter(self, record: _logging.LogRecord) -> bool:
        msg = record.getMessage()
        if "different schema" not in msg:
            return True
        return not any(s in msg for s in self._NOISE)


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyBlockSchemaNoise())


class _EmptyBlockSizeNoise(_logging.Filter):
    """Drop ONLY the zero-row variant of Ray's pandas size-estimation
    warning. ``PandasBlockAccessor.size_bytes`` np.vectorizes
    ``getsizeof`` over object columns; on a ZERO-ROW block (a join
    bucket with no matches, a sort partition with no keys) vectorize
    refuses size-0 input, Ray logs one warning PER COLUMN per empty
    block and falls back — the fallback (size 0) is exactly right, so
    the warning is pure spam. Genuine size-estimation failures on
    non-empty columns still pass through."""

    def filter(self, record: _logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not (
            "Error calculating size" in msg and "size 0 inputs" in msg
        )


_logging.getLogger("ray.data._internal.pandas_block").addFilter(
    _EmptyBlockSizeNoise()
)


def _prewarm_fragile_imports() -> None:
    """Ray's path resolution runs ``from fsspec.implementations.http
    import HTTPFileSystem`` on every ``read_parquet``. When aiohttp is
    absent that module import FAILS, and a failed import is removed
    from ``sys.modules`` each time - so two threads resolving paths
    concurrently (e.g. pipelined commits: chunk k+1's build thread vs
    chunk k's merge) can observe a partially-initialized module and die
    with a plain ImportError that Ray's ``except ModuleNotFoundError``
    does not handle. Resolve once at import: if the real module cannot
    load, install a minimal stub whose ``HTTPFileSystem`` is a class no
    filesystem is an instance of - Ray's isinstance check then returns
    False deterministically, which is exactly the no-aiohttp semantics."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel: isinstance() is always False
            def __init__(self, *a, **k):
                raise ModuleNotFoundError("aiohttp is not installed")

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_prewarm_fragile_imports()

from .schema import (
    CHANGELOG_SCHEMA,
    TRANSCRIPT_SCHEMA,
    TableSpec,
    default_spec,
)
from .pipelines.cdc import (
    apply_changes,
    apply_dataset,
    read_key_range,
    read_table,
    read_time_range,
    read_where,
)
from .pipelines.branch import merge_branch
from .pipelines.ddl import add_column, drop_column
from .pipelines.diff import diff_lakes, diff_summary
from .pipelines.dml import (
    delete_where,
    explain_where,
    merge_into,
    scan_where,
    update_where,
)
from .state.manifest import Manifest, ManifestStore
from .state.txn import Transaction, TxnCatalog, read_table_at

__all__ = [
    "Transaction",
    "TxnCatalog",
    "read_table_at",
    "CHANGELOG_SCHEMA",
    "TRANSCRIPT_SCHEMA",
    "TableSpec",
    "default_spec",
    "apply_changes",
    "apply_dataset",
    "read_key_range",
    "read_table",
    "read_time_range",
    "read_where",
    "scan_where",
    "delete_where",
    "update_where",
    "merge_into",
    "explain_where",
    "add_column",
    "drop_column",
    "merge_branch",
    "diff_lakes",
    "diff_summary",
    "Manifest",
    "ManifestStore",
]

__version__ = "0.1.0"
