"""Change-log discovery and reading.

The reference discovers work via S3 ``ObjectCreated`` events
(``lambdas/shared/utils.py:60-71`` ``parse_s3_event_records``) and
gates re-processing with a DynamoDB ``s3://bucket/key#etag`` record
(``lambdas/ingest/app.py:43-44``). Our change log is a directory of
ordered Parquet files (the "binlog/WAL"); discovery is a driver-side
listing sorted by name, minus the files already recorded as applied in
the current manifest's checkpoint - same object-level idempotency,
no external service.

Reading handles additive schema evolution: files written after a new
column appears are read in their own schema group and the groups are
unioned; ``normalize_batch`` pads earlier files with nulls.
"""

from __future__ import annotations

import fnmatch
import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..state.lakefs import fs_for


def list_changelog_files(changelog_dir: str, pattern: str = "*.parquet") -> list[str]:
    fs = fs_for(changelog_dir)
    if fs.is_object:
        return sorted(
            changelog_dir.rstrip("/") + "/" + n
            for n in fs.listdir(changelog_dir)
            if fnmatch.fnmatch(n, pattern)
        )
    return sorted(glob.glob(os.path.join(changelog_dir, pattern)))


def discover_pending(
    changelog_dir: str,
    applied: set[str] | None = None,
    pattern: str = "*.parquet",
    manifest=None,
) -> list[str]:
    """Files not yet applied, in log order (name order == emit order).

    Pass ``manifest`` (the current committed one) for watermark-aware
    membership: every file sorting <= the dir's applied watermark is
    applied, plus the explicit exception set - the compact checkpoint
    representation (see ``state.manifest.Manifest.applied_watermarks``)."""
    files = list_changelog_files(changelog_dir, pattern)
    if manifest is not None:
        return [p for p in files if not manifest.is_applied(p)]
    applied = applied or set()
    return [
        p for p in files
        if os.path.abspath(p) not in applied and p not in applied
    ]


def peek_schemas(files: list[str]) -> dict[str, pa.Schema]:
    """Cheap footer-only schema read per file (no data IO); threaded -
    hundreds of serial footer reads otherwise add ~1s of driver-side
    serial time to every apply."""
    from concurrent.futures import ThreadPoolExecutor

    def rs(p: str) -> pa.Schema:
        return fs_for(p).read_parquet_schema(p)

    if len(files) <= 4:
        return {p: rs(p) for p in files}
    with ThreadPoolExecutor(max_workers=16) as ex:
        schemas = list(ex.map(rs, files))
    return dict(zip(files, schemas))


def group_by_schema(
    files: list[str], schemas: dict[str, pa.Schema] | None = None
) -> list[list[str]]:
    """Group files by identical schema so each group reads cleanly;
    preserves log order within groups. Pass ``schemas`` (from
    ``peek_schemas``) to avoid re-reading footers."""
    schemas = schemas or {}
    groups: dict[str, list[str]] = {}
    for p in files:
        sch = schemas.get(p)
        if sch is None:
            sch = fs_for(p).read_parquet_schema(p)
        key = json.dumps(
            [(f.name, str(f.type)) for f in sch], sort_keys=False
        )
        groups.setdefault(key, []).append(p)
    return list(groups.values())


def read_changelog(files: list[str], columns: list[str] | None = None) -> rd.Dataset:
    """Ray Dataset over change files, tolerant of additive schema
    drift across files (union of per-schema-group reads)."""
    groups = group_by_schema(files)
    datasets = [fs_for(g[0]).ray_read_parquet(g, columns=columns) for g in groups]
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)
    return ds


def read_changelog_jsonl(files: list[str]) -> rd.Dataset:
    """Compat reader for the reference's bronze format: newline-
    delimited JSON change records (``lambdas/shared/utils.py:74-94``
    ``iter_json_records``). Blank lines and non-dict elements are
    skipped, matching the reference; normalization downstream handles
    missing/extra fields."""
    import json as _json

    def parse(row: dict) -> list[dict]:
        text = row["text"]
        if not text.strip():
            return []
        try:
            obj = _json.loads(text)
        except _json.JSONDecodeError:
            return [{"op": "?", "_raw": text}]  # poisoned -> quarantined later
        if isinstance(obj, list):
            return [o for o in obj if isinstance(o, dict)]
        return [obj] if isinstance(obj, dict) else []

    return rd.read_text(files).flat_map(parse)


def read_changelog_debezium(
    files: list[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> rd.Dataset:
    """Compat reader for the Debezium change-event envelope, THE
    standard open CDC wire format (newline-delimited JSON of
    ``{"payload": {"op", "before", "after", "source", "ts_ms"}}``;
    unwrapped events - SMT ``ExtractNewRecordState`` upstream or
    ``payload`` hoisted - are accepted too).

    Mapping to the engine's envelope: row fields come from ``after``
    (``before`` for deletes); ``op`` c/u/r (create/update/snapshot
    read) → U, d → D; ``seq`` prefers the source's total-order marker
    (``source.sequence``/``lsn``/``pos``, else ``ts_ms``) - the same
    LWW tie-break contract the parquet changelog carries. Unparseable
    lines surface as poisoned rows (op='?') and take the ordinary
    quarantine path; normalization downstream projects/casts exactly
    as for Parquet input."""
    import json as _json

    def parse(row: dict) -> list[dict]:
        text = row["text"]
        if not text.strip():
            return []
        try:
            obj = _json.loads(text)
        except _json.JSONDecodeError:
            return [{op_col: "?", "_raw": text}]
        if not isinstance(obj, dict):
            return []
        p = obj.get("payload", obj)
        if not isinstance(p, dict) or "op" not in p:
            return [{op_col: "?", "_raw": text}]
        op = p.get("op")
        fields = p.get("before") if op == "d" else p.get("after")
        if not isinstance(fields, dict):
            return [{op_col: "?", "_raw": text}]
        src = p.get("source") or {}
        seq = None
        for k in ("sequence", "lsn", "pos"):
            v = src.get(k)
            if isinstance(v, int):
                seq = v
                break
        if seq is None:
            seq = p.get("ts_ms")
        out = dict(fields)
        out[op_col] = "D" if op == "d" else "U"
        if seq_col not in out:
            out[seq_col] = seq
        return [out]

    return rd.read_text(files).flat_map(parse)


def read_changelog_csv(files: list[str], *, ts_col: str = "ts") -> rd.Dataset:
    """Compat reader for CSV change exports (the other common bronze
    drop format beside JSONL): header-driven ``ray.data.read_csv``
    with the timestamp column parsed to µs and empty strings read as
    nulls. Downstream normalization projects/casts/quarantines exactly
    as for Parquet input, so CSV lands through the same path."""
    from pyarrow import csv as pacsv

    convert = pacsv.ConvertOptions(
        strings_can_be_null=True,
        timestamp_parsers=[pacsv.ISO8601],
    )
    ds = rd.read_csv(files, convert_options=convert)

    def cast_ts(b: pa.Table) -> pa.Table:
        if ts_col in b.column_names:
            i = b.column_names.index(ts_col)
            col = b[ts_col]
            if pa.types.is_timestamp(col.type):
                col = pc.cast(col, pa.timestamp("us"))
            b = b.set_column(i, ts_col, col)
        return b

    return ds.map_batches(cast_ts, batch_format="pyarrow", zero_copy_batch=True)


def stage_changes(events, stage_dir: str) -> list[str]:
    """Write a change batch (``ray.data.Dataset``, pandas DataFrame or
    Arrow Table of CDC envelope rows) as an ATOMIC staged changelog
    directory, idempotently: the batch lands under ``stage_dir + .tmp``
    and becomes visible with one ``os.replace``; a ``_STAGED`` marker
    makes replays reuse the exact same files instead of re-deriving
    them. Returns the sorted staged file paths.

    This is the producer half of exactly-once ingest for DERIVED change
    streams (dedup-index inserts, materialized-view refreshes, redrive
    batches): same label/dir on retry → byte-identical staged files →
    the apply-side checkpoint turns the replay into a no-op.

    On an object-store lake there is no directory rename; the protocol
    is the standard job-commit shape instead: scrap any partial objects
    from a dead attempt, PUT the batch's files, then PUT the
    ``_STAGED`` marker LAST (atomic) - marker presence IS visibility.
    """
    import shutil

    import pandas as pd

    fs = fs_for(stage_dir)
    if fs.is_object:
        marker = stage_dir.rstrip("/") + "/_STAGED"
        if not fs.exists(marker):
            for p in fs.walk_files(stage_dir):  # partial previous attempt
                fs.remove(p)
            if isinstance(events, pd.DataFrame):
                events = pa.Table.from_pandas(events, preserve_index=False)
            if isinstance(events, pa.Table):
                fs.write_parquet(
                    events.replace_schema_metadata(None),
                    stage_dir.rstrip("/") + "/changes-000000.parquet",
                )
            else:  # ray.data.Dataset
                events.write_parquet(
                    fs.strip(stage_dir), filesystem=fs.pyarrow_fs()
                )
            fs.write_atomic(marker, b"staged")
        return list_changelog_files(stage_dir)

    marker = os.path.join(stage_dir, "_STAGED")
    if not os.path.exists(marker):
        tmp = stage_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        if isinstance(events, pd.DataFrame):
            events = pa.Table.from_pandas(events, preserve_index=False)
        if isinstance(events, pa.Table):
            os.makedirs(tmp)
            pq.write_table(
                events.replace_schema_metadata(None),
                os.path.join(tmp, "changes-000000.parquet"),
            )
        else:  # ray.data.Dataset
            events.write_parquet(tmp)
        shutil.rmtree(stage_dir, ignore_errors=True)
        os.replace(tmp, stage_dir)
        with open(marker, "w") as f:
            f.write("staged")
    return list_changelog_files(stage_dir)


def read_changelog_orc(
    files: list[str], columns: list[str] | None = None
) -> rd.Dataset:
    """Compat reader for ORC change drops (the other columnar bronze
    format beside Parquet in Hive-lineage pipelines). Ray Data 2.49 has
    no ``read_orc``, so this reader parallelizes at STRIPE granularity:
    a cheap driver-side footer pass counts stripes per file (metadata
    only, no data IO), each (file, stripe) pair becomes one read task,
    and a stripe decodes zero-copy into Arrow inside the task — a
    100-GB ORC drop with 64 MB stripes fans out to ~1600 balanced
    tasks regardless of file count skew.

    ORC stores timestamps at ns; they are cast back to the engine's µs
    here so downstream normalization sees the same types as Parquet
    input. Local paths and object-store URIs both work (the task
    re-opens via ``fs_for``-style access: ORC needs a seekable file,
    so object-store files materialize into a buffer per task)."""
    import io

    from pyarrow import orc as _orc

    def _open(path: str):
        fs = fs_for(path)
        if fs.is_object:
            return io.BytesIO(fs.read_bytes(path))
        return path

    tasks = []
    for p in files:
        tasks.extend(
            {"path": p, "stripe": i}
            for i in range(_orc.ORCFile(_open(p)).nstripes)
        )

    def load(batch: "pa.Table") -> pa.Table:
        out = []
        for row in batch.to_pylist():
            rb = _orc.ORCFile(_open(row["path"])).read_stripe(
                int(row["stripe"]), columns=columns
            )
            t = pa.Table.from_batches([rb])
            for i, f in enumerate(t.schema):
                if pa.types.is_timestamp(f.type) and f.type.unit != "us":
                    t = t.set_column(
                        i, f.name, pc.cast(t[f.name], pa.timestamp("us"))
                    )
            out.append(t)
        return pa.concat_tables(out)

    if not tasks:
        return rd.from_items([]).limit(0)
    return rd.from_items(tasks).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
