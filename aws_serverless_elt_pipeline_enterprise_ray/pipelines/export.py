"""Snapshot export: hand a committed lake version to consumers that
don't run the engine.

The lake's on-disk files are an implementation detail (LSM runs,
tombstones, internal columns, manifest-scoped visibility); an external
consumer - a training job, a warehouse loader, another team - wants
plain partitioned Parquet of the VISIBLE state. ``export_snapshot``
writes exactly what ``read_table`` serves (LWW-merged across runs,
tombstones filtered, schema conformed), one output directory per lake
partition, resumably:

* One Ray task per partition, no shuffle (the merge's parallelism).
* Each partition directory becomes visible via tmp + ``os.replace``
  and is stamped with a ``_DONE`` marker carrying the exported
  manifest version; a re-run after a crash skips partitions whose
  marker matches and re-exports the rest - the "failed run skips
  finished partitions" contract, never one giant file.
* A root ``_SNAPSHOT.json`` (version, rows, partition count) is
  written only after every partition landed - the atomic completion
  signal consumers should gate on.

Reference parity: the reference's hand-off surface is "query silver
via Athena" (Instructions.md:122-131) or raw S3 listing of partition
prefixes with no completeness signal beyond per-partition SNS events
(lambdas/transform/app.py:117-131); this gives the engine an explicit,
resumable, versioned export with a completion marker.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..state.manifest import ManifestStore, _atomic_write, manifest_payload_schema


class _Exporter:
    def __init__(
        self,
        lake_dir: str,
        out_dir: str,
        version: int,
        key_cols: tuple[str, ...],
        payload: "pa.Schema",
        max_rows_per_file: int,
        layout: str = "partition",
        ts_col: str = "ts",
        fmt: str = "parquet",
    ):
        self.lake_dir = lake_dir
        self.out_dir = out_dir
        self.version = version
        self.key_cols = key_cols
        self.payload = payload
        self.max_rows = max_rows_per_file
        self.layout = layout
        self.ts_col = ts_col
        self.fmt = fmt

    def _visible(self, paths: list[str]) -> pa.Table:
        from ..schema import lww_reduce
        from ..stages.merge import conform_to_schema

        internal = pa.schema(
            list(self.payload)
            + [pa.field("_deleted", pa.bool_()), pa.field("_seq", pa.int64())]
        )
        from ..state.lakefs import lakefs

        lfs = lakefs(self.lake_dir)
        tbls = [
            conform_to_schema(lfs.read_parquet(lfs.full(p)), internal)
            for p in paths
        ]
        tbl = pa.concat_tables(tbls)
        if len(paths) > 1:
            tbl = lww_reduce(tbl, self.key_cols, "ts", "_seq")
        tbl = tbl.filter(pc.invert(pc.fill_null(tbl["_deleted"], False)))
        return conform_to_schema(tbl, self.payload)

    def _write_jsonl(self, chunk: pa.Table, path: str) -> None:
        """One gzipped JSONL shard (the training-job handoff format).
        Binary columns are base64-encoded (JSON has no bytes type);
        timestamps serialize as ISO-8601. pandas ``to_json`` keeps the
        serialization C-level."""
        import base64

        df = chunk.to_pandas()
        for f in chunk.schema:
            if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type):
                df[f.name] = [
                    None if v is None else base64.b64encode(v).decode("ascii")
                    for v in df[f.name]
                ]
        if "://" in path:
            import gzip

            from ..state.lakefs import fs_for

            body = df.to_json(
                None, orient="records", lines=True,
                date_format="iso", date_unit="us",
            )
            fs_for(path).write_atomic(path, gzip.compress(body.encode()))
        else:
            df.to_json(
                path, orient="records", lines=True,
                compression="gzip", date_format="iso", date_unit="us",
            )

    def _write_orc(self, chunk: pa.Table, path: str) -> None:
        """One ORC shard (the Hive-lineage columnar handoff format);
        seekable-sink requirement means object-store writes buffer the
        shard (shards are chunk-sized by max_rows, so bounded)."""
        from pyarrow import orc as _orc

        if "://" in path:
            import io

            from ..state.lakefs import fs_for

            buf = io.BytesIO()
            _orc.write_table(chunk, buf)
            fs_for(path).write_atomic(path, buf.getvalue())
        else:
            _orc.write_table(chunk, path)

    def _write_partition_dir(self, pid: int, tbl: pa.Table) -> None:
        from ..state.lakefs import fs_for

        fs = fs_for(self.out_dir)
        if fs.is_object:
            # job-commit marker protocol (no directory rename): scrap a
            # dead attempt's partial objects, PUT chunks, _DONE last
            part_dir = self.out_dir.rstrip("/") + f"/part={pid:05d}"
            for p in fs.walk_files(part_dir):
                fs.remove(p)
            for lo in range(0, max(len(tbl), 1), self.max_rows):
                chunk = tbl.slice(lo, self.max_rows)
                i = lo // self.max_rows
                if self.fmt == "jsonl":
                    self._write_jsonl(chunk, part_dir + f"/data-{i:05d}.jsonl.gz")
                elif self.fmt == "orc":
                    self._write_orc(chunk, part_dir + f"/data-{i:05d}.orc")
                else:
                    fs.write_parquet(chunk, part_dir + f"/data-{i:05d}.parquet")
            fs.write_atomic(
                part_dir + "/_DONE",
                json.dumps(
                    {"version": self.version, "rows": len(tbl), "fmt": self.fmt}
                ),
            )
            return
        part_dir = os.path.join(self.out_dir, f"part={pid:05d}")
        tmp = part_dir + f".tmp.{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        for lo in range(0, max(len(tbl), 1), self.max_rows):
            chunk = tbl.slice(lo, self.max_rows)
            i = lo // self.max_rows
            if self.fmt == "jsonl":
                self._write_jsonl(chunk, os.path.join(tmp, f"data-{i:05d}.jsonl.gz"))
            elif self.fmt == "orc":
                self._write_orc(chunk, os.path.join(tmp, f"data-{i:05d}.orc"))
            else:
                pq.write_table(
                    chunk,
                    os.path.join(tmp, f"data-{i:05d}.parquet"),
                    compression="snappy",
                )
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            json.dump(
                {"version": self.version, "rows": len(tbl), "fmt": self.fmt}, f
            )
        shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp, part_dir)

    def _write_dt_layout(self, pid: int, tbl: pa.Table) -> None:
        """The reference's silver layout: ``dt=YYYY-MM-DD/`` Hive
        directories (``lambdas/transform/app.py:104``,
        ``shared/schemas.py:90-96``), fanned from the event-time
        column. File names are DETERMINISTIC per (partition, dt,
        chunk) so a crashed partition's rerun overwrites its own files;
        stale chunks from a previous attempt are swept by prefix glob
        before writing (no uuid orphans)."""
        from ..state.lakefs import fs_for

        fs = fs_for(self.out_dir)
        if fs.is_object:
            import fnmatch

            for p in fs.walk_files(self.out_dir):
                rel = p[len(self.out_dir.rstrip("/")) + 1:]
                if fnmatch.fnmatch(rel, f"dt=*/part{pid:05d}-*.parquet"):
                    fs.remove(p)
        else:
            import glob as _glob

            for stale in _glob.glob(
                os.path.join(self.out_dir, "dt=*", f"part{pid:05d}-*.parquet")
            ):
                os.remove(stale)
        if len(tbl):
            dt = pc.strftime(tbl[self.ts_col], "%Y-%m-%d")
            dt = pc.fill_null(dt, "__null__")
            tbl = tbl.append_column("_dt", dt)
            for v in pc.unique(dt).to_pylist():
                sub = tbl.filter(pc.equal(tbl["_dt"], v)).drop_columns("_dt")
                if fs.is_object:
                    dt_dir = self.out_dir.rstrip("/") + f"/dt={v}"
                    for lo in range(0, len(sub), self.max_rows):
                        fs.write_parquet(
                            sub.slice(lo, self.max_rows),
                            dt_dir
                            + f"/part{pid:05d}-{lo // self.max_rows:05d}.parquet",
                        )
                    continue
                dt_dir = os.path.join(self.out_dir, f"dt={v}")
                os.makedirs(dt_dir, exist_ok=True)
                for lo in range(0, len(sub), self.max_rows):
                    pq.write_table(
                        sub.slice(lo, self.max_rows),
                        os.path.join(
                            dt_dir,
                            f"part{pid:05d}-{lo // self.max_rows:05d}.parquet",
                        ),
                        compression="snappy",
                    )
        if fs.is_object:
            marker_dir = self.out_dir.rstrip("/") + "/_markers"
        else:
            marker_dir = os.path.join(self.out_dir, "_markers")
            os.makedirs(marker_dir, exist_ok=True)
        _atomic_write(
            marker_dir + f"/part={pid:05d}.json"
            if fs.is_object
            else os.path.join(marker_dir, f"part={pid:05d}.json"),
            json.dumps({"version": self.version, "rows": len(tbl)}),
        )

    def _marker(self, pid: int) -> str:
        if "://" in self.out_dir:
            root = self.out_dir.rstrip("/")
            if self.layout == "dt":
                return root + f"/_markers/part={pid:05d}.json"
            return root + f"/part={pid:05d}/_DONE"
        if self.layout == "dt":
            return os.path.join(self.out_dir, "_markers", f"part={pid:05d}.json")
        return os.path.join(self.out_dir, f"part={pid:05d}", "_DONE")

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_pid, out_rows, out_skipped = [], [], []
        for row in batch.to_pylist():
            pid = int(row["part_id"])
            from ..state.lakefs import fs_for as _ffor

            marker = self._marker(pid)
            mfs = _ffor(marker)
            if mfs.exists(marker):
                done = json.loads(mfs.read_text(marker))
                if done.get("version") == self.version and (
                    self.layout == "dt"
                    or done.get("fmt", "parquet") == self.fmt
                ):
                    out_pid.append(pid)
                    out_rows.append(done["rows"])
                    out_skipped.append(True)
                    continue  # finished by a previous (crashed) run
            tbl = self._visible(json.loads(row["files"]))
            if self.layout == "dt":
                self._write_dt_layout(pid, tbl)
            else:
                self._write_partition_dir(pid, tbl)
            out_pid.append(pid)
            out_rows.append(len(tbl))
            out_skipped.append(False)
        return pa.table(
            {
                "part_id": pa.array(out_pid, pa.int32()),
                "rows": pa.array(out_rows, pa.int64()),
                "resumed": pa.array(out_skipped, pa.bool_()),
            }
        )


def export_snapshot(
    lake_dir: str,
    out_dir: str,
    *,
    version: int | None = None,
    max_rows_per_file: int = 2_000_000,
    layout: str = "partition",
    ts_col: str = "ts",
    fmt: str = "parquet",
) -> dict:
    """Export the visible state of ``lake_dir`` at ``version`` (default
    CURRENT) to ``out_dir`` as plain partitioned Parquet. Returns
    ``{"version", "rows", "partitions", "resumed_partitions"}``.

    ``layout="partition"`` (default): one ``part=<pid>/`` directory per
    lake partition, atomically replaced, ``_DONE`` marker inside.
    ``layout="dt"``: the reference's Hive silver layout -
    ``dt=YYYY-MM-DD/`` directories fanned from ``ts_col``
    (``lambdas/transform/app.py:93-104``), deterministic
    ``part<pid>-<chunk>.parquet`` names so a crashed partition's rerun
    overwrites its own files (stale chunks swept by prefix); resume
    markers live under ``_markers/``. Both layouts skip partitions a
    previous run finished at the same version.

    ``fmt="jsonl"`` (``layout="partition"`` only) writes gzipped JSONL
    shards instead of Parquet — the hand-off format most training jobs
    ingest directly; binary columns are base64-encoded, timestamps
    ISO-8601. ``fmt="orc"`` (``layout="partition"`` only) writes ORC
    shards (Hive-lineage consumers; readable back through
    ``sources.changelog.read_changelog_orc``)."""
    if fmt not in ("parquet", "jsonl", "orc"):
        raise ValueError(f"unknown export fmt {fmt!r}")
    if fmt in ("jsonl", "orc") and layout != "partition":
        raise ValueError(f"fmt={fmt!r} supports layout='partition' only")
    store = ManifestStore(lake_dir)
    m = store.load(version)
    if m is None:
        raise FileNotFoundError(f"no committed version in {lake_dir}")
    payload = manifest_payload_schema(m)
    todo = [
        {"part_id": int(pid), "files": json.dumps([f["path"] for f in files])}
        for pid, files in m.partitions.items()
        if files
    ]
    from ..state.lakefs import fs_for

    fs_for(out_dir).makedirs(out_dir)
    rows = 0
    resumed = 0
    if todo:
        exporter = _Exporter(
            lake_dir=lake_dir,
            out_dir=out_dir,
            version=m.version,
            key_cols=tuple(m.partitioning.get("key_cols", ("conv_id", "turn_idx"))),
            payload=payload,
            max_rows_per_file=max_rows_per_file,
            layout=layout,
            ts_col=ts_col,
            fmt=fmt,
        )
        ds = rd.from_items(todo).map_batches(
            exporter.__call__, batch_format="pyarrow", batch_size=1
        )
        for r in ds.take_all():  # P tiny rows - driver sees counts only
            rows += int(r["rows"])
            resumed += int(bool(r["resumed"]))
    _atomic_write(
        out_dir.rstrip("/") + "/_SNAPSHOT.json"
        if "://" in out_dir
        else os.path.join(out_dir, "_SNAPSHOT.json"),
        json.dumps(
            {
                "version": m.version,
                "rows": rows,
                "partitions": len(todo),
                "schema": [f.name for f in payload],
                "fmt": fmt,
            }
        ),
    )
    return {
        "version": m.version,
        "rows": rows,
        "partitions": len(todo),
        "resumed_partitions": resumed,
    }
