"""SQL surface over the committed lake - the engine analogue of the
reference's Glue catalog + Athena queries
(``infra/terraform/modules/glue_catalog/main.tf`` registers silver;
``Instructions.md:122-131`` documents the rollup / ordered-inspection
SQL). We register a DuckDB VIEW over exactly the files the CURRENT (or
a pinned) manifest references, with merge-on-read semantics baked into
the view: LWW across delta-append runs, tombstones filtered, committed
payload schema projected. Readers get repeatable snapshot queries with
zero copying.
"""

from __future__ import annotations

import os

from .state.manifest import ManifestStore, manifest_payload_schema


def lake_view_sql(
    lake_dir: str, view_name: str = "transcripts", version: int | None = None
) -> str | None:
    """The CREATE VIEW statement for the committed snapshot, or None if
    nothing is committed / the lake is empty."""
    store = ManifestStore(lake_dir)
    m = store.load(version)
    if m is None:
        return None
    from .state.lakefs import lakefs

    lfs = lakefs(lake_dir)
    if lfs.is_object:
        scheme = lake_dir.split("://", 1)[0]
        if scheme != "s3sim":
            raise NotImplementedError(
                f"duckdb_view over {scheme}:// needs a DuckDB httpfs/s3 "
                "extension; only the local-disk s3sim shim maps directly"
            )
        # the shim's key space IS the local path space - hand DuckDB
        # the underlying files directly (read-only)
        files = ["/" + lfs.strip(lfs.full(p)) for p in m.all_files()]
    else:
        files = [os.path.join(lake_dir, p) for p in m.all_files()]
    pay = manifest_payload_schema(m)
    cols = ", ".join(f'"{n}"' for n in pay.names)
    if not files:
        selects = ", ".join(f'NULL AS "{n}"' for n in pay.names)
        return f'CREATE OR REPLACE VIEW "{view_name}" AS SELECT {selects} WHERE 1=0'
    key_cols = list(m.partitioning.get("key_cols", ("conv_id", "turn_idx")))
    part = ", ".join(f'"{c}"' for c in key_cols)
    order = '"ts" DESC, "_seq" DESC' if "ts" in pay.names else '"_seq" DESC'
    file_list = ", ".join("'" + f.replace("'", "''") + "'" for f in files)
    return f"""
CREATE OR REPLACE VIEW "{view_name}" AS
SELECT {cols} FROM (
  SELECT *, row_number() OVER (PARTITION BY {part} ORDER BY {order}) AS _rn
  FROM read_parquet([{file_list}], union_by_name=true)
)
WHERE _rn = 1 AND NOT coalesce("_deleted", false)
""".strip()


def register_duckdb_view(
    lake_dir: str,
    con=None,
    view_name: str = "transcripts",
    version: int | None = None,
):
    """Create (or replace) the snapshot view on a DuckDB connection
    (a new in-memory one if none is given) and return the connection.
    Raises if nothing is committed."""
    import duckdb

    sql = lake_view_sql(lake_dir, view_name, version)
    if sql is None:
        raise RuntimeError(f"no committed version in {lake_dir}")
    con = con or duckdb.connect()
    con.execute(sql)
    return con
