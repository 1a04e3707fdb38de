"""Replay / backfill.

The reference replays by re-copying bronze objects under a
``bronze/replay/<execution>/...`` prefix so the normal event path
re-fires, selecting sources by LastModified time window
(``workflows/replay/app.py:36-96``), then polls a readiness probe in a
Step Functions loop (``workflow_ops/main.tf:90-184``).

Ours is checkpoint-native and needs no polling: roll the manifest
pointer back to a version (or reset to empty) and re-apply - the
pending set is recomputed from that version's ``applied`` checkpoint,
and the commit returning IS readiness. Replaying the full stream over
an empty lake reproduces the exact final table state (LWW is
order-insensitive), the north-rule invariant.
"""

from __future__ import annotations

from ..schema import TableSpec, default_spec
from ..state.manifest import Manifest, ManifestStore
from .cdc import apply_changes


def replay(
    changelog_dir: str,
    lake_dir: str,
    spec: TableSpec | None = None,
    *,
    from_version: int | None = None,
    seq_range: tuple[int, int] | None = None,
    **apply_kwargs,
) -> list[Manifest]:
    """Re-apply the change log from a checkpoint version.

    from_version=None -> full replay from an empty checkpoint (the
    reference's full backfill); from_version=V -> re-apply everything
    after V's watermark. ``seq_range`` is accepted for time/offset-
    window backfills: files whose seq span falls outside the window are
    skipped (the reference selects objects by LastModified window,
    ``scripts/replay_from_s3.py:45-49``)."""
    spec = spec or default_spec()
    store = ManifestStore(lake_dir)
    if from_version is None:
        store.reset()
    else:
        store.rollback(from_version)
    files: str | list[str] = changelog_dir
    if seq_range is not None:
        import pyarrow.parquet as pq

        from ..sources.changelog import list_changelog_files

        lo, hi = seq_range
        files = []
        from ..state.lakefs import fs_for

        for p in list_changelog_files(changelog_dir):
            md = fs_for(p).read_parquet_metadata(p)
            smin, smax = None, None
            sch = fs_for(p).read_parquet_schema(p)
            seq_idx = sch.get_field_index("seq")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(seq_idx).statistics
                if st is not None:
                    smin = st.min if smin is None else min(smin, st.min)
                    smax = st.max if smax is None else max(smax, st.max)
            if smin is None or (smax >= lo and smin <= hi):
                files.append(p)
    return apply_changes(files, lake_dir, spec, **apply_kwargs)
