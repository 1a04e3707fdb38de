"""Always-on change-log tailer.

The reference's ingest path is event-driven: S3 ``ObjectCreated``
notifications invoke the ingest Lambda per object
(``envs/dev/main.tf:127-135``). A filesystem changelog has no push
notifications, so the tailer polls the directory and applies any files
not yet in the checkpoint - each poll round is exactly one idempotent
``apply_changes`` call, so crashes mid-round, duplicate rounds and
overlapping deliveries are all safe by construction.

Producers must land files atomically - on POSIX write to a temp name
and rename into the watched directory; on an object-store changelog
(any URI location, ``state/lakefs.py``) a PUT is atomic by itself, the
exact contract the reference's S3 landing zone provides. The tailer
assumes a listed file is complete either way (a defensive footer probe
defers files still being copied by non-atomic producers).

Runs until ``max_idle_rounds`` consecutive empty polls (or forever
with ``max_idle_rounds=None``); returns aggregate stats. Lag metric =
newest file seq minus committed watermark (the engine analogue of
``ApproximateAgeOfOldestMessage``).
"""

from __future__ import annotations

import time

from ..schema import TableSpec, default_spec
from ..state.manifest import ManifestStore
from .cdc import apply_changes


def tail(
    changelog_dir: str,
    lake_dir: str,
    spec: TableSpec | None = None,
    *,
    poll_seconds: float = 1.0,
    max_idle_rounds: int | None = 5,
    max_rounds: int | None = None,
    on_commit=None,
    maintain_every: int | None = None,
    **apply_kwargs,
) -> dict:
    """Poll-and-apply loop. ``on_commit(manifest)`` is called per
    committed version (test/metrics hook).

    ``maintain_every=N`` runs the policy-driven maintenance pass
    (``pipelines.maintain``: LSM-depth compaction, post-commit hot-key
    rebalance) after every N commits — an always-on tailer otherwise
    stacks delta runs and skew forever with nobody watching (the
    self-driving analogue of the reference's CloudWatch-alarm →
    operator-runs-a-Glue-job loop)."""
    import pyarrow.parquet as pq

    from ..sources.changelog import discover_pending

    spec = spec or default_spec()
    store = ManifestStore(lake_dir)
    idle = 0
    rounds = 0
    committed = 0
    events = 0
    maintained: list[str] = []
    since_maintain = 0

    def _ready(path: str) -> bool:
        # defensive against non-atomic producers: a file whose footer
        # doesn't parse yet (still being written/copied) is deferred to
        # the next poll instead of failing the round
        try:
            from ..state.lakefs import fs_for

            fs_for(path).read_parquet_schema(path)
            return True
        except Exception:  # noqa: BLE001
            return False

    while True:
        rounds += 1
        pending = [
            p
            for p in discover_pending(changelog_dir, manifest=store.load())
            if _ready(p)
        ]
        manifests = (
            apply_changes(pending, lake_dir, spec, **apply_kwargs)
            if pending
            else []
        )
        if manifests:
            idle = 0
            committed += len(manifests)
            since_maintain += len(manifests)
            for m in manifests:
                events += m.metrics.get("events_applied", 0)
                if on_commit is not None:
                    on_commit(m)
            if maintain_every is not None and since_maintain >= maintain_every:
                from .maintain import maintain

                res = maintain(lake_dir)
                if res["action"] != "none":
                    maintained.append(res["action"])
                since_maintain = 0
        else:
            idle += 1
            if max_idle_rounds is not None and idle >= max_idle_rounds:
                break
        if max_rounds is not None and rounds >= max_rounds:
            break
        time.sleep(poll_seconds)
    cur = store.load()
    return {
        "rounds": rounds,
        "commits": committed,
        "events_applied": events,
        "maintenance": maintained,
        "version": cur.version if cur else None,
        "watermark": cur.watermark if cur else None,
    }
