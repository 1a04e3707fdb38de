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


def supervised_tail(
    changelog_dir: str,
    lake_dir: str,
    *,
    partitions: int = 64,
    poll_seconds: float = 1.0,
    max_idle_rounds: int | None = 5,
    maintain_every: int | None = None,
    max_restarts: int = 10,
    restart_backoff: float = 1.0,
    num_cpus: int | None = None,
    on_spawn=None,
) -> dict:
    """Crash-shielded always-on tailer: run the ``tail`` loop in a
    CHILD process (its own Ray session) and restart it whenever it
    dies abnormally — the supervisor pattern a long-lived driver needs
    against faults *outside* the engine's control, e.g. the Ray-core
    task-GC race (``task_manager.cc:930 Check failed``, Ray 2.49)
    that can kill a driver between Dataset executions. Restart is safe
    by construction: every poll round is one idempotent exactly-once
    ``apply_changes`` (checkpoint fence + manifest commit), so a new
    incarnation re-discovers pending files against the committed
    checkpoint and never double-applies (proved by
    ``tests/test_kill_resume.py`` / ``tests/test_tail_supervisor.py``).

    The supervisor itself holds NO Ray session (it must outlive them);
    each incarnation is ``python -m ...cli tail`` with ``RAY_ADDRESS``
    cleared so it owns a private session — on a real cluster, leave
    the children to ``ray job submit`` instead and keep this loop as
    the job's restart policy.

    Returns the last clean incarnation's stats plus ``restarts`` and
    ``incarnations``. ``on_spawn(popen)`` is a per-incarnation hook
    (metrics / fault-injection in tests). Raises ``RuntimeError``
    after ``max_restarts`` abnormal deaths with no clean exit."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # children own private sessions
    env.setdefault("PYTHONPATH", os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ))
    cmd = [sys.executable, "-m",
           "aws_serverless_elt_pipeline_enterprise_ray.cli"]
    if num_cpus:
        cmd += ["--num-cpus", str(num_cpus)]
    cmd += ["tail", "--changelog", changelog_dir, "--lake", lake_dir,
            "--partitions", str(partitions),
            "--poll-seconds", str(poll_seconds)]
    cmd += ["--max-idle-rounds",
            str(-1 if max_idle_rounds is None else max_idle_rounds)]
    if maintain_every is not None:
        cmd += ["--maintain-every", str(maintain_every)]

    restarts = 0
    incarnations = 0
    while True:
        incarnations += 1
        proc = subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True,
            preexec_fn=os.setsid,  # killable as a tree, with its Ray
        )
        if on_spawn is not None:
            on_spawn(proc)
        out, _ = proc.communicate()
        if proc.returncode == 0:
            stats = json.loads(out.strip().splitlines()[-1])
            stats["restarts"] = restarts
            stats["incarnations"] = incarnations
            return stats
        restarts += 1
        if restarts > max_restarts:
            raise RuntimeError(
                f"tailer died {restarts} times (last rc "
                f"{proc.returncode}); giving up after max_restarts="
                f"{max_restarts}"
            )
        time.sleep(restart_backoff)
