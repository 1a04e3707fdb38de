"""Event-time window operators over keyed streams.

Ray Data has no event-time windows or watermarks (SURVEY §2.9), so
stream-shaped semantics are expressed as ``groupby(key).map_groups``
over time-sorted groups (the guide's prescribed pattern):

* ``sessionize`` - gap-based session windows: a new session starts
  when the gap to the previous event of the same key exceeds
  ``gap``. Vectorized per group (sort + diff + cumsum).

Tumbling windows need no grouping at all (floor the timestamp inside
``map_batches`` + a small groupby - see ``q_window_events_hourly``).
Ordering assumption: windows are computed per key after an in-group
sort by (ts, tiebreak); late events are simply sorted into place, so
re-running after late data lands gives the corrected windows (no
incremental watermark state - this is a batch-over-log engine).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def sessionize(
    ds: rd.Dataset,
    *,
    key: str,
    ts_col: str = "ts",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    tiebreak: str | None = None,
) -> rd.Dataset:
    """Per-key session aggregation: one row per (key, session_id) with
    n_events, session_start, session_end. ``session_id`` is 1-based in
    time order within each key."""

    def build(g: pd.DataFrame) -> pd.DataFrame:
        order = [ts_col] + ([tiebreak] if tiebreak else [])
        g = g.sort_values(order, kind="mergesort")
        new_sess = (g[ts_col].diff() > gap) | g[ts_col].diff().isna()
        sess = new_sess.cumsum()
        out = (
            g.assign(session_id=sess)
            .groupby("session_id", sort=True)
            .agg(
                n_events=(ts_col, "size"),
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
            )
            .reset_index()
        )
        out.insert(0, key, g[key].iloc[0])
        return out

    return ds.groupby(key).map_groups(build, batch_format="pandas")
