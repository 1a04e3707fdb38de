"""Incrementally-maintained search index (pipelines/search.py): the
inverted-index lake must always equal a from-scratch index of the
source lake's current state, across inserts, text updates, deletes and
replayed refreshes."""

import re

import pandas as pd
import pyarrow as pa

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.search import (
    TOKEN_RE,
    last_indexed_version,
    read_index,
    refresh_search_index,
    search,
)


def _apply(changes, lake, seq0=0):
    rows = []
    for i, (op, conv, turn, text) in enumerate(changes):
        rows.append(
            {
                "op": op,
                "seq": seq0 + i,
                "conv_id": conv,
                "turn_idx": turn,
                "role": "user",
                "text": text,
                "tool": None,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=seq0 + i),
            }
        )
    engine.apply_dataset(
        pd.DataFrame(rows),
        lake,
        engine.default_spec(num_partitions=4),
        label=f"batch-{seq0}",
    )


def _bruteforce_index(lake):
    df = engine.read_table(lake, columns=["conv_id", "text"]).to_pandas()
    rows = {}
    for conv, text in zip(df["conv_id"], df["text"]):
        for tok in re.findall(TOKEN_RE, (text or "").lower()):
            rows[(tok, conv)] = rows.get((tok, conv), 0) + 1
    return sorted((t, c, n) for (t, c), n in rows.items())


def _index_rows(index_dir):
    df = read_index(index_dir).to_pandas()
    return sorted(
        (t, c, int(n))
        for t, c, n in zip(df["term"], df["conv_id"], df["n_occurrences"])
    )


def test_search_index_tracks_source_across_commits(tmp_path):
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")

    _apply(
        [
            ("I", "cA", 0, "alpha beta alpha"),
            ("I", "cA", 1, "gamma"),
            ("I", "cB", 0, "beta delta"),
        ],
        lake,
    )
    r1 = refresh_search_index(lake, idx, num_partitions=4)
    assert r1["committed"] == 1 and r1["deletes"] == 0
    assert _index_rows(idx) == _bruteforce_index(lake)
    # alpha occurs twice in cA
    assert ("alpha", "cA", 2) in _index_rows(idx)

    # update cA turn 0 (alpha disappears from that turn), delete cB
    # turn 0 (beta/delta vanish with the conversation), add cC
    _apply(
        [
            ("U", "cA", 0, "beta epsilon"),
            ("D", "cB", 0, None),
            ("I", "cC", 0, "alpha zeta"),
        ],
        lake,
        seq0=100,
    )
    r2 = refresh_search_index(lake, idx, num_partitions=4)
    assert r2["committed"] == 1
    assert r2["deletes"] > 0  # dropped terms became D rows
    got = _index_rows(idx)
    assert got == _bruteforce_index(lake)
    assert ("alpha", "cA", 2) not in got      # count corrected
    assert ("delta", "cB", 1) not in got      # deleted conv gone
    assert ("alpha", "cC", 1) in got

    # point lookup through the pruned path
    hits = search(idx, "beta").to_pandas()
    assert sorted(hits["conv_id"]) == ["cA"]

    # replay: source unmoved -> refresh is a no-op
    r3 = refresh_search_index(lake, idx, num_partitions=4)
    assert r3["committed"] == 0 and r3["from_version"] == r3["to_version"]
    assert last_indexed_version(idx) == r2["to_version"]
    assert _index_rows(idx) == _bruteforce_index(lake)


def test_search_index_staged_refresh_is_replay_safe(tmp_path):
    """A crash between staging and checkpoint re-derives the same
    range; the staged files are reused and the apply no-ops on the
    second pass (exactly-once end to end)."""
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    _apply([("I", "c1", 0, "one two"), ("I", "c2", 0, "two three")], lake)
    refresh_search_index(lake, idx, num_partitions=4)
    before = _index_rows(idx)

    # simulate the crash: roll the checkpoint back, re-run the refresh
    import os

    os.remove(os.path.join(idx, "_source_version.json"))
    r = refresh_search_index(lake, idx, num_partitions=4)
    # staged files are reused and were already in the index manifest's
    # applied set, so the apply is a no-op commit-wise
    assert r["committed"] == 0
    assert _index_rows(idx) == before
    assert last_indexed_version(idx) == r["to_version"]


def test_tail_on_commit_keeps_index_fresh(tmp_path):
    """The always-on tailer's on_commit hook composes with the index
    refresh: after the loop drains the changelog, the index matches the
    lake with zero extra machinery."""
    from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.tail import tail

    changes = str(tmp_path / "ch")
    lake, idx = str(tmp_path / "lake"), str(tmp_path / "idx")
    gen_changes(changes, n_events=1500, n_convs=30, n_files=3, seed=31)

    stats = tail(
        changes,
        lake,
        spec=None,
        poll_seconds=0.01,
        max_idle_rounds=1,
        commit_every_files=1,
        on_commit=lambda m: refresh_search_index(lake, idx, num_partitions=4),
    )
    assert stats["commits"] == 3
    assert last_indexed_version(idx) == 3
    assert _index_rows(idx) == _bruteforce_index(lake)
