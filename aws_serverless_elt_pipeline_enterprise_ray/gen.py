"""Deterministic seeded generator of transcript change streams.

Engine-side analogue of the reference's fake-event generator
(``scripts/gen_fake_events.py:25-95``): seeded, deterministic-shape
random records - but emitting Parquet change-log files (the "binlog")
of I/U/D events over the transcript table, per FIXTURES.md F2/F3/F4:

* hot-key skew (a few conv_ids carry ~30% of events),
* exact duplicate re-emissions (like the duplicated ``event_id`` row in
  ``data_samples/ups_shipping/sample.jsonl:2-3``),
* out-of-order delivery,
* optional additive schema evolution after file k (F3),
* optional poisoned rows (F4).

Everything is numpy-vectorized; generation of millions of events takes
seconds so bench streams can be produced on the fly.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import TS_TYPE

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator", "none"])

EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, arbitrary fixed origin

WORDS = np.array(
    "the of and a to in is you that it he was for on are as with his they I at be "
    "this have from or one had by word but not what all were we when your can said "
    "there use an each which she do how their if will up other about out many then "
    "them these so some her would make like him into time has look two more write "
    "go see number no way could people my than first water been call who oil its "
    "now find long down day did get come made may part".split()
)


def gen_changes(
    out_dir: str,
    *,
    n_events: int = 10_000,
    n_convs: int = 200,
    max_turns: int = 40,
    update_ratio: float = 0.25,
    delete_ratio: float = 0.05,
    duplicate_ratio: float = 0.02,
    hot_fraction: float = 0.3,
    n_hot: int = 3,
    out_of_order: float = 0.1,
    n_files: int = 8,
    seed: int = 42,
    evolve_after_file: int | None = None,
    bad_ratio: float = 0.0,
    text_words: int = 12,
) -> list[str]:
    """Write ``n_files`` ordered Parquet change files to ``out_dir``.

    Returns the list of file paths. Deterministic for a given
    parameter set. ``seq`` is globally monotone in emission order;
    ``ts`` is mostly increasing with an out-of-order fraction.
    """
    rng = np.random.default_rng(seed)
    n = n_events

    # --- key space: Zipf-ish conv sizes + explicit hot keys -------------
    conv_ids_all = np.array([f"conv_{i:06d}" for i in range(n_convs)])
    hot = rng.choice(n_convs, size=min(n_hot, n_convs), replace=False)
    probs = rng.dirichlet(np.ones(n_convs) * 0.5)
    probs[hot] = 0.0
    cold_mass = probs.sum()
    if len(hot) >= n_convs or cold_mass <= 0:
        probs = np.full(n_convs, 1.0 / n_convs)  # degenerate: uniform
    else:
        probs = probs / cold_mass * (1.0 - hot_fraction)
        probs[hot] = hot_fraction / len(hot)
        probs = probs / probs.sum()
    conv_idx = rng.choice(n_convs, size=n, p=probs)
    conv = conv_ids_all[conv_idx]
    turn = rng.integers(0, max_turns, size=n).astype(np.int32)

    # --- ops ------------------------------------------------------------
    u = rng.random(n)
    op = np.full(n, "I", dtype=object)
    op[u < update_ratio + delete_ratio] = "U"
    op[u < delete_ratio] = "D"

    # --- payload --------------------------------------------------------
    role = ROLES[rng.integers(0, len(ROLES), size=n)]
    tool = TOOLS[rng.integers(0, len(TOOLS), size=n)]
    tool = np.where(role == "tool", tool, None)
    word_ix = rng.integers(0, len(WORDS), size=(n, text_words))
    texts = np.array([" ".join(WORDS[row]) for row in word_ix], dtype=object)
    # make text key-and-version dependent so LWW correctness is observable
    ver = rng.integers(0, 1_000_000, size=n)
    texts = np.array(
        [f"{c}/t{t}/v{v}: {x}" for c, t, v, x in zip(conv, turn, ver, texts)],
        dtype=object,
    )

    # --- time & sequence ------------------------------------------------
    seq = np.arange(n, dtype=np.int64)
    ts = EPOCH_US + seq * 1_000_000 + rng.integers(0, 1000, size=n)
    ooo = rng.random(n) < out_of_order
    ts[ooo] -= rng.integers(1, 3600, size=ooo.sum()) * 1_000_000
    ts = ts.astype("datetime64[us]")

    # --- exact duplicates (re-emitted events, same seq/ts) --------------
    n_dup = int(n * duplicate_ratio)
    if n_dup:
        # a re-emission can only duplicate an event already emitted:
        # source index strictly before the insertion point
        ins_at = np.sort(rng.integers(1, n, size=n_dup))
        dup_src = (rng.random(n_dup) * ins_at).astype(np.int64)
        order = np.insert(np.arange(n), ins_at, dup_src)
    else:
        order = np.arange(n)

    cols = {
        "op": np.asarray(op, dtype=object)[order],
        "seq": seq[order],
        "conv_id": conv[order].astype(object),
        "turn_idx": turn[order],
        "role": role[order].astype(object),
        "text": texts[order],
        "tool": tool[order],
        "ts": ts[order],
    }
    total = len(order)

    # --- poisoned rows (F4) --------------------------------------------
    if bad_ratio > 0:
        nb = max(1, int(total * bad_ratio))
        bad_at = rng.choice(total, size=nb, replace=False)
        kinds = rng.integers(0, 3, size=nb)
        opcol = cols["op"].copy()
        opcol[bad_at[kinds == 0]] = "X"
        cols["op"] = opcol
        convcol = cols["conv_id"].copy()
        convcol[bad_at[kinds == 1]] = None
        cols["conv_id"] = convcol
        tscol = cols["ts"].copy()
        tscol[bad_at[kinds == 2]] = np.datetime64("NaT")
        cols["ts"] = tscol

    from .state.lakefs import fs_for

    gfs = fs_for(out_dir)
    gfs.makedirs(out_dir)
    paths = []
    bounds = np.linspace(0, total, n_files + 1).astype(int)
    for i in range(n_files):
        lo, hi = bounds[i], bounds[i + 1]
        arrays = [
            pa.array(cols["op"][lo:hi], pa.string()),
            pa.array(cols["seq"][lo:hi], pa.int64()),
            pa.array(cols["conv_id"][lo:hi], pa.string()),
            pa.array(cols["turn_idx"][lo:hi], pa.int32()),
            pa.array(cols["role"][lo:hi], pa.string()),
            pa.array(cols["text"][lo:hi], pa.string()),
            pa.array(cols["tool"][lo:hi], pa.string()),
            pa.array(cols["ts"][lo:hi], TS_TYPE),
        ]
        names = ["op", "seq", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
        if evolve_after_file is not None and i >= evolve_after_file:
            # Derived from seq so an exactly re-emitted duplicate event
            # carries identical values in every column (true duplicates).
            sq = cols["seq"][lo:hi]
            arrays.append(pa.array([f"call_{v:08x}" for v in sq], pa.string()))
            names.append("tool_call_id")
            arrays.append(pa.array((sq % 4096).astype(np.int32), pa.int32()))
            names.append("meta_tokens")
        tbl = pa.table(arrays, names=names)
        name = f"changes-{i:06d}.parquet"
        if gfs.is_object:
            path = out_dir.rstrip("/") + "/" + name
        else:
            path = os.path.join(out_dir, name)
        gfs.write_parquet(tbl, path)
        paths.append(path)
    return paths


def oracle_final_state(changelog_dir: str) -> "pa.Table":
    """Trivial single-process reference reducer (FIXTURES.md F5): the
    expected final table - last row per (conv_id, turn_idx) by
    (ts, seq), deletes dropped, sorted by key. Used by tests only."""
    import duckdb

    con = duckdb.connect()
    out = con.execute(
        f"""
        WITH ch AS (SELECT * FROM read_parquet('{changelog_dir}/*.parquet', union_by_name=true)),
        good AS (
          SELECT * FROM ch
          WHERE op IN ('I','U','D') AND conv_id IS NOT NULL
            AND turn_idx IS NOT NULL AND ts IS NOT NULL AND seq IS NOT NULL
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
          FROM good
        )
        SELECT * EXCLUDE (op, seq, rn) FROM ranked WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx
        """
    ).arrow()
    con.close()
    return out
