"""Transcript-native training-data operators over the committed lake.

``conversation_examples`` — the lake -> SFT-examples step: for every
turn that has conversational history, emit (context = up to the last
``context_turns`` role-prefixed turns, target = the turn's text).
Conversations are hash-BUCKETED (~2/CPU) and each bucket builds ALL its
examples in one vectorized pandas pass (sort + per-conversation
``groupby().shift(i)`` — C-level, no Python per turn). The
lag-composition mirrors SQL ``lag()`` + ``concat_ws`` exactly, so the
DuckDB oracle verifies it value-for-value.

``assign_split`` — deterministic train/val/test assignment by
multiplicative key hash: splits are stable across runs and machines,
assignment is per-KEY (every turn of a conversation lands in the same
split — no train/test leakage within a conversation), and the op is a
pure per-batch map (no shuffle).

Reference parity: beyond-reference training-data operators (the
reference stops at silver Parquet, lambdas/transform/app.py:93-116;
these are the silver -> training-corpus steps its consumers would
build downstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .mixing import knuth_hash32
from .windows import _buckets_for_cluster, _key_buckets


def conversation_examples(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    context_turns: int = 3,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Emit (conv, turn, context, target) training examples; rows
    without history (a conversation's first turn) are skipped."""
    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, role_col, text_col]].copy()
        b["_tb"] = _key_buckets(b[conv_col], num_buckets)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort").reset_index(
            drop=True
        )
        # NULL-propagating concatenation (pandas object + propagates
        # NaN), mirroring SQL role || ': ' || text
        line = g[role_col] + ": " + g[text_col]
        prevs = []
        for i in range(context_turns, 0, -1):
            prevs.append(line.groupby(g[conv_col], sort=False).shift(i))
        # concat_ws semantics: join the PRESENT parts with \n, skipping
        # nulls wherever they fall (a null mid-history line from a null
        # text must not leave a double separator)
        ctx = None
        for p in prevs:
            part = p.fillna("")
            if ctx is None:
                ctx = part
            else:
                sep = np.where((ctx != "") & (part != ""), "\n", "")
                ctx = ctx + sep + part
        has_history = prevs[-1].notna()  # SQL: WHERE lag(line, 1) IS NOT NULL
        out = pd.DataFrame(
            {
                conv_col: g[conv_col],
                order_col: g[order_col],
                "context": ctx,
                "target": g[text_col],
            }
        )
        return out[has_history.to_numpy()]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_tb")
        .map_groups(build, batch_format="pandas")
    )


def conversation_windows(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    window: int = 4,
    stride: int = 2,
    sep: str = " ",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Sliding TURN windows per conversation - the context-window
    packing step that turns long transcripts into fixed-span training
    examples (window ``window`` turns, hop ``stride``). Rows are
    rank-ordered per conversation by ``order_col`` (0-based dense
    rank, so gaps in turn numbering don't skew spans); each turn
    replicates map-side to its <= ceil(window/stride) covering windows
    (numpy repeat, no per-row Python) and ONE conv-bucketed shuffle
    assembles each (conv, window_start) group's joined text.
    Returns (conv, window_start, n_turns, text)."""
    import numpy as np

    from .windows import _buckets_for_cluster, _key_buckets

    nb = num_buckets or _buckets_for_cluster()
    k = -(-window // stride)  # max covering windows per turn

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        # null-text turns are skipped (SQL string_agg semantics)
        b = b[[conv_col, order_col, text_col]].dropna(subset=[text_col])
        b = b.copy()
        b["_wb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        rn = g.groupby(conv_col, sort=False).cumcount().to_numpy()
        n = len(g)
        # candidate window starts: (rn//stride - j) * stride, j < k
        base = (rn // stride)[:, None] - np.arange(k)[None, :]
        starts = base * stride
        valid = (starts >= 0) & (rn[:, None] < starts + window)
        rows = np.repeat(np.arange(n), k)[valid.ravel()]
        s = starts.ravel()[valid.ravel()]
        ex = pd.DataFrame(
            {
                conv_col: g[conv_col].to_numpy()[rows],
                "window_start": s,
                "_rn": rn[rows],
                text_col: g[text_col].to_numpy()[rows],
            }
        ).sort_values([conv_col, "window_start", "_rn"], kind="mergesort")
        agg = ex.groupby([conv_col, "window_start"], sort=False).agg(
            n_turns=(text_col, "size"), text=(text_col, sep.join)
        )
        return agg.reset_index()

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_wb")
        .map_groups(build, batch_format="pandas")
    )


def collapse_consecutive_turns(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Merge CONSECUTIVE same-role turns into one (the transcript
    cleaning step before training: double assistant messages, split
    user messages, tool-call bursts collapse to a single turn). The
    classic gaps-and-islands shape: per conversation, island id =
    row_number − row_number-within-(conv, role), then one ordered
    string_agg per island. One conv-bucketed shuffle; islands are
    vectorized (cumcount arithmetic), joins are per-island C-level.
    Returns (conv, turn_seq, role, n_merged, text) with ``turn_seq``
    the dense 0-based index of the merged turn."""
    from .windows import _buckets_for_cluster, _key_buckets

    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, role_col, text_col]].copy()
        b["_cb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        rn = g.groupby(conv_col, sort=False).cumcount()
        rn_role = g.groupby([conv_col, role_col], sort=False).cumcount()
        g = g.assign(_island=rn - rn_role)
        agg = (
            g.groupby([conv_col, role_col, "_island"], sort=False)
            .agg(
                n_merged=(text_col, "size"),
                text=(text_col, lambda s: sep.join(x for x in s if x is not None)),
                _first=(order_col, "min"),
            )
            .reset_index()
            .sort_values([conv_col, "_first"], kind="mergesort")
        )
        agg["turn_seq"] = agg.groupby(conv_col, sort=False).cumcount()
        return agg[[conv_col, "turn_seq", role_col, "n_merged", "text"]]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_cb")
        .map_groups(build, batch_format="pandas")
    )


def assign_split(
    ds: rd.Dataset,
    *,
    key_col: str,
    fractions: dict[str, float],
    split_col: str = "split",
) -> rd.Dataset:
    """Deterministic split assignment: the key's 32-bit multiplicative
    hash is mapped to cumulative fraction ranges (insertion order of
    ``fractions``; must sum to 1). Integer keys hash directly; string
    keys are expected to carry a numeric suffix-free id - pass the
    numeric id column."""
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names])
    assert abs(bounds[-1] - 1.0) < 1e-9, "fractions must sum to 1"
    # exact integer thresholds so the SQL mirror is bit-identical
    cuts = np.array([int(b * (1 << 32)) for b in bounds], dtype=np.uint64)

    def fn(b: pa.Table) -> pa.Table:
        h = knuth_hash32(b[key_col].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(cuts, h, side="right")
        idx = np.minimum(idx, len(names) - 1)
        lab = np.array(names, dtype=object)[idx]
        return b.append_column(split_col, pa.array(lab, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
