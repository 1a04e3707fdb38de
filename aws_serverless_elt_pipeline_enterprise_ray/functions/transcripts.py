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


def conversation_lint(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    opener_role: str = "user",
    closer_role: str = "assistant",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Structural transcript validation — the pre-training lint pass
    that catches malformed conversations before they poison a corpus:
    per conversation, the first/last speaking role, turn-numbering
    gaps (a dropped turn mid-dialogue usually means truncation or a
    lost message), consecutive same-role turns (double-sends that
    should have been collapsed), and null-text turns. ``ok`` is the
    conjunction: opens with ``opener_role``, closes with
    ``closer_role``, no gaps, no repeats, no null text.

    One conv-bucketed shuffle; every per-conversation statistic is
    sort + shift arithmetic (C-level) inside the bucket. Returns
    (conv, n_turns, first_role, last_role, n_order_gaps,
    n_role_repeats, n_null_text, ok)."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, role_col, text_col]].copy()
        b["_lb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    conv_col: pd.Series(dtype=g[conv_col].dtype),
                    "n_turns": pd.Series(dtype="int64"),
                    "first_role": pd.Series(dtype=g[role_col].dtype),
                    "last_role": pd.Series(dtype=g[role_col].dtype),
                    "n_order_gaps": pd.Series(dtype="int64"),
                    "n_role_repeats": pd.Series(dtype="int64"),
                    "n_null_text": pd.Series(dtype="int64"),
                    "ok": pd.Series(dtype=bool),
                }
            )
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        conv = g[conv_col].to_numpy()
        ord_ = g[order_col].to_numpy()
        role = g[role_col].to_numpy(dtype=object)
        same_conv = np.empty(len(g), dtype=bool)
        same_conv[0] = False
        if len(g) > 1:
            same_conv[1:] = conv[1:] == conv[:-1]
        gap = np.zeros(len(g), dtype=np.int64)
        rep = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            gap[1:] = same_conv[1:] & (ord_[1:] != ord_[:-1] + 1)
            # SQL NULL semantics: a NULL role never equals anything,
            # so two consecutive null roles are NOT a repeat
            notna = pd.notna(role)
            rep[1:] = (
                same_conv[1:] & notna[1:] & notna[:-1]
                & (role[1:] == role[:-1])
            )
        gg = g.assign(_gap=gap, _rep=rep, _nul=g[text_col].isna())
        agg = (
            gg.groupby(conv_col, sort=False)
            .agg(
                n_turns=(order_col, "size"),
                first_role=(role_col, "first"),
                last_role=(role_col, "last"),
                n_order_gaps=("_gap", "sum"),
                n_role_repeats=("_rep", "sum"),
                n_null_text=("_nul", "sum"),
            )
            .reset_index()
        )
        agg["ok"] = (
            (agg["first_role"] == opener_role)
            & (agg["last_role"] == closer_role)
            & (agg["n_order_gaps"] == 0)
            & (agg["n_role_repeats"] == 0)
            & (agg["n_null_text"] == 0)
        )
        return agg

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_lb")
        .map_groups(build, batch_format="pandas")
    )


def boilerplate_turns(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    text_col: str = "text",
    min_convs: int = 2,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Cross-conversation boilerplate detection: turn texts that
    appear in at least ``min_convs`` DISTINCT conversations (greeting
    templates, canned refusals, scripted tool banners) — the usual
    first cut before turn-level dedup decides what to drop. Map-side
    each block collapses to per-(text, conv) partial counts, so the
    single text-bucketed shuffle carries one row per distinct
    (text, conv) pair per block — never the raw turns; the bucket
    reduce then counts distinct conversations and total occurrences
    per text. Returns (text, n_convs, n_occurrences); null texts are
    excluded. At 100 TB you would bucket on a 128-bit text digest and
    carry the digest, not the string — the shape is identical."""
    nb = num_buckets or _buckets_for_cluster()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[text_col, conv_col]].dropna(subset=[text_col])
        p = (
            b.groupby([text_col, conv_col], sort=False)
            .size()
            .rename("_n")
            .reset_index()
        )
        p["_bb"] = _key_buckets(p[text_col], nb)
        return p

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pairs = (
            g.groupby([text_col, conv_col], sort=False)["_n"].sum().reset_index()
        )
        agg = (
            pairs.groupby(text_col, sort=False)
            .agg(n_convs=(conv_col, "size"), n_occurrences=("_n", "sum"))
            .reset_index()
        )
        return agg[agg["n_convs"] >= min_convs]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bb")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def repeated_turn_runs(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    min_run: int = 2,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Retry-loop detection: maximal runs of CONSECUTIVE turns within
    a conversation repeating the same (role, text) — the
    user-hammering-resend / assistant-stuck-in-a-loop artifact that
    inflates token counts and teaches models to repeat themselves.
    Gaps-and-islands on (conv, role, text); one conv-bucketed shuffle,
    island ids are cumcount arithmetic. Null-text turns are excluded
    (they cannot form a run). Returns (conv, role, text, run_len,
    first_ord) for runs of length >= ``min_run``."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, role_col, text_col]].dropna(
            subset=[text_col]
        )
        b = b.copy()
        b["_rb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        rn = g.groupby(conv_col, sort=False).cumcount()
        rn_rt = g.groupby([conv_col, role_col, text_col], sort=False).cumcount()
        g = g.assign(_island=rn - rn_rt)
        agg = (
            g.groupby([conv_col, role_col, text_col, "_island"], sort=False)
            .agg(run_len=(order_col, "size"), first_ord=(order_col, "min"))
            .reset_index()
        )
        agg = agg[agg["run_len"] >= min_run]
        return agg[[conv_col, role_col, text_col, "run_len", "first_ord"]]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_rb")
        .map_groups(build, batch_format="pandas")
    )


def instruction_pairs(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
    assistant_role: str = "assistant",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Instruction->response pair extraction: every ``user_role`` turn
    immediately followed (in turn order) by an ``assistant_role`` turn
    becomes one SFT example (conv, ord, prompt, response) — the
    adjacency-pair miner that turns raw transcripts into
    prompt/completion rows. One conv-bucketed shuffle; the follower is
    a per-conversation shift(-1) (SQL ``lead()``), so a user turn
    followed by a tool turn or another user turn is correctly
    skipped."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, role_col, text_col]].copy()
        b["_pb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        grp = g.groupby(conv_col, sort=False)
        next_role = grp[role_col].shift(-1)
        next_text = grp[text_col].shift(-1)
        keep = (g[role_col] == user_role) & (next_role == assistant_role)
        out = pd.DataFrame(
            {
                conv_col: g[conv_col],
                order_col: g[order_col],
                "prompt": g[text_col],
                "response": next_text,
            }
        )
        return out[keep.to_numpy()]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(build, batch_format="pandas")
    )


def _conv_prefixes(
    g: pd.DataFrame,
    conv_col: str,
    order_col: str,
    text_col: str,
    prefix_turns: int,
    sep: str,
) -> tuple[pd.DataFrame, np.ndarray, pd.DataFrame]:
    """Per-conversation first-``prefix_turns`` prefix string with SQL
    ``string_agg`` semantics: null texts are skipped, and an ALL-null
    prefix is SQL NULL — it joins/groups with nothing downstream, so
    those conversations are dropped here rather than colliding on the
    empty string (which would weld unrelated no-text conversations
    into one fork group). Shared by ``prefix_fork_groups`` and
    ``preference_pairs`` so the two operators cannot drift.

    Returns (sorted frame, per-row rank array, one-row-per-conv frame
    with a non-null ``prefix`` column)."""
    g = g.sort_values([conv_col, order_col], kind="mergesort")
    rn = g.groupby(conv_col, sort=False).cumcount().to_numpy()
    head = g[rn < prefix_turns]
    agg = (
        head.groupby(conv_col, sort=False)[text_col]
        .agg(
            lambda s: (lambda v: sep.join(v) if v else None)(
                [x for x in s if not pd.isna(x)]
            )
        )
        .rename("prefix")
        .reset_index()
    )
    agg = agg[agg["prefix"].notna()]
    return g, rn, agg


def prefix_fork_groups(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    prefix_turns: int = 2,
    sep: str = "\n",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Shared-prefix (fork / regeneration) grouping: conversations
    whose first ``prefix_turns`` turns are textually identical are the
    same dialogue forked — regenerated answers, A/B'd system prompts,
    resumed sessions — and training on every fork overweights the
    shared stem. Stage 1 (conv-bucketed shuffle) assembles each
    conversation's prefix string (rank-ordered, null texts skipped per
    SQL ``string_agg``; ALL-null prefixes are SQL NULL and dropped —
    see ``_conv_prefixes``); stage 2 (prefix-bucketed shuffle over ONE ROW
    PER CONVERSATION) counts the fork group and annotates every
    member. Returns (conv, prefix, n_convs_sharing). At 100 TB the
    second shuffle carries a prefix digest instead of the string —
    same shape."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, text_col]].copy()
        b["_fb"] = _key_buckets(b[conv_col], nb)
        return b

    def build_prefix(g: pd.DataFrame) -> pd.DataFrame:
        _, _, agg = _conv_prefixes(
            g, conv_col, order_col, text_col, prefix_turns, sep
        )
        agg["_gb"] = _key_buckets(agg["prefix"], nb)
        return agg

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby("prefix", sort=False)[conv_col].transform("size")
        return pd.DataFrame(
            {
                conv_col: g[conv_col],
                "prefix": g["prefix"],
                "n_convs_sharing": n.astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_fb")
        .map_groups(build_prefix, batch_format="pandas")
        .groupby("_gb")
        .map_groups(count_group, batch_format="pandas")
    )


def echo_pairs(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
    assistant_role: str = "assistant",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Assistant-echo measurement: for every adjacent
    (``user_role`` -> ``assistant_role``) turn pair, the DISTINCT
    whitespace-token overlap between the two texts — the verbatim-echo
    signal (assistant parroting the user) that quality filters
    threshold on. Integer counts only (n_user_tokens,
    n_assistant_tokens, n_shared) so the Jaccard the caller derives is
    float-free here and the SQL mirror is exact. Tokenization is
    lowercase + single-space split, identical to DuckDB
    ``string_split(lower(x), ' ')``.

    One conv-bucketed shuffle builds the pairs; the overlap is
    computed by EXPLODING each side's distinct tokens and merging on
    (pair, token) — C-level joins, no per-row Python set work."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, role_col, text_col]].copy()
        b["_eb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        grp = g.groupby(conv_col, sort=False)
        next_role = grp[role_col].shift(-1)
        next_text = grp[text_col].shift(-1)
        keep = (
            (g[role_col] == user_role)
            & (next_role == assistant_role)
            & g[text_col].notna()
            & next_text.notna()
        ).to_numpy()
        pairs = pd.DataFrame(
            {
                conv_col: g[conv_col].to_numpy()[keep],
                order_col: g[order_col].to_numpy()[keep],
                "_u": g[text_col].str.lower().to_numpy()[keep],
                "_a": next_text.str.lower().to_numpy()[keep],
            }
        )
        if len(pairs) == 0:
            return pd.DataFrame(
                {
                    conv_col: pd.Series(dtype=g[conv_col].dtype),
                    order_col: pd.Series(dtype=g[order_col].dtype),
                    "n_user_tokens": pd.Series(dtype="int64"),
                    "n_assistant_tokens": pd.Series(dtype="int64"),
                    "n_shared": pd.Series(dtype="int64"),
                }
            )
        pid = np.arange(len(pairs))

        def side_tokens(texts: pd.Series) -> pd.DataFrame:
            t = texts.str.split(" ")
            lens = t.str.len().to_numpy()
            return pd.DataFrame(
                {
                    "_pid": np.repeat(pid, lens),
                    "_tok": np.concatenate(t.to_numpy()),
                }
            ).drop_duplicates()

        ut = side_tokens(pairs["_u"])
        at = side_tokens(pairs["_a"])
        shared = ut.merge(at, on=["_pid", "_tok"])
        n_u = ut.groupby("_pid").size().reindex(pid, fill_value=0)
        n_a = at.groupby("_pid").size().reindex(pid, fill_value=0)
        n_s = shared.groupby("_pid").size().reindex(pid, fill_value=0)
        return pd.DataFrame(
            {
                conv_col: pairs[conv_col],
                order_col: pairs[order_col],
                "n_user_tokens": n_u.to_numpy().astype(np.int64),
                "n_assistant_tokens": n_a.to_numpy().astype(np.int64),
                "n_shared": n_s.to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_eb")
        .map_groups(build, batch_format="pandas")
    )


def conversation_language_consistency(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Language-consistency screen: language-ID every turn (map-side,
    the stopword-hit heuristic from ``text.LangId`` — no shuffle),
    then ONE conv-bucketed exchange of per-block (conv, lang, n)
    partials to find each conversation's majority language and how
    many turns disagree with it. Mixed-language transcripts (copy-paste
    contamination, wrong-locale sessions) are the usual drop. Ties on
    the majority count break by ``LANG_PRIORITY``, matching the
    per-turn tie-break. Returns (conv, majority_lang, n_turns,
    n_minority, consistent)."""
    from .text import LANG_PRIORITY, LangId

    nb = num_buckets or _buckets_for_cluster()
    lid = LangId(text_col)
    prio = {lang: i for i, lang in enumerate(LANG_PRIORITY)}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        scored = lid(b[[conv_col, text_col]].copy())
        p = (
            scored.groupby([conv_col, "lang_pred"], sort=False)
            .size()
            .rename("_n")
            .reset_index()
        )
        p["_qb"] = _key_buckets(p[conv_col], nb)
        return p

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pairs = (
            g.groupby([conv_col, "lang_pred"], sort=False)["_n"]
            .sum()
            .reset_index()
        )
        pairs["_p"] = pairs["lang_pred"].map(prio)
        pairs = pairs.sort_values(
            [conv_col, "_n", "_p"], ascending=[True, False, True],
            kind="mergesort",
        )
        pairs["_tot"] = pairs.groupby(conv_col, sort=False)["_n"].transform(
            "sum"
        )
        top = pairs.groupby(conv_col, sort=False).head(1)
        out = pd.DataFrame(
            {
                conv_col: top[conv_col].to_numpy(),
                "majority_lang": top["lang_pred"].to_numpy(),
                "n_turns": top["_tot"].to_numpy().astype(np.int64),
                "n_minority": (top["_tot"] - top["_n"]).to_numpy().astype(
                    np.int64
                ),
            }
        )
        out["consistent"] = out["n_minority"] == 0
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_qb")
        .map_groups(reduce_bucket, batch_format="pandas")
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


def preference_pairs(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prefix_turns: int = 1,
    assistant_role: str | None = None,
    sep: str = "\n",
    max_group: int | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Preference-pair mining from shared-prefix forks: conversations
    whose first ``prefix_turns`` turns are textually identical are the
    same dialogue regenerated, and their DIFFERING next turns are
    natural (chosen, rejected) candidates for reward-model training.
    Emits one row per unordered conversation pair within a fork group
    whose fork-turn texts differ: (prefix, conv_a, conv_b,
    response_a, response_b) with conv_a < conv_b.

    Stage 1 (conv-bucketed shuffle) assembles each conversation's
    prefix string plus its fork turn (rank ``prefix_turns``, i.e. the
    turn right after the prefix); ``assistant_role`` optionally
    requires the fork turn to carry that role. Stage 2 buckets the
    ONE-ROW-PER-CONVERSATION table by prefix and self-merges per
    group (C-level join, no per-row Python). ``max_group`` SKIPS fork
    groups larger than the cap — the anti-quadratic guard a 100-TB
    run sets (a 10k-fork template would otherwise emit 5*10^7 pairs);
    skipped mass is bounded by cap^2 per group either way."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, role_col, text_col]].copy()
        b["_qb"] = _key_buckets(b[conv_col], nb)
        return b

    def build_prefix(g: pd.DataFrame) -> pd.DataFrame:
        g, rn, agg = _conv_prefixes(
            g, conv_col, order_col, text_col, prefix_turns, sep
        )
        fork = g[rn == prefix_turns]
        if assistant_role is not None:
            fork = fork[fork[role_col] == assistant_role]
        fork = fork[[conv_col, text_col]].rename(columns={text_col: "_resp"})
        agg = agg.merge(fork, on=conv_col, how="inner")
        agg = agg[agg["_resp"].notna()]
        agg["_gb"] = _key_buckets(agg["prefix"], nb)
        return agg

    def pair_group(g: pd.DataFrame) -> pd.DataFrame:
        if max_group is not None:
            sz = g.groupby("prefix", sort=False)[conv_col].transform("size")
            g = g[sz.to_numpy() <= max_group]
        m = g.merge(g, on="prefix", suffixes=("_a", "_b"))
        m = m[
            (m[f"{conv_col}_a"] < m[f"{conv_col}_b"])
            & (m["_resp_a"] != m["_resp_b"])
        ]
        return pd.DataFrame(
            {
                "prefix": m["prefix"],
                "conv_a": m[f"{conv_col}_a"],
                "conv_b": m[f"{conv_col}_b"],
                "response_a": m["_resp_a"],
                "response_b": m["_resp_b"],
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_qb")
        .map_groups(build_prefix, batch_format="pandas")
        .groupby("_gb")
        .map_groups(pair_group, batch_format="pandas")
    )


def turn_gap_stats(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    burst_us: int = 60_000_000,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-conversation inter-turn timing screen: turn count, wall
    span, largest gap, burst count (consecutive-turn gaps shorter
    than ``burst_us`` — resend hammering / scripted traffic), and
    out-of-order timestamp count (gap < 0 in turn order — clock skew
    or mis-sequenced ingestion). All integers in microseconds so the
    SQL mirror (lead() over epoch_us) is exact. One conv-bucketed
    shuffle; gaps are shift arithmetic."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, ts_col]].copy()
        b["_gb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        tsv = g[ts_col].astype("datetime64[us]")
        # Null timestamps must be EXCLUDED, not cast (NaT -> int64 is
        # the -2^63 sentinel, which would poison span/gap/burst counts
        # where the SQL mirror's epoch_us(NULL) is skipped by MAX/SUM).
        us = tsv.astype("int64").astype("float64").mask(tsv.isna())
        conv = g[conv_col].to_numpy()
        nxt = us.groupby(g[conv_col], sort=False).shift(-1)
        gap = (nxt - us).to_numpy()  # NaN on last turn / null ts pairs
        has = ~np.isnan(gap)
        gf = pd.DataFrame(
            {
                conv_col: conv,
                "_n": 1,
                "_ts": us.to_numpy(),
                "_gap": np.where(has, gap, np.nan),
            }
        )
        agg = gf.groupby(conv_col, sort=False).agg(
            n_turns=("_n", "sum"),
            _min=("_ts", "min"),
            _max=("_ts", "max"),
            max_gap_us=("_gap", "max"),
        )
        bursts = (
            gf[has & (gf["_gap"] < burst_us)]
            .groupby(conv_col, sort=False)["_n"].sum()
        )
        ooo = (
            gf[has & (gf["_gap"] < 0)]
            .groupby(conv_col, sort=False)["_n"].sum()
        )
        out = agg.reset_index()
        # Float spans are exact (< 2^53 us); all-null-ts convs get SQL
        # NULL (Int64 NA), matching CAST(NULL AS BIGINT).
        out["span_us"] = (out["_max"] - out["_min"]).astype("Int64")
        out["max_gap_us"] = out["max_gap_us"].fillna(0).astype("int64")
        out["n_bursts"] = (
            out[conv_col].map(bursts).fillna(0).astype("int64")
        )
        out["n_out_of_order"] = (
            out[conv_col].map(ooo).fillna(0).astype("int64")
        )
        out["n_turns"] = out["n_turns"].astype("int64")
        return out[
            [conv_col, "n_turns", "span_us", "max_gap_us", "n_bursts",
             "n_out_of_order"]
        ]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_gb")
        .map_groups(build, batch_format="pandas")
    )


def context_truncate(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    budget_tokens: int = 2048,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Context-window trimming: keep each conversation's most recent
    turns whose cumulative token count (counted from the END) fits
    ``budget_tokens``; the final turn always survives even if it
    alone busts the budget (a training example needs its target).
    Tokens are single-space-split counts (null text = 0), identical
    to DuckDB ``len(string_split(x, ' '))``, so the mirror is exact.
    Returns the surviving rows with n_tokens and the running
    from-the-end total. One conv-bucketed shuffle; the scan is a
    reverse cumsum."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, text_col]].copy()
        b["_cb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [conv_col, order_col], ascending=[True, False],
            kind="mergesort",
        )
        ntok = (g[text_col].str.count(" ") + 1).fillna(0).astype("int64")
        grp = ntok.groupby(g[conv_col], sort=False)
        cum = grp.cumsum()
        is_last = grp.cumcount() == 0  # first in DESC order = last turn
        keep = ((cum <= budget_tokens) | is_last).to_numpy()
        out = pd.DataFrame(
            {
                conv_col: g[conv_col],
                order_col: g[order_col],
                text_col: g[text_col],
                "n_tokens": ntok,
                "cum_tokens_from_end": cum.astype("int64"),
            }
        )
        return out[keep]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_cb")
        .map_groups(build, batch_format="pandas")
    )


def refusal_screen(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
    pattern: str = (
        r"(?i)\b(i can(?:no|')t|i cannot|i'm (?:sorry|unable)|"
        r"i am (?:sorry|unable)|as an ai\b|i won't)"
    ),
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Canned-refusal screen: per conversation, how many
    ``assistant_role`` turns there are and how many match the refusal
    ``pattern`` (RE2-compatible, case-insensitivity via inline (?i) so
    the DuckDB ``regexp_matches`` mirror uses the SAME string). Pure
    map-side partials per (conv); ONE bounded-fanout shuffle via
    bucketed_agg — no raw turns move. Downstream filters threshold
    n_refusal_turns / n_assistant_turns (ints only; no float here)."""
    from .windows import bucketed_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        is_a = (b[role_col] == assistant_role).to_numpy()
        # Run the (alternation-heavy) regex on assistant rows only —
        # on multi-role transcripts that's a minority of the batch.
        hit = np.zeros(len(b), dtype=bool)
        if is_a.any():
            hit[is_a] = (
                b.loc[is_a, text_col]
                .str.contains(pattern, regex=True, na=False)
                .to_numpy()
            )
        return pd.DataFrame(
            {
                conv_col: b[conv_col],
                "n_assistant_turns": is_a.astype(np.int64),
                "n_refusal_turns": hit.astype(np.int64),
            }
        )

    return bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        conv_col,
        {"n_assistant_turns": "sum", "n_refusal_turns": "sum"},
        nb=num_buckets,
    )


def tool_usage_stats(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-conversation tool-call profile for agent-trajectory
    curation: total turns, tool turns, distinct tools, dominant tool
    (most frequent; ties break by tool name so the SQL mirror is
    exact), and the longest consecutive same-tool run over the
    conversation's tool turns in turn order — the stuck-agent /
    tool-loop screen (an agent re-invoking one tool k times in a row
    is looping even when each call's arguments differ, which
    ``repeated_turn_runs``'s same-text islands cannot see).
    Non-tool turns between two calls do NOT break a run: assistant ->
    tool -> assistant -> same tool is the loop shape being screened.

    One conv-bucketed shuffle; runs are double-cumcount
    gaps-and-islands, everything else is C-level groupbys. At 100 TB
    the shuffle carries (conv, ord, tool) only."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, tool_col]].copy()
        b["_tb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False + merges (not .map): a null conv id is one
        # group like any other, matching SQL GROUP BY / PARTITION BY
        # (pandas merge keys treat NaN as equal, Series.map does not).
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        out = (
            g.groupby(conv_col, sort=False, dropna=False)
            .size()
            .rename("n_turns")
            .reset_index()
        )
        t = g[g[tool_col].notna()]
        rn = t.groupby(conv_col, sort=False, dropna=False).cumcount().to_numpy()
        rnt = (
            t.groupby([conv_col, tool_col], sort=False, dropna=False)
            .cumcount()
            .to_numpy()
        )
        tf = pd.DataFrame(
            {
                conv_col: t[conv_col].to_numpy(),
                "tool": t[tool_col].to_numpy(),
                "_isl": rn - rnt,
            }
        )
        runs = (
            tf.groupby([conv_col, "tool", "_isl"], sort=False, dropna=False)
            .size()
            .rename("_rl")
            .reset_index()
        )
        mr = (
            runs.groupby(conv_col, sort=False, dropna=False)["_rl"]
            .max()
            .rename("max_tool_run")
            .reset_index()
        )
        agg = (
            tf.groupby(conv_col, sort=False, dropna=False)
            .agg(n_tool_turns=("tool", "size"), n_distinct_tools=("tool", "nunique"))
            .reset_index()
        )
        cnt = (
            tf.groupby([conv_col, "tool"], sort=False, dropna=False)
            .size()
            .reset_index(name="_n")
            .sort_values(
                [conv_col, "_n", "tool"],
                ascending=[True, False, True],
                kind="mergesort",
            )
        )
        top = cnt.drop_duplicates(conv_col, keep="first")[
            [conv_col, "tool"]
        ].rename(columns={"tool": "top_tool"})
        out = (
            out.merge(agg, on=conv_col, how="left")
            .merge(top, on=conv_col, how="left")
            .merge(mr, on=conv_col, how="left")
        )
        for c in ("n_tool_turns", "n_distinct_tools", "max_tool_run"):
            out[c] = out[c].fillna(0).astype("int64")
        out["n_turns"] = out["n_turns"].astype("int64")
        tt = out["top_tool"]
        out["top_tool"] = tt.astype(object).where(tt.notna(), None)
        return out[
            [conv_col, "n_turns", "n_tool_turns", "n_distinct_tools",
             "top_tool", "max_tool_run"]
        ]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_tb")
        .map_groups(build, batch_format="pandas")
    )


def tool_transitions(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Global tool->tool adjacency counts over each conversation's
    tool turns in turn order — the tool-chain transition graph an
    agent-workflow analysis ranks (which tool follows which; feed it
    to the graph operators for communities/PageRank over tools).
    Adjacency needs whole conversations co-located, so stage 1 is the
    conv-bucketed shuffle emitting per-bucket (from, to, n) partials;
    stage 2 is ONE ``bucketed_agg`` over those partials — the second
    exchange carries tool-pair cardinality, never turns."""
    from .windows import bucketed_agg

    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, tool_col]].copy()
        b = b[b[tool_col].notna()]
        b["_tb"] = _key_buckets(b[conv_col], nb)
        return b

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        # dropna=False: a null conv id is ONE conversation (SQL
        # PARTITION BY groups NULLs together) — its transitions count.
        nxt = g.groupby(conv_col, sort=False, dropna=False)[tool_col].shift(-1)
        keep = nxt.notna().to_numpy()
        pf = pd.DataFrame(
            {
                "tool_from": g[tool_col].to_numpy()[keep],
                "tool_to": nxt.to_numpy()[keep],
            }
        )
        return (
            pf.groupby(["tool_from", "tool_to"], sort=False)
            .size()
            .reset_index(name="n")
        )

    partials = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_tb")
        .map_groups(pairs, batch_format="pandas")
    )
    return bucketed_agg(
        partials, ["tool_from", "tool_to"], {"n": "sum"}, nb=num_buckets
    )


def fork_best_of_n(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    prefix_turns: int = 1,
    score_col: str | None = None,
    sep: str = "\n",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Rejection-sampling selection within shared-prefix fork groups:
    keep ONE conversation per fork group — the one whose fork turn
    (rank ``prefix_turns``) maximizes the score, ties broken by conv
    id ascending so the SQL mirror is exact. ``score_col`` names an
    integer per-turn score column; when None the score is the fork
    turn's character length (the cheap best-of-N heuristic; null
    scores rank LAST like SQL NULLS LAST, so a group whose every
    score is null still yields its conv-asc winner with a null
    score). Returns (prefix, conv, score, n_candidates) — one row per
    fork group, ``n_candidates`` counting ALL scored forks in the
    group, winner included (a 3-way fork reports 3).

    The N-way regeneration shape ``preference_pairs`` mines pairs
    from is the same one best-of-N sampling keeps winners from; this
    is that second consumer. Same two bounded shuffles: conv-bucketed
    prefix+fork assembly (via ``_conv_prefixes``; all-null prefixes
    are SQL NULL and join nothing), then a prefix-bucketed one-row-
    per-conversation reduce."""
    nb = num_buckets or _buckets_for_cluster()
    cols = [conv_col, order_col, text_col] + (
        [score_col] if score_col else []
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[cols].copy()
        b["_bb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g, rn, agg = _conv_prefixes(
            g, conv_col, order_col, text_col, prefix_turns, sep
        )
        fork = g[rn == prefix_turns]
        fork = fork[fork[text_col].notna()]
        # Nullable Int64 keeps null scores (SQL NULLS LAST in pick)
        # instead of crashing the int cast on a NaN.
        if score_col:
            score = fork[score_col].astype("Int64")
        else:
            score = fork[text_col].str.len().astype("Int64")
        fork = pd.DataFrame(
            {conv_col: fork[conv_col], "score": score}
        )
        agg = agg.merge(fork, on=conv_col, how="inner")
        agg["_gb"] = _key_buckets(agg["prefix"], nb)
        return agg

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["prefix", "score", conv_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        n = g.groupby("prefix", sort=False)[conv_col].transform("size")
        g = g.assign(n_candidates=n.astype("int64"))
        out = g.drop_duplicates("prefix", keep="first")
        return out[["prefix", conv_col, "score", "n_candidates"]]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bb")
        .map_groups(build, batch_format="pandas")
        .groupby("_gb")
        .map_groups(pick, batch_format="pandas")
    )


def _fork_scores_stage(
    conv_col: str,
    order_col: str,
    text_col: str,
    score_col: str | None,
    prefix_turns: int,
    sep: str,
    nb: int,
):
    """Shared stage-1 kernels for the fork-group RL-data operators:
    conv-bucketed (prefix, conv, score) candidate assembly, exactly the
    shape ``fork_best_of_n`` selects winners from. Null-score forks are
    EXCLUDED here (SQL aggregates over the score skip NULLs; a group
    statistic over no scores is undefined), unlike best-of-N where a
    null score merely ranks last."""
    cols = [conv_col, order_col, text_col] + (
        [score_col] if score_col else []
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[cols].copy()
        b["_bb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g, rn, agg = _conv_prefixes(
            g, conv_col, order_col, text_col, prefix_turns, sep
        )
        fork = g[rn == prefix_turns]
        fork = fork[fork[text_col].notna()]
        if score_col:
            fork = fork[fork[score_col].notna()]
            score = fork[score_col].astype("int64")
        else:
            score = fork[text_col].str.len().astype("int64")
        fork = pd.DataFrame({conv_col: fork[conv_col], "score": score})
        agg = agg.merge(fork, on=conv_col, how="inner")
        agg["_gb"] = _key_buckets(agg["prefix"], nb)
        return agg

    return add_bucket, build


def fork_advantage(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    prefix_turns: int = 1,
    score_col: str | None = None,
    sep: str = "\n",
    normalize: str = "none",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Group-relative advantage (the GRPO / RLOO reward-normalization
    step) within shared-prefix fork groups: every scored candidate gets
    ``advantage = score - mean(group scores)``, computed as the exact
    integer numerator ``score*n - sum`` divided ONCE in float64 — so
    the value is bit-identical to the SQL mirror's
    ``CAST(score*n - s AS DOUBLE)/n`` and the oracle hash-matches
    (float chains over per-group means would not). With
    ``normalize="std"`` the advantage is instead the GRPO z-score
    ``(score - mean) / std_pop``, still hash-exact: the algebraic form
    ``(score*n - s) / sqrt(n*ss - s²)`` is one correctly-rounded sqrt
    and one division over exact integers, so
    numpy and the SQL mirror agree bitwise; zero-variance groups get
    advantage 0 (the GRPO convention — no signal, no update). Returns
    one row per candidate: (prefix, conv, score, n_candidates,
    advantage). Same two bounded shuffles as ``fork_best_of_n``;
    singleton groups get advantage 0 (their score IS the mean). When
    ``score_col`` is None the score is the fork turn's character
    length."""
    if normalize not in ("none", "std"):
        raise ValueError(f"normalize must be 'none' or 'std': {normalize!r}")
    nb = num_buckets or _buckets_for_cluster()
    add_bucket, build = _fork_scores_stage(
        conv_col, order_col, text_col, score_col, prefix_turns, sep, nb
    )

    def adv(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("prefix", sort=False)["score"]
        n = grp.transform("size").to_numpy(dtype=np.int64)
        s = grp.transform("sum").to_numpy(dtype=np.int64)
        sc = g["score"].to_numpy(dtype=np.int64)
        num = sc * n - s
        if normalize == "std":
            # std_pop = sqrt((n*ss - s²)/n²) = sqrt(n*ss - s²)/n, so
            # z = ((sc*n - s)/n) / std_pop = (sc*n - s)/sqrt(n*ss - s²)
            ss = (
                (g["score"] * g["score"])
                .groupby(g["prefix"], sort=False)
                .transform("sum")
                .to_numpy(dtype=np.int64)
            )
            var_num = n * ss - s * s
            with np.errstate(divide="ignore", invalid="ignore"):
                a = num.astype(np.float64) / np.sqrt(
                    var_num.astype(np.float64)
                )
            a = np.where(var_num == 0, 0.0, a)
        else:
            a = num.astype(np.float64) / n
        out = pd.DataFrame(
            {
                "prefix": g["prefix"],
                conv_col: g[conv_col],
                "score": sc,
                "n_candidates": n,
                "advantage": a,
            }
        )
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bb")
        .map_groups(build, batch_format="pandas")
        .groupby("_gb")
        .map_groups(adv, batch_format="pandas")
    )


def fork_pass_rate(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    prefix_turns: int = 1,
    score_col: str | None = None,
    threshold: int = 0,
    sep: str = "\n",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-fork-group pass@k estimation table: for each shared-prefix
    group of N regenerated candidates, how many scored >= ``threshold``
    and the pass fraction — the per-prompt difficulty signal that
    drives curriculum mixes and RL prompt selection. ``pass_rate`` is
    one exact-int division (n_pass/n) so the SQL mirror hash-matches.
    Returns one row per group: (prefix, n_candidates, n_pass,
    pass_rate). Same shuffles as ``fork_advantage``."""
    nb = num_buckets or _buckets_for_cluster()
    add_bucket, build = _fork_scores_stage(
        conv_col, order_col, text_col, score_col, prefix_turns, sep, nb
    )

    def rate(g: pd.DataFrame) -> pd.DataFrame:
        ok = (g["score"].to_numpy(dtype=np.int64) >= threshold).astype(
            np.int64
        )
        agg = (
            g.assign(_ok=ok)
            .groupby("prefix", sort=False)
            .agg(n_candidates=("score", "size"), n_pass=("_ok", "sum"))
            .reset_index()
        )
        agg["pass_rate"] = (
            agg["n_pass"].to_numpy(dtype=np.float64)
            / agg["n_candidates"].to_numpy(dtype=np.int64)
        )
        return agg[["prefix", "n_candidates", "n_pass", "pass_rate"]]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bb")
        .map_groups(build, batch_format="pandas")
        .groupby("_gb")
        .map_groups(rate, batch_format="pandas")
    )


def _levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Unit-cost edit distance over UTF-8 BYTES — DuckDB's
    ``levenshtein`` operates on bytes, not codepoints (probed:
    levenshtein('café','cafe') = 2), and the oracle gate needs exact
    agreement. Two-row DP with the inner minimum vectorized in numpy
    (np.minimum.accumulate over the running-insert axis), so cost is
    O(len(a)) numpy ops per byte of b rather than a Python cell loop."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    av = np.frombuffer(a, dtype=np.uint8).astype(np.int64)
    prev = np.arange(len(a) + 1, dtype=np.int64)
    for i, cb in enumerate(b):
        cur = np.empty_like(prev)
        cur[0] = i + 1
        sub = prev[:-1] + (av != cb)
        dele = prev[1:] + 1
        np.minimum(sub, dele, out=cur[1:])
        # running inserts: cur[j] = min(cur[j], cur[j-1]+1) left-to-right
        # == cummin over (cur[j] - j) + j
        shifted = cur - np.arange(len(cur), dtype=np.int64)
        np.minimum.accumulate(shifted, out=shifted)
        cur = shifted + np.arange(len(cur), dtype=np.int64)
        prev = cur
    return int(prev[-1])


def retry_edit_distance(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Retry-divergence measurement: for every pair of CONSECUTIVE
    same-role turns in a conversation (the regeneration / resend
    shape ``repeated_turn_runs`` detects exact repeats of), the edit
    distance between the two texts — distance 0 is a verbatim resend,
    small distances are near-identical regenerations worth collapsing,
    large ones are genuine rewrites worth keeping as preference data.
    One conv-bucketed shuffle; pair discovery is a per-conversation
    ``shift`` (SQL ``lag()``), the DP runs only on the matched pairs.
    Both texts must be non-null. Returns (conv, ord, role, dist,
    len_prev, len_next) with ``ord`` the LATER turn's order and
    byte lengths of both sides (the normalization denominators)."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, role_col, text_col]].copy()
        b["_eb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        grp = g.groupby(conv_col, sort=False)
        prole = grp[role_col].shift(1)
        ptext = grp[text_col].shift(1)
        keep = (
            (g[role_col] == prole)
            & g[text_col].notna()
            & ptext.notna()
        ).to_numpy()
        cur = g[text_col].to_numpy()[keep]
        prv = ptext.to_numpy()[keep]
        pb = [s.encode("utf-8") for s in prv]
        cb = [s.encode("utf-8") for s in cur]
        dist = np.fromiter(
            (_levenshtein_bytes(x, y) for x, y in zip(pb, cb)),
            dtype=np.int64,
            count=len(pb),
        )
        return pd.DataFrame(
            {
                conv_col: g[conv_col].to_numpy()[keep],
                order_col: g[order_col].to_numpy()[keep],
                role_col: g[role_col].to_numpy()[keep],
                "dist": dist,
                "len_prev": np.fromiter(
                    (len(x) for x in pb), dtype=np.int64, count=len(pb)
                ),
                "len_next": np.fromiter(
                    (len(x) for x in cb), dtype=np.int64, count=len(cb)
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_eb")
        .map_groups(build, batch_format="pandas")
    )


def discounted_returns(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    reward_col: str = "reward",
    gamma: float = 0.5,
    horizon: int = 16,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-turn discounted return (RL credit assignment over
    trajectories): ``ret_t = sum_{j=0..horizon} gamma^j * r_{t+j}``
    within each conversation, in turn order. Constraints make the
    float column ORACLE-HASH-EXACT rather than merely close:
    ``gamma`` must be a power of two (each term ``r * 2^-jm`` is a
    dyadic rational, so every partial sum is exactly representable
    and addition order cannot matter) and the horizon is bounded
    (terms span ``horizon*log2(1/gamma) + bits(r)`` < 53 bits for
    integer rewards, so no rounding ever occurs — numpy's j-loop and
    the SQL mirror's join-sum agree bitwise). Null-reward turns are
    EXCLUDED entirely (they neither receive nor contribute return;
    discount distance is rank distance in the filtered sequence).
    One conv-bucketed shuffle; the return is ``horizon`` C-level
    shifted adds per bucket, no Python per row. Returns (conv, ord,
    reward, ret)."""
    import math

    lg = math.log2(gamma)
    if gamma <= 0 or gamma > 1 or lg != int(lg):
        raise ValueError(
            f"gamma must be a power of two in (0, 1]: {gamma!r}"
        )
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0: {horizon!r}")
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, reward_col]].dropna(
            subset=[reward_col]
        )
        b = b.copy()
        b["_db"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        grp = g.groupby(conv_col, sort=False)[reward_col]
        r = g[reward_col].to_numpy(dtype=np.float64)
        ret = r.copy()
        for j in range(1, horizon + 1):
            sh = grp.shift(-j).to_numpy(dtype=np.float64)
            ret += (gamma**j) * np.nan_to_num(sh, nan=0.0)
        return pd.DataFrame(
            {
                conv_col: g[conv_col],
                order_col: g[order_col],
                "reward": g[reward_col],
                "ret": ret,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_db")
        .map_groups(build, batch_format="pandas")
    )


def fence_lint(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    fence: str = "```",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-conversation code-fence balance lint — the truncated-output
    screen: an assistant turn whose ``fence`` (markdown ``` by default)
    count is ODD was cut off mid-code-block (stop-sequence hit, context
    overflow, streaming drop) and is unusable as a training target.

    Per conversation: ``n_fenced_turns`` (turns containing >= 1 fence),
    ``n_unbalanced`` (turns with an odd fence count),
    ``last_unbalanced`` (the conversation's FINAL turn is unbalanced —
    the classic mid-generation truncation shape) and the combined
    ``ok`` gate. Null-text turns carry no fences (counted as balanced);
    fence counting is non-overlapping left-to-right, exactly SQL's
    ``(length(x) - length(replace(x, f, ''))) / length(f)``.

    Scale: the fence count is computed MAP-SIDE per block (compiled
    vectorized count) and only four small integer columns enter the ONE
    conv-bucketed shuffle — turn texts never move. Per-bucket stats are
    C-level groupby arithmetic.

    Reference parity: beyond-reference curation (the reference stops at
    silver Parquet); the validation shape mirrors its DQ gate
    (glue/dq/rules.py analogues) applied to generation integrity.
    """
    import re

    nb = num_buckets or _buckets_for_cluster()
    pat = re.compile(re.escape(fence))

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        n = b[text_col].str.count(pat).fillna(0).astype("int64")
        out = pd.DataFrame(
            {
                conv_col: b[conv_col],
                order_col: b[order_col],
                "_fenced": (n > 0).astype("int64"),
                "_unbal": (n % 2).astype("int64"),
            }
        )
        out["_fb"] = _key_buckets(out[conv_col], nb)
        return out

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        agg = g.groupby(conv_col, sort=False).agg(
            n_turns=("_fenced", "size"),
            n_fenced_turns=("_fenced", "sum"),
            n_unbalanced=("_unbal", "sum"),
            last_unbalanced=("_unbal", "last"),
        )
        out = agg.reset_index()
        for c in ("n_turns", "n_fenced_turns", "n_unbalanced"):
            out[c] = out[c].astype("int64")
        out["last_unbalanced"] = out["last_unbalanced"].astype(bool)
        out["ok"] = out["n_unbalanced"] == 0
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_fb")
        .map_groups(build, batch_format="pandas")
    )


def system_prompt_inventory(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Distinct opening-turn (system-prompt) inventory: every
    conversation's FIRST turn text, grouped — how many system-prompt /
    opener variants exist in the corpus, how many conversations each
    drives, and a representative conversation id per variant. The
    audit step before prompt-template consolidation or per-template
    stratified sampling.

    Scale: map-side each block keeps ONE candidate row per
    conversation (its block-local min ``order_col``), so the first
    conv-bucketed shuffle carries <= one row per conversation per
    block; each bucket reduces to the true first turn, and a second
    bounded shuffle over (text) — one row per CONVERSATION, never per
    turn — produces the inventory with a vectorized groupby.

    Returns (prompt, n_convs, example_conv) with SQL GROUP-BY
    semantics (null prompts form a group; ``example_conv`` = min).
    """
    from .windows import bucketed_agg

    nb = num_buckets or _buckets_for_cluster()

    def candidates(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[conv_col, order_col, text_col]].sort_values(
            [conv_col, order_col], kind="mergesort"
        )
        b = b.drop_duplicates(conv_col, keep="first").copy()
        b["_sb"] = _key_buckets(b[conv_col], nb)
        return b

    def first_turn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        g = g.drop_duplicates(conv_col, keep="first")
        return pd.DataFrame(
            {
                "prompt": g[text_col],
                "example_conv": g[conv_col],
                "n_convs": 1,
            }
        )

    firsts = (
        ds.map_batches(candidates, batch_format="pandas")
        .groupby("_sb")
        .map_groups(first_turn, batch_format="pandas")
    )
    return bucketed_agg(
        firsts, "prompt",
        {"example_conv": "min", "n_convs": "sum"},
    )


#: Imperative openers treated as commands by ``dialogue_acts``.
COMMAND_VERBS = (
    "write", "create", "make", "fix", "add", "generate", "explain",
    "list", "show", "give", "update", "delete", "run", "implement",
    "translate", "summarize",
)


def dialogue_acts(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str | None = "user",
    command_verbs: tuple[str, ...] = COMMAND_VERBS,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-conversation dialogue-act profile over (by default) user
    turns: questions / commands / statements — the request-mix signal
    behind instruction-following vs chat-style corpus weighting.

    Classification (deliberately SQL-mirrorable so the oracle can
    verify it): null texts are excluded; a turn ending in ``?`` is a
    question; else if its first space-split token lowercases to one of
    ``command_verbs`` it's a command; else a statement.

    Scale: classification and per-conv partial sums happen MAP-SIDE
    per block (vectorized str kernels); the single bounded-fanout
    shuffle (``bucketed_agg``) carries one partial row per conversation
    per block — never texts.
    """
    from .windows import bucketed_agg

    verbs = frozenset(v.lower() for v in command_verbs)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        m = b[text_col].notna()
        if user_role is not None:
            m &= b[role_col] == user_role
        t = b.loc[m, text_col]
        conv = b.loc[m, conv_col]
        q = t.str.endswith("?").to_numpy(dtype=bool)
        first = t.str.split(" ").str[0].str.lower()
        c = (~q) & first.isin(verbs).to_numpy(dtype=bool)
        part = pd.DataFrame(
            {
                conv_col: conv,
                "n_questions": q.astype("int64"),
                "n_commands": c.astype("int64"),
                "n_statements": (~q & ~c).astype("int64"),
            }
        )
        return (
            part.groupby(conv_col, sort=False, dropna=False)
            .sum()
            .reset_index()
        )

    return bucketed_agg(
        ds.map_batches(partials, batch_format="pandas"),
        conv_col,
        {"n_questions": "sum", "n_commands": "sum", "n_statements": "sum"},
        nb=num_buckets,
    )


def response_length_trend(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str | None = None,
    role: str | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-conversation verbosity drift: the OLS slope of turn text
    length against the turn's 0-based rank (optionally restricted to
    one ``role``, e.g. assistant). Positive slope = responses balloon
    over the conversation (context stuffing / rambling degeneration);
    negative = collapse toward terse replies — both curation signals
    for long-conversation filtering.

    Hash-exact by construction: with x = rank and y = length as exact
    int64, ``slope = (n*sxy - sx*sy) / (n*sxx - sx*sx)`` is computed as
    exact integer numerator and denominator (both < 2^53 for any
    realistic conversation) and ONE float64 division — bitwise equal to
    the SQL mirror's ``CAST(... AS DOUBLE) / ...``. Single-turn
    conversations (denominator 0) get SQL NULL.

    Scale: null texts drop and texts reduce to their LENGTH map-side,
    so the one conv-bucketed shuffle carries three int columns; ranks
    and the five sums are C-level groupby arithmetic per bucket.
    """
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        m = b[text_col].notna()
        if role_col is not None and role is not None:
            m &= b[role_col] == role
        b = b.loc[m]
        out = pd.DataFrame(
            {
                conv_col: b[conv_col],
                order_col: b[order_col],
                "_len": b[text_col].str.len().astype("int64"),
            }
        )
        out["_lb"] = _key_buckets(out[conv_col], nb)
        return out

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        x = g.groupby(conv_col, sort=False).cumcount().to_numpy(np.int64)
        y = g["_len"].to_numpy(np.int64)
        part = pd.DataFrame(
            {
                conv_col: g[conv_col],
                "_n": 1,
                "_sx": x,
                "_sy": y,
                "_sxy": x * y,
                "_sxx": x * x,
            }
        )
        a = part.groupby(conv_col, sort=False).sum().reset_index()
        n, sx, sy = (a[c].to_numpy(np.int64) for c in ("_n", "_sx", "_sy"))
        sxy, sxx = a["_sxy"].to_numpy(np.int64), a["_sxx"].to_numpy(np.int64)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = num.astype(np.float64) / den.astype(np.float64)
        out = pd.DataFrame(
            {
                conv_col: a[conv_col],
                "n_turns": n,
                "slope": np.where(den == 0, np.nan, slope),
            }
        )
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_lb")
        .map_groups(build, batch_format="pandas")
    )


def loss_mask_spans(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str = "role",
    mask_role: str = "assistant",
    sep_len: int = 1,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Loss-mask span computation for packed-conversation training:
    when a conversation's non-null turns are concatenated with a
    ``sep_len``-char separator, each turn occupies
    ``[span_start, span_end)`` — and only spans whose role equals
    ``mask_role`` (assistant) contribute to the loss. Emitting the
    offsets as data (rather than re-tokenizing downstream) is what lets
    the packing and masking stages stay independent.

    Returns (conv, ord, span_start, span_end, mask) — all exact int64
    (span_start = sum of earlier turns' length + sep), so the SQL
    mirror (windowed SUM ... ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)
    is hash-exact. Null-text turns are excluded entirely (SQL
    string_agg packing skips them).

    Scale: texts reduce to their length map-side; the one
    conv-bucketed shuffle carries four small columns, and offsets are
    a grouped cumsum. Turn texts never move.
    """
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b[text_col].notna()]
        out = pd.DataFrame(
            {
                conv_col: b[conv_col],
                order_col: b[order_col],
                "_len": b[text_col].str.len().astype("int64"),
                "_mask": (b[role_col] == mask_role).to_numpy(dtype=bool),
            }
        )
        out["_mb"] = _key_buckets(out[conv_col], nb)
        return out

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        step = g["_len"].to_numpy(np.int64) + sep_len
        cum = (
            pd.Series(step)
            .groupby(g[conv_col].reset_index(drop=True), sort=False)
            .cumsum()
            .to_numpy(np.int64)
        )
        start = cum - step
        return pd.DataFrame(
            {
                conv_col: g[conv_col].to_numpy(),
                order_col: g[order_col].to_numpy(),
                "span_start": start,
                "span_end": start + g["_len"].to_numpy(np.int64),
                "mask": g["_mask"].to_numpy(),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_mb")
        .map_groups(build, batch_format="pandas")
    )


def fork_margin(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    prefix_turns: int = 1,
    score_col: str | None = None,
    sep: str = "\n",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Best-vs-runner-up score margin per shared-prefix fork group —
    the label-confidence signal for RM training data mined from N-way
    regenerations: a wide margin means (chosen, rejected) pairs from
    this group are unambiguous; margin 0 (tie) or a singleton group
    (NULL margin) means the group can't supply a preference label.

    Ranking is (score DESC, conv ASC) exactly like ``fork_best_of_n``;
    null-score candidates are excluded (``_fork_scores_stage``
    semantics). Returns one row per group: (prefix, n_candidates,
    best_conv, best_score, second_score, margin) — second_score /
    margin are SQL NULL for singleton groups; all scores exact int64.

    Scale: same two bounded shuffles as the other fork ops (conv-
    bucketed candidate assembly, then one row per CANDIDATE into the
    prefix-bucketed rank)."""
    nb = num_buckets or _buckets_for_cluster()
    add_bucket, build = _fork_scores_stage(
        conv_col, order_col, text_col, score_col, prefix_turns, sep, nb
    )

    def margin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["prefix", "score", conv_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        rn = g.groupby("prefix", sort=False).cumcount().to_numpy()
        n = (
            g.groupby("prefix", sort=False)[conv_col]
            .transform("size")
            .to_numpy(np.int64)
        )
        best = g[rn == 0].assign(n_candidates=n[rn == 0])
        second = g.loc[rn == 1, ["prefix", "score"]].rename(
            columns={"score": "second_score"}
        )
        out = best.rename(
            columns={conv_col: "best_conv", "score": "best_score"}
        ).merge(second, on="prefix", how="left")
        out["best_score"] = out["best_score"].astype("int64")
        out["second_score"] = out["second_score"].astype("Int64")
        out["margin"] = out["best_score"] - out["second_score"]
        return out[
            ["prefix", "n_candidates", "best_conv", "best_score",
             "second_score", "margin"]
        ]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bb")
        .map_groups(build, batch_format="pandas")
        .groupby("_gb")
        .map_groups(margin, batch_format="pandas")
    )


def pack_conversations(
    ds: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str | None = None,
    sep: str = "\n",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Pack each conversation into ONE row: its non-null turn texts
    (optionally ``role: text`` lines when ``role_col`` is given) joined
    with ``sep`` in turn order, plus the packed turn count — the
    materialization step whose offsets ``loss_mask_spans`` computes,
    and the document-shape a conversation-level dedup/fingerprint
    consumes. SQL mirror: ``string_agg(text, sep ORDER BY ord)``
    (null turns skipped, all-null conversations absent).

    Scale: ONE conv-bucketed shuffle; the join is a C-level grouped
    aggregation. A conversation must fit one worker's heap — the same
    assumption every per-conversation operator here makes."""
    nb = num_buckets or _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        cols = [conv_col, order_col, text_col] + (
            [role_col] if role_col else []
        )
        b = b[cols].dropna(subset=[text_col]).copy()
        if role_col:
            # str.cat propagates null role/text into a null line, which
            # the dropna below removes (string_agg skip semantics)
            b[text_col] = b[role_col].str.cat(b[text_col], sep=": ")
            b = b.drop(columns=[role_col])
            b = b.dropna(subset=[text_col])  # null role -> null line
        b["_pb"] = _key_buckets(b[conv_col], nb)
        return b

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        agg = g.groupby(conv_col, sort=False).agg(
            n_turns=(text_col, "size"), text=(text_col, sep.join)
        )
        out = agg.reset_index()
        out["n_turns"] = out["n_turns"].astype("int64")
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(build, batch_format="pandas")
    )
