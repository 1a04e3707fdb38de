"""Corpus refinery: the composed training-data preparation pipeline.

One call chains the function library into the canonical pretraining
data flow — whitespace cleanup, quality + repetition filtering, exact
(or near) dedup, and optional best-first selection under a global
token budget:

    clean -> score -> filter -> dedup -> budget-select

Every stage is the library's own streaming operator (map_batches /
bucketed shuffle / prefix-sum), so the composition inherits their
scale shapes: the corpus streams, the only all-to-alls are the dedup
bucket shuffle and the budget sort, and the driver touches per-block
stats only. With ``near_dup=True`` the exact-dedup stage is followed
by MinHash near-dedup (``functions.dedup.near_dedup``), which is not
SQL-expressible — the default composition is fully oracle-verifiable
(see the ``corpus_refinery`` query).

Reference parity: the engine's analogue of the reference's
transform-validate-load flow (`lambdas/transform/app.py` normalization
followed by the GE quality gate `glue_ge_validation/scripts/
ge_validate_silver.py`), generalized to corpus hygiene and expressed
as one Ray Data pipeline.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from ..functions.dedup import exact_dedup
from ..functions.mixing import select_by_token_budget
from ..functions.text import QualityScorer, RepetitionScorer, TextCleaner


def refine_corpus(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int | None = None,
    near_dup: bool = False,
) -> rd.Dataset:
    """Returns the refined corpus as ``(id_col, text_clean, n_tokens,
    alpha_chars)`` — cleaned, quality- and repetition-filtered,
    deduplicated, and (optionally) budget-selected best-docs-first by
    ``alpha_chars``."""
    ds = ds.map_batches(
        TextCleaner(text_col), batch_format="pandas"
    )
    ds = ds.map_batches(
        QualityScorer("text_clean"), batch_format="pandas"
    )
    ds = ds.map_batches(
        RepetitionScorer("text_clean"), batch_format="pandas"
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        m = b["ok"] & ~b["repetitive"]
        return b.loc[m, [id_col, "text_clean", "n_tokens", "alpha_chars"]]

    ds = ds.map_batches(keep, batch_format="pandas")
    ds = exact_dedup(ds, text_col="text_clean", id_col=id_col)
    if near_dup:
        from ..functions.dedup import near_dedup as _nd

        ds = _nd(ds, text_col="text_clean", id_col=id_col)
    if token_budget is not None:
        ds = select_by_token_budget(
            ds, token_budget,
            score_col="alpha_chars", token_col="n_tokens", id_col=id_col,
        )
    return ds


def transcript_refinery(
    turns: rd.Dataset,
    *,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    key_col: str | None = None,
    fractions: dict[str, float] | None = None,
    collapse_sep: str = " ",
    line_sep: str = "\n",
) -> rd.Dataset:
    """Transcript-native refinery: the committed CDC table -> training
    shards, composed from the transcript operator library:

        collapse consecutive same-role turns
        -> pack each conversation into role-prefixed lines
        -> deterministic train/val/test assignment per conversation

    Returns one row per conversation: (conv, n_turns, packed_chars,
    text, split). ``key_col`` names an int64 column to hash for the
    split (default: digits parsed from ``conv_col``). Every stage is
    the library's own bounded-shuffle operator, so the composition is
    fully SQL-mirrorable (see the ``cdc_transcript_refinery`` query) —
    the CDC analogue of ``refine_corpus``'s document flow.

    Reference parity: the silver -> consumer hand-off
    (lambdas/transform/app.py:93-116 + Athena consumption,
    Instructions.md:122-131), extended to the training-data packaging
    the reference leaves downstream.
    """
    from ..functions.transcripts import (
        assign_split,
        collapse_consecutive_turns,
        pack_conversations,
    )

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    collapsed = collapse_consecutive_turns(
        turns, conv_col=conv_col, order_col=order_col,
        role_col=role_col, text_col=text_col, sep=collapse_sep,
    )
    packed = pack_conversations(
        collapsed, conv_col=conv_col, order_col="turn_seq",
        text_col=text_col, role_col=role_col, sep=line_sep,
    )

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if key_col is None:
            b["_skey"] = (
                b[conv_col].astype(str).str.extract(r"(\d+)", expand=False)
                .astype("int64")
            )
        else:
            b["_skey"] = b[key_col].astype("int64")
        b["packed_chars"] = b["text"].str.len().astype("int64")
        return b

    out = assign_split(
        packed.map_batches(add_key, batch_format="pandas"),
        key_col="_skey", fractions=fractions,
    )
    return out.drop_columns(["_skey"])
