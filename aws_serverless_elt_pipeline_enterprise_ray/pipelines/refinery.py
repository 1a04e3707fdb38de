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
