"""Batched model-inference stages: the actor-pool plumbing for scoring
a corpus with a learned model (quality classifier, reward model,
LLM-as-judge) at lake scale.

The Ray-side shape is the whole point and is REAL and tested:

* model weights ride ``ray.put`` ONCE; each actor fetches and
  "loads" them in ``__init__`` (once per actor lifetime, never per
  batch) - the pattern that keeps a multi-GB checkpoint off the task
  path;
* inference happens per batch in ``__call__`` with a caller-tunable
  ``batch_size`` (throughput knob: big batches amortize kernel launch,
  bounded by accelerator memory) and ``num_gpus`` pass-through so the
  scheduler places actors on accelerator slots;
* the output is a narrow (id, score) table - the corpus text never
  travels further than the scoring actor.

The MODEL itself is stubbed (``StubScorer``): this sandbox ships no
torch/transformers, so the default "model" is a deterministic
integer-exact fake (multiplicative id hash + text length, modulo 1000)
that the DuckDB oracle can verify bit-for-bit - proving batching,
broadcast, actor lifecycle and output layout without pretending to
ship weights. Swap ``scorer_cls`` for a real one (same interface) in
an environment with the libraries; everything else stays.

Reference parity: the reference has no model stage (its DQ is
Great-Expectations rules, ``ge_validate_silver.py:21-56``); this is
the beyond-reference training-data operator the brief's multimodal
section prescribes, applied to text scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .mixing import knuth_hash32


class StubScorer:
    """Deterministic fake model with the real interface: ``__init__``
    receives the broadcast weights handle and "loads" once;
    ``score(ids, texts) -> int64 scores``."""

    def __init__(self, weights_ref):
        # a real scorer does: self.model = load_checkpoint(ray.get(ref))
        self.weights = ray.get(weights_ref) if weights_ref is not None else b""

    def score(self, ids: np.ndarray, texts: pd.Series) -> np.ndarray:
        h = knuth_hash32(ids.astype(np.int64).astype(np.uint64))
        n_chars = texts.fillna("").str.len().to_numpy(np.uint64)
        return ((h + n_chars) % np.uint64(1000)).astype(np.int64)


def score_with_model(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scorer_cls=StubScorer,
    weights: bytes | None = None,
    out_col: str = "model_score",
    batch_size: int = 256,
    concurrency: tuple[int, int] | int = (1, 8),
    num_gpus: float = 0,
) -> rd.Dataset:
    """Score every row with a (stubbed) model through the actor-pool
    inference shape. Returns (id_col, out_col) rows."""
    weights_ref = ray.put(weights) if weights is not None else None

    class Infer:
        def __init__(self):
            self.scorer = scorer_cls(weights_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids = b[id_col].to_numpy()
            return pd.DataFrame(
                {
                    id_col: ids,
                    out_col: self.scorer.score(ids, b[text_col]),
                }
            )

    kwargs = dict(
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(Infer, **kwargs)
