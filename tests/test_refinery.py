"""Composed corpus-refinery pipeline (pipelines/refinery.py)."""
def test_refine_corpus(tmp_path):
    """Composed refinery: cleaning, quality + repetition filtering,
    dedup, and budget selection behave as the stages promise; the
    near_dup=True variant also drops near copies."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.pipelines.refinery import (
        refine_corpus,
    )

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(3000)]
    texts = [" ".join(rng.choice(vocab, 30, replace=False)) for _ in range(20)]
    rows = [{"doc_id": i, "text": "  " + t.replace(" ", "   ", 3)} for i, t in enumerate(texts)]
    rows += [
        {"doc_id": 50, "text": texts[0]},                      # exact dup after clean
        {"doc_id": 51, "text": "spam ham " * 30},              # repetitive
        {"doc_id": 52, "text": "too short"},                   # fails quality (<5 tokens)
        {"doc_id": 53, "text": " ".join(texts[1].split()[2:])},# near dup of 1
    ]
    ds = rd.from_items(rows)

    out = refine_corpus(ds).to_pandas()
    kept = set(out["doc_id"])
    assert 50 not in kept and 51 not in kept and 52 not in kept
    assert set(range(20)).issubset(kept) and 53 in kept  # near-dup kept w/o near_dup
    assert not out["text_clean"].str.contains("  ").any()  # whitespace collapsed

    out2 = refine_corpus(ds, near_dup=True, token_budget=2_000).to_pandas()
    kept2 = set(out2["doc_id"])
    assert 53 not in kept2                  # near-dup dropped
    assert out2["n_tokens"].sum() <= 2_000  # budget respected
