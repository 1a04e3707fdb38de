"""Unit tests for the training-data function library: dedup family,
similarity search, text analysis, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.dedup import (
    MinHasher,
    SimHasher,
    embedding_near_dups,
    exact_dedup,
    hamming64,
    jaccard,
    minhash_dedup_pairs,
    simhash_near_dups,
)
from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
    DecodeStub,
    FrameSampler,
    attach_binary_payload,
)
from aws_serverless_elt_pipeline_enterprise_ray.functions.similarity import (
    cosine_topk,
    ivf_topk,
)
from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
    Fingerprinter,
    LangId,
    QualityScorer,
    TokenCounter,
)


def docs_ds():
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": f"{base} variant {i} " + "filler word " * (i % 5)})
    # exact duplicates of doc 0 and 1
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "text": rows[1]["text"]})
    # near duplicate of doc 2 (one word changed)
    rows.append({"doc_id": 102, "text": rows[2]["text"].replace("fox", "cat")})
    return rd.from_items(rows)


def test_exact_dedup_keeps_min_id():
    out = exact_dedup(docs_ds()).to_pandas().sort_values("doc_id")
    assert 100 not in out.doc_id.values
    assert 101 not in out.doc_id.values
    assert 102 in out.doc_id.values  # near-dup is NOT exact
    assert 0 in out.doc_id.values and 1 in out.doc_id.values


def test_jaccard_and_hamming_basics():
    assert jaccard("a b c d e", "a b c d e") == 1.0
    assert jaccard("a b c d e", "x y z w v") == 0.0
    assert hamming64(0b1010, 0b1000) == 1
    assert hamming64(0, 0xFFFFFFFFFFFFFFFF) == 64


def test_minhash_signature_deterministic():
    m1, m2 = MinHasher(seed=5), MinHasher(seed=5)
    s1, s2 = m1.signature("hello world this is a test"), m2.signature("hello world this is a test")
    assert (s1 == s2).all()


def test_minhash_finds_near_dups():
    pairs = minhash_dedup_pairs(docs_ds(), threshold=0.6)
    found = {(a, b) for a, b, _ in pairs}
    assert (0, 100) in found
    assert (1, 101) in found
    assert (2, 102) in found  # high-jaccard near-dup caught


def test_simhash_near_dups():
    pairs = simhash_near_dups(docs_ds(), max_hamming=6)
    found = {(a, b) for a, b, _ in pairs}
    assert (0, 100) in found  # identical -> hamming 0
    assert all(h <= 6 for _, _, h in pairs)


def test_embedding_near_dups_and_ann():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    vecs[50] = vecs[0] + 1e-4  # near-identical pair
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i]} for i in range(60)]
    )
    pairs = embedding_near_dups(ds, threshold=0.999)
    assert any({a, b} == {0, 50} for a, b, _ in pairs)

    top = cosine_topk(ds, [0], k=3)
    assert list(top.columns) == ["query_id", "rank", "neighbor_id", "cosine"]
    assert top.iloc[0]["neighbor_id"] == 50  # nearest is the near-dup
    # IVF with full probing must equal brute force
    ivf = ivf_topk(ds, [0], k=3, nlist=4, nprobe=4)
    assert ivf.iloc[0]["neighbor_id"] == 50


def test_text_stages():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["The cat and the dog!", "el gato y el perro en la casa"]})
    out = TokenCounter()(df.copy())
    assert out["n_tokens"].tolist() == [5, 8]
    q = QualityScorer()(df.copy())
    assert q["n_chars"].tolist() == [20, 29]
    lang = LangId()(df.copy())
    assert lang["lang_pred"].tolist() == ["en", "es"]
    fp = Fingerprinter()(df.copy())
    assert fp["md5"].str.len().eq(32).all()
    # rolling fingerprint is order-sensitive but shift-invariant input
    fp2 = Fingerprinter()(pd.DataFrame({"doc_id": [1], "text": ["The cat and the dog!"]}))
    assert fp2["rolling_fp"].iloc[0] == fp["rolling_fp"].iloc[0]


def test_multimodal_payload_and_decode():
    t = pa.table({"doc_id": [1, 2], "text": ["abc", "defghij"]})
    media = attach_binary_payload(t)
    assert media["n_bytes"].to_pylist() == [3, 7]
    assert media["payload"].type == pa.binary()

    with pytest.raises(NotImplementedError):
        DecodeStub(fake=False)(media)

    decoded = DecodeStub(fake=True)(media)
    assert "payload" not in decoded.column_names
    assert decoded["width"].to_pylist()[0] >= 64
    # deterministic: same input -> same metadata
    again = DecodeStub(fake=True)(attach_binary_payload(t))
    assert decoded.equals(again)

    frames = FrameSampler(every_nth=2)(decoded)
    assert frames.column_names == ["media_id", "frame_idx"]
    assert len(frames) >= len(decoded)


def test_asof_join():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import asof_join

    left = rd.from_items(
        [
            {"k": "a", "t": 10, "q": 1},
            {"k": "a", "t": 20, "q": 2},
            {"k": "b", "t": 5, "q": 3},
            {"k": "c", "t": 9, "q": 4},  # key with no right rows
        ]
    )
    right = rd.from_items(
        [
            {"k": "a", "t": 8, "v": 100},
            {"k": "a", "t": 15, "v": 200},
            {"k": "a", "t": 25, "v": 300},
            {"k": "b", "t": 5, "v": 400},  # exact-ts match allowed
        ]
    )
    out = asof_join(left, right, by="k", on="t").to_pandas()
    out = out.sort_values("q").reset_index(drop=True)
    got = {int(r.q): (None if pd.isna(r.v) else int(r.v)) for r in out.itertuples()}
    assert got == {1: 100, 2: 200, 3: 400, 4: None}
