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


def test_repetition_scorer():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        RepetitionScorer,
    )

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "spam ham " * 10,                        # one dominant bigram
                "line\nline\nline\nother",                # 2/4 duplicate lines
                "a perfectly normal sentence with many distinct words here",
                "",                                       # degenerate
            ],
        }
    )
    out = RepetitionScorer()(df.copy())
    assert out["repetitive"].tolist() == [True, True, False, False]
    # doc 1: 20 tokens -> 19 bigrams, "spam ham" appears 10x
    assert out.loc[0, "n_bigrams"] == 19 and out.loc[0, "top_bigram_n"] == 10
    # doc 2: 4 lines, 2 duplicates
    assert out.loc[1, "n_lines"] == 4 and out.loc[1, "n_dup_lines"] == 2
    # empty text: 1 empty segment, nothing repetitive
    assert out.loc[3, "n_lines"] == 1 and out.loc[3, "n_bigrams"] == 0


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


# ---------------------------------------------------------------------------
# round-2: distributed pair generation / verification
# ---------------------------------------------------------------------------


def test_minhash_distributed_verify_parity_with_inmemory():
    """The distributed verifier must agree pair-for-pair with the
    in-memory reference verifier on the fixture corpus."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.dedup import (
        minhash_lsh_candidates,
        verify_pairs_distributed,
        verify_pairs_jaccard,
    )

    ds = docs_ds()
    cands = minhash_lsh_candidates(ds)
    assert cands, "fixture corpus must produce candidates"
    texts = {r["doc_id"]: r["text"] for r in ds.take_all()}
    expect = sorted(verify_pairs_jaccard(cands, texts, threshold=0.6))
    got = verify_pairs_distributed(ds, cands, threshold=0.6)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in expect]
    for (_, _, j1), (_, _, j2) in zip(got, expect):
        assert abs(j1 - j2) < 1e-12


def test_simhash_multi_table_catches_prefix_blind_pair():
    """A pair whose only differing bits fall inside the single-table
    prefix window is invisible to that table; the rotated tables must
    still bucket it together. Tested deterministically at the hash
    level via a fixed-simhash subclass, end-to-end through the
    distributed pipeline."""
    import pandas as pd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.dedup import (
        SimHasher,
        _hot_buckets,
        hamming64,
    )

    a = np.uint64(0x0123456789ABCDEF)
    b = np.uint64(a ^ np.uint64(0x3) << np.uint64(60))  # top-16-bit window only
    assert hamming64(int(a), int(b)) == 2

    class Fixed(SimHasher):
        def _simhashes(self, texts):
            return np.array([a, b], dtype=np.uint64)[: len(texts)]

    out = Fixed(n_tables=4, prefix_bits=16)(
        pd.DataFrame({"doc_id": [0, 1], "text": ["x", "y"]})
    )
    t0 = out[out["table_id"] == 0]
    # table 0 (unrotated prefix) is blind to this pair...
    assert t0[t0["doc_id"] == 0]["prefix"].iloc[0] != t0[t0["doc_id"] == 1]["prefix"].iloc[0]
    # ...but at least one rotated table buckets them together
    collide = [
        t
        for t in range(1, 4)
        for g in [out[out["table_id"] == t]]
        if g[g["doc_id"] == 0]["prefix"].iloc[0] == g[g["doc_id"] == 1]["prefix"].iloc[0]
    ]
    assert collide, "no rotated table caught the prefix-blind pair"
    # and the distributed collision-count machinery sees that bucket
    sig = rd.from_items(out.to_dict("records"))
    hot = _hot_buckets(sig, ["table_id", "prefix"])
    assert len(hot) >= 1


def test_simhash_bucket_cap_limits_degenerate_buckets():
    """10k identical docs collide into one bucket; the cap keeps pair
    emission bounded instead of emitting ~5x10^7 pairs."""
    ds = rd.from_items([{"doc_id": i, "text": "same text here"} for i in range(10_000)])
    pairs = simhash_near_dups(ds, max_hamming=0, max_bucket=100)
    assert 0 < len(pairs) <= 100 * 99 // 2


def test_embedding_near_dups_scales_past_1e5_vectors(tmp_path):
    """Banded-table near-dup over 10^5 vectors must finish without the
    O((n/const)^2) all-pairs blowup of a fixed-bucket-count scheme and
    still find the planted near-identical pairs. Corpus comes from
    parquet (the realistic input) so read parallelism is natural."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(17)
    n, dim = 100_000, 16
    V = rng.standard_normal((n, dim)).astype(np.float32)
    planted = [(i, n + i) for i in range(20)]
    extra = V[:20] + rng.normal(0, 1e-4, (20, dim)).astype(np.float32)
    ids = np.array(list(range(n)) + [n + i for i in range(20)], dtype=np.int64)
    allv = np.concatenate([V, extra])
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(allv.reshape(-1)), dim
            ),
        }
    )
    path = str(tmp_path / "vecs.parquet")
    pq.write_table(tbl, path)
    ds = rd.read_parquet(path).repartition(16)
    t0 = time.monotonic()
    pairs = embedding_near_dups(ds, threshold=0.999, target_bucket_rows=16)
    dt = time.monotonic() - t0
    found = {(a, b) for a, b, _ in pairs}
    hit = sum(1 for p in planted if p in found)
    assert hit >= 16, f"only {hit}/20 planted pairs found"
    assert dt < 120, f"took {dt:.1f}s - all-pairs blowup?"


def test_hash_join_inner_and_left():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import hash_join

    left = pd.DataFrame(
        {"k": [1, 2, 2, 3, 4], "lv": ["a", "b", "c", "d", "e"]}
    )
    right = pd.DataFrame({"k": [2, 3, 3, 5], "rv": [20, 30, 31, 50]})
    lds = rd.from_pandas(left).repartition(3)
    rds = rd.from_pandas(right).repartition(2)

    inner = (
        hash_join(lds, rds, on="k", how="inner", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = left.merge(right, on="k").sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(inner[["k", "lv", "rv"]], want)

    lj = (
        hash_join(lds, rds, on="k", how="left", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    wantl = left.merge(right, on="k", how="left").sort_values(
        ["k", "lv", "rv"]
    ).reset_index(drop=True)
    assert len(lj) == len(wantl)
    assert lj["rv"].isna().sum() == 2  # k=1 and k=4 unmatched


def test_hash_join_matches_duckdb_on_star_schema():
    import duckdb

    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import hash_join

    sf = "/root/testdata/sf0.001"
    orders = rd.read_parquet(f"{sf}/orders.parquet", columns=["o_custkey", "o_orderkey"])
    cust = rd.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: pa.table(
            {"o_custkey": b["c_custkey"], "c_mktsegment": b["c_mktsegment"]}
        ),
        batch_format="pyarrow",
    )
    got = (
        hash_join(orders, cust, on="o_custkey", how="inner")
        .to_pandas()
        .sort_values(["o_orderkey"])
        .reset_index(drop=True)
    )
    got["o_custkey"] = got["o_custkey"].astype("int64")
    got["o_orderkey"] = got["o_orderkey"].astype("int64")
    want = duckdb.sql(
        f"""
        SELECT o.o_custkey, o.o_orderkey, c.c_mktsegment
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_orderkey
        """
    ).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_pii_redactor_and_cleaner():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        PIIRedactor,
        TextCleaner,
    )

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail me at jo.doe+x@corp.example.org or 555-123-4567",
                "server at 192.168.0.1 ok; not-an-ip 1234.5.6.7",
                "  lots\t of \n whitespace  here  ",
            ],
        }
    )
    red = PIIRedactor()(df.copy())
    assert red.loc[0, "text_redacted"] == "mail me at <EMAIL> or <PHONE>"
    assert red.loc[0, "pii_hits"] == 2
    # \b guards: 1234.5.6.7 must NOT redact (leading digit run too long
    # is still 3 digits max per octet... the \b only blocks mid-number
    # starts; 234.5.6.7 inside 1234... has no boundary)
    assert "<IP>" in red.loc[1, "text_redacted"]
    assert "1234.5.6.7" in red.loc[1, "text_redacted"]
    cl = TextCleaner()(df.copy())
    assert cl.loc[2, "text_clean"] == "lots of whitespace here"


def test_url_canonicalize_and_domain_filter():
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        UrlCanonicalizer,
        filter_blocked_domains,
    )

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "url": [
                "HTTPS://WWW.Example.COM/Page/One/?utm_source=x#frag",
                "https://www.example.com/Page/One",  # same after canon
                "http://ads.tracker.net:8080/x?q=1",
                "ftp://files.example.org/a/b/",
                "nonsense-no-scheme",
            ],
        }
    )
    out = UrlCanonicalizer()(df.copy())
    assert out.loc[0, "canon_url"] == "https://www.example.com/Page/One"
    assert out.loc[0, "canon_url"] == out.loc[1, "canon_url"]
    assert out.loc[0, "host"] == "www.example.com"
    assert out.loc[0, "domain"] == "example.com"
    assert out.loc[2, "host"] == "ads.tracker.net"  # port stripped
    assert out.loc[2, "domain"] == "tracker.net"
    assert out.loc[3, "canon_url"] == "ftp://files.example.org/a/b"
    # no scheme -> empty host, domain degrades to host
    assert out.loc[4, "host"] == "" and out.loc[4, "domain"] == ""

    kept = (
        filter_blocked_domains(
            rd.from_pandas(out), ["tracker.net"], concurrency=(1, 2)
        )
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert sorted(kept) == [1, 2, 4, 5]


def test_contamination_check_planted():
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.contamination import (
        benchmark_shingle_set,
        contamination_check,
        word_shingles,
    )

    bench = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "tiny doc",
                ],
            }
        )
    )
    corpus = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12],
                "text": [
                    # copies a bench sentence fragment: shares shingles
                    "someone said the quick brown fox jumps today",
                    # disjoint vocabulary: zero shared shingles
                    "completely unrelated words appear in this sentence",
                    # short doc (<3 words) identical to short bench doc
                    "tiny doc",
                ],
            }
        )
    )
    got = (
        contamination_check(corpus, bench, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # "the quick brown" / "quick brown fox" / "brown fox jumps" overlap
    assert got.loc[0, "n_bench_shingles"] == 3
    assert got.loc[1, "n_bench_shingles"] == 0
    assert got.loc[2, "n_bench_shingles"] == 1  # whole-text shingle
    # set construction dedups across bench docs
    s = benchmark_shingle_set(bench)
    assert "tiny doc" in s and "the quick brown" in s
    assert word_shingles("a b", 3) == {"a b"}


def test_dedup_clusters_matches_union_find():
    """Distributed min-label propagation equals a reference union-find
    on a randomized graph plus a long chain (multi-round convergence)."""
    import numpy as np

    from aws_serverless_elt_pipeline_enterprise_ray.functions.dedup import (
        dedup_clusters,
    )

    rng = np.random.default_rng(42)
    a = rng.integers(0, 200, 150)
    b = rng.integers(0, 200, 150)
    edges = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    edges += [(1000 + i, 1001 + i) for i in range(12)]  # chain, diameter 12

    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    for x, y in edges:
        union(x, y)
    want = {x: find(x) for x in parent}

    pairs = rd.from_pandas(
        pd.DataFrame({"id_a": [e[0] for e in edges], "id_b": [e[1] for e in edges]})
    )
    out = dedup_clusters(pairs).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == want


def test_near_dedup_end_to_end():
    """near_dedup keeps one canonical doc (min id) per near-dup cluster
    and streams the rest of the corpus through untouched."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.dedup import (
        near_dedup,
    )

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(2000)]
    texts = [
        " ".join(rng.choice(vocab, 20, replace=False)) for _ in range(30)
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    rows.append({"doc_id": 100, "text": texts[0]})            # exact copy
    rows.append({"doc_id": 101, "text": texts[1]})            # exact copy
    near = texts[2].split()
    near[10] = "changed"
    rows.append({"doc_id": 102, "text": " ".join(near)})      # near copy
    ds = rd.from_items(rows)

    out = near_dedup(ds, threshold=0.6).to_pandas()
    kept = set(out["doc_id"].tolist())
    assert {100, 101, 102}.isdisjoint(kept)  # copies/near-copy dropped
    assert kept == set(range(30))            # every distinct doc survives


def test_paragraph_dedup():
    """Global first-occurrence paragraph dedup: cross-doc and intra-doc
    repeats dropped, fully-duplicated and empty docs survive with
    empty text, segment order preserved."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.dedup import (
        paragraph_dedup,
    )

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "alpha\nboiler\nbeta"},
            {"doc_id": 2, "text": "boiler\ngamma\nboiler"},
            {"doc_id": 3, "text": "alpha\nbeta"},
            {"doc_id": 4, "text": ""},
            {"doc_id": 5, "text": "delta"},
        ]
    )
    out = paragraph_dedup(docs).to_pandas()
    got = dict(zip(out["doc_id"], out["text_dedup"]))
    assert got == {
        1: "alpha\nboiler\nbeta",
        2: "gamma",
        3: "",
        4: "",
        5: "delta",
    }


def test_select_by_token_budget():
    """Distributed prefix-sum selection equals the single-stream greedy
    (pandas cumsum) on a randomized corpus across many blocks."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.mixing import (
        select_by_token_budget,
    )

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "doc_id": range(500),
            "score": rng.integers(0, 40, 500),
            "n_tokens": rng.integers(5, 80, 500),
        }
    )
    ds = rd.from_pandas(df).repartition(9)
    out = select_by_token_budget(
        ds, 3_000, score_col="score", token_col="n_tokens"
    ).to_pandas()
    ref = df.sort_values(["score", "doc_id"], ascending=[False, True])
    ref = ref[ref["n_tokens"].cumsum() <= 3_000]
    assert set(out["doc_id"]) == set(ref["doc_id"])
    assert out["n_tokens"].sum() <= 3_000


def test_kmeans_embeddings_matches_reference():
    """Distributed spherical k-means equals the single-process Lloyd's
    reference exactly (same deterministic init, tie-breaks, fixpoint)."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.similarity import (
        kmeans_embeddings,
    )

    rng = np.random.default_rng(9)
    # 3 well-separated blobs so clustering is meaningful
    centers = rng.standard_normal((3, 8)) * 5
    V = np.vstack(
        [centers[i % 3] + 0.3 * rng.standard_normal(8) for i in range(120)]
    ).astype(np.float64)
    ids = np.arange(120)
    ds = rd.from_items(
        [{"vec_id": int(i), "embedding": V[i]} for i in ids]
    ).repartition(5)

    got = (
        kmeans_embeddings(ds, k=3, iters=10).to_pandas()
        .sort_values("vec_id").reset_index(drop=True)
    )

    def norm(M):
        return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)

    C = V[:3].copy()
    for _ in range(10):
        Cn, Vn = norm(C), norm(V)
        a = np.argmax(Cn @ Vn.T, axis=0)
        C_new = C.copy()
        for c in range(3):
            if (a == c).any():
                C_new[c] = Vn[a == c].sum(axis=0) / (a == c).sum()
        C_new = norm(C_new)
        if np.array_equal(norm(C_new), norm(C)):
            break
        C = C_new
    want = np.argmax(norm(C) @ norm(V).T, axis=0)

    assert got["cluster"].to_numpy().tolist() == want.tolist()
    # blobs recovered: each true blob maps to one cluster
    for blob in range(3):
        assert len(set(got["cluster"][ids % 3 == blob])) == 1


def test_semantic_dedup():
    """SemDeDup composition: cluster-scoped cosine pairs + CC survivor
    selection drop exact-direction duplicates, keep everything else."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(4)
    V = rng.standard_normal((150, 12)).astype(np.float64)
    V[140] = V[3] + 1e-4   # near-identical to 3
    V[141] = V[7] * 2.0    # same direction as 7 (cosine 1)
    ds = rd.from_items([{"vec_id": i, "embedding": V[i]} for i in range(150)])
    out = semantic_dedup(ds, threshold=0.999, k=6).to_pandas()
    kept = set(out["vec_id"])
    assert 140 not in kept and 141 not in kept
    assert 3 in kept and 7 in kept and len(kept) == 148


def test_hash_join_semi_anti():
    """semi keeps matched left rows (no duplication from multi-match),
    anti keeps unmatched; both preserve left columns and dtypes."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import hash_join

    left = rd.from_items(
        [{"k": 1, "v": 10}, {"k": 2, "v": 20}, {"k": 3, "v": 30}]
    )
    right = rd.from_items(
        [{"k": 1, "w": 5}, {"k": 1, "w": 6}, {"k": 3, "w": 7}]
    )
    semi = hash_join(left, right, on="k", how="semi").to_pandas()
    assert sorted(semi["k"]) == [1, 3]            # 1 appears ONCE
    assert list(semi.columns) == ["k", "v"]
    anti = hash_join(left, right, on="k", how="anti").to_pandas()
    assert sorted(anti["k"]) == [2]
    assert anti["v"].dtype == "int64"


def test_paragraph_dedup_random_parity():
    """Randomized corpus with heavy segment reuse: distributed result
    equals a single-stream reference (global first occurrence by
    (doc_id, pos), rebuild in order)."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.dedup import (
        paragraph_dedup,
    )

    rng = np.random.default_rng(31)
    segs = [f"segment {i}" for i in range(40)]  # small vocab -> many repeats
    docs = {
        i: "\n".join(rng.choice(segs, rng.integers(1, 8)))
        for i in range(60)
    }

    seen, want = set(), {}
    for i in sorted(docs):
        kept = []
        for p in docs[i].split("\n"):
            if p not in seen:
                seen.add(p)
                kept.append(p)
        want[i] = "\n".join(kept)

    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in docs.items()])
    out = paragraph_dedup(ds).to_pandas()
    got = dict(zip(out["doc_id"], out["text_dedup"]))
    assert got == want


def test_trailing_window_range_semantics():
    """Trailing window equals pandas per-row recompute, including
    RANGE peer semantics (equal timestamps count each other)."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        trailing_window,
    )

    rng = np.random.default_rng(13)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": rng.integers(0, 12, n),
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 7200, n), unit="s"),
            "v": rng.integers(0, 50, n).astype("int64"),
        }
    )
    # force equal-ts peers within a key
    df.loc[5, ["user_id", "ts"]] = df.loc[4, ["user_id", "ts"]]

    out = (
        trailing_window(
            rd.from_pandas(df).repartition(4),
            key="user_id", window=pd.Timedelta(minutes=20), value_col="v",
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )

    W = pd.Timedelta(minutes=20)
    for _, r in df.iterrows():
        m = (
            (df["user_id"] == r["user_id"])
            & (df["ts"] >= r["ts"] - W)
            & (df["ts"] <= r["ts"])
        )
        o = out[out["event_id"] == r["event_id"]].iloc[0]
        assert o["trailing_n"] == m.sum()
        assert o["trailing_sum"] == df.loc[m, "v"].sum()


def test_document_chunker():
    """Chunk windows: full coverage, overlap correct, short/empty docs
    emit exactly one chunk, no chunk starts past the end."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        DocumentChunker,
    )

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [" ".join(f"t{i}" for i in range(10)), "one two", ""],
        }
    )
    out = DocumentChunker(size=4, overlap=2)(df)
    d1 = out[out["doc_id"] == 1]
    assert d1["chunk_text"].tolist() == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9",
    ]
    assert out[out["doc_id"] == 2]["chunk_text"].tolist() == ["one two"]
    d3 = out[out["doc_id"] == 3]
    assert d3["chunk_text"].tolist() == [""] and d3["n_tokens"].tolist() == [0]


def test_interval_join_overlapping_matches_bruteforce():
    """General (overlapping-intervals) path: inner emits one row per
    (point, containing interval); left keeps unmatched points with
    null interval columns and nullable dtypes."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import (
        interval_join,
    )

    rng = np.random.default_rng(7)
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 80),
            "t": rng.integers(0, 100, 80),
            "pid": np.arange(80),
        }
    )
    iv = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 30),
            "lo": rng.integers(0, 90, 30),
            "iid": np.arange(30),
        }
    )
    iv["hi"] = iv["lo"] + rng.integers(0, 40, 30)  # overlapping on purpose

    want = pts.merge(iv, on="k")
    want = want[(want["lo"] <= want["t"]) & (want["t"] <= want["hi"])]
    want_pairs = set(zip(want["pid"], want["iid"]))

    out = interval_join(
        rd.from_pandas(pts),
        rd.from_pandas(iv),
        by="k",
        on="t",
        start="lo",
        end="hi",
    ).to_pandas()
    assert set(zip(out["pid"], out["iid"])) == want_pairs
    assert out["iid"].dtype == "int64"

    left = interval_join(
        rd.from_pandas(pts),
        rd.from_pandas(iv),
        by="k",
        on="t",
        start="lo",
        end="hi",
        how="left",
    ).to_pandas()
    matched_pids = {p for p, _ in want_pairs}
    unmatched = left[left["iid"].isna()]
    assert set(unmatched["pid"]) == set(pts["pid"]) - matched_pids
    assert str(left["iid"].dtype) == "Int64"  # nullable, bucket-independent
    assert set(zip(left.dropna(subset=["iid"])["pid"],
                   left.dropna(subset=["iid"])["iid"])) == want_pairs


def test_interval_join_disjoint_path_matches_general():
    """disjoint=True (merge_asof + end mask) agrees with the general
    path when intervals really are disjoint per key."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import (
        interval_join,
    )

    rng = np.random.default_rng(11)
    rows = []
    iid = 0
    for k in range(4):
        lo = 0
        for _ in range(6):  # disjoint, gaps between intervals
            lo += rng.integers(5, 15)
            hi = lo + rng.integers(0, 8)
            rows.append({"k": k, "lo": int(lo), "hi": int(hi), "iid": iid})
            lo = hi + 1
            iid += 1
    iv = pd.DataFrame(rows)
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 120),
            "t": rng.integers(0, 120, 120),
            "pid": np.arange(120),
        }
    )
    kwargs = dict(by="k", on="t", start="lo", end="hi")
    for how in ("inner", "left"):
        a = interval_join(
            rd.from_pandas(pts), rd.from_pandas(iv), how=how, **kwargs
        ).to_pandas()
        b = interval_join(
            rd.from_pandas(pts), rd.from_pandas(iv), how=how, disjoint=True,
            **kwargs
        ).to_pandas()
        key = lambda df: sorted(
            (int(p), -1 if pd.isna(i) else int(i))
            for p, i in zip(df["pid"], df["iid"])
        )
        assert key(a) == key(b)


def test_lm_score_exact_math_and_model_cap():
    """Bigram-LM score matches a hand reference; capping the model to
    top-1 bigram zeroes out-of-model bigrams but keeps prefix counts
    (conditional probabilities stay corpus-true)."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        bigram_model,
        lm_score,
    )

    docs = [
        {"doc_id": 0, "text": "a b a b a b"},   # bigrams: ab x3, ba x2
        {"doc_id": 1, "text": "a b c"},          # ab, bc
        {"doc_id": 2, "text": "z"},              # no bigram
        {"doc_id": 3, "text": None},
    ]
    ds = rd.from_items(docs)
    # corpus: C(a b)=4, C(b a)=2, C(b c)=1; prefixes: a->4, b->3
    m = bigram_model(ds, top_bigrams=10)
    got = dict(zip(m[0]["key"], m[0]["n"]))
    assert got == {"a b": 4, "b a": 2, "b c": 1}
    assert dict(zip(m[1]["key"], m[1]["n"])) == {"a": 4, "b": 3}

    out = lm_score(ds, m).to_pandas().set_index("doc_id")
    ab = 1_000_000 * 4 // 4   # 1000000
    ba = 1_000_000 * 2 // 3   # 666666
    assert out.loc[0, "n_bigrams"] == 5
    assert out.loc[0, "score_ppm"] == (3 * ab + 2 * ba) // 5
    bc = 1_000_000 * 1 // 3
    assert out.loc[1, "score_ppm"] == (ab + bc) // 2
    assert out.loc[2, "score_ppm"] == 0 and out.loc[2, "n_bigrams"] == 0
    assert out.loc[3, "score_ppm"] == 0

    # cap the model to the single top bigram: "a b" survives (count 4),
    # others score 0; prefixes still full
    m1 = bigram_model(ds, top_bigrams=1)
    assert list(m1[0]["key"]) == ["a b"]
    out1 = lm_score(ds, m1).to_pandas().set_index("doc_id")
    assert out1.loc[0, "score_ppm"] == (3 * ab) // 5
    assert out1.loc[1, "score_ppm"] == ab // 2


def test_hash_join_right_and_outer():
    """right and full-outer modes equal pandas merges, with nullable
    extension dtypes exactly on the sides that can carry join nulls."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import hash_join

    left = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    right = pd.DataFrame({"k": [2, 3, 3, 4], "w": [5, 6, 7, 8]})

    def norm(df):
        return sorted(
            (int(r.k),
             None if pd.isna(r.v) else int(r.v),
             None if pd.isna(r.w) else int(r.w))
            for r in df.itertuples()
        )

    got_r = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how="right"
    ).to_pandas()
    want_r = left.merge(right, on="k", how="right")
    assert norm(got_r) == norm(want_r)
    assert str(got_r["v"].dtype) == "Int64"   # left payload nullable
    assert got_r["w"].dtype == "int64"        # right payload exact

    got_o = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how="outer"
    ).to_pandas()
    want_o = left.merge(right, on="k", how="outer")
    assert norm(got_o) == norm(want_o)
    assert str(got_o["v"].dtype) == "Int64" and str(got_o["w"].dtype) == "Int64"


def test_skew_join_equals_hash_join():
    """Hot/cold routed join returns exactly the plain join's rows, for
    auto-detected and caller-supplied hot keys, inner and left."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.joins import (
        hash_join,
        skew_join,
    )

    rng = np.random.default_rng(17)
    # one key holds ~60% of rows, the rest spread thin
    keys = np.where(rng.random(2000) < 0.6, 7, rng.integers(0, 200, 2000))
    left = pd.DataFrame({"k": keys, "v": np.arange(2000)})
    right = pd.DataFrame({"k": np.arange(0, 150), "w": np.arange(0, 150) * 10})

    def norm(df):
        return sorted(
            (int(r.k), int(r.v), None if pd.isna(r.w) else int(r.w))
            for r in df.itertuples()
        )

    for how in ("inner", "left"):
        want = norm(hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", how=how
        ).to_pandas())
        auto = skew_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", how=how,
            hot_den=10,
        ).to_pandas()
        assert norm(auto) == want
        manual = skew_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", how=how,
            hot_keys={7},
        ).to_pandas()
        assert norm(manual) == want


def test_rank_in_group_matches_pandas_window():
    """row_number/rank/dense_rank equal the pandas window equivalents,
    including tie groups and descending order."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.windows import (
        rank_in_group,
    )

    rng = np.random.default_rng(29)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 12, 300),
            "v": rng.integers(0, 8, 300),   # small range -> many ties
            "id": np.arange(300),
        }
    )
    for method, pd_method in (
        ("row_number", "first"),
        ("rank", "min"),
        ("dense_rank", "dense"),
    ):
        got = rank_in_group(
            rd.from_pandas(df),
            key="k",
            order_col="v",
            tiebreak="id" if method == "row_number" else None,
            descending=True,
            method=method,
        ).to_pandas().sort_values("id").reset_index(drop=True)
        if method == "row_number":
            want = (
                df.sort_values(["k", "v", "id"], ascending=[True, False, True])
                .groupby("k").cumcount() + 1
            )
            want = want.reindex(df.sort_values(["k", "v", "id"],
                                ascending=[True, False, True]).index)
            ref = df.copy()
            ref["rank"] = want.sort_index()
            ref = ref.sort_values("id").reset_index(drop=True)
        else:
            ref = df.copy()
            ref["rank"] = (
                df.groupby("k")["v"].rank(method=pd_method, ascending=False)
                .astype("int64")
            )
            ref = ref.sort_values("id").reset_index(drop=True)
        assert list(got["rank"]) == list(ref["rank"]), method


def test_pca_matches_single_process_reference():
    """Distributed covariance-partials PCA recovers the same subspace
    as a single-process eigendecomposition: projections agree up to
    float tolerance, variance is concentrated in the leading axis of a
    stretched blob."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.similarity import (
        pca_fit,
        pca_transform,
    )

    rng = np.random.default_rng(41)
    # anisotropic blob: axis 0 stretched 10x, rotated
    base = rng.normal(size=(400, 6)) * np.array([10, 3, 1, 0.5, 0.2, 0.1])
    Q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    X = base @ Q.T + rng.normal(size=6)

    ds = rd.from_items(
        [{"vec_id": i, "embedding": X[i].astype(np.float32)} for i in range(400)]
    )
    model = pca_fit(ds, k=3)
    Xf = np.stack([r["embedding"] for r in ds.take_all()]).astype(np.float64)
    mean = Xf.mean(axis=0)
    cov = (Xf - mean).T @ (Xf - mean) / (len(Xf) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    ref_comps = evecs[:, order].T
    flip = np.sign(
        ref_comps[np.arange(3), np.abs(ref_comps).argmax(axis=1)]
    )
    ref_comps = ref_comps * flip[:, None]

    assert np.allclose(model["mean"], mean, atol=1e-8)
    assert np.allclose(model["components"], ref_comps, atol=1e-6)
    assert model["explained_variance"][0] > 5 * model["explained_variance"][1]

    out = pca_transform(ds, model).to_pandas().sort_values("vec_id")
    P = np.stack(out["pca"].to_numpy())
    want = (Xf - mean) @ ref_comps.T
    assert np.allclose(P, want, atol=1e-3)
    assert P.shape == (400, 3)


def test_mean_pool_matches_pandas_groupby():
    """Grouped embedding mean equals the pandas reference; partials
    spanning multiple blocks combine correctly."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.similarity import (
        mean_pool,
    )

    rng = np.random.default_rng(47)
    n, d = 600, 5
    keys = rng.integers(0, 25, n)
    X = rng.normal(size=(n, d))
    ds = rd.from_items(
        [{"conv": int(k), "embedding": X[i].astype(np.float32)}
         for i, k in enumerate(keys)]
    ).repartition(8)  # force keys to span blocks
    out = mean_pool(ds, key_col="conv").to_pandas().sort_values("conv")
    got = np.stack(out["embedding"].to_numpy())
    want = (
        pd.DataFrame(X.astype(np.float32).astype(np.float64))
        .assign(k=keys).groupby("k").mean().sort_index().to_numpy()
    )
    assert np.allclose(got, want, atol=1e-5)
    counts = pd.Series(keys).value_counts().sort_index().to_numpy()
    assert list(out["n_vectors"]) == list(counts)


def test_score_with_model_actor_plumbing():
    """The inference stage loads weights once per actor, scores per
    batch, and emits the narrow (id, score) layout; the stub is
    deterministic across runs."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.inference import (
        score_with_model,
    )

    ds = rd.from_items(
        [{"doc_id": i, "text": "x" * (i % 17)} for i in range(300)]
    )
    a = score_with_model(ds, weights=b"w1", batch_size=32).to_pandas()
    b = score_with_model(ds, weights=b"w1", batch_size=7).to_pandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a), key(b))  # batching-invariant
    assert list(a.columns) == ["doc_id", "model_score"]
    assert a["model_score"].between(0, 999).all()


def test_compression_scorer_separates_repetitive_from_random():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        CompressionScorer,
    )

    rng = np.random.default_rng(53)
    rand = "".join(chr(rng.integers(33, 127)) for _ in range(2000))
    docs = [
        {"doc_id": 0, "text": "spam " * 400},      # highly repetitive
        {"doc_id": 1, "text": rand},               # near-incompressible
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": None},
    ]
    out = (
        rd.from_items(docs)
        .map_batches(CompressionScorer, batch_format="pandas",
                     concurrency=(1, 2))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "compress_permille"] < 100      # compresses hard
    assert out.loc[1, "compress_permille"] > 700      # barely compresses
    assert out.loc[0, "entropy_centibits"] < out.loc[1, "entropy_centibits"]
    assert out.loc[2, "compress_permille"] == 1000
    assert out.loc[3, "entropy_centibits"] == 0


def test_real_image_decode_and_features():
    """PPM/BMP decode in pure numpy: synthetic images round-trip
    exactly, resize indexing is correct, channel sums are exact, and
    undecodable payloads degrade to decoded=False instead of failing."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        ImageFeatures,
        decode_bmp,
        decode_image,
        decode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(59)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)

    # PPM P6 with a header comment
    ppm = b"P6\n# synthetic\n23 17\n255\n" + img.tobytes()
    got = decode_ppm(ppm)
    assert got is not None and np.array_equal(got, img)

    # bottom-up 24-bit BMP with row padding
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    pix = rows.tobytes()
    header = (
        b"BM" + (54 + len(pix)).to_bytes(4, "little") + b"\0\0\0\0"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
        + b"\0" * 16
    )
    bmp = header + pix
    got_bmp = decode_bmp(bmp)
    assert got_bmp is not None and np.array_equal(got_bmp, img)
    assert decode_image(b"\x89PNG\r\n....") is None  # compressed -> stub land

    # resize indexing: a 2x scale-down picks every other pixel row/col
    big = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    small = resize_nearest(big, (4, 4))
    assert np.array_equal(small, big[::2, ::2])

    batch = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([ppm, bmp, b"not an image"], pa.binary()),
        }
    )
    out = ImageFeatures(target_size=(8, 8))(batch).to_pylist()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["decoded"] and by_id[2]["decoded"]
    assert not by_id[3]["decoded"] and by_id[3]["width"] is None
    assert (by_id[1]["width"], by_id[1]["height"]) == (23, 17)
    small1 = resize_nearest(img, (8, 8))
    assert by_id[1]["sum_r"] == int(small1[:, :, 0].astype(np.int64).sum())
    # PPM and BMP of the same pixels give identical features
    for k in ("width", "height", "sum_r", "sum_g", "sum_b"):
        assert by_id[1][k] == by_id[2][k]


def test_real_wav_decode_and_features():
    """PCM WAV decode in pure numpy: payloads written by the stdlib
    wave module round-trip sample-exact (16-bit stereo and 8-bit mono),
    chunk walking skips extra chunks, features are integer-exact, and
    undecodable payloads degrade to decoded=False."""
    import io
    import wave

    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        AudioFeatures,
        decode_wav,
    )

    rng = np.random.default_rng(61)
    stereo = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(stereo.tobytes())
    wav16 = buf.getvalue()
    got = decode_wav(wav16)
    assert got is not None
    samples, rate = got
    assert rate == 16000 and np.array_equal(samples, stereo.astype(np.int32))

    mono8 = rng.integers(0, 256, size=77, dtype=np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(mono8.tobytes())
    got8 = decode_wav(buf.getvalue())
    assert got8 is not None
    s8, r8 = got8
    assert r8 == 8000
    assert np.array_equal(s8[:, 0], mono8.astype(np.int32) - 128)

    # an extra LIST chunk before data must be skipped, not break parsing
    body = wav16[12:]
    extra = b"LIST" + (6).to_bytes(4, "little") + b"INFOab"
    wav_extra = b"RIFF" + (len(body) + 14).to_bytes(4, "little") + b"WAVE" \
        + extra + body
    got_x = decode_wav(wav_extra)
    assert got_x is not None and np.array_equal(got_x[0], stereo.astype(np.int32))

    assert decode_wav(b"ID3\x04 not a wav") is None  # MP3 -> stub land
    assert decode_wav(b"RIFF\x00\x00\x00\x00AVI ") is None

    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([wav16, b"not audio"], pa.binary()),
        }
    )
    out = {r["media_id"]: r for r in AudioFeatures()(batch).to_pylist()}
    assert out[1]["decoded"] and not out[2]["decoded"]
    assert out[1]["n_frames"] == 100
    assert out[1]["sample_rate"] == 16000
    assert out[1]["duration_ms"] == 100 * 1000 // 16000
    assert out[1]["peak"] == int(np.abs(stereo.astype(np.int64)).max())
    assert out[1]["energy"] == int((stereo.astype(np.int64) ** 2).sum())
    assert out[2]["energy"] is None


def test_bpe_merge_loop_matches_naive_reference():
    """The incremental-pair-count merge loop must equal a from-scratch
    recount-every-step reference (same tie-break) on a random word
    table, and the encoder must reproduce the training segmentation."""
    from collections import Counter

    from aws_serverless_elt_pipeline_enterprise_ray.functions.tokenizer import (
        END,
        _merge_word,
        _pairs_of,
        encode_word,
        learn_bpe_from_counts,
    )

    rng = np.random.default_rng(11)
    alphabet = list("abcde")
    words = {
        "".join(rng.choice(alphabet, rng.integers(2, 9))): int(n)
        for n in rng.integers(1, 50, 60)
    }

    def naive(word_counts, num_merges, min_freq=2):
        tbl = {tuple(w) + (END,): n for w, n in word_counts.items()}
        merges = []
        for _ in range(num_merges):
            pc = Counter()
            for sym, n in tbl.items():
                for p in _pairs_of(sym):
                    pc[p] += n
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if pc[best] < min_freq:
                break
            merges.append(best)
            tbl = {_merge_word(s, best): n for s, n in tbl.items()}
        return merges

    for m in (1, 5, 40, 500):
        assert learn_bpe_from_counts(dict(words), m) == naive(words, m), m

    # encoding a training word must reproduce its merged form
    merges = learn_bpe_from_counts(dict(words), 40)
    tbl = {w: tuple(w) + (END,) for w in words}
    for p in merges:
        tbl = {w: _merge_word(s, p) for w, s in tbl.items()}
    ranks = {p: i for i, p in enumerate(merges)}
    for w, expect in tbl.items():
        assert tuple(encode_word(w, ranks)) == expect, w


def test_bpe_train_and_count_distributed():
    """End-to-end through Ray: distributed word count -> merge loop ->
    broadcast encode; counts equal a single-process recount."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.tokenizer import (
        WORD_RE,
        bpe_token_counts,
        encode_word,
        train_bpe,
    )
    import re

    texts = [
        "the lower the better lower lowest",
        "new newer newest low lower",
        "wider wide widest new",
        "",
        "the the the lower newer",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(3)

    merges = train_bpe(ds, num_merges=30, min_freq=2)
    assert merges and all(isinstance(p, tuple) and len(p) == 2 for p in merges)

    out = (
        bpe_token_counts(ds, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ranks = {p: i for i, p in enumerate(merges)}
    rx = re.compile(WORD_RE)
    for i, t in enumerate(texts):
        ws = rx.findall(t.lower())
        assert out.loc[i, "n_words"] == len(ws)
        assert out.loc[i, "n_bpe_tokens"] == sum(
            len(encode_word(w, ranks)) for w in ws
        )
    # merged units shrink the stream: fewer subwords than characters
    assert (out["n_bpe_tokens"] >= out["n_words"]).all()


def test_quantized_topk_matches_bruteforce_after_rescore():
    """int8 ANN: quantization round-trip error bounded by the scale
    step; the two-phase (approx scan -> exact rescore) top-k equals
    brute-force cosine_topk on a real random corpus with modest
    oversample; quantized column is int8 and the float column drops."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.similarity import (
        quantize_embeddings,
        quantized_topk,
    )

    rng = np.random.default_rng(13)
    V = rng.normal(size=(300, 24)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": V[i]} for i in range(300)]
    ).repartition(4)

    dsq, scales = quantize_embeddings(ds)
    qdf = dsq.to_pandas()
    assert "embedding" not in qdf.columns
    Q = np.stack(qdf.sort_values("vec_id")["embedding_q8"].to_numpy())
    assert Q.dtype == np.int8
    # round-trip error per coordinate is at most half a quantization step
    back = Q.astype(np.float64) * scales
    err = np.abs(back - V).max()
    assert err <= scales.max() / 2 + 1e-6

    qids = [3, 57, 120]
    got = quantized_topk(dsq, ds, scales, qids, k=5, oversample=6)
    want = cosine_topk(ds, qids, k=5)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["query_id", "rank", "neighbor_id"]],
        want.reset_index(drop=True)[["query_id", "rank", "neighbor_id"]],
    )
    # rescored scores are the EXACT float cosines
    np.testing.assert_allclose(
        got["cosine"].to_numpy(), want["cosine"].to_numpy(), rtol=1e-12
    )


def test_near_dedup_keep_best_by_quality():
    """Survivor policy: with keep_best_by, each near-dup cluster keeps
    its highest-scoring member (ties -> min id), not the min id."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.dedup import (
        near_dedup,
    )

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(2000)]
    texts = [
        " ".join(rng.choice(vocab, 20, replace=False)) for _ in range(20)
    ]
    rows = [
        {"doc_id": i, "text": t, "score": 10} for i, t in enumerate(texts)
    ]
    # cluster {0, 100}: the COPY has the higher score -> copy survives
    rows.append({"doc_id": 100, "text": texts[0], "score": 99})
    # cluster {1, 101, 102}: middle id has the best score
    rows.append({"doc_id": 101, "text": texts[1], "score": 50})
    rows.append({"doc_id": 102, "text": texts[1], "score": 20})
    # cluster {2, 103}: tie -> min id (2) survives
    rows.append({"doc_id": 103, "text": texts[2], "score": 10})
    ds = rd.from_items(rows)

    out = near_dedup(ds, threshold=0.6, keep_best_by="score").to_pandas()
    kept = set(out["doc_id"].tolist())
    assert 100 in kept and 0 not in kept
    assert 101 in kept and 1 not in kept and 102 not in kept
    assert 2 in kept and 103 not in kept
    assert set(range(3, 20)) <= kept
    # default policy on the same corpus keeps the min ids instead
    out_min = near_dedup(ds, threshold=0.6).to_pandas()
    kept_min = set(out_min["doc_id"].tolist())
    assert {0, 1, 2} <= kept_min and {100, 101, 102, 103}.isdisjoint(kept_min)


def test_pagerank_matches_single_process_reference():
    """Distributed power iteration equals a from-scratch single-process
    PageRank (same damping/dangling treatment) to 1e-9, ranks sum to 1,
    and a hub out-scores leaf nodes."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import (
        pagerank,
    )

    rng = np.random.default_rng(41)
    n = 60
    e = rng.integers(0, n, size=(400, 2))
    e = e[e[:, 0] != e[:, 1]]
    # a hub everyone links to, plus a dangling node (out-degree 0)
    hub_edges = np.stack([np.arange(0, 30), np.full(30, 7)], axis=1)
    e = np.vstack([e, hub_edges, [[5, 59]]])
    e = e[~((e[:, 0] == 59))]  # 59 dangles
    e = np.vstack([e, [[5, 59]]])
    df = pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]}).drop_duplicates()
    ds = rd.from_pandas(df).repartition(4)

    got = pagerank(ds, damping=0.85, iterations=12)

    # reference
    nodes = np.unique(np.concatenate([df["src"], df["dst"]]))
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    out = np.zeros(N)
    for s in df["src"]:
        out[idx[s]] += 1
    r = np.full(N, 1.0 / N)
    for _ in range(12):
        nr = np.zeros(N)
        for s, d in df.itertuples(index=False):
            nr[idx[d]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - 0.85) / N + 0.85 * (nr + dangling / N)
    want = pd.DataFrame({"node": nodes, "rank": r}).sort_values("node")

    assert got["node"].tolist() == want["node"].tolist()
    np.testing.assert_allclose(
        got["rank"].to_numpy(), want["rank"].to_numpy(), atol=1e-9
    )
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    hub_rank = float(got.loc[got["node"] == 7, "rank"].iloc[0])
    assert hub_rank > got["rank"].median() * 3


def test_hits_matches_single_process_reference():
    """Distributed HITS equals a from-scratch single-process power
    iteration (same L2 normalization) to 1e-9; the everyone-links-to-it
    node dominates authority and the links-to-everything node hub."""
    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import hits

    rng = np.random.default_rng(43)
    n = 50
    e = rng.integers(0, n, size=(300, 2))
    e = e[e[:, 0] != e[:, 1]]
    e = np.vstack(
        [
            e,
            np.stack([np.arange(0, 25), np.full(25, 9)], axis=1),  # authority 9
            np.stack([np.full(25, 3), np.arange(25, 50)], axis=1),  # hub 3
        ]
    )
    e = e[e[:, 0] != e[:, 1]]
    df = pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]}).drop_duplicates()
    ds = rd.from_pandas(df).repartition(4)

    got = hits(ds, iterations=15)

    nodes = np.unique(np.concatenate([df["src"], df["dst"]]))
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    h = np.ones(N)
    a = np.ones(N)
    pairs = [(idx[s], idx[d]) for s, d in df.itertuples(index=False)]
    for _ in range(15):
        na = np.zeros(N)
        for si, di in pairs:
            na[di] += h[si]
        a = na / np.linalg.norm(na)
        nh = np.zeros(N)
        for si, di in pairs:
            nh[si] += a[di]
        h = nh / np.linalg.norm(nh)

    assert got["node"].tolist() == list(nodes)
    np.testing.assert_allclose(got["authority"].to_numpy(), a, atol=1e-9)
    np.testing.assert_allclose(got["hub"].to_numpy(), h, atol=1e-9)
    assert got.loc[got["authority"].idxmax(), "node"] == 9
    assert got.loc[got["hub"].idxmax(), "node"] == 3


def test_json_field_extractor_nested_and_malformed():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        JsonFieldExtractor,
    )

    ex = JsonFieldExtractor({"k": "k", "city": "geo.city", "bad": "geo.zip.x"},
                            json_col="j")
    b = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "j": [
                '{"k": 7, "geo": {"city": "ulm", "zip": 89073}}',
                '{"k": "s"}',
                "not json",
                None,
                '{"geo": {"city": null}}',
            ],
        }
    )
    out = ex(b.copy())
    assert list(out.columns) == ["id", "k", "city", "bad"]
    assert out["k"].tolist() == [7, "s", None, None, None]
    assert out["city"].tolist() == ["ulm", None, None, None, None]
    assert out["bad"].isna().all()  # path through a scalar resolves to None


def test_bm25_matches_single_process_reference():
    import math
    import re

    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        bm25_scores,
    )

    docs = [
        "the quick brown fox jumps over the lazy dog",
        "a hash join beats a nested loop join on big tables",
        "vector search with a hash index",
        "nothing relevant here at all",
        "join join join",
        "",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    terms = ["hash", "join", "vector"]
    got = (
        bm25_scores(
            rd.from_pandas(df).repartition(3), query_terms=terms
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    tok = [re.findall(r"[a-z0-9]+", d.lower()) for d in docs]
    N = len(docs)
    avgdl = sum(len(t) for t in tok) / N
    k1, b = 1.2, 0.75
    want = {}
    for i, t in enumerate(tok):
        s = 0.0
        for term in terms:
            dfc = sum(1 for tt in tok if term in tt)
            idf = math.log((N - dfc + 0.5) / (dfc + 0.5) + 1.0)
            tf = float(t.count(term))
            s = s + idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(t) / avgdl))
        if math.floor(s * 1048576.0) > 0:
            want[i] = (len(t), math.floor(s * 1048576.0))
    assert dict(zip(got["doc_id"], zip(got["dl"], got["score_ub"]))) == want
    # doc 4 (pure 'join' spam) must outrank doc 1 on the join-heavy query
    s4 = got.loc[got["doc_id"] == 4, "score_ub"]
    assert len(s4) == 1 and int(s4.iloc[0]) > 0


def test_fuzzy_pairs_ed1_matches_bruteforce_levenshtein():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.fuzzy import (
        fuzzy_pairs_ed1,
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(37)
    base = ["alpha", "beta", "gamma", "delta", "kappa", "om", ""]
    strs = []
    for i in range(160):
        s = base[i % len(base)]
        op = rng.integers(0, 4)
        pos = int(rng.integers(0, max(len(s), 1)))
        ch = chr(ord("a") + int(rng.integers(0, 6)))
        if op == 1 and s:
            s = s[:pos] + ch + s[pos + 1:]          # substitute
        elif op == 2:
            s = s[:pos] + ch + s[pos:]              # insert
        elif op == 3 and s:
            s = s[:pos] + s[pos + 1:]               # delete
        strs.append(s)
    df = pd.DataFrame({"id": np.arange(len(strs), dtype=np.int64),
                       "text": strs})
    got = (
        fuzzy_pairs_ed1(
            rd.from_pandas(df).repartition(4), id_col="id", text_col="text"
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = {}
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            d = lev(strs[i], strs[j])
            if d <= 1:
                want[(i, j)] = d
    assert dict(zip(zip(got["id_a"], got["id_b"]), got["dist"])) == want
    assert (got["dist"] == 0).any() and (got["dist"] == 1).any()


def test_chunk_documents_overlap_and_reconstruction():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        chunk_by_chars,
    )

    docs = [
        "abcdefghijklmnopqrstuvwxyz",  # multiple chunks
        "short",                       # single chunk
        "",                            # empty -> one empty chunk
        "x" * 10,                      # exact boundary (step=8,size=10)
    ]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": docs})
    got = (
        chunk_by_chars(
            rd.from_pandas(df).repartition(2),
            chunk_size=10,
            overlap=2,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    step = 8
    want = []
    for i, t in enumerate(docs):
        starts = range(0, max(len(t), 1), step)
        for j, s in enumerate(starts):
            want.append((i, j, t[s:s + 10]))
    assert list(zip(got["doc_id"], got["chunk_idx"], got["chunk_text"])) == want
    # reconstruction: stripping the overlap from chunks 1.. rebuilds the doc
    d0 = got[got["doc_id"] == 0]
    rebuilt = d0["chunk_text"].iloc[0] + "".join(
        c[2:] for c in d0["chunk_text"].iloc[1:]
    )
    assert rebuilt == docs[0]


def test_image_dhash_brightness_invariant_clusters():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        dhash64,
        image_dhash_clusters,
    )

    def ppm(img):
        h, w = img.shape[:2]
        return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()

    rng = np.random.default_rng(59)
    base = rng.integers(0, 180, (16, 16), dtype=np.uint8)
    img_a = np.stack([base] * 3, axis=2)
    img_b = img_a + 40                      # brightness shift, no wrap
    other = np.stack([base.T] * 3, axis=2)  # different structure
    # direct hash invariances
    assert dhash64(img_a) == dhash64(img_b)
    assert dhash64(img_a) != dhash64(other)

    df = pd.DataFrame(
        {
            "media_id": np.array([1, 2, 3, 4], dtype=np.int64),
            "payload": [ppm(img_a), ppm(img_b), ppm(other), b"not an image"],
        }
    )
    got = (
        image_dhash_clusters(
            rd.from_pandas(df).repartition(2)
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    # undecodable payload dropped; 1 and 2 cluster together under min id
    assert got["media_id"].tolist() == [1, 2, 3]
    assert got["canonical_id"].tolist() == [1, 1, 3]


def test_triangle_count_matches_bruteforce():
    from itertools import combinations

    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import (
        triangle_count,
    )

    rng = np.random.default_rng(67)
    n_nodes, n_edges = 40, 300
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    df = pd.DataFrame({"src": src, "dst": dst})
    got = triangle_count(rd.from_pandas(df).repartition(4))

    adj = {}
    for a, b in zip(src, dst):
        if a == b:
            continue
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    want = 0
    for trio in combinations(sorted(adj), 3):
        a, b, c = trio
        if b in adj[a] and c in adj[a] and c in adj[b]:
            want += 1
    assert got == want > 0


def test_html_stripper_removes_boilerplate_exactly():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        HtmlStripper,
    )

    raw = [
        "<html><body><p>Hello   <b>world</b></p>"
        "<script>if (1 < 2) { alert('x'); }</script>"
        "<style>.x{}</style><!-- note -->Tail &amp; more&nbsp;here</body></html>",
        "plain text, no markup",
        "<SCRIPT>upper case</SCRIPT>kept",
        None,
    ]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": raw})
    out = (
        rd.from_pandas(df)
        .map_batches(HtmlStripper, batch_format="pandas",
                     concurrency=1, num_cpus=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["clean"].tolist() == [
        "Hello world Tail & more here",
        "plain text, no markup",
        "kept",
        "",
    ]


def test_label_propagation_matches_single_process_reference():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import (
        label_propagation,
    )

    # two 4-cliques + a bridge: ground truth = two communities
    e = []
    for nodes in ([0, 1, 2, 3], [10, 11, 12, 13]):
        for i in range(4):
            for j in range(i + 1, 4):
                e.append((nodes[i], nodes[j]))
    e.append((3, 10))
    df = pd.DataFrame(e, columns=["src", "dst"])
    got = label_propagation(rd.from_pandas(df).repartition(3), rounds=6)
    assert got.set_index("node")["label"].to_dict() == {
        0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10, 13: 10
    }

    # random graph: parity with a from-scratch synchronous reference
    rng = np.random.default_rng(73)
    src = rng.integers(0, 30, 120).astype(np.int64)
    dst = rng.integers(0, 30, 120).astype(np.int64)
    rdf = pd.DataFrame({"src": src, "dst": dst})
    got2 = label_propagation(rd.from_pandas(rdf).repartition(4), rounds=4)

    adj = {}
    for a, b in zip(src, dst):
        if a == b:
            continue
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    labels = {u: u for u in adj}
    from collections import Counter

    for _ in range(4):
        new = {}
        for u in adj:
            c = Counter(labels[v] for v in adj[u])
            top = max(c.values())
            new[u] = min(lab for lab, k in c.items() if k == top)
        if new == labels:
            labels = new
            break
        labels = new
    assert got2.set_index("node")["label"].to_dict() == labels


def test_bfs_distances_matches_python_bfs():
    from collections import deque

    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import (
        bfs_distances,
    )

    rng = np.random.default_rng(79)
    src = rng.integers(0, 60, 150).astype(np.int64)
    dst = rng.integers(0, 60, 150).astype(np.int64)
    df = pd.DataFrame({"src": src, "dst": dst})
    got = bfs_distances(rd.from_pandas(df).repartition(4), source=0)

    adj = {}
    for a, b in zip(src, dst):
        if a == b:
            continue
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    want = {0: 0}
    q = deque([0])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    assert got.set_index("node")["dist"].to_dict() == want
    # max_depth truncates: only source + direct neighbors at depth 1
    shallow = bfs_distances(rd.from_pandas(df), source=0, max_depth=1)
    assert set(shallow["dist"]) <= {0, 1}
    assert shallow.set_index("node")["dist"].to_dict() == {
        k: v for k, v in want.items() if v <= 1
    }


def test_mmr_select_diverse_and_deterministic():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.similarity import (
        mmr_select,
    )

    rng = np.random.default_rng(89)
    # three tight clusters; MMR at lam=0.5 must cover all three before
    # taking a second member of any cluster
    centers = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    vecs, ids = [], []
    for ci, c in enumerate(centers):
        for j in range(5):
            vecs.append(c + rng.normal(0, 0.05, 3))
            ids.append(ci * 100 + j)
    df = pd.DataFrame(
        {"vec_id": np.array(ids, dtype=np.int64),
         "embedding": [v.astype(np.float32) for v in vecs]}
    )
    got = mmr_select(
        rd.from_pandas(df).repartition(4), k=3, lam=0.5
    )
    assert len(got) == 3
    assert sorted(i // 100 for i in got["id"]) == [0, 1, 2]
    # layout invariance
    again = mmr_select(rd.from_pandas(df).repartition(7), k=3, lam=0.5)
    assert got["id"].tolist() == again["id"].tolist()
    # pure relevance (lam=1) picks by centrality only: still 3 rows,
    # rank strictly ordered
    rel = mmr_select(rd.from_pandas(df), k=3, lam=1.0)
    assert rel["rank"].tolist() == [1, 2, 3]


def test_personalized_pagerank_concentrates_on_seeds():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import (
        pagerank,
    )

    rng = np.random.default_rng(101)
    src = rng.integers(0, 40, 200).astype(np.int64)
    dst = rng.integers(0, 40, 200).astype(np.int64)
    df = pd.DataFrame({"src": src, "dst": dst})
    seeds = [0, 1]
    got = pagerank(
        rd.from_pandas(df).repartition(3), iterations=8,
        personalization=seeds,
    )
    uni = pagerank(rd.from_pandas(df).repartition(3), iterations=8)
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    # seeds gain rank relative to the uniform teleport run
    g = got.set_index("node")["rank"]
    u = uni.set_index("node")["rank"]
    assert g[0] > u[0] and g[1] > u[1]
    # reference: single-process personalized power iteration
    adj = {}
    deg = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), []).append(int(b))
        deg[int(a)] = deg.get(int(a), 0) + 1
    nodes = sorted(set(src) | set(dst))
    tele = {v: (0.5 if v in seeds else 0.0) for v in nodes}
    r = dict(tele)
    for _ in range(8):
        nxt = {v: 0.0 for v in nodes}
        dangling = sum(r[v] for v in nodes if v not in deg)
        for a, outs in adj.items():
            w = r[a] / deg[a]
            for b in outs:
                nxt[b] += w
        r = {
            v: (1 - 0.85) * tele[v] + 0.85 * dangling * tele[v]
               + 0.85 * nxt[v]
            for v in nodes
        }
    for v in nodes:
        assert abs(g[v] - r[v]) < 1e-9
    missing_seed = [999]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seeds not in graph"):
        pagerank(rd.from_pandas(df), iterations=1,
                 personalization=missing_seed)


def test_k_core_matches_peeling_reference():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.graph import (
        k_core,
    )

    # a 4-clique (3-core) with pendant chains that must peel away
    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (6, 7), (3, 8)]
    df = pd.DataFrame(e, columns=["src", "dst"])
    got = k_core(rd.from_pandas(df).repartition(3), k=3)
    assert got["node"].tolist() == [1, 2, 3, 4]
    assert got["deg"].tolist() == [3, 3, 3, 3]
    # k=2 over a random graph vs a from-scratch peeler
    rng = np.random.default_rng(103)
    src = rng.integers(0, 30, 100).astype(np.int64)
    dst = rng.integers(0, 30, 100).astype(np.int64)
    rdf = pd.DataFrame({"src": src, "dst": dst})
    got2 = k_core(rd.from_pandas(rdf).repartition(4), k=4)

    adj = {}
    for a, b in zip(src, dst):
        if a == b:
            continue
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    changed = True
    while changed:
        changed = False
        for u in list(adj):
            if len(adj[u]) < 4:
                for v in adj[u]:
                    adj[v].discard(u)
                del adj[u]
                changed = True
    want = {u: len(vs) for u, vs in sorted(adj.items())}
    assert got2.set_index("node")["deg"].to_dict() == want
    # empty core
    assert len(k_core(rd.from_pandas(df), k=10)) == 0


def test_soundex_canonical_examples_and_vectorized_batch():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.fuzzy import (
        soundex,
    )

    names = np.array(
        ["Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
         "Pfister", "Honeyman", "rObErT", "", "  ", "Lee", "O"],
        dtype=object,
    )
    got = list(soundex(names))
    assert got[:7] == ["R163", "R163", "A261", "A261", "T522",
                       "P236", "H555"]
    assert got[7] == "R163"          # case-insensitive
    assert got[8] == "" and got[9] == ""   # letterless -> empty
    assert got[10] == "L000" and got[11] == "O000"  # zero padding


def test_novelty_scores_match_bruteforce_trigram_df():
    from collections import Counter

    from aws_serverless_elt_pipeline_enterprise_ray.functions.text import (
        novelty_scores,
    )

    docs = [
        "the quick brown fox jumps over the lazy dog",   # unique tail
        "the quick brown fox sits still",                # shares a prefix
        "completely different words entirely here now",  # all novel
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "too short",                                     # < 3 tokens -> drop
    ]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "text": docs})
    got = (
        novelty_scores(rd.from_pandas(df).repartition(3), n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def grams(s):
        t = s.lower().split()
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    dfreq = Counter(g for d in docs for g in grams(d))
    want = {}
    for i, d in enumerate(docs):
        gs = grams(d)
        if not gs:
            continue
        uniq = sum(1 for g in gs if dfreq[g] == 1)
        want[i] = (len(gs), int(np.floor(1000.0 * uniq / len(gs))))
    assert dict(zip(got["doc_id"],
                    zip(got["n_grams"], got["novelty_pm"]))) == want
    assert 4 not in set(got["doc_id"])          # short doc dropped
    assert want[3][1] == 0 and want[2][1] == 1000  # dup vs all-novel
