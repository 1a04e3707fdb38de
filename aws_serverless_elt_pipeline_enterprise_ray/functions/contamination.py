"""Benchmark-contamination screening for training corpora.

Before training on a crawled corpus you must know which documents leak
evaluation data: any doc sharing word-n-gram shingles with a benchmark
suite is suspect (the standard n-gram-overlap decontamination used for
public LLM train sets). Scale shape: a benchmark suite is small (MBs)
next to a 100-TB corpus, so its distinct shingle set is built once -
extraction is distributed, only the DEDUPLICATED shingle strings reach
the driver - then broadcast via ``ray.put`` and loaded once per actor;
the corpus itself streams through ``map_batches`` and never shuffles.

Shingling matches ``dedup.jaccard``'s word-k-grams exactly (documents
shorter than k words contribute their whole text as one shingle), so
results are SQL-verifiable with the same DuckDB list-comprehension
shingle construction proven for ``ngram_jaccard``.
"""

from __future__ import annotations

import pandas as pd
import ray
import ray.data as rd


def word_shingles(text: str | None, k: int = 3) -> set[str]:
    """Distinct word-k-gram shingles of ``text`` (whole text as one
    shingle when shorter than k words - mirrors ``dedup.jaccard``)."""
    w = (text or "").split()
    if len(w) < k:
        return {" ".join(w)}
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def benchmark_shingle_set(
    bench: rd.Dataset, *, text_col: str = "text", k: int = 3
) -> frozenset[str]:
    """Distinct shingles of the benchmark suite. Extraction runs
    distributed; each batch emits its LOCAL distinct set, so the driver
    unions pre-deduplicated shingles - bounded by benchmark size, never
    corpus size."""

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        s: set[str] = set()
        for t in b[text_col]:
            s |= word_shingles(t, k)
        return pd.DataFrame({"shingle": sorted(s)})

    parts = bench.map_batches(extract, batch_format="pandas").to_pandas()
    return frozenset(parts["shingle"])


class _Scorer:
    """Actor-pool batch fn: benchmark shingle set fetched from the
    object store ONCE per actor in ``__init__`` (broadcast, not
    re-shipped per batch), then each batch scores vectorized over its
    rows."""

    def __init__(self, bench_ref, text_col: str, id_col: str, k: int):
        self.bench = ray.get(bench_ref)
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        hits = [
            len(word_shingles(t, self.k) & self.bench)
            for t in b[self.text_col]
        ]
        return pd.DataFrame(
            {
                self.id_col: b[self.id_col].astype("int64").to_numpy(),
                "n_bench_shingles": pd.Series(hits, dtype="int64"),
            }
        )


def contamination_check(
    docs: rd.Dataset,
    bench: rd.Dataset | frozenset[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    concurrency: int = 4,
) -> rd.Dataset:
    """Per-document count of distinct shingles shared with the
    benchmark suite: ``(id_col, n_bench_shingles)``. Filter
    ``n_bench_shingles >= threshold`` downstream to drop contaminated
    docs (thresholding is policy; the count is the reusable fact)."""
    shingles = (
        bench
        if isinstance(bench, frozenset)
        else benchmark_shingle_set(bench, text_col=text_col, k=k)
    )
    ref = ray.put(shingles)
    return docs.map_batches(
        _Scorer,
        batch_format="pandas",
        concurrency=concurrency,
        fn_constructor_args=(ref, text_col, id_col, k),
    )
