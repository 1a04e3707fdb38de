"""Distributed BPE tokenizer training and encoding.

The scale shape of subword-tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) on a 100 TB corpus is NOT "stream every token through
the merge loop" — it is:

1. **Distributed word count** (`term_frequencies`): one pass over the
   corpus, per-batch partial ``value_counts``, one groupby-sum shuffle
   that carries only (distinct word, n) rows. 100 TB of text collapses
   to a vocabulary-sized table (Zipf: a few million rows).
2. **Driver-side merge loop over that table**: classic BPE with
   incremental pair-count maintenance — cost is O(merges × words
   containing the merged pair), independent of corpus size.
3. **Broadcast encode**: the ranked merge list ships once per actor
   (``ray.put``), and each batch encodes only its *unique* words (a
   per-actor cache makes repeated words free — Zipf again), then maps
   words → token counts/ids vectorized.

So the corpus is touched exactly twice (count, encode), both times
streaming, and the only shuffle carries distinct words. Reference
analogue: the reference has no tokenizer; this is part of the
LLM-training-data operator set layered on the same engine.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd

# must match term_frequencies' tokenization so one word-count table
# serves quality scoring and BPE training alike
WORD_RE = r"[a-z0-9]+"
END = "</w>"


# ---------------------------------------------------------------- train


def _pairs_of(sym: tuple[str, ...]) -> list[tuple[str, str]]:
    return list(zip(sym[:-1], sym[1:]))


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    a, b = pair
    out = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_bpe_from_counts(
    word_counts: "pd.DataFrame | dict[str, int]",
    num_merges: int,
    *,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """The driver-side merge loop: standard BPE over a (word, n)
    frequency table with incremental pair-count maintenance (the
    subword-nmt ``learn_bpe`` strategy — only words containing the
    merged pair are re-counted). Deterministic: ties broken by
    lexicographically smallest pair.

    This is intentionally a pure function of the *vocabulary-sized*
    table so it composes with any distributed counting front-end and
    is trivially unit-testable against a from-scratch reference.
    """
    if isinstance(word_counts, pd.DataFrame):
        items = list(zip(word_counts["term"], word_counts["n"].astype(int)))
    else:
        items = list(word_counts.items())

    words: list[tuple[str, ...]] = [tuple(w) + (END,) for w, _ in items]
    freqs: list[int] = [int(n) for _, n in items]

    pair_counts: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> {word index}
    for i, sym in enumerate(words):
        f = freqs[i]
        for p in _pairs_of(sym):
            pair_counts[p] += f
            where[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic argmax: max count, then smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_freq:
            break
        merges.append(best)
        for i in list(where[best]):
            old, f = words[i], freqs[i]
            old_pairs = _pairs_of(old)
            for p in set(old_pairs):
                pair_counts[p] -= old_pairs.count(p) * f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                where[p].discard(i)
            new = _merge_word(old, best)
            words[i] = new
            for p in _pairs_of(new):
                pair_counts[p] += f
                where[p].add(i)
    return merges


def train_bpe(
    ds,
    *,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int | None = 100_000,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Train BPE merges on a Dataset's text column.

    Distributed word count via ``term_frequencies`` (the shuffle moves
    one row per distinct word; ``max_words`` caps the training table at
    the top-N words by (n desc, term asc) — documented approximation,
    exact when the vocabulary fits), then the driver merge loop over
    that table.
    """
    from .text import term_frequencies

    wc = term_frequencies(ds, text_col=text_col, top_n=max_words)
    return learn_bpe_from_counts(wc, num_merges, min_freq=min_freq)


# --------------------------------------------------------------- encode


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encoding of one word (the standard
    GPT-2-style ``bpe()`` loop). Called once per *unique* word per
    actor thanks to the encoder cache."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BpeEncoder:
    """Actor-pool encode stage: merges fetched from the object store
    once per actor (``__init__``), per-batch work = findall tokenize →
    encode each *unique* word (per-actor cache persists across
    batches) → vectorized map back to rows. Adds ``n_bpe_tokens``
    (subword count per doc) and ``n_words``.

    Use as ``map_batches(BpeEncoder, fn_constructor_kwargs={...},
    batch_format="pandas", concurrency=N)``.
    """

    def __init__(self, merges_ref, text_col: str = "text"):
        import ray

        merges = (
            ray.get(merges_ref)
            if not isinstance(merges_ref, list)
            else merges_ref
        )
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.col = text_col
        self.cache: dict[str, int] = {}  # word -> subword count

    def _count(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            self.cache[word] = n
        return n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.col].fillna("").str.lower().str.findall(WORD_RE)
        batch["n_words"] = toks.str.len().astype("int64")
        ex = toks.explode().dropna()
        if len(ex):
            uniq = pd.unique(ex)
            m = pd.Series({w: self._count(w) for w in uniq})
            per_doc = (
                ex.map(m).groupby(level=0).sum().reindex(batch.index, fill_value=0)
            )
        else:
            per_doc = pd.Series(0, index=batch.index)
        batch["n_bpe_tokens"] = per_doc.astype("int64")
        return batch


def bpe_token_counts(
    ds,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=(1, 8),
):
    """Convenience: broadcast ``merges`` and return a Dataset of
    (id, n_words, n_bpe_tokens) — the token-accounting pass a corpus
    budgeter runs with a real tokenizer."""
    import ray

    ref = ray.put([tuple(p) for p in merges])
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges_ref": ref, "text_col": text_col},
        batch_format="pandas",
        concurrency=concurrency,
    ).select_columns([id_col, "n_words", "n_bpe_tokens"])
