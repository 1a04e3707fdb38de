"""Text-analysis stages for training-data pipelines.

All are vectorized per-batch transforms designed for
``map_batches(..., batch_format="pandas"|"pyarrow")``; the classes are
actor-pool stages that compile their regexes once per actor. Each has
an ANSI-SQL-expressible definition so the driver's DuckDB oracle can
verify it exactly (see ``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .windows import bucketed_agg, bucketed_distinct

TOKEN_RE = r"[A-Za-z0-9]+"
ALPHA_RE = r"[^A-Za-z]"

# Tiny per-language stopword alternations (n-gram heuristic lang-ID).
# Deliberately SQL-mirrorable: counts of whole-word regex matches.
LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is|you|that|it|for)\b",
    "es": r"\b(el|la|de|que|y|en|un|por|con|los)\b",
    "fr": r"\b(le|la|de|et|un|être|que|pour|dans|ce)\b",
}
LANG_PRIORITY = ("en", "es", "fr")  # tie-break order


class TokenCounter:
    """Whitespace/alnum token counting: ``n_tokens`` = number of
    non-overlapping ``[A-Za-z0-9]+`` matches (SQL:
    ``len(regexp_extract_all(text, '[A-Za-z0-9]+'))``)."""

    def __init__(self, text_col: str = "text"):
        import re

        self.col = text_col
        self.re = re.compile(TOKEN_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_tokens"] = (
            batch[self.col].str.count(TOKEN_RE).fillna(0).astype("int64")
        )
        return batch


class QualityScorer:
    """Length / composition quality signals, integer-exact:
    ``n_chars``, ``n_tokens``, ``alpha_chars`` (count of [A-Za-z]) and
    an ``ok`` flag (token count in [5,1000] and n_chars < 5000)."""

    def __init__(self, text_col: str = "text"):
        self.col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.col].fillna("")
        batch["n_chars"] = s.str.len().astype("int64")
        batch["n_tokens"] = s.str.count(TOKEN_RE).astype("int64")
        batch["alpha_chars"] = s.str.replace(ALPHA_RE, "", regex=True).str.len().astype("int64")
        batch["ok"] = (
            (batch["n_tokens"] >= 5) & (batch["n_tokens"] <= 1000) & (batch["n_chars"] < 5000)
        )
        return batch


class LangId:
    """Stopword-hit language ID over ``LANG_PATTERNS``; prediction is
    the argmax hit count with ``LANG_PRIORITY`` tie-break. Compiles
    patterns once per actor."""

    def __init__(self, text_col: str = "text"):
        self.col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        low = batch[self.col].fillna("").str.lower()
        scores = {
            lang: low.str.count(pat).astype("int64")
            for lang, pat in LANG_PATTERNS.items()
        }
        pred = pd.Series("en", index=batch.index)
        best = scores["en"].copy()
        for lang in LANG_PRIORITY[1:]:
            better = scores[lang] > best
            pred = pred.mask(better, lang)
            best = best.mask(better, scores[lang])
        for lang in LANG_PRIORITY:
            batch[f"hits_{lang}"] = scores[lang]
        batch["lang_pred"] = pred
        return batch


class RepetitionScorer:
    """Gopher-style repetition quality signals, integer-exact so the
    DuckDB oracle can hash-verify them:

    - ``n_lines`` / ``n_dup_lines``: newline-split segment count and how
      many of them are repeats of an earlier segment (SQL:
      ``len(string_split(text, chr(10)))`` minus ``len(list_distinct(...))``).
    - ``n_bigrams`` / ``top_bigram_n``: word-bigram count over lowercase
      ``[a-z0-9]+`` tokens and the multiplicity of the most frequent
      bigram (boilerplate/looping text concentrates mass in one bigram).
    - ``repetitive``: >=50% duplicate lines (with >=2 lines) OR the top
      bigram covering >=20% of >=10 bigrams — the classic repetition
      filter a training-data pipeline runs before dedup.

    All C-level pandas (split/explode/groupby); no Python loop per row.
    """

    def __init__(self, text_col: str = "text"):
        self.col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.col].fillna("")

        lines = s.str.split("\n")
        batch["n_lines"] = lines.str.len().astype("int64")
        e = lines.explode()
        distinct = (
            pd.DataFrame({"i": e.index, "v": e.to_numpy()})
            .drop_duplicates()
            .groupby("i")
            .size()
        )
        batch["n_dup_lines"] = (
            batch["n_lines"]
            - distinct.reindex(batch.index).fillna(0).astype("int64")
        ).astype("int64")

        toks = s.str.lower().str.findall(r"[a-z0-9]+")
        batch["n_bigrams"] = (
            (toks.str.len() - 1).clip(lower=0).astype("int64")
        )
        t = toks.explode().dropna()
        df = pd.DataFrame({"i": t.index, "t": t.to_numpy()})
        df["nxt"] = df.groupby("i")["t"].shift(-1)
        df = df.dropna(subset=["nxt"])
        top = (
            df.groupby(["i", "t", "nxt"]).size().groupby(level=0).max()
            if len(df)
            else pd.Series(dtype="int64")
        )
        batch["top_bigram_n"] = (
            top.reindex(batch.index).fillna(0).astype("int64")
        )

        batch["repetitive"] = (
            (batch["n_lines"] >= 2)
            & (2 * batch["n_dup_lines"] >= batch["n_lines"])
        ) | (
            (batch["n_bigrams"] >= 10)
            & (5 * batch["top_bigram_n"] >= batch["n_bigrams"])
        )
        return batch


class Fingerprinter:
    """Content fingerprint: md5 hex of the exact text bytes (matches
    SQL ``md5(text)``) plus a 64-bit rolling polynomial hash of the
    token stream (shift-invariant document fingerprint)."""

    def __init__(self, text_col: str = "text"):
        import re

        self.col = text_col
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.col].fillna("")
        batch["md5"] = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        B = np.uint64(1000003)

        def roll(t: str) -> int:
            toks = self.tok.findall(t)
            if not toks:
                return 0
            # deterministic cross-process word hashes (builtin hash()
            # is process-salted - never use it for shuffled values)
            hs = pd.util.hash_array(
                np.array(toks, dtype=object), categorize=False
            ).astype(np.uint64)
            h = np.uint64(0)
            for x in hs:
                h = h * B + x  # uint64 wraps mod 2^64
            return int(h & np.uint64(0x7FFFFFFFFFFFFFFF))

        with np.errstate(over="ignore"):
            batch["rolling_fp"] = [roll(t) for t in texts]
        return batch


def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized 64-bit content hash column for exact dedup
    (hash-partition + per-group-first strategy)."""
    h = pd.util.hash_array(
        np.asarray(batch[text_col].to_numpy(zero_copy_only=False), dtype=object),
        categorize=False,
    )
    return batch.append_column("text_hash", pa.array(h.astype(np.int64), pa.int64()))


def term_frequencies(
    ds,
    *,
    text_col: str = "text",
    top_n: int | None = 100,
) -> pd.DataFrame:
    """Corpus term-frequency (the map-reduce word count): per-batch
    partial counts (one C-level value_counts per block - the token
    explosion never leaves the worker), a distributed groupby-sum over
    terms, then a global top-N. The shuffle carries one row per
    (block, distinct term), not per token occurrence.

    Terms are lowercase ``[a-z0-9]+`` runs (SQL:
    ``unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))``)."""
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pa.Table:
        toks = b[text_col].fillna("").str.lower().str.findall(r"[a-z0-9]+")
        vc = toks.explode().dropna().value_counts()
        return pa.table(
            {
                "term": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(vc.to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    out = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        "term", {"n": "sum"},
    )
    if top_n is not None:
        out = out.sort(["n", "term"], descending=[True, False]).limit(top_n)
    df = out.to_pandas()
    df["n"] = df["n"].astype("int64")
    return df


def vocab_coverage(
    ds,
    vocab: set[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Per-document in-vocabulary token ratio (integer per-mille): the
    scoring half of a corpus-trained statistical quality filter. The
    vocabulary (result-sized, e.g. ``term_frequencies`` top-N) is
    broadcast via ``ray.put`` and fetched once per actor; scoring is
    one vectorized pass per batch (findall + explode + C-level isin /
    level-0 groupby — no Python per row). Docs with no tokens score 0.

    Tokenization matches ``term_frequencies`` ([a-z0-9]+ on lower) so
    one SQL token table serves both train and score in the oracle."""
    import ray

    vocab_ref = ray.put(frozenset(vocab))

    class Score:
        def __init__(self):
            self.vocab = ray.get(vocab_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            toks = b[text_col].fillna("").str.lower().str.findall(r"[a-z0-9]+")
            n_tokens = toks.str.len().to_numpy(dtype=np.int64)
            ex = toks.explode().dropna()
            inv = (
                ex.isin(self.vocab)
                .groupby(level=0)
                .sum()
                .reindex(b.index, fill_value=0)
                .to_numpy(dtype=np.int64)
            )
            score = np.where(n_tokens > 0, (inv * 1000) // np.maximum(n_tokens, 1), 0)
            return pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(),
                    "n_tokens": n_tokens,
                    "score": score.astype(np.int64),
                }
            )

    out = ds.map_batches(Score, batch_format="pandas", concurrency=(1, 8))
    df = out.sort(id_col).to_pandas()
    for c in ("n_tokens", "score"):
        df[c] = df[c].astype("int64")
    return df


def _batch_bigrams(b: pd.DataFrame, text_col: str):
    """Vectorized adjacent-token bigrams for every row of a batch:
    returns (row_label, first_token, "w1 w2") arrays. One findall +
    explode; adjacency comes from the exploded row labels (tokens of a
    row are contiguous), so no Python per row/token."""
    toks = b[text_col].fillna("").str.lower().str.findall(r"[a-z0-9]+")
    ex = toks.explode().dropna()
    doc = ex.index.to_numpy()
    tok = ex.to_numpy(dtype=object)
    if len(tok) < 2:
        e = np.zeros(0, dtype=object)
        return np.zeros(0, dtype=np.int64), e, pd.Series(e, dtype=object)
    same = doc[1:] == doc[:-1]
    w1 = tok[:-1][same]
    big = pd.Series(w1, dtype=object) + " " + pd.Series(tok[1:][same], dtype=object)
    return doc[:-1][same], w1, big


def bigram_model(
    ds,
    *,
    text_col: str = "text",
    top_bigrams: int = 50_000,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Train the corpus side of a bigram language model in ONE token
    pass: per-batch partial counts of bigrams and of bigram prefixes
    (C-level value_counts - the token explosion never leaves the
    worker), one groupby-sum shuffle over (kind, key) rows, then the
    model = top-N bigrams by count (deterministic tie-break: bigram
    asc) via a distributed sort+limit. Returns (bigrams, prefixes)
    count tables; the prefix table is vocabulary-sized (not truncated -
    truncating it would skew every conditional probability), the
    bigram table is capped so the broadcast stays bounded at corpus
    scale. The shuffle carries one row per (block, distinct gram)."""
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pa.Table:
        _, w1, big = _batch_bigrams(b, text_col)
        vb = big.value_counts()
        vp = pd.Series(w1, dtype=object).value_counts()
        return pa.table(
            {
                "kind": pa.array(["b"] * len(vb) + ["p"] * len(vp), pa.string()),
                "key": pa.array(
                    np.concatenate(
                        [vb.index.to_numpy(dtype=object),
                         vp.index.to_numpy(dtype=object)]
                    ).tolist()
                    if len(vb) + len(vp)
                    else [],
                    pa.string(),
                ),
                "n": pa.array(
                    np.concatenate(
                        [vb.to_numpy(np.int64), vp.to_numpy(np.int64)]
                    )
                    if len(vb) + len(vp)
                    else np.zeros(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    agg = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["kind", "key"], {"n": "sum"}, bucket_key="key",
    ).materialize()  # consumed twice below; distinct-gram-sized

    def only(kind: str):
        import pyarrow.compute as pc

        return lambda t: t.filter(pc.equal(t["kind"], kind)).drop_columns("kind")

    bigrams = (
        agg.map_batches(only("b"), batch_format="pyarrow")
        .sort(["n", "key"], descending=[True, False])
        .limit(top_bigrams)
        .to_pandas()
    )
    prefixes = agg.map_batches(only("p"), batch_format="pyarrow").to_pandas()
    for df in (bigrams, prefixes):
        df["n"] = df["n"].astype("int64")
    return bigrams, prefixes


def lm_score(
    ds,
    model: tuple[pd.DataFrame, pd.DataFrame] | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_bigrams: int = 50_000,
):
    """Corpus-trained bigram-LM quality score per document, integer
    exact: each adjacent-token bigram scores
    ``floor(1e6 * C(w1 w2) / C(w1 ·))`` (its conditional probability in
    parts-per-million under the corpus model; bigrams outside the
    top-N model score 0) and a document scores the floor-mean of its
    bigram scores. This is the train-on-corpus -> broadcast -> score
    shape of perplexity-style quality filters (KenLM et al.) with
    exact arithmetic so the DuckDB oracle can verify it to the bit.

    The model tables ride ``ray.put`` once and are fetched once per
    actor; scoring is one vectorized pass per batch (findall/explode/
    hash-map/level-groupby - no Python per row). Returns a Dataset of
    (id, n_bigrams, score_ppm)."""
    import ray

    if model is None:
        model = bigram_model(ds, text_col=text_col, top_bigrams=top_bigrams)
    big_df, pre_df = model
    ref = ray.put(
        (
            dict(zip(big_df["key"], big_df["n"].astype(int))),
            dict(zip(pre_df["key"], pre_df["n"].astype(int))),
        )
    )

    class Score:
        def __init__(self):
            self.big, self.pre = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            doc, w1, big = _batch_bigrams(b, text_col)
            bn = big.map(self.big).fillna(0).to_numpy(np.int64)
            pn = (
                pd.Series(w1, dtype=object)
                .map(self.pre)
                .fillna(1)
                .to_numpy(np.int64)
            )
            ppm = (bn * 1_000_000) // np.maximum(pn, 1)
            per = (
                pd.DataFrame({"d": doc, "ppm": ppm})
                .groupby("d")
                .agg(n=("ppm", "size"), tot=("ppm", "sum"))
            )
            n = per["n"].reindex(b.index, fill_value=0).to_numpy(np.int64)
            tot = per["tot"].reindex(b.index, fill_value=0).to_numpy(np.int64)
            return pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(),
                    "n_bigrams": n,
                    "score_ppm": tot // np.maximum(n, 1),
                }
            )

    return ds.map_batches(Score, batch_format="pandas", concurrency=(1, 8))


def inverted_index(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 100,
    num_buckets: int | None = None,
):
    """Posting-list inverted index over the corpus: one row per term
    with its document frequency and the sorted doc-id posting list
    (comma-joined string — the exact-match search / contamination-
    lookup structure). ``min_df`` drops the long tail so the index
    holds the terms worth serving.

    Scale shape: per-batch DISTINCT (term, doc) pairs (explode +
    drop_duplicates, C-level) -> ONE shuffle bucketed by term (a term's
    pairs co-locate; ~2 buckets/CPU) -> per bucket: global df via one
    value_counts, tail-filter FIRST (the df >= min_df head is orders
    of magnitude smaller than the vocabulary), then one sorted join
    per surviving term. Postings never hit the driver; returns a
    Dataset of (term, df, postings) — write_parquet it for a sharded
    on-disk index."""
    from .windows import _buckets_for_cluster, _key_buckets

    nb = num_buckets or _buckets_for_cluster()

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.findall(r"[a-z0-9]+")
        ex = toks.explode().dropna()
        out = pd.DataFrame(
            {"term": ex.to_numpy(), id_col: b[id_col].reindex(ex.index).to_numpy()}
        ).drop_duplicates()
        out["_tb"] = _key_buckets(out["term"], nb)
        return out

    def build(g: pd.DataFrame) -> pd.DataFrame:
        df_counts = g["term"].value_counts()
        keep = df_counts[df_counts >= min_df]
        if not len(keep):
            return pd.DataFrame(
                {
                    "term": pd.Series(dtype=object),
                    "df": pd.Series(dtype="int64"),
                    "postings": pd.Series(dtype=object),
                }
            )
        g = g[g["term"].isin(keep.index)]
        g = g.sort_values(["term", id_col], kind="mergesort")
        g["_s"] = g[id_col].astype(str)
        postings = g.groupby("term", sort=True)["_s"].agg(",".join)
        return pd.DataFrame(
            {
                "term": postings.index,
                "df": keep.sort_index().to_numpy(dtype=np.int64),
                "postings": postings.to_numpy(),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("_tb")
        .map_groups(build, batch_format="pandas")
    )


# RE2-compatible (no lookaround/backrefs) so the DuckDB oracle can
# mirror the exact replacements; applied strictly in this order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


class PIIRedactor:
    """Regex PII redaction (emails, phone-like numbers, IPv4 literals):
    patterns compiled once per actor, replacements applied in
    ``PII_PATTERNS`` order with per-row hit counts. Adds
    ``text_redacted`` and ``pii_hits``."""

    def __init__(self, text_col: str = "text"):
        import re

        self.col = text_col
        self.pats = [(re.compile(p), repl) for _, p, repl in PII_PATTERNS]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.col].fillna("")
        hits = pd.Series(0, index=batch.index, dtype="int64")
        for pat, repl in self.pats:
            hits = hits + s.str.count(pat).astype("int64")
            s = s.str.replace(pat, repl, regex=True)
        batch["text_redacted"] = s
        batch["pii_hits"] = hits
        return batch


class TextCleaner:
    """Whitespace normalization: collapse every whitespace run to one
    space and strip the ends (the canonical pre-tokenization cleanup).
    Adds ``text_clean``."""

    def __init__(self, text_col: str = "text"):
        import re

        self.col = text_col
        self.ws = re.compile(r"\s+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.col].fillna("")
        batch["text_clean"] = s.str.replace(self.ws, " ", regex=True).str.strip()
        return batch


def pack_sequences(
    ds,
    *,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    max_tokens: int = 2048,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Sequence packing for training batches: greedy first-fit IN ID
    ORDER within each bucket - documents are assigned consecutive
    ``bin_id``s such that each bin's token sum stays <= max_tokens
    (oversized docs get a bin of their own). Returns (id, n_tokens,
    pack_bucket, bin_id, bin_tokens).

    Scale shape: docs are hash-bucketed (~2 buckets/CPU); each bucket
    packs ALL its docs with one numpy pass (sort + cumulative greedy
    scan). Bins never span buckets - the global result is a valid
    packing, just not the single-stream greedy order (documented
    partitioning assumption; at 100 TB a global greedy stream is the
    bottleneck you must not want)."""
    import ray.data as rd  # noqa: F401  (type only)

    from .windows import _buckets_for_cluster, _key_buckets

    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, token_col]].copy()
        b["pack_bucket"] = _key_buckets(b[id_col], num_buckets)
        return b

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = g[token_col].to_numpy(dtype=np.int64)
        n = len(toks)
        bins = np.empty(n, dtype=np.int64)
        cur_bin, cur_sum = 0, 0
        # greedy first-fit in order: one tight C-speed-ish loop per
        # BUCKET (not per doc across the cluster); numpy can't express
        # the running reset, so this is the one sanctioned Python loop
        for i in range(n):
            t = int(toks[i])
            if cur_sum > 0 and cur_sum + t > max_tokens:
                cur_bin += 1
                cur_sum = 0
            bins[i] = cur_bin
            cur_sum += t
        g["bin_id"] = bins
        sums = g.groupby("bin_id")[token_col].transform("sum")
        g["bin_tokens"] = sums.astype("int64")
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("pack_bucket")
        .map_groups(pack_bucket, batch_format="pandas")
    )


def tfidf_topk_terms(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_vocab: int | None = None,
) -> pd.DataFrame:
    """TF-IDF-style keyword extraction: top-k terms per document by
    tf/df (integer-exact score ``tf * 1e6 // df`` - monotone in the
    classic tf*idf for a fixed corpus, hash-verifiable in SQL).

    Two passes: (1) document frequency per term via per-batch
    (doc-distinct term) partials and a groupby-sum; the df table rides
    to pass 2 as ONE broadcast object (``ray.put``), read once per
    actor - at web scale cap it with ``max_vocab`` (keep the most
    frequent terms; terms pruned from the map are scored at the df=1
    upper bound, so rare terms still rank first - their score is
    approximate only between df=1 and the pruning threshold). (2) per-batch
    term counts -> score -> local per-doc top-k, all C-level pandas.
    No shuffle touches (doc, term) pairs; only the df aggregation
    shuffles distinct terms."""
    import ray
    from ray.data.aggregate import Sum

    def df_partial(b: pd.DataFrame) -> pa.Table:
        toks = b[text_col].fillna("").str.lower().str.findall(r"[a-z0-9]+")
        pairs = toks.explode().dropna()
        # distinct per doc first: df counts documents, not occurrences
        u = pd.DataFrame({"d": pairs.index, "t": pairs.to_numpy()}).drop_duplicates()
        vc = u["t"].value_counts()
        return pa.table(
            {
                "term": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "df": pa.array(vc.to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    df_ds = bucketed_agg(
        ds.map_batches(df_partial, batch_format="pandas"),
        "term", {"df": "sum"},
    )
    if max_vocab is not None:
        df_ds = df_ds.sort("df", descending=True).limit(max_vocab)
    df_tbl = df_ds.to_pandas()
    df_ref = ray.put(dict(zip(df_tbl["term"], df_tbl["df"].astype(np.int64))))

    class ScoreTopK:
        def __init__(self):
            self.df = ray.get(df_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            toks = b.set_index(id_col)[text_col].fillna("").str.lower().str.findall(
                r"[a-z0-9]+"
            )
            pairs = toks.explode().dropna()
            tf = (
                pd.DataFrame({id_col: pairs.index, "term": pairs.to_numpy()})
                .groupby([id_col, "term"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            # terms pruned from a capped df map are RARE - score them
            # at the df=1 upper bound (keeps tf/df's rare-terms-first
            # ranking; without max_vocab the map is complete and this
            # fillna never fires)
            dfv = tf["term"].map(self.df).fillna(1)
            tf = tf.copy()
            tf["score"] = (tf["tf"].astype(np.int64) * 1_000_000) // dfv.astype(
                np.int64
            )
            tf = tf.sort_values(
                [id_col, "score", "term"], ascending=[True, False, True],
                kind="mergesort",
            )
            top = tf.groupby(id_col, sort=False).head(k).copy()
            top["rank"] = top.groupby(id_col, sort=False).cumcount() + 1
            return top[[id_col, "rank", "term", "score"]]

    out = ds.map_batches(
        ScoreTopK, batch_format="pandas", concurrency=(1, 4), num_cpus=1
    ).to_pandas()
    out = out.sort_values([id_col, "rank"]).reset_index(drop=True)
    for c in ("rank", "score"):
        out[c] = out[c].astype("int64")
    return out


class DocumentChunker:
    """RAG/embedding prep: split each document into token-window chunks
    of ``size`` tokens with ``overlap`` tokens of context between
    consecutive chunks (stride = size - overlap). Tokens are lowercase
    ``[a-z0-9]+`` runs and chunk text is the space-join of its tokens —
    deterministic and SQL-mirrorable (``list_slice`` on
    ``regexp_extract_all``). Every doc emits >= 1 chunk (token-free
    docs emit one empty chunk); the last chunk may be short but no
    chunk starts past the end: n_chunks = max(ceil((n-overlap)/stride), 1).

    Emits (id, chunk_idx, chunk_text, n_tokens). The per-doc chunk loop
    slices a prebuilt token list (the same cost class as
    ``Fingerprinter``); regex work is vectorized pandas."""

    def __init__(self, size: int = 128, overlap: int = 32,
                 text_col: str = "text", id_col: str = "doc_id"):
        assert 0 <= overlap < size
        self.size, self.overlap = size, overlap
        self.stride = size - overlap
        self.col, self.id_col = text_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.col].fillna("").str.lower().str.findall(r"[a-z0-9]+")
        ids_out, idxs, texts, ns = [], [], [], []
        for did, tk in zip(batch[self.id_col], toks):
            n = len(tk)
            n_chunks = max(-(-(n - self.overlap) // self.stride), 1)
            for ci in range(n_chunks):
                piece = tk[ci * self.stride : ci * self.stride + self.size]
                ids_out.append(did)
                idxs.append(ci)
                texts.append(" ".join(piece))
                ns.append(len(piece))
        return pd.DataFrame(
            {
                self.id_col: pd.Series(ids_out, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "chunk_text": texts,
                "n_tokens": pd.Series(ns, dtype="int64"),
            }
        )


class UnicodeNormalizer:
    """Unicode canonicalization before hashing/dedup: decompose (NFD),
    strip combining diacritics (the ``strip_accents`` of utf8proc /
    DuckDB — base characters survive, 'é'→'e', 'ß' kept), and
    optionally casefold to lower. Adds ``text_norm``. Two corpora that
    differ only in accent encoding or case then dedup together."""

    def __init__(self, text_col: str = "text", lowercase: bool = True):
        import re

        self.col = text_col
        self.lower = lowercase
        # the Combining Diacritical Marks block covers Latin accents
        self.marks = re.compile(r"[̀-ͯ]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.col].fillna("").str.normalize("NFD").str.replace(
            self.marks, "", regex=True
        )
        batch["text_norm"] = s.str.lower() if self.lower else s
        return batch


class UrlCanonicalizer:
    """URL canonicalization + host/domain extraction (the C4-style
    web-preprocessing step before URL dedup and domain filtering):
    drop the query string and fragment, lowercase the ``scheme://host``
    prefix (path case is preserved), strip trailing slashes; derive
    ``host`` (port stripped) and a last-two-label registrable
    ``domain`` (a public-suffix list refines this in production; the
    heuristic is deliberately SQL-mirrorable so the oracle verifies it
    exactly). Regexes compiled once per actor. Adds ``canon_url``,
    ``host``, ``domain``."""

    def __init__(self, url_col: str = "url"):
        import re

        self.col = url_col
        self.strip = re.compile(r"[#?].*$", re.S)
        self.head = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)(.*)$", re.S)
        self.scheme = re.compile(r"^[a-z][a-z0-9+.\-]*://")
        self.port = re.compile(r":[0-9]+$")
        self.dom = re.compile(r"([^.]+\.[^.]+)$")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.col].fillna("").str.replace(self.strip, "", regex=True)
        parts = s.str.extract(self.head)
        prefix = parts[0].fillna("").str.lower()
        rest = parts[1].fillna("").str.rstrip("/")
        batch["canon_url"] = prefix + rest
        host = prefix.str.replace(self.scheme, "", regex=True).str.replace(
            self.port, "", regex=True
        )
        batch["host"] = host
        dom = host.str.extract(self.dom)[0]
        batch["domain"] = dom.where(dom.notna() & (dom != ""), host)
        return batch


def filter_blocked_domains(ds, blocklist, domain_col: str = "domain",
                           concurrency=(1, 8)):
    """Drop rows whose registrable domain is on a blocklist (C4-style
    web filtering). The blocklist is ``ray.put`` once and loaded per
    actor in ``__init__`` — the corpus streams through map-side, no
    shuffle. Run ``UrlCanonicalizer`` first to attach ``domain``."""
    import ray

    ref = ray.put(frozenset(d.lower() for d in blocklist))

    class BlockFilter:
        def __init__(self):
            self.blocked = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch[~batch[domain_col].isin(self.blocked)]

    return ds.map_batches(BlockFilter, batch_format="pandas",
                          concurrency=concurrency)


class CompressionScorer:
    """Compression-ratio quality signal (Gopher-style): highly
    compressible text is repetitive/templated/low-entropy; barely
    compressible text is often binary junk or hash soup. Emits
    ``compress_permille`` = floor(1000 * len(zlib(text)) / len(text))
    (small = repetitive) and ``entropy_centibits`` = floor(100 x
    Shannon entropy of the byte distribution). Deterministic (zlib
    level pinned), batched, C-level per doc - but zlib has no SQL
    analogue, so the oracle check is rows-only and the pytest pins
    known-repetitive vs known-random inputs.

    Stateless per batch; an actor pool is still used so the zlib
    dictionary warmup and numpy buffers amortize per actor."""

    def __init__(self, level: int = 6):
        import zlib

        self.zlib = zlib
        self.level = level

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].fillna("")
        comp = np.empty(len(texts), dtype=np.int64)
        ent = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):  # zlib is per-doc by nature; the
            raw = t.encode("utf-8")    # compression dominates, not the loop
            if not raw:
                comp[i] = 1000
                ent[i] = 0
                continue
            comp[i] = 1000 * len(self.zlib.compress(raw, self.level)) // len(raw)
            counts = np.bincount(np.frombuffer(raw, dtype=np.uint8), minlength=256)
            p = counts[counts > 0] / len(raw)
            ent[i] = int(100 * float(-(p * np.log2(p)).sum()))
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "compress_permille": comp,
                "entropy_centibits": ent,
            }
        )


class JsonFieldExtractor:
    """Flatten scalar fields out of a JSON-string column into typed
    columns — the semi-structured → columnar step (Athena/Glue expose
    it as ``json_extract``; the reference's transform normalizes raw
    JSON events the same way, lambdas/transform/app.py).

    ``fields`` maps output column -> dotted path ("a.b.c"); values
    resolve to None when the path (or parse) fails, so malformed rows
    degrade instead of erroring — pair with the quarantine machinery
    when strictness matters. JSON parsing is inherently per-record;
    the parse runs once per row inside the batch (stdlib ``json``,
    compiled C scanner) and column assembly is vectorized. Stateless
    per batch, so it runs in a plain task pool; instantiate via
    ``fn_constructor_kwargs`` if used as an actor class.
    """

    def __init__(self, fields: dict[str, str], json_col: str = "props"):
        self.json_col = json_col
        self.paths = {out: path.split(".") for out, path in fields.items()}

    def _resolve(self, obj, path):
        for p in path:
            if not isinstance(obj, dict):
                return None
            obj = obj.get(p)
        return None if isinstance(obj, (dict, list)) else obj

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        parsed = []
        for s in b[self.json_col]:
            try:
                parsed.append(_json.loads(s) if s else None)
            except (TypeError, ValueError):
                parsed.append(None)
        out = b.drop(columns=[self.json_col]).copy()
        for col, path in self.paths.items():
            out[col] = [self._resolve(o, path) for o in parsed]
        return out


def bm25_scores(
    ds,
    *,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 ranked retrieval (Robertson/Sparck Jones, the Okapi
    formula with the +1 idf floor) for a FIXED query over the corpus —
    the classic lexical ranking to pair with the ANN cosine retrieval.

    Two streaming passes, the corpus never shuffles:
      1. stats — per-batch tagged partials (doc count, Σdl, per-term
         document frequencies) and one tiny groupby-sum;
      2. score — idf/avgdl broadcast as plain floats; per-batch
         vectorized token counts (explode → C-level unstack) and ONE
         fixed left-associative expression per query term, so a SQL
         mirror evaluating the same tree hash-matches after microbit
         flooring. Docs matching no query term drop out (their score
         is exactly 0.0).

    Tokenization matches ``term_frequencies`` ([a-z0-9]+ on lower).
    Returns (id, dl, score_ub) with score_ub = floor(score · 2^20).
    """
    from ray.data.aggregate import Sum

    terms = list(query_terms)

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(r"[a-z0-9]+")
        dl = toks.str.len().astype("int64")
        ex = toks.explode().dropna()
        u = pd.DataFrame({"d": ex.index, "t": ex.to_numpy()}).drop_duplicates()
        vc = u["t"].value_counts()
        rows = [("_ndocs", len(batch)), ("_sumdl", int(dl.sum()))]
        rows += [(f"df:{t}", int(vc.get(t, 0))) for t in terms]
        return pd.DataFrame(rows, columns=["k", "n"])

    stats = (
        ds.map_batches(stats_partial, batch_format="pandas")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    sm = dict(zip(stats["k"], stats["n"].astype(np.int64)))
    nf = float(sm["_ndocs"])
    avgdl = float(sm["_sumdl"]) / nf
    k1 = float(k1)
    b = float(b)
    idf = {
        t: float(
            np.log((nf - float(sm.get(f"df:{t}", 0)) + 0.5)
                   / (float(sm.get(f"df:{t}", 0)) + 0.5) + 1.0)
        )
        for t in terms
    }

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = (
            batch.set_index(id_col)[text_col]
            .fillna("")
            .str.lower()
            .str.findall(r"[a-z0-9]+")
        )
        n = len(batch)
        dl = toks.str.len().to_numpy(dtype=np.float64)
        ex = toks.explode().dropna()
        ex = ex[ex.isin(terms)]
        tfm = (
            pd.DataFrame({"d": ex.index, "t": ex.to_numpy()})
            .groupby(["d", "t"], sort=False)
            .size()
            .unstack(fill_value=0)
            if len(ex)
            else pd.DataFrame()
        )
        denom_norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(n, dtype=np.float64)
        for t in terms:  # fixed left-associative order, mirrored in SQL
            if t in getattr(tfm, "columns", ()):
                tf = tfm[t].reindex(toks.index, fill_value=0).to_numpy(
                    dtype=np.float64
                )
            else:
                tf = np.zeros(n, dtype=np.float64)
            s = s + idf[t] * (tf * (k1 + 1.0)) / (tf + denom_norm)
        out = pd.DataFrame(
            {
                id_col: toks.index.to_numpy(),
                "dl": dl.astype(np.int64),
                "score_ub": np.floor(s * 1048576.0).astype(np.int64),
            }
        )
        return out[out["score_ub"] > 0]

    return ds.map_batches(score, batch_format="pandas")


def chunk_by_chars(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 512,
    overlap: int = 64,
):
    """Split documents into fixed-size overlapping character windows —
    the RAG / context-window chunking step. Chunk i covers
    ``[i·step, i·step + chunk_size)`` with ``step = chunk_size −
    overlap``; starts run while ``start < max(len, 1)``, so an empty
    document yields exactly one empty chunk (stable ids downstream).

    Fully vectorized, zero per-row Python: each batch decodes to ONE
    fixed-width char matrix, chunk membership is a repeat/arange
    explode, and every chunk is a 2-D ``take_along_axis`` gather with
    tail positions nulled (numpy U-strings terminate at the first
    null). Embarrassingly parallel — no shuffle; output is
    (id, chunk_idx, chunk_text). SQL mirror: ``generate_series`` +
    ``substr`` (character semantics, matching numpy's)."""
    assert 0 <= overlap < chunk_size
    step = chunk_size - overlap

    def chunk(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("")
        u = np.asarray(t.to_numpy(dtype=object), dtype="U")
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {id_col: b[id_col], "chunk_idx": np.zeros(0, np.int64),
                 "chunk_text": t}
            )
        width = max(u.dtype.itemsize // 4, 1)
        grid = u.view("U1").reshape(n, width)
        lens = t.str.len().to_numpy(dtype=np.int64)
        k = (np.maximum(lens, 1) - 1) // step + 1
        total = int(k.sum())
        rows = np.repeat(np.arange(n), k)
        j = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(k) - k, k
        )
        start = j * step
        cols = start[:, None] + np.arange(chunk_size, dtype=np.int64)[None, :]
        valid = cols < lens[rows][:, None]
        gathered = np.take_along_axis(
            grid[rows], np.minimum(cols, width - 1), axis=1
        )
        chars = np.where(valid, gathered, "")
        texts = np.ascontiguousarray(chars).view(f"U{chunk_size}").ravel()
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[rows],
                "chunk_idx": j,
                "chunk_text": texts.astype(object),
            }
        )

    return ds.map_batches(chunk, batch_format="pandas")


#: RE2-compatible sentence pattern (no lookbehind): a run of
#: non-terminators followed by terminator punctuation. A trailing
#: fragment without terminal punctuation is dropped - identically in
#: Python and DuckDB, so the oracle mirrors exactly.
SENTENCE_RE = r"[^.!?]+[.!?]+"


def chunk_by_sentences(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_sentences: int = 3,
    overlap: int = 0,
):
    """Sentence-boundary chunking - the third chunking mode beside the
    token-window (``chunk_documents``) and char-window
    (``chunk_by_chars``) splitters: sentences are extracted with ONE
    vectorized ``str.findall`` of ``SENTENCE_RE`` per batch, then
    grouped into windows of ``max_sentences`` with ``overlap``
    sentences of context carried between consecutive chunks: window
    membership is repeat/arange bookkeeping, and each window joins its
    ≤ ``max_sentences`` strings with one C-level ``str.join``
    (per-window, bounded - never per character). Documents with no
    complete sentence yield no chunks. Returns (id, chunk_idx,
    n_sentences, chunk_text)."""
    assert 0 <= overlap < max_sentences, (overlap, max_sentences)
    step = max_sentences - overlap

    def chunk(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("")
        sents = t.str.findall(SENTENCE_RE)
        counts = sents.str.len().to_numpy(dtype=np.int64)
        flat = [s for row in sents for s in row]
        if not flat:
            return pd.DataFrame(
                {id_col: b[id_col].iloc[0:0], "chunk_idx": [],
                 "n_sentences": [], "chunk_text": []}
            )
        # windows per doc: ceil(max(c - overlap, 0) / step), min 1 when
        # the doc has any sentence
        k = np.where(counts > 0, (np.maximum(counts - overlap, 1) - 1) // step + 1, 0)
        rows = np.repeat(np.arange(len(b)), k)
        total = int(k.sum())
        j = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(k) - k, k)
        starts = j * step
        # gather each window's sentences from the flat list
        offsets = np.cumsum(counts) - counts
        texts = []
        nsent = []
        for r, s in zip(rows, starts):
            lo = offsets[r] + s
            hi = min(offsets[r] + counts[r], lo + max_sentences)
            seg = flat[lo:hi]
            texts.append("".join(seg))
            nsent.append(len(seg))
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[rows],
                "chunk_idx": j,
                "n_sentences": np.array(nsent, np.int64),
                "chunk_text": texts,
            }
        )

    return ds.map_batches(chunk, batch_format="pandas")


def fix_mojibake(
    ds,
    *,
    text_col: str = "text",
    out_col: str | None = None,
    flag_col: str = "had_mojibake",
):
    """Repair the dominant real-world mojibake class: UTF-8 bytes that
    were decoded as Latin-1/cp1252 ("Ã©" for "é", "â€™" for "'") -
    the ftfy-style web-corpus cleanup, library-free. Detection is ONE
    vectorized regex over the Latin-1-range lead bytes (Â/Ã/â/å...);
    only flagged rows (rare in practice) take the per-row
    re-encode/decode repair, applied repeatedly for doubly-encoded
    text and rolled back unless it strictly removes mojibake markers.
    Adds ``flag_col``; rewrites ``text_col`` (or ``out_col``)."""
    import re

    marker = re.compile("[ÂÃâÅå][-ÿ]")
    dst = out_col or text_col

    def fix_one(s: str) -> str:
        for _ in range(3):  # handles double/triple encoding
            try:
                cand = s.encode("latin-1").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return s
            if len(marker.findall(cand)) < len(marker.findall(s)):
                s = cand
            else:
                return s
        return s

    def run(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col]
        flagged = t.str.contains(marker, na=False)
        out = t.copy()
        if flagged.any():
            out.loc[flagged] = [fix_one(s) for s in t[flagged]]
        b = b.copy()
        b[dst] = out
        b[flag_col] = flagged.to_numpy()
        return b

    return ds.map_batches(run, batch_format="pandas")


class HtmlStripper:
    """C4-style HTML boilerplate removal as an actor-pool stage:
    drop <script>/<style> blocks and comments, strip all tags, decode
    the common entities, collapse whitespace. Regexes compile once per
    actor; every pass is one vectorized pandas ``str.replace``. Each
    step has an exact DuckDB ``regexp_replace``/``replace`` mirror
    (RE2 and Python agree on these patterns), so the oracle verifies
    the transform bit-for-bit."""

    #: (pattern, replacement, regex?) applied in order; SQL mirrors
    #: must apply the same order
    STEPS = (
        (r"(?is)<script[^>]*>.*?</script>", " ", True),
        (r"(?is)<style[^>]*>.*?</style>", " ", True),
        (r"(?s)<!--.*?-->", " ", True),
        (r"(?s)<[^>]+>", " ", True),
        ("&nbsp;", " ", False),
        ("&amp;", "&", False),
        ("&lt;", "<", False),
        ("&gt;", ">", False),
        ("&quot;", '"', False),
        ("&#39;", "'", False),
    )

    def __init__(self, text_col: str = "text", out_col: str = "clean"):
        import re

        self.col = text_col
        self.out = out_col
        self.steps = [
            ((re.compile(p) if is_re else p), r, is_re)
            for p, r, is_re in self.STEPS
        ]

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        s = b[self.col].fillna("")
        for pat, rep, is_re in self.steps:
            s = s.str.replace(pat, rep, regex=is_re)
        s = s.str.replace(r"\s+", " ", regex=True).str.strip()
        b = b.copy()
        b[self.out] = s
        return b


def novelty_scores(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
):
    """Cross-corpus n-gram novelty per document: the fraction (per
    mille) of a doc's DISTINCT word n-grams that occur in no other
    document — the "how much of this is boilerplate that exists
    elsewhere" curation signal (complement of Lee et al.'s duplicate-
    text fraction, arXiv:2107.06499).

    Shape: per-batch distinct (gram-hash, doc) pairs (grams live as
    64-bit hashes — a cross-doc collision needs 2^-64 odds; exchanges
    never carry gram STRINGS), one groupby-count for global df, ONE
    bucketed hash_join of df back onto the pairs, per-doc partials,
    tiny groupby-sum. Docs with fewer than n tokens have no grams and
    drop out (mirror filters identically). Returns a Dataset
    (id, n_grams, novelty_pm)."""
    from ray.data.aggregate import Sum as _Sum

    from ..schema import hash_strings
    from .joins import hash_join

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks = b.set_index(id_col)[text_col].fillna("").str.lower().str.findall(
            r"[a-z0-9]+"
        )
        ex = toks.explode().dropna()
        if not len(ex):
            return pd.DataFrame({"gh": pd.array([], dtype="int64"),
                                 id_col: pd.array([], dtype="int64")})
        d = pd.DataFrame({id_col: ex.index, "w": ex.to_numpy()})
        # n-gram join via shifted columns WITHIN each doc
        parts = [d["w"].groupby(d[id_col]).shift(-k) for k in range(n)]
        same_doc = parts[n - 1].notna()
        gram = parts[0].str.cat(parts[1:], sep=" ")
        g = pd.DataFrame(
            {id_col: d[id_col][same_doc], "g": gram[same_doc]}
        ).drop_duplicates()
        gh = hash_strings(g["g"].to_numpy()).view(np.int64)
        return pd.DataFrame({"gh": gh, id_col: g[id_col].to_numpy()}
                            ).drop_duplicates()

    pair_ds = ds.map_batches(pairs, batch_format="pandas")
    # global dedup across batches, then df per gram
    deduped = bucketed_distinct(pair_ds, ["gh", id_col]).materialize()

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["gh"].value_counts()
        return pd.DataFrame({"gh": vc.index.to_numpy(),
                             "df": vc.to_numpy(np.int64)})

    dfreq = bucketed_agg(
        deduped.map_batches(df_partial, batch_format="pandas"),
        "gh", {"df": "sum"},
    )
    joined = hash_join(deduped, dfreq, on="gh")

    def doc_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(_u=(b["df"] == 1).astype(np.int64))
        g = b.groupby(id_col, sort=False).agg(
            n_grams=("df", "size"), uniq=("_u", "sum")
        )
        return g.reset_index()

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        ng = b["n_grams"].to_numpy(dtype=np.int64)
        uq = b["uniq"].to_numpy(dtype=np.float64)
        pm = np.floor(1000.0 * uq / ng.astype(np.float64)).astype(np.int64)
        return pd.DataFrame(
            {id_col: b[id_col], "n_grams": ng, "novelty_pm": pm}
        )

    return bucketed_agg(
        joined.map_batches(doc_partial, batch_format="pandas"),
        id_col, {"n_grams": "sum", "uniq": "sum"},
    ).map_batches(finish, batch_format="pandas")


class Pseudonymizer:
    """Keyed pseudonymization of identifier columns: every value in
    ``id_cols`` becomes ``md5(key || sep || value)`` hex — deterministic
    (the same conv/user id maps to the same token in every table and
    every run, so joins and groupbys still line up) but irreversible
    without the key: the de-identification step transcripts need before
    leaving the trust boundary. Complements ``pipelines/forget``
    (deletion erases; this retains structure). Nulls stay null.
    Stateless per-batch map — no shuffle; the per-value cost is
    C-level md5, the same work the SQL mirror's own ``md5()`` does."""

    def __init__(self, id_cols, key: str, sep: str = "|"):
        self.cols = list(id_cols)
        self.prefix = (key + sep).encode("utf-8")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pre = self.prefix
        for c in self.cols:
            batch[c] = [
                None if pd.isna(v)
                else hashlib.md5(pre + str(v).encode("utf-8")).hexdigest()
                for v in batch[c]
            ]
        return batch


def pseudonymize(ds, id_cols, key: str, sep: str = "|"):
    """Dataset-level wrapper over ``Pseudonymizer`` (see it for
    semantics)."""
    import ray.data as rd  # noqa: F401  (symmetry with siblings)

    return ds.map_batches(
        Pseudonymizer(id_cols, key, sep), batch_format="pandas"
    )


def distinct_ngram_stats(
    ds,
    text_col: str = "text",
    ns: tuple = (1, 2, 3),
    num_buckets: int | None = None,
):
    """Corpus diversity by distinct-n (Li et al. 2016's distinct-1/2
    generalized): per n, the total n-gram occurrences, the number of
    DISTINCT n-grams, and their ratio — the mode-collapse / template
    -saturation signal for generated corpora (a corpus of paraphrased
    boilerplate scores near 0, natural text much higher).

    Tokens are whitespace runs (``\\S+``, case-preserved — shared
    verbatim with the SQL mirror); a row shorter than n tokens
    contributes nothing. Scale shape: vectorized explode + shifted
    window build per batch, map-side (gram, count) partials, ONE
    gram-bucketed bounded shuffle per n (the shuffle carries distinct
    grams, never occurrences), per-bucket scalar partials only to the
    driver; ratio is one float division of exact ints."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from .windows import bucketed_agg

    rows = []
    for n in ns:
        def partial(b: pd.DataFrame, n=n) -> pd.DataFrame:
            toks = b[text_col].fillna("").str.findall(r"\S+")
            ex = toks.explode().dropna()
            if len(ex) < n:
                return pd.DataFrame({"gram": pd.Series([], dtype=object),
                                     "cnt": pd.Series([], dtype="int64")})
            doc = ex.index.to_numpy()
            tok = ex.to_numpy(dtype=object)
            w = len(tok) - n + 1
            same = np.ones(w, dtype=bool)
            for i in range(1, n):
                same &= doc[i:w + i] == doc[:w]
            if not same.any():
                return pd.DataFrame({"gram": pd.Series([], dtype=object),
                                     "cnt": pd.Series([], dtype="int64")})
            gram = pd.Series(tok[:w][same], dtype=object)
            for i in range(1, n):
                gram = gram + " " + pd.Series(tok[i:w + i][same], dtype=object)
            out = gram.value_counts()
            return pd.DataFrame(
                {"gram": out.index.to_numpy(dtype=object),
                 "cnt": out.to_numpy(dtype="int64")}
            )

        agg = bucketed_agg(
            ds.map_batches(partial, batch_format="pandas"),
            ["gram"],
            {"cnt": "sum"},
            nb=num_buckets,
            bucket_key="gram",
        )

        def scalars(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"distinct": [len(b)], "total": [int(b["cnt"].sum())]}
            )

        distinct = total = 0
        for b in agg.map_batches(
            scalars, batch_format="pandas"
        ).iter_batches(batch_format="pandas", batch_size=4096):
            distinct += int(b["distinct"].sum())
            total += int(b["total"].sum())
        rows.append(
            (int(n), total, distinct,
             (float(distinct) / float(total)) if total else 0.0)
        )
    return pa.table(
        {
            "n": pa.array([r[0] for r in rows], pa.int64()),
            "total_ngrams": pa.array([r[1] for r in rows], pa.int64()),
            "distinct_ngrams": pa.array([r[2] for r in rows], pa.int64()),
            "distinct_ratio": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
