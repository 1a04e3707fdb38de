"""Fuzzy string matching: all pairs within Levenshtein distance 1.

SymSpell-style deletion-neighborhood blocking (Garbe's symmetric
delete algorithm, public domain): every edit-distance-≤1 pair shares
at least one single-deletion variant (deletion → the shorter string
itself; insertion → symmetric; substitution → both sides delete the
differing position), so hashing each string plus its |s| deletion
variants and grouping by variant hash yields a complete candidate set
— no quadratic all-pairs scan. Shared variants can also arise at
distance 2 (e.g. transpositions), so candidates are verified.

Scale shape, all vectorized (no per-row Python in either phase):
  1. variant emission — each batch encodes its strings into ONE
     fixed-width byte matrix; each deletion position is one
     column-drop + masked polynomial rehash over the matrix (O(max_len)
     vectorized ops per batch, not O(rows·len) Python). The exchange
     carries (variant_hash, id, text): text rides along (|s|+1)-fold
     so verification needs no second join — sized for short keys
     (names, titles, codes); for long strings near-dedup via MinHash
     is the right tool instead.
  2. ONE hash-bucketed shuffle groups equal variants; each bucket
     self-merges to candidate pairs, dedups, and verifies with a
     fixed-width matrix comparison: equal length → mismatch count ≤ 1;
     length ±1 → delete-at-first-mismatch gather + row equality.
  3. pairs found via several shared variants dedup globally with a
     tiny groupby-min over (id_a, id_b).

Reference parity: the reference dedupes records only on exact ids
(lambdas/shared/schemas.py); fuzzy keys are an addition for
training-data curation (near-identical titles/names).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd
from ray.data.aggregate import Min

_P = np.uint64(1099511628211)  # FNV-ish odd multiplier, wraps mod 2^64


def _byte_matrix(strings: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode an object array of strings into a null-padded uint8
    matrix plus per-row byte lengths (one C-level astype, no loop)."""
    # vectorized utf-8 encode -> fixed-width, null-padded bytes
    s = np.char.encode(np.asarray(strings, dtype="U"), "utf-8")
    width = s.dtype.itemsize
    mat = s.view(np.uint8).reshape(len(s), width)
    lens = (mat != 0).sum(axis=1).astype(np.int64)
    return mat, lens


def _poly_hash(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Width-independent rolling hash: h = ((h·P + c) per in-range
    column) then mix in the length — identical for equal strings no
    matter how each batch padded them."""
    n, width = mat.shape
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(width):
            active = i < lens
            h = np.where(active, h * _P + mat[:, i].astype(np.uint64), h)
        h = h * _P + lens.astype(np.uint64)
    return h


def _variant_frame(b: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    """(variant_hash, id, text) for every string and every
    single-deletion variant, via one column-drop rehash per position."""
    ids = b[id_col].to_numpy()
    texts = b[text_col].fillna("").to_numpy(dtype=object)
    mat, lens = _byte_matrix(texts)
    n, width = mat.shape
    out_h = [_poly_hash(mat, lens)]  # the string itself (deletion 0)
    out_rows = [np.arange(n)]
    for d in range(width):
        keep = d < lens  # deletion position must exist
        if not keep.any():
            break
        sub = np.concatenate([mat[:, :d], mat[:, d + 1:]], axis=1)
        h = _poly_hash(sub[keep], lens[keep] - 1)
        out_h.append(h)
        out_rows.append(np.flatnonzero(keep))
    rows = np.concatenate(out_rows)
    return pd.DataFrame(
        {
            # int64 view keeps Arrow/shuffle types simple
            "vh": np.concatenate(out_h).view(np.int64),
            "id": ids[rows],
            "s": texts[rows],
        }
    )


def _verify_ed1(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Levenshtein-≤1 check for paired object arrays:
    returns int64 distances with 2 meaning 'more than 1'."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    am, al = _byte_matrix(a)
    bm, bl = _byte_matrix(b)
    width = max(am.shape[1], bm.shape[1])
    if am.shape[1] < width:
        am = np.pad(am, ((0, 0), (0, width - am.shape[1])))
    if bm.shape[1] < width:
        bm = np.pad(bm, ((0, 0), (0, width - bm.shape[1])))
    dist = np.full(n, 2, dtype=np.int64)
    ldiff = al - bl
    eq = am == bm
    same_len = ldiff == 0
    if same_len.any():
        mism = (~eq[same_len]).sum(axis=1)
        d = np.where(mism == 0, 0, np.where(mism == 1, 1, 2))
        dist[same_len] = d
    for sign in (1, -1):
        sel = ldiff == sign
        if not sel.any():
            continue
        longer = am[sel] if sign == 1 else bm[sel]
        shorter = bm[sel] if sign == 1 else am[sel]
        short_len = np.minimum(al[sel], bl[sel])
        # first mismatch position (or short_len if prefixes agree)
        neq = longer != shorter
        any_neq = neq.any(axis=1)
        p = np.where(any_neq, neq.argmax(axis=1), short_len)
        p = np.minimum(p, short_len)  # mismatch past the short end
        # delete longer[p]: gather columns skipping p, compare rows
        cols = np.arange(width - 1)
        idx = cols[None, :] + (cols[None, :] >= p[:, None])
        deleted = np.take_along_axis(longer, idx, axis=1)
        ok = (deleted == shorter[:, : width - 1]).all(axis=1)
        dist[sel] = np.where(ok, 1, 2)
    return dist


def fuzzy_pairs_ed1(
    ds: rd.Dataset,
    *,
    id_col: str,
    text_col: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """All unordered id pairs whose strings are within Levenshtein
    distance 1 (0 = exact duplicates), as (id_a, id_b, dist)."""
    from .windows import _buckets_for_cluster

    if num_buckets is None:
        num_buckets = _buckets_for_cluster()

    def variants(b: pd.DataFrame) -> pd.DataFrame:
        v = _variant_frame(b, id_col, text_col)
        v["_fb"] = (v["vh"].to_numpy().view(np.uint64)
                    % np.uint64(num_buckets)).astype(np.int64)
        return v

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_fb").drop_duplicates(["vh", "id"])
        m = g.merge(g, on="vh", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        m = m.drop_duplicates(["id_a", "id_b"])
        if not len(m):
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "dist": []}
            ).astype({"id_a": "int64", "id_b": "int64", "dist": "int64"})
        d = _verify_ed1(
            m["s_a"].to_numpy(dtype=object), m["s_b"].to_numpy(dtype=object)
        )
        m = m.assign(dist=d)
        m = m[m["dist"] <= 1]
        return m[["id_a", "id_b", "dist"]].reset_index(drop=True)

    from .windows import bucketed_agg

    return bucketed_agg(
        ds.map_batches(variants, batch_format="pandas")
        .groupby("_fb")
        .map_groups(pairs_bucket, batch_format="pandas"),
        ["id_a", "id_b"], {"dist": "min"},
    )


#: letter -> soundex digit; 0 = vowel-ish (resets the repeat guard),
#: 7 = H/W (transparent: does NOT reset it), 8 = non-letter
_SOUNDEX_CODE = np.full(256, 8, dtype=np.int8)
for _ch, _d in [("AEIOUY", 0), ("BFPV", 1), ("CGJKQSXZ", 2), ("DT", 3),
                ("L", 4), ("MN", 5), ("R", 6), ("HW", 7)]:
    for _c in _ch:
        _SOUNDEX_CODE[ord(_c)] = _d
        _SOUNDEX_CODE[ord(_c.lower())] = _d


def soundex(strings: np.ndarray) -> np.ndarray:
    """Vectorized American Soundex (the classic phonetic blocking key
    for name matching): first letter + 3 digits, adjacent same-coded
    letters collapse, H/W are transparent to the repeat rule, vowels
    reset it. One O(max_len) vectorized column sweep per batch — no
    per-row Python. Empty / letterless strings code to ''."""
    mat, lens = _byte_matrix(strings)
    n, width = mat.shape
    codes = _SOUNDEX_CODE[mat]  # (n, width)
    out_digits = np.zeros((n, 3), dtype=np.int8)
    count = np.zeros(n, dtype=np.int64)
    first = np.full(n, 0, dtype=np.uint8)
    started = np.zeros(n, dtype=bool)
    last = np.zeros(n, dtype=np.int8)  # code of the previous letter
    for col in range(width):
        ch = mat[:, col]
        c = codes[:, col]
        is_letter = c != 8
        begin = is_letter & ~started
        first = np.where(begin, np.where((ch >= 97) & (ch <= 122),
                                         ch - 32, ch), first)
        last = np.where(begin, np.where(c == 7, np.int8(0), c), last)
        started = started | begin
        after = is_letter & started & ~begin
        emit = after & (c >= 1) & (c <= 6) & (c != last) & (count < 3)
        for slot in range(3):
            out_digits[:, slot] = np.where(
                emit & (count == slot), c, out_digits[:, slot]
            )
        count = count + emit.astype(np.int64)
        # vowels reset the repeat guard; H/W leave it; letters set it
        upd = after & (c != 7)
        last = np.where(upd, c, last)
    res = np.empty(n, dtype=object)
    for i in range(n):  # assembly only: 4 chars per row
        if not started[i]:
            res[i] = ""
        else:
            res[i] = chr(first[i]) + "".join(
                str(int(d)) for d in out_digits[i]
            )
    return res
