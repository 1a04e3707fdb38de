"""VP8 key-frame (lossy WebP) codec, library-free, per RFC 6386.

Decoder: full key-frame surface — boolean arithmetic decoder (§7),
frame header with segmentation / loop-filter params / multiple token
partitions / quantizer indices (§9), key-frame intra mode decoding
incl. per-subblock B_PRED with the above/left-context probability
table (§11), token (DCT coefficient) decoding over the 4×8×3×11
probability tables with header-transmitted updates (§13), per-segment
dequantization (§14.1), inverse WHT + inverse DCT in the spec's exact
integer arithmetic (§14.3-14.4), all 16×16 / chroma / ten 4×4 intra
predictors with the 127/129 edge conventions and the frozen
top-right quirk for right-column subblocks (§12), and both the simple
and normal in-loop deblocking filters with per-MB filter strength
(§15). A WebP lossy file is a single VP8 key frame, so key-frame-only
IS the complete WebP-relevant surface; raw interframes return None.

Encoder: a REAL spec-conformant key-frame encoder (16×16 and B_PRED
mode search by SAD, forward DCT/WHT, quantization, token + bool
encoding, optional in-loop filter) — it exists so decode correctness
is provable analytically in-repo: the encoder reconstructs through
the SAME inverse path the decoder runs, so ``decode == encoder
reconstruction`` must hold bit-exactly (tests assert it). Constant
tables live in ``vp8_tables.py`` (RFC 6386 values, transcription
verified against this system's libwebp; the test suite additionally
cross-validates decode against libwebp-encoded streams when the
shared library is present).

Reference parity: the reference pipeline treats media as opaque S3
objects (``lambdas/ingest/app.py:47-49``); decode stages are
beyond-reference curation operators (SURVEY round-4/5).
"""

from __future__ import annotations

import numpy as np

from .vp8_tables import (
    AC_QLOOKUP,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS,
    KF_BMODE_PROBS,
)

# ---------------------------------------------------------------- trees

# 16x16 luma modes (also chroma, minus B_PRED)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 b modes
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
KF_YMODE_PROB = [145, 156, 163, 128]
UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
KF_UV_MODE_PROB = [142, 114, 183]
BMODE_TREE = [
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10,
    -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
]
SEGMENT_TREE = [2, 4, -0, -1, -2, -3]

# token alphabet (§13.2)
DCT_0, DCT_1, DCT_2, DCT_3, DCT_4 = 0, 1, 2, 3, 4
CAT1, CAT2, CAT3, CAT4, CAT5, CAT6, DCT_EOB = 5, 6, 7, 8, 9, 10, 11
COEFF_TREE = [
    -DCT_EOB, 2, -DCT_0, 4, -DCT_1, 6, 8, 12, -DCT_2, 10,
    -DCT_3, -DCT_4, 14, 16, -CAT1, -CAT2, 18, 20, -CAT3, -CAT4,
    -CAT5, -CAT6,
]
CAT_BASE = {CAT1: 5, CAT2: 7, CAT3: 11, CAT4: 19, CAT5: 35, CAT6: 67}
CAT_PROBS = {
    CAT1: [159],
    CAT2: [165, 145],
    CAT3: [173, 148, 140],
    CAT4: [176, 155, 140, 135],
    CAT5: [180, 157, 141, 134, 130],
    CAT6: [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
}
COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# 16x16 mode -> the b mode used as B_PRED context by neighbors (§11.3)
_MODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


# ------------------------------------------------------ boolean coder (§7/8)


class BoolDecoder:
    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.pos = 2
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= (
                    self.data[self.pos] if self.pos < len(self.data) else 0
                )
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v

    def tree(self, tree: list[int], probs) -> int:
        i = 0
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def bool(self, prob: int, val: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if val:
            self.bottom += split
            if self.bottom >= (1 << 32):
                self._carry()
                self.bottom &= 0xFFFFFFFF
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, n: int, v: int) -> None:
        for shift in range(n - 1, -1, -1):
            self.bool(128, (v >> shift) & 1)

    def signed_literal(self, n: int, v: int) -> None:
        self.literal(n, abs(v))
        self.bool(128, 1 if v < 0 else 0)

    def tree(self, tree: list[int], probs, leaf: int) -> None:
        # path from root to -leaf
        path = _tree_path(tree, leaf)
        for node, bit in path:
            self.bool(probs[node >> 1], bit)

    def getvalue(self) -> bytes:
        for _ in range(32):
            self.bool(128, 0)
        return bytes(self.out)


def _tree_path(tree: list[int], leaf: int, i: int = 0):
    """(node_index, bit) hops from the root to leaf ``-leaf``."""
    for bit in (0, 1):
        nxt = tree[i + bit]
        if nxt == -leaf and nxt <= 0:
            return [(i, bit)]
        if nxt > 0:
            sub = _tree_path(tree, leaf, nxt)
            if sub is not None:
                return [(i, bit)] + sub
    return None


# ------------------------------------------------------------ transforms


def idct4x4(block: np.ndarray) -> np.ndarray:
    """Exact inverse DCT per §14.4 (20091/35468 fixed-point)."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    for c in range(4):
        a1 = ip[0, c] + ip[2, c]
        b1 = ip[0, c] - ip[2, c]
        t1 = (ip[1, c] * 35468) >> 16
        t2 = ip[3, c] + ((ip[3, c] * 20091) >> 16)
        c1 = t1 - t2
        t1 = ip[1, c] + ((ip[1, c] * 20091) >> 16)
        t2 = (ip[3, c] * 35468) >> 16
        d1 = t1 + t2
        tmp[0, c] = a1 + d1
        tmp[3, c] = a1 - d1
        tmp[1, c] = b1 + c1
        tmp[2, c] = b1 - c1
    out = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        a1 = tmp[r, 0] + tmp[r, 2]
        b1 = tmp[r, 0] - tmp[r, 2]
        t1 = (tmp[r, 1] * 35468) >> 16
        t2 = tmp[r, 3] + ((tmp[r, 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = tmp[r, 1] + ((tmp[r, 1] * 20091) >> 16)
        t2 = (tmp[r, 3] * 35468) >> 16
        d1 = t1 + t2
        out[r, 0] = (a1 + d1 + 4) >> 3
        out[r, 3] = (a1 - d1 + 4) >> 3
        out[r, 1] = (b1 + c1 + 4) >> 3
        out[r, 2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(block: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block (§14.3)."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    for c in range(4):
        a1 = ip[0, c] + ip[3, c]
        b1 = ip[1, c] + ip[2, c]
        c1 = ip[1, c] - ip[2, c]
        d1 = ip[0, c] - ip[3, c]
        tmp[0, c] = a1 + b1
        tmp[1, c] = c1 + d1
        tmp[2, c] = a1 - b1
        tmp[3, c] = d1 - c1
    out = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        a1 = tmp[r, 0] + tmp[r, 3]
        b1 = tmp[r, 1] + tmp[r, 2]
        c1 = tmp[r, 1] - tmp[r, 2]
        d1 = tmp[r, 0] - tmp[r, 3]
        out[r, 0] = (a1 + b1 + 3) >> 3
        out[r, 1] = (c1 + d1 + 3) >> 3
        out[r, 2] = (a1 - b1 + 3) >> 3
        out[r, 3] = (d1 - c1 + 3) >> 3
    return out


def fdct4x4(block: np.ndarray) -> np.ndarray:
    """Forward DCT (encoder side; inverse-compatible with idct4x4).
    Rotation biases are plain half-ulp rounding so a FLAT residual
    yields a DC-only block — required for skip detection and for the
    closed-form flat-image oracle (the decoder never sees this
    function; only quantized coefficients travel)."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        a1 = (ip[r, 0] + ip[r, 3]) * 8
        b1 = (ip[r, 1] + ip[r, 2]) * 8
        c1 = (ip[r, 1] - ip[r, 2]) * 8
        d1 = (ip[r, 0] - ip[r, 3]) * 8
        tmp[r, 0] = a1 + b1
        tmp[r, 2] = a1 - b1
        tmp[r, 1] = (c1 * 2217 + d1 * 5352 + 2048) >> 12
        tmp[r, 3] = (d1 * 2217 - c1 * 5352 + 2048) >> 12
    out = np.zeros((4, 4), dtype=np.int64)
    for c in range(4):
        a1 = tmp[0, c] + tmp[3, c]
        b1 = tmp[1, c] + tmp[2, c]
        c1 = tmp[1, c] - tmp[2, c]
        d1 = tmp[0, c] - tmp[3, c]
        out[0, c] = (a1 + b1 + 7) >> 4
        out[2, c] = (a1 - b1 + 7) >> 4
        out[1, c] = (c1 * 2217 + d1 * 5352 + 32768) >> 16
        out[3, c] = (d1 * 2217 - c1 * 5352 + 32768) >> 16
    return out


def fwht4x4(block: np.ndarray) -> np.ndarray:
    """Forward WHT for the Y2 DC block (encoder side)."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        a1 = (ip[r, 0] + ip[r, 2]) * 4
        d1 = (ip[r, 1] + ip[r, 3]) * 4
        c1 = (ip[r, 1] - ip[r, 3]) * 4
        b1 = (ip[r, 0] - ip[r, 2]) * 4
        tmp[r, 0] = a1 + d1 + (1 if a1 != 0 else 0)
        tmp[r, 1] = b1 + c1
        tmp[r, 2] = b1 - c1
        tmp[r, 3] = a1 - d1
    out = np.zeros((4, 4), dtype=np.int64)
    for c in range(4):
        a1 = tmp[0, c] + tmp[2, c]
        d1 = tmp[1, c] + tmp[3, c]
        c1 = tmp[1, c] - tmp[3, c]
        b1 = tmp[0, c] - tmp[2, c]
        a2 = a1 + d1
        b2 = b1 + c1
        c2 = b1 - c1
        d2 = a1 - d1
        out[0, c] = (a2 + (1 if a2 < 0 else 0) + 3) >> 3
        out[1, c] = (b2 + (1 if b2 < 0 else 0) + 3) >> 3
        out[2, c] = (c2 + (1 if c2 < 0 else 0) + 3) >> 3
        out[3, c] = (d2 + (1 if d2 < 0 else 0) + 3) >> 3
    return out


# ---------------------------------------------------------- dequantization


def _clamp_q(i: int) -> int:
    return 0 if i < 0 else (127 if i > 127 else i)


class QuantFactors:
    """Per-segment dequant factors (§14.1)."""

    def __init__(self, base_qi: int, deltas: dict):
        q = _clamp_q(base_qi)
        self.y1dc = DC_QLOOKUP[_clamp_q(q + deltas.get("y1dc", 0))]
        self.y1ac = AC_QLOOKUP[q]
        self.y2dc = DC_QLOOKUP[_clamp_q(q + deltas.get("y2dc", 0))] * 2
        y2ac = (AC_QLOOKUP[_clamp_q(q + deltas.get("y2ac", 0))] * 155) // 100
        self.y2ac = max(8, y2ac)
        self.uvdc = min(132, DC_QLOOKUP[_clamp_q(q + deltas.get("uvdc", 0))])
        self.uvac = AC_QLOOKUP[_clamp_q(q + deltas.get("uvac", 0))]


# ------------------------------------------------------------- intra pred


def _pred16(mode, above, left, tl, have_above, have_left, size):
    """16x16 / chroma 8x8 whole-block prediction; above/left are the
    reconstructed neighbors (or the 127/129 edge constants)."""
    s = size
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + s) >> {8: 4, 16: 5}[s]
        elif have_above:
            dc = (int(above.sum()) + (s >> 1)) >> {8: 3, 16: 4}[s]
        elif have_left:
            dc = (int(left.sum()) + (s >> 1)) >> {8: 3, 16: 4}[s]
        else:
            dc = 128
        return np.full((s, s), dc, dtype=np.int64)
    if mode == V_PRED:
        return np.tile(above.astype(np.int64), (s, 1))
    if mode == H_PRED:
        return np.tile(left.astype(np.int64)[:, None], (1, s))
    # TM
    p = (
        left.astype(np.int64)[:, None]
        + above.astype(np.int64)[None, :]
        - int(tl)
    )
    return np.clip(p, 0, 255)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred4(mode: int, A: np.ndarray, L: np.ndarray, P: int) -> np.ndarray:
    """One 4x4 subblock prediction (§12.4). ``A`` = 8 above pixels
    (incl. above-right), ``L`` = 4 left, ``P`` = above-left."""
    A = A.astype(np.int64)
    L = L.astype(np.int64)
    P = int(P)
    B = np.zeros((4, 4), dtype=np.int64)
    if mode == B_DC:
        B[:] = (int(A[:4].sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM:
        B[:] = np.clip(L[:, None] + A[None, :4] - P, 0, 255)
    elif mode == B_VE:
        row = np.array(
            [
                _avg3(P, A[0], A[1]),
                _avg3(A[0], A[1], A[2]),
                _avg3(A[1], A[2], A[3]),
                _avg3(A[2], A[3], A[4]),
            ]
        )
        B[:] = row[None, :]
    elif mode == B_HE:
        col = np.array(
            [
                _avg3(P, L[0], L[1]),
                _avg3(L[0], L[1], L[2]),
                _avg3(L[1], L[2], L[3]),
                _avg3(L[2], L[3], L[3]),
            ]
        )
        B[:] = col[:, None]
    elif mode == B_LD:
        e = [
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]),
            _avg3(A[3], A[4], A[5]),
            _avg3(A[4], A[5], A[6]),
            _avg3(A[5], A[6], A[7]),
            _avg3(A[6], A[7], A[7]),
        ]
        for r in range(4):
            for c in range(4):
                B[r, c] = e[r + c]
    elif mode == B_RD:
        e = [
            _avg3(L[3], L[2], L[1]),
            _avg3(L[2], L[1], L[0]),
            _avg3(L[1], L[0], P),
            _avg3(L[0], P, A[0]),
            _avg3(P, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
        ]
        for r in range(4):
            for c in range(4):
                B[r, c] = e[3 + c - r]
    elif mode == B_VR:
        B[0, 0] = _avg2(P, A[0])
        B[0, 1] = _avg2(A[0], A[1])
        B[0, 2] = _avg2(A[1], A[2])
        B[0, 3] = _avg2(A[2], A[3])
        B[1, 0] = _avg3(L[0], P, A[0])
        B[1, 1] = _avg3(P, A[0], A[1])
        B[1, 2] = _avg3(A[0], A[1], A[2])
        B[1, 3] = _avg3(A[1], A[2], A[3])
        B[2, 0] = _avg3(L[1], L[0], P)
        B[2, 1:] = B[0, :3]
        B[3, 0] = _avg3(L[2], L[1], L[0])
        B[3, 1:] = B[1, :3]
    elif mode == B_VL:
        B[0, 0] = _avg2(A[0], A[1])
        B[0, 1] = _avg2(A[1], A[2])
        B[0, 2] = _avg2(A[2], A[3])
        B[0, 3] = _avg2(A[3], A[4])
        B[1, 0] = _avg3(A[0], A[1], A[2])
        B[1, 1] = _avg3(A[1], A[2], A[3])
        B[1, 2] = _avg3(A[2], A[3], A[4])
        B[1, 3] = _avg3(A[3], A[4], A[5])
        B[2, :3] = B[0, 1:]
        B[3, :3] = B[1, 1:]
        B[2, 3] = _avg3(A[4], A[5], A[6])
        B[3, 3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HD:
        B[0, 0] = _avg2(L[0], P)
        B[0, 1] = _avg3(L[0], P, A[0])
        B[0, 2] = _avg3(P, A[0], A[1])
        B[0, 3] = _avg3(A[0], A[1], A[2])
        B[1, 0] = _avg2(L[1], L[0])
        B[1, 1] = _avg3(L[1], L[0], P)
        B[1, 2:] = B[0, :2]
        B[2, 0] = _avg2(L[2], L[1])
        B[2, 1] = _avg3(L[2], L[1], L[0])
        B[2, 2:] = B[1, :2]
        B[3, 0] = _avg2(L[3], L[2])
        B[3, 1] = _avg3(L[3], L[2], L[1])
        B[3, 2:] = B[2, :2]
    elif mode == B_HU:
        B[0, 0] = _avg2(L[0], L[1])
        B[0, 1] = _avg3(L[0], L[1], L[2])
        B[0, 2] = _avg2(L[1], L[2])
        B[0, 3] = _avg3(L[1], L[2], L[3])
        B[1, :2] = B[0, 2:]
        B[1, 2] = _avg2(L[2], L[3])
        B[1, 3] = _avg3(L[2], L[3], L[3])
        B[2, :2] = B[1, 2:]
        B[2, 2] = L[3]
        B[2, 3] = L[3]
        B[3, :] = L[3]
    else:  # pragma: no cover
        raise ValueError(f"bad b mode {mode}")
    return B


# ----------------------------------------------------------- loop filter


def _sc(x):
    return np.clip(x, -128, 127)


def _filter_common(outer_mask, p1, p0, q0, q1):
    """§15.2 filter_common, vectorized; ``outer_mask`` selects pixels
    whose outer taps (p1-q1) participate. Returns (F, p0', q0')."""
    P1 = p1.astype(np.int64) - 128
    P0 = p0.astype(np.int64) - 128
    Q0 = q0.astype(np.int64) - 128
    Q1 = q1.astype(np.int64) - 128
    a = _sc(np.where(outer_mask, _sc(P1 - Q1), 0) + 3 * (Q0 - P0))
    F = _sc(a + 4) >> 3
    E = _sc(a + 3) >> 3
    return F, (_sc(P0 + E) + 128), (_sc(Q0 - F) + 128)


def _simple_filter(edge_limit, p1, p0, q0, q1):
    mask = (
        np.abs(p0.astype(np.int64) - q0) * 2
        + np.abs(p1.astype(np.int64) - q1) // 2
    ) <= edge_limit
    _, p0n, q0n = _filter_common(np.ones_like(mask), p1, p0, q0, q1)
    return np.where(mask, p0n, p0), np.where(mask, q0n, q0)


def _filter_mask(interior, edge, p3, p2, p1, p0, q0, q1, q2, q3):
    x = [v.astype(np.int64) for v in (p3, p2, p1, p0, q0, q1, q2, q3)]
    p3, p2, p1, p0, q0, q1, q2, q3 = x
    return (
        ((np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2) <= edge)
        & (np.abs(p3 - p2) <= interior)
        & (np.abs(p2 - p1) <= interior)
        & (np.abs(p1 - p0) <= interior)
        & (np.abs(q1 - q0) <= interior)
        & (np.abs(q2 - q1) <= interior)
        & (np.abs(q3 - q2) <= interior)
    )


def _hev_mask(thresh, p1, p0, q0, q1):
    return (np.abs(p1.astype(np.int64) - p0) > thresh) | (
        np.abs(q1.astype(np.int64) - q0) > thresh
    )


def _subblock_filter(hev_t, interior, edge, px):
    """Normal filter on interior (subblock) edges (§15.3). ``px`` is
    the 8xN pixel window [p3..q3]; modified copy returned."""
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    fm = _filter_mask(interior, edge, *px)
    hev = _hev_mask(hev_t, p1, p0, q0, q1)
    F, p0n, q0n = _filter_common(hev, p1, p0, q0, q1)
    a2 = (F + 1) >> 1
    P1 = p1.astype(np.int64) - 128
    Q1 = q1.astype(np.int64) - 128
    p1n = _sc(P1 + a2) + 128
    q1n = _sc(Q1 - a2) + 128
    out = list(px)
    out[3] = np.where(fm, p0n, p0)
    out[4] = np.where(fm, q0n, q0)
    out[2] = np.where(fm & ~hev, p1n, p1)
    out[5] = np.where(fm & ~hev, q1n, q1)
    return out


def _mb_filter(hev_t, interior, edge, px):
    """Normal filter on macroblock edges (§15.2)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    fm = _filter_mask(interior, edge, *px)
    hev = _hev_mask(hev_t, p1, p0, q0, q1)
    P2 = p2.astype(np.int64) - 128
    P1 = p1.astype(np.int64) - 128
    P0 = p0.astype(np.int64) - 128
    Q0 = q0.astype(np.int64) - 128
    Q1 = q1.astype(np.int64) - 128
    Q2 = q2.astype(np.int64) - 128
    w = _sc(_sc(P1 - Q1) + 3 * (Q0 - P0))
    a = _sc((27 * w + 63) >> 7)
    q0w = _sc(Q0 - a) + 128
    p0w = _sc(P0 + a) + 128
    a = _sc((18 * w + 63) >> 7)
    q1w = _sc(Q1 - a) + 128
    p1w = _sc(P1 + a) + 128
    a = _sc((9 * w + 63) >> 7)
    q2w = _sc(Q2 - a) + 128
    p2w = _sc(P2 + a) + 128
    # hev pixels take the common adjustment instead
    _, p0h, q0h = _filter_common(np.ones_like(hev), p1, p0, q0, q1)
    out = list(px)
    out[1] = np.where(fm & ~hev, p2w, p2)
    out[2] = np.where(fm & ~hev, p1w, p1)
    out[3] = np.where(fm, np.where(hev, p0h, p0w), p0)
    out[4] = np.where(fm, np.where(hev, q0h, q0w), q0)
    out[5] = np.where(fm & ~hev, q1w, q1)
    out[6] = np.where(fm & ~hev, q2w, q2)
    return out


def _apply_edge(plane, y0, x0, n, vertical, fn):
    """Apply a cross-edge filter function to the ``n``-pixel edge whose
    first q-row/col is at (y0, x0); ``fn`` maps [p3..q3] -> new 8."""
    if vertical:  # filtering across a vertical edge: columns x0-4..x0+3
        win = [plane[y0:y0 + n, x0 - 4 + i].astype(np.int64) for i in range(8)]
        out = fn(win)
        for i in range(8):
            plane[y0:y0 + n, x0 - 4 + i] = out[i].astype(np.uint8)
    else:
        win = [plane[y0 - 4 + i, x0:x0 + n].astype(np.int64) for i in range(8)]
        out = fn(win)
        for i in range(8):
            plane[y0 - 4 + i, x0:x0 + n] = out[i].astype(np.uint8)


def _loop_filter_frame(y, u, v, mb_info, mb_w, mb_h, hdr):
    """In-loop deblocking pass over reconstructed (unpadded) planes.
    ``mb_info[(r, c)] = (filter_level, interior, hev_t, inner)`` with
    ``inner`` = this MB filters its interior edges."""
    simple = hdr["filter_type"] == 1
    for r in range(mb_h):
        for c in range(mb_w):
            level, interior, hev_t, inner = mb_info[(r, c)]
            if level == 0:
                continue
            mb_edge = ((level + 2) * 2) + interior
            sb_edge = (level * 2) + interior
            yy, xx = r * 16, c * 16

            if simple:
                def sfn(limit):
                    def fn(px):
                        p1n, q0n = None, None
                        p1, p0, q0, q1 = px[2], px[3], px[4], px[5]
                        p0n, q0n = _simple_filter(limit, p1, p0, q0, q1)
                        out = list(px)
                        out[3], out[4] = p0n, q0n
                        return out
                    return fn

                if c > 0:
                    _apply_edge(y, yy, xx, 16, True, sfn(mb_edge))
                if inner:
                    for k in (4, 8, 12):
                        _apply_edge(y, yy, xx + k, 16, True, sfn(sb_edge))
                if r > 0:
                    _apply_edge(y, yy, xx, 16, False, sfn(mb_edge))
                if inner:
                    for k in (4, 8, 12):
                        _apply_edge(y, yy + k, xx, 16, False, sfn(sb_edge))
                continue

            def mfn(px):
                return _mb_filter(hev_t, interior, mb_edge, px)

            def bfn(px):
                return _subblock_filter(hev_t, interior, sb_edge, px)

            cy, cx = r * 8, c * 8
            if c > 0:
                _apply_edge(y, yy, xx, 16, True, mfn)
                _apply_edge(u, cy, cx, 8, True, mfn)
                _apply_edge(v, cy, cx, 8, True, mfn)
            if inner:
                for k in (4, 8, 12):
                    _apply_edge(y, yy, xx + k, 16, True, bfn)
                _apply_edge(u, cy, cx + 4, 8, True, bfn)
                _apply_edge(v, cy, cx + 4, 8, True, bfn)
            if r > 0:
                _apply_edge(y, yy, xx, 16, False, mfn)
                _apply_edge(u, cy, cx, 8, False, mfn)
                _apply_edge(v, cy, cx, 8, False, mfn)
            if inner:
                for k in (4, 8, 12):
                    _apply_edge(y, yy + k, xx, 16, False, bfn)
                _apply_edge(u, cy + 4, cx, 8, False, bfn)
                _apply_edge(v, cy + 4, cx, 8, False, bfn)


def _mb_filter_params(hdr, segment, is_bpred, has_coeffs):
    """Per-MB (level, interior_limit, hev_threshold, filter_inner)."""
    level = hdr["filter_level"]
    seg = hdr["segmentation"]
    if seg["enabled"]:
        lf = seg["lf"][segment]
        level = lf if seg["abs_values"] else level + lf
        level = max(0, min(63, level))
    if hdr["lf_delta_enabled"]:
        level += hdr["ref_lf_deltas"][0]  # intra frame
        if is_bpred:
            level += hdr["mode_lf_deltas"][0]
        level = max(0, min(63, level))
    interior = level
    sharp = hdr["sharpness"]
    if sharp > 0:
        interior >>= 2 if sharp > 4 else 1
        interior = min(interior, 9 - sharp)
    interior = max(1, interior)
    hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
    return level, interior, hev_t, (has_coeffs or is_bpred)


# ----------------------------------------------------------- token coding


def _decode_block(bd, ptype, ctx, first, qdc, qac):
    """Token-decode one 4x4 block (§13.3). Returns (coeff 4x4 array in
    raster order, DEQUANTIZED, and the nonzero flag)."""
    coeffs = np.zeros(16, dtype=np.int64)
    n = first
    nz = False
    prev_zero = False
    while n < 16:
        probs = ptype[COEFF_BANDS[n]][ctx]
        tok = bd.tree(COEFF_TREE, probs) if not prev_zero else _tree_no_eob(
            bd, probs
        )
        if tok == DCT_EOB:
            break
        if tok == DCT_0:
            prev_zero = True
            ctx = 0
            n += 1
            continue
        prev_zero = False
        if tok == DCT_1:
            val = 1
            ctx = 1
        elif tok <= DCT_4:
            val = tok
            ctx = 2
        else:
            base = CAT_BASE[tok]
            extra = 0
            for p in CAT_PROBS[tok]:
                extra = (extra << 1) | bd.bool(p)
            val = base + extra
            ctx = 2
        if bd.bool(128):
            val = -val
        coeffs[ZIGZAG[n]] = val * (qdc if n == 0 else qac)
        nz = True
        n += 1
    return coeffs.reshape(4, 4), nz


def _tree_no_eob(bd, probs):
    """Coefficient token decode skipping the EOB branch (the token
    after a DCT_0 cannot be EOB): start the tree walk at node 2."""
    i = 2
    while True:
        i = COEFF_TREE[i + bd.bool(probs[i >> 1])]
        if i <= 0:
            return -i


def _encode_block(be, ptype, ctx, first, qcoeffs):
    """Token-encode one 4x4 of QUANTIZED coefficients (raster order
    ints); mirror of ``_decode_block``. Returns the nonzero flag."""
    zz = [int(qcoeffs.reshape(16)[ZIGZAG[n]]) for n in range(16)]
    last = -1
    for n in range(first, 16):
        if zz[n] != 0:
            last = n
    n = first
    nz = last >= first
    prev_zero = False
    while n <= last:
        probs = ptype[COEFF_BANDS[n]][ctx]
        val = zz[n]
        a = abs(val)
        if a == 0:
            tok = DCT_0
        elif a == 1:
            tok = DCT_1
        elif a <= 4:
            tok = DCT_0 + a
        elif a <= 6:
            tok = CAT1
        elif a <= 10:
            tok = CAT2
        elif a <= 18:
            tok = CAT3
        elif a <= 34:
            tok = CAT4
        elif a <= 66:
            tok = CAT5
        else:
            tok = CAT6
        if prev_zero:
            _tree_encode_from(be, probs, tok, start=2)
        else:
            be.tree(COEFF_TREE, probs, tok)
        if tok == DCT_0:
            prev_zero = True
            ctx = 0
            n += 1
            continue
        prev_zero = False
        if tok >= CAT1:
            extra = a - CAT_BASE[tok]
            cat = CAT_PROBS[tok]
            for i, p in enumerate(cat):
                be.bool(p, (extra >> (len(cat) - 1 - i)) & 1)
        be.bool(128, 1 if val < 0 else 0)
        ctx = 1 if a == 1 else 2
        n += 1
    if last < 15:
        probs = ptype[COEFF_BANDS[max(first, last + 1)]][ctx]
        # EOB cannot follow a DCT_0; trailing zeros are never emitted
        be.tree(COEFF_TREE, probs, DCT_EOB)
    return nz


def _tree_encode_from(be, probs, leaf, start):
    path = _tree_path(COEFF_TREE, leaf, start)
    for node, bit in path:
        be.bool(probs[node >> 1], bit)


# ------------------------------------------------------------ frame header


def _parse_header(bd: BoolDecoder) -> dict:
    """Key-frame header, first partition (§9). Returns everything the
    MB loops need; coefficient probabilities come back with the
    header-transmitted updates applied over the RFC defaults."""
    hdr = {}
    bd.literal(1)  # color_space (0 = YUV as here)
    bd.literal(1)  # clamping_type (decode clamps regardless)
    seg = {
        "enabled": bd.literal(1), "update_map": 0, "abs_values": 0,
        "tree_probs": [255, 255, 255], "qi": [0] * 4, "lf": [0] * 4,
    }
    if seg["enabled"]:
        seg["update_map"] = bd.literal(1)
        update_data = bd.literal(1)
        if update_data:
            seg["abs_values"] = bd.literal(1)
            for i in range(4):
                if bd.literal(1):
                    seg["qi"][i] = bd.signed_literal(7)
            for i in range(4):
                if bd.literal(1):
                    seg["lf"][i] = bd.signed_literal(6)
        if seg["update_map"]:
            for i in range(3):
                if bd.literal(1):
                    seg["tree_probs"][i] = bd.literal(8)
    hdr["segmentation"] = seg
    hdr["filter_type"] = bd.literal(1)
    hdr["filter_level"] = bd.literal(6)
    hdr["sharpness"] = bd.literal(3)
    hdr["lf_delta_enabled"] = bd.literal(1)
    hdr["ref_lf_deltas"] = [0] * 4
    hdr["mode_lf_deltas"] = [0] * 4
    if hdr["lf_delta_enabled"] and bd.literal(1):
        for i in range(4):
            if bd.literal(1):
                hdr["ref_lf_deltas"][i] = bd.signed_literal(6)
        for i in range(4):
            if bd.literal(1):
                hdr["mode_lf_deltas"][i] = bd.signed_literal(6)
    hdr["n_token_parts"] = 1 << bd.literal(2)
    base_qi = bd.literal(7)
    deltas = {}
    for key in ("y1dc", "y2dc", "y2ac", "uvdc", "uvac"):
        deltas[key] = bd.signed_literal(4) if bd.literal(1) else 0
    hdr["base_qi"] = base_qi
    hdr["q_deltas"] = deltas
    hdr["refresh_entropy"] = bd.literal(1)
    probs = [
        [[list(ctx) for ctx in band] for band in typ]
        for typ in DEFAULT_COEFF_PROBS
    ]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):  # noqa: E741
                    if bd.bool(COEFF_UPDATE_PROBS[i][j][k][l]):
                        probs[i][j][k][l] = bd.literal(8)
    hdr["coeff_probs"] = probs
    hdr["mb_no_skip"] = bd.literal(1)
    hdr["skip_prob"] = bd.literal(8) if hdr["mb_no_skip"] else 0
    return hdr


def _segment_quants(hdr) -> list[QuantFactors]:
    seg = hdr["segmentation"]
    out = []
    for s in range(4):
        if seg["enabled"]:
            qi = seg["qi"][s] if seg["abs_values"] else (
                hdr["base_qi"] + seg["qi"][s]
            )
        else:
            qi = hdr["base_qi"]
        out.append(QuantFactors(qi, hdr["q_deltas"]))
    return out


# ---------------------------------------------------------------- decoder


def _alloc_planes(mb_w: int, mb_h: int):
    """Padded reconstruction planes: one extra top row (127), one
    extra left column (129, corner 127), and 4 extra right luma
    columns: 127 on the top border, then per-row REPLICAS of the
    rightmost reconstructed pixel (written by ``_reconstruct_mb``) —
    the above-right samples beyond the frame edge that right-column
    B_PRED subblocks of the rightmost MB read (libwebp-verified
    convention; a constant-127 border mismatches real streams)."""
    W, H = mb_w * 16, mb_h * 16
    y = np.full((H + 1, W + 5), 127, np.uint8)
    y[1:, 0] = 129
    u = np.full((H // 2 + 1, W // 2 + 1), 127, np.uint8)
    u[1:, 0] = 129
    v = u.copy()
    return y, u, v


def decode_vp8(data: bytes) -> dict | None:
    """Decode one VP8 key frame (the payload of a WebP ``VP8 `` chunk
    or a raw IVF frame). Returns ``{"y", "u", "v", "width",
    "height"}`` with cropped uint8 planes, or None for non-keyframes /
    corrupt data."""
    try:
        return _decode_vp8_inner(data)
    except (ValueError, IndexError, ZeroDivisionError):
        return None


def _decode_vp8_inner(data: bytes) -> dict | None:
    if len(data) < 10:
        return None
    tag = int.from_bytes(data[0:3], "little")
    if tag & 1:  # interframe: not a WebP surface
        return None
    part1_len = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        return None
    width = int.from_bytes(data[6:8], "little") & 0x3FFF
    height = int.from_bytes(data[8:10], "little") & 0x3FFF
    if width == 0 or height == 0:
        return None
    if width * height > 64 << 20:  # 64 MP decompression-bomb guard
        return None
    body = data[10:]
    if part1_len > len(body):
        return None
    bd = BoolDecoder(body[:part1_len])
    hdr = _parse_header(bd)
    rest = body[part1_len:]
    nparts = hdr["n_token_parts"]
    sizes = []
    off = 3 * (nparts - 1)
    for i in range(nparts - 1):
        sizes.append(int.from_bytes(rest[3 * i:3 * i + 3], "little"))
    parts = []
    for i in range(nparts):
        if i < nparts - 1:
            parts.append(BoolDecoder(rest[off:off + sizes[i]]))
            off += sizes[i]
        else:
            parts.append(BoolDecoder(rest[off:]))

    mb_w, mb_h = (width + 15) // 16, (height + 15) // 16
    quants = _segment_quants(hdr)
    probs = hdr["coeff_probs"]
    y, u, v = _alloc_planes(mb_w, mb_h)

    above_nz = {
        "y": np.zeros(mb_w * 4, np.int8), "u": np.zeros(mb_w * 2, np.int8),
        "v": np.zeros(mb_w * 2, np.int8), "y2": np.zeros(mb_w, np.int8),
    }
    above_bmode = np.full(mb_w * 4, B_DC, np.int8)
    seg_map_on = hdr["segmentation"]["enabled"] and (
        hdr["segmentation"]["update_map"]
    )
    mb_info = {}

    for r in range(mb_h):
        left_nz = {"y": np.zeros(4, np.int8), "u": np.zeros(2, np.int8),
                   "v": np.zeros(2, np.int8), "y2": 0}
        left_bmode = np.full(4, B_DC, np.int8)
        bd2 = parts[r % nparts]
        for c in range(mb_w):
            segment = (
                bd.tree(SEGMENT_TREE, hdr["segmentation"]["tree_probs"])
                if seg_map_on else 0
            )
            skip = bd.bool(hdr["skip_prob"]) if hdr["mb_no_skip"] else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            if ymode == B_PRED:
                submodes = np.zeros(16, np.int8)
                for i in range(16):
                    sr, sc = i // 4, i % 4
                    above_m = above_bmode[c * 4 + sc] if sr == 0 else (
                        submodes[i - 4]
                    )
                    left_m = left_bmode[sr] if sc == 0 else submodes[i - 1]
                    submodes[i] = bd.tree(
                        BMODE_TREE, KF_BMODE_PROBS[above_m][left_m]
                    )
            else:
                submodes = np.full(16, _MODE_TO_B[ymode], np.int8)
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROB)
            above_bmode[c * 4:c * 4 + 4] = submodes[12:16]
            left_bmode[:] = submodes[3::4]

            q = quants[segment]
            has_y2 = ymode != B_PRED
            blocks = np.zeros((16, 4, 4), np.int64)
            ublocks = np.zeros((4, 4, 4), np.int64)
            vblocks = np.zeros((4, 4, 4), np.int64)
            has_coeffs = False
            if skip:
                left_nz["y"][:] = 0
                above_nz["y"][c * 4:c * 4 + 4] = 0
                left_nz["u"][:] = 0
                above_nz["u"][c * 2:c * 2 + 2] = 0
                left_nz["v"][:] = 0
                above_nz["v"][c * 2:c * 2 + 2] = 0
                if has_y2:
                    left_nz["y2"] = 0
                    above_nz["y2"][c] = 0
            else:
                if has_y2:
                    ctx = int(above_nz["y2"][c]) + int(left_nz["y2"])
                    y2blk, nz = _decode_block(
                        bd2, probs[1], ctx, 0, q.y2dc, q.y2ac
                    )
                    above_nz["y2"][c] = left_nz["y2"] = int(nz)
                    has_coeffs |= nz
                    y2out = iwht4x4(y2blk)
                plane = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for i in range(16):
                    sr, sc = i // 4, i % 4
                    ctx = int(above_nz["y"][c * 4 + sc]) + int(
                        left_nz["y"][sr]
                    )
                    blk, nz = _decode_block(
                        bd2, probs[plane], ctx, first, q.y1dc, q.y1ac
                    )
                    above_nz["y"][c * 4 + sc] = left_nz["y"][sr] = int(nz)
                    has_coeffs |= nz
                    if has_y2:
                        blk[0, 0] = y2out[sr, sc]
                    blocks[i] = blk
                for name, arr in (("u", ublocks), ("v", vblocks)):
                    for i in range(4):
                        sr, sc = i // 2, i % 2
                        ctx = int(above_nz[name][c * 2 + sc]) + int(
                            left_nz[name][sr]
                        )
                        blk, nz = _decode_block(
                            bd2, probs[2], ctx, 0, q.uvdc, q.uvac
                        )
                        above_nz[name][c * 2 + sc] = int(nz)
                        left_nz[name][sr] = int(nz)
                        has_coeffs |= nz
                        arr[i] = blk
            _reconstruct_mb(
                y, u, v, r, c, ymode, submodes, uvmode, blocks,
                ublocks, vblocks, skip, has_y2,
            )
            mb_info[(r, c)] = _mb_filter_params(
                hdr, segment, ymode == B_PRED, has_coeffs
            )

    yv = y[1:, 1:1 + mb_w * 16].copy()
    uv_ = u[1:, 1:].copy()
    vv = v[1:, 1:].copy()
    if hdr["filter_level"] > 0:
        _loop_filter_frame(yv, uv_, vv, mb_info, mb_w, mb_h, hdr)
    return {
        "y": yv[:height, :width],
        "u": uv_[: (height + 1) // 2, : (width + 1) // 2],
        "v": vv[: (height + 1) // 2, : (width + 1) // 2],
        "width": width,
        "height": height,
    }


def _replicate_right_border(y: np.ndarray, r: int, c: int) -> None:
    """After reconstructing a rightmost-column MB, copy its right-edge
    pixels into the 4 pad columns so the NEXT MB row's above-right
    reads replicate the frame edge (libwebp-verified; the top border
    row stays 127)."""
    W = y.shape[1] - 5
    if (c + 1) * 16 == W:
        y0 = r * 16
        y[1 + y0:17 + y0, W + 1:W + 5] = y[1 + y0:17 + y0, W:W + 1]


def _reconstruct_mb(y, u, v, r, c, ymode, submodes, uvmode, blocks,
                    ublocks, vblocks, skip, has_y2):
    """Prediction + residual add for one MB into the padded planes."""
    y0, x0 = r * 16, c * 16
    if ymode == B_PRED:
        Wb = np.empty((17, 21), np.int64)
        Wb[0, 0] = y[y0, x0]
        Wb[0, 1:21] = y[y0, 1 + x0:21 + x0]
        Wb[1:17, 0] = y[1 + y0:17 + y0, x0]
        tr_frozen = Wb[0, 17:21].copy()
        for i in range(16):
            sr, sc = i // 4, i % 4
            if sc < 3:
                A = Wb[4 * sr, 1 + 4 * sc:9 + 4 * sc].copy()
            else:
                A = np.concatenate(
                    [Wb[4 * sr, 13:17], tr_frozen]
                )
            L = Wb[1 + 4 * sr:5 + 4 * sr, 4 * sc].copy()
            P = Wb[4 * sr, 4 * sc]
            pred = _pred4(int(submodes[i]), A, L, P)
            if not skip:
                pred = pred + idct4x4(blocks[i])
            Wb[1 + 4 * sr:5 + 4 * sr, 1 + 4 * sc:5 + 4 * sc] = np.clip(
                pred, 0, 255
            )
        y[1 + y0:17 + y0, 1 + x0:17 + x0] = Wb[1:17, 1:17].astype(np.uint8)
    else:
        above = y[y0, 1 + x0:17 + x0]
        left = y[1 + y0:17 + y0, x0]
        tl = y[y0, x0]
        pred = _pred16(ymode, above, left, tl, r > 0, c > 0, 16)
        out = pred.copy()
        if not skip:
            for i in range(16):
                sr, sc = i // 4, i % 4
                out[4 * sr:4 * sr + 4, 4 * sc:4 * sc + 4] += idct4x4(
                    blocks[i]
                )
        y[1 + y0:17 + y0, 1 + x0:17 + x0] = np.clip(out, 0, 255).astype(
            np.uint8
        )

    cy, cx = r * 8, c * 8
    for plane, blks in ((u, ublocks), (v, vblocks)):
        above = plane[cy, 1 + cx:9 + cx]
        left = plane[1 + cy:9 + cy, cx]
        tl = plane[cy, cx]
        pred = _pred16(uvmode, above, left, tl, r > 0, c > 0, 8)
        out = pred.copy()
        if not skip:
            for i in range(4):
                sr, sc = i // 2, i % 2
                out[4 * sr:4 * sr + 4, 4 * sc:4 * sc + 4] += idct4x4(
                    blks[i]
                )
        plane[1 + cy:9 + cy, 1 + cx:9 + cx] = np.clip(out, 0, 255).astype(
            np.uint8
        )
    _replicate_right_border(y, r, c)


# ---------------------------------------------------------------- encoder


def _quantize_block(coeffs: np.ndarray, qdc: int, qac: int) -> np.ndarray:
    """Nearest quantization with the spec's coefficient cap (cat6
    carries 11 extra bits, so |qcoeff| <= 2047 always encodes)."""
    out = np.zeros((4, 4), np.int64)
    flat = coeffs.reshape(16)
    o = out.reshape(16)
    for i in range(16):
        qv = qdc if i == 0 else qac
        a = int(flat[i])
        q = (abs(a) + qv // 2) // qv
        if q > 2047:
            q = 2047
        o[i] = -q if a < 0 else q
    return out


def _sad(a, b) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())


def _write_header(be: BoolEncoder, qi: int, filter_type: int,
                  filter_level: int, sharpness: int,
                  parts_log2: int = 0) -> None:
    """Mirror of ``_parse_header`` with this encoder's fixed choices:
    no segmentation, no lf deltas, one token partition, no quantizer
    deltas, default coefficient probs (all update flags 0), skip
    coding enabled at prob 128."""
    be.literal(1, 0)  # color_space
    be.literal(1, 0)  # clamping
    be.literal(1, 0)  # segmentation_enabled
    be.literal(1, filter_type)
    be.literal(6, filter_level)
    be.literal(3, sharpness)
    be.literal(1, 0)  # lf delta enable
    be.literal(2, parts_log2)  # log2 token partitions
    be.literal(7, qi)
    for _ in range(5):
        be.literal(1, 0)  # quant delta flags
    be.literal(1, 1)  # refresh entropy probs
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):  # noqa: E741
                    be.bool(COEFF_UPDATE_PROBS[i][j][k][l], 0)
    be.literal(1, 1)  # mb_no_coeff_skip
    be.literal(8, 128)  # prob_skip_false


def _pad_plane(p: np.ndarray, mult: int) -> np.ndarray:
    h, w = p.shape
    H = ((h + mult - 1) // mult) * mult
    W = ((w + mult - 1) // mult) * mult
    out = np.empty((H, W), np.uint8)
    out[:h, :w] = p
    out[h:, :w] = p[h - 1:h, :]
    out[:h, w:] = p[:, w - 1:w]
    out[h:, w:] = p[h - 1, w - 1]
    return out


def encode_vp8(y: np.ndarray, u: np.ndarray, v: np.ndarray, *,
               qi: int = 40, filter_level: int = 0, sharpness: int = 0,
               filter_type: int = 0, force_bpred: bool = False,
               token_partitions: int = 1, with_recon: bool = False):
    """Encode YUV420 planes as one VP8 key frame. ``force_bpred``
    makes every MB use 4x4 (B_PRED) mode search — exercises the
    context-coded bmode path. ``token_partitions`` (1/2/4/8) splits
    residual coding by MB row across that many partitions (§9.5) —
    exercises the decoder's multi-partition path. Returns the frame
    bytes, or
    ``(bytes, recon_dict)`` with the encoder's own reconstruction
    (loop-filtered exactly like the decoder) when ``with_recon``."""
    height, width = y.shape
    assert u.shape == v.shape == ((height + 1) // 2, (width + 1) // 2)
    ys = _pad_plane(y, 16)
    us = _pad_plane(u, 8)
    vs = _pad_plane(v, 8)
    mb_h, mb_w = ys.shape[0] // 16, ys.shape[1] // 16
    q = QuantFactors(qi, {})
    probs = DEFAULT_COEFF_PROBS

    ry, ru, rv = _alloc_planes(mb_w, mb_h)
    assert token_partitions in (1, 2, 4, 8)
    parts_log2 = token_partitions.bit_length() - 1
    be1 = BoolEncoder()
    be2s = [BoolEncoder() for _ in range(token_partitions)]
    _write_header(be1, qi, filter_type, filter_level, sharpness, parts_log2)

    above_nz = {
        "y": np.zeros(mb_w * 4, np.int8), "u": np.zeros(mb_w * 2, np.int8),
        "v": np.zeros(mb_w * 2, np.int8), "y2": np.zeros(mb_w, np.int8),
    }
    above_bmode = np.full(mb_w * 4, B_DC, np.int8)
    mb_info = {}
    hdr_like = {
        "filter_type": filter_type, "filter_level": filter_level,
        "sharpness": sharpness, "lf_delta_enabled": 0,
        "ref_lf_deltas": [0] * 4, "mode_lf_deltas": [0] * 4,
        "segmentation": {"enabled": 0, "abs_values": 0, "lf": [0] * 4},
    }

    for r in range(mb_h):
        left_nz = {"y": np.zeros(4, np.int8), "u": np.zeros(2, np.int8),
                   "v": np.zeros(2, np.int8), "y2": 0}
        left_bmode = np.full(4, B_DC, np.int8)
        be2 = be2s[r % token_partitions]  # §9.5 row -> partition map
        for c in range(mb_w):
            y0, x0 = r * 16, c * 16
            src = ys[y0:y0 + 16, x0:x0 + 16].astype(np.int64)

            if force_bpred:
                ymode = B_PRED
            else:
                best, ymode = None, DC_PRED
                above = ry[y0, 1 + x0:17 + x0]
                left = ry[1 + y0:17 + y0, x0]
                tl = ry[y0, x0]
                for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                    p16 = _pred16(m, above, left, tl, r > 0, c > 0, 16)
                    s = _sad(p16, src)
                    if best is None or s < best:
                        best, ymode = s, m
            has_y2 = ymode != B_PRED

            qblocks = np.zeros((16, 4, 4), np.int64)
            qy2 = np.zeros((4, 4), np.int64)
            submodes = np.full(16, _MODE_TO_B.get(ymode, B_DC), np.int8)

            if has_y2:
                above = ry[y0, 1 + x0:17 + x0]
                left = ry[1 + y0:17 + y0, x0]
                tl = ry[y0, x0]
                pred = _pred16(ymode, above, left, tl, r > 0, c > 0, 16)
                dcs = np.zeros((4, 4), np.int64)
                coeffs = np.zeros((16, 4, 4), np.int64)
                for i in range(16):
                    sr, sc = i // 4, i % 4
                    res = (
                        src[4 * sr:4 * sr + 4, 4 * sc:4 * sc + 4]
                        - pred[4 * sr:4 * sr + 4, 4 * sc:4 * sc + 4]
                    )
                    ct = fdct4x4(res)
                    dcs[sr, sc] = ct[0, 0]
                    coeffs[i] = ct
                qy2 = _quantize_block(fwht4x4(dcs), q.y2dc, q.y2ac)
                dq_y2 = qy2.copy()
                dq_y2[0, 0] *= q.y2dc
                dq_y2.reshape(16)[1:] *= q.y2ac
                y2out = iwht4x4(dq_y2)
                out = pred.copy()
                for i in range(16):
                    sr, sc = i // 4, i % 4
                    qb = _quantize_block(coeffs[i], q.y1dc, q.y1ac)
                    qb[0, 0] = 0  # DC travels in Y2
                    qblocks[i] = qb
                    dq = qb.copy()
                    dq.reshape(16)[1:] *= q.y1ac
                    dq[0, 0] = y2out[sr, sc]
                    out[4 * sr:4 * sr + 4, 4 * sc:4 * sc + 4] += idct4x4(dq)
                recon_y = np.clip(out, 0, 255)
            else:
                Wb = np.empty((17, 21), np.int64)
                Wb[0, 0] = ry[y0, x0]
                Wb[0, 1:21] = ry[y0, 1 + x0:21 + x0]
                Wb[1:17, 0] = ry[1 + y0:17 + y0, x0]
                tr_frozen = Wb[0, 17:21].copy()
                for i in range(16):
                    sr, sc = i // 4, i % 4
                    if sc < 3:
                        A = Wb[4 * sr, 1 + 4 * sc:9 + 4 * sc].copy()
                    else:
                        A = np.concatenate([Wb[4 * sr, 13:17], tr_frozen])
                    L = Wb[1 + 4 * sr:5 + 4 * sr, 4 * sc].copy()
                    P = Wb[4 * sr, 4 * sc]
                    sblk = src[4 * sr:4 * sr + 4, 4 * sc:4 * sc + 4]
                    best, bm, bpred = None, B_DC, None
                    for m in range(10):
                        p4 = _pred4(m, A, L, P)
                        s = _sad(p4, sblk)
                        if best is None or s < best:
                            best, bm, bpred = s, m, p4
                    submodes[i] = bm
                    qb = _quantize_block(
                        fdct4x4(sblk - bpred), q.y1dc, q.y1ac
                    )
                    qblocks[i] = qb
                    dq = qb.copy()
                    dq[0, 0] *= q.y1dc
                    dq.reshape(16)[1:] *= q.y1ac
                    Wb[1 + 4 * sr:5 + 4 * sr, 1 + 4 * sc:5 + 4 * sc] = (
                        np.clip(bpred + idct4x4(dq), 0, 255)
                    )
                recon_y = Wb[1:17, 1:17]

            # chroma mode search + transform
            cy, cx = r * 8, c * 8
            usrc = us[cy:cy + 8, cx:cx + 8].astype(np.int64)
            vsrc = vs[cy:cy + 8, cx:cx + 8].astype(np.int64)
            best, uvmode = None, DC_PRED
            for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pu = _pred16(m, ru[cy, 1 + cx:9 + cx], ru[1 + cy:9 + cy, cx],
                             ru[cy, cx], r > 0, c > 0, 8)
                pv = _pred16(m, rv[cy, 1 + cx:9 + cx], rv[1 + cy:9 + cy, cx],
                             rv[cy, cx], r > 0, c > 0, 8)
                s = _sad(pu, usrc) + _sad(pv, vsrc)
                if best is None or s < best:
                    best, uvmode = s, m
            qu = np.zeros((4, 4, 4), np.int64)
            qv_ = np.zeros((4, 4, 4), np.int64)
            recon_uv = {}
            for name, plane, srcp, qarr in (
                ("u", ru, usrc, qu), ("v", rv, vsrc, qv_)
            ):
                pred = _pred16(uvmode, plane[cy, 1 + cx:9 + cx],
                               plane[1 + cy:9 + cy, cx], plane[cy, cx],
                               r > 0, c > 0, 8)
                out = pred.copy()
                for i in range(4):
                    sr, sc = i // 2, i % 2
                    res = (
                        srcp[4 * sr:4 * sr + 4, 4 * sc:4 * sc + 4]
                        - pred[4 * sr:4 * sr + 4, 4 * sc:4 * sc + 4]
                    )
                    qb = _quantize_block(fdct4x4(res), q.uvdc, q.uvac)
                    qarr[i] = qb
                    dq = qb.copy()
                    dq[0, 0] *= q.uvdc
                    dq.reshape(16)[1:] *= q.uvac
                    out[4 * sr:4 * sr + 4, 4 * sc:4 * sc + 4] += idct4x4(dq)
                recon_uv[name] = np.clip(out, 0, 255)

            skip = (
                int(np.abs(qblocks).sum() + np.abs(qu).sum()
                    + np.abs(qv_).sum() + np.abs(qy2).sum()) == 0
            )

            # ---- part 1: modes (same syntax order the decoder reads)
            be1.bool(128, int(skip))
            be1.tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode)
            if ymode == B_PRED:
                for i in range(16):
                    sr, sc = i // 4, i % 4
                    above_m = above_bmode[c * 4 + sc] if sr == 0 else (
                        submodes[i - 4]
                    )
                    left_m = left_bmode[sr] if sc == 0 else submodes[i - 1]
                    be1.tree(
                        BMODE_TREE, KF_BMODE_PROBS[above_m][left_m],
                        int(submodes[i]),
                    )
            be1.tree(UV_MODE_TREE, KF_UV_MODE_PROB, uvmode)
            above_bmode[c * 4:c * 4 + 4] = submodes[12:16]
            left_bmode[:] = submodes[3::4]

            # ---- part 2: tokens (context bookkeeping mirrors decode)
            if skip:
                left_nz["y"][:] = 0
                above_nz["y"][c * 4:c * 4 + 4] = 0
                left_nz["u"][:] = 0
                above_nz["u"][c * 2:c * 2 + 2] = 0
                left_nz["v"][:] = 0
                above_nz["v"][c * 2:c * 2 + 2] = 0
                if has_y2:
                    left_nz["y2"] = 0
                    above_nz["y2"][c] = 0
                has_coeffs = False
            else:
                has_coeffs = False
                if has_y2:
                    ctx = int(above_nz["y2"][c]) + int(left_nz["y2"])
                    nz = _encode_block(be2, probs[1], ctx, 0, qy2)
                    above_nz["y2"][c] = left_nz["y2"] = int(nz)
                    has_coeffs |= nz
                plane_t = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for i in range(16):
                    sr, sc = i // 4, i % 4
                    ctx = int(above_nz["y"][c * 4 + sc]) + int(
                        left_nz["y"][sr]
                    )
                    nz = _encode_block(
                        be2, probs[plane_t], ctx, first, qblocks[i]
                    )
                    above_nz["y"][c * 4 + sc] = left_nz["y"][sr] = int(nz)
                    has_coeffs |= nz
                for name, qarr in (("u", qu), ("v", qv_)):
                    for i in range(4):
                        sr, sc = i // 2, i % 2
                        ctx = int(above_nz[name][c * 2 + sc]) + int(
                            left_nz[name][sr]
                        )
                        nz = _encode_block(be2, probs[2], ctx, 0, qarr[i])
                        above_nz[name][c * 2 + sc] = int(nz)
                        left_nz[name][sr] = int(nz)
                        has_coeffs |= nz

            ry[1 + y0:17 + y0, 1 + x0:17 + x0] = recon_y.astype(np.uint8)
            _replicate_right_border(ry, r, c)
            ru[1 + cy:9 + cy, 1 + cx:9 + cx] = recon_uv["u"].astype(np.uint8)
            rv[1 + cy:9 + cy, 1 + cx:9 + cx] = recon_uv["v"].astype(np.uint8)
            mb_info[(r, c)] = _mb_filter_params(
                hdr_like, 0, ymode == B_PRED, has_coeffs
            )

    part1 = be1.getvalue()
    token_parts = [b.getvalue() for b in be2s]
    sizes = b"".join(
        len(pt).to_bytes(3, "little") for pt in token_parts[:-1]
    )
    tag = (0) | (1 << 4) | (len(part1) << 5)
    frame = (
        tag.to_bytes(3, "little")
        + b"\x9d\x01\x2a"
        + (width & 0x3FFF).to_bytes(2, "little")
        + (height & 0x3FFF).to_bytes(2, "little")
        + part1
        + sizes
        + b"".join(token_parts)
    )
    if not with_recon:
        return frame
    yv = ry[1:, 1:1 + mb_w * 16].copy()
    uv_ = ru[1:, 1:].copy()
    vv = rv[1:, 1:].copy()
    if filter_level > 0:
        _loop_filter_frame(
            yv, uv_, vv, mb_info, mb_w, mb_h, hdr_like
        )
    recon = {
        "y": yv[:height, :width],
        "u": uv_[: (height + 1) // 2, : (width + 1) // 2],
        "v": vv[: (height + 1) // 2, : (width + 1) // 2],
    }
    return frame, recon


# --------------------------------------------------- WebP container + RGB


def rgb_to_yuv420(rgb: np.ndarray):
    """BT.601 limited-range RGB -> YUV420 (the WebP/VP8 convention);
    integer arithmetic, chroma by 2x2 box average."""
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    h, w = y.shape
    H, W = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    rp = np.empty((H, W), np.int64)
    gp = np.empty((H, W), np.int64)
    bp = np.empty((H, W), np.int64)
    for src, dst in ((r, rp), (g, gp), (b, bp)):
        dst[:h, :w] = src
        dst[h:, :w] = src[h - 1:h, :]
        dst[:h, w:] = src[:, w - 1:w]
        dst[h:, w:] = src[h - 1, w - 1]
    r2 = (rp[0::2, 0::2] + rp[0::2, 1::2] + rp[1::2, 0::2]
          + rp[1::2, 1::2] + 2) >> 2
    g2 = (gp[0::2, 0::2] + gp[0::2, 1::2] + gp[1::2, 0::2]
          + gp[1::2, 1::2] + 2) >> 2
    b2 = (bp[0::2, 0::2] + bp[0::2, 1::2] + bp[1::2, 0::2]
          + bp[1::2, 1::2] + 2) >> 2
    u = ((-38 * r2 - 74 * g2 + 112 * b2 + 128) >> 8) + 128
    v = ((112 * r2 - 94 * g2 - 18 * b2 + 128) >> 8) + 128
    return (
        np.clip(y, 0, 255).astype(np.uint8),
        np.clip(u, 0, 255).astype(np.uint8),
        np.clip(v, 0, 255).astype(np.uint8),
    )


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Integer BT.601 limited-range inverse; chroma nearest-upsampled."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    c = y.astype(np.int64) - 16
    d = uu.astype(np.int64) - 128
    e = vv.astype(np.int64) - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    return np.stack(
        [np.clip(x, 0, 255).astype(np.uint8) for x in (r, g, b)], axis=-1
    )


def encode_webp_lossy(rgb: np.ndarray, *, qi: int = 40,
                      filter_level: int = 0, **kw) -> bytes:
    """RGB image -> lossy WebP bytes (RIFF container around one VP8
    key frame encoded by ``encode_vp8``)."""
    y, u, v = rgb_to_yuv420(rgb)
    frame = encode_vp8(y, u, v, qi=qi, filter_level=filter_level, **kw)
    chunk = b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def decode_vp8_rgb(frame: bytes) -> np.ndarray | None:
    out = decode_vp8(frame)
    if out is None:
        return None
    return yuv420_to_rgb(out["y"], out["u"], out["v"])
