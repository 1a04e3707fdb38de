"""WebP-lossless (VP8L) codec, library-free, per the public "WebP
Lossless Bitstream Specification": RIFF/VP8L container walk, LSB-first
bit reading, canonical prefix codes (simple 1-2-symbol codes and full
code-length-coded codes with 16/17/18 RLE), LZ77 backward references
over the 24/40-symbol length/distance alphabets (including the 120-
entry 2D neighborhood distance map), color cache, meta prefix-code
groups, and all four transforms (predictor with its 14 modes, color,
subtract-green, color-indexing with sub-byte bundling).

``encode_webp_lossless`` is a REAL (spec-conformant, lossless) encoder
covering the same feature surface — it exists so decode correctness is
provable analytically in-repo: tests round-trip closed-form images
through every transform/code path and the ``image_webp_decode`` oracle
query verifies pixel sums value-for-value in SQL. Lossy VP8 decodes
through the full RFC 6386 key-frame codec in ``vp8.py`` (round-5):
bool decoder, B_PRED intra prediction, token/dequant/IWHT/IDCT, loop
filter — validated bit-exact against libwebp-encoded streams AND by
encoder-reconstruction equality (``test_vp8.py``).

Reference parity: the reference pipeline treats media as opaque S3
objects (lambdas/ingest/app.py:47-49); decode stages are
beyond-reference curation operators.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# bit I/O (LSB-first, per VP8L spec §"RIFF Header"/bitstream notes)
# --------------------------------------------------------------------------


class _BitReader:
    """LSB-first reader over a bit cursor; field reads slice the byte
    buffer once (``int.from_bytes``) instead of looping per bit."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        pos = self.pos
        end = pos + n
        if end > self.nbits:
            raise ValueError("vp8l: bitstream truncated")
        self.pos = end
        v = int.from_bytes(
            self.data[pos >> 3:(end + 7) >> 3], "little"
        ) >> (pos & 7)
        return v & ((1 << n) - 1)

    def read_bit(self) -> int:
        pos = self.pos
        if pos >= self.nbits:
            raise ValueError("vp8l: bitstream truncated")
        self.pos = pos + 1
        return (self.data[pos >> 3] >> (pos & 7)) & 1


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.bit = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.bytes.append(0)
            if (v >> i) & 1:
                self.bytes[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) % 8

    def getvalue(self) -> bytes:
        return bytes(self.bytes)


# --------------------------------------------------------------------------
# canonical prefix codes
# --------------------------------------------------------------------------

#: order in which code-length-code lengths are stored (spec constant)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

def _canonical_codes(lengths: list[int]) -> dict[int, int]:
    """DEFLATE-style canonical code assignment: symbols ascending
    within each length, codes counted up MSB-first."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = next_code[ln]
            next_code[ln] += 1
    return out


class _Lut:
    """Table-driven prefix decoder. ``table[next maxlen stream bits]``
    (LSB-first packing, i.e. first-read bit is bit 0 of the index)
    holds ``(sym << 4) | code_len``; -1 marks invalid codewords. One
    list lookup per symbol replaces the per-bit tree walk."""

    __slots__ = ("table", "mask")

    def __init__(self, table: list[int], mask: int):
        self.table = table
        self.mask = mask


def _build_tree(lengths: list[int]):
    """Prefix decoder for one code, always a ``_Lut``. A code with
    exactly one used symbol gets mask=0 / code_len=0: decoding
    consumes zero bits (spec: simple code with one symbol)."""
    used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("vp8l: empty prefix code")
    if len(used) == 1:
        return _Lut([used[0][0] << 4], 0)
    codes = _canonical_codes(lengths)
    maxlen = max(ln for _, ln in used)
    if maxlen > 15:
        raise ValueError("vp8l: code length > 15")
    table = np.full(1 << maxlen, -1, np.int32)
    for sym, ln in used:
        code = codes[sym]
        if code >> ln:  # Kraft overflow: canonical code spilled over
            raise ValueError("vp8l: over-subscribed prefix code")
        rev = 0
        for b in range(ln):
            rev = (rev << 1) | ((code >> b) & 1)
        # the codeword owns every index whose low ln bits equal rev
        sl = table[rev::1 << ln]
        if (sl != -1).any():
            raise ValueError("vp8l: over-subscribed prefix code")
        sl[:] = (sym << 4) | ln
    return _Lut(table.tolist(), (1 << maxlen) - 1)


def _tree_decode(r: _BitReader, tree: _Lut) -> int:
    pos = r.pos
    i = pos >> 3
    # 3 bytes past the cursor byte always cover maxlen<=15 more bits
    v = (int.from_bytes(r.data[i:i + 3], "little") >> (pos & 7)) & tree.mask
    e = tree.table[v]
    if e < 0:
        raise ValueError("vp8l: invalid prefix code word")
    pos += e & 0xF
    if pos > r.nbits:
        raise ValueError("vp8l: bitstream truncated")
    r.pos = pos
    return e >> 4


def _read_prefix_code(r: _BitReader, alphabet_size: int):
    """One prefix code: simple (1-2 symbols) or code-length-coded."""
    if r.read_bit():  # simple
        num_symbols = r.read_bit() + 1
        first_8bit = r.read_bit()
        sym0 = r.read(8 if first_8bit else 1)
        if num_symbols == 1:
            return _Lut([sym0 << 4], 0)
        # two symbols: code 0 -> first symbol AS READ (not canonical)
        sym1 = r.read(8)
        return _Lut([(sym0 << 4) | 1, (sym1 << 4) | 1], 1)
    num_cl = 4 + r.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = r.read(3)
    cl_tree = _build_tree(cl_lengths)
    lengths = [0] * alphabet_size
    if r.read_bit():  # use max_symbol
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet_size
    sym = 0
    prev_len = 8
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = _tree_decode(r, cl_tree)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + r.read(2)
            for _ in range(rep):
                if sym >= alphabet_size:
                    break
                lengths[sym] = prev_len
                sym += 1
        elif cl == 17:
            sym += 3 + r.read(3)
        else:  # 18
            sym += 11 + r.read(7)
    return _build_tree(lengths)


# --------------------------------------------------------------------------
# LZ77 value coding (shared by the length and distance alphabets)
# --------------------------------------------------------------------------


def _lz77_decode_value(r: _BitReader, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + r.read(extra) + 1


def _lz77_encode_value(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + ((v >> extra) & 1) + 2, value - offset - 1, extra


#: 2D neighborhood distance map (spec table, 120 entries). The spec
#: orders candidates (x in -7..8, y in 0..7, upper half-plane, (0,0)
#: and non-positive x on y=0 excluded) by squared distance, then
#: larger y first, then positive x before negative — reconstructed and
#: length-asserted rather than transcribed.
_DIST_MAP = sorted(
    [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if (y > 0 or x > 0)
    ],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -np.sign(p[0])),
)
assert len(_DIST_MAP) == 120


def _plane_distance(code: int, width: int) -> int:
    """Distance-code value -> scan-line distance
    (dist = xoffset + yoffset * xsize, clamped to >= 1)."""
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dx + dy * width)


# --------------------------------------------------------------------------
# transforms (inverse = decode side)
# --------------------------------------------------------------------------


def _avg2(a, b):
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """One pixel's predictor (ARGB int32 vectors)."""
    if mode == 0:
        return np.array([255, 0, 0, 0], np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        pL = int(np.abs(p - L).sum())
        pT = int(np.abs(p - T).sum())
        return L if pL < pT else T
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(
            L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32),
            0, 255,
        )
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        d = ave.astype(np.int32) - TL.astype(np.int32)
        # C integer division truncates toward zero
        half = np.trunc(d / 2).astype(np.int32)
        return np.clip(ave + half, 0, 255)
    raise ValueError(f"vp8l: bad predictor mode {mode}")


def _inverse_predictor(argb: np.ndarray, modes: np.ndarray, bits: int):
    """In-place inverse predictor transform. argb: (h, w, 4) uint8
    residuals -> pixels; modes: per-block mode grid (green channel of
    the transform sub-image).

    Row-at-a-time: same-mode block runs with no left-dependency
    (modes 0/2/3/4/8/9 read only the previous row) apply as whole-run
    numpy ops; mode 1 (L) is a mod-256 cumsum; the left-dependent
    modes (5/6/7/10/11/12/13) fall back to a per-pixel loop over
    plain int channels (no per-pixel array allocation)."""
    h, w = argb.shape[:2]
    px = argb.astype(np.int32)
    modes_i = modes.astype(np.int64)
    for y in range(h):
        row = px[y]
        if y == 0:
            # (0,0) predicts black [255,0,0,0]; the rest of the top
            # row is forced mode L -> one cumsum mod 256
            row[0, 0] += 255
            np.cumsum(row, axis=0, out=row)
            row &= 0xFF
            continue
        prev = px[y - 1]
        row[0] = (row[0] + prev[0]) & 0xFF  # x==0 is forced mode T
        row0 = row[0].tolist()
        mrow = modes_i[y >> bits]
        x0 = 1
        while x0 < w:
            mode = int(mrow[x0 >> bits])
            # merge consecutive blocks sharing the mode into one run
            x1 = ((x0 >> bits) + 1) << bits
            while x1 < w and mrow[x1 >> bits] == mode:
                x1 = ((x1 >> bits) + 1) << bits
            x1 = min(x1, w)
            n = x1 - x0
            seg = row[x0:x1]
            if mode == 0:
                seg[:, 0] += 255
                seg &= 0xFF
            elif mode == 1:  # L: cumsum seeded by the left neighbor
                seg[0] = (seg[0] + row[x0 - 1]) & 0xFF
                np.cumsum(seg, axis=0, out=seg)
                seg &= 0xFF
            elif mode == 2:  # T
                seg += prev[x0:x1]
                seg &= 0xFF
            elif mode in (3, 9):  # TR / avg2(T, TR)
                # scan-order arithmetic: TR of the rightmost column
                # is the leftmost pixel of the SAME row
                tr = np.empty((n, 4), np.int32)
                m = min(x1 + 1, w) - (x0 + 1)
                tr[:m] = prev[x0 + 1:x0 + 1 + m]
                if x1 == w:
                    tr[-1] = row[0]
                seg += tr if mode == 3 else (prev[x0:x1] + tr) >> 1
                seg &= 0xFF
            elif mode == 4:  # TL
                seg += prev[x0 - 1:x1 - 1]
                seg &= 0xFF
            elif mode == 8:  # avg2(TL, T)
                seg += (prev[x0 - 1:x1 - 1] + prev[x0:x1]) >> 1
                seg &= 0xFF
            elif 5 <= mode <= 13:
                # left-dependent: sequential, plain-int channels
                # unrolled (a, r, g, b) to avoid per-pixel list builds
                res = seg.tolist()
                prevl = prev[x0 - 1:min(x1 + 1, w)].tolist()
                la, lr, lg, lb = row[x0 - 1].tolist()
                last = n - 1 if x1 == w else -1
                for i in range(n):
                    tla, tlr, tlg, tlb = prevl[i]
                    ta, tr_, tg, tb = prevl[i + 1]
                    if mode == 7:
                        pa = (la + ta) >> 1
                        pr = (lr + tr_) >> 1
                        pg = (lg + tg) >> 1
                        pb = (lb + tb) >> 1
                    elif mode == 6:
                        pa = (la + tla) >> 1
                        pr = (lr + tlr) >> 1
                        pg = (lg + tlg) >> 1
                        pb = (lb + tlb) >> 1
                    elif mode == 11:  # Select
                        pl = (abs(ta - tla) + abs(tr_ - tlr)
                              + abs(tg - tlg) + abs(tb - tlb))
                        pt = (abs(la - tla) + abs(lr - tlr)
                              + abs(lg - tlg) + abs(lb - tlb))
                        if pl < pt:
                            pa, pr, pg, pb = la, lr, lg, lb
                        else:
                            pa, pr, pg, pb = ta, tr_, tg, tb
                    elif mode == 12:  # ClampAddSubtractFull
                        pa = min(255, max(0, la + ta - tla))
                        pr = min(255, max(0, lr + tr_ - tlr))
                        pg = min(255, max(0, lg + tg - tlg))
                        pb = min(255, max(0, lb + tb - tlb))
                    elif mode == 13:  # ClampAddSubtractHalf
                        ave = (la + ta) >> 1
                        d = ave - tla
                        pa = min(255, max(
                            0, ave + (d // 2 if d >= 0 else -((-d) // 2))
                        ))
                        ave = (lr + tr_) >> 1
                        d = ave - tlr
                        pr = min(255, max(
                            0, ave + (d // 2 if d >= 0 else -((-d) // 2))
                        ))
                        ave = (lg + tg) >> 1
                        d = ave - tlg
                        pg = min(255, max(
                            0, ave + (d // 2 if d >= 0 else -((-d) // 2))
                        ))
                        ave = (lb + tb) >> 1
                        d = ave - tlb
                        pb = min(255, max(
                            0, ave + (d // 2 if d >= 0 else -((-d) // 2))
                        ))
                    else:  # 5 / 10 need TR
                        ra, rr, rg, rb = (
                            row0 if i == last else prevl[i + 2]
                        )
                        if mode == 5:
                            pa = (((la + ra) >> 1) + ta) >> 1
                            pr = (((lr + rr) >> 1) + tr_) >> 1
                            pg = (((lg + rg) >> 1) + tg) >> 1
                            pb = (((lb + rb) >> 1) + tb) >> 1
                        else:  # 10
                            pa = (((la + tla) >> 1) + ((ta + ra) >> 1)) >> 1
                            pr = (((lr + tlr) >> 1) + ((tr_ + rr) >> 1)) >> 1
                            pg = (((lg + tlg) >> 1) + ((tg + rg) >> 1)) >> 1
                            pb = (((lb + tlb) >> 1) + ((tb + rb) >> 1)) >> 1
                    ca, cr, cg, cb = res[i]
                    la = (ca + pa) & 0xFF
                    lr = (cr + pr) & 0xFF
                    lg = (cg + pg) & 0xFF
                    lb = (cb + pb) & 0xFF
                    res[i] = (la, lr, lg, lb)
                seg[:] = res
            else:
                raise ValueError(f"vp8l: bad predictor mode {mode}")
            x0 = x1
    argb[:] = px.astype(np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (arithmetic)."""
    return (t.astype(np.int8).astype(np.int32)
            * c.astype(np.int8).astype(np.int32)) >> 5


def _inverse_color_transform(argb: np.ndarray, cte: np.ndarray, bits: int):
    """In-place inverse color transform. cte: (bh, bw, 4) sub-image
    pixels; red ch = red_to_blue, green ch = green_to_blue, blue ch =
    green_to_red (spec layout)."""
    h, w = argb.shape[:2]
    by = np.arange(h) >> bits
    bx = np.arange(w) >> bits
    g2r = cte[by][:, bx, 3]
    g2b = cte[by][:, bx, 2]
    r2b = cte[by][:, bx, 1]
    green = argb[:, :, 2]
    red = (argb[:, :, 1].astype(np.int32) + _ct_delta(g2r, green)) & 0xFF
    blue = (
        argb[:, :, 3].astype(np.int32)
        + _ct_delta(g2b, green)
        + _ct_delta(r2b, red.astype(np.uint8))
    ) & 0xFF
    argb[:, :, 1] = red.astype(np.uint8)
    argb[:, :, 3] = blue.astype(np.uint8)


def _inverse_subtract_green(argb: np.ndarray):
    g = argb[:, :, 2].astype(np.int32)
    argb[:, :, 1] = ((argb[:, :, 1] + g) & 0xFF).astype(np.uint8)
    argb[:, :, 3] = ((argb[:, :, 3] + g) & 0xFF).astype(np.uint8)


def _palette_width_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def _decode_image_stream(
    r: _BitReader, w: int, h: int, top_level: bool
) -> np.ndarray:
    """Spec DecodeImageStream -> (h, w, 4) uint8 ARGB."""
    transforms = []  # applied in reverse order after decode
    xsize = w
    if top_level:
        seen = set()
        while r.read_bit():
            ttype = r.read(2)
            if ttype in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(ttype)
            if ttype == 0:  # predictor
                bits = r.read(3) + 2
                bw = -(-xsize // (1 << bits))
                bh = -(-h // (1 << bits))
                sub = _decode_image_stream(r, bw, bh, False)
                transforms.append(("pred", bits, sub[:, :, 2]))
            elif ttype == 1:  # color transform
                bits = r.read(3) + 2
                bw = -(-xsize // (1 << bits))
                bh = -(-h // (1 << bits))
                sub = _decode_image_stream(r, bw, bh, False)
                transforms.append(("color", bits, sub))
            elif ttype == 2:  # subtract green
                transforms.append(("subgreen",))
            else:  # color indexing
                n_colors = r.read(8) + 1
                pal_img = _decode_image_stream(r, n_colors, 1, False)
                # palette entries are component-wise cumulative sums
                pal = np.cumsum(
                    pal_img[0].astype(np.int64), axis=0
                ).astype(np.uint8)
                wb = _palette_width_bits(n_colors)
                transforms.append(("palette", wb, pal, xsize))
                xsize = -(-xsize // (1 << wb))

    # color cache
    cache_bits = r.read(4) if r.read_bit() else 0
    if cache_bits and not (1 <= cache_bits <= 11):
        raise ValueError("vp8l: bad color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # meta prefix-code groups (top level only)
    entropy = None
    hbits = 0
    n_groups = 1
    if top_level and r.read_bit():
        hbits = r.read(3) + 2
        ew = -(-xsize // (1 << hbits))
        eh = -(-h // (1 << hbits))
        entropy = _decode_image_stream(r, ew, eh, False)
        meta = (entropy[:, :, 1].astype(np.int32) << 8) | entropy[:, :, 2]
        n_groups = int(meta.max()) + 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            tuple(
                _read_prefix_code(r, s)
                for s in (green_size, 256, 256, 256, 40)
            )
        )

    # per-pixel group index, flattened once (beats 2D indexing per
    # symbol in the hot loop)
    meta_full = None
    if entropy is not None:
        meta = (entropy[:, :, 1].astype(np.int32) << 8) | entropy[:, :, 2]
        meta_full = meta[
            np.arange(h) >> hbits
        ][:, np.arange(xsize) >> hbits].ravel().tolist()

    out = [0] * (xsize * h)
    pos = 0
    total = xsize * h
    shift = 32 - cache_bits if cache_bits else 0
    # flatten each group to (table, mask) pairs for the inlined loop
    flat = [
        (g[0].table, g[0].mask, g[1].table, g[1].mask, g[2].table,
         g[2].mask, g[3].table, g[3].mask, g[4].table, g[4].mask)
        for g in groups
    ]
    gt, gm, rt, rm, bt, bm, at, am, dt, dm = flat[0]
    data = r.data
    nbits = r.nbits
    bpos = r.pos
    while pos < total:
        if meta_full is not None:
            gt, gm, rt, rm, bt, bm, at, am, dt, dm = flat[meta_full[pos]]
        # one 9-byte refill covers the worst case for a whole literal
        # (4 codes x 15 bits) or a whole backward reference
        # (code + 10 extra + code + 18 extra)
        i = bpos >> 3
        buf = int.from_bytes(data[i:i + 9], "little") >> (bpos & 7)
        e = gt[buf & gm]
        if e < 0:
            raise ValueError("vp8l: invalid prefix code word")
        n = e & 15
        s = e >> 4
        bpos += n
        buf >>= n
        if s < 256:  # literal (stream order: green, red, blue, alpha)
            e = rt[buf & rm]
            if e < 0:
                raise ValueError("vp8l: invalid prefix code word")
            red = e >> 4
            n = e & 15
            bpos += n
            buf >>= n
            e = bt[buf & bm]
            if e < 0:
                raise ValueError("vp8l: invalid prefix code word")
            blue = e >> 4
            n = e & 15
            bpos += n
            buf >>= n
            e = at[buf & am]
            if e < 0:
                raise ValueError("vp8l: invalid prefix code word")
            bpos += e & 15
            if bpos > nbits:
                raise ValueError("vp8l: bitstream truncated")
            px = ((e >> 4) << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[(0x1E35A7BD * px) % (1 << 32) >> shift] = px
        elif s < 256 + 24:  # LZ77 backward reference
            pc = s - 256
            if pc < 4:
                length = pc + 1
            else:
                nx = (pc - 2) >> 1
                length = (
                    ((2 + (pc & 1)) << nx) + (buf & ((1 << nx) - 1)) + 1
                )
                bpos += nx
                buf >>= nx
            e = dt[buf & dm]
            if e < 0:
                raise ValueError("vp8l: invalid prefix code word")
            pc = e >> 4
            n = e & 15
            bpos += n
            buf >>= n
            if pc < 4:
                dv = pc + 1
            else:
                nx = (pc - 2) >> 1
                dv = ((2 + (pc & 1)) << nx) + (buf & ((1 << nx) - 1)) + 1
                bpos += nx
            if bpos > nbits:
                raise ValueError("vp8l: bitstream truncated")
            dist = _plane_distance(dv, xsize)
            end = pos + length
            if dist > pos or end > total:
                raise ValueError("vp8l: backward reference out of range")
            if dist >= length:
                out[pos:end] = out[pos - dist:pos - dist + length]
            else:
                # overlapping copy repeats the trailing dist pixels
                pat = out[pos - dist:pos]
                rep, rem = divmod(length, dist)
                out[pos:end] = pat * rep + pat[:rem]
            if cache is not None:
                for px in out[pos:end]:
                    cache[(0x1E35A7BD * px) % (1 << 32) >> shift] = px
            pos = end
        else:  # color-cache hit
            if bpos > nbits:
                raise ValueError("vp8l: bitstream truncated")
            if cache is None:
                raise ValueError("vp8l: cache symbol without cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    if bpos > nbits:
        raise ValueError("vp8l: bitstream truncated")
    r.pos = bpos

    out32 = np.array(out, dtype=np.uint32).reshape(h, xsize)
    argb = np.zeros((h, xsize, 4), np.uint8)
    argb[:, :, 0] = (out32 >> 24).astype(np.uint8)
    argb[:, :, 1] = ((out32 >> 16) & 0xFF).astype(np.uint8)
    argb[:, :, 2] = ((out32 >> 8) & 0xFF).astype(np.uint8)
    argb[:, :, 3] = (out32 & 0xFF).astype(np.uint8)

    for t in reversed(transforms):
        if t[0] == "palette":
            _, wb, pal, full_w = t
            if wb:
                per = 1 << wb
                ibits = 8 >> wb
                mask = (1 << ibits) - 1
                idx = np.zeros((h, argb.shape[1] * per), np.int32)
                packed = argb[:, :, 2].astype(np.int32)
                for k in range(per):
                    idx[:, k::per] = (packed >> (k * ibits)) & mask
                idx = idx[:, :full_w]
            else:
                idx = argb[:, :, 2].astype(np.int32)
            safe = np.clip(idx, 0, len(pal) - 1)
            mapped = pal[safe]
            mapped[idx >= len(pal)] = 0  # out-of-range -> transparent black
            argb = mapped
        elif t[0] == "color":
            _inverse_color_transform(argb, t[2], t[1])
        elif t[0] == "subgreen":
            _inverse_subtract_green(argb)
        elif t[0] == "pred":
            _inverse_predictor(argb, t[2], t[1])
    return argb


def decode_webp(payload: bytes) -> np.ndarray | None:
    """Decode WebP -> (h, w, 3) uint8 RGB (alpha dropped, matching
    decode_png's convention). When the system carries libwebp, the
    ctypes fast path (``webp_native.py``) handles it ~100x faster with
    BIT-IDENTICAL output (lossy planes are normative and the YUV->RGB
    inverse stays ours); otherwise, or when it declines (animated
    containers), the pure codecs here decode: lossless ``VP8L`` in
    this module, lossy ``VP8 `` key frames through the full RFC 6386
    codec in ``vp8.py`` (bit-exact against libwebp). ``VP8X`` extended
    containers are walked to their inner image chunk; animated
    containers (``ANIM``/``ANMF``) yield their FIRST frame. None for
    non-WebP payloads and genuinely undecodable data."""
    from .webp_native import decode_webp_native

    if (
        len(payload) >= 20
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    ):
        native = decode_webp_native(payload)
        if native is not None:
            return native
    try:
        if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
            return None
        return _walk_chunks(payload, 12, len(payload))
    except (ValueError, IndexError, ZeroDivisionError):
        return None


def _walk_chunks(payload: bytes, off: int, end: int) -> np.ndarray | None:
    while off + 8 <= end:
        fourcc = payload[off:off + 4]
        size = int.from_bytes(payload[off + 4:off + 8], "little")
        body = payload[off + 8:off + 8 + size]
        if fourcc == b"VP8L":
            return _decode_vp8l(body)
        if fourcc == b"VP8 ":
            from .vp8 import decode_vp8_rgb

            return decode_vp8_rgb(body)
        if fourcc == b"ANMF" and size > 16:
            # animated frame: 16-byte frame header (x/y/w/h/duration/
            # flags) then the frame's own image chunks - decode the
            # FIRST frame encountered (thumbnail/feature convention)
            inner = _walk_chunks(payload, off + 8 + 16, off + 8 + size)
            if inner is not None:
                return inner
        # VP8X/ANIM/ALPH/EXIF/XMP/ICCP: keep walking
        off += 8 + size + (size & 1)
    return None


def _decode_vp8l(body: bytes) -> np.ndarray | None:
    if not body or body[0] != 0x2F:
        return None
    r = _BitReader(body)
    r.read(8)  # signature
    w = r.read(14) + 1
    h = r.read(14) + 1
    r.read_bit()  # alpha hint
    if r.read(3) != 0:  # version
        return None
    argb = _decode_image_stream(r, w, h, True)
    return argb[:, :, 1:4].copy()  # ARGB -> RGB


# --------------------------------------------------------------------------
# encoder (spec-conformant; exists to make decode provable in-repo)
# --------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Code lengths from frequencies (heap Huffman); falls back to a
    complete fixed-length code if the tree exceeds ``max_len``."""
    import heapq
    import itertools

    syms = sorted(s for s, f in freqs.items() if f > 0)
    if not syms:
        raise ValueError("empty alphabet")
    if len(syms) == 1:
        return {syms[0]: 1}
    cnt = itertools.count()
    heap = [(freqs[s], next(cnt), s) for s in syms]
    heapq.heapify(heap)
    parent: dict[int, object] = {}
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        node = object()
        parent[id(n1) if not isinstance(n1, int) else n1] = node
        parent[id(n2) if not isinstance(n2, int) else n2] = node
        heapq.heappush(heap, (f1 + f2, next(cnt), node))
    lengths = {}
    for s in syms:
        ln = 0
        node: object = s
        while (id(node) if not isinstance(node, int) else node) in parent:
            node = parent[id(node) if not isinstance(node, int) else node]
            ln += 1
        lengths[s] = ln
    if max(lengths.values()) > max_len:
        k = (len(syms) - 1).bit_length()
        n_short = (1 << k) - len(syms)
        lengths = {
            s: (k - 1 if i < n_short else k) for i, s in enumerate(syms)
        }
    return lengths


def _write_prefix_code(
    w: _BitWriter, lengths: dict[int, int], alphabet_size: int,
    rle: bool = False,
) -> dict[int, tuple[int, int]]:
    """Emit one prefix-code definition; returns {sym: (code, len)}."""
    used = sorted(lengths)
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    if len(used) <= 2 and all(s < 256 for s in used):
        w.write(1, 1)  # simple
        w.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 > 1:
            w.write(1, 1)
            w.write(s0, 8)
        else:
            w.write(0, 1)
            w.write(s0, 1)
        if len(used) == 2:
            w.write(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}  # zero bits on decode
        # code 0 -> first symbol as written (spec simple-code order)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    w.write(0, 1)  # full code
    # code-length sequence (optionally RLE-compressed)
    seq: list[tuple[int, int]] = []  # (cl_symbol, extra_payload)
    if rle:
        i = 0
        while i < alphabet_size:
            v = full[i]
            run = 1
            while i + run < alphabet_size and full[i + run] == v:
                run += 1
            if v == 0:
                n = run
                while n >= 11:
                    rep = min(n, 138)
                    seq.append((18, rep - 11))
                    n -= rep
                while n >= 3:
                    rep = min(n, 10)
                    seq.append((17, rep - 3))
                    n -= rep
                for _ in range(n):
                    seq.append((0, 0))
            else:
                seq.append((v, 0))
                n = run - 1
                while n >= 3:
                    rep = min(n, 6)
                    seq.append((16, rep - 3))
                    n -= rep
                for _ in range(n):
                    seq.append((v, 0))
            i += run
    else:
        seq = [(v, 0) for v in full]
    cl_freq: dict[int, int] = {}
    for s, _ in seq:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    # write the 19 3-bit code-length-code lengths in spec order
    num_cl = max(
        (i + 1 for i, s in enumerate(_CL_ORDER) if cl_lengths.get(s, 0)),
        default=4,
    )
    num_cl = max(num_cl, 4)
    w.write(num_cl - 4, 4)
    for i in range(num_cl):
        w.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    cl_full = [cl_lengths.get(s, 0) for s in range(19)]
    cl_used = [s for s in range(19) if cl_full[s]]
    if len(cl_used) == 1:
        cl_codes = {cl_used[0]: (0, 0)}
    else:
        cc = _canonical_codes(cl_full)
        cl_codes = {s: (cc[s], cl_full[s]) for s in cl_used}
    w.write(0, 1)  # no max_symbol shortcut
    for s, extra in seq:
        code, ln = cl_codes[s]
        for d in range(ln - 1, -1, -1):
            w.write((code >> d) & 1, 1)
        if s == 16:
            w.write(extra, 2)
        elif s == 17:
            w.write(extra, 3)
        elif s == 18:
            w.write(extra, 7)
    codes = _canonical_codes(full)
    return {s: (codes[s], full[s]) for s in used}


def _emit(w: _BitWriter, codes: dict[int, tuple[int, int]], sym: int):
    code, ln = codes[sym]
    for d in range(ln - 1, -1, -1):
        w.write((code >> d) & 1, 1)


def _encode_stream_literals(
    w: _BitWriter,
    argb: np.ndarray,
    *,
    top_level: bool = False,
    cache_bits: int = 0,
    lz77_rle: bool = False,
    rle_code_lengths: bool = False,
):
    """Entropy-image body: color-cache bit, no meta groups, one group
    of 5 prefix codes, literals (+ optional distance-1 RLE backrefs +
    cache hits)."""
    h, wd = argb.shape[:2]
    flat = argb.reshape(-1, 4).astype(np.uint32)
    px32 = (
        (flat[:, 0] << 24) | (flat[:, 1] << 16) | (flat[:, 2] << 8) | flat[:, 3]
    )
    n = len(px32)

    # plan the symbol stream
    ops = []  # ("lit", px) | ("copy", length) | ("cache", idx)
    cache = np.zeros(1 << cache_bits, np.uint32) if cache_bits else None
    cache_valid = np.zeros(1 << cache_bits, bool) if cache_bits else None
    i = 0
    while i < n:
        if lz77_rle and i > 0 and px32[i] == px32[i - 1]:
            run = 1
            while i + run < n and px32[i + run] == px32[i - 1 + run]:
                run += 1
            if run >= 3:
                # length prefix codes span values 1..4096 (24 codes);
                # longer runs must split into multiple copies
                full, rest = divmod(run, 4096)
                ops.extend([("copy", 4096)] * full)
                if rest:
                    ops.append(("copy", rest))
                if cache is not None:
                    for j in range(i, i + run):
                        hsh = (0x1E35A7BD * int(px32[j])) % (1 << 32) >> (
                            32 - cache_bits
                        )
                        cache[hsh] = px32[j]
                        cache_valid[hsh] = True
                i += run
                continue
        px = int(px32[i])
        if cache is not None:
            hsh = (0x1E35A7BD * px) % (1 << 32) >> (32 - cache_bits)
            if cache_valid[hsh] and cache[hsh] == px:
                ops.append(("cache", hsh))
                i += 1
                continue
            cache[hsh] = px
            cache_valid[hsh] = True
        ops.append(("lit", px))
        i += 1

    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for op in ops:
        if op[0] == "lit":
            px = op[1]
            gf[(px >> 8) & 0xFF] = gf.get((px >> 8) & 0xFF, 0) + 1
            rf[(px >> 16) & 0xFF] = rf.get((px >> 16) & 0xFF, 0) + 1
            bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
            af[px >> 24] = af.get(px >> 24, 0) + 1
        elif op[0] == "copy":
            pc, _, _ = _lz77_encode_value(op[1])
            gf[256 + pc] = gf.get(256 + pc, 0) + 1
            dpc, _, _ = _lz77_encode_value(1 + 120)  # distance 1
            df[dpc] = df.get(dpc, 0) + 1
        else:
            gf[256 + 24 + op[1]] = gf.get(256 + 24 + op[1], 0) + 1
    # decoder builds all five codes even if a side never fires
    for d in (rf, bf, af):
        if not d:
            d[0] = 1
    if not df:
        df[0] = 1

    if cache_bits:
        w.write(1, 1)
        w.write(cache_bits, 4)
    else:
        w.write(0, 1)
    if top_level:
        w.write(0, 1)  # no meta prefix groups (bit absent in sub-images)

    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gcodes = _write_prefix_code(
        w, _huffman_lengths(gf), green_size, rle=rle_code_lengths
    )
    rcodes = _write_prefix_code(w, _huffman_lengths(rf), 256,
                                rle=rle_code_lengths)
    bcodes = _write_prefix_code(w, _huffman_lengths(bf), 256,
                                rle=rle_code_lengths)
    acodes = _write_prefix_code(w, _huffman_lengths(af), 256,
                                rle=rle_code_lengths)
    dcodes = _write_prefix_code(w, _huffman_lengths(df), 40,
                                rle=rle_code_lengths)

    for op in ops:
        if op[0] == "lit":
            px = op[1]
            _emit(w, gcodes, (px >> 8) & 0xFF)
            _emit(w, rcodes, (px >> 16) & 0xFF)
            _emit(w, bcodes, px & 0xFF)
            _emit(w, acodes, px >> 24)
        elif op[0] == "copy":
            pc, ev, eb = _lz77_encode_value(op[1])
            _emit(w, gcodes, 256 + pc)
            w.write(ev, eb)
            dpc, dev, deb = _lz77_encode_value(121)  # plane code for dist 1
            _emit(w, dcodes, dpc)
            w.write(dev, deb)
        else:
            _emit(w, gcodes, 256 + 24 + op[1])


def encode_webp_lossless(
    rgb: np.ndarray,
    *,
    use_subtract_green: bool = False,
    predictor_mode: int | None = None,
    predictor_bits: int = 9,
    color_transform: tuple[int, int, int] | None = None,
    color_bits: int = 9,
    use_palette: bool = False,
    cache_bits: int = 0,
    lz77_rle: bool = False,
    rle_code_lengths: bool = False,
) -> bytes:
    """Spec-conformant VP8L encoding of an (h, w, 3) uint8 RGB image
    (opaque alpha). Transform flags select the forward transforms, in
    the spec's application order (palette, then subtract-green /
    color, then predictor is FORWARD order here; the decoder inverts
    in reverse); ``color_transform`` is a uniform
    (green_to_red, green_to_blue, red_to_blue) element."""
    h, wd = rgb.shape[:2]
    assert rgb.dtype == np.uint8 and rgb.ndim == 3 and rgb.shape[2] == 3
    w = _BitWriter()
    w.write(0x2F, 8)
    w.write(wd - 1, 14)
    w.write(h - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version

    argb = np.zeros((h, wd, 4), np.uint8)
    argb[:, :, 0] = 255
    argb[:, :, 1:] = rgb

    # transforms are signalled in the order written; the decoder
    # applies the INVERSES in reverse order, so we write them in the
    # same order we apply the forwards
    if use_palette:
        flat = np.ascontiguousarray(argb.reshape(-1, 4))
        as32 = flat.view(np.uint32).ravel()
        uniq, inv = np.unique(as32, return_inverse=True)
        pal = uniq.view(np.uint8).reshape(-1, 4)
        n_colors = len(pal)
        if n_colors > 256:
            raise ValueError("palette transform needs <= 256 colors")
        w.write(1, 1)
        w.write(3, 2)  # color indexing
        w.write(n_colors - 1, 8)
        # palette sub-image: component-wise deltas
        deltas = pal.astype(np.int16)
        deltas[1:] = (deltas[1:] - pal[:-1].astype(np.int16)) & 0xFF
        pal_img = deltas.astype(np.uint8).reshape(1, n_colors, 4)
        _encode_stream_literals(w, pal_img)
        # bundle indices into green channel
        wb = _palette_width_bits(n_colors)
        idx = inv.reshape(h, wd).astype(np.int32)
        if wb:
            per = 1 << wb
            ibits = 8 >> wb
            packed_w = -(-wd // per)
            padded = np.zeros((h, packed_w * per), np.int32)
            padded[:, :wd] = idx
            packed = np.zeros((h, packed_w), np.int32)
            for k in range(per):
                packed |= padded[:, k::per] << (k * ibits)
            idx = packed
        argb = np.zeros((h, idx.shape[1], 4), np.uint8)
        argb[:, :, 0] = 255
        argb[:, :, 2] = idx.astype(np.uint8)
        wd = idx.shape[1]
    if use_subtract_green:
        w.write(1, 1)
        w.write(2, 2)
        g = argb[:, :, 2].astype(np.int32)
        argb[:, :, 1] = ((argb[:, :, 1] - g) & 0xFF).astype(np.uint8)
        argb[:, :, 3] = ((argb[:, :, 3] - g) & 0xFF).astype(np.uint8)
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        w.write(1, 1)
        w.write(1, 2)
        w.write(color_bits - 2, 3)
        red0 = argb[:, :, 1]
        green0 = argb[:, :, 2]
        new_red = (
            red0.astype(np.int32)
            - _ct_delta(np.full_like(red0, g2r), green0)
        ) & 0xFF
        new_blue = (
            argb[:, :, 3].astype(np.int32)
            - _ct_delta(np.full_like(red0, g2b), green0)
            - _ct_delta(np.full_like(red0, r2b), red0)
        ) & 0xFF
        argb[:, :, 1] = new_red.astype(np.uint8)
        argb[:, :, 3] = new_blue.astype(np.uint8)
        bw = -(-wd // (1 << color_bits))
        bh = -(-h // (1 << color_bits))
        cte = np.zeros((bh, bw, 4), np.uint8)
        cte[:, :, 0] = 255
        cte[:, :, 1] = r2b & 0xFF
        cte[:, :, 2] = g2b & 0xFF
        cte[:, :, 3] = g2r & 0xFF
        _encode_stream_literals(w, cte)
    if predictor_mode is not None:
        w.write(1, 1)
        w.write(0, 2)
        w.write(predictor_bits - 2, 3)
        # forward pass over the CURRENT (post-prior-transform) planes;
        # lossless, so reconstructed neighbors == originals
        res4 = np.zeros_like(argb)
        px = argb.astype(np.int32)
        for y in range(h):
            for x in range(wd):
                if x == 0 and y == 0:
                    pred = np.array([255, 0, 0, 0], np.int32)
                elif y == 0:
                    pred = px[0, x - 1]
                elif x == 0:
                    pred = px[y - 1, 0]
                else:
                    L = px[y, x - 1]
                    T = px[y - 1, x]
                    TL = px[y - 1, x - 1]
                    TR = px[y - 1, x + 1] if x + 1 < wd else px[y, 0]
                    pred = _predict(predictor_mode, L, T, TL, TR)
                res4[y, x] = (px[y, x] - pred) & 0xFF
        argb = res4.astype(np.uint8)
        bw = -(-wd // (1 << predictor_bits))
        bh = -(-h // (1 << predictor_bits))
        mimg = np.zeros((bh, bw, 4), np.uint8)
        mimg[:, :, 0] = 255
        mimg[:, :, 2] = predictor_mode
        _encode_stream_literals(w, mimg)
    w.write(0, 1)  # no more transforms

    _encode_stream_literals(
        w, argb, top_level=True,
        cache_bits=cache_bits, lz77_rle=lz77_rle,
        rle_code_lengths=rle_code_lengths,
    )

    body = w.getvalue()
    riff_size = 4 + 8 + len(body) + (len(body) & 1)
    out = bytearray()
    out += b"RIFF" + riff_size.to_bytes(4, "little") + b"WEBP"
    out += b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        out += b"\x00"
    return bytes(out)
