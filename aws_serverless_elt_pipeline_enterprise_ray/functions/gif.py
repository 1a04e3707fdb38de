"""GIF codec, library-free, per the public GIF89a specification.

Decoder: header + logical screen descriptor, global/local color
tables, extension blocks (graphic control honored for the transparent
index; animations yield their FIRST image), interlaced row order
(four-pass), and the variable-width LZW decompressor (3-12 bit codes,
clear/EOI handling, 4096-entry table saturation). Output is
``(h, w, 3) uint8`` RGB — the transparent index resolves to its
palette color (alpha dropped, matching ``decode_png``'s convention).

``encode_gif`` is a REAL (spec-conformant, lossless for palettized
input) encoder — string-table LZW with proper width growth and table
reset — so decode correctness is provable analytically in-repo, and
``tests/test_gif.py`` additionally decodes streams encoded by the
SYSTEM giflib when present (true cross-implementation validation,
same pattern as the WebP codecs).

Reference parity: the reference treats media as opaque S3 objects
(``lambdas/ingest/app.py:47-49``); decode stages are beyond-reference
curation operators (SURVEY round-5)."""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------------------ LZW


class _LZWReader:
    """LSB-first bit reader over the concatenated data sub-blocks."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        pos = self.pos
        end = pos + n
        if end > self.nbits:
            raise ValueError("gif: LZW stream truncated")
        self.pos = end
        v = int.from_bytes(
            self.data[pos >> 3:(end + 7) >> 3], "little"
        ) >> (pos & 7)
        return v & ((1 << n) - 1)


def lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """GIF variable-width LZW: codes start at ``min_code_size + 1``
    bits, the table resets on CLEAR, saturates at 4096 entries, and
    decoding stops at EOI or when ``max_pixels`` indices are out."""
    if not (2 <= min_code_size <= 11):
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LZWReader(data)
    out = bytearray()

    def reset():
        return (
            [bytes([i]) for i in range(clear)] + [b"", b""],
            min_code_size + 1,
        )

    table, width = reset()
    prev: bytes | None = None
    while len(out) < max_pixels:
        try:
            code = r.read(width)
        except ValueError:
            break  # tolerated: emitted pixels stand (truncated stream)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:max_pixels])


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """String-table LZW encoder (the exact inverse contract of
    ``lzw_decode``): emits CLEAR first, grows width as the table
    fills, resets at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, (
            min_code_size + 1
        )

    table, nxt, width = fresh()
    emit(clear, width)
    s = b""
    for b in indices:
        cand = s + bytes([b])
        if cand in table:
            s = cand
            continue
        emit(table[s], width)
        if nxt < 4096:
            table[cand] = nxt
            nxt += 1
            if nxt - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, nxt, width = fresh()
        s = bytes([b])
    if s:
        emit(table[s], width)
    emit(eoi, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------------ decode


#: decompression-bomb guard: a corrupt/hostile header claiming huge
#: dimensions (GIF allows 65535x65535 = 4G pixels) must not allocate
#: gigabytes in a decode worker - beyond this, quarantine (None)
MAX_PIXELS = 64 << 20  # 64 MP


def decode_gif(payload: bytes) -> np.ndarray | None:
    """GIF -> (h, w, 3) uint8 RGB (first frame of animations), or
    None for non-GIF / corrupt / bomb-sized payloads."""
    try:
        return _decode_gif_inner(payload)
    except (ValueError, IndexError):
        return None


def _decode_gif_inner(payload: bytes) -> np.ndarray | None:
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg = payload[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(
            payload[pos:pos + 3 * n], np.uint8
        ).reshape(n, 3).copy()
        pos += 3 * n

    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks (skipped)
            pos += 1
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:  # not an image descriptor
            raise ValueError(f"gif: unknown block 0x{b:02x}")
        ix = int.from_bytes(payload[pos:pos + 2], "little")
        iy = int.from_bytes(payload[pos + 2:pos + 4], "little")
        iw = int.from_bytes(payload[pos + 4:pos + 6], "little")
        ih = int.from_bytes(payload[pos + 6:pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(
                payload[pos:pos + 3 * n], np.uint8
            ).reshape(n, 3).copy()
            pos += 3 * n
        if pal is None or iw == 0 or ih == 0:
            raise ValueError("gif: image without a color table")
        if iw * ih > MAX_PIXELS or sw * sh > MAX_PIXELS:
            raise ValueError("gif: dimensions exceed the bomb guard")
        mcs = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            lzw_decode(b"".join(chunks), mcs, iw * ih), np.uint8
        )
        if len(idx) < iw * ih:  # truncated: pad with background
            idx = np.concatenate(
                [idx, np.full(iw * ih - len(idx), bg, np.uint8)]
            )
        grid = idx.reshape(ih, iw)
        if iflags & 0x40:  # interlaced: 4-pass row order
            de = np.empty_like(grid)
            order = np.concatenate([
                np.arange(0, ih, 8), np.arange(4, ih, 8),
                np.arange(2, ih, 4), np.arange(1, ih, 2),
            ])
            de[order] = grid
            grid = de
        rgb = pal[np.clip(grid, 0, len(pal) - 1)]
        # compose the first frame onto the logical screen
        if (ix, iy, iw, ih) == (0, 0, sw, sh):
            return rgb
        screen = np.zeros((sh, sw, 3), np.uint8)
        if gct is not None and bg < len(gct):
            screen[:] = gct[bg]
        screen[iy:iy + ih, ix:ix + iw] = rgb[: sh - iy, : sw - ix]
        return screen
    return None


# ------------------------------------------------------------------ encode


def encode_gif(rgb: np.ndarray, *, interlace: bool = False) -> bytes:
    """RGB -> GIF89a bytes. The palette is built from the image's
    distinct colors (<= 256 required: the GIF contract; quantization
    is the caller's business) so the round trip is LOSSLESS."""
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"gif: {len(colors)} colors > 256 (quantize first)")
    depth = max(1, int(len(colors) - 1).bit_length())
    n = 1 << depth
    pal = np.zeros((n, 3), np.uint8)
    pal[: len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2),
        ])
        idx = idx[order]

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (depth - 1))  # GCT present, size
    out += bytes([0, 0])  # background, aspect
    out += pal.tobytes()
    out += b"\x2c" + bytes(4)  # image at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)
    mcs = max(2, depth)
    out.append(mcs)
    data = lzw_encode(idx.tobytes(), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
