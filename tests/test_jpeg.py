"""JPEG decoder (baseline + progressive) vs analytic expectations: the test assembles
JPEG byte streams by hand (markers, CUSTOM canonical Huffman tables
carried in DHT, hand-coded entropy bits) and checks decoded pixels
against closed-form IDCT math written independently here - the decoder
never validates itself against itself."""

import numpy as np
import pytest

from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
    decode_image,
    decode_jpeg,
)

# --- tiny hand encoder (file structure + entropy bits) ---------------------

DC_BITS = [0, 0, 7] + [0] * 13          # categories 0..6 at length 3
DC_VALS = bytes(range(7))               # symbol s <-> code s
AC_BITS = [0, 2, 4, 2] + [0] * 12
AC_VALS = bytes([0x00, 0x01, 0x02, 0x11, 0x32, 0xE1, 0xF0, 0x21])
# canonical codes implied: len2: 00,01 -> 0x00,0x01 ; len3: 100..111 ->
# 0x02,0x11,0x32,0xE1 ; len4: 10000,10001 -> 0xF0,0x21
DC_CODE = {s: (3, s) for s in range(7)}
AC_CODE = {
    0x00: (2, 0), 0x01: (2, 1),
    0x02: (3, 4), 0x11: (3, 5), 0x32: (3, 6), 0xE1: (3, 7),
    0xF0: (4, 16), 0x21: (4, 17),
}

Q = 16  # flat quant table


class BW:
    def __init__(self):
        self.bits = []

    def code(self, lc):
        length, code = lc
        self.bits += [(code >> i) & 1 for i in range(length - 1, -1, -1)]

    def val(self, v, n):
        self.bits += [(v >> i) & 1 for i in range(n - 1, -1, -1)]

    def out(self) -> bytes:
        bits = self.bits + [1] * ((-len(self.bits)) % 8)
        raw = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in bits[i:i + 8]:
                b = (b << 1) | j
            raw.append(b)
        stuffed = bytearray()
        for b in raw:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)


def category(diff: int) -> tuple[int, int]:
    if diff == 0:
        return 0, 0
    n = abs(diff).bit_length()
    v = diff if diff > 0 else diff + (1 << n) - 1
    return n, v


def write_block(bw: BW, dc_diff: int, acs: list[tuple[int, int]]):
    """One 8x8 block: DC diff then (zigzag_pos, value) ACs in order."""
    n, v = category(dc_diff)
    bw.code(DC_CODE[n])
    bw.val(v, n)
    k = 1
    for pos, val in acs:
        run = pos - k
        while run > 15:
            bw.code(AC_CODE[0xF0])
            run -= 16
        n, v = category(val)
        sym = (run << 4) | n
        bw.code(AC_CODE[sym])
        bw.val(v, n)
        k = pos + 1
    if k <= 63:
        bw.code(AC_CODE[0x00])  # EOB


def seg(marker: int, body: bytes) -> bytes:
    return b"\xff" + bytes([marker]) + (len(body) + 2).to_bytes(2, "big") + body


def headers(h: int, w: int, comps: list[tuple[int, int]]) -> bytes:
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes([Q] * 64))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + DC_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + AC_VALS)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for i, (hs, vs) in enumerate(comps):
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    out += seg(0xC0, sof)
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    return out


def idct_ref(coef: np.ndarray) -> np.ndarray:
    """Textbook 8x8 inverse DCT (spec A.3.3), explicit loops."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4
    return out


def test_jpeg_dc_only_uniform_gray():
    bw = BW()
    write_block(bw, 32, [])  # DC coef 32*16=512 -> every pixel 512/8+128
    data = headers(8, 8, [(1, 1)]) + bw.out() + b"\xff\xd9"
    img = decode_jpeg(data)
    assert img is not None and img.shape == (8, 8, 3)
    assert (img == 192).all()
    assert decode_image(data) is not None  # dispatcher picks it up


def test_jpeg_ac_coefficients_match_textbook_idct():
    # DC 10 + ACs at zigzag positions 1 (u0,v1), 5 (u0,v2... per table)
    acs = [(1, 3), (5, -2), (20, 1)]
    bw = BW()
    write_block(bw, 10, acs)
    data = headers(8, 8, [(1, 1)]) + bw.out() + b"\xff\xd9"
    img = decode_jpeg(data)
    assert img is not None

    zig = np.array([
         0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ])
    coef = np.zeros(64)
    coef[zig[0]] = 10 * Q
    for pos, val in acs:
        coef[zig[pos]] = val * Q
    want = np.clip(np.round(idct_ref(coef.reshape(8, 8)) + 128), 0, 255)
    got = img[:, :, 0].astype(np.float64)  # grayscale replicated
    assert np.abs(got - want).max() <= 1  # rounding at the clip boundary
    assert (img[:, :, 0] == img[:, :, 1]).all()


def test_jpeg_color_420_mcu():
    """One 16x16 4:2:0 MCU, all DC-only: Y=192, Cb=+16, Cr=-16 around
    center - expected RGB from the JFIF conversion formula."""
    bw = BW()
    write_block(bw, 32, [])   # Y block 1: 512 -> 192
    write_block(bw, 0, [])    # Y blocks 2-4 carry the predictor
    write_block(bw, 0, [])
    write_block(bw, 0, [])
    write_block(bw, 8, [])    # Cb: 128 -> plane 144 (cb-128 = +16)
    write_block(bw, -8, [])   # Cr: -128 -> plane 112 (cr-128 = -16)
    data = headers(16, 16, [(2, 2), (1, 1), (1, 1)]) + bw.out() + b"\xff\xd9"
    img = decode_jpeg(data)
    assert img is not None and img.shape == (16, 16, 3)
    r = round(192 + 1.402 * -16)          # 170
    g = round(192 - 0.344136 * 16 - 0.714136 * -16)  # 198
    b = round(192 + 1.772 * 16)           # 220
    assert (img[:, :, 0] == r).all()
    assert (img[:, :, 1] == g).all()
    assert (img[:, :, 2] == b).all()


def test_jpeg_rejects_progressive_and_garbage():
    bw = BW()
    write_block(bw, 32, [])
    good = headers(8, 8, [(1, 1)]) + bw.out() + b"\xff\xd9"
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(progressive) is None
    assert decode_jpeg(good[:30]) is None
    assert decode_jpeg(b"\xff\xd8 nonsense") is None
    assert decode_jpeg(b"not jpeg") is None


def test_jpeg_restart_markers():
    """Two horizontal MCUs with DRI=1: an RST0 between them resets the
    DC predictor, so the second block's diff is absolute again."""
    bw1, bw2 = BW(), BW()
    write_block(bw1, 32, [])   # MCU 0 -> 192
    write_block(bw2, 16, [])   # MCU 1 after reset -> 16*16/8+128 = 160
    head = headers(8, 16, [(1, 1)])
    # inject DRI before SOS (rebuild: headers() puts SOS last)
    sos_at = head.rfind(b"\xff\xda")
    dri = seg(0xDD, (1).to_bytes(2, "big"))
    data = (
        head[:sos_at] + dri + head[sos_at:]
        + bw1.out() + b"\xff\xd0" + bw2.out() + b"\xff\xd9"
    )
    img = decode_jpeg(data)
    assert img is not None and img.shape == (8, 16, 3)
    assert (img[:, :8, 0] == 192).all()
    assert (img[:, 8:, 0] == 160).all()


# --- progressive (SOF2) -----------------------------------------------------
# A separate AC table for progressive scans: adds EOBn symbols.
# valid canonical spec (Kraft sum exactly 1): 1 len-2, 4 len-3,
# 2 len-4, 4 len-5 codes
PAC_BITS = [0, 1, 4, 2, 4] + [0] * 11
PAC_VALS = bytes(
    [0x00, 0x01, 0x02, 0x11, 0x32, 0xE1, 0xF0, 0x10, 0x20, 0x21, 0x31]
)
PAC_CODE = {
    0x00: (2, 0),
    0x01: (3, 2), 0x02: (3, 3), 0x11: (3, 4), 0x32: (3, 5),
    0xE1: (4, 12), 0xF0: (4, 13),
    0x10: (5, 28), 0x20: (5, 29), 0x21: (5, 30), 0x31: (5, 31),
}


def prog_headers(h: int, w: int, comps: list[tuple[int, int]]) -> bytes:
    """SOF2 headers WITHOUT a scan - scans are appended per test."""
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes([Q] * 64))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + DC_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(PAC_BITS) + PAC_VALS)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for i, (hs, vs) in enumerate(comps):
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    out += seg(0xC2, sof)
    return out


def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])  # DC table 0, AC table 0
    body += bytes([ss, se, (ah << 4) | al])
    return seg(0xDA, body)


def dc_first(bw: BW, diff: int):
    n, v = category(diff)
    bw.code(DC_CODE[n])
    bw.val(v, n)


def ac_first(bw: BW, acs: list[tuple[int, int]], band=(1, 63)):
    """AC first-pass for one block: (zigzag_pos, value) in order, then
    EOB (unless the last coef hits the band end)."""
    k = band[0]
    for pos, val in acs:
        run = pos - k
        while run > 15:
            bw.code(PAC_CODE[0xF0])
            run -= 16
        n, v = category(val)
        bw.code(PAC_CODE[(run << 4) | n])
        bw.val(v, n)
        k = pos + 1
    if k <= band[1]:
        bw.code(PAC_CODE[0x00])


def test_progressive_dc_then_ac_matches_baseline_math():
    """Two scans (DC first, then the full AC band) reproduce the same
    pixels as the equivalent baseline stream's analytic IDCT."""
    acs = [(1, 3), (5, -2), (20, 1)]
    bw_dc, bw_ac = BW(), BW()
    dc_first(bw_dc, 10)
    ac_first(bw_ac, acs)
    data = (
        prog_headers(8, 8, [(1, 1)])
        + sos([1], 0, 0, 0, 0) + bw_dc.out()
        + sos([1], 1, 63, 0, 0) + bw_ac.out()
        + b"\xff\xd9"
    )
    img = decode_jpeg(data)
    assert img is not None and img.shape == (8, 8, 3)

    zig = np.array([
         0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ])
    coef = np.zeros(64)
    coef[zig[0]] = 10 * Q
    for pos, val in acs:
        coef[zig[pos]] = val * Q
    want = np.clip(np.round(idct_ref(coef.reshape(8, 8)) + 128), 0, 255)
    assert np.abs(img[:, :, 0].astype(np.float64) - want).max() <= 1


def test_progressive_dc_successive_approximation():
    """DC 33 split across two scans: coarse (Al=1) sends 33>>1=16, the
    refinement (Ah=1, Al=0) appends the low bit. 33*16/8+128 = 194."""
    bw1, bw2 = BW(), BW()
    dc_first(bw1, 16)       # 33 >> 1
    bw2.bits += [1]         # DC refinement: one raw bit (the low bit)
    data = (
        prog_headers(8, 8, [(1, 1)])
        + sos([1], 0, 0, 0, 1) + bw1.out()
        + sos([1], 0, 0, 1, 0) + bw2.out()
        + b"\xff\xd9"
    )
    img = decode_jpeg(data)
    assert img is not None
    assert (img[:, :, 0] == 194).all()


def test_progressive_ac_refinement_correction_bits():
    """AC successive approximation: coarse pass puts coef[zig1]=2
    (sends 1 at Al=1); the refinement corrects it to 3 AND introduces a
    new coefficient +1 at the next zero-history position (zig2)."""
    bw_dc, bw_c, bw_r = BW(), BW(), BW()
    dc_first(bw_dc, 10)
    ac_first(bw_c, [(1, 1)])            # at Al=1 -> coef value 2
    # refinement scan bits, exactly in decode order:
    bw_r.code(PAC_CODE[0x01])           # run=0, size=1: a NEW coefficient
    bw_r.bits += [1]                    # its sign bit (positive -> +1)
    bw_r.bits += [1]                    # correction bit for nonzero zig1 (2->3)
    bw_r.code(PAC_CODE[0x00])           # EOB1: rest of band is history-only
    data = (
        prog_headers(8, 8, [(1, 1)])
        + sos([1], 0, 0, 0, 0) + bw_dc.out()
        + sos([1], 1, 63, 0, 1) + bw_c.out()
        + sos([1], 1, 63, 1, 0) + bw_r.out()
        + b"\xff\xd9"
    )
    img = decode_jpeg(data)
    assert img is not None

    zig = np.array([
         0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ])
    coef = np.zeros(64)
    coef[zig[0]] = 10 * Q
    coef[zig[1]] = 3 * Q   # 2 corrected to 3
    coef[zig[2]] = 1 * Q   # newly significant in the refinement pass
    want = np.clip(np.round(idct_ref(coef.reshape(8, 8)) + 128), 0, 255)
    assert np.abs(img[:, :, 0].astype(np.float64) - want).max() <= 1


def test_progressive_eobrun_spans_blocks():
    """EOB2 (r=1 + 1 appended bit) ends block 1's band AND skips all of
    block 2; block 3 carries its own coefficient. 8x24 grayscale."""
    bw_dc, bw_ac = BW(), BW()
    for diff in (32, -16, 0):   # DC: 512, 256, 256
        dc_first(bw_dc, diff)
    # block 1: one AC then EOB2 (covers blocks 1 and 2)
    bw_ac.code(PAC_CODE[0x01]); bw_ac.val(1, 1)     # coef zig1 = +1
    bw_ac.code(PAC_CODE[0x10]); bw_ac.bits += [0]   # EOBRUN = 2-1+0 = 1
    # block 2: skipped entirely by the EOB run
    # block 3: one AC then EOB1
    bw_ac.code(PAC_CODE[0x21]); bw_ac.val(1, 1)     # run 2 -> coef zig3 = +1
    bw_ac.code(PAC_CODE[0x00])
    data = (
        prog_headers(8, 24, [(1, 1)])
        + sos([1], 0, 0, 0, 0) + bw_dc.out()
        + sos([1], 1, 63, 0, 0) + bw_ac.out()
        + b"\xff\xd9"
    )
    img = decode_jpeg(data)
    assert img is not None and img.shape == (8, 24, 3)
    # DC-only expectations for block 2 (exactly uniform 256*16/8? no -
    # 256 quantized: 32*16=512 -> block1 avg 192; block2/3: 16*16=256/8
    # +128 = 160). Blocks 2 has NO AC -> uniform 160.
    assert (img[:, 8:16, 0] == 160).all()
    # blocks 1 and 3 differ from uniform by their single AC coefficient
    assert img[:, :8, 0].std() > 0
    assert img[:, 16:, 0].std() > 0


def test_progressive_color_420_matches_baseline():
    """Interleaved DC scan + three per-component AC scans reproduce the
    baseline 4:2:0 color test's exact RGB."""
    bw_dc = BW()
    for diff in (32, 0, 0, 0, 8, -8):   # MCU order: 4xY, Cb, Cr
        dc_first(bw_dc, diff)
    y_ac, cb_ac, cr_ac = BW(), BW(), BW()
    # Y: 4 blocks in the component grid; EOB4 = r=2 + 2 bits
    y_ac.code(PAC_CODE[0x20]); y_ac.bits += [0, 0]  # EOBRUN = 4-1+0
    cb_ac.code(PAC_CODE[0x00])
    cr_ac.code(PAC_CODE[0x00])
    data = (
        prog_headers(16, 16, [(2, 2), (1, 1), (1, 1)])
        + sos([1, 2, 3], 0, 0, 0, 0) + bw_dc.out()
        + sos([1], 1, 63, 0, 0) + y_ac.out()
        + sos([2], 1, 63, 0, 0) + cb_ac.out()
        + sos([3], 1, 63, 0, 0) + cr_ac.out()
        + b"\xff\xd9"
    )
    img = decode_jpeg(data)
    assert img is not None and img.shape == (16, 16, 3)
    r = round(192 + 1.402 * -16)
    g = round(192 - 0.344136 * 16 - 0.714136 * -16)
    b = round(192 + 1.772 * 16)
    assert (img[:, :, 0] == r).all()
    assert (img[:, :, 1] == g).all()
    assert (img[:, :, 2] == b).all()
