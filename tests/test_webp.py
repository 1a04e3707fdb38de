"""VP8L (lossless WebP) codec: analytic decode tests. Round-trips are
through the spec-conformant in-repo encoder over closed-form images;
hand-assembled bitstreams cover the decode-only paths the encoder
doesn't emit (as-read simple-code order, 2D neighborhood distances,
meta prefix-code groups, code-length RLE 16/17/18)."""

import numpy as np
import pytest

from aws_serverless_elt_pipeline_enterprise_ray.functions.webp import (
    _BitReader,
    _BitWriter,
    _decode_image_stream,
    _encode_stream_literals,
    _read_prefix_code,
    _tree_decode,
    _CL_ORDER,
    _DIST_MAP,
    decode_webp,
    encode_webp_lossless,
)


def _grad(h=16, w=16, base=(10, 70, 130)):
    return (
        np.arange(h)[:, None, None] * 3
        + np.arange(w)[None, :, None] * 5
        + np.array(base)[None, None, :]
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder round-trips (lossless: decode(encode(x)) == x exactly)
# ---------------------------------------------------------------------------


def test_roundtrip_plain_random():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)


def test_roundtrip_subtract_green_and_color_transform():
    img = _grad()
    for kw in (
        {"use_subtract_green": True},
        {"color_transform": (34, -20, 17)},
        {"use_subtract_green": True, "color_transform": (-5, 9, -31)},
    ):
        assert np.array_equal(
            decode_webp(encode_webp_lossless(img, **kw)), img
        ), kw


@pytest.mark.parametrize("mode", range(14))
def test_roundtrip_every_predictor_mode(mode):
    img = _grad()
    out = decode_webp(encode_webp_lossless(img, predictor_mode=mode))
    assert np.array_equal(out, img), f"predictor mode {mode}"


def test_roundtrip_predictor_multiblock():
    # 4-pixel blocks -> a 4x4 mode grid on a 16x16 image
    img = _grad()
    out = decode_webp(
        encode_webp_lossless(img, predictor_mode=11, predictor_bits=2)
    )
    assert np.array_equal(out, img)


def test_roundtrip_palette_bundling_all_widths():
    # 2, 4, 16 and 200 colors exercise width_bits 3 / 2 / 1 / 0
    for n in (2, 4, 16, 200):
        idx = (np.arange(12 * 9) % n).reshape(12, 9)
        img = np.stack(
            [(idx * 7) % 256, (idx * 13) % 256, (idx * 29) % 256], axis=2
        ).astype(np.uint8)
        out = decode_webp(encode_webp_lossless(img, use_palette=True))
        assert np.array_equal(out, img), f"{n} colors"


def test_roundtrip_color_cache_hits():
    # distant repeats (checkerboard) force cache symbols with RLE off
    img = np.zeros((8, 8, 3), np.uint8)
    img[(np.arange(8)[:, None] + np.arange(8)[None, :]) % 2 == 0] = (9, 40, 77)
    img[(np.arange(8)[:, None] + np.arange(8)[None, :]) % 2 == 1] = (200, 5, 1)
    out = decode_webp(encode_webp_lossless(img, cache_bits=4))
    assert np.array_equal(out, img)


def test_roundtrip_lz77_rle_and_rle_code_lengths():
    img = np.repeat(
        np.repeat(_grad(4, 4), 4, axis=0), 4, axis=1
    )  # 16x16 with long runs
    out = decode_webp(
        encode_webp_lossless(img, lz77_rle=True, rle_code_lengths=True)
    )
    assert np.array_equal(out, img)


def test_roundtrip_non_square_and_tiny():
    rng = np.random.default_rng(3)
    for shape in ((1, 1), (1, 7), (5, 2), (3, 17)):
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)


# ---------------------------------------------------------------------------
# hand-assembled decode-only paths
# ---------------------------------------------------------------------------


def test_simple_code_two_symbols_as_read_order():
    # spec: code 0 -> FIRST symbol as read, even when sym0 > sym1
    w = _BitWriter()
    w.write(1, 1)  # simple
    w.write(1, 1)  # two symbols
    w.write(1, 1)  # first symbol in 8 bits
    w.write(200, 8)
    w.write(3, 8)
    w.write(0, 1)  # next code word: 0 -> 200
    w.write(1, 1)  # then 1 -> 3
    r = _BitReader(w.getvalue())
    tree = _read_prefix_code(r, 256)
    assert _tree_decode(r, tree) == 200
    assert _tree_decode(r, tree) == 3


def test_code_length_rle_16_17_18():
    # code-length code over {8:1, 16:2, 18:2}; alphabet of 32 symbols:
    # literal 8, then 16(+3 -> repeat 8 six times), 18(+0 -> 11 zeros),
    # 18(+3 -> 14 zeros) => symbols 0..6 have length 8
    w = _BitWriter()
    w.write(0, 1)  # full code
    cl = {8: 1, 16: 2, 18: 2}
    num_cl = 14  # covers order positions of 18 (1), 16 (8), 8 (13)
    w.write(num_cl - 4, 4)
    for i in range(num_cl):
        w.write(cl.get(_CL_ORDER[i], 0), 3)
    w.write(0, 1)  # no max_symbol shortcut
    # canonical: 8 -> 0; 16 -> 10; 18 -> 11 (MSB-first)
    w.write(0, 1)  # '8'
    w.write(1, 1)
    w.write(0, 1)  # '16'
    w.write(3, 2)  # repeat 3+3=6
    w.write(1, 1)
    w.write(1, 1)  # '18'
    w.write(0, 7)  # 11 zeros
    w.write(1, 1)
    w.write(1, 1)  # '18'
    w.write(3, 7)  # 14 zeros
    # 7 used symbols, all length 8: canonical code of symbol 3 is
    # 00000011 (MSB-first)
    for b in (0, 0, 0, 0, 0, 0, 1, 1):
        w.write(b, 1)
    r = _BitReader(w.getvalue())
    tree = _read_prefix_code(r, 32)
    assert _tree_decode(r, tree) == 3


def test_neighborhood_distance_vertical_copy():
    # dist code VALUE 1 -> map entry (0,1) -> distance == width:
    # second row copies the first
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)
    row = np.array(
        [[(255, 1, 2, 3), (255, 4, 5, 6), (255, 7, 8, 9), (255, 10, 11, 12)]],
        np.uint8,
    )
    w = _BitWriter()
    # top-level stream for a 4x2 image: no transforms, entropy-coded
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta groups
    # green code: 12 literal greens is >2 symbols... use the encoder's
    # own prefix-code writer via a scratch literal stream is simpler —
    # so instead build codes directly:
    from aws_serverless_elt_pipeline_enterprise_ray.functions.webp import (
        _huffman_lengths,
        _write_prefix_code,
        _emit,
        _lz77_encode_value,
    )

    greens = {2: 1, 5: 1, 8: 1, 11: 1}
    lpc, lev, leb = _lz77_encode_value(4)  # copy length 4
    greens[256 + lpc] = 1
    gcodes = _write_prefix_code(w, _huffman_lengths(greens), 256 + 24)
    rcodes = _write_prefix_code(
        w, _huffman_lengths({1: 1, 4: 1, 7: 1, 10: 1}), 256
    )
    bcodes = _write_prefix_code(
        w, _huffman_lengths({3: 1, 6: 1, 9: 1, 12: 1}), 256
    )
    acodes = _write_prefix_code(w, _huffman_lengths({255: 1}), 256)
    dpc, dev, deb = _lz77_encode_value(1)  # distance VALUE 1 -> (0,1)
    dcodes = _write_prefix_code(w, _huffman_lengths({dpc: 1}), 40)
    for x in range(4):
        _emit(w, gcodes, int(row[0, x, 2]))
        _emit(w, rcodes, int(row[0, x, 1]))
        _emit(w, bcodes, int(row[0, x, 3]))
        _emit(w, acodes, 255)
    _emit(w, gcodes, 256 + lpc)
    w.write(lev, leb)
    _emit(w, dcodes, dpc)
    w.write(dev, deb)
    r = _BitReader(w.getvalue())
    argb = _decode_image_stream(r, 4, 2, True)
    assert np.array_equal(argb[0], row[0])
    assert np.array_equal(argb[1], row[0])  # vertical copy


def test_meta_prefix_groups_split_image():
    # 8x1 image, hbits=2: two meta blocks -> two prefix-code groups of
    # single-symbol codes; left half paints group 0's color, right
    # half group 1's
    w = _BitWriter()
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache
    w.write(1, 1)  # meta groups present
    w.write(0, 3)  # hbits = 2
    # entropy sub-image (2x1): meta codes 0 and 1 (green channel)
    entropy = np.zeros((1, 2, 4), np.uint8)
    entropy[0, 1, 2] = 1
    _encode_stream_literals(w, entropy)
    from aws_serverless_elt_pipeline_enterprise_ray.functions.webp import (
        _huffman_lengths,
        _write_prefix_code,
    )

    for g, rr, bb in ((42, 1, 2), (100, 3, 4)):
        _write_prefix_code(w, _huffman_lengths({g: 1}), 256 + 24)
        _write_prefix_code(w, _huffman_lengths({rr: 1}), 256)
        _write_prefix_code(w, _huffman_lengths({bb: 1}), 256)
        _write_prefix_code(w, _huffman_lengths({255: 1}), 256)
        _write_prefix_code(w, _huffman_lengths({0: 1}), 40)
    # all codes single-symbol: zero data bits follow
    r = _BitReader(w.getvalue())
    argb = _decode_image_stream(r, 8, 1, True)
    assert [tuple(p) for p in argb[0, :4]] == [(255, 1, 42, 2)] * 4
    assert [tuple(p) for p in argb[0, 4:]] == [(255, 3, 100, 4)] * 4


# ---------------------------------------------------------------------------
# rejection / dispatch
# ---------------------------------------------------------------------------


def test_rejects_garbage_and_lossy():
    assert decode_webp(b"") is None
    assert decode_webp(b"garbage bytes") is None
    assert decode_webp(b"RIFF\x00\x00\x00\x00WAVE") is None
    # lossy VP8 chunk: documented stub
    lossy = b"RIFF" + (12).to_bytes(4, "little") + b"WEBP" + b"VP8 " \
        + (4).to_bytes(4, "little") + b"\x00\x00\x00\x00"
    assert decode_webp(lossy) is None
    # truncated VP8L body
    good = encode_webp_lossless(_grad(4, 4))
    assert decode_webp(good[: len(good) - 3]) is None


def test_decode_image_dispatches_webp():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        decode_image,
    )

    img = _grad(8, 8)
    out = decode_image(encode_webp_lossless(img, use_subtract_green=True))
    assert np.array_equal(out, img)


def test_cross_validation_against_libwebp():
    """Independent oracle: libwebp-encoded lossless streams decode
    pixel-exact through our decoder, and libwebp decodes OUR encoder's
    streams pixel-exact (both directions). Skipped where the system
    library is absent — every other test in this file is library-free."""
    import ctypes

    import numpy as np
    import pytest

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        pytest.skip("libwebp not present")
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.WebPDecodeRGB.restype = ctypes.c_void_p
    lib.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]

    from aws_serverless_elt_pipeline_enterprise_ray.functions.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(5)
    cases = []
    yy, xx = np.mgrid[0:37, 0:53]
    cases.append(rng.integers(0, 256, (24, 31, 3)).astype(np.uint8))
    cases.append(
        np.stack([(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256], -1)
        .astype(np.uint8)
    )
    cases.append(np.full((16, 90, 3), 200, np.uint8))
    cases.append((rng.integers(0, 4, (40, 22, 3)) * 80).astype(np.uint8))
    for img in cases:
        h, w = img.shape[:2]
        out = ctypes.c_void_p()
        n = lib.WebPEncodeLosslessRGB(
            np.ascontiguousarray(img).tobytes(), w, h, w * 3,
            ctypes.byref(out),
        )
        assert n > 0
        payload = ctypes.string_at(out.value, n)
        lib.WebPFree(out)
        dec = decode_webp(payload)
        assert dec is not None and (dec == img).all()

        ours = encode_webp_lossless(
            img, use_subtract_green=True, cache_bits=4, lz77_rle=True
        )
        ww, hh = ctypes.c_int(), ctypes.c_int()
        ptr = lib.WebPDecodeRGB(ours, len(ours), ctypes.byref(ww),
                                ctypes.byref(hh))
        assert ptr, "libwebp rejected our stream"
        got = np.frombuffer(
            ctypes.string_at(ptr, ww.value * hh.value * 3), np.uint8
        ).reshape(hh.value, ww.value, 3)
        lib.WebPFree(ctypes.c_void_p(ptr))
        assert (got == img).all()
