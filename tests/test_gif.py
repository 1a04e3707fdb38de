"""GIF codec (``functions/gif.py``): LZW unit behavior, lossless
round trips across palette sizes and interlace, dispatch, and — when
the system carries giflib — decoding streams encoded by the REAL
giflib (cross-implementation validation, same pattern as WebP)."""

import ctypes
import os

import numpy as np
import pytest

from aws_serverless_elt_pipeline_enterprise_ray.functions.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
    decode_image,
    image_metadata,
)


def test_lzw_roundtrip_and_table_growth():
    rng = np.random.default_rng(5)
    for mcs in (2, 4, 8):
        for n in (1, 10, 5000, 20000):
            data = bytes(rng.integers(0, 1 << mcs, n, dtype=np.uint8))
            enc = lzw_encode(data, mcs)
            assert lzw_decode(enc, mcs, n) == data, (mcs, n)


def test_lzw_rejects_garbage():
    with pytest.raises(ValueError):
        lzw_decode(b"\xff\xff\xff", 12, 10)  # bad min code size
    # out-of-range first code
    with pytest.raises(ValueError):
        lzw_decode(bytes([0b11111110]), 2, 10)


@pytest.mark.parametrize("ncolors", [2, 16, 250])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_lossless(ncolors, interlace):
    rng = np.random.default_rng(ncolors + interlace)
    pal = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
    img = pal[rng.integers(0, ncolors, (61, 47))]
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out is not None and np.array_equal(out, img)


def test_too_many_colors_refused():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    if len(np.unique(img.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError, match="quantize"):
            encode_gif(img)


def test_dispatch_and_metadata():
    pal = np.array([[10, 20, 30], [200, 100, 0]], np.uint8)
    img = pal[np.random.default_rng(2).integers(0, 2, (20, 36))]
    data = encode_gif(img)
    assert np.array_equal(decode_image(data), img)
    meta = image_metadata(data)
    assert meta["format"] == "gif"
    assert (meta["width"], meta["height"]) == (36, 20)


def test_non_gif_returns_none():
    assert decode_gif(b"") is None
    assert decode_gif(b"GIF89a" + bytes(4)) is None
    assert decode_gif(bytes(64)) is None


# ----------------------------------------------------- giflib interop

def _giflib():
    for name in ("libgif.so.7", "libgif.so"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        pytest.skip("giflib absent")
    lib.EGifOpenFileName.restype = ctypes.c_void_p
    lib.EGifOpenFileName.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.GifMakeMapObject.restype = ctypes.c_void_p
    lib.GifMakeMapObject.argtypes = [ctypes.c_int, ctypes.c_char_p]
    lib.EGifPutScreenDesc.restype = ctypes.c_int
    lib.EGifPutScreenDesc.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p,
    ]
    lib.EGifPutImageDesc.restype = ctypes.c_int
    lib.EGifPutImageDesc.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.EGifPutLine.restype = ctypes.c_int
    lib.EGifPutLine.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.EGifCloseFile.restype = ctypes.c_int
    lib.EGifCloseFile.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
    ]
    return lib


@pytest.mark.parametrize("interlace", [0, 1])
def test_decodes_giflib_encoded_streams(tmp_path, interlace):
    """Encode with the SYSTEM giflib (its own LZW encoder, its own
    block layout) and decode with the pure decoder — pixels must match
    exactly (GIF is lossless for palettized input)."""
    lib = _giflib()
    rng = np.random.default_rng(77 + interlace)
    h, w, n = 45, 71, 64
    pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    idx = rng.integers(0, n, (h, w)).astype(np.uint8)
    img = pal[idx]

    path = str(tmp_path / "lib.gif").encode()
    err = ctypes.c_int()
    gf = lib.EGifOpenFileName(path, 0, ctypes.byref(err))
    assert gf, err.value
    cmap = lib.GifMakeMapObject(n, pal.tobytes())
    assert cmap
    assert lib.EGifPutScreenDesc(gf, w, h, 8, 0, cmap) == 1
    assert lib.EGifPutImageDesc(gf, 0, 0, w, h, interlace, None) == 1
    if interlace:
        # giflib expects rows in INTERLACED order when interlace=1
        order = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2),
        ])
        rows = idx[order]
    else:
        rows = idx
    for r in range(h):
        assert lib.EGifPutLine(gf, rows[r].tobytes(), w) == 1
    assert lib.EGifCloseFile(gf, ctypes.byref(err)) == 1

    data = open(path, "rb").read()
    out = decode_gif(data)
    assert out is not None
    assert np.array_equal(out, img)
    # and through the dispatch
    assert np.array_equal(decode_image(data), img)


def test_decompression_bomb_quarantined():
    """A hostile header claiming 65535x65535 must be quarantined
    (None) in milliseconds, not allocate gigabytes."""
    bomb = (
        b"GIF89a" + (65535).to_bytes(2, "little") * 2
        + bytes([0x80 | 7, 0, 0]) + bytes(768)
        + b"\x2c" + bytes(4) + (65535).to_bytes(2, "little") * 2
        + b"\x00" + b"\x08" + b"\x01\x00" + b"\x00\x3b"
    )
    assert decode_gif(bomb) is None
    assert decode_image(bomb) is None
