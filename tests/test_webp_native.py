"""libwebp fast path (``webp_native.py``): must be BIT-IDENTICAL to
the pure codecs for every payload class (lossless variants, lossy at
several quantizers, libwebp-encoded streams), decline animated
containers (pure walk decodes their first frame), and vanish cleanly
when disabled via ``GRAFT_PURE_WEBP``."""

import ctypes
import os

import numpy as np
import pytest

from aws_serverless_elt_pipeline_enterprise_ray.functions import vp8
from aws_serverless_elt_pipeline_enterprise_ray.functions.webp import (
    decode_webp,
    encode_webp_lossless,
)
from aws_serverless_elt_pipeline_enterprise_ray.functions.webp_native import (
    decode_webp_native,
)


def _have_native():
    try:
        ctypes.CDLL("libwebp.so.7")
        return True
    except OSError:
        return False


def _pure(payload):
    os.environ["GRAFT_PURE_WEBP"] = "1"
    try:
        return decode_webp(payload)
    finally:
        os.environ.pop("GRAFT_PURE_WEBP", None)


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xx * 3 + yy) % 256, (xx + yy * 5) % 256,
         rng.integers(0, 256, (h, w))], -1
    ).astype(np.uint8)


@pytest.mark.parametrize("variant", range(5))
def test_native_equals_pure_lossless(variant):
    if not _have_native():
        pytest.skip("libwebp absent")
    img = _img(24, 31, variant)
    kw = [
        {},
        {"use_subtract_green": True},
        {"predictor_mode": 2, "cache_bits": 3},
        {"use_palette": False, "lz77_rle": True, "rle_code_lengths": True},
        {"cache_bits": 4},
    ][variant]
    payload = encode_webp_lossless(img, **kw)
    native = decode_webp_native(payload)
    pure = _pure(payload)
    assert native is not None and pure is not None
    assert np.array_equal(native, pure)
    assert np.array_equal(pure, img)  # lossless


@pytest.mark.parametrize("qi", [8, 40, 100])
def test_native_equals_pure_lossy(qi):
    if not _have_native():
        pytest.skip("libwebp absent")
    payload = vp8.encode_webp_lossy(_img(40, 56, qi), qi=qi, filter_level=12)
    native = decode_webp_native(payload)
    pure = _pure(payload)
    assert native is not None and pure is not None
    assert np.array_equal(native, pure)


def test_decode_webp_uses_fast_path_when_present():
    payload = vp8.encode_webp_lossy(_img(16, 16, 3), qi=20)
    out = decode_webp(payload)
    assert out is not None and out.shape == (16, 16, 3)
    assert np.array_equal(out, _pure(payload))


def test_env_kill_switch():
    os.environ["GRAFT_PURE_WEBP"] = "1"
    try:
        assert decode_webp_native(
            vp8.encode_webp_lossy(_img(16, 16, 1), qi=20)
        ) is None
    finally:
        os.environ.pop("GRAFT_PURE_WEBP", None)


def _animated_container(frame_chunk: bytes) -> bytes:
    """Minimal VP8X+ANIM+ANMF container around one frame chunk."""
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes([0x02]) + b"\x00" * 3 \
        + (15).to_bytes(3, "little") + (15).to_bytes(3, "little")
    anim = b"ANIM" + (6).to_bytes(4, "little") + b"\x00" * 6
    frame_hdr = (
        (0).to_bytes(3, "little") + (0).to_bytes(3, "little")
        + (15).to_bytes(3, "little") + (15).to_bytes(3, "little")
        + (100).to_bytes(3, "little") + bytes([0])
    )
    anmf_body = frame_hdr + frame_chunk
    anmf = b"ANMF" + len(anmf_body).to_bytes(4, "little") + anmf_body
    if len(anmf_body) & 1:
        anmf += b"\x00"
    riff = b"WEBP" + vp8x + anim + anmf
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def test_animated_first_frame_decodes_via_pure_walk():
    img = _img(16, 16, 9)
    lossy = vp8.encode_webp_lossy(img, qi=12)
    # extract the VP8 chunk from the plain container
    size = int.from_bytes(lossy[16:20], "little")
    frame_chunk = lossy[12:20 + size + (size & 1)]
    animated = _animated_container(frame_chunk)
    # native declines animated; decode_webp falls through to the walk
    assert decode_webp_native(animated) is None
    out = decode_webp(animated)
    assert out is not None and out.shape == (16, 16, 3)
    assert np.array_equal(out, decode_webp(lossy))


@pytest.mark.parametrize("content", ["noise", "grad", "palette", "repeat"])
def test_pure_vp8l_decodes_libwebp_lossless_streams(content):
    """The PURE VP8L decoder against REAL libwebp-encoded lossless
    streams (not just the in-repo encoder's output): libwebp's
    encoder mixes predictor modes, meta prefix groups and LZ77
    decisions our encoder never emits — pixels must still round-trip
    exactly (lossless is normative)."""
    if not _have_native():
        pytest.skip("libwebp absent")
    lib = ctypes.CDLL("libwebp.so.7")
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    rng = np.random.default_rng(hash(content) % 2**32)
    for (h, w) in [(1, 1), (7, 13), (61, 47)]:
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        if content == "noise":
            rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        elif content == "grad":
            rgb = np.stack(
                [(xx * 3 + yy) % 256, (xx + yy * 5) % 256,
                 (xx ^ yy) % 256], -1
            ).astype(np.uint8)
        elif content == "palette":
            pal = np.array(
                [[10, 200, 30], [250, 5, 80], [0, 0, 0], [255, 255, 255]],
                np.uint8,
            )
            rgb = pal[rng.integers(0, 4, (h, w))]
        else:
            rgb = np.repeat(
                rng.integers(0, 256, (1, w, 3)).astype(np.uint8), h, axis=0
            )
        buf = ctypes.c_void_p()
        n = lib.WebPEncodeLosslessRGB(
            rgb.tobytes(), w, h, w * 3, ctypes.byref(buf)
        )
        assert n > 0
        data = ctypes.string_at(buf, n)
        lib.WebPFree(buf)
        out = _pure(data)
        assert out is not None and np.array_equal(out, rgb), (content, h, w)
