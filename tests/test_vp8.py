"""VP8 key-frame codec (``functions/vp8.py``): bool-coder round trip,
transform sanity, encoder-reconstruction == decoder equality (the
analytic correctness proof — both run the same normative inverse
path), WebP container integration, and — when the system libwebp is
present — bit-exact interop against REAL libwebp-encoded streams
(validates the RFC 6386 tables, B_PRED prediction, token decode and
the in-loop filter against an independent implementation)."""

import ctypes

import numpy as np
import pytest

from aws_serverless_elt_pipeline_enterprise_ray.functions import vp8
from aws_serverless_elt_pipeline_enterprise_ray.functions.webp import decode_webp


def _gradient(h, w, seed):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return ((xx * 3 + yy * 5 + rng.integers(0, 30, (h, w))) % 256).astype(
        np.uint8
    )


def _yuv(h, w, seed):
    return (
        _gradient(h, w, seed),
        _gradient((h + 1) // 2, (w + 1) // 2, seed + 1),
        _gradient((h + 1) // 2, (w + 1) // 2, seed + 2),
    )


# ------------------------------------------------------------- primitives

def test_bool_coder_roundtrip():
    rng = np.random.default_rng(3)
    probs = rng.integers(1, 255, 5000).tolist()
    bits = rng.integers(0, 2, 5000).tolist()
    be = vp8.BoolEncoder()
    for p, b in zip(probs, bits):
        be.bool(p, b)
    data = be.getvalue()
    bd = vp8.BoolDecoder(data)
    got = [bd.bool(p) for p in probs]
    assert got == bits


def test_literals_and_trees_roundtrip():
    be = vp8.BoolEncoder()
    be.literal(7, 93)
    be.signed_literal(4, -11)
    for leaf in range(10):
        be.tree(vp8.BMODE_TREE, vp8.KF_BMODE_PROBS[2][3], leaf)
    data = be.getvalue()
    bd = vp8.BoolDecoder(data)
    assert bd.literal(7) == 93
    assert bd.signed_literal(4) == -11
    for leaf in range(10):
        assert bd.tree(vp8.BMODE_TREE, vp8.KF_BMODE_PROBS[2][3]) == leaf


def test_transforms():
    # flat residual -> DC-only forward; inverse distributes exactly
    f = vp8.fdct4x4(np.full((4, 4), 37))
    assert f[0, 0] == 8 * 37 and (f.reshape(16)[1:] == 0).all()
    assert (vp8.idct4x4(np.zeros((4, 4))) == 0).all()
    # iwht of a DC-only block spreads (t+3)>>3 to all positions
    blk = np.zeros((4, 4), np.int64)
    blk[0, 0] = 83
    assert (vp8.iwht4x4(blk) == (83 + 3) >> 3).all()
    # fdct/idct approximately invert (within quant-free rounding)
    rng = np.random.default_rng(5)
    res = rng.integers(-200, 200, (4, 4))
    back = vp8.idct4x4(vp8.fdct4x4(res))
    assert np.abs(back - res).max() <= 2


def test_tree_paths_cover_every_leaf():
    for leaf in range(10):
        path = vp8._tree_path(vp8.BMODE_TREE, leaf)
        assert path is not None
    for tok in range(12):
        assert vp8._tree_path(vp8.COEFF_TREE, tok) is not None


# ------------------------------------------ encoder == decoder (analytic)

@pytest.mark.parametrize("h,w", [(16, 16), (33, 47), (17, 90)])
@pytest.mark.parametrize("qi", [4, 60, 127])
def test_roundtrip_16x16_modes(h, w, qi):
    y, u, v = _yuv(h, w, h * w + qi)
    frame, recon = vp8.encode_vp8(y, u, v, qi=qi, with_recon=True)
    out = vp8.decode_vp8(frame)
    assert out is not None
    for p in "yuv":
        assert np.array_equal(out[p], recon[p]), p


@pytest.mark.parametrize("fl", [0, 20, 63])
def test_roundtrip_bpred_and_loop_filter(fl):
    y, u, v = _yuv(48, 64, 9 + fl)
    frame, recon = vp8.encode_vp8(
        y, u, v, qi=40, filter_level=fl, force_bpred=True, with_recon=True
    )
    out = vp8.decode_vp8(frame)
    assert out is not None
    for p in "yuv":
        assert np.array_equal(out[p], recon[p]), (p, fl)


def test_simple_filter_roundtrip():
    y, u, v = _yuv(32, 32, 77)
    frame, recon = vp8.encode_vp8(
        y, u, v, qi=30, filter_level=40, filter_type=1, with_recon=True
    )
    out = vp8.decode_vp8(frame)
    for p in "yuv":
        assert np.array_equal(out[p], recon[p]), p


def test_flat_image_reconstructs_exactly_and_skips():
    y = np.full((32, 32), 77, np.uint8)
    u = np.full((16, 16), 100, np.uint8)
    v = np.full((16, 16), 200, np.uint8)
    frame, recon = vp8.encode_vp8(y, u, v, qi=20, with_recon=True)
    out = vp8.decode_vp8(frame)
    # flat planes reconstruct flat (quantization may shift the level
    # by <=1; the Y level here survives exactly)
    assert np.unique(out["y"]).tolist() == [77]
    assert len(np.unique(out["u"])) == 1 and abs(int(out["u"][0, 0]) - 100) <= 1
    assert len(np.unique(out["v"])) == 1 and abs(int(out["v"][0, 0]) - 200) <= 1
    assert len(frame) < 200  # near-every MB skip-coded


def test_non_keyframe_and_garbage_return_none():
    assert vp8.decode_vp8(b"") is None
    assert vp8.decode_vp8(b"\x01\x00\x00" + b"\x9d\x01\x2a" + b"\x00" * 10) is None
    assert vp8.decode_vp8(bytes(100)) is None


# ------------------------------------------------------- container + RGB

def test_webp_lossy_container_decodes():
    # a smooth image: 4:2:0 chroma subsampling is benign there, so the
    # residual error is pure quantization (random RGB noise would be
    # dominated by the subsample itself)
    h, w = 40, 56
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    rgb = np.stack(
        [(xx * 2 + yy) % 200 + 20, (xx + yy * 2) % 200 + 20,
         ((xx + yy) // 2) % 200 + 20], -1
    ).astype(np.uint8)
    data = vp8.encode_webp_lossy(rgb, qi=20)
    out = decode_webp(data)
    assert out is not None and out.shape == (40, 56, 3)
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 6


def test_flat_rgb_container_near_exact():
    rgb = np.full((32, 32, 3), [120, 64, 200], np.uint8)
    out = decode_webp(vp8.encode_webp_lossy(rgb, qi=12))
    # flat planes reconstruct flat per MB; RGB round-trips within the
    # BT.601 integer conversion + one chroma quantization step (MBs
    # with different neighbor contexts may land one step apart)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3
    assert len(np.unique(out.reshape(-1, 3), axis=0)) <= 4


# ----------------------------------------------------- libwebp interop

def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        pytest.skip("libwebp not present on this system")
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def _lw_encode(lib, rgb, quality):
    h, w, _ = rgb.shape
    buf = ctypes.c_void_p()
    n = lib.WebPEncodeRGB(
        rgb.tobytes(), w, h, w * 3, float(quality), ctypes.byref(buf)
    )
    assert n > 0
    data = ctypes.string_at(buf, n)
    lib.WebPFree(buf)
    return data


def _lw_decode_yuv(lib, data):
    W, H = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    st, ust = ctypes.c_int(), ctypes.c_int()
    yp = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(W), ctypes.byref(H),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(st), ctypes.byref(ust),
    )
    assert yp
    w, h = W.value, H.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = np.ctypeslib.as_array(yp, shape=(h, st.value))[:, :w].copy()
    u = np.ctypeslib.as_array(up, shape=(ch, ust.value))[:, :cw].copy()
    v = np.ctypeslib.as_array(vp, shape=(ch, ust.value))[:, :cw].copy()
    lib.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    return y, u, v


def _vp8_payload(webp):
    off = 12
    while off + 8 <= len(webp):
        fourcc = webp[off:off + 4]
        size = int.from_bytes(webp[off + 4:off + 8], "little")
        if fourcc == b"VP8 ":
            return webp[off + 8:off + 8 + size]
        off += 8 + size + (size & 1)
    return None


@pytest.mark.parametrize("h,w", [(16, 16), (37, 53), (120, 160)])
@pytest.mark.parametrize("quality", [10, 50, 75, 95])
def test_interop_decode_libwebp_streams_bit_exact(h, w, quality):
    """Decode REAL libwebp-encoded lossy WebP (B_PRED modes, prob
    updates, loop filter all active) and match libwebp's own decoder
    output EXACTLY, plane for plane."""
    lib = _libwebp()
    rng = np.random.default_rng(h * w + quality)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    rgb = np.stack(
        [(xx * 5 + yy * 3) % 256, (xx + yy * 7) % 256,
         rng.integers(0, 256, (h, w))], -1
    ).astype(np.uint8)
    data = _lw_encode(lib, rgb, quality)
    mine = vp8.decode_vp8(_vp8_payload(data))
    assert mine is not None
    ly, lu, lv = _lw_decode_yuv(lib, data)
    assert np.array_equal(mine["y"], ly)
    assert np.array_equal(mine["u"], lu)
    assert np.array_equal(mine["v"], lv)


def test_decompression_bomb_guard():
    """A frame header claiming 16383x16383 (268 MP) is quarantined
    before the MB loop ever runs."""
    tag = (0 | (1 << 4) | (1 << 5)).to_bytes(3, "little")
    frame = (
        tag + b"\x9d\x01\x2a"
        + (16383).to_bytes(2, "little") + (16383).to_bytes(2, "little")
        + bytes(64)
    )
    assert vp8.decode_vp8(frame) is None


@pytest.mark.parametrize("nparts", [2, 4, 8])
def test_multi_token_partition_roundtrip(nparts):
    """The decoder's multi-partition path (MB row r reads partition
    r % N, sizes prefix) — libwebp encodes one partition by default,
    so only the in-repo encoder exercises this surface."""
    y, u, v = _yuv(80, 96, nparts)
    frame, recon = vp8.encode_vp8(
        y, u, v, qi=40, filter_level=15, token_partitions=nparts,
        with_recon=True,
    )
    out = vp8.decode_vp8(frame)
    assert out is not None
    for p in "yuv":
        assert np.array_equal(out[p], recon[p]), (p, nparts)


@pytest.mark.parametrize("h,w,quality", [(64, 48, 50), (120, 160, 75)])
def test_interop_segmentation_streams_bit_exact(h, w, quality):
    """Mixed-complexity images (flat quadrant + noise) push libwebp's
    encoder to ENABLE SEGMENTATION (per-MB segment ids, per-segment
    quantizers) — a decoder surface plain images never exercise; the
    pure decoder must still match libwebp's planes exactly."""
    lib = _libwebp()
    rng = np.random.default_rng(h + w + quality)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    rgb = np.stack(
        [(xx * 5 + yy * 3) % 256, (xx + yy * 7) % 256,
         rng.integers(0, 256, (h, w))], -1
    ).astype(np.uint8)
    rgb[: h // 2, : w // 2] = 128
    data = _lw_encode(lib, rgb, quality)
    pl = _vp8_payload(data)
    bd = vp8.BoolDecoder(pl[10:10 + (int.from_bytes(pl[0:3], "little") >> 5)])
    hdr = vp8._parse_header(bd)
    assert hdr["segmentation"]["enabled"], "fixture no longer segments"
    mine = vp8.decode_vp8(pl)
    ly, lu, lv = _lw_decode_yuv(lib, data)
    assert np.array_equal(mine["y"], ly)
    assert np.array_equal(mine["u"], lu)
    assert np.array_equal(mine["v"], lv)
