"""Optional libwebp fast path for WebP decode.

At 100-TB scale the decode stage is throughput-bound: the pure-Python
codecs in ``webp.py`` / ``vp8.py`` exist to make correctness PROVABLE
(spec-conformant, encoder-round-trip and libwebp-bit-exact tested),
but a native decoder is ~100x faster per image. When the system
carries libwebp, ``decode_webp`` uses this ctypes binding first and
falls back to the pure codecs when the library is absent or refuses a
payload (e.g. animated containers) — behavior-preserving by
construction:

* lossless (VP8L) pixels are normative, so native RGB == pure RGB;
* lossy (VP8) planes are normative (``test_vp8`` proves the pure
  decoder bit-exact against libwebp), and the YUV->RGB conversion
  stays OURS: the fast path takes ``WebPDecodeYUV`` planes and feeds
  the same integer BT.601 inverse the pure path uses, so both paths
  emit IDENTICAL arrays and the SQL oracles hold under either.

``GRAFT_PURE_WEBP=1`` disables the fast path (the equality tests run
both). No import-time hard dependency: everything is guarded."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    for name in ("libwebp.so.7", "libwebp.so", "libwebp.dylib"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeYUV.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        except AttributeError:  # pragma: no cover - exotic build
            continue
        _LIB = lib
        break
    return _LIB


def _chunk_kinds(payload: bytes) -> set:
    kinds = set()
    off = 12
    while off + 8 <= len(payload):
        kinds.add(payload[off:off + 4])
        size = int.from_bytes(payload[off + 4:off + 8], "little")
        off += 8 + size + (size & 1)
    return kinds


def decode_webp_native(payload: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB via libwebp, matching the pure path's
    output exactly; None when the library is absent, disabled via
    ``GRAFT_PURE_WEBP``, or the payload needs the pure walk (animated
    containers — libwebp's simple API refuses those)."""
    if os.environ.get("GRAFT_PURE_WEBP"):
        return None
    lib = _load()
    if lib is None or len(payload) < 20 or payload[:4] != b"RIFF":
        return None
    kinds = _chunk_kinds(payload)
    try:
        if b"VP8 " in kinds:
            # lossy: normative planes from libwebp + OUR BT.601 inverse
            W, H = ctypes.c_int(), ctypes.c_int()
            up = ctypes.POINTER(ctypes.c_uint8)()
            vp = ctypes.POINTER(ctypes.c_uint8)()
            st, ust = ctypes.c_int(), ctypes.c_int()
            yp = lib.WebPDecodeYUV(
                payload, len(payload), ctypes.byref(W), ctypes.byref(H),
                ctypes.byref(up), ctypes.byref(vp),
                ctypes.byref(st), ctypes.byref(ust),
            )
            if not yp:
                return None
            w, h = W.value, H.value
            cw, ch = (w + 1) // 2, (h + 1) // 2
            y = np.ctypeslib.as_array(yp, shape=(h, st.value))[:, :w].copy()
            u = np.ctypeslib.as_array(up, shape=(ch, ust.value))[:, :cw].copy()
            v = np.ctypeslib.as_array(vp, shape=(ch, ust.value))[:, :cw].copy()
            lib.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
            from .vp8 import yuv420_to_rgb

            return yuv420_to_rgb(y, u, v)
        if b"VP8L" in kinds:
            # lossless: pixels are normative; RGB identical either way
            W, H = ctypes.c_int(), ctypes.c_int()
            p = lib.WebPDecodeRGB(
                payload, len(payload), ctypes.byref(W), ctypes.byref(H)
            )
            if not p:
                return None
            w, h = W.value, H.value
            out = np.ctypeslib.as_array(p, shape=(h, w, 3)).copy()
            lib.WebPFree(ctypes.cast(p, ctypes.c_void_p))
            return out
        return None  # animated / unknown: pure walk handles it
    except (ValueError, OSError):  # pragma: no cover - defensive
        return None
