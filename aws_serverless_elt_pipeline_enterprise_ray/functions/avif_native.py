"""Optional libavif binding: AVIF decode (and encode, for tests).

AVIF is an AV1-in-ISO-BMFF still image — a full AV1 intra decoder is
beyond what can be proven from scratch in-repo (its spec embeds
normative probability adaptation and loop-restoration state far past
the VP8 surface), so unlike WebP there is NO pure fallback: when the
system carries libavif (+ an AV1 codec), ``decode_avif`` decodes;
otherwise AVIF payloads stay undecodable and the media coverage
metrics count them, same contract as MP3.

The binding is ABI-SELF-VERIFYING rather than trusting a hardcoded
struct layout: at load time it probes ``avifRGBImage`` with the
library's own ``avifRGBImageSetDefaults`` / ``AllocatePixels`` on an
oversized zeroed buffer and checks the width/height/depth pattern and
that the pixel pointer + rowBytes appear at the expected 0.11-series
offsets (pixels @40, rowBytes @48); any mismatch disables the binding
cleanly instead of reading garbage. Only stable API surface is used:
the decoder/encoder structs stay opaque (``avifDecoderReadMemory``
fills a caller-provided image; ``avifImage`` is only read at offsets
0/4 for width/height and passed back verbatim)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_PIX_OFF, _RB_OFF, _BUFSZ = 40, 48, 512
_STATE: dict = {"tried": False, "lib": None}


def _load():
    if _STATE["tried"]:
        return _STATE["lib"]
    _STATE["tried"] = True
    if os.environ.get("GRAFT_NO_AVIF"):
        return None
    lib = None
    for name in ("libavif.so.15", "libavif.so", "libavif.dylib"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        return None
    try:
        for n, res, args in [
            ("avifImageCreate", ctypes.c_void_p,
             [ctypes.c_uint32] * 3 + [ctypes.c_int]),
            ("avifImageCreateEmpty", ctypes.c_void_p, []),
            ("avifImageDestroy", None, [ctypes.c_void_p]),
            ("avifRGBImageSetDefaults", None,
             [ctypes.c_void_p, ctypes.c_void_p]),
            ("avifRGBImageAllocatePixels", ctypes.c_int, [ctypes.c_void_p]),
            ("avifRGBImageFreePixels", None, [ctypes.c_void_p]),
            ("avifImageRGBToYUV", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_void_p]),
            ("avifImageYUVToRGB", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_void_p]),
            ("avifEncoderCreate", ctypes.c_void_p, []),
            ("avifEncoderDestroy", None, [ctypes.c_void_p]),
            ("avifEncoderWrite", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]),
            ("avifDecoderCreate", ctypes.c_void_p, []),
            ("avifDecoderDestroy", None, [ctypes.c_void_p]),
            ("avifDecoderReadMemory", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p,
              ctypes.c_size_t]),
            ("avifRWDataFree", None, [ctypes.c_void_p]),
        ]:
            f = getattr(lib, n)
            f.restype = res
            f.argtypes = args
    except AttributeError:
        return None
    if not _abi_ok(lib):
        return None
    _STATE["lib"] = lib
    return lib


def _abi_ok(lib) -> bool:
    """Probe avifRGBImage through the library's own initializers and
    verify the assumed field offsets before trusting them."""
    img = lib.avifImageCreate(24, 16, 8, 3)
    if not img:
        return False
    try:
        buf = (ctypes.c_uint8 * _BUFSZ)()
        lib.avifRGBImageSetDefaults(ctypes.byref(buf), img)
        raw = bytes(buf)
        if (
            int.from_bytes(raw[0:4], "little") != 24
            or int.from_bytes(raw[4:8], "little") != 16
            or int.from_bytes(raw[8:12], "little") != 8
        ):
            return False
        lib.avifRGBImageAllocatePixels(ctypes.byref(buf))
        raw = bytes(buf)
        ptr = int.from_bytes(raw[_PIX_OFF:_PIX_OFF + 8], "little")
        rb = int.from_bytes(raw[_RB_OFF:_RB_OFF + 4], "little")
        ok = ptr > 0x1000 and rb == 24 * 4
        lib.avifRGBImageFreePixels(ctypes.byref(buf))
        return ok
    finally:
        lib.avifImageDestroy(img)


def have_avif() -> bool:
    return _load() is not None


def _rgb_struct(lib, image):
    buf = (ctypes.c_uint8 * _BUFSZ)()
    lib.avifRGBImageSetDefaults(ctypes.byref(buf), image)
    return buf


def _rgb_fields(buf):
    raw = bytes(buf)
    return (
        int.from_bytes(raw[0:4], "little"),
        int.from_bytes(raw[4:8], "little"),
        int.from_bytes(raw[_PIX_OFF:_PIX_OFF + 8], "little"),
        int.from_bytes(raw[_RB_OFF:_RB_OFF + 4], "little"),
    )


def is_avif(payload: bytes) -> bool:
    """ISO-BMFF ftyp box with an avif/avis major or compatible brand."""
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        return False
    size = int.from_bytes(payload[0:4], "big")
    brands = payload[8:min(size, 64)]
    return b"avif" in brands or b"avis" in brands


def decode_avif(payload: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB via libavif; None when the library/codec is
    absent or the payload is not decodable AVIF."""
    if not is_avif(payload):
        return None
    lib = _load()
    if lib is None:
        return None
    dec = lib.avifDecoderCreate()
    img = lib.avifImageCreateEmpty()
    try:
        rc = lib.avifDecoderReadMemory(dec, img, payload, len(payload))
        if rc != 0:
            return None
        head = ctypes.string_at(img, 8)
        w = int.from_bytes(head[0:4], "little")
        h = int.from_bytes(head[4:8], "little")
        if w == 0 or h == 0 or w * h > 64 << 20:
            return None  # incl. the 64 MP decompression-bomb guard
        buf = _rgb_struct(lib, img)
        lib.avifRGBImageAllocatePixels(ctypes.byref(buf))
        try:
            if lib.avifImageYUVToRGB(img, ctypes.byref(buf)) != 0:
                return None
            W, H, ptr, rb = _rgb_fields(buf)
            if not ptr or W != w or H != h:
                return None
            src = (ctypes.c_uint8 * (rb * H)).from_address(ptr)
            arr = np.ctypeslib.as_array(src).reshape(H, rb)
            return arr[:, : W * 4].reshape(H, W, 4)[:, :, :3].copy()
        finally:
            lib.avifRGBImageFreePixels(ctypes.byref(buf))
    finally:
        lib.avifImageDestroy(img)
        lib.avifDecoderDestroy(dec)


def encode_avif(rgb: np.ndarray) -> bytes | None:
    """RGB -> AVIF bytes through libavif's default encoder (YUV420,
    default quality). Exists for tests/fixtures; None when no encoder
    codec is available."""
    lib = _load()
    if lib is None:
        return None
    h, w = rgb.shape[:2]
    rgba = np.empty((h, w, 4), np.uint8)
    rgba[:, :, :3] = rgb[:, :, :3]
    rgba[:, :, 3] = 255
    img = lib.avifImageCreate(w, h, 8, 3)  # YUV420
    enc = lib.avifEncoderCreate()
    try:
        buf = _rgb_struct(lib, img)
        lib.avifRGBImageAllocatePixels(ctypes.byref(buf))
        try:
            W, H, ptr, rb = _rgb_fields(buf)
            if not ptr:
                return None
            dst = (ctypes.c_uint8 * (rb * h)).from_address(ptr)
            np.ctypeslib.as_array(dst).reshape(h, rb)[:, : w * 4] = (
                rgba.reshape(h, w * 4)
            )
            if lib.avifImageRGBToYUV(img, ctypes.byref(buf)) != 0:
                return None
        finally:
            lib.avifRGBImageFreePixels(ctypes.byref(buf))
        out = (ctypes.c_uint8 * 24)()  # avifRWData {data, size}
        if lib.avifEncoderWrite(enc, img, ctypes.byref(out)) != 0:
            return None
        optr = int.from_bytes(bytes(out[0:8]), "little")
        osz = int.from_bytes(bytes(out[8:16]), "little")
        data = ctypes.string_at(optr, osz)
        lib.avifRWDataFree(ctypes.byref(out))
        return data
    finally:
        lib.avifEncoderDestroy(enc)
        lib.avifImageDestroy(img)
