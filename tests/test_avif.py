"""Optional libavif binding (``functions/avif_native.py``): ABI
self-verification, encode/decode round trip, decode_image dispatch,
header-only metadata triage, and the honest absent-library contract
(AVIF stays undecodable and counted, like MP3)."""

import numpy as np
import pytest

from aws_serverless_elt_pipeline_enterprise_ray.functions import avif_native
from aws_serverless_elt_pipeline_enterprise_ray.functions.avif_native import (
    decode_avif,
    encode_avif,
    have_avif,
    is_avif,
)
from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
    decode_image,
    image_metadata,
)


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xx * 4 + yy) % 256, (yy * 6) % 256,
         rng.integers(0, 256, (h, w))], -1
    ).astype(np.uint8)


def test_is_avif_sniff():
    avif_hdr = bytes([0, 0, 0, 0x20]) + b"ftypavif" + bytes(24)
    assert is_avif(avif_hdr)
    assert not is_avif(b"RIFF\x00\x00\x00\x00WEBP" + bytes(24))
    assert not is_avif(bytes([0, 0, 0, 0x20]) + b"ftypisom" + bytes(24))
    assert not is_avif(b"")


def test_roundtrip_and_dispatch():
    if not have_avif():
        pytest.skip("libavif absent")
    # smooth image: 4:2:0 subsampling is benign, residual error is
    # pure quantization (random chroma would dominate the tolerance)
    xx, yy = np.meshgrid(np.arange(48), np.arange(32))
    rgb = np.stack(
        [(xx * 2 + yy) % 200 + 20, (xx + yy * 2) % 200 + 20,
         ((xx + yy) // 2) % 200 + 20], -1
    ).astype(np.uint8)
    data = encode_avif(rgb)
    assert data is not None and data[4:8] == b"ftyp"
    out = decode_avif(data)
    assert out is not None and out.shape == (32, 48, 3)
    # default-quality lossy: close but not exact
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 8
    # decode_image dispatches by sniff
    via_dispatch = decode_image(data)
    assert via_dispatch is not None
    assert np.array_equal(via_dispatch, out)


def test_flat_image_near_exact():
    if not have_avif():
        pytest.skip("libavif absent")
    rgb = np.full((16, 16, 3), [200, 40, 90], np.uint8)
    out = decode_avif(encode_avif(rgb))
    assert out is not None
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_metadata_triage_header_only():
    if not have_avif():
        pytest.skip("libavif absent")
    data = encode_avif(_img(20, 36, 1))
    meta = image_metadata(data)
    assert meta is not None
    assert meta["format"] == "avif"
    assert (meta["width"], meta["height"]) == (36, 20)


def test_absent_library_contract(monkeypatch):
    """With the library unavailable the decode is None (counted as
    undecodable) — never an exception."""
    monkeypatch.setitem(avif_native._STATE, "tried", True)
    monkeypatch.setitem(avif_native._STATE, "lib", None)
    data = bytes([0, 0, 0, 0x20]) + b"ftypavif" + bytes(100)
    assert decode_avif(data) is None
    assert encode_avif(_img(8, 8, 0)) is None
    assert decode_image(data) is None
