"""FLAC codec: analytic decode tests via the spec-conformant in-repo
encoder (lossless round-trips over every subframe/residual/stereo
path), CRC rejection, LPC reconstruction against a hand computation,
and the decode_audio / coverage plumbing."""

import numpy as np
import pytest

from aws_serverless_elt_pipeline_enterprise_ray.functions.flac import (
    _MsbReader,
    _MsbWriter,
    _crc8,
    _crc16,
    _utf8_like_decode,
    _utf8_like_encode,
    decode_flac,
    encode_flac,
)


def _rt(samples, rate=16000, **kw):
    out = decode_flac(encode_flac(samples, rate, **kw))
    assert out is not None
    got, r = out
    want = np.asarray(samples, np.int64)
    if want.ndim == 1:
        want = want[:, None]
    assert r == rate
    assert np.array_equal(got, want)


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(11)
    _rt(rng.integers(-2000, 2000, 500))
    _rt(rng.integers(-2000, 2000, (500, 2)))


@pytest.mark.parametrize("order", range(5))
def test_roundtrip_every_fixed_order(order):
    rng = np.random.default_rng(order)
    _rt(rng.integers(-1500, 1500, 400), order=order, rice_param=6)


def test_roundtrip_constant_verbatim_escape():
    rng = np.random.default_rng(2)
    _rt(np.full(300, 123))  # CONSTANT subframe
    _rt(rng.integers(-2000, 2000, 300), verbatim=True)
    _rt(rng.integers(-2000, 2000, 300), escape_raw_bits=15)


def test_roundtrip_mid_side_and_multiframe():
    rng = np.random.default_rng(3)
    _rt(rng.integers(-3000, 3000, (600, 2)), mid_side=True)
    _rt(rng.integers(-5000, 5000, 5000), blocksize=1024)
    _rt(rng.integers(-100, 100, 1000), blocksize=300)  # short last frame


def test_escape_capacity_guard():
    rng = np.random.default_rng(4)
    with pytest.raises(ValueError):
        encode_flac(rng.integers(-2000, 2000, 300), 16000, escape_raw_bits=8)


def test_lpc_reconstruction_hand_computed():
    # decode an LPC subframe assembled by hand: order 1, coef 2,
    # shift 1 -> pred[i] = (2 * a[i-1]) >> 1 = a[i-1]; residuals +1
    # each -> a ramp from the warmup sample
    from aws_serverless_elt_pipeline_enterprise_ray.functions.flac import (
        _reconstruct_lpc,
    )

    out = _reconstruct_lpc(
        np.array([10], np.int64), np.array([1, 1, 1], np.int64), [2], 1
    )
    assert out.tolist() == [10, 11, 12, 13]
    # asymmetric: coef 3, shift 1 -> pred = floor(3a/2)
    out = _reconstruct_lpc(
        np.array([4], np.int64), np.array([0, 0], np.int64), [3], 1
    )
    assert out.tolist() == [4, 6, 9]


def test_crc_rejection():
    rng = np.random.default_rng(5)
    mono = rng.integers(-2000, 2000, 500)
    p = bytearray(encode_flac(mono, 16000))
    p[60] ^= 0x10  # flip a bit inside the first frame body
    assert decode_flac(bytes(p)) is None
    assert decode_flac(b"") is None
    assert decode_flac(b"fLaC") is None
    assert decode_flac(b"not flac at all") is None


def test_crc_vectors():
    # CRC-8 poly 0x07 / CRC-16 poly 0x8005, init 0 (FLAC's pair)
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_utf8_like_number_roundtrip():
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) + 5):
        w = _MsbWriter()
        _utf8_like_encode(w, v)
        assert _utf8_like_decode(_MsbReader(w.getvalue())) == v


def test_decode_audio_dispatch_and_coverage():
    import pandas as pd
    import ray.data as rd

    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        audio_decode_coverage,
        decode_audio,
        sniff_audio_format,
    )

    rng = np.random.default_rng(6)
    mono = rng.integers(-2000, 2000, 400)
    payload = encode_flac(mono, 8000)
    assert sniff_audio_format(payload) == "flac"
    got, rate = decode_audio(payload)
    assert rate == 8000 and np.array_equal(got[:, 0], mono)

    ds = rd.from_pandas(
        pd.DataFrame({"payload": [payload, b"\xff\xe3garbagemp3data", None]})
    )
    cov = audio_decode_coverage(ds)
    cov = cov.set_index("format")
    assert cov.loc["flac", "n_decoded"] == 1
    assert cov.loc["mp3", "n_decoded"] == 0


def test_audio_quality_over_flac():
    from aws_serverless_elt_pipeline_enterprise_ray.functions.multimodal import (
        AudioQuality,
    )
    import pyarrow as pa

    # 100 silent frames then a +/-16384 square wave: permilles exact
    samples = np.concatenate(
        [np.zeros(100, np.int64),
         np.where(np.arange(400) % 2 == 0, 16384, -16384)]
    )
    payload = encode_flac(samples, 16000)
    out = AudioQuality()(
        pa.table({"payload": pa.array([payload], pa.binary())})
    )
    assert out["decoded"][0].as_py() is True
    assert out["silence_permille"][0].as_py() == 100 * 1000 // 500
    assert out["zero_crossings"][0].as_py() == 399
