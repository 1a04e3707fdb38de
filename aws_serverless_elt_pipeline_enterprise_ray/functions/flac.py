"""FLAC codec, library-free, per the public FLAC format specification
(xiph.org): STREAMINFO parse, frame-header decode (all block-size /
sample-rate / sample-size codes, UTF-8-style frame numbers, CRC-8),
subframes CONSTANT / VERBATIM / FIXED(0-4) / LPC with wasted bits,
partitioned Rice residuals (4- and 5-bit parameter widths + raw-escape
partitions), stereo decorrelation (left/side, right/side, mid/side),
and frame CRC-16 verification. Unlike MP3 (whose Huffman tables cannot
be transcribed offline — see ``sniff_audio_format``), FLAC carries all
of its coding parameters in-stream, so a complete decoder is provable
in-repo: ``encode_flac`` is a real spec-conformant encoder used by the
analytic round-trip tests and the SQL-exact oracle query.

Reference parity: media are opaque objects to the reference
(lambdas/ingest/app.py:47-49); decode stages are beyond-reference
curation operators, same contract as multimodal.decode_wav.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# MSB-first bit I/O (FLAC is big-endian / MSB-first throughout)
# --------------------------------------------------------------------------


#: MSB-first weights for up-to-40-bit field reads (FLAC's widest
#: fixed field is the 36-bit total-samples count)
_POW = (np.int64(1) << np.arange(39, -1, -1).astype(np.int64))


class _MsbReader:
    """Whole-payload unpacked-bit reader: field reads are one numpy
    dot, unary reads scan forward in bounded chunks — the per-BIT
    Python loop is the decode hot path at corpus scale."""

    __slots__ = ("bits", "i")

    def __init__(self, data: bytes, pos: int = 0):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.i = pos * 8

    @property
    def pos(self) -> int:  # byte position (legacy CRC slicing)
        return self.i >> 3

    @property
    def bit(self) -> int:
        return self.i & 7

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        j = self.i + n
        if j > len(self.bits):
            raise ValueError("flac: bitstream truncated")
        v = int(self.bits[self.i:j] @ _POW[-n:])
        self.i = j
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_signed_array(self, count: int, n: int) -> np.ndarray:
        """Vectorized block of ``count`` n-bit signed fields."""
        if count == 0:
            return np.empty(0, np.int64)
        j = self.i + count * n
        if j > len(self.bits):
            raise ValueError("flac: bitstream truncated")
        sl = self.bits[self.i:j].reshape(count, n)
        self.i = j
        v = sl @ _POW[-n:]
        return v - (sl[:, 0].astype(np.int64) << n)

    def read_unary(self) -> int:
        bits, i = self.bits, self.i
        q = 0
        step = 64
        while True:
            chunk = bits[i : i + step]
            if chunk.size == 0:
                raise ValueError("flac: bitstream truncated")
            j = int(np.argmax(chunk))
            if chunk[j]:
                self.i = i + j + 1
                return q + j
            q += chunk.size
            i += chunk.size
            step *= 4

    def align(self) -> None:
        self.i = (self.i + 7) & ~7


class _MsbWriter:
    """Bit-array writer: every write appends an unpacked-bit chunk;
    packbits once at the end (or at byte-aligned CRC checkpoints)."""

    def __init__(self):
        self.chunks: list[np.ndarray] = []
        self.n = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.chunks.append(
            ((v >> np.arange(n - 1, -1, -1)) & 1).astype(np.uint8)
        )
        self.n += n

    def write_bits(self, arr: np.ndarray) -> None:
        self.chunks.append(arr.astype(np.uint8, copy=False))
        self.n += len(arr)

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def align(self) -> None:
        pad = (-self.n) % 8
        if pad:
            self.write(0, pad)

    def getvalue(self) -> bytes:
        if not self.chunks:
            return b""
        if len(self.chunks) > 1:
            self.chunks = [np.concatenate(self.chunks)]
        return np.packbits(self.chunks[0]).tobytes()


# --------------------------------------------------------------------------
# CRCs (CRC-8 poly 0x07, CRC-16 poly 0x8005, both init 0)
# --------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = t[(crc >> 8) ^ b] ^ ((crc << 8) & 0xFFFF)
    return crc


# --------------------------------------------------------------------------
# shared coding helpers
# --------------------------------------------------------------------------

#: frame-header sample-rate codes (0 = use STREAMINFO; 12-14 are
#: follow-up fields; 15 invalid)
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _utf8_like_decode(r: _MsbReader) -> int:
    """FLAC's UTF-8-style variable-length number (up to 36 bits)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0:
        raise ValueError("flac: bad utf8-coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = r.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: bad utf8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _utf8_like_encode(w: _MsbWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    payload = []
    nbits = v.bit_length()
    n = 1
    while nbits > 6 * n + (6 - n):
        n += 1
    for i in range(n):
        payload.append(0x80 | ((v >> (6 * (n - 1 - i))) & 0x3F))
    lead = ((0xFF << (7 - n)) & 0xFF) | (v >> (6 * n))
    w.write(lead, 8)
    for b in payload:
        w.write(b, 8)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag_decode(v: int) -> int:
    return -(v >> 1) - 1 if v & 1 else v >> 1


def _zigzag_encode(v: int) -> int:
    return (-v - 1) * 2 + 1 if v < 0 else v * 2


def _read_residual(r: _MsbReader, blocksize: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("flac: partition order does not divide blocksize")
    out = np.empty(blocksize - order, np.int64)
    k = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: bad partition order")
        param = r.read(pbits)
        if param == escape:
            raw_bits = r.read(5)
            if raw_bits:
                out[k : k + n] = r.read_signed_array(n, raw_bits)
            else:
                out[k : k + n] = 0
            k += n
        else:
            for i in range(n):
                q = r.read_unary()
                rem = r.read(param) if param else 0
                out[k] = _zigzag_decode((q << param) | rem)
                k += 1
    return out


def _signed_field_bits(vals: np.ndarray, n: int) -> np.ndarray:
    """Unpacked MSB-first bits of ``n``-bit two's-complement fields."""
    masked = (vals.astype(np.int64) & ((1 << n) - 1)).astype(np.uint64)
    return (
        (masked[:, None] >> np.arange(n - 1, -1, -1).astype(np.uint64)) & 1
    ).astype(np.uint8).ravel()


def _write_residual(
    w: _MsbWriter, res: np.ndarray, blocksize: int, order: int,
    param: int, escape_raw_bits: int | None = None,
) -> None:
    """Single-partition residual; ``escape_raw_bits`` selects the
    raw-escape encoding instead of Rice. Both emissions are built as
    one numpy bit array (no per-bit Python)."""
    if not 0 <= param <= 30:
        # 5-bit value 31 is the escape marker; larger values would
        # silently truncate mod 32 and desync the decoder
        raise ValueError("flac: rice_param must be in [0, 30]")
    pbits = 4 if param < 15 and escape_raw_bits is None else 5
    method = 0 if pbits == 4 else 1
    w.write(method, 2)
    w.write(0, 4)  # partition order 0
    res = np.asarray(res, np.int64)
    if escape_raw_bits is not None:
        lo, hi = -(1 << (escape_raw_bits - 1)), (1 << (escape_raw_bits - 1)) - 1
        if len(res) and (res.min() < lo or res.max() > hi):
            raise ValueError("flac: escape_raw_bits too small for residuals")
        w.write((1 << pbits) - 1, pbits)
        w.write(escape_raw_bits, 5)
        if escape_raw_bits:
            w.write_bits(_signed_field_bits(res, escape_raw_bits))
        return
    w.write(param, pbits)
    z = np.where(res < 0, (-res - 1) * 2 + 1, res * 2)
    q = z >> param
    widths = q + 1 + param
    starts = np.concatenate([[0], np.cumsum(widths)[:-1]])
    bits = np.zeros(int(widths.sum()), np.uint8)
    bits[starts + q] = 1  # unary terminators
    if param:
        rem = z & ((1 << param) - 1)
        rb = (
            (rem[:, None] >> np.arange(param - 1, -1, -1)) & 1
        ).astype(np.uint8)
        idx = (starts + q + 1)[:, None] + np.arange(param)
        bits[idx.ravel()] = rb.ravel()
    w.write_bits(bits)


def _reconstruct_fixed(warm: np.ndarray, res: np.ndarray, order: int):
    """Inverse of k-fold differencing, vectorized with cumsums: the
    j-th difference sequence is rebuilt from its warmup prefix
    (diff^j of the warmup samples) plus a running sum of the (j+1)-th
    difference sequence."""
    if order == 0:
        return res.astype(np.int64)
    cur = res.astype(np.int64)
    for j in range(order - 1, -1, -1):
        prefix = np.diff(warm, j) if j else warm.astype(np.int64)
        tail = prefix[-1] + np.cumsum(cur[order - j - 1:])
        cur = np.concatenate([prefix, tail])
    return cur


def _reconstruct_lpc(
    warm: np.ndarray, res: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    order = len(coefs)
    out = np.empty(len(warm) + len(res), np.int64)
    out[: order] = warm
    c = np.array(coefs[::-1], np.int64)  # c[j] multiplies out[i-order+j]
    for i in range(order, len(out)):
        pred = int(np.dot(c, out[i - order : i])) >> shift
        out[i] = pred + res[i - order]
    return out


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_flac(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Decode a FLAC stream -> ``(samples, sample_rate)`` with samples
    int32 shaped (n_frames, channels) — the same contract as
    ``multimodal.decode_wav``. Returns None when the payload is not
    FLAC or is malformed (CRC mismatches reject the stream)."""
    try:
        if len(payload) < 8 or payload[:4] != b"fLaC":
            return None
        pos = 4
        streaminfo = None
        while pos + 4 <= len(payload):
            hdr = payload[pos]
            last = hdr >> 7
            btype = hdr & 0x7F
            size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
            body = payload[pos + 4 : pos + 4 + size]
            if btype == 0:
                r = _MsbReader(body)
                r.read(16)  # min blocksize
                r.read(16)  # max blocksize
                r.read(24)
                r.read(24)
                rate = r.read(20)
                channels = r.read(3) + 1
                bps = r.read(5) + 1
                total = r.read(36)
                streaminfo = (rate, channels, bps, total)
            pos += 4 + size
            if last:
                break
        if streaminfo is None:
            return None
        si_rate, si_ch, si_bps, si_total = streaminfo

        frames = []
        r = _MsbReader(payload, pos)
        while r.pos < len(payload):
            frame = _decode_frame(payload, r, streaminfo)
            if frame is None:
                break
            frames.append(frame)
        if not frames:
            return None
        samples = np.concatenate(frames, axis=0)
        if si_total:
            samples = samples[:si_total]
        return samples.astype(np.int32), si_rate
    except (ValueError, IndexError):
        return None


def _decode_frame(payload: bytes, r: _MsbReader, streaminfo):
    si_rate, si_ch, si_bps, _ = streaminfo
    pos = r.pos
    if pos + 5 > len(payload):
        return None
    sync = r.read(14)
    if sync != 0b11111111111110:
        return None
    if r.read(1):
        raise ValueError("flac: reserved header bit")
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    rate_code = r.read(4)
    ch_code = r.read(4)
    size_code = r.read(3)
    if r.read(1):
        raise ValueError("flac: reserved header bit 2")
    _utf8_like_decode(r)  # frame/sample number

    if bs_code == 0:
        raise ValueError("flac: reserved blocksize code")
    elif bs_code == 1:
        blocksize = 192
    elif bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = r.read(8) + 1
    elif bs_code == 7:
        blocksize = r.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)

    if rate_code == 0:
        pass
    elif rate_code in _RATE_CODES:
        pass
    elif rate_code == 12:
        r.read(8)
    elif rate_code in (13, 14):
        r.read(16)
    else:
        raise ValueError("flac: invalid sample-rate code")

    if size_code == 0:
        bps = si_bps
    elif size_code in _SIZE_CODES:
        bps = _SIZE_CODES[size_code]
    else:
        raise ValueError("flac: reserved sample-size code")

    # CRC-8 covers the header bytes up to here
    hdr_end = r.pos + (1 if r.bit else 0)
    crc8 = r.read(8) if r.bit == 0 else None
    if crc8 is None:
        raise ValueError("flac: unaligned frame header")
    if _crc8(payload[pos:hdr_end]) != crc8:
        raise ValueError("flac: header CRC mismatch")

    if ch_code <= 7:
        n_ch = ch_code + 1
        kinds = ["indep"] * n_ch
    elif ch_code == 8:  # left/side
        n_ch, kinds = 2, ["indep", "side"]
    elif ch_code == 9:  # right/side
        n_ch, kinds = 2, ["side", "indep"]
    elif ch_code == 10:  # mid/side
        n_ch, kinds = 2, ["indep", "side"]
    else:
        raise ValueError("flac: reserved channel assignment")

    chans = []
    for kind in kinds:
        ch_bps = bps + (1 if kind == "side" else 0)
        chans.append(_decode_subframe(r, blocksize, ch_bps))
    r.align()
    crc16 = r.read(16)
    if _crc16(payload[pos : r.pos - 2]) != crc16:
        raise ValueError("flac: frame CRC mismatch")

    if ch_code == 8:  # left/side: right = left - side
        left, side = chans
        chans = [left, left - side]
    elif ch_code == 9:  # right/side: left = right + side
        side, right = chans
        chans = [right + side, right]
    elif ch_code == 10:  # mid/side
        mid, side = chans
        m2 = (mid.astype(np.int64) << 1) | (side & 1)
        chans = [(m2 + side) >> 1, (m2 - side) >> 1]
    return np.stack(chans, axis=1)


def _decode_subframe(r: _MsbReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("flac: subframe pad bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if t == 0:  # CONSTANT
        out = np.full(blocksize, r.read_signed(bps), np.int64)
    elif t == 1:  # VERBATIM
        out = r.read_signed_array(blocksize, bps)
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = r.read_signed_array(order, bps)
        res = _read_residual(r, blocksize, order)
        out = _reconstruct_fixed(warm, res, order)
    elif t >= 32:  # LPC
        order = (t & 31) + 1
        warm = r.read_signed_array(order, bps)
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        out = _reconstruct_lpc(warm, res, coefs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    return out << wasted if wasted else out


# --------------------------------------------------------------------------
# encoder (spec-conformant; exists to make decode provable in-repo)
# --------------------------------------------------------------------------


def encode_flac(
    samples: np.ndarray,
    rate: int,
    *,
    bps: int = 16,
    order: int = 2,
    rice_param: int = 4,
    blocksize: int | None = None,
    mid_side: bool = False,
    verbatim: bool = False,
    escape_raw_bits: int | None = None,
) -> bytes:
    """Encode int samples shaped (n, channels) as a FLAC stream:
    STREAMINFO + fixed-blocksize frames of FIXED-predictor subframes
    (``order`` 0-4, single-partition Rice residuals with ``rice_param``,
    or raw-escape partitions when ``escape_raw_bits`` is set), CONSTANT
    subframes when a channel is flat, VERBATIM when ``verbatim``;
    ``mid_side`` uses the mid/side stereo decorrelation (2ch only)."""
    samples = np.asarray(samples, np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, n_ch = samples.shape
    blocksize = blocksize or min(max(n, 16), 4096)

    out = bytearray()
    out += b"fLaC"
    si = _MsbWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.getvalue() + b"\x00" * 16  # md5 unset (zeros = unknown)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, blocksize):
        block = samples[start : start + blocksize]
        bs = len(block)  # last frame may be short: real length in header
        w = _MsbWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # blocksize: 16-bit field follows
        w.write(0, 4)  # rate from streaminfo
        if mid_side and n_ch == 2:
            w.write(10, 4)
        else:
            w.write(n_ch - 1, 4)
        w.write(0, 3)  # sample size from streaminfo
        w.write(0, 1)
        _utf8_like_encode(w, frame_no)
        w.write(bs - 1, 16)
        hdr = w.getvalue()
        w.write(_crc8(hdr), 8)

        if mid_side and n_ch == 2:
            left = block[:, 0]
            right = block[:, 1]
            chans = [(left + right) >> 1, left - right]
            ch_bits = [bps, bps + 1]
        else:
            chans = [block[:, c] for c in range(n_ch)]
            ch_bits = [bps] * n_ch
        for ch, cbps in zip(chans, ch_bits):
            _encode_subframe(
                w, ch, cbps, order=order, rice_param=rice_param,
                verbatim=verbatim, escape_raw_bits=escape_raw_bits,
            )
        w.align()
        frame = w.getvalue()
        w.write(_crc16(frame), 16)
        out += w.getvalue()
        frame_no += 1
    return bytes(out)


def _encode_subframe(
    w: _MsbWriter, ch: np.ndarray, bps: int, *, order: int,
    rice_param: int, verbatim: bool, escape_raw_bits: int | None,
) -> None:
    blocksize = len(ch)
    w.write(0, 1)  # pad
    if verbatim:
        w.write(1, 6)
        w.write(0, 1)  # no wasted bits
        w.write_bits(_signed_field_bits(ch, bps))
        return
    if np.all(ch == ch[0]):
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write_signed(int(ch[0]), bps)
        return
    k = min(order, blocksize - 1, 4)
    w.write(8 + k, 6)
    w.write(0, 1)  # no wasted bits
    for v in ch[:k]:
        w.write_signed(int(v), bps)
    res = np.diff(ch, k) if k else ch.copy()
    _write_residual(
        w, res, blocksize, k, rice_param, escape_raw_bits=escape_raw_bits
    )
