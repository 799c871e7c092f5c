"""From-scratch FLAC (subset) encoder + decoder — the eighth codec,
retiring the 'FLAC container remains env-gated' concession: the
format needs no native library, only careful bitstream work, and
the Rice entropy core was already in-repo (multimodal.py).

Subset per the public spec (xiph.org FLAC format):
  * `fLaC` magic + STREAMINFO metadata block (the only mandatory
    block), including the MD5 of the unencoded audio;
  * one or more FRAMEs: 14-bit sync, fixed-blocksize strategy,
    UTF-8-coded frame number, 8-bit CRC of the header, 16-bit CRC
    (poly 0x8005) of the whole frame;
  * independent channels, each a SUBFRAME: CONSTANT, VERBATIM, or
    FIXED prediction of order 0-2 (chosen per subframe by residual
    cost), residuals in Rice partitions (coding method 0, 4-bit
    params, escape 0b1111 -> 5-bit raw width) with FLAC's zigzag
    fold and zeros-then-one unary;
  * 16-bit samples, 1-8 channels, the 8 kHz rate used by the audio
    fixtures encoded with the spec's dedicated rate code.

Encoder and decoder are independent implementations: the decoder
re-derives everything from the bitstream (it does not share the
encoder's choices), verifies BOTH CRCs and the STREAMINFO MD5, and
reconstructs samples through the fixed-prediction recurrences.  A
bug in either side breaks the round-trip, the in-kernel contract
check, and the value-hash oracle (the decoded sample plane must
match the plain-WAV pipeline's byte arithmetic).

Reference analogue: none in maprdeuce.cpp — this is brief-driven
multimodal coverage (the training-pipeline decode stage).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"
_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}
_RATE_FROM_CODE = {v: k for k, v in _RATE_CODES.items()}
_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1]}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame header."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — FLAC frame footer."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _W:
    """MSB-first bit accumulator (FLAC bit order)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        """FLAC unary: q zero bits then a one bit."""
        while q >= 32:
            self.w(0, 32)
            q -= 32
        self.w(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)

    def getvalue(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _R:
    """MSB-first bit reader."""

    def __init__(self, buf: bytes, bitpos: int = 0):
        self.buf = buf
        self.pos = bitpos

    def r(self, nbits: int) -> int:
        end = self.pos + nbits
        if end > len(self.buf) * 8:
            raise ValueError("flac stream truncated")
        v = 0
        pos = self.pos
        while nbits:
            byte = self.buf[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, nbits)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            nbits -= take
        self.pos = pos
        return v

    def unary(self) -> int:
        """Count zeros to the terminating 1, scanning whole bytes:
        the common case (q < 8) costs one table-free bit-scan
        instead of per-bit reads."""
        q = 0
        buf, pos = self.buf, self.pos
        nbits = len(buf) * 8
        while True:
            if pos >= nbits:
                raise ValueError("flac stream truncated in unary")
            byte = buf[pos >> 3]
            avail = 8 - (pos & 7)
            chunk = byte & ((1 << avail) - 1)
            if chunk == 0:
                q += avail
                pos += avail
                if q > 1 << 20:
                    raise ValueError("flac unary run too long")
                continue
            lead = avail - chunk.bit_length()  # zeros before the 1
            q += lead
            pos += lead + 1
            self.pos = pos
            return q

    def signed(self, nbits: int) -> int:
        v = self.r(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | n >> 6, 0x80 | n & 0x3F])
    if n < 0x10000:
        return bytes([0xE0 | n >> 12, 0x80 | (n >> 6) & 0x3F, 0x80 | n & 0x3F])
    raise ValueError("frame number too large for this subset")


def _read_utf8_coded(r: "_R") -> int:
    b0 = r.r(8)
    if b0 < 0x80:
        return b0
    if b0 >> 5 == 0b110:
        n, extra = b0 & 0x1F, 1
    elif b0 >> 4 == 0b1110:
        n, extra = b0 & 0x0F, 2
    else:
        raise ValueError("bad coded frame number")
    for _ in range(extra):
        c = r.r(8)
        if c >> 6 != 0b10:
            raise ValueError("bad coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res * 2, -2 * res - 1).astype(np.int64)


def _best_rice_param(u: np.ndarray) -> int:
    best_k, best_bits = 0, None
    for k in range(15):
        bits = int((u >> k).sum()) + len(u) * (k + 1)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k


def _encode_subframe(w: "_W", x: np.ndarray, bps: int) -> None:
    """One channel of one frame: CONSTANT / FIXED 0-2 / VERBATIM,
    picked by cost; rice partition order 0."""
    if np.all(x == x[0]):
        w.w(0, 1)            # padding
        w.w(0b000000, 6)     # CONSTANT
        w.w(0, 1)            # no wasted bits
        w.w(int(x[0]) & ((1 << bps) - 1), bps)
        return
    # candidate fixed orders
    best = None
    for order in (0, 1, 2):
        if len(x) <= order:
            continue
        res = x.astype(np.int64)
        for _ in range(order):
            res = np.diff(res)
        u = _zigzag(res)
        k = _best_rice_param(u)
        cost = int((u >> k).sum()) + len(u) * (k + 1) + order * bps
        if best is None or cost < best[0]:
            best = (cost, order, res, k)
    cost, order, res, k = best
    if cost >= len(x) * bps:  # entropy coding loses: VERBATIM
        w.w(0, 1)
        w.w(0b000001, 6)
        w.w(0, 1)
        for v in x:
            w.w(int(v) & ((1 << bps) - 1), bps)
        return
    w.w(0, 1)
    w.w(0b001000 | order, 6)  # FIXED, order
    w.w(0, 1)                 # no wasted bits
    for v in x[:order]:       # warmup, bps-bit signed
        w.w(int(v) & ((1 << bps) - 1), bps)
    # residual: coding method 0 (4-bit rice), partition order 0
    w.w(0, 2)
    w.w(0, 4)
    w.w(k, 4)
    mask = (1 << k) - 1
    one = 1 << k
    for uv in _zigzag(res):
        uv = int(uv)
        # q zeros + terminating 1 + k remainder bits, fused into ONE
        # accumulator write: value (1<<k)|rem at width q+1+k
        w.w(one | (uv & mask), (uv >> k) + 1 + k)


def _decode_subframe(r: "_R", n: int, bps: int) -> np.ndarray:
    if r.r(1) != 0:
        raise ValueError("bad subframe padding bit")
    ftype = r.r(6)
    if r.r(1) != 0:
        raise ValueError("wasted bits unsupported in this subset")
    if ftype == 0b000000:  # CONSTANT
        v = r.signed(bps)
        return np.full(n, v, dtype=np.int64)
    if ftype == 0b000001:  # VERBATIM
        return np.array([r.signed(bps) for _ in range(n)], dtype=np.int64)
    if not 0b001000 <= ftype <= 0b001100:
        raise ValueError(f"subframe type {ftype:#08b} unsupported")
    order = ftype & 0x07
    warm = [r.signed(bps) for _ in range(order)]
    if r.r(2) != 0:
        raise ValueError("rice2 coding method unsupported in subset")
    po = r.r(4)
    nres = n - order
    res: list[int] = []
    for p in range(1 << po):
        k = r.r(4)
        cnt = (n >> po) - (order if p == 0 else 0)
        if k == 15:
            raw = r.r(5)
            part = [r.signed(raw) for _ in range(cnt)]
            res.extend(part)
            continue
        for _ in range(cnt):
            q = r.unary()
            u = (q << k) | r.r(k)
            res.append((u >> 1) ^ -(u & 1))
    if len(res) != nres:
        raise ValueError("residual count mismatch")
    out = list(warm)
    coef = _FIXED_COEFFS[order]
    for e in res:
        pred = sum(c * out[-i - 1] for i, c in enumerate(coef))
        out.append(pred + e)
    return np.array(out, dtype=np.int64)


def encode_flac(samples: np.ndarray, n_channels: int, rate: int) -> bytes:
    """Encode interleaved PCM16 into a FLAC stream (one frame per
    4096-sample block, independent channels)."""
    bps = 16
    if rate not in _RATE_CODES:
        raise ValueError(f"rate {rate} not in subset table")
    frames = samples.reshape(-1, n_channels)
    n = frames.shape[0]
    if n == 0:
        raise ValueError("cannot encode an empty sample stream")
    blocksize = min(n, 4096)
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()

    # STREAMINFO
    si = _W()
    si.w(blocksize, 16)
    si.w(blocksize, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(rate, 20)
    si.w(n_channels - 1, 3)
    si.w(bps - 1, 5)
    si.w(n, 36)
    info = si.getvalue() + md5
    out = bytearray(FLAC_MAGIC)
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info  # last block

    for fi in range(0, n, blocksize):
        blk = frames[fi : fi + blocksize]
        bs = blk.shape[0]
        h = _W()
        h.w(0b11111111111110, 14)
        h.w(0, 1)            # reserved
        h.w(0, 1)            # fixed blocksize strategy
        h.w(0b0111, 4)       # blocksize: 16-bit value-1 at header end
        h.w(_RATE_CODES[rate], 4)
        h.w(n_channels - 1, 4)   # independent channels
        h.w(0b100, 3)        # 16 bps
        h.w(0, 1)            # reserved
        hdr = h.getvalue() + _utf8_coded(fi // blocksize)
        hdr += struct.pack(">H", bs - 1)
        hdr += bytes([_crc8(hdr)])
        body = _W()
        for ch in range(n_channels):
            _encode_subframe(body, blk[:, ch].astype(np.int64), bps)
        body.align()
        frame = hdr + body.getvalue()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


def decode_flac(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Decode the subset stream: returns (n_channels, rate,
    interleaved int16-range samples).  Verifies CRC-8, CRC-16, the
    STREAMINFO sample count, and the audio MD5."""
    if buf[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = channels = bps = total = None
    md5 = b""
    while True:
        hdr = buf[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        block = buf[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:
            r = _R(block)
            r.r(16)  # min blocksize
            r.r(16)  # max blocksize
            r.r(24)
            r.r(24)
            rate = r.r(20)
            channels = r.r(3) + 1
            bps = r.r(5) + 1
            total = r.r(36)
            md5 = block[18:34]
        if hdr & 0x80:
            break
    if rate is None or bps != 16:
        raise ValueError("missing STREAMINFO / unsupported bps")
    if total == 0:
        # encode_flac refuses empty streams, so a zero-sample
        # STREAMINFO is malformed input, not a degenerate success
        raise ValueError("empty stream: STREAMINFO total_samples == 0")

    frames = []
    got = 0
    while got < total:
        fstart = pos * 8
        r = _R(buf, fstart)
        if r.r(14) != 0b11111111111110:
            raise ValueError("bad frame sync")
        r.r(1)
        r.r(1)
        bs_code = r.r(4)
        rate_code = r.r(4)
        ch_code = r.r(4)
        sz_code = r.r(3)
        r.r(1)
        _read_utf8_coded(r)
        if bs_code == 0b0111:
            bs = r.r(16) + 1
        elif bs_code == 0b0110:
            bs = r.r(8) + 1
        else:
            raise ValueError("blocksize code unsupported in subset")
        if rate_code not in _RATE_FROM_CODE or _RATE_FROM_CODE[rate_code] != rate:
            raise ValueError("frame rate disagrees with STREAMINFO")
        if ch_code != channels - 1:
            raise ValueError("channel assignment unsupported in subset")
        if sz_code != 0b100:
            raise ValueError("sample size code unsupported in subset")
        hdr_end_byte = (r.pos + 7) // 8
        if buf[hdr_end_byte] != _crc8(buf[pos:hdr_end_byte]):
            raise ValueError("frame header CRC-8 mismatch")
        r.pos = (hdr_end_byte + 1) * 8
        chans = [_decode_subframe(r, bs, bps) for _ in range(channels)]
        r.align()
        fend_byte = r.pos // 8
        if fend_byte + 2 > len(buf):
            raise ValueError("flac frame truncated before CRC-16")
        (crc,) = struct.unpack(">H", buf[fend_byte : fend_byte + 2])
        if crc != _crc16(buf[pos:fend_byte]):
            raise ValueError("frame CRC-16 mismatch")
        pos = fend_byte + 2
        frames.append(np.stack(chans, axis=1))
        got += bs
    audio = np.concatenate(frames, axis=0).reshape(-1)
    if got != total:
        raise ValueError("sample count disagrees with STREAMINFO")
    if hashlib.md5(audio.astype("<i2").tobytes()).digest() != md5:
        raise ValueError("audio MD5 mismatch")
    return channels, rate, audio
