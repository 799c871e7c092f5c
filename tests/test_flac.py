"""FLAC-subset codec contracts (operators/flac.py): round-trip
identity across subframe types and frame counts, container
integrity checks actually firing, and compression on predictable
signals — the properties the value-hash oracle (which certifies
the full pipeline's losslessness) cannot localize to a stage."""

from __future__ import annotations

import numpy as np
import pytest

from db_mapreduce_project_spark.operators.flac import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def test_roundtrip_random_and_structured():
    rng = np.random.RandomState(7)
    cases = [
        (rng.randint(-16448, 7711, size=64).astype(np.int64), 2),
        (rng.randint(-32768, 32768, size=777).astype(np.int64), 1),
        (rng.randint(-200, 200, size=9000).astype(np.int64), 2),  # 2 frames
        (np.zeros(64, dtype=np.int64), 2),                # CONSTANT
        (np.arange(128, dtype=np.int64) * 100, 1),        # FIXED order 2
        (np.full(50, -32768, dtype=np.int64), 1),         # min int16
    ]
    for samples, n_ch in cases:
        buf = encode_flac(samples, n_ch, 8000)
        ch, rate, got = decode_flac(buf)
        assert (ch, rate) == (n_ch, 8000)
        assert (got == samples).all()


def test_predictable_signal_compresses():
    t = (np.arange(4096, dtype=np.int64) % 977) * 7  # near-linear runs
    buf = encode_flac(t, 1, 8000)
    assert len(buf) < 4096 * 2 * 0.5  # beats half of raw PCM16


def test_integrity_checks_fire():
    samples = np.arange(64, dtype=np.int64)
    buf = bytearray(encode_flac(samples, 2, 8000))
    # flip a bit in the audio area: CRC-16 or MD5 must catch it
    buf[-3] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(buf))
    # corrupt the magic
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"fLaX" + bytes(buf[4:]))


def test_empty_stream_rejected_clearly():
    # ADVICE r8: zero samples must be a clear validation error on
    # BOTH sides, not an opaque numpy failure deep in decode
    with pytest.raises(ValueError, match="empty sample stream"):
        encode_flac(np.zeros(0, dtype=np.int64), 1, 8000)
    # a hand-built total_samples == 0 STREAMINFO (malformed input —
    # the encoder refuses to produce it) must also raise cleanly
    buf = bytearray(encode_flac(np.arange(64, dtype=np.int64), 1, 8000))
    buf[21] &= 0xF0  # total_samples<35:32> low nibble of byte 21
    buf[22:26] = b"\x00\x00\x00\x00"  # total_samples<31:0>
    with pytest.raises(ValueError, match="total_samples == 0"):
        decode_flac(bytes(buf))


def test_crc_reference_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 against the classic
    # '123456789' check values (0xF4 and 0xFEE8 — BUYPASS variant)
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_headers_well_formed():
    samples = np.arange(100, dtype=np.int64)
    buf = encode_flac(samples, 1, 8000)
    assert buf[:4] == b"fLaC"
    assert buf[4] == 0x80  # last metadata block, STREAMINFO
    assert int.from_bytes(buf[5:8], "big") == 34
    # frame sync directly after the metadata
    assert buf[42] == 0xFF and (buf[43] >> 2) == 0b111110
