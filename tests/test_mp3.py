"""MP3 container-walk contracts (operators/mp3.py): the public
reference header vector, frame-length arithmetic against the
published table values, desync/truncation detection, and the
round-trip the value-hash oracle certifies end-to-end."""

from __future__ import annotations

import pytest

from db_mapreduce_project_spark.operators.mp3 import (
    MP3_FRAMES,
    MP3_SIDE_STEREO,
    encode_mp3_stream,
    frame_length,
    parse_mp3_stream,
)


def test_reference_header_vector():
    """0xFF 0xFB 0x90 0x00 is THE canonical MPEG-1 Layer III header
    (128 kbps, 44.1 kHz, no padding, stereo) cited by every
    independent description of the format; 417 bytes is its
    published frame length (floor(144000*128/44100))."""
    side = bytes(MP3_SIDE_STEREO)
    n = frame_length(128, 0)
    assert n == 417
    frame = (
        bytes([0xFF, 0xFB, 0x90, 0x00])
        + side
        + bytes(n - 4 - MP3_SIDE_STEREO)
    )
    got = parse_mp3_stream(frame)
    assert len(got) == 1
    f = got[0]
    assert (f["kbps"], f["rate"], f["pad"], f["bytes"], f["mdb"]) == (
        128,
        44100,
        0,
        417,
        0,
    )


def test_published_frame_lengths():
    # spot values from the public Layer III table at 44.1 kHz
    assert frame_length(32, 0) == 104
    assert frame_length(128, 1) == 418
    assert frame_length(320, 0) == 1044
    assert frame_length(128, 0, 48000) == 384


def test_main_data_begin_roundtrip():
    """All 512 main_data_begin values survive the 9-bit split
    across the first two side-info bytes."""
    body = bytes(range(32, 127)) * 6  # 570 bytes -> full (a*7)%512 orbit
    stream = encode_mp3_stream(body)
    frames = parse_mp3_stream(stream)
    assert len(frames) == len(body)
    for a, f in zip(body, frames):
        assert f["mdb"] == (a * 7) % 512, a


def test_desync_and_truncation_raise():
    stream = encode_mp3_stream(b"Hello MP3 frame walk")
    # corrupt the SECOND frame's sync byte: the walk must detect
    # the lost sync exactly at that boundary
    first_len = parse_mp3_stream(stream)[0]["bytes"]
    broken = bytearray(stream)
    broken[first_len] = 0x00
    with pytest.raises(ValueError, match="lost sync"):
        parse_mp3_stream(bytes(broken))
    # shortening the stream by one byte truncates the last frame
    with pytest.raises(ValueError, match="truncated MP3"):
        parse_mp3_stream(stream[:-1])
    # reserved bitrate index 15 must be rejected, not table-walked
    hdr = bytearray(stream[:4])
    hdr[2] |= 0xF0
    with pytest.raises(ValueError, match="reserved"):
        parse_mp3_stream(bytes(hdr) + stream[4:])


def test_vbr_stream_walk_is_exact():
    """A VBR stream (every legal bitrate index present) walks to
    exactly the stream end with the frame count built."""
    body = bytes(range(32, 32 + MP3_FRAMES))
    stream = encode_mp3_stream(body)
    frames = parse_mp3_stream(stream)
    assert len(frames) == MP3_FRAMES
    assert sum(f["bytes"] for f in frames) == len(stream)
    assert len({f["kbps"] for f in frames}) > 5  # genuinely VBR
