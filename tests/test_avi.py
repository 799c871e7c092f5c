"""AVI/RIFF + MJPEG container tests — the video-pipeline twin of
test_flac.py/test_jpeg.py: byte-exact round trip, spec validations
that must fail LOUDLY, and the sampled-frame pipeline contract the
oracle parity then certifies at value level."""

import struct

import numpy as np
import pytest

from db_mapreduce_project_spark.operators.avi import (
    _AVI_BODY_LEN,
    AVI_FRAMES,
    AVI_SAMPLE_EVERY,
    AVI_STEP,
    decode_avi_mjpeg_frames,
    encode_avi_mjpeg,
)
from db_mapreduce_project_spark.operators.jpeg import (
    JPEG_BODY_LEN,
    JPEG_N,
    decode_jpeg,
    encode_jpeg,
    reference_decoded_plane,
)


def _frames(body: bytes) -> list:
    out = []
    for f in range(AVI_FRAMES):
        win = body[f * AVI_STEP : f * AVI_STEP + JPEG_BODY_LEN]
        out.append(
            encode_jpeg(np.frombuffer(win, np.uint8).reshape(JPEG_N, JPEG_N))
        )
    return out


def _body(seed: int = 0) -> bytes:
    return bytes(
        (i * 37 + 11 + seed * 13) % 95 + 32 for i in range(_AVI_BODY_LEN)
    )


def test_avi_round_trip_frames_byte_exact():
    jfrs = _frames(_body())
    w, h, frames = decode_avi_mjpeg_frames(encode_avi_mjpeg(jfrs, JPEG_N, JPEG_N))
    assert (w, h) == (JPEG_N, JPEG_N)
    assert frames == jfrs  # container walk returns the exact payloads


def test_avi_decoded_planes_match_jpeg_reference():
    body = _body(3)
    _, _, frames = decode_avi_mjpeg_frames(
        encode_avi_mjpeg(_frames(body), JPEG_N, JPEG_N)
    )
    for f in range(0, AVI_FRAMES, AVI_SAMPLE_EVERY):
        block = np.frombuffer(
            body[f * AVI_STEP : f * AVI_STEP + JPEG_BODY_LEN], np.uint8
        ).reshape(JPEG_N, JPEG_N)
        assert (decode_jpeg(frames[f]) == reference_decoded_plane(block)).all()


def test_avi_odd_sized_frames_pad_correctly():
    """RIFF chunks pad to even boundaries without counting the pad
    in the size; JPEG frames are arbitrary-length so odd sizes are
    routine.  Force an odd frame by appending a comment byte-odd
    payload guard: pick bodies until at least one frame is odd."""
    for seed in range(16):
        jfrs = _frames(_body(seed))
        if any(len(f) % 2 for f in jfrs):
            _, _, frames = decode_avi_mjpeg_frames(
                encode_avi_mjpeg(jfrs, JPEG_N, JPEG_N)
            )
            assert frames == jfrs
            return
    pytest.skip("no odd-sized frame produced by any seed")


def _corrupt(buf: bytes, at: int) -> bytes:
    b = bytearray(buf)
    b[at] ^= 1
    return bytes(b)


def test_avi_validations_fail_loudly():
    avi = encode_avi_mjpeg(_frames(_body()), JPEG_N, JPEG_N)
    with pytest.raises(ValueError):
        decode_avi_mjpeg_frames(_corrupt(avi, 0))  # RIFF magic
    with pytest.raises(ValueError):
        decode_avi_mjpeg_frames(_corrupt(avi, 8))  # AVI form type
    # idx1 offset disagreement with the movi walk
    i = avi.rfind(b"idx1")
    with pytest.raises(ValueError):
        decode_avi_mjpeg_frames(_corrupt(avi, i + 8 + 8))
    # idx1 size disagreement
    with pytest.raises(ValueError):
        decode_avi_mjpeg_frames(_corrupt(avi, i + 8 + 12))
    # non-MJPG handler in strh
    j = avi.find(b"strh")
    assert avi[j + 8 + 4 : j + 8 + 8] == b"MJPG"
    bad = avi[: j + 8 + 4] + b"H264" + avi[j + 8 + 8 :]
    with pytest.raises(ValueError):
        decode_avi_mjpeg_frames(bad)
    # avih frame count disagreement with movi
    k = avi.find(b"avih")
    cnt_at = k + 8 + 16  # dwTotalFrames
    (n,) = struct.unpack_from("<I", avi, cnt_at)
    assert n == AVI_FRAMES
    bad = avi[:cnt_at] + struct.pack("<I", n + 1) + avi[cnt_at + 4 :]
    with pytest.raises(ValueError):
        decode_avi_mjpeg_frames(bad)


def test_avi_pipeline_shape(spark):
    """The registered query emits exactly the sampled frames per
    document, with the loss bound the JPEG pipeline certifies."""
    from db_mapreduce_project_spark.operators.avi import (
        multimodal_video_avi_mjpeg_stats,
    )

    rows = multimodal_video_avi_mjpeg_stats(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        assert (r["width"], r["height"]) == (JPEG_N, JPEG_N)
        assert 0 <= r["p_min"] <= r["p_max"] <= 255
        assert r["max_abs_err"] >= 0
    want = list(range(0, AVI_FRAMES, AVI_SAMPLE_EVERY))
    for frames_seen in per_doc.values():
        assert sorted(frames_seen) == want
