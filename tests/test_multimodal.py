"""Multimodal decode path: the pure-Python P6 PPM parser and the
end-to-end Spark decode-stats pipeline (FIXTURES.md B; the decode
kernel shape is the one a JPEG decoder would slot into)."""

from __future__ import annotations

import pytest

from db_mapreduce_project_spark.io import load_table
from db_mapreduce_project_spark.operators.multimodal import (
    PPM_H,
    PPM_W,
    build_ppm_payloads,
    decode_ppm,
    multimodal_decode_stats,
)


def _ppm(w: int, h: int, samples: bytes, header: bytes | None = None) -> bytes:
    return (header or f"P6\n{w} {h}\n255\n".encode()) + samples


def test_decode_ppm_roundtrip():
    samples = bytes(range(2 * 2 * 3))
    w, h, maxval, out = decode_ppm(_ppm(2, 2, samples))
    assert (w, h, maxval) == (2, 2, 255)
    assert out == samples


def test_decode_ppm_handles_comments_and_whitespace():
    # netpbm allows '#' comments and arbitrary whitespace between
    # header tokens
    header = b"P6 # a comment\n# another\n  2\t1 # dims\n255\n"
    samples = b"\x01\x02\x03\x04\x05\x06"
    w, h, maxval, out = decode_ppm(header + samples)
    assert (w, h, maxval) == (2, 1, 255)
    assert out == samples


def test_decode_ppm_rejects_malformed():
    with pytest.raises(ValueError, match="magic"):
        decode_ppm(b"P5\n2 2\n255\n" + bytes(12))
    with pytest.raises(ValueError, match="8-bit"):
        decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))
    with pytest.raises(ValueError, match="sample bytes"):
        decode_ppm(b"P6\n2 2\n255\n" + bytes(5))  # truncated
    with pytest.raises(ValueError, match="sample bytes"):
        # oversize must fail as loudly as truncation: a char-counted
        # body with a multi-byte UTF-8 char would otherwise be
        # silently sliced mid-codepoint, diverging from the oracle
        decode_ppm(b"P6\n2 2\n255\n" + bytes(20))
    with pytest.raises(ValueError, match="malformed"):
        decode_ppm(b"P6\nxx yy\n255\n" + bytes(12))


def test_ppm_payloads_are_valid_images(spark, sf_dir):
    # every Spark-assembled payload must parse with the real decoder
    d = load_table(spark, sf_dir, "documents")
    rows = build_ppm_payloads(d).limit(20).collect()
    assert rows
    for r in rows:
        w, h, _maxval, samples = decode_ppm(bytes(r["img"]))
        assert (w, h) == (PPM_W, PPM_H)
        assert len(samples) == PPM_W * PPM_H * 3


def test_decode_stats_matches_python_reference(spark, sf_dir):
    # cross-check the distributed kernel against a driver-side
    # recompute over the raw text bytes
    d = load_table(spark, sf_dir, "documents")
    stats = {
        r["doc_id"]: r for r in multimodal_decode_stats(spark, sf_dir).collect()
    }
    for r in d.select("doc_id", "text").limit(20).collect():
        body = r["text"][: PPM_W * PPM_H * 3].ljust(PPM_W * PPM_H * 3, "x")
        by_ch = [0, 0, 0]
        for j, ch in enumerate(body.encode()):
            by_ch[j % 3] += ch
        got = stats[r["doc_id"]]
        assert (got["r_sum"], got["g_sum"], got["b_sum"]) == tuple(by_ch)
        assert (got["width"], got["height"]) == (PPM_W, PPM_H)
