"""From-scratch baseline JPEG codec (round-7 verdict #3).

The entropy/container layer must be LOSSLESS over the quantized
coefficients: decode(encode(x)) == idct(quant(fdct(x-128)) * Q)
exactly, for any block.  The transform layer is integer-exact by
construction (fixed-point DCT, floor shifts), which is what lets
the DuckDB oracle rebuild the decoded plane — these tests pin the
Python side; parity pins the SQL mirror.
"""

import numpy as np
import pytest

from db_mapreduce_project_spark.operators.jpeg import (
    JPEG_N,
    QTAB,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    int_fdct,
    int_idct,
    quantize,
    reference_decoded_plane,
)


def test_zigzag_is_the_standard_order():
    assert len(set(ZIGZAG)) == 64
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]


def test_roundtrip_exact_over_random_blocks():
    """500 seeded random blocks: the decoded plane equals the
    reference transform bit-for-bit — Huffman coding, zigzag, DC
    differencing, byte stuffing, the marker walk and the bit reader
    are all collectively lossless."""
    rng = np.random.RandomState(20260814)
    stuffed = 0
    for _ in range(500):
        block = rng.randint(0, 256, size=(8, 8)).astype(np.uint8)
        buf = encode_jpeg(block)
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        if b"\xff\x00" in buf[2:-2]:
            stuffed += 1
        assert (decode_jpeg(buf) == reference_decoded_plane(block)).all()
    # the corpus must actually exercise the 0xFF escape path
    assert stuffed > 0


def test_flat_block_is_dc_only_and_near_lossless():
    for v in (0, 77, 128, 255):
        flat = np.full((8, 8), v, dtype=np.uint8)
        plane = decode_jpeg(encode_jpeg(flat))
        # only DC rounding survives: error <= q(0,0)/2 / 8 rounded
        assert np.abs(plane.astype(int) - v).max() <= 1, v
        assert len(np.unique(plane)) == 1


def test_text_range_blocks_have_bounded_loss():
    """Pixels from the sanitized text plane live in [32, 126]; the
    loss the registered query reports must stay well under the
    pure-noise worst case."""
    rng = np.random.RandomState(7)
    worst = 0
    for _ in range(200):
        block = rng.randint(32, 127, size=(8, 8)).astype(np.uint8)
        plane = decode_jpeg(encode_jpeg(block))
        worst = max(
            worst, int(np.abs(plane.astype(int) - block.astype(int)).max())
        )
    assert worst <= 80, worst  # measured 73 on this seed


def test_decoder_reads_tables_from_the_stream():
    """Patch the DQT payload inside a real stream: the decoded plane
    must change accordingly — proof the decoder parses the
    transmitted table instead of assuming the encoder's."""
    rng = np.random.RandomState(3)
    # bright block: the DC coefficient must NOT quantize to zero,
    # or doubling the DC quantum is a no-op
    block = rng.randint(170, 256, size=(8, 8)).astype(np.uint8)
    buf = bytearray(encode_jpeg(block))
    i = buf.find(b"\xff\xdb")
    assert i >= 0
    # DQT body: 2 len bytes, 1 Pq/Tq byte, then 64 zigzag values;
    # double the DC quantum
    dq = i + 5
    orig = buf[dq]
    buf[dq] = orig * 2
    patched = decode_jpeg(bytes(buf))
    ref = reference_decoded_plane(block)
    assert not (patched == ref).all()
    # and the patched plane is exactly idct(coefs-with-doubled-dc-q)
    f = quantize(int_fdct(block.astype(np.int64) - 128))
    q2 = QTAB.copy()
    q2[0][0] = orig * 2
    assert (patched == int_idct(f * q2).astype(np.uint8)).all()


def test_malformed_streams_raise():
    block = np.full((8, 8), 50, dtype=np.uint8)
    buf = encode_jpeg(block)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00" + buf[2:])  # no SOI
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(buf[: len(buf) // 2])  # truncated mid-stream
    # SOS before any tables
    naked = b"\xff\xd8" + buf[buf.find(b"\xff\xda"):]
    with pytest.raises(ValueError):
        decode_jpeg(naked)


def test_pipeline_survives_non_ascii_and_null_text(spark):
    """The payload plane inherits the _ascii_body sanitization: any
    text (multi-byte, control, NULL) yields a valid 64-byte block
    and a decodable JPEG."""
    from db_mapreduce_project_spark.operators.jpeg import (
        build_jpeg_payloads,
    )

    rows = [
        (1, "héllo wörld \U0001f600 " + "ab" * 40),
        (2, None),
        (3, "你好"),
        (4, ""),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    for r in build_jpeg_payloads(d).collect():
        plane = decode_jpeg(bytes(r["img"]))
        assert plane.shape == (JPEG_N, JPEG_N)
        src = np.frombuffer(bytes(r["body"]), dtype=np.uint8)
        assert ((src >= 0x20) & (src <= 0x7E)).all()


def test_registered_query_matches_oracle_shape(spark):
    """Smoke the registered query end-to-end at the tiny fixture and
    sanity-bound the reported loss column."""
    from db_mapreduce_project_spark.operators.jpeg import (
        multimodal_decode_jpeg_stats,
    )

    rows = multimodal_decode_jpeg_stats(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert (r["width"], r["height"]) == (JPEG_N, JPEG_N)
        assert 0 <= r["p_min"] <= r["p_max"] <= 255
        assert 0 <= r["max_abs_err"] <= 80  # fixture-measured max 75


def test_phash_survives_codec_and_groups_families(spark):
    """Perceptual robustness (the property pHash exists for): the
    fingerprint mostly survives JPEG quantization loss — measured
    mean Hamming 1.32/15 bits at sf0.01 — and exact-fingerprint
    families are consistent with their window count."""
    from collections import Counter

    from db_mapreduce_project_spark.operators.jpeg import (
        PHASH_NBITS,
        multimodal_phash_neardup,
    )

    rows = multimodal_phash_neardup(spark, "/root/testdata/sf0.01").collect()
    assert rows
    hams = [r.ham_codec for r in rows]
    assert sum(hams) / len(hams) < 3.0  # measured 1.318
    fam = Counter(r.phash_dec for r in rows)
    for r in rows:
        assert 0 <= r.phash_src < (1 << PHASH_NBITS)
        assert 0 <= r.phash_dec < (1 << PHASH_NBITS)
        # ham_codec recomputes from the two hashes
        assert r.ham_codec == bin(r.phash_src ^ r.phash_dec).count("1")
        assert r.family_size == fam[r.phash_dec]
        assert r.is_dup == (r.family_size > 1)


def test_phash_planted_identical_prefix_same_family(spark):
    """Docs identical in their first 64 sanitized bytes must land
    in the same family; a doc with different low-frequency content
    must not share their fingerprint."""
    from db_mapreduce_project_spark.operators.jpeg import (
        build_jpeg_payloads,
        multimodal_phash_neardup,
        phash_of_plane,
    )

    same = "the same leading sixty-four characters of text right here ok" + " tail A"
    rows = [
        (0, same + " and then totally different continuation one"),
        (1, same + " with another divergent continuation two"),
        (2, "Z" * 32 + "a" * 32),  # different plane entirely
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    planes = {
        r["doc_id"]: np.frombuffer(bytes(r["body"]), dtype=np.uint8).reshape(8, 8)
        for r in build_jpeg_payloads(d).collect()
    }
    h = {i: phash_of_plane(p) for i, p in planes.items()}
    assert h[0] == h[1]
    assert h[2] != h[0]
