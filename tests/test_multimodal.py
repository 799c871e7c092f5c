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


# ---------------------------------------------------------------- PNG


def test_png_roundtrip_exercises_every_filter():
    from db_mapreduce_project_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    # h=11 > 5 rows => filter types 0..4 all appear at least twice
    w, h = 7, 11
    samples = bytes((i * 37 + 11) % 256 for i in range(w * h * 3))
    png = encode_png(w, h, samples)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert decode_png(png) == (w, h, samples)


def test_png_rejects_malformed():
    from db_mapreduce_project_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    png = encode_png(2, 2, bytes(range(12)))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a" + png[6:])
    with pytest.raises(ValueError, match="truncated"):
        decode_png(png[:-6])
    # flip one IDAT byte: the chunk CRC must catch it
    idat_at = png.index(b"IDAT") + 4
    corrupt = png[:idat_at] + bytes([png[idat_at] ^ 0xFF]) + png[idat_at + 1 :]
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(corrupt)
    # 16-bit / non-RGB headers are out of the payload contract
    import struct
    import zlib as _z

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
        )

    bad_ihdr = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(bytes(26)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="8-bit RGB"):
        decode_png(bad_ihdr)
    # an IHDR whose declared length is not 13 (valid CRC) must raise
    # ValueError, not struct.error (advice item: the docstring
    # promises ValueError for every malformed payload)
    short_ihdr = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBB", 2, 2, 8, 2, 0))
        + chunk(b"IDAT", _z.compress(bytes(26)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IHDR length"):
        decode_png(short_ihdr)
    # chunk-order violation: IDAT before IHDR
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
    idat = chunk(b"IDAT", _z.compress(bytes(26)))
    out_of_order = (
        b"\x89PNG\r\n\x1a\n" + idat + ihdr + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT chunk before IHDR"):
        decode_png(out_of_order)


def test_png_roundtrip_property():
    """Property form of the PNG round-trip: arbitrary geometries and
    pixel bytes must survive encode -> decode bit-for-bit.  Heights
    above 5 cycle through every filter type; widths below the 3-byte
    pixel exercise the x < bpp branches of Sub/Average/Paeth."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from db_mapreduce_project_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    @settings(max_examples=120, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=1, max_value=9),
        data=st.data(),
    )
    def inner(w, h, data):
        samples = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * 3,
                    max_size=w * h * 3,
                )
            )
        )
        assert decode_png(encode_png(w, h, samples)) == (w, h, samples)

    inner()


# ---------------------------------------------------------------- WAV


def test_wav_roundtrip_with_junk_chunk():
    import numpy as np

    from db_mapreduce_project_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = np.arange(-32, 32, dtype=np.int16) * 257
    wav = encode_wav(samples, 2, 8000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert b"JUNK" in wav  # the odd-length skip-path chunk is planted
    n_ch, rate, got = decode_wav(wav)
    assert (n_ch, rate) == (2, 8000)
    assert (got == samples).all()


def test_wav_rejects_malformed():
    import struct as _s

    import numpy as np

    from db_mapreduce_project_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    wav = encode_wav(np.zeros(8, dtype=np.int16), 2, 8000)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS" + wav[4:])
    with pytest.raises(ValueError, match="not WAVE"):
        decode_wav(wav[:8] + b"AVI " + wav[12:])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:-10])
    # data before fmt violates the required ordering
    def chunk(cid, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return cid + _s.pack("<I", len(payload)) + payload + pad

    fmt = _s.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = chunk(b"data", bytes(8)) + chunk(b"fmt ", fmt)
    oo = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="data chunk before fmt"):
        decode_wav(oo)
    # non-PCM format tag
    fmt_f32 = _s.pack("<HHIIHH", 3, 2, 8000, 64000, 8, 32)
    body = chunk(b"fmt ", fmt_f32) + chunk(b"data", bytes(16))
    f32 = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="only PCM16"):
        decode_wav(f32)
    # ragged data (not a whole number of stereo frames)
    body = chunk(b"fmt ", fmt) + chunk(b"data", bytes(6))
    ragged = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="whole number"):
        decode_wav(ragged)


def test_wav_roundtrip_property():
    """Property form of the WAV round-trip: arbitrary sample values
    (full int16 range, including -32768), channel counts, and frame
    counts (including zero frames) survive encode -> decode
    bit-for-bit, with the planted odd JUNK chunk always skipped."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from db_mapreduce_project_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    @settings(max_examples=120, deadline=None)
    @given(
        n_ch=st.integers(min_value=1, max_value=4),
        rate=st.sampled_from([8000, 16000, 44100]),
        frames=st.integers(min_value=0, max_value=32),
        data=st.data(),
    )
    def inner(n_ch, rate, frames, data):
        vals = data.draw(
            st.lists(
                st.integers(-32768, 32767),
                min_size=frames * n_ch,
                max_size=frames * n_ch,
            )
        )
        samples = np.array(vals, dtype=np.int16)
        got_ch, got_rate, got = decode_wav(encode_wav(samples, n_ch, rate))
        assert (got_ch, got_rate) == (n_ch, rate)
        assert (got == samples).all()

    inner()


def test_rice_codec_roundtrip_property():
    """The from-scratch Rice audio codec: arbitrary int16 sample
    streams (including alternating full-scale extremes, which force
    the unary-escape path, and empty/one-sample streams) must
    survive predict -> zigzag -> entropy-code -> decode bit-for-bit,
    and compressible inputs must actually compress below raw PCM."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from db_mapreduce_project_spark.operators.multimodal import (
        rice_decode_audio,
        rice_encode_audio,
    )

    @settings(max_examples=120, deadline=None)
    @given(
        vals=st.lists(st.integers(-32768, 32767), min_size=0, max_size=64),
        n_ch=st.integers(min_value=1, max_value=2),
    )
    def inner(vals, n_ch):
        samples = np.array(vals, dtype=np.int16)
        packed = rice_encode_audio(samples, n_ch, 8000)
        got_ch, got_rate, got = rice_decode_audio(packed)
        assert (got_ch, got_rate) == (n_ch, 8000)
        assert (got == samples).all()

    inner()

    # adversarial escape-path case: alternating full-scale swings
    swing = np.tile(np.array([32767, -32768], dtype=np.int16), 64)
    _, _, got = rice_decode_audio(rice_encode_audio(swing, 1, 8000))
    assert (got == swing).all()
    # smooth signals genuinely compress: a slow ramp's residuals are
    # tiny, so the stream must beat 2 bytes/sample raw PCM
    ramp = (np.arange(4096) % 256).astype(np.int16)
    packed = rice_encode_audio(ramp, 1, 8000)
    assert len(packed) < 2 * len(ramp)
    with pytest.raises(ValueError, match="not a rice-audio"):
        rice_decode_audio(b"WAVE" + packed[4:])
    with pytest.raises(ValueError, match="truncated"):
        rice_decode_audio(packed[: len(packed) // 2])


def test_mulaw_compander_properties():
    """The G.711 compander over the ENTIRE domain: every one of the
    65536 int16 inputs reconstructs within its segment's half-step
    (the μ-law quantization bound), encode(decode(code)) == code for
    all 256 codes (idempotence on the code lattice), and negation
    flips exactly the sign bit."""
    import numpy as np

    from db_mapreduce_project_spark.operators.multimodal import (
        mulaw_decode,
        mulaw_encode,
    )

    x = np.arange(-32768, 32768, dtype=np.int64).astype(np.int16)
    codes = mulaw_encode(x)
    back = mulaw_decode(codes)
    y = 255 - codes.astype(np.int64)
    exponent = (y >> 4) & 0x07
    # reconstruction is the cell's base point: the true (clipped)
    # sample lies within one mantissa step (8 << exponent) above it
    clipped = np.clip(x.astype(np.int64), -32635, 32635)
    err = np.abs(back - clipped)
    assert (err < (1 << (exponent + 3))).all()
    # idempotence: re-encoding every code's reconstruction yields
    # the same code — except the format's famous NEGATIVE ZERO
    # (0x7F), which decodes to 0 and re-encodes as positive zero
    # (0xFF); G.711 defines both codes for the same sample value
    all_codes = np.arange(256, dtype=np.uint8)
    recon = mulaw_decode(all_codes)
    re2 = mulaw_encode(np.clip(recon, -32768, 32767).astype(np.int16))
    mismatch = np.where(re2 != all_codes)[0]
    assert mismatch.tolist() == [0x7F]
    assert recon[0x7F] == 0 and re2[0x7F] == 0xFF
    # sign symmetry: negation flips only the sign bit
    pos = np.arange(1, 32768, dtype=np.int64)
    assert (
        mulaw_encode((-pos).astype(np.int16))
        == (mulaw_encode(pos.astype(np.int16)) ^ 0x80)
    ).all()


def test_wav_payloads_are_valid_audio(spark, sf_dir):
    from db_mapreduce_project_spark.operators.multimodal import (
        WAV_CHANNELS,
        WAV_FRAMES,
        WAV_RATE,
        build_wav_payloads,
        decode_wav,
    )
    from db_mapreduce_project_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(20)
    for r in build_wav_payloads(d).collect():
        n_ch, rate, samples = decode_wav(bytes(r["wav"]))
        assert (n_ch, rate) == (WAV_CHANNELS, WAV_RATE)
        assert len(samples) == WAV_FRAMES * WAV_CHANNELS


def test_png_payloads_are_valid_images(spark, sf_dir):
    from db_mapreduce_project_spark.operators.multimodal import (
        build_png_payloads,
        decode_png,
    )

    d = load_table(spark, sf_dir, "documents")
    rows = build_png_payloads(d).limit(20).collect()
    assert rows
    for r in rows:
        w, h, samples = decode_png(bytes(r["img"]))
        assert (w, h) == (PPM_W, PPM_H)
        assert len(samples) == PPM_W * PPM_H * 3


def test_png_and_ppm_pipelines_agree(spark, sf_dir):
    """Same pixel plane, two containers: the PNG pipeline (deflate +
    filters) must produce the identical stats rows as the raw PPM
    pipeline — compression round-trip is lossless end-to-end."""
    from db_mapreduce_project_spark.operators.multimodal import (
        multimodal_decode_png_stats,
    )

    ppm = [tuple(r) for r in multimodal_decode_stats(spark, sf_dir).collect()]
    png = [
        tuple(r) for r in multimodal_decode_png_stats(spark, sf_dir).collect()
    ]
    assert png == ppm


def test_payload_planes_survive_non_ascii_text(spark):
    """Round-7 ADVICE regression: a multi-byte (or control)
    character in `text` must not lengthen the UTF-8 byte body past
    the declared plane size — the _ascii_body sanitization maps
    every char outside printable ASCII to 'x' BEFORE padding, so the
    byte plane and the oracles' per-character ascii() agree for ANY
    input, not just ASCII fixtures."""
    from db_mapreduce_project_spark.operators.multimodal import (
        WAV_BODY_LEN,
        WAV_CHANNELS,
        WAV_FRAMES,
        WAV_RATE,
        _WAV_SAMPLE_BIAS,
        _WAV_SAMPLE_GAIN,
        build_ppm_payloads,
        build_wav_payloads,
        decode_wav,
    )

    rows = [
        (1, "héllo wörld é€\U0001f600 café " + "ab" * 40),
        (2, "tabs\tand\nnewlines\r\nmixed with ünïcode ß"),
        (3, "你好"),  # fully non-ASCII, shorter than the body
        (4, None),
        (5, ""),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")

    for r in build_wav_payloads(d).collect():
        n_ch, rate, samples = decode_wav(bytes(r["wav"]))
        assert (n_ch, rate) == (WAV_CHANNELS, WAV_RATE)
        assert len(samples) == WAV_FRAMES * WAV_CHANNELS
        # every sample comes from a printable-ASCII byte
        for s in samples.tolist():
            b = s // _WAV_SAMPLE_GAIN + _WAV_SAMPLE_BIAS
            assert s == (b - _WAV_SAMPLE_BIAS) * _WAV_SAMPLE_GAIN
            assert 0x20 <= b <= 0x7E

    # the sanitized plane is exactly char-by-char: doc 1's 'h' stays,
    # 'é' becomes 'x'
    wav1 = next(
        bytes(r["wav"]) for r in build_wav_payloads(d).collect()
        if r["doc_id"] == 1
    )
    _, _, samples1 = decode_wav(wav1)
    want_prefix = "hxllo wxrld xxx cafx "
    got = [
        s // _WAV_SAMPLE_GAIN + _WAV_SAMPLE_BIAS
        for s in samples1.tolist()[: len(want_prefix)]
    ]
    assert bytes(got).decode("ascii") == want_prefix

    for r in build_ppm_payloads(d).collect():
        w, h, _maxval, samples = decode_ppm(bytes(r["img"]))
        assert (w, h) == (PPM_W, PPM_H)
        assert len(samples) == PPM_W * PPM_H * 3


# ------------------------------------------------------------- GIF / LZW


def test_gif_lzw_roundtrip_properties():
    """Encoder and decoder are independent LZW implementations:
    round-trip identity over runs (KwKwK first-entry case), cycles,
    full-byte alphabets, and a 20000-symbol stream that crosses
    every code-width boundary AND the 4096-entry dictionary-full
    clear-code reset."""
    import random

    from db_mapreduce_project_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = random.Random(7)
    cases = [
        b"a" * 100,                 # KwKwK immediately
        b"ab" * 200,
        b"abc" * 300,
        bytes(range(256)) * 20,
        bytes(rng.randrange(256) for _ in range(20000)),
    ]
    for data in cases:
        w, h, gray = decode_gif(encode_gif(data))
        assert (w, h) == (len(data), 1)
        assert gray == data


def test_gif_payloads_are_valid_images(spark, sf_dir):
    """Every built payload is a structurally valid GIF87a whose
    decoded plane is exactly the sanitized 48-byte body."""
    from db_mapreduce_project_spark.operators.multimodal import (
        _PPM_BODY_LEN,
        build_gif_payloads,
        decode_gif,
    )
    from db_mapreduce_project_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    for r in build_gif_payloads(d).collect():
        img = bytes(r["img"])
        assert img[:6] == b"GIF87a"
        assert img[-1:] == b"\x3b"
        w, h, gray = decode_gif(img)
        assert (w, h) == (_PPM_BODY_LEN, 1)
        assert len(gray) == _PPM_BODY_LEN
        assert all(0x20 <= b <= 0x7E for b in gray)


def test_gif_and_ppm_pipelines_agree(spark, sf_dir):
    """The GIF pipeline must recover the identical channel sums the
    PPM pipeline reads raw — the cross-codec losslessness pin."""
    from db_mapreduce_project_spark.operators.multimodal import (
        multimodal_decode_gif_stats,
        multimodal_decode_stats,
    )

    gif = {
        r.doc_id: (r.r_sum, r.g_sum, r.b_sum)
        for r in multimodal_decode_gif_stats(spark, sf_dir).collect()
    }
    ppm = {
        r.doc_id: (r.r_sum, r.g_sum, r.b_sum)
        for r in multimodal_decode_stats(spark, sf_dir).collect()
    }
    assert gif == ppm


def test_gif_anim_roundtrip_and_extension_walk():
    """Multi-frame container: NETSCAPE + per-frame GCE extensions
    must be walked structurally (not pattern-matched), every frame
    LZW round-trips, and single-frame decode_gif rejects an
    animation (frame-count contract)."""
    import random

    import pytest as _pytest

    from db_mapreduce_project_spark.operators.multimodal import (
        decode_gif,
        decode_gif_frames,
        encode_gif_anim,
    )

    rng = random.Random(5)
    frames = [
        bytes(rng.randrange(256) for _ in range(48)) for _ in range(6)
    ]
    buf = encode_gif_anim(frames, 48)
    assert buf[:6] == b"GIF89a"
    w, h, got = decode_gif_frames(buf)
    assert (w, h) == (48, 1)
    assert got == frames
    with _pytest.raises(ValueError, match="expected 1 frame"):
        decode_gif(buf)


def test_gif_truncation_raises_valueerror_not_indexerror():
    """ADVICE r8: a truncated/corrupt GIF must fail the parser's
    ValueError contract at EVERY cut point, never an IndexError
    from unchecked buf[pos] walks."""
    import random

    import pytest as _pytest

    from db_mapreduce_project_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_anim,
    )

    rng = random.Random(11)
    frames = [
        bytes(rng.randrange(256) for _ in range(48)) for _ in range(3)
    ]
    buf = encode_gif_anim(frames, 48)
    # every proper prefix must raise ValueError (truncated / not a
    # GIF / short header), never IndexError
    for cut in range(len(buf)):
        with _pytest.raises(ValueError):
            decode_gif_frames(buf[:cut])


def test_video_frame_sampling_decodes_only_kept_frames(spark, sf_dir):
    """The sampled output: frames 0 and 2 of 4 per doc, each
    frame's sums equal the direct window arithmetic on the
    sanitized text."""
    from db_mapreduce_project_spark.io import load_table
    from db_mapreduce_project_spark.operators.multimodal import (
        _PPM_BODY_LEN,
        VID_STEP,
        multimodal_video_frame_stats,
    )
    import re

    out = multimodal_video_frame_stats(spark, sf_dir).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 2] for v in by_doc.values())

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").limit(20).collect()
    }
    for doc_id, text in docs.items():
        clean = re.sub(r"[^ -~]", "x", text or "")
        body = (clean[:120] + "x" * 120)[:120]
        for r in [x for x in out if x.doc_id == doc_id]:
            win = body[r.frame_idx * VID_STEP :][:_PPM_BODY_LEN]
            want = [0, 0, 0]
            for j, ch in enumerate(win):
                want[j % 3] += ord(ch)
            assert (r.r_sum, r.g_sum, r.b_sum) == tuple(want), doc_id
