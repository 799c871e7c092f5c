"""AVI/RIFF + Motion-JPEG video pipeline — from scratch.

The decode-what-you-keep video frame-sampling stage over a REAL
codec container: each document becomes a 4-frame MJPEG AVI (one
baseline JPEG per frame, `jpeg.py`'s full ITU-T T.81 encoder), the
decode kernel walks the RIFF structure (hdrl headers, `movi` LIST,
`idx1` index — cross-validated against each other), and
JPEG-decodes ONLY the sampled frames.  This retires the last
"video container" gate with original code: the RIFF chunk walk is
the WAV/FLAC machinery generalized to nested LISTs, the per-frame
codec is the existing from-scratch baseline JPEG, and the sampling
shape matches `multimodal_video_frame_stats` (the GIF89a animation
twin).  Only true entropy-coded inter-frame video (H.264/VP9)
remains out of scope — MJPEG is intra-only by design, which is
precisely why it is buildable from shipped parts.

Container layout (Microsoft AVI RIFF form, public spec; OpenDML
AVI File Format Extensions v1.02 documents the same structures):

  RIFF('AVI '
    LIST('hdrl'
      avih(<MainAVIHeader: 14 DWORDs>)
      LIST('strl'
        strh(<AVIStreamHeader: fccType 'vids', fccHandler 'MJPG'>)
        strf(<BITMAPINFOHEADER: biCompression 'MJPG'>)))
    LIST('movi' 00dc(<JPEG>) x N)
    idx1(<16-byte entries: ckid, AVIIF_KEYFRAME, offset, size>))

idx1 offsets are relative to the START of the 'movi' LIST data
(the 'movi' fourcc itself is offset 0, so the first chunk header
sits at offset 4) — the dominant writer convention; the decoder
checks every entry against the movi walk, so a disagreement
anywhere (padding, sizes, ordering) fails loudly instead of
producing a wrong plane.

Reference parity: the reference engine has no multimodal surface
(SURVEY.md §2.2 — category absent; maprdeuce.cpp is text-only);
this is north-star scope.  Scale shape: two mapInPandas Arrow
kernels (build, decode) over `_spread` partitions; per-row state is
one small container; the oracle rebuilds each SAMPLED frame's
decoded plane from first principles (the jpeg.py integer-DCT chain
windowed per frame), so the value hash certifies the RIFF walk,
the idx1 cross-check, the per-frame entropy decode, AND the
sampling pattern in one number.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from .jpeg import (
    JPEG_BODY_LEN,
    JPEG_N,
    M_FIX,
    QTAB,
    _HALF,
    _SCALE,
    _fdiv,
    decode_jpeg,
    encode_jpeg,
)
from .multimodal import _ascii_body, _ascii_px_sql, _spread

AVI_FRAMES = 4
AVI_STEP = 32          # frame-to-frame window advance (50% overlap)
AVI_SAMPLE_EVERY = 2   # keep frames 0, 2
AVI_FPS = 25
_AVI_BODY_LEN = AVI_STEP * (AVI_FRAMES - 1) + JPEG_BODY_LEN  # 160
AVIIF_KEYFRAME = 0x10


def _u32(b: bytes, pos: int) -> int:
    return struct.unpack_from("<I", b, pos)[0]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc, LE dword size, payload, pad byte to an
    even boundary (the pad is NOT counted in the size — the rule
    the WAV walk already enforces)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _riff_list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list, w: int, h: int, fps: int = AVI_FPS
) -> bytes:
    """Assemble a spec-exact single-stream MJPEG AVI from
    already-encoded JPEG frames."""
    max_sz = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,   # dwMicroSecPerFrame
        max_sz * fps,       # dwMaxBytesPerSec
        0,                  # dwPaddingGranularity
        AVIIF_KEYFRAME,     # dwFlags: AVIF_HASINDEX
        len(frames),        # dwTotalFrames
        0,                  # dwInitialFrames
        1,                  # dwStreams
        max_sz,             # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,         # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHH8I4H",
        b"vids",            # fccType
        b"MJPG",            # fccHandler
        0,                  # dwFlags
        0,                  # wPriority
        0,                  # wLanguage
        0,                  # dwInitialFrames
        1,                  # dwScale
        fps,                # dwRate (rate/scale = fps)
        0,                  # dwStart
        len(frames),        # dwLength (in frames)
        max_sz,             # dwSuggestedBufferSize
        10_000,             # dwQuality
        0,                  # dwSampleSize (0: variable-size frames)
        0, 0, w, h,         # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                 # biSize
        w,
        h,
        1,                  # biPlanes
        24,                 # biBitCount
        b"MJPG",            # biCompression
        w * h * 3,          # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _riff_list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    # movi data + idx1 built together so the offsets cannot drift:
    # offset 0 is the 'movi' fourcc, so the first chunk lands at 4
    movi_payload = b""
    idx = b""
    for f in frames:
        off = 4 + len(movi_payload)
        movi_payload += _chunk(b"00dc", bytes(f))
        idx += struct.pack("<4sIII", b"00dc", AVIIF_KEYFRAME, off, len(f))
    return _chunk(
        b"RIFF",
        b"AVI " + hdrl + _riff_list(b"movi", movi_payload) + _chunk(b"idx1", idx),
    )


def decode_avi_mjpeg_frames(buf: bytes) -> tuple[int, int, list]:
    """Full RIFF walk of an MJPEG AVI: parse hdrl (dimensions,
    frame count, stream handler), collect every '00dc' frame from
    the movi LIST, parse idx1, and CROSS-VALIDATE index entries
    against the walked chunk offsets/sizes.  Returns (w, h,
    [jpeg_bytes, ...]) in stream order.  Raises ValueError on any
    structural disagreement — a video pipeline must fail loudly on
    a corrupt container, never emit a wrong plane."""
    if buf[0:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    riff_size = _u32(buf, 4)
    if len(buf) < 8 + riff_size or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI form")
    pos = 12
    end = 8 + riff_size
    w = h = total = None
    handler_ok = False
    frames: list = []
    movi_offsets: list = []
    idx_entries: list = []
    while pos + 8 <= end:
        ck = buf[pos : pos + 4]
        sz = _u32(buf, pos + 4)
        data = buf[pos + 8 : pos + 8 + sz]
        if ck == b"LIST":
            lt = data[0:4]
            if lt == b"hdrl":
                hp = 4
                while hp + 8 <= sz:
                    hck = data[hp : hp + 4]
                    hsz = _u32(data, hp + 4)
                    hdata = data[hp + 8 : hp + 8 + hsz]
                    if hck == b"avih":
                        dw = struct.unpack("<14I", hdata[:56])
                        total, w, h = dw[4], dw[8], dw[9]
                    elif hck == b"LIST" and hdata[0:4] == b"strl":
                        sp = 4
                        while sp + 8 <= hsz:
                            sck = hdata[sp : sp + 4]
                            ssz = _u32(hdata, sp + 4)
                            sdata = hdata[sp + 8 : sp + 8 + ssz]
                            if sck == b"strh":
                                if sdata[0:4] != b"vids":
                                    raise ValueError("stream is not video")
                                if sdata[4:8] != b"MJPG":
                                    raise ValueError(
                                        "unsupported video handler "
                                        + repr(sdata[4:8])
                                    )
                            elif sck == b"strf":
                                if sdata[16:20] != b"MJPG":
                                    raise ValueError(
                                        "strf biCompression is not MJPG"
                                    )
                                handler_ok = True
                            sp += 8 + ssz + (ssz & 1)
                    hp += 8 + hsz + (hsz & 1)
            elif lt == b"movi":
                wp = 4
                while wp + 8 <= sz:
                    fck = data[wp : wp + 4]
                    fsz = _u32(data, wp + 4)
                    if fck == b"00dc":
                        fr = data[wp + 8 : wp + 8 + fsz]
                        if fr[0:2] != b"\xff\xd8":
                            raise ValueError("frame does not start with SOI")
                        frames.append(fr)
                        movi_offsets.append((wp, fsz))
                    wp += 8 + fsz + (fsz & 1)
        elif ck == b"idx1":
            ip = 0
            while ip + 16 <= sz:
                ckid, flags, off, isz = struct.unpack_from("<4sIII", data, ip)
                idx_entries.append((ckid, flags, off, isz))
                ip += 16
        pos += 8 + sz + (sz & 1)
    if not handler_ok:
        raise ValueError("missing MJPG strf header")
    if total is None or w is None:
        raise ValueError("missing avih header")
    if total != len(frames):
        raise ValueError(f"avih says {total} frames, movi has {len(frames)}")
    if len(idx_entries) != len(frames):
        raise ValueError("idx1 entry count disagrees with movi walk")
    for (ckid, flags, off, isz), (wp, fsz) in zip(idx_entries, movi_offsets):
        if ckid != b"00dc" or not (flags & AVIIF_KEYFRAME):
            raise ValueError("bad idx1 entry")
        if off != wp or isz != fsz:
            raise ValueError(
                f"idx1 offset/size ({off},{isz}) disagrees with movi walk "
                f"({wp},{fsz})"
            )
    return w, h, frames


# ---------------------------------------------------------------
# Spark pipeline
# ---------------------------------------------------------------


def _encode_avi_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        vids = []
        for b in pdf["body"]:
            body = bytes(b)
            jfrs = []
            for f in range(AVI_FRAMES):
                win = body[f * AVI_STEP : f * AVI_STEP + JPEG_BODY_LEN]
                block = np.frombuffer(win, dtype=np.uint8).reshape(
                    JPEG_N, JPEG_N
                )
                jfrs.append(encode_jpeg(block))
            vids.append(encode_avi_mjpeg(jfrs, JPEG_N, JPEG_N))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "body": pdf["body"], "vid": vids}
        )


def build_avi_payloads(d: DataFrame) -> DataFrame:
    """Assemble a real 4-frame MJPEG AVI per document from the
    first _AVI_BODY_LEN sanitized text bytes (frame f carries the
    64-byte window at offset f*32 — 50% overlap, temporally
    correlated frames like video).  The source plane rides along
    for the per-frame loss bound."""
    return _spread(_avi_src(d)).mapInPandas(
        _encode_avi_batches, schema="doc_id bigint, body binary, vid binary"
    )


def _avi_src(d: DataFrame) -> DataFrame:
    body = _ascii_body(_AVI_BODY_LEN)
    return d.select("doc_id", F.encode(body, "UTF-8").alias("body"))


AVI_STATS_SCHEMA = (
    "doc_id bigint, frame_idx int, width int, height int, "
    "p_sum bigint, p_min bigint, p_max bigint, max_abs_err bigint"
)


def _sample_avi_frames_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, body, vid in zip(pdf["doc_id"], pdf["body"], pdf["vid"]):
            w, h, frames = decode_avi_mjpeg_frames(bytes(vid))
            src_all = np.frombuffer(bytes(body), dtype=np.uint8)
            for f in range(0, len(frames), AVI_SAMPLE_EVERY):
                plane = decode_jpeg(frames[f]).astype(np.int64)
                src = (
                    src_all[f * AVI_STEP : f * AVI_STEP + JPEG_BODY_LEN]
                    .reshape(JPEG_N, JPEG_N)
                    .astype(np.int64)
                )
                out.append(
                    (
                        doc_id,
                        f,
                        w,
                        h,
                        int(plane.sum()),
                        int(plane.min()),
                        int(plane.max()),
                        int(np.abs(plane - src).max()),
                    )
                )
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "frame_idx", "width", "height",
                "p_sum", "p_min", "p_max", "max_abs_err",
            ],
        )


def multimodal_video_avi_mjpeg_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """END-TO-END codec-video frame sampling: documents -> 4-frame
    MJPEG AVIs (RIFF container, per-frame baseline JPEG) -> full
    RIFF walk + idx1 cross-validation + JPEG decode of every 2nd
    frame only -> decoded-plane stats + per-frame loss bound.  The
    oracle rebuilds each sampled frame's LOSSY decoded plane from
    first principles (the jpeg.py fixed-point DCT chain, windowed
    per frame), so one wrong bit anywhere in container or codec
    breaks the value hash."""
    d = load_table(spark, sf_dir, "documents")
    from .multimodal import fuse_batches

    stats = _spread(_avi_src(d)).mapInPandas(
        fuse_batches(_encode_avi_batches, _sample_avi_frames_batches),
        schema=AVI_STATS_SCHEMA,
    )
    return stats.orderBy("doc_id", "frame_idx")


def _avi_oracle_sql() -> str:
    """The jpeg.py first-principles oracle with a sampled-frame
    dimension: every CTE of the DCT -> quantize -> IDCT chain
    carries (doc_id, f), and frame f's pixel source is the 64-byte
    window at body offset f*AVI_STEP."""
    m_rows = ", ".join(
        f"({u}, {i}, {int(M_FIX[u][i])})" for u in range(8) for i in range(8)
    )
    q_rows = ", ".join(
        f"({r}, {c}, {int(QTAB[r][c])})" for r in range(8) for c in range(8)
    )
    frames_sql = ", ".join(
        str(f) for f in range(0, AVI_FRAMES, AVI_SAMPLE_EVERY)
    )
    half = _HALF
    return f"""
WITH mconst(u, i, m) AS (SELECT * FROM (VALUES {m_rows})),
qtab(r, c, q) AS (SELECT * FROM (VALUES {q_rows})),
px AS (
  SELECT doc_id, fr.f AS f, (j - 1) // 8 AS r, (j - 1) % 8 AS c,
         CAST(ascii(substring(body, fr.f * {AVI_STEP} + j, 1)) AS BIGINT)
           - 128 AS v
  FROM (
    SELECT doc_id, {_ascii_px_sql(_AVI_BODY_LEN)} AS body FROM documents
  ) p,
  (SELECT unnest([{frames_sql}]) AS f) fr,
  generate_series(1, {JPEG_BODY_LEN}) AS g(j)
),
t1 AS (
  SELECT p.doc_id, p.f, m.u AS u, p.c AS j,
         {_fdiv('sum(m.m * p.v) + ' + str(half), _SCALE)} AS v
  FROM px p JOIN mconst m ON m.i = p.r
  GROUP BY p.doc_id, p.f, m.u, p.c
),
fd AS (
  SELECT t.doc_id, t.f, t.u AS u, m.u AS vv,
         {_fdiv('sum(m.m * t.v) + ' + str(half), _SCALE)} AS v
  FROM t1 t JOIN mconst m ON m.i = t.j
  GROUP BY t.doc_id, t.f, t.u, m.u
),
qd AS (
  SELECT f.doc_id, f.f, f.u, f.vv,
         (CASE WHEN f.v >= 0 THEN (f.v + q.q // 2) // q.q
               ELSE -((-f.v + q.q // 2) // q.q) END) * q.q AS v
  FROM fd f JOIN qtab q ON q.r = f.u AND q.c = f.vv
),
i1 AS (
  SELECT d.doc_id, d.f, m.i AS i, d.vv AS vv,
         {_fdiv('sum(m.m * d.v) + ' + str(half), _SCALE)} AS v
  FROM qd d JOIN mconst m ON m.u = d.u
  GROUP BY d.doc_id, d.f, m.i, d.vv
),
recon AS (
  SELECT t.doc_id, t.f, t.i AS r, m.i AS c,
         least(greatest({_fdiv('sum(m.m * t.v) + ' + str(half), _SCALE)}
                        + 128, 0), 255) AS p
  FROM i1 t JOIN mconst m ON m.u = t.vv
  GROUP BY t.doc_id, t.f, t.i, m.i
)
SELECT r.doc_id,
       CAST(r.f AS INTEGER) AS frame_idx,
       CAST({JPEG_N} AS INTEGER) AS width,
       CAST({JPEG_N} AS INTEGER) AS height,
       CAST(sum(r.p) AS BIGINT) AS p_sum,
       CAST(min(r.p) AS BIGINT) AS p_min,
       CAST(max(r.p) AS BIGINT) AS p_max,
       CAST(max(abs(r.p - (s.v + 128))) AS BIGINT) AS max_abs_err
FROM recon r
JOIN px s ON s.doc_id = r.doc_id AND s.f = r.f
         AND s.r = r.r AND s.c = r.c
GROUP BY r.doc_id, r.f
ORDER BY r.doc_id, frame_idx
"""


MULTIMODAL_VIDEO_AVI_MJPEG_ORACLE = _avi_oracle_sql()

register(
    "multimodal_video_avi_mjpeg_stats",
    multimodal_video_avi_mjpeg_stats,
    MULTIMODAL_VIDEO_AVI_MJPEG_ORACLE,
)
