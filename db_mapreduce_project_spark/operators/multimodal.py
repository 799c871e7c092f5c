"""Multimodal column handling: opaque binary payloads with typed
metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

The decode path is REAL for the netpbm P6 (binary PPM) container:
`decode_ppm` is a from-scratch pure-Python parser (header
tokenizer with comment handling, maxval validation, exact-length
raw sample read) and `multimodal_decode_stats` runs it inside the
Arrow kernel over P6 payloads assembled Spark-side.  Compressed
codecs (JPEG/PNG/audio/video) need native libraries this container
doesn't ship, so those formats would plug into the same kernel via
the identical (binary -> parsed array -> stats) shape;
`fake_features` remains the deterministic stand-in featurizer for
the generic-binary queries.

Scale: mapInPandas streams Arrow record batches — constant memory
per task regardless of partition size; binary payloads never pass
through Python row-by-row between operators (the per-image parse
loop inside a batch is the decode itself, exactly where a JPEG
decoder would sit).  The oracles reproduce the arithmetic in SQL
(the fixture text is ASCII, so byte == codepoint).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, first_byte int, head_sum bigint"
)

HEAD_N = 64

# multimodal_decode_stats image geometry: 4x4 RGB => 48 raw sample
# bytes per P6 payload, sourced from the first 48 text bytes
# (rpad'ed so every doc yields a full image)
PPM_W = 4
PPM_H = 4
_PPM_BODY_LEN = PPM_W * PPM_H * 3

_WS = b" \t\r\n"


def decode_ppm(buf: bytes) -> tuple[int, int, int, bytes]:
    """Pure-Python netpbm P6 (binary PPM) decoder: parses the ASCII
    header (magic, width, height, maxval; '#' comments and runs of
    whitespace between tokens per the netpbm spec), then reads
    exactly width*height*3 raw sample bytes after the single
    whitespace byte that terminates the header.  Returns
    (width, height, maxval, samples).  Raises ValueError on a wrong
    magic, an unsupported >8-bit maxval, or truncated samples —
    malformed payloads must fail loudly, not yield garbage stats."""
    pos = 0

    def _token() -> bytes:
        nonlocal pos
        while pos < len(buf):
            c = buf[pos]
            if c in _WS:
                pos += 1
            elif c == 0x23:  # '#' comment runs to end of line
                while pos < len(buf) and buf[pos] != 0x0A:
                    pos += 1
            else:
                break
        start = pos
        while pos < len(buf) and buf[pos] not in _WS:
            pos += 1
        return buf[start:pos]

    magic = _token()
    if magic != b"P6":
        raise ValueError(f"not a binary PPM (P6): magic={magic!r}")
    try:
        width, height, maxval = int(_token()), int(_token()), int(_token())
    except ValueError as e:
        raise ValueError(f"malformed PPM header: {e}") from None
    if not 0 < maxval < 256:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxval})")
    pos += 1  # exactly one whitespace byte after maxval, per spec
    need = width * height * 3
    have = len(buf) - pos
    # exact-length contract, BOTH directions: short = truncated,
    # long = the payload wasn't byte-counted (e.g. a multi-byte
    # UTF-8 char slipped into a char-counted body) — silently
    # slicing `need` bytes would diverge from the codepoint-summing
    # oracle, so oversize must fail as loudly as truncation.
    if have != need:
        raise ValueError(
            f"bad PPM body: need exactly {need} sample bytes, have {have}"
        )
    return width, height, maxval, buf[pos:]


def fake_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake 'decode': (byte length, first byte, sum of
    first 64 bytes).  Stands in for decode->resize->embed."""
    return (
        len(payload),
        payload[0] if payload else -1,
        sum(payload[:HEAD_N]),
    )


def _featurize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = pdf["payload"].map(fake_features)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": feats.map(lambda t: t[0]),
                "first_byte": feats.map(lambda t: t[1]),
                "head_sum": feats.map(lambda t: t[2]),
            }
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-cast as an opaque binary payload column,
    featurized via mapInPandas (Arrow batches)."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    feats = payloads.mapInPandas(_featurize_batches, schema=FEATURE_SCHEMA)
    return feats.orderBy("doc_id")


MULTIMODAL_FEATURES_ORACLE = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(CASE WHEN length(text) = 0 THEN -1
            ELSE ascii(substring(text, 1, 1)) END AS INTEGER) AS first_byte,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(substring(text, 1, {HEAD_N}), ''),
                           c -> CAST(ascii(c) AS BIGINT))),
            (a, b) -> a + b) AS BIGINT) AS head_sum
FROM documents
ORDER BY doc_id
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Frame sampling' over the binary payload: every 16th byte of
    the first 128 bytes (the video-frame-stride pattern), emitted
    long-format via posexplode of a sliced byte array.  Pure
    Catalyst — binary slicing stays JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    # positions 1, 17, 33, ... ,113 (1-based), clipped to payload len
    frames = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.struct(
                i.alias("frame_no"),
                F.ascii(
                    F.substring(F.col("text"), i * 16 + 1, F.lit(1))
                ).alias("byte_val"),
            ),
        ),
        lambda s: s["frame_no"] * 16 < F.length("text"),
    )
    return (
        d.select("doc_id", F.explode(frames).alias("fr"))
        .select(
            "doc_id",
            F.col("fr.frame_no").cast("int").alias("frame_no"),
            F.col("fr.byte_val").cast("int").alias("byte_val"),
        )
        .orderBy("doc_id", "frame_no")
    )


MULTIMODAL_FRAME_SAMPLE_ORACLE = """
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_no,
       CAST(ascii(substring(text, i * 16 + 1, 1)) AS INTEGER) AS byte_val
FROM documents, generate_series(0, 7) AS g(i)
WHERE i * 16 < length(text)
ORDER BY doc_id, frame_no
"""


def build_ppm_payloads(d: DataFrame) -> DataFrame:
    """Assemble a REAL P6 PPM container per document, entirely
    JVM-side: ASCII header + 48 raw sample bytes taken from the
    first 48 text bytes (rpad'ed with 'x' so short docs still form
    a complete 4x4 RGB image).  The payload is a valid image any
    netpbm tool could open — not a synthetic blob."""
    # NULL text builds the all-pad image rather than a NULL payload
    # (concat/encode propagate null, which would surface as an
    # opaque bytes(None) TypeError deep in the Arrow kernel).
    text = F.coalesce(F.col("text"), F.lit(""))
    body = F.rpad(F.substring(text, 1, _PPM_BODY_LEN), _PPM_BODY_LEN, "x")
    header = F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n")
    return d.select(
        "doc_id", F.encode(F.concat(header, body), "UTF-8").alias("img")
    )


DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "r_sum bigint, g_sum bigint, b_sum bigint"
)


def _decode_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, img in zip(pdf["doc_id"], pdf["img"]):
            w, h, _maxval, samples = decode_ppm(bytes(img))
            # channel sums over the decoded pixel array — the
            # canonical "decode -> per-channel stats" kernel shape
            arr = np.frombuffer(samples, dtype=np.uint8).reshape(h, w, 3)
            sums = arr.sum(axis=(0, 1), dtype=np.int64)
            out.append(
                (doc_id, w, h, int(sums[0]), int(sums[1]), int(sums[2]))
            )
        yield pd.DataFrame(
            out,
            columns=["doc_id", "width", "height", "r_sum", "g_sum", "b_sum"],
        )


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END real decode: documents -> P6 PPM binary payloads
    (built JVM-side) -> pure-Python PPM parse inside an Arrow
    mapInPandas kernel -> per-channel pixel sums.  This is the
    actual decode/feature-extract pipeline shape for image columns
    at 100 TB — swap decode_ppm for a JPEG decoder and nothing else
    changes (schema, batching, partitioning are format-agnostic)."""
    d = load_table(spark, sf_dir, "documents")
    stats = build_ppm_payloads(d).mapInPandas(
        _decode_stats_batches, schema=DECODE_SCHEMA
    )
    return stats.orderBy("doc_id")


# Oracle rebuilds the pixel plane arithmetic: sample byte j
# (1-based, 1..48) of the rpad'ed text belongs to channel (j-1)%3;
# the header contributes nothing to the sums.  ASCII fixture =>
# ascii(char) == payload byte.
MULTIMODAL_DECODE_STATS_ORACLE = f"""
SELECT doc_id,
       CAST({PPM_W} AS INTEGER) AS width,
       CAST({PPM_H} AS INTEGER) AS height,
       CAST(sum(CASE WHEN (j - 1) % 3 = 0
                THEN ascii(substring(px, j, 1)) END) AS BIGINT) AS r_sum,
       CAST(sum(CASE WHEN (j - 1) % 3 = 1
                THEN ascii(substring(px, j, 1)) END) AS BIGINT) AS g_sum,
       CAST(sum(CASE WHEN (j - 1) % 3 = 2
                THEN ascii(substring(px, j, 1)) END) AS BIGINT) AS b_sum
FROM (
  SELECT doc_id,
         rpad(substring(coalesce(text, ''), 1, {_PPM_BODY_LEN}),
              {_PPM_BODY_LEN}, 'x') AS px
  FROM documents
) p, generate_series(1, {_PPM_BODY_LEN}) AS g(j)
GROUP BY doc_id
ORDER BY doc_id
"""


register("multimodal_features", multimodal_features, MULTIMODAL_FEATURES_ORACLE)
register(
    "multimodal_decode_stats",
    multimodal_decode_stats,
    MULTIMODAL_DECODE_STATS_ORACLE,
)
register(
    "multimodal_frame_sample",
    multimodal_frame_sample,
    MULTIMODAL_FRAME_SAMPLE_ORACLE,
)
