"""Multimodal column handling: opaque binary payloads with typed
metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the decode step is
STUBBED (decode_image raises NotImplementedError; the pipeline uses
a clearly-marked deterministic fake featurizer).  Everything
Spark-side is real and tested: binary column creation, schema,
mapInPandas batch iteration, partition-preserving plumbing.

Scale: mapInPandas streams Arrow record batches — constant memory
per task regardless of partition size; binary payloads never pass
through Python row-by-row.  The oracle reproduces the fake
featurizer arithmetic in SQL (the fixture text is ASCII, so
byte == codepoint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, first_byte int, head_sum bigint"
)

HEAD_N = 64


def decode_image(payload: bytes) -> "object":
    """Real image decode would go here (PIL/opencv).  Not available
    in this environment."""
    raise NotImplementedError(
        "image codecs unavailable in this container; use "
        "fake_features() for the deterministic test featurizer"
    )


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


register("multimodal_features", multimodal_features, MULTIMODAL_FEATURES_ORACLE)
register(
    "multimodal_frame_sample",
    multimodal_frame_sample,
    MULTIMODAL_FRAME_SAMPLE_ORACLE,
)
