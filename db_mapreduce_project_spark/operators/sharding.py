"""Training-data EXPORT operators — the final assembly steps a
pipeline runs after filtering/dedup, when the curated corpus is
materialized for a trainer:

- `training_shard_assignment`: deterministic token-budget sharding.
  Documents take a content-independent global order (portable hash
  of doc_id, doc_id tiebreak), a distributed prefix sum yields each
  document's token start offset, and shard_id = offset DIV budget —
  every output shard holds ~SHARD_TOKEN_BUDGET tokens of
  contiguous-in-order documents, the layout trainers want for
  balanced data-parallel reads (cf. the shard-building step of any
  WebDataset/TFRecord export).
- `sequence_packing_stats`: fixed-length sequence packing audit.
  With documents concatenated in the same canonical order into
  SEQ_LEN-token training sequences, report per language how many
  documents straddle a sequence boundary (attention-fragmentation
  pressure) and the worst-case span — the numbers that decide
  between greedy packing and document-boundary-respecting packing.

Reference parity: the reference engine (SURVEY.md §2.1 #11, text
sink with deterministic ordering) only ever exports word counts;
these operators are the north-star extension of that "ordered,
partitioned export" idea to LLM corpus assembly (SURVEY.md §2.2,
LLM-pipeline ops).

Scale shape (100 TB): a naive global running sum is
`Window.orderBy(...)` with no partition — ONE task holds the whole
corpus.  Instead both operators use a two-phase distributed prefix
sum: the hash's value range is cut into N_PREFIX_BUCKETS
deterministic buckets, within-bucket running sums parallelize
across buckets (window partitioned by bucket), and the only global
structure is the N_PREFIX_BUCKETS-row bucket-total table whose own
prefix sum is a broadcast-joined micro-window.  Token counting is a
pure codegen'd map; nothing shuffles as text — only (bucket, hash,
doc_id, tok) rows move, and the final output is shard- or
lang-cardinality.  Both outputs are exact integer arithmetic, so
the whole pipeline (hash order, prefix offsets, shard/sequence
boundaries) is value-hash verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import FP_MOD, duck_charhash, spark_charhash
from ..functions.text import token_count_ws
from ..io import load_table
from ..registry import register

N_PREFIX_BUCKETS = 64
_BUCKET_WIDTH = (FP_MOD + N_PREFIX_BUCKETS - 1) // N_PREFIX_BUCKETS
SHARD_TOKEN_BUDGET = 4096  # tokens per export shard
SEQ_LEN = 256  # packed training-sequence length (tokens)
_ORDER_SALT = ":shard"  # canonical export-order hash salt


def doc_token_offsets_from(d: DataFrame) -> DataFrame:
    """(doc_id, lang, tok, start): each document's whitespace token
    count and its exclusive prefix-sum start offset in the canonical
    export order (charhash(doc_id+salt), doc_id).

    Two-phase distributed prefix sum: within-bucket running totals
    parallelize (window PARTITIONED by the deterministic hash-range
    bucket); cross-bucket offsets come from the tiny bucket-total
    rollup (N_PREFIX_BUCKETS rows — its unpartitioned window is a
    micro-table, not the corpus) broadcast back onto the stream.
    The window branch and the totals branch each scan the (pruned)
    documents columns once — two map-only tokenize passes, the same
    trade doc_lm_quality_score makes: re-scanning beats caching a
    corpus-wide frame or paying the window shuffle twice (totals
    derived from the windowed frame would recompute the window,
    which costs a shuffle; the scan costs none)."""
    h = spark_charhash(
        F.concat(F.col("doc_id").cast("string"), F.lit(_ORDER_SALT))
    )
    t = d.select(
        "doc_id",
        "lang",
        token_count_ws("text").cast("bigint").alias("tok"),
        h.alias("h"),
    ).withColumn("bucket", F.floor(F.col("h") / F.lit(_BUCKET_WIDTH)))
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = t.withColumn("cum_in", F.sum("tok").over(w_in))
    totals = t.groupBy("bucket").agg(F.sum("tok").alias("btot"))
    w_b = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "boff", F.sum("btot").over(w_b) - F.col("btot")
    ).select("bucket", "boff")
    return (
        within.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "lang",
            "tok",
            (F.col("boff") + F.col("cum_in") - F.col("tok")).alias("start"),
        )
    )


def _doc_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_token_offsets_from(load_table(spark, sf_dir, "documents"))


def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget export sharding: shard_id = start DIV budget in
    the canonical hash order; output one row per shard with its
    document count and token payload.  Shards are ~budget tokens
    each (a document never splits, so a shard can run over by at
    most one document's tokens — the standard greedy contract)."""
    docs = _doc_token_offsets(spark, sf_dir)
    return (
        docs.withColumn(
            "shard_id",
            F.expr(f"CAST((start DIV {SHARD_TOKEN_BUDGET}) AS BIGINT)"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("sum_tokens"),
        )
        .orderBy("shard_id")
    )


_DOC_TOKEN_OFFSETS_CTE = f"""
t AS (
  SELECT doc_id, lang,
         {duck_charhash(f"(CAST(doc_id AS VARCHAR) || '{_ORDER_SALT}')")} AS h,
         CAST(CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END
              AS BIGINT) AS tok
  FROM documents
),
c AS (
  SELECT doc_id, lang, tok,
         CAST(sum(tok) OVER (ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok
              AS BIGINT) AS start
  FROM t
)"""

TRAINING_SHARD_ASSIGNMENT_ORACLE = f"""
WITH {_DOC_TOKEN_OFFSETS_CTE}
SELECT CAST(start // {SHARD_TOKEN_BUDGET} AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS sum_tokens
FROM c
GROUP BY 1
ORDER BY shard_id
"""


def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary audit for fixed-length sequence packing: with the
    corpus concatenated in canonical order into SEQ_LEN-token
    sequences, a document occupying token offsets
    [start, start+tok) spans sequences start DIV L .. (start+tok-1)
    DIV L.  Per language: how many documents cross a boundary, the
    worst span, and the token payload.  Empty documents are skipped
    (they occupy no tokens)."""
    docs = _doc_token_offsets(spark, sf_dir).where(F.col("tok") > 0)
    first = F.expr(f"start DIV {SEQ_LEN}")
    last = F.expr(f"(start + tok - 1) DIV {SEQ_LEN}")
    spans = docs.withColumn("n_spans", (last - first + 1).cast("bigint"))
    return (
        spans.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("sum_tokens"),
            F.sum(
                F.when(F.col("n_spans") > 1, F.lit(1)).otherwise(F.lit(0))
            ).cast("bigint").alias("n_crossing"),
            F.max("n_spans").alias("max_spans"),
        )
        .orderBy("lang")
    )


SEQUENCE_PACKING_STATS_ORACLE = f"""
WITH {_DOC_TOKEN_OFFSETS_CTE}
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS sum_tokens,
       CAST(sum(CASE WHEN (start + tok - 1) // {SEQ_LEN}
                      > start // {SEQ_LEN} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_crossing,
       CAST(max((start + tok - 1) // {SEQ_LEN} - start // {SEQ_LEN} + 1)
            AS BIGINT) AS max_spans
FROM c
WHERE tok > 0
GROUP BY lang
ORDER BY lang
"""


register(
    "training_shard_assignment",
    training_shard_assignment,
    TRAINING_SHARD_ASSIGNMENT_ORACLE,
)
register(
    "sequence_packing_stats",
    sequence_packing_stats,
    SEQUENCE_PACKING_STATS_ORACLE,
)
