"""Training-data pipeline ASSEMBLY operators — the steps that turn
a filtered corpus into model-ready batches:

- `pack_sequences`: greedy sequential token packing into
  fixed-budget context windows (the packing pass before writing
  training shards);
- `quality_quantile_filter`: distribution-relative document
  filtering (drop per-language length outliers outside p5..p95);
- `text_bigram_counts`: n-gram language-model counts with
  per-language top-k.

Scale notes:
- packing is a PARTITIONED window cumsum (per lang shard), never a
  global single-partition sort — each shard packs independently,
  which is also how packing parallelizes on a real corpus;
- quantile thresholds are a tiny per-group aggregate broadcast back
  to the fact scan (two passes over data, zero wide shuffles of the
  corpus);
- bigram counting shuffles (lang, bigram) keys with map-side
  partial aggregation; the final top-k window runs over the
  *counts* relation (vocabulary-sized, not corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duck_charhash, spark_charhash
from ..functions.text import token_count_ws
from ..io import load_table
from ..registry import register

PACK_BUDGET = 512  # tokens per packed context window
TOP_NGRAMS = 5


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing: within each lang shard, docs in
    doc_id order accumulate into bins of PACK_BUDGET tokens (a doc
    that crosses the boundary opens the next bin — standard
    overflow-tolerant packing).  bin = floor((cumsum - n_tok) /
    budget) over a partitioned running sum: one shuffle on lang,
    no global ordering."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "lang", token_count_ws("text").alias("n_tok"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = base.withColumn("cum", F.sum("n_tok").over(w)).withColumn(
        "bin",
        F.floor(
            (F.col("cum") - F.col("n_tok")).cast("double") / float(PACK_BUDGET)
        ),
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
        )
        .orderBy("lang", "bin")
    )


PACK_SEQUENCES_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok
  FROM documents
),
binned AS (
  SELECT lang, n_tok,
         sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM base
)
SELECT lang,
       CAST(floor(CAST(cum - n_tok AS DOUBLE) / {float(PACK_BUDGET)}) AS BIGINT)
           AS bin,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS bin_tokens
FROM binned
GROUP BY 1, 2
ORDER BY lang, bin
"""


def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-relative quality filter: keep documents whose
    length falls within the per-language p5..p95 band (absolute
    thresholds go stale as the corpus mix drifts; quantile bands
    do not).  The per-lang quantiles are a tiny aggregate joined
    back by broadcast — the corpus is scanned, never shuffled."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.percentile("n_chars", 0.05).alias("p5"),
        F.percentile("n_chars", 0.95).alias("p95"),
    )
    return (
        d.join(F.broadcast(stats), "lang")
        .where((F.col("n_chars") >= F.col("p5")) & (F.col("n_chars") <= F.col("p95")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


QUALITY_QUANTILE_FILTER_ORACLE = """
WITH stats AS (
  SELECT lang,
         quantile_cont(n_chars, 0.05) AS p5,
         quantile_cont(n_chars, 0.95) AS p95
  FROM documents
  GROUP BY lang
)
SELECT d.lang,
       count(*) AS n_kept,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents d JOIN stats s ON d.lang = s.lang
WHERE n_chars >= p5 AND n_chars <= p95
GROUP BY d.lang
ORDER BY d.lang
"""


def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-5 word bigrams by occurrence count (ALL
    occurrences, not per-doc distinct — these are LM counts, not
    dedup shingles).  Count tiebreak is lexicographic so the top-k
    is deterministic."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+", -1)
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)))
    counts = (
        d.select("lang", F.explode(grams).alias("bigram"))
        .where(F.col("bigram") != "")
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("bigram").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_NGRAMS)
        .orderBy("lang", "rk")
    )


TEXT_BIGRAM_COUNTS_ORACLE = f"""
WITH toks AS (
  SELECT lang, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents
),
grams AS (
  SELECT lang,
         unnest(list_transform(generate_series(1, len(w) - 1),
                i -> concat_ws(' ', w[i], w[i+1]))) AS bigram
  FROM toks
),
counts AS (
  SELECT lang, bigram, count(*) AS cnt
  FROM grams
  WHERE bigram <> ''
  GROUP BY 1, 2
)
SELECT lang, bigram, cnt, rk FROM (
  SELECT lang, bigram, cnt,
         CAST(row_number() OVER (PARTITION BY lang
              ORDER BY cnt DESC, bigram ASC) AS INTEGER) AS rk
  FROM counts
) t
WHERE rk <= {TOP_NGRAMS}
ORDER BY lang, rk
"""


register("pack_sequences", pack_sequences, PACK_SEQUENCES_ORACLE)
register(
    "quality_quantile_filter",
    quality_quantile_filter,
    QUALITY_QUANTILE_FILTER_ORACLE,
)
register("text_bigram_counts", text_bigram_counts, TEXT_BIGRAM_COUNTS_ORACLE)


CHUNK_LEN = 200
CHUNK_STRIDE = 150  # 50-char overlap between neighboring chunks


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (RAG / embedding prep):
    each document splits into CHUNK_LEN-char chunks every
    CHUNK_STRIDE chars (50-char overlap so no boundary-straddling
    passage is lost).  Output is the chunk MANIFEST — (doc_id,
    chunk_id, start, chunk_chars, chunk_fp) with the portable
    fingerprint standing in for the chunk text — so the shuffled/
    compared rows stay fixed-width; the embedding stage would read
    the text by (doc_id, start, len) locality.  Pure map + bounded
    explode (fan-out = n_chars/stride), embarrassingly parallel."""
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    chunks = d.select(
        "doc_id", "text", F.posexplode(starts).alias("chunk_id", "start")
    ).select(
        "doc_id",
        "chunk_id",
        "start",
        F.expr(f"substring(text, start + 1, {CHUNK_LEN})").alias("chunk"),
    )
    return (
        chunks.select(
            "doc_id",
            "chunk_id",
            "start",
            F.length("chunk").alias("chunk_chars"),
            spark_charhash(F.col("chunk")).alias("chunk_fp"),
        )
        .where(F.col("chunk_chars") > 0)
        .orderBy("doc_id", "chunk_id")
    )


_CHUNK_HASH = duck_charhash(f"substr(text, start + 1, {CHUNK_LEN})")
CHUNK_DOCUMENTS_ORACLE = f"""
WITH starts AS (
  SELECT doc_id, text,
         unnest(generate_series(0, greatest(length(text) - 1, 0), {CHUNK_STRIDE})) AS start,
         generate_subscripts(generate_series(0, greatest(length(text) - 1, 0), {CHUNK_STRIDE}), 1) - 1 AS chunk_id
  FROM documents
)
SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
       CAST(start AS INTEGER) AS start,
       CAST(length(substr(text, start + 1, {CHUNK_LEN})) AS INTEGER)
         AS chunk_chars,
       {_CHUNK_HASH} AS chunk_fp
FROM starts
WHERE length(substr(text, start + 1, {CHUNK_LEN})) > 0
ORDER BY doc_id, chunk_id
"""

register("chunk_documents", chunk_documents, CHUNK_DOCUMENTS_ORACLE)
