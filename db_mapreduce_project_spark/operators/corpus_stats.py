"""Corpus-level statistics operators — the audit queries a data
team runs BEFORE committing a 100 TB training mix:

- `corpus_source_overlap`: pairwise source-vs-source word-shingle
  Jaccard — the contamination/duplication matrix that decides
  whether two crawl snapshots (or a vendor dataset vs CommonCrawl)
  are worth keeping both of.
- `tokenizer_vocab_coverage`: per-document out-of-vocabulary rate
  against a frequency-built vocabulary — the "how much of this
  corpus does my tokenizer actually cover" audit run before
  committing a vocab size.
- `doc_char_entropy`: per-document character-distribution Shannon
  entropy — the cheapest gibberish/boilerplate detector (natural
  text sits in a narrow entropy band; keyboard mash and repeated
  padding fall far outside it; cf. the entropy filters in
  CCNet/Gopher-style quality pipelines).

Reference parity: the reference engine's only corpus statistic is
the global word count (SURVEY.md §2.1 #8, #13); these operators are
the LLM-pipeline extension of that counting machinery to corpus
health metrics (SURVEY.md §2.2, LLM-pipeline ops).

Scale shape (100 TB):
- source overlap never joins documents to documents: it first
  collapses the corpus to DISTINCT (source, shingle) — bounded by
  |vocabulary| x |sources|, orders of magnitude below corpus size —
  then self-joins on the shingle key.  Per-shingle fan-out is at
  most |sources|^2 pairs (sources number in the dozens, not
  millions), so there is no quadratic blow-up in corpus size.  At
  petabyte scale the same matrix drops in via the MinHash band
  index (dedup.py) with this exact form as its oracle.
- vocab coverage broadcasts the top-K vocabulary (K rows) onto the
  token stream — a map-side hash join; only (doc_id, counts) rows
  shuffle for the per-doc rollup.
- entropy keys every shuffle on doc_id; the per-(doc, char) term
  `c*log2(c)` is quantized to an exact bigint BEFORE the per-doc
  sum (functions/stable.py discipline), so partial aggregation
  order cannot perturb the result and the value-hash oracle holds
  at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import word_shingles
from ..io import load_table
from ..registry import register

OVERLAP_NGRAM = 2  # word-bigram shingles for the source matrix
VOCAB_K = 16  # vocabulary size for the coverage audit
ENTROPY_SCALE = 1_000_000  # per-term quantization (stable.py style)


def source_overlap_from(d: DataFrame) -> DataFrame:
    """Pairwise Jaccard similarity of the distinct word-bigram sets
    of every source pair (source_a < source_b lexicographically) of
    a (source, text) relation.

    |A ∩ B| comes from the shingle-keyed self-join of the distinct
    (source, shingle) relation; |A ∪ B| = |A| + |B| - |A ∩ B| from
    a broadcast of the per-source set sizes.  jaccard is one exact
    integer division — bit-reproducible cross-engine.
    """
    sh = word_shingles(
        d.select(F.col("source").alias("src"), "text"),
        "src",
        "text",
        OVERLAP_NGRAM,
    ).localCheckpoint(eager=False)
    # distinct (src, shingle) is |vocab| x |sources| — tiny — but it
    # feeds THREE consumers (both self-join sides and the sizes
    # table, the latter joined twice); without the checkpoint the
    # corpus explode+distinct re-runs four times (measured 3.7 s ->
    # ~1 s at sf0.1).  LAZY: materializes at the first action, so
    # merely constructing the DataFrame (plan sweeps, explain) does
    # not run a Spark job.
    sizes = sh.groupBy("src").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("src").alias("source_a"), "shingle")
    b = sh.select(F.col("src").alias("source_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnsRenamed({"src": "source_a", "n_sh": "na"})),
            "source_a",
        )
        .join(
            F.broadcast(sizes.withColumnsRenamed({"src": "source_b", "n_sh": "nb"})),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
            (
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`source_overlap_from` over the
    documents fixture."""
    return source_overlap_from(load_table(spark, sf_dir, "documents"))


_OVERLAP_GRAMS = (
    "list_transform(generate_series(1, len(w) - "
    f"{OVERLAP_NGRAM - 1}), i -> concat_ws(' '"
    + "".join(f", w[i+{k}]" for k in range(OVERLAP_NGRAM)).replace(
        "w[i+0]", "w[i]"
    )
    + "))"
)

CORPUS_SOURCE_OVERLAP_ORACLE = f"""
WITH toks AS (
  SELECT source AS src, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT src, shingle
  FROM (SELECT src, unnest({_OVERLAP_GRAMS}) AS shingle FROM toks)
  WHERE shingle <> ''
),
sizes AS (SELECT src, count(*) AS n_sh FROM sh GROUP BY src),
inter AS (
  SELECT a.src AS source_a, b.src AS source_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.src < b.src
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, i.n_inter,
       sa.n_sh + sb.n_sh - i.n_inter AS n_union,
       CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.src = i.source_a
JOIN sizes sb ON sb.src = i.source_b
ORDER BY i.source_a, i.source_b
"""

register("corpus_source_overlap", corpus_source_overlap, CORPUS_SOURCE_OVERLAP_ORACLE)


def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate against the top-VOCAB_K corpus words.

    The vocabulary is frequency-built with a (count DESC, word ASC)
    tiebreak so both engines pick the identical K words; it is K
    rows, so it rides a broadcast hash join onto the token stream.
    oov_rate is one exact int/int divide.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+", -1)).alias("word"),
    ).where(F.col("word") != "")
    # top-K via TakeOrderedAndProject — an unpartitioned row_number
    # window here would single-task-sort the whole distinct-word
    # relation (the corpus VOCABULARY, unbounded), the exact shape
    # text_bm25_topk's plan test forbids for its own top-k
    vocab = (
        tok.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(VOCAB_K)
        .select("word")
    )
    return (
        tok.join(F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tok",
            "n_oov",
            (F.col("n_oov") / F.col("n_tok")).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


TOKENIZER_VOCAB_COVERAGE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
  FROM documents
),
tok_nz AS (SELECT doc_id, word FROM tok WHERE word <> ''),
vocab AS (
  SELECT word FROM (
    SELECT word, row_number() OVER (ORDER BY count(*) DESC, word ASC) AS vrk
    FROM tok_nz GROUP BY word
  ) WHERE vrk <= {VOCAB_K}
)
SELECT t.doc_id, count(*) AS n_tok,
       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS oov_rate
FROM tok_nz t LEFT JOIN vocab v ON t.word = v.word
GROUP BY t.doc_id
ORDER BY t.doc_id
"""

register(
    "tokenizer_vocab_coverage",
    tokenizer_vocab_coverage,
    TOKENIZER_VOCAB_COVERAGE_ORACLE,
)


def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits/char) of each document's a-z character
    distribution: H = log2(n) - (Σ c·log2(c)) / n.

    The per-character term c·log2(c) is quantized to an exact
    bigint at 1e-6 BEFORE the per-doc sum (stable.py discipline:
    integer sums are order-independent, so partial aggregation and
    shuffle order cannot perturb the hash).  The residual libm-ulp
    exposure is one log2 call per distinct count value — the same
    exposure text_tfidf_top_terms carries, absorbed by the
    quantization.  The entropy itself is reported quantized at the
    same resolution.
    """
    d = load_table(spark, sf_dir, "documents")
    letters = F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")
    ch = d.select(
        "doc_id", F.explode(F.split(letters, "", -1)).alias("ch")
    ).where(F.col("ch") != "")
    per_char = ch.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    scale = F.lit(float(ENTROPY_SCALE))
    term_q = F.floor(F.col("c") * F.log2("c") * scale + F.lit(0.5))
    return (
        per_char.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_letters"),
            F.sum(term_q).alias("sq"),
        )
        .select(
            "doc_id",
            "n_letters",
            (
                F.floor(
                    (
                        F.log2("n_letters")
                        - (F.col("sq") / scale) / F.col("n_letters")
                    )
                    * scale
                    + F.lit(0.5)
                )
                / scale
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


DOC_CHAR_ENTROPY_ORACLE = f"""
WITH ch AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(text), '[^a-z]', '', 'g'),
                             '')) AS ch
  FROM documents
),
per_char AS (
  SELECT doc_id, ch, count(*) AS c FROM ch WHERE ch <> '' GROUP BY doc_id, ch
),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_letters,
         CAST(sum(CAST(floor(c * log2(c) * {ENTROPY_SCALE}.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sq
  FROM per_char GROUP BY doc_id
)
SELECT doc_id, n_letters,
       floor((log2(n_letters) - (sq / {ENTROPY_SCALE}.0) / n_letters)
             * {ENTROPY_SCALE}.0 + 0.5) / {ENTROPY_SCALE}.0 AS entropy
FROM agg
ORDER BY doc_id
"""

register("doc_char_entropy", doc_char_entropy, DOC_CHAR_ENTROPY_ORACLE)
