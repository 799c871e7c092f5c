"""The pluggable map/reduce surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"
and §7 Phase 4).

The reference hard-codes its map (make_map, maprdeuce.cpp:232-255)
and reduce (maprdeuce.cpp:288-331).  Here the same contracts are
user-pluggable at three tiers, fastest first:

1. pure Catalyst expressions (functions/text.py) — the default;
2. Arrow-batched pandas UDFs (scalar + grouped-agg) — the supported
   custom-logic path (~10-100x faster than row UDFs);
3. applyInPandas / mapInPandas for grouped-map and whole-partition
   shapes.

Tests assert tier-2/3 results equal the tier-1 expression versions;
the `udf_wordcount` query runs the pandas tokenizer under the same
DuckDB oracle as the built-in flagship.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..io import load_table
from ..registry import register

_NON_LETTER = re.compile("[^a-zA-Z]")


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas(text: pd.Series) -> pd.Series:
    """Reference tokenizer contract (§1.3) as an Arrow-batched
    pandas UDF: split on single space, strip non-letters, lowercase,
    drop empties."""

    def tok(line: str) -> list[str]:
        if line is None:
            return []
        out = []
        for t in line.split(" "):
            w = _NON_LETTER.sub("", t).lower()
            if w:
                out.append(w)
        return out

    return text.map(tok)


@pandas_udf(T.DoubleType())
def mean_value_pandas(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: the reference's reduce (sum of a
    group) shape, pluggable.  Mean via quantize-then-sum (see
    functions.stable) so the result matches the SQL oracle
    bit-for-bit regardless of summation order."""
    import numpy as np

    q = np.floor(v.to_numpy() * 10000.0 + 0.5)
    return float((q.sum() / 10000.0) / len(q))


def udf_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship word count with the tokenizer swapped to the pandas
    UDF — same oracle as `wordcount` (proves the pluggable-map path
    preserves semantics)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokenize_pandas("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy("word")
    )


def grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF over events (mean value per type),
    rounded for cross-engine comparison."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(mean_value_pandas("value").alias("mean_value"))
        .orderBy("event_type")
    )


GROUPED_AGG_PANDAS_ORACLE = """
SELECT event_type, ((CAST(sum(CAST(floor((value) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0) / count(*)) AS mean_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def applyinpandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: z-score of event values within
    each event_type (the custom-grouped-transform shape)."""
    e = load_table(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf["value"].to_numpy()
        n = len(v)
        # deterministic mean: quantize-then-sum (functions.stable)
        m = (np.floor(v * 10000.0 + 0.5).sum() / 10000.0) / n
        # deterministic variance: quantized squared deviations
        dev2 = (v - m) * (v - m)
        sumq = np.floor(dev2 * 1e8 + 0.5).sum()
        if n < 2 or sumq == 0:
            z = v * 0.0
        else:
            sd = np.sqrt((sumq / 1e8) / (n - 1))
            z = (v - m) / sd
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "z": z,
            }
        )

    return (
        e.groupBy("event_type")
        .applyInPandas(zscore, schema="event_id bigint, event_type string, z double")
        .orderBy("event_id")
    )


APPLYINPANDAS_ZSCORE_ORACLE = """
WITH stats AS (
  SELECT event_type,
         ((CAST(sum(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
           / 10000.0) / count(*)) AS m,
         count(*) AS n
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, s.m, s.n,
         (e.value - s.m) * (e.value - s.m) AS d2
  FROM events e JOIN stats s USING (event_type)
),
sq AS (
  SELECT event_type,
         CAST(sum(CAST(floor(d2 * 100000000.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS sumq
  FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type,
       CASE WHEN d.n < 2 OR q.sumq = 0 THEN 0.0
            ELSE (d.value - d.m)
                 / sqrt((q.sumq / 100000000.0) / (d.n - 1)) END AS z
FROM dev d JOIN sq q USING (event_type)
ORDER BY d.event_id
"""


from ..operators.wordcount import WORDCOUNT_ORACLE  # noqa: E402

register("udf_wordcount", udf_wordcount, WORDCOUNT_ORACLE)
register("grouped_agg_pandas", grouped_agg_pandas, GROUPED_AGG_PANDAS_ORACLE)
register("applyinpandas_zscore", applyinpandas_zscore, APPLYINPANDAS_ZSCORE_ORACLE)


# ---------------------------------------------------------------
# Python UDTF (Spark 4): one input row -> n output rows, consumed
# via LATERAL join — the modern, registered form of the reference's
# UDTF-shaped make_map (maprdeuce.cpp:232-255, line -> n pairs).
# Arrow-batched like every Python boundary in this engine.
# ---------------------------------------------------------------
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sentence string, n_words int")
    class SentenceSplit:
        def eval(self, doc_id, text):  # noqa: ANN001
            for raw in (text or "").split("."):
                s = raw.strip()
                if s:
                    yield doc_id, s, len(s.split())

    spark.udtf.register("sentence_split", SentenceSplit)
    from ..io import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.doc_id, s.sentence, s.n_words
        FROM documents d, LATERAL sentence_split(d.doc_id, d.text) s
        WHERE d.doc_id <= 200
        ORDER BY s.doc_id, s.sentence
        """
    )


UDTF_SENTENCES_ORACLE = r"""
SELECT doc_id, sentence,
       CAST(len(string_split_regex(sentence, '\s+')) AS INTEGER) AS n_words
FROM (
  SELECT doc_id, trim(s) AS sentence
  FROM (
    SELECT doc_id, unnest(string_split(text, '.')) AS s
    FROM documents WHERE doc_id <= 200
  )
)
WHERE sentence <> ''
ORDER BY doc_id, sentence
"""

register("udtf_sentences", udtf_sentences, UDTF_SENTENCES_ORACLE)


def arrow_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: per-document whitespace token counts computed
    with pyarrow.compute kernels directly on the Arrow batches —
    the zero-copy sibling of mapInPandas (no pandas conversion at
    all).  Integer outputs, so the result is exactly
    oracle-checkable (no float-order concerns).  At scale this is
    the cheapest Python-side escape hatch: one C++-vectorized pass
    per Arrow batch, nothing row-at-a-time."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def count_batches(batches):
        for batch in batches:
            doc_id = batch.column(0)
            txt = pc.utf8_trim_whitespace(batch.column(1))
            toks = pc.split_pattern_regex(txt, r"\s+")
            n = pc.list_value_length(toks).cast(pa.int64())
            empty = pc.equal(pc.utf8_length(txt), 0)
            n = pc.if_else(empty, pa.scalar(0, pa.int64()), n)
            yield pa.RecordBatch.from_arrays([doc_id, n], ["doc_id", "n_tok"])

    return d.mapInArrow(count_batches, "doc_id long, n_tok long").orderBy(
        "doc_id"
    )


ARROW_TOKEN_COUNTS_ORACLE = r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
       END AS n_tok
FROM documents
ORDER BY doc_id
"""

register("arrow_token_counts", arrow_token_counts, ARROW_TOKEN_COUNTS_ORACLE)
