"""Kneser–Ney smoothed bigram language model, trained on one half
of the corpus and scoring the held-out half — the perplexity-based
quality filter of CCNet (Wenzek et al., LREC 2020) with the LM
trained in-job instead of imported, and every probability an exact
integer ratio so the whole path is value-hash oracle-checkable.

Why held-out + smoothed when doc_lm_quality_score (curation.py)
already scores in-corpus MLE bigrams: scoring data the model has
seen can never produce an unseen transition, so the MLE form cannot
measure the thing a production filter runs on — NEW data.  Here the
eval half genuinely contains bigrams (and contexts, and words) the
train half never saw, which is exactly where maximum likelihood
assigns zero and interpolated Kneser–Ney (Kneser & Ney, ICASSP
1995; Chen & Goodman, Computer Speech & Language 1999) redistributes
the discounted mass through the continuation distribution:

  P_KN(b|a) = max(c(a,b) - D, 0)/c(a)
              + D * N1+(a,*)/c(a) * P_cont(b)
  P_cont(b) = N1+(*,b) / N1+(*,*)

with discount D = 0.75 carried exactly as quarters (counts scale by
4, D becomes the integer 3), probabilities in ppm fixed point, and
per-bigram surprisal the integer floor(log2): length(bin(p)) - 1 —
identical in Spark and DuckDB — so the reported quantity is a real
(quantized) log-perplexity, not just a mean probability.

Scale shape (100 TB): the model is built by ONE map-side-combining
groupBy over train bigram instances; every other model quantity
(context totals, continuation fan-outs, the distinct-pair total) is
a rollup of that vocab^2-bounded table, never of the corpus.  The
eval instance stream passes through three equi-joins — the bigram
table (vocab^2, shuffle join, AQE splits hot function-word keys)
and two vocab-bounded broadcast tables — then folds per doc in one
groupBy.  Raw text is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

KN_PPM = 1_000_000  # fixed-point probability scale
KN_D4 = 3  # discount D = 0.75 carried as quarters: 4D = 3
KN_WORST_K = 5  # highest-perplexity eval docs reported per language
# log2(KN_PPM) rounds up to 20: surprisal(p) = 20 - floor(log2(p))
KN_LOG2_PPM = 20


def _bigrams(d: DataFrame) -> DataFrame:
    """(doc_id, lang, a, b) bigram instances of each document."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+", -1)
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.filter(
            F.arrays_zip(
                F.slice(toks, 1, n - 1).alias("a"),
                F.slice(toks, 2, n - 1).alias("b"),
            ),
            lambda p: (p["a"] != "") & (p["b"] != ""),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return d.select("doc_id", "lang", F.explode(pairs).alias("p")).select(
        "doc_id", "lang", F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )


def doc_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out Kneser–Ney scoring: train on even doc_ids, score
    odd doc_ids, report the KN_WORST_K highest-perplexity eval docs
    per language with their unseen-transition counts — the drop
    list a CCNet-style pipeline acts on.

    Columns: n_bigrams, n_unseen (bigrams absent from the train
    model — nonzero by construction of the split), score_ppm (mean
    KN probability), ppl_mbits (mean surprisal in millibits — the
    integer log-perplexity), rk.
    """
    d = load_table(spark, sf_dir, "documents")
    train_bg = _bigrams(d.where(F.col("doc_id") % 2 == 0))
    eval_bg = _bigrams(d.where(F.col("doc_id") % 2 == 1))

    # the model: one corpus-wide aggregation; everything else rolls
    # up from this vocab^2-bounded table
    bg = train_bg.groupBy("lang", "a", "b").agg(F.count("*").alias("cnt_ab"))
    ctx = bg.groupBy("lang", "a").agg(
        F.sum("cnt_ab").alias("cnt_a"),
        F.count("*").alias("n1p_a"),  # N1+(a,*): distinct b after a
    )
    tot = bg.groupBy("lang").agg(F.count("*").alias("n1p_tot"))
    cont = (
        bg.groupBy("lang", "b")
        .agg(F.count("*").alias("n1p_b"))  # N1+(*,b): distinct a before b
        .join(tot, "lang")
        .select(
            "lang",
            "b",
            F.expr(f"(n1p_b * {KN_PPM}) DIV n1p_tot").alias("pcont_ppm"),
        )
    )

    # KN probability per eval instance.  Seen context:
    #   p = (max(4c_ab - 3, 0)*PPM + 3*N1p_a*pcont) DIV (4c_a)
    # (both KN terms over the common denominator 4c_a, quantized
    # once).  Unseen context: p = pcont(b).  Unseen word: floor 1.
    scored_inst = (
        eval_bg.join(bg, ["lang", "a", "b"], "left")
        .join(F.broadcast(ctx), ["lang", "a"], "left")
        .join(F.broadcast(cont), ["lang", "b"], "left")
        .select(
            "doc_id",
            "lang",
            F.expr(
                f"""greatest(CASE
                  WHEN cnt_a IS NOT NULL THEN
                    (greatest(4 * coalesce(cnt_ab, 0) - {KN_D4}, 0) * {KN_PPM}
                     + {KN_D4} * n1p_a * coalesce(pcont_ppm, 0))
                    DIV (4 * cnt_a)
                  ELSE coalesce(pcont_ppm, 0)
                END, 1)"""
            ).alias("p_ppm"),
            F.when(F.col("cnt_ab").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("unseen"),
        )
    )
    per_doc = (
        scored_inst.withColumn(
            "bits", F.lit(KN_LOG2_PPM) - (F.length(F.bin("p_ppm")) - 1)
        )
        .groupBy("lang", "doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("unseen").cast("bigint").alias("n_unseen"),
            F.expr("CAST(sum(p_ppm) DIV count(*) AS BIGINT)").alias(
                "score_ppm"
            ),
            F.expr("CAST((sum(bits) * 1000) DIV count(*) AS BIGINT)").alias(
                "ppl_mbits"
            ),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("ppl_mbits").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= KN_WORST_K)
        .select(
            "lang",
            "doc_id",
            "n_bigrams",
            "n_unseen",
            "score_ppm",
            "ppl_mbits",
            "rk",
        )
        .orderBy("lang", "rk")
    )


_WS = r"\s+"

DOC_KN_PERPLEXITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '{_WS}') AS w
  FROM documents
),
bigrams AS (
  SELECT doc_id, lang, p.a AS a, p.b AS b FROM (
    SELECT doc_id, lang,
           unnest(list_filter(
             list_transform(generate_series(1, len(w) - 1),
                            i -> struct_pack(a := w[i], b := w[i+1])),
             p -> p.a <> '' AND p.b <> '')) AS p
    FROM toks
  )
),
bg AS (
  SELECT lang, a, b, CAST(count(*) AS BIGINT) AS cnt_ab
  FROM bigrams WHERE doc_id % 2 = 0 GROUP BY lang, a, b
),
ctx AS (
  SELECT lang, a, CAST(sum(cnt_ab) AS BIGINT) AS cnt_a,
         CAST(count(*) AS BIGINT) AS n1p_a
  FROM bg GROUP BY lang, a
),
tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n1p_tot FROM bg GROUP BY lang
),
cont AS (
  SELECT g.lang, g.b,
         (CAST(count(*) AS BIGINT) * {KN_PPM}) // t.n1p_tot AS pcont_ppm
  FROM bg g JOIN tot t ON g.lang = t.lang
  GROUP BY g.lang, g.b, t.n1p_tot
),
inst AS (
  SELECT e.doc_id, e.lang,
         greatest(CASE
           WHEN c.cnt_a IS NOT NULL THEN
             (greatest(4 * coalesce(g.cnt_ab, 0) - {KN_D4}, 0) * {KN_PPM}
              + {KN_D4} * c.n1p_a * coalesce(n.pcont_ppm, 0))
             // (4 * c.cnt_a)
           ELSE coalesce(n.pcont_ppm, 0)
         END, 1) AS p_ppm,
         CASE WHEN g.cnt_ab IS NULL THEN 1 ELSE 0 END AS unseen
  FROM (SELECT * FROM bigrams WHERE doc_id % 2 = 1) e
  LEFT JOIN bg g ON e.lang = g.lang AND e.a = g.a AND e.b = g.b
  LEFT JOIN ctx c ON e.lang = c.lang AND e.a = c.a
  LEFT JOIN cont n ON e.lang = n.lang AND e.b = n.b
),
per_doc AS (
  SELECT lang, doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(unseen) AS BIGINT) AS n_unseen,
         CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm,
         CAST((sum({KN_LOG2_PPM} - (length(bin(p_ppm)) - 1)) * 1000)
              // count(*) AS BIGINT) AS ppl_mbits
  FROM inst GROUP BY lang, doc_id
)
SELECT lang, doc_id, n_bigrams, n_unseen, score_ppm, ppl_mbits, rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY lang
            ORDER BY ppl_mbits DESC, doc_id ASC) AS INTEGER) AS rk
  FROM per_doc
) t
WHERE rk <= {KN_WORST_K}
ORDER BY lang, rk
"""

register("doc_kn_perplexity", doc_kn_perplexity, DOC_KN_PERPLEXITY_ORACLE)
