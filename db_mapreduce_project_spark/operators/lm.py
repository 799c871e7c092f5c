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


def kn_worst_from(d: DataFrame) -> DataFrame:
    """The held-out KN pipeline over a (doc_id, lang, text)
    relation — builder form for the stress ladder; see
    :func:`doc_kn_perplexity`."""
    train_bg = _bigrams(d.where(F.col("doc_id") % 2 == 0))
    eval_bg = _bigrams(d.where(F.col("doc_id") % 2 == 1))

    # the model: one corpus-wide aggregation; everything else rolls
    # up from this vocab^2-bounded table.  CACHED — four consumers
    # (ctx, tot, cont, and the eval join) otherwise each replay the
    # train-half bigram explode + corpus aggregation (the compiled
    # plan showed 10 parquet scans / 0 reused exchanges); the model
    # table is exactly what a production LM filter persists.
    bg = train_bg.groupBy("lang", "a", "b").agg(
        F.count("*").alias("cnt_ab")
    ).cache()
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
    return kn_worst_from(load_table(spark, sf_dir, "documents"))


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


# ---------------------------------------------------------------
# Trigram interpolated Kneser–Ney (full recursive backoff)
# ---------------------------------------------------------------


def _trigrams(d: DataFrame) -> DataFrame:
    """(doc_id, lang, a, b, c) trigram instances per document."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+", -1)
    n = F.size(toks)
    triples = F.when(
        n >= 3,
        F.filter(
            F.arrays_zip(
                F.slice(toks, 1, n - 2).alias("a"),
                F.slice(toks, 2, n - 2).alias("b"),
                F.slice(toks, 3, n - 2).alias("c"),
            ),
            lambda p: (p["a"] != "") & (p["b"] != "") & (p["c"] != ""),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string,c:string>>"))
    return d.select("doc_id", "lang", F.explode(triples).alias("p")).select(
        "doc_id",
        "lang",
        F.col("p.a").alias("a"),
        F.col("p.b").alias("b"),
        F.col("p.c").alias("c"),
    )


def kn3_worst_from(d: DataFrame) -> DataFrame:
    """Held-out TRIGRAM interpolated Kneser–Ney — the full
    recursive backoff (Chen & Goodman 1999 eq. 18): the trigram
    level discounts raw counts and backs off to a bigram level
    built from CONTINUATION counts (how many distinct contexts a
    continuation completes — the defining KN idea, which plain
    Katz/Jelinek-Mercer backoff lacks), which in turn backs off to
    the unigram continuation distribution:

      p3(c|ab) = (max(c(abc)-D,0) + D*N1+(ab*)*p2(c|b)) / c(ab)
      p2(c|b)  = (max(N1+(*bc)-D,0) + D*N1+(b*)*pcont(c)) / N1+(*b*)
      pcont(c) = N1+(**c) / N1+(***)

    EVERY quantity rolls up from the single train trigram-count
    table — the corpus aggregates once; the four model tables are
    vocab-bounded rollups OF the model, same discipline as the
    bigram form.  Eval instances hit the three backoff branches
    (seen (a,b) context; unseen (a,b) but seen b; unseen b) and the
    same quarters/ppm fixed-point arithmetic keeps the whole path
    value-hash oracled.

    Output: the KN_WORST_K highest-perplexity held-out docs per
    language (n_trigrams, n_unseen = trigram instances absent from
    the train model, score_ppm, ppl_mbits, rk).
    """
    train = _trigrams(d.where(F.col("doc_id") % 2 == 0))
    ev = _trigrams(d.where(F.col("doc_id") % 2 == 1))

    # the ONE corpus-wide aggregation.  CACHED — five consumers
    # (ctx2, kn2_raw, tot, pcont, and the eval join) otherwise each
    # replay the train-half trigram explode + aggregation (the
    # compiled plan showed 20 parquet scans / 0 reused exchanges);
    # the vocab^3-bounded count table is the persisted LM artifact.
    tri = train.groupBy("lang", "a", "b", "c").agg(
        F.count("*").alias("cnt_abc")
    ).cache()
    # trigram-context totals: c(ab) and N1+(ab*)
    ctx2 = tri.groupBy("lang", "a", "b").agg(
        F.sum("cnt_abc").alias("cnt_ab"),
        F.count("*").alias("n1p_ab"),
    )
    # continuation-level bigram counts: N1+(*bc) = distinct a
    kn2_raw = tri.groupBy("lang", "b", "c").agg(
        F.count("*").alias("n1p_dbc")  # rows of tri are distinct a
    )
    # b-level continuation totals: N1+(*b*) and N1+(b*)
    ctx_b = kn2_raw.groupBy("lang", "b").agg(
        F.sum("n1p_dbc").alias("n1p_db_d"),
        F.count("*").alias("n1p_b_d"),
    )
    # unigram continuation: N1+(**c) over N1+(***)
    tot = tri.groupBy("lang").agg(F.count("*").alias("n1p_tot"))
    pcont = (
        tri.groupBy("lang", "c")
        .agg(F.count("*").alias("n1p_ddc"))
        .join(tot, "lang")
        .select(
            "lang",
            "c",
            F.expr(f"(n1p_ddc * {KN_PPM}) DIV n1p_tot").alias("pcont_ppm"),
        )
    )
    # pre-joined bigram-level KN table (vocab^2-bounded)
    kn2 = (
        kn2_raw.join(ctx_b, ["lang", "b"])
        .join(pcont, ["lang", "c"])
        .select(
            "lang",
            "b",
            "c",
            F.expr(
                f"""(greatest(4 * n1p_dbc - {KN_D4}, 0) * {KN_PPM}
                     + {KN_D4} * n1p_b_d * pcont_ppm)
                    DIV (4 * n1p_db_d)"""
            ).alias("p2_ppm"),
        )
    )

    inst = (
        ev.join(tri, ["lang", "a", "b", "c"], "left")
        .join(ctx2, ["lang", "a", "b"], "left")
        .join(kn2, ["lang", "b", "c"], "left")
        .join(F.broadcast(ctx_b), ["lang", "b"], "left")
        .join(F.broadcast(pcont), ["lang", "c"], "left")
        .select(
            "doc_id",
            "lang",
            # p2_eff: the bigram-level distribution with ITS own two
            # backoff branches (unseen (b,c) but seen b; unseen b)
            F.expr(
                f"""greatest(CASE
                  WHEN cnt_ab IS NOT NULL THEN
                    (greatest(4 * coalesce(cnt_abc, 0) - {KN_D4}, 0) * {KN_PPM}
                     + {KN_D4} * n1p_ab * coalesce(
                         p2_ppm,
                         CASE WHEN n1p_db_d IS NOT NULL THEN
                           ({KN_D4} * n1p_b_d * coalesce(pcont_ppm, 0))
                           DIV (4 * n1p_db_d)
                         ELSE coalesce(pcont_ppm, 0) END))
                    DIV (4 * cnt_ab)
                  ELSE coalesce(
                         p2_ppm,
                         CASE WHEN n1p_db_d IS NOT NULL THEN
                           ({KN_D4} * n1p_b_d * coalesce(pcont_ppm, 0))
                           DIV (4 * n1p_db_d)
                         ELSE coalesce(pcont_ppm, 0) END)
                END, 1)"""
            ).alias("p_ppm"),
            F.when(F.col("cnt_abc").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("unseen"),
        )
    )
    per_doc = (
        inst.withColumn(
            "bits", F.lit(KN_LOG2_PPM) - (F.length(F.bin("p_ppm")) - 1)
        )
        .groupBy("lang", "doc_id")
        .agg(
            F.count("*").alias("n_trigrams"),
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
            "n_trigrams",
            "n_unseen",
            "score_ppm",
            "ppl_mbits",
            "rk",
        )
        .orderBy("lang", "rk")
    )


def doc_kn3_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`kn3_worst_from` over documents."""
    return kn3_worst_from(load_table(spark, sf_dir, "documents"))


DOC_KN3_PERPLEXITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '{_WS}') AS w
  FROM documents
),
trigrams AS (
  SELECT doc_id, lang, p.a AS a, p.b AS b, p.c AS c FROM (
    SELECT doc_id, lang,
           unnest(list_filter(
             list_transform(generate_series(1, len(w) - 2),
               i -> struct_pack(a := w[i], b := w[i+1], c := w[i+2])),
             p -> p.a <> '' AND p.b <> '' AND p.c <> '')) AS p
    FROM toks
  )
),
tri AS (
  SELECT lang, a, b, c, CAST(count(*) AS BIGINT) AS cnt_abc
  FROM trigrams WHERE doc_id % 2 = 0 GROUP BY lang, a, b, c
),
ctx2 AS (
  SELECT lang, a, b, CAST(sum(cnt_abc) AS BIGINT) AS cnt_ab,
         CAST(count(*) AS BIGINT) AS n1p_ab
  FROM tri GROUP BY lang, a, b
),
kn2_raw AS (
  SELECT lang, b, c, CAST(count(*) AS BIGINT) AS n1p_dbc
  FROM tri GROUP BY lang, b, c
),
ctx_b AS (
  SELECT lang, b, CAST(sum(n1p_dbc) AS BIGINT) AS n1p_db_d,
         CAST(count(*) AS BIGINT) AS n1p_b_d
  FROM kn2_raw GROUP BY lang, b
),
tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n1p_tot FROM tri GROUP BY lang
),
pcont AS (
  SELECT g.lang, g.c,
         (CAST(count(*) AS BIGINT) * {KN_PPM}) // t.n1p_tot AS pcont_ppm
  FROM tri g JOIN tot t ON g.lang = t.lang
  GROUP BY g.lang, g.c, t.n1p_tot
),
kn2 AS (
  SELECT r.lang, r.b, r.c,
         (greatest(4 * r.n1p_dbc - {KN_D4}, 0) * {KN_PPM}
          + {KN_D4} * x.n1p_b_d * p.pcont_ppm)
         // (4 * x.n1p_db_d) AS p2_ppm
  FROM kn2_raw r
  JOIN ctx_b x ON r.lang = x.lang AND r.b = x.b
  JOIN pcont p ON r.lang = p.lang AND r.c = p.c
),
inst AS (
  SELECT e.doc_id, e.lang,
         greatest(CASE
           WHEN c2.cnt_ab IS NOT NULL THEN
             (greatest(4 * coalesce(g.cnt_abc, 0) - {KN_D4}, 0) * {KN_PPM}
              + {KN_D4} * c2.n1p_ab * coalesce(
                  k2.p2_ppm,
                  CASE WHEN xb.n1p_db_d IS NOT NULL THEN
                    ({KN_D4} * xb.n1p_b_d * coalesce(pc.pcont_ppm, 0))
                    // (4 * xb.n1p_db_d)
                  ELSE coalesce(pc.pcont_ppm, 0) END))
             // (4 * c2.cnt_ab)
           ELSE coalesce(
                  k2.p2_ppm,
                  CASE WHEN xb.n1p_db_d IS NOT NULL THEN
                    ({KN_D4} * xb.n1p_b_d * coalesce(pc.pcont_ppm, 0))
                    // (4 * xb.n1p_db_d)
                  ELSE coalesce(pc.pcont_ppm, 0) END)
         END, 1) AS p_ppm,
         CASE WHEN g.cnt_abc IS NULL THEN 1 ELSE 0 END AS unseen
  FROM (SELECT * FROM trigrams WHERE doc_id % 2 = 1) e
  LEFT JOIN tri g ON e.lang = g.lang AND e.a = g.a AND e.b = g.b AND e.c = g.c
  LEFT JOIN ctx2 c2 ON e.lang = c2.lang AND e.a = c2.a AND e.b = c2.b
  LEFT JOIN kn2 k2 ON e.lang = k2.lang AND e.b = k2.b AND e.c = k2.c
  LEFT JOIN ctx_b xb ON e.lang = xb.lang AND e.b = xb.b
  LEFT JOIN pcont pc ON e.lang = pc.lang AND e.c = pc.c
),
per_doc AS (
  SELECT lang, doc_id,
         CAST(count(*) AS BIGINT) AS n_trigrams,
         CAST(sum(unseen) AS BIGINT) AS n_unseen,
         CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm,
         CAST((sum({KN_LOG2_PPM} - (length(bin(p_ppm)) - 1)) * 1000)
              // count(*) AS BIGINT) AS ppl_mbits
  FROM inst GROUP BY lang, doc_id
)
SELECT lang, doc_id, n_trigrams, n_unseen, score_ppm, ppl_mbits, rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY lang
            ORDER BY ppl_mbits DESC, doc_id ASC) AS INTEGER) AS rk
  FROM per_doc
) t
WHERE rk <= {KN_WORST_K}
ORDER BY lang, rk
"""

register("doc_kn3_perplexity", doc_kn3_perplexity, DOC_KN3_PERPLEXITY_ORACLE)
