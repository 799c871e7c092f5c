"""Unigram-LM (SentencePiece) subword segmentation — the third of
the big-three subword algorithms (Kudo, "Subword Regularization",
ACL 2018), completing the family next to BPE (tokenizer.py,
Sennrich ACL 2016) and WordPiece (Schuster & Nakajima 2012).

Where BPE/WordPiece GROW a vocabulary by merging, unigram-LM
starts from a LARGE candidate piece inventory with a probability
per piece and segments each word by Viterbi: the segmentation
maximizing sum(log p(piece)).  Training proper alternates
E (Viterbi/forward-backward) and M (re-estimate probabilities)
and prunes; here the inventory and probabilities are the
deterministic frequency estimate (all substrings up to UNI_MAXP
chars; counts weighted by word frequency; top UNI_MULTI multi-char
pieces + every single char for closure), which keeps the whole
path — inventory, probabilities, DP, backtrace — value-hash
oracle-checkable cross-engine while exercising the exact Viterbi
machinery a unigram tokenizer ships.

Determinism contract: log-probabilities quantize to bigints
(floor(ln(cnt/total) * UNI_SCALE)) so DP scores are exact integer
sums; the Viterbi tie-break is (score max, then smallest start j =
longest last piece, via strict-> over edges sorted (i, j)); the
only float boundary is the single ln() per piece — the same
documented last-ulp libm exposure BM25's idf carries.

Scale shape (100 TB): the ONLY corpus-sized pass is the word
count.  The piece inventory is built from the VOCAB table (one row
per distinct word, the HuggingFace-trainer shape shared with BPE),
the kept inventory is tiny and BROADCAST into the edge join, and
the Viterbi DP is a per-row Catalyst fold over word positions —
map-side, no shuffle, no UDF, no collect.  Segmenting the full
corpus reuses the same vocab-sized plan: per-word segmentations
rejoin the corpus only as (word, piece) rows.

Spark-first notes: the DP is F.aggregate over sequence(1, len)
carrying an array<struct<score,bp>> accumulator — best[i] =
max over in-vocab pieces ending at i of best[j] + li(piece); the
backtrace is a second bounded fold.  Both folds materialize
through an explode(array(...)) Generate barrier before their
fields are projected, so CollapseProject cannot duplicate the DP
expression per output column (the doc_ngram_repetition lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import words
from ..io import load_table
from ..registry import register

UNI_MAXP = 4  # max piece length considered (chars)
UNI_MULTI = 40  # multi-char pieces kept (plus all single chars)
UNI_SCALE = 1_000_000_000  # log-prob quantization
UNI_TOPK = 25  # words / pieces emitted by the registered queries
_NEG = -(1 << 62)  # DP "minus infinity" (never reachable: closure)


def unigram_vocab(d: DataFrame) -> DataFrame:
    """(word, freq): the shared corpus word count (same
    normalization as the BPE/WordPiece trainers)."""
    return words(d, "text").groupBy("word").agg(F.count("*").alias("freq"))


def unigram_pieces(vocab: DataFrame) -> DataFrame:
    """(piece, cnt, li): the deterministic piece inventory — every
    single char (closure: any word stays segmentable) plus the top
    UNI_MULTI multi-char substrings by weighted occurrence count;
    li = floor(ln(cnt/total) * UNI_SCALE) as bigint."""
    ij = vocab.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
    )
    occ = ij.select(
        "word",
        "freq",
        "i",
        F.explode(
            F.sequence(F.lit(1), F.least(F.lit(UNI_MAXP), F.col("i")))
        ).alias("len"),
    ).select(
        "freq",
        F.col("word")
        .substr(F.col("i") - F.col("len") + 1, F.col("len"))
        .alias("piece"),
    )
    counts = occ.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    singles = counts.where(F.length("piece") == 1)
    multis = (
        counts.where(F.length("piece") >= 2)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(UNI_MULTI)
    )
    kept = singles.unionByName(multis)
    total = kept.agg(F.sum("cnt").alias("total"))
    return kept.crossJoin(F.broadcast(total)).select(
        "piece",
        "cnt",
        F.floor(
            F.log(
                F.col("cnt").cast("double") / F.col("total").cast("double")
            )
            * F.lit(float(UNI_SCALE))
        )
        .cast("long")
        .alias("li"),
    )


def unigram_edges(w: DataFrame, pieces: DataFrame) -> DataFrame:
    """(word, freq, i, j, li): the per-word DP edge set — piece
    `word[j+1..i]` is in the inventory.  The inventory rides a
    broadcast join; edge volume per word is <= len * UNI_MAXP."""
    ij = w.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
    )
    cand = ij.select(
        "word",
        "freq",
        "i",
        F.explode(
            F.sequence(F.lit(1), F.least(F.lit(UNI_MAXP), F.col("i")))
        ).alias("len"),
    ).select(
        "word",
        "freq",
        "i",
        (F.col("i") - F.col("len")).alias("j"),
        F.col("word").substr(F.col("j") + 1, F.col("len")).alias("piece"),
    )
    return cand.join(F.broadcast(pieces.select("piece", "li")), "piece").select(
        "word", "freq", "i", "j", "li"
    )


def unigram_viterbi(edged: DataFrame) -> DataFrame:
    """(word, freq, score, n_pieces, seg): exact Viterbi over the
    edge set.  best[0] = 0; best[i] = max over edges (j -> i) of
    best[j] + li, tie-broken to the SMALLEST j (longest last
    piece) by iterating edges sorted (i, j) under strict ->.  The
    backtrace walks backpointers in a second bounded fold."""
    g = edged.groupBy("word", "freq").agg(
        F.array_sort(F.collect_list(F.struct("i", "j", "li"))).alias("edges")
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("score"), F.lit(-1).alias("bp")
    )
    ninf = F.struct(
        F.lit(_NEG).cast("long").alias("score"), F.lit(-1).alias("bp")
    )

    def step(acc, i):
        best_i = F.aggregate(
            F.filter(F.col("edges"), lambda e: e["i"] == i),
            ninf,
            lambda b, e: F.when(
                F.element_at(acc, e["j"] + 1)["score"] + e["li"]
                > b["score"],
                F.struct(
                    (
                        F.element_at(acc, e["j"] + 1)["score"] + e["li"]
                    ).alias("score"),
                    e["j"].alias("bp"),
                ),
            ).otherwise(b),
        )
        return F.concat(acc, F.array(best_i))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length("word")), F.array(zero), step
    )
    # Generate barrier: materialize the DP array ONCE before its
    # fields fan out into score/backtrace projections
    staged = g.select("word", "freq", F.explode(F.array(dp)).alias("dp"))
    score = F.element_at(F.col("dp"), F.length("word") + 1)["score"]
    bps = F.transform(F.col("dp"), lambda s: s["bp"])
    staged = staged.select(
        "word", "freq", score.alias("score"), bps.alias("bps")
    )

    def back(st, _):
        j = F.element_at(F.col("bps"), st["pos"] + 1)
        return F.when(
            st["pos"] > 0,
            F.struct(
                j.alias("pos"),
                F.concat(
                    F.array(
                        F.col("word").substr(j + 1, st["pos"] - j)
                    ),
                    st["parts"],
                ).alias("parts"),
            ),
        ).otherwise(st)

    walk = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.struct(
            F.length("word").alias("pos"),
            F.array().cast("array<string>").alias("parts"),
        ),
        back,
    )
    out = staged.select(
        "word", "freq", "score", F.explode(F.array(walk)).alias("w")
    )
    return out.select(
        "word",
        "freq",
        F.size(F.col("w")["parts"]).alias("n_pieces"),
        "score",
        F.array_join(F.col("w")["parts"], "|").alias("seg"),
    )


def unigram_segment_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: train the unigram-LM inventory on the full
    corpus, then Viterbi-segment the UNI_TOPK most frequent words —
    (word, freq, n_pieces, score, seg)."""
    d = load_table(spark, sf_dir, "documents")
    vocab = unigram_vocab(d)
    pieces = unigram_pieces(vocab)
    top = vocab.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(
        UNI_TOPK
    )
    return unigram_viterbi(unigram_edges(top, pieces)).orderBy(
        F.col("freq").desc(), F.col("word").asc()
    )


def unigram_piece_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: the trained piece inventory itself — top
    UNI_TOPK pieces by (cnt desc, piece asc) with the quantized
    log-probabilities the DP consumes."""
    d = load_table(spark, sf_dir, "documents")
    return (
        unigram_pieces(unigram_vocab(d))
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(UNI_TOPK)
    )


# --- DuckDB oracles -------------------------------------------------

_VOCAB_CTE = """vocab AS (
  SELECT word, count(*) AS freq FROM (
    SELECT lower(regexp_replace(t.tok, '[^a-zA-Z]', '', 'g')) AS word
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
  ) w WHERE word <> '' GROUP BY word
)"""


def _pieces_ctes() -> str:
    """CTE chain vocab -> pieces(piece, cnt, li), shared by both
    oracles — same substring enumeration, same keep rule, same
    quantized ln.

    NO list lambdas with outer-column captures anywhere in these
    oracles: DuckDB's multithreaded evaluation of such lambdas was
    observed to misalign rows nondeterministically (a word paired
    with another word's fold state, ~1 in 6 full runs), so every
    enumeration is unnest(generate_series(...)) in a projection
    and the DP is a recursive CTE — join-shaped plans only."""
    return f"""{_VOCAB_CTE},
occ AS (
  SELECT freq, substr(word, i - L + 1, L) AS piece FROM (
    SELECT word, freq, i,
           unnest(generate_series(1, least({UNI_MAXP}, i))) AS L
    FROM (SELECT word, freq,
                 unnest(generate_series(1, len(word))) AS i
          FROM vocab) a
  ) b
),
counts AS (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
  FROM occ GROUP BY piece
),
kept AS (
  SELECT piece, cnt FROM counts WHERE len(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM counts WHERE len(piece) >= 2
    ORDER BY cnt DESC, piece ASC LIMIT {UNI_MULTI}
  ) m
),
pieces AS (
  SELECT piece, cnt,
         CAST(floor(ln(CAST(cnt AS DOUBLE)
                       / CAST(t.total AS DOUBLE))
                    * {UNI_SCALE}.0) AS BIGINT) AS li
  FROM kept, (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM kept) t
)"""


UNIGRAM_PIECE_PROBS_ORACLE = f"""
WITH {_pieces_ctes()}
SELECT piece, cnt, li FROM pieces
ORDER BY cnt DESC, piece ASC
LIMIT {UNI_TOPK}
"""


def _segment_oracle_sql() -> str:
    """Mirror of the Viterbi path, entirely join-shaped (see
    _pieces_ctes on why no lambdas): the DP is a recursive CTE
    advancing every word one position per iteration, the per-step
    argmax a LATERAL ORDER BY s DESC, j ASC LIMIT 1 over that
    word's edges (identical tie-break to the Spark fold's
    strict-> over (i, j)-sorted edges), the accumulator a
    FLATTENED BIGINT[] (position p's score at index 2p+1, its
    backpointer at 2p+2, 1-based); the backtrace is a second
    recursive CTE over backpointers + ordered string_agg."""
    return f"""
WITH RECURSIVE {_pieces_ctes()},
topw AS (
  SELECT word, freq FROM vocab
  ORDER BY freq DESC, word ASC LIMIT {UNI_TOPK}
),
edges_flat AS (
  SELECT c.word, c.freq, c.i, c.j, p.li
  FROM (
    SELECT word, freq, i, i - L AS j,
           substr(word, i - L + 1, L) AS piece
    FROM (
      SELECT word, freq, i,
             unnest(generate_series(1, least({UNI_MAXP}, i))) AS L
      FROM (SELECT word, freq,
                   unnest(generate_series(1, len(word))) AS i
            FROM topw) a
    ) b
  ) c JOIN pieces p USING (piece)
),
dpr AS (
  SELECT word, freq, 0 AS pos, CAST([0, -1] AS BIGINT[]) AS acc
  FROM topw
  UNION ALL
  SELECT r.word, r.freq, r.pos + 1, r.acc || b.be
  FROM dpr r, LATERAL (
    SELECT [v.s, v.j] AS be FROM (
      SELECT r.acc[2 * ef.j + 1] + ef.li AS s, CAST(ef.j AS BIGINT) AS j
      FROM edges_flat ef
      WHERE ef.word = r.word AND ef.i = r.pos + 1
      ORDER BY s DESC, j ASC
      LIMIT 1
    ) v
  ) b
  WHERE r.pos < len(r.word)
),
dp AS (
  SELECT word, freq, acc AS dpacc FROM dpr WHERE pos = len(word)
),
chain AS (
  SELECT word, CAST(len(word) AS INT) AS pos FROM dp
  UNION ALL
  SELECT c.word, CAST(d.dpacc[2 * c.pos + 2] AS INT) AS pos
  FROM chain c JOIN dp d USING (word)
  WHERE c.pos > 0
),
segs AS (
  SELECT c.word,
         CAST(count(*) AS INTEGER) AS n_pieces,
         string_agg(
           substr(d.word, CAST(d.dpacc[2 * c.pos + 2] AS INT) + 1,
                  c.pos - CAST(d.dpacc[2 * c.pos + 2] AS INT)),
           '|' ORDER BY c.pos ASC) AS seg
  FROM chain c JOIN dp d USING (word)
  WHERE c.pos > 0
  GROUP BY c.word
)
SELECT d.word, d.freq, s.n_pieces,
       CAST(d.dpacc[2 * len(d.word) + 1] AS BIGINT) AS score,
       s.seg
FROM dp d JOIN segs s USING (word)
ORDER BY freq DESC, word ASC
"""


UNIGRAM_SEGMENT_WORDS_ORACLE = _segment_oracle_sql()

register(
    "unigram_piece_probs", unigram_piece_probs, UNIGRAM_PIECE_PROBS_ORACLE
)
register(
    "unigram_segment_words",
    unigram_segment_words,
    UNIGRAM_SEGMENT_WORDS_ORACLE,
)
