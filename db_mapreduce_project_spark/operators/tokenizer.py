"""Tokenizer TRAINING: distributed BPE merge learning over the
corpus (Sennrich, Haddow & Birch, "Neural Machine Translation of
Rare Words with Subword Units", ACL 2016) — the piece of a
training-data pipeline that LEARNS the tokenizer rather than
merely counting tokens (text_analysis.py does the counting).

Algorithm (exact, unrolled): aggregate the corpus once to a
(word, freq) vocabulary; represent each word as a spaced symbol
string; then for each of BPE_MERGES rounds, count adjacent symbol
pairs weighted by word frequency, pick the argmax pair
(deterministic tie-break: count desc, pair asc), and merge it in
every word — leftmost-non-overlapping, the canonical BPE rule.

Portable merge application — the part that usually needs a
procedural loop — is ONE string replace per round thanks to the
symbol encoding ``" a; b; c;"``:
- ``;`` terminates every symbol, so the pattern ``" a; b;"``
  cannot match inside a longer symbol (`` ba;`` fails the leading
  boundary, `` ab;`` fails the terminator);
- the pattern consumes no TRAILING separator, so runs merge
  leftmost exactly like BPE: ``" a; a; a; a; a;"`` with pattern
  ``" a; a;"`` -> ``" aa; aa; a;"`` ([a]x5 -> [aa, aa, a]) —
  verified identical in Spark and DuckDB, and against a from-
  scratch Python BPE in tests.

Scale shape (100 TB): the ONLY corpus-sized pass is the initial
word count (map-side combining groupBy).  Everything after —
symbolization, pair counting, the argmax, the merge rewrite — is
VOCAB-sized (the working set of BPE trainers like HuggingFace
tokenizers, which aggregate word counts first for the same
reason).  Each round's argmax is a 1-row broadcast.  BPE_MERGES
is 4 here so the DuckDB oracle can unroll the identical rounds
(the kmeans/pagerank discipline); production vocabularies
(30k merges) run the same per-round plan in a driver loop with
localCheckpoint, exactly like operators/clustering.py's Lloyd
escalation path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import words
from ..io import load_table
from ..registry import register

BPE_MERGES = 4


def _symbols(sym: Column) -> Column:
    """Symbol list (each element keeps its ';' terminator) from the
    spaced representation."""
    return F.filter(F.split(sym, " "), lambda s: s != "")


def _adjacent_pairs(sym: Column) -> Column:
    syms = _symbols(sym)
    # guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0] for a
    # single-symbol word, not an empty list — same trap as
    # token_shingle_hash_pairs' index build
    idx = F.when(
        F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat(
            F.element_at(syms, i), F.lit(" "), F.element_at(syms, i + 1)
        ),
    )


def bpe_symbolized_vocab(vocab: DataFrame) -> DataFrame:
    """(word, freq) -> (word, freq, sym): the spaced-and-terminated
    symbol encoding every merge round rewrites."""
    sym0 = F.array_join(
        F.transform(
            F.split("word", ""),
            lambda c: F.concat(F.lit(" "), c, F.lit(";")),
        ),
        "",
    )
    return vocab.select("word", "freq", sym0.alias("sym"))


def bpe_best_pair(cur: DataFrame) -> DataFrame:
    """The round's argmax: one (pair, pair_count) row, deterministic
    tie-break (count desc, pair asc); empty when no adjacent pairs
    remain (fully merged vocabulary)."""
    return (
        cur.select("freq", F.explode(_adjacent_pairs(F.col("sym"))).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(1)
    )


def bpe_apply_merge(cur: DataFrame, best: DataFrame) -> DataFrame:
    """Apply the winning merge everywhere: leftmost-non-overlapping
    by the replace() scan order; 1-row broadcast join (no collect)."""
    return cur.crossJoin(F.broadcast(best.select("pair"))).select(
        "word",
        "freq",
        F.replace(
            F.col("sym"),
            F.concat(F.lit(" "), F.col("pair")),
            F.concat(
                F.lit(" "),
                F.replace(F.col("pair"), F.lit("; "), F.lit("")),
            ),
        ).alias("sym"),
    )


def bpe_merges_from(d: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Learn the first `n_merges` BPE merges from a (text) relation.
    Returns (rank, left, right, merged, pair_count) — the merge
    table a tokenizer would persist, in learned order."""
    vocab = words(d, "text").groupBy("word").agg(F.count("*").alias("freq"))
    cur = bpe_symbolized_vocab(vocab)
    bests = []
    for rank in range(1, n_merges + 1):
        best = bpe_best_pair(cur).select(
            F.lit(rank).alias("rank"), "pair", "pair_count"
        )
        bests.append(best)
        # cut the per-round lineage LAZILY (plan depth grows per
        # round; eager would run jobs at construction time)
        cur = bpe_apply_merge(cur, best).localCheckpoint(eager=False)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    left = F.element_at(F.split("pair", "; "), 1)
    right = F.replace(F.element_at(F.split("pair", "; "), 2), F.lit(";"), F.lit(""))
    return (
        out.select(
            "rank",
            left.alias("left"),
            right.alias("right"),
            F.concat(left, right).alias("merged"),
            "pair_count",
        )
        .orderBy("rank")
    )


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`bpe_merges_from` over the documents
    fixture."""
    return bpe_merges_from(load_table(spark, sf_dir, "documents"))


def _bpe_oracle_sql() -> str:
    """Unrolled DuckDB mirror: same vocabulary, same symbol
    encoding, same pair counts, same argmax tie-break, same
    replace-based merge — round for round."""
    ctes = [
        """vocab AS (
  SELECT word, count(*) AS freq FROM (
    SELECT lower(regexp_replace(t.tok, '[^a-zA-Z]', '', 'g')) AS word
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
  ) w WHERE word <> '' GROUP BY word
)""",
        """s0 AS (
  SELECT word, freq,
         array_to_string(list_transform(string_split(word, ''),
                                        c -> ' ' || c || ';'), '') AS sym
  FROM vocab
)""",
    ]
    for i in range(1, BPE_MERGES + 1):
        prev = f"s{i - 1}"
        ctes.append(
            f"""p{i} AS (
  SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
         j -> syms[j] || ' ' || syms[j + 1])) AS pair
  FROM (SELECT freq,
               list_filter(string_split(sym, ' '), s -> s <> '') AS syms
        FROM {prev}) q
)""",
        )
        ctes.append(
            f"""b{i} AS (
  SELECT {i} AS rank, pair, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM p{i} GROUP BY pair
  ORDER BY pair_count DESC, pair ASC LIMIT 1
)""",
        )
        ctes.append(
            f"""s{i} AS (
  SELECT s.word, s.freq,
         replace(s.sym, ' ' || b.pair,
                 ' ' || replace(b.pair, '; ', '')) AS sym
  FROM {prev} s, b{i} b
)""",
        )
    union = "\n  UNION ALL ".join(
        f"SELECT rank, pair, pair_count FROM b{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
all_b AS (
  {union}
)
SELECT rank,
       string_split(pair, '; ')[1] AS left,
       replace(string_split(pair, '; ')[2], ';', '') AS right,
       string_split(pair, '; ')[1]
         || replace(string_split(pair, '; ')[2], ';', '') AS merged,
       pair_count
FROM all_b
ORDER BY rank
"""
    )


BPE_LEARN_MERGES_ORACLE = _bpe_oracle_sql()

register("bpe_learn_merges", bpe_learn_merges, BPE_LEARN_MERGES_ORACLE)


WP_MERGES = 4


def wordpiece_best_pair(cur: DataFrame) -> DataFrame:
    """The WordPiece round argmax (Schuster & Nakajima 2012; the
    BERT tokenizer's objective): instead of BPE's raw pair count,
    maximize the likelihood ratio pair_count / (left_count *
    right_count) — merge the pair most surprising under symbol
    independence, so rare-but-collocated symbols merge before
    frequent-but-independent ones.  Numerator and denominator are
    exact integer sums; the ranking divides them ONCE as doubles
    (IEEE division of exact integers is identically rounded in
    Spark and DuckDB, so the argmax is cross-engine deterministic;
    ties break pair ASC)."""
    pairs = (
        cur.select(
            "freq", F.explode(_adjacent_pairs(F.col("sym"))).alias("pair")
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
    )
    syms = (
        cur.select("freq", F.explode(_symbols(F.col("sym"))).alias("s"))
        .groupBy("s")
        .agg(F.sum("freq").alias("cnt"))
    )
    left = F.element_at(F.split("pair", " "), 1)
    right = F.element_at(F.split("pair", " "), 2)
    sl = syms.select(F.col("s").alias("_ls"), F.col("cnt").alias("_lc"))
    sr = syms.select(F.col("s").alias("_rs"), F.col("cnt").alias("_rc"))
    return (
        pairs.withColumn("_l", left)
        .withColumn("_r", right)
        .join(F.broadcast(sl), F.col("_l") == F.col("_ls"))
        .join(F.broadcast(sr), F.col("_r") == F.col("_rs"))
        .withColumn("den", F.col("_lc") * F.col("_rc"))
        .orderBy(
            (
                F.col("pair_count").cast("double")
                / F.col("den").cast("double")
            ).desc(),
            F.col("pair").asc(),
        )
        .limit(1)
        .select("pair", "pair_count", "den")
    )


def wordpiece_merges_from(
    d: DataFrame, n_merges: int = WP_MERGES
) -> DataFrame:
    """Learn the first `n_merges` WordPiece merges from a (text)
    relation — the same symbol encoding, merge application, and
    per-round lazy checkpoint as :func:`bpe_merges_from`; only the
    round objective differs.  Returns (rank, left, right, merged,
    pair_count, den): the score's exact integer numerator and
    denominator ride along so the output (and the oracle compare)
    stays float-free."""
    vocab = words(d, "text").groupBy("word").agg(F.count("*").alias("freq"))
    cur = bpe_symbolized_vocab(vocab)
    bests = []
    for rank in range(1, n_merges + 1):
        best = wordpiece_best_pair(cur).select(
            F.lit(rank).alias("rank"), "pair", "pair_count", "den"
        )
        bests.append(best)
        cur = bpe_apply_merge(cur, best).localCheckpoint(eager=False)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    left = F.element_at(F.split("pair", "; "), 1)
    right = F.replace(
        F.element_at(F.split("pair", "; "), 2), F.lit(";"), F.lit("")
    )
    return (
        out.select(
            "rank",
            left.alias("left"),
            right.alias("right"),
            F.concat(left, right).alias("merged"),
            "pair_count",
            "den",
        )
        .orderBy("rank")
    )


def wordpiece_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`wordpiece_merges_from` over the
    documents fixture."""
    return wordpiece_merges_from(load_table(spark, sf_dir, "documents"))


def _wordpiece_oracle_sql() -> str:
    """Unrolled DuckDB mirror of the WordPiece rounds: the BPE
    mirror's CTE chain plus a per-round symbol-count CTE; the argmax
    divides the same exact integers as doubles."""
    ctes = [
        """vocab AS (
  SELECT word, count(*) AS freq FROM (
    SELECT lower(regexp_replace(t.tok, '[^a-zA-Z]', '', 'g')) AS word
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
  ) w WHERE word <> '' GROUP BY word
)""",
        """s0 AS (
  SELECT word, freq,
         array_to_string(list_transform(string_split(word, ''),
                                        c -> ' ' || c || ';'), '') AS sym
  FROM vocab
)""",
    ]
    for i in range(1, WP_MERGES + 1):
        prev = f"s{i - 1}"
        ctes.append(
            f"""p{i} AS (
  SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
         j -> syms[j] || ' ' || syms[j + 1])) AS pair
  FROM (SELECT freq,
               list_filter(string_split(sym, ' '), s -> s <> '') AS syms
        FROM {prev}) q
)""",
        )
        ctes.append(
            f"""u{i} AS (
  SELECT s, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_filter(string_split(sym, ' '),
                                    x -> x <> '')) AS s
    FROM {prev}
  ) q GROUP BY s
)""",
        )
        ctes.append(
            f"""b{i} AS (
  SELECT {i} AS rank, pair, pair_count, ul.cnt * ur.cnt AS den
  FROM (
    SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
    FROM p{i} GROUP BY pair
  ) pc
  JOIN u{i} ul ON ul.s = string_split(pair, ' ')[1]
  JOIN u{i} ur ON ur.s = string_split(pair, ' ')[2]
  ORDER BY (CAST(pair_count AS DOUBLE) / CAST(ul.cnt * ur.cnt AS DOUBLE))
           DESC, pair ASC
  LIMIT 1
)""",
        )
        ctes.append(
            f"""s{i} AS (
  SELECT s.word, s.freq,
         replace(s.sym, ' ' || b.pair,
                 ' ' || replace(b.pair, '; ', '')) AS sym
  FROM {prev} s, b{i} b
)""",
        )
    union = "\n  UNION ALL ".join(
        f"SELECT rank, pair, pair_count, den FROM b{i}"
        for i in range(1, WP_MERGES + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
all_b AS (
  {union}
)
SELECT rank,
       string_split(pair, '; ')[1] AS left,
       replace(string_split(pair, '; ')[2], ';', '') AS right,
       string_split(pair, '; ')[1]
         || replace(string_split(pair, '; ')[2], ';', '') AS merged,
       pair_count,
       CAST(den AS BIGINT) AS den
FROM all_b
ORDER BY rank
"""
    )


WORDPIECE_LEARN_MERGES_ORACLE = _wordpiece_oracle_sql()

register(
    "wordpiece_learn_merges",
    wordpiece_learn_merges,
    WORDPIECE_LEARN_MERGES_ORACLE,
)


BPE_VOCAB_TOPK = 25


def bpe_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the learned merges: segment every corpus word with the
    BPE_MERGES-round merge table and return the resulting subword
    vocabulary distribution (top BPE_VOCAB_TOPK subwords by corpus
    occurrences, then subword asc) — the learn->apply round trip a
    tokenizer ships.

    Application cost at 100 TB is the point: segmentation happens
    on the VOCAB table (one row per distinct word), and per-word
    subword counts rejoin the corpus only as (word, subword, k)
    rows — the corpus itself is touched exactly once by the word
    count.  Here application reuses the same unrolled rounds as
    bpe_learn_merges (the final `cur` state IS the segmented
    vocab), so learn and apply cannot drift."""
    d = load_table(spark, sf_dir, "documents")
    vocab = words(d, "text").groupBy("word").agg(F.count("*").alias("freq"))
    cur = bpe_symbolized_vocab(vocab)
    for _ in range(BPE_MERGES):
        cur = bpe_apply_merge(cur, bpe_best_pair(cur)).localCheckpoint(
            eager=False
        )
    return (
        cur.select("freq", F.explode(_symbols(F.col("sym"))).alias("_s"))
        .select(
            "freq", F.replace(F.col("_s"), F.lit(";"), F.lit("")).alias("subword")
        )
        .groupBy("subword")
        .agg(F.sum("freq").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("subword").asc())
        .limit(BPE_VOCAB_TOPK)
    )


def _bpe_tokenize_oracle_sql() -> str:
    """Reuses the learn oracle's unrolled CTE chain; the final
    segmented vocab s{M} explodes into the subword distribution."""
    learn = _bpe_oracle_sql()
    # strip the learn oracle's final SELECT (everything after the
    # closing of the last CTE block `all_b AS (...)`), keep the CTEs
    cte_part = learn[: learn.rindex(")") + 1]
    cte_part = cte_part[: cte_part.rindex("all_b AS (")].rstrip().rstrip(",")
    return (
        cte_part
        + f""",
subwords AS (
  SELECT replace(unnest(list_filter(string_split(sym, ' '), s -> s <> '')),
                 ';', '') AS subword,
         freq
  FROM s{BPE_MERGES}
)
SELECT subword, CAST(sum(freq) AS BIGINT) AS n_occurrences
FROM subwords
GROUP BY subword
ORDER BY n_occurrences DESC, subword ASC
LIMIT {BPE_VOCAB_TOPK}
"""
    )


BPE_TOKENIZE_CORPUS_ORACLE = _bpe_tokenize_oracle_sql()

register("bpe_tokenize_corpus", bpe_tokenize_corpus, BPE_TOKENIZE_CORPUS_ORACLE)
