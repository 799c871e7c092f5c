"""Tokenizer contract + text scalar functions.

The normalization semantics replicate the reference bit-for-bit
(SURVEY.md §1.3):

- removePunctuation (maprdeuce.cpp:204-215): keep ONLY ASCII letters
  [a-zA-Z], lowercase; digits/punct/non-ASCII deleted
  ("don't" -> "dont", "[1]" -> "").
- split (maprdeuce.cpp:218-229): split on the single space character
  ' ' (not general whitespace).
- empty tokens dropped post-normalization (maprdeuce.cpp:242).

All expressions are Catalyst built-ins — the whole tokenize path
stays inside WholeStageCodegen, no Python in the hot loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Character class of everything the reference deletes.
NON_LETTER_RE = "[^a-zA-Z]"


def normalize_word(col: Column | str) -> Column:
    """removePunctuation semantics: strip non-letters, lowercase."""
    return F.lower(F.regexp_replace(col, NON_LETTER_RE, ""))


def tokenize_line(col: Column | str) -> Column:
    """Reference `split` semantics: split on single literal space.
    Returns array<string> of raw (un-normalized) tokens."""
    # -1 limit: keep trailing empty strings (they are dropped later
    # by the empty-token filter, same as the reference).
    return F.split(col, " ", -1)


def words(df: DataFrame, text_col: str = "text") -> DataFrame:
    """line -> 0..n normalized words: the reference's `make_map`
    (maprdeuce.cpp:232-255) as one declarative expression.

    flatMap == explode; the empty filter is maprdeuce.cpp:242.

    Keep the normalize-AFTER-explode order: the per-line
    reformulation (delete `[^a-zA-Z ]` from the line, then split)
    is semantically identical but measured ~12x SLOWER — the
    expensive line-level regexp lands inside the Generate's child
    and is re-evaluated per emitted token, while the per-token
    regexp below runs once per short token in the post-explode
    projection.
    """
    return (
        df.select(F.explode(tokenize_line(text_col)).alias("raw"))
        .select(normalize_word("raw").alias("word"))
        .where(F.col("word") != "")
    )


# --- text-analysis scalar expressions (training-data pipeline) ---

# Tiny embedded English stopword list — used for the language-ID
# heuristic and quality scoring.  Public-knowledge word list.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
)


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count (split on runs of whitespace)."""
    arr = F.split(F.trim(col), r"\s+", -1)
    # trim("") splits to [""] -> count 0
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(arr))


BPE_ISH_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_count_bpe_ish(col: Column | str) -> Column:
    """BPE-ish subword proxy: count letter runs, digit runs, and
    single non-alnum glyphs — the way byte-level tokenizers pre-split
    text.  One codegen'd regexp, no UDF."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), F.lit(0)))



def punct_ratio(col: Column | str) -> Column:
    """fraction of characters that are not alnum/space."""
    n = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


def stopword_ratio(col: Column | str) -> Column:
    """fraction of whitespace tokens that are English stopwords."""
    toks = F.split(F.lower(F.trim(col)), r"\s+", -1)
    stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    total = token_count_ws(col)
    return F.when(total == 0, F.lit(0.0)).otherwise(
        stop.cast("double") / total.cast("double")
    )
