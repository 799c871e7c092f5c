"""Property tests for the portable hash family: the Catalyst HOF
implementations (spark_charhash / spark_charhash_pair / the MinHash
double-hash combination) must equal an independent pure-Python
reference on arbitrary ASCII strings — this is the foundation the
sketch oracles (MinHash/SimHash/fingerprint) stand on."""

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from db_mapreduce_project_spark.functions.hashing import (
    FP_CHAR_BASE,
    FP_MOD,
    FP_MOD2,
    FP_WORD_BASE,
    spark_charhash,
    spark_charhash_pair,
)


def py_charhash(s: str, base: int, mod: int) -> int:
    acc = 0
    for ch in s:
        acc = (acc * base + ord(ch)) % mod
    return acc


ASCII_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .,-'", min_size=1, max_size=40
)


@settings(max_examples=1, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=30, max_size=60, unique=True))
def test_charhash_matches_python_reference(spark, samples):
    # one Spark job for the whole sample batch (not one per example)
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    rows = df.select(
        "s",
        spark_charhash(F.col("s"), FP_CHAR_BASE, FP_MOD).alias("h1"),
        spark_charhash(F.col("s"), FP_WORD_BASE, FP_MOD2).alias("h2"),
        spark_charhash_pair(F.col("s")).alias("hp"),
    ).collect()
    for r in rows:
        assert r["h1"] == py_charhash(r["s"], FP_CHAR_BASE, FP_MOD), r["s"]
        assert r["h2"] == py_charhash(r["s"], FP_WORD_BASE, FP_MOD2), r["s"]
        # the fused single-fold pair must equal the two separate folds
        assert r["hp"]["h1"] == r["h1"] and r["hp"]["h2"] == r["h2"], r["s"]


TRICKY = [
    (1, "the fast key order sort"),
    (2, ""),
    (3, None),
    (4, "a b c"),
    (5, " lead  trail "),
    (6, "x\ty\nz w q"),
    (7, "ΣΑΣ Σ ΑΣ δΕλΤΑ έψιλον"),  # Final_Sigma lowercasing
    (8, "İstanbul deniz İzmir Ege Akdeniz"),  # İ -> i + combining dot
    (9, "😀ok a b c 😀ok"),  # astral plane: split("") keeps pairs whole
    (10, "a\xa0b c d e"),  # NBSP is NOT Java-\s whitespace
    (11, "one two"),  # fewer tokens than the shingle width
    (12, "dup dup dup dup dup"),  # per-doc distinct must collapse
    (13, "\t lead tab mix \f ff \x0b vt end "),  # trim strips ' ' only
]


def test_arrow_kernels_match_catalyst(spark):
    """The vectorized NumPy kernels (round 14, guide §4.2) must be
    VALUE-IDENTICAL to the Catalyst HOF folds they replace — on the
    Unicode/whitespace/empty edge cases above, not just the ASCII
    fixture.  This is the parity foundation for every query whose
    shingle/fingerprint/bigram producer moved to the Arrow kernel."""
    from pyspark.sql import functions as F

    from db_mapreduce_project_spark.functions.hashing import (
        token_shingle_hash_pairs,
    )
    from db_mapreduce_project_spark.functions.hashing_arrow import (
        bigram_bucket_counts_arrow,
        charhash_pair_arrow,
        token_shingle_hash_pairs_arrow,
    )

    d = spark.createDataFrame(TRICKY, "doc_id long, text string")
    # shingle hash pairs (incl. the implicit distinct)
    cat = token_shingle_hash_pairs(d, "doc_id", "text", n=3)
    arr = token_shingle_hash_pairs_arrow(d, "doc_id", "text", n=3)
    assert cat.exceptAll(arr).count() == 0
    assert arr.exceptAll(cat).count() == 0
    # full-text hash pair (NULL text -> NULL hashes)
    cat2 = d.select(
        "doc_id",
        F.explode(F.array(spark_charhash_pair(F.col("text")))).alias("fp"),
    ).select("doc_id", F.col("fp.h1").alias("h1"), F.col("fp.h2").alias("h2"))
    arr2 = charhash_pair_arrow(d, "text", ["doc_id"])
    assert cat2.exceptAll(arr2).count() == 0
    assert arr2.exceptAll(cat2).count() == 0
    # DSIR bigram-bucket rollup
    from db_mapreduce_project_spark.operators.curation import (
        DSIR_BUCKETS,
        _bigram_buckets,
    )

    d2 = d.withColumn("lang", F.lit("en"))
    cat3 = _bigram_buckets(d2).groupBy("doc_id", "lang", "bucket").agg(
        F.count("*").alias("k")
    )
    arr3 = bigram_bucket_counts_arrow(d2, "doc_id", "lang", "text", DSIR_BUCKETS)
    assert cat3.exceptAll(arr3).count() == 0
    assert arr3.exceptAll(cat3).count() == 0


def test_span_and_fingerprint_kernels_match_catalyst(spark):
    """The span-stream and word-fingerprint Arrow kernels must equal
    a direct Catalyst computation of the same hashes."""
    from pyspark.sql import functions as F

    from db_mapreduce_project_spark.functions.hashing import (
        spark_word_fingerprint,
    )
    from db_mapreduce_project_spark.functions.hashing_arrow import (
        span_hash_stream_arrow,
        word_fingerprint_arrow,
    )
    from db_mapreduce_project_spark.operators.dedup import (
        SPAN_LEN,
        SPAN_STRIDE,
    )

    # long-enough texts for spans, plus shorter/edge rows
    rows = [
        (i, (f"word{i} " * 20).strip()) for i in range(8)
    ] + [(100, "short"), (101, ""), (102, None), (103, "x" * SPAN_LEN)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    # spans: Catalyst reference = direct charhash of each span string
    from db_mapreduce_project_spark.functions.hashing import (
        FP_CHAR_BASE,
        FP_MOD,
        FP_MOD2,
        FP_WORD_BASE,
        spark_charhash,
    )

    dd = d.where(F.length("text") >= SPAN_LEN)
    pos = F.sequence(
        F.lit(0),
        F.floor((F.length("text") - SPAN_LEN) / SPAN_STRIDE).cast("int")
        * SPAN_STRIDE,
        F.lit(SPAN_STRIDE),
    )
    ref = (
        dd.select("doc_id", "text", F.explode(pos).alias("off"))
        .select(
            "doc_id",
            F.col("off").cast("bigint").alias("off"),
            spark_charhash(
                F.substring("text", F.col("off") + 1, SPAN_LEN),
                FP_CHAR_BASE,
                FP_MOD,
            ).alias("h1"),
            spark_charhash(
                F.substring("text", F.col("off") + 1, SPAN_LEN),
                FP_WORD_BASE,
                FP_MOD2,
            ).alias("h2"),
        )
    )
    arr = span_hash_stream_arrow(dd, "doc_id", "text", SPAN_LEN, SPAN_STRIDE)
    assert ref.exceptAll(arr).count() == 0
    assert arr.exceptAll(ref).count() == 0

    # word fingerprint
    words_arr = F.filter(
        F.transform(
            F.split(F.lower(F.trim("text")), r"\s+", -1),
            lambda w: F.regexp_replace(w, "[^a-z]", ""),
        ),
        lambda w: w != "",
    )
    ref2 = d.select("doc_id", spark_word_fingerprint(words_arr).alias("fp"))
    arr2 = word_fingerprint_arrow(d, "doc_id", "text")
    assert ref2.exceptAll(arr2).count() == 0
    assert arr2.exceptAll(ref2).count() == 0


def test_minhash_combination_bounds(spark):
    # h1 + 31*h2 must stay under 2^63 for the largest possible hash
    # values (no ANSI overflow at any input)
    assert (FP_MOD - 1) + 31 * (FP_MOD2 - 1) < 2**63
    # simhash 60-bit packing: both halves fit in 30 bits
    assert FP_MOD - 1 < 2**30 and FP_MOD2 - 1 < 2**30
