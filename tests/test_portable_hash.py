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


def test_minhash_combination_bounds(spark):
    # h1 + 31*h2 must stay under 2^63 for the largest possible hash
    # values (no ANSI overflow at any input)
    assert (FP_MOD - 1) + 31 * (FP_MOD2 - 1) < 2**63
    # simhash 60-bit packing: both halves fit in 30 bits
    assert FP_MOD - 1 < 2**30 and FP_MOD2 - 1 < 2**30
