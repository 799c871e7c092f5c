"""Hash-based sketch primitives: shingling, MinHash signatures,
SimHash, rolling-hash fingerprints.

All built from Catalyst expressions (xxhash64, bit ops, HOFs) —
JVM-side, shuffle-friendly, no Python in the hot path.  These are
the scale path for near-duplicate detection: signatures are fixed
width regardless of document size, and LSH banding turns the O(n^2)
pair search into an equi-join on (band, band_hash).

Published sources: MinHash resemblance sketches (Broder, "On the
resemblance and containment of documents", SEQUENCES 1997); the
banding analysis follows Leskovec/Rajaraman/Ullman, "Mining of
Massive Datasets" ch. 3; SimHash is Charikar's random-hyperplane
rounding ("Similarity estimation techniques from rounding
algorithms", STOC 2002) as deployed for web dedup in Manku et al.,
WWW 2007; the double-hashing trick for simulating k MinHash
permutations from 2 hashes is Kirsch & Mitzenmacher, ESA 2006.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Modulus/bases for the oracle-checkable polynomial rolling hash
# (small enough that acc*BASE + char never overflows int64).
FP_MOD = 1_000_000_007
FP_MOD2 = 1_000_000_009  # second modulus for independent portable hash
FP_CHAR_BASE = 31
FP_WORD_BASE = 131


def spark_charhash(
    col: Column, base: int = FP_CHAR_BASE, mod: int = FP_MOD
) -> Column:
    """Polynomial rolling hash of a string column:
    fold over chars: (acc*base + ascii(c)) % mod.  Pure Catalyst HOF
    (JVM-side), mirrored bit-for-bit by :func:`duck_charhash` — the
    portable primitive that lets sketches (MinHash, SimHash) be
    differentially tested against DuckDB."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def spark_charhash_pair(col: Column) -> Column:
    """Both portable hashes — (base 31, mod 1e9+7) and (base 131,
    mod 1e9+9) — in ONE fold over the characters, returned as a
    struct<h1,h2>.  Halves the split/fold work vs calling
    :func:`spark_charhash` twice; values are identical."""
    chars = F.split(col, "")
    init = F.struct(
        F.lit(0).cast("bigint").alias("h1"), F.lit(0).cast("bigint").alias("h2")
    )
    return F.aggregate(
        chars,
        init,
        lambda acc, c: F.struct(
            ((acc["h1"] * FP_CHAR_BASE + F.ascii(c)) % FP_MOD).alias("h1"),
            ((acc["h2"] * FP_WORD_BASE + F.ascii(c)) % FP_MOD2).alias("h2"),
        ),
    )


def duck_charhash(expr: str, base: int = FP_CHAR_BASE, mod: int = FP_MOD) -> str:
    """DuckDB SQL fragment computing :func:`spark_charhash` of a
    varchar expression."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {base} + c) % {mod})"
    )


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document.

    tokens = lowercased whitespace split; shingle = n consecutive
    tokens joined by single spaces.  Returns (id_col, shingle).
    """
    toks_expr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+", -1)
    # materialize the token array ONCE per row: explode(array(..))
    # is a collapse barrier, without which the split() re-evaluates
    # inside every per-element slice() of the transform below
    # (measured ~10x slower shingle construction)
    base = df.select(F.col(id_col), F.explode(F.array(toks_expr)).alias("_toks"))
    toks = F.col("_toks")
    # guard: sequence(0, k) needs k >= 0; short docs yield no shingles
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return (
        base.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


# Double-hashing parameters: h_i = (h1 mod P61) + i * (h2 mod 2^57).
# Max value: (2^61 - 2) + 31 * (2^57 - 1) < 2^63 — no int64 overflow
# even under ANSI arithmetic.
_MH_P61 = (1 << 61) - 1
_MH_P57 = 1 << 57


def minhash_signature(
    shingles: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    shingle_col: str = "shingle",
) -> DataFrame:
    """MinHash signature via double hashing (Kirsch–Mitzenmacher):
    two base hashes per shingle, permutation i is the linear combo
    (h1 + i*h2) mod p — same min-wise independence class as
    num_hashes separate hash functions at 1/16th the hashing cost.
    One shuffle (groupBy id), num_hashes parallel min-aggregates
    over fused multiply-adds.  Works on string shingles or their
    64-bit hashes (hash-of-hash keeps the min-wise property).

    The mod-p wrap is LOAD-BEARING, not hygiene: without it the
    argmin of h1 + i*h2 for growing i collapses to the argmin of
    h2 alone, so the 32 "permutations" are near-copies of one —
    measured on the sf0.1 fixture this silently cost 5/256
    containment pairs at Jaccard 0.92-0.99, pairs that should miss
    8 bands with probability ~1e-18.  Intermediate h1 + i*h2 is
    < 2^63 by the parameter choice below, so the wrap is exact
    under ANSI arithmetic."""
    h1 = F.pmod(F.xxhash64(F.col(shingle_col), F.lit(0)), F.lit(_MH_P61))
    h2 = F.pmod(F.xxhash64(F.col(shingle_col), F.lit(1)), F.lit(_MH_P57))
    base = shingles.select(
        F.col(id_col), h1.alias("_h1"), h2.alias("_h2")
    )
    aggs = [
        F.min(
            F.pmod(F.col("_h1") + F.lit(i) * F.col("_h2"), F.lit(_MH_P61))
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return base.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """Band the signature: rows/band = num_hashes/bands; band key =
    xxhash64 of that band's minhashes.  Output (id, band, band_hash)
    — candidate pairs share (band, band_hash)."""
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("band_hash"))
        )
    # no distinct: one signature row per id -> (id, band) pairs are
    # unique by construction; a distinct here would be a wasted shuffle
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bh")
    ).select(id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))


def minhash_signature_portable(
    shingles: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    shingle_col: str = "shingle",
) -> DataFrame:
    """Portable-hash MinHash signature: same Kirsch–Mitzenmacher
    double hashing as :func:`minhash_signature`, but the two base
    hashes are polynomial rolling hashes (bases 31/131, moduli
    1e9+7/1e9+9) that DuckDB reproduces exactly — so the whole
    LSH pipeline is oracle-checkable.  Permutation i is
    (h1 + i*h2) mod 1e9+7 — see :func:`minhash_signature` for why
    the mod-wrap is required for hash independence; the pre-mod
    value is ~3.3e10, no int64 overflow.  Still one shuffle."""
    base = shingles.select(
        F.col(id_col), spark_charhash_pair(F.col(shingle_col)).alias("_h")
    ).select(
        id_col,
        F.col("_h.h1").alias("_h1"),
        F.col("_h.h2").alias("_h2"),
    )
    aggs = [
        F.min(
            F.pmod(F.col("_h1") + F.lit(i) * F.col("_h2"), F.lit(FP_MOD))
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return base.groupBy(id_col).agg(*aggs)


def lsh_bands_portable(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """Portable banding: band key = polynomial fold of that band's
    minhashes mod 1e9+7 (mirrored in SQL by :func:`duck_band_hash`).
    Output (id, band, band_hash) like :func:`lsh_bands`."""
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        acc: Column = F.lit(0).cast("bigint")
        for r in range(rows):
            acc = (acc * FP_WORD_BASE + F.col(f"mh_{b * rows + r}")) % FP_MOD
        band_cols.append(
            F.struct(F.lit(b).alias("band"), acc.alias("band_hash"))
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bh")
    ).select(
        id_col,
        F.col("bh.band").alias("band"),
        F.col("bh.band_hash").alias("band_hash"),
    )


def duck_band_hash(band: int, rows: int) -> str:
    """DuckDB fragment matching one :func:`lsh_bands_portable` band
    key over columns mh_0..mh_{n-1} of a `sig` relation."""
    expr = "CAST(0 AS BIGINT)"
    for r in range(rows):
        expr = f"(({expr}) * {FP_WORD_BASE} + mh_{band * rows + r}) % {FP_MOD}"
    return expr


def simhash63(tokens: DataFrame, id_col: str, token_col: str = "word") -> DataFrame:
    """63-bit SimHash per document from token frequencies.

    For bit i: s_i = sum over tokens(cnt if bit i of xxhash64(token)
    else -cnt); simhash bit i = 1 if s_i > 0.  Bits 0..62 assembled
    into a non-negative bigint (bit 63 dropped to avoid int64
    overflow).  One shuffle.
    """
    counted = tokens.groupBy(id_col, token_col).agg(F.count("*").alias("cnt"))
    h = F.xxhash64(F.col(token_col))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"s_{i}")
        for i in range(63)
    ]
    sums = counted.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(63):
        term = F.when(F.col(f"s_{i}") > 0, F.lit(1).cast("bigint") * (2**i)).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash60_portable(
    tokens: DataFrame, id_col: str, token_col: str = "word"
) -> DataFrame:
    """60-bit SimHash from the portable polynomial hashes: the token
    hash is h1 | (h2 << 30) where h1 = charhash(31, 1e9+7) and
    h2 = charhash(131, 1e9+9) — both < 2^30, so the combination is a
    60-bit value both engines compute identically (Charikar 2002
    rounding, Manku 2007 deployment; the hash family is weaker than
    xxhash64 but identical cross-engine, which is what makes the
    signature differentially testable).  Same one-shuffle plan as
    :func:`simhash63`."""
    counted = (
        tokens.groupBy(id_col, token_col)
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col(id_col),
            F.col("cnt"),
            spark_charhash_pair(F.col(token_col)).alias("_h"),
        )
    )
    h = F.col("_h.h1") + F.col("_h.h2") * F.lit(1 << 30).cast("bigint")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"s_{i}")
        for i in range(60)
    ]
    sums = counted.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(60):
        term = F.when(
            F.col(f"s_{i}") > 0, F.lit(1).cast("bigint") * (2**i)
        ).otherwise(F.lit(0).cast("bigint"))
        sig = term if sig is None else sig + term
    return sums.select(F.col(id_col), sig.alias("simhash"))


def duck_simhash60(tokens_rel: str, id_col: str, token_col: str) -> str:
    """DuckDB SQL (full SELECT) matching :func:`simhash60_portable`
    over a relation of exploded tokens."""
    h1 = duck_charhash(token_col, FP_CHAR_BASE, FP_MOD)
    h2 = duck_charhash(token_col, FP_WORD_BASE, FP_MOD2)
    bit_terms = ",\n".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN cnt ELSE -cnt END) AS s_{i}"
        for i in range(60)
    )
    sig = " + ".join(
        f"(CASE WHEN s_{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(60)
    )
    return f"""
WITH counted AS (
  SELECT {id_col}, {token_col}, count(*) AS cnt
  FROM {tokens_rel}
  GROUP BY 1, 2
),
hashed AS (
  SELECT {id_col}, cnt,
         {h1} + {h2} * CAST({1 << 30} AS BIGINT) AS h
  FROM counted
),
sums AS (
  SELECT {id_col}, {bit_terms}
  FROM hashed GROUP BY {id_col}
)
SELECT {id_col}, {sig} AS simhash FROM sums
"""


def spark_word_fingerprint(words_col: Column) -> Column:
    """Rolling polynomial fingerprint of an array<string> of words:
      wordhash(w) = fold over chars: (acc*31 + ascii(c)) % M
      doc_fp     = fold over words: (acc*131 + wordhash(w)) % M
    Mirrored exactly by :func:`duck_word_fingerprint`."""

    def wordhash(w: Column) -> Column:
        chars = F.split(w, "")
        return F.aggregate(
            chars,
            F.lit(0).cast("bigint"),
            lambda acc, c: (acc * FP_CHAR_BASE + F.ascii(c)) % FP_MOD,
        )

    return F.aggregate(
        words_col,
        F.lit(0).cast("bigint"),
        lambda acc, w: (acc * FP_WORD_BASE + wordhash(w)) % FP_MOD,
    )


def duck_word_fingerprint(words_sql: str) -> str:
    """DuckDB SQL fragment matching :func:`spark_word_fingerprint`
    over a list-of-varchar expression."""
    wordhash = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {FP_CHAR_BASE} + c) % {FP_MOD})"
    )
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({words_sql}, w -> {wordhash})), "
        f"(acc, wh) -> (acc * {FP_WORD_BASE} + wh) % {FP_MOD})"
    )


def token_shingle_hash_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word-n-gram shingles per document as PORTABLE HASH
    PAIRS (h1, h2) — numerically identical to
    ``spark_charhash_pair(shingle_string)`` but never materializes
    the shingle strings.

    One 4-field fold per TOKEN accumulates (h1, h2, B1^len, B2^len);
    shingle hashes then compose by the polynomial identity
    ``H(a || ' ' || b) = (H(a) * B^(len(b)+1) + H(' ' || b)) mod M``
    — a handful of multiply-adds per shingle instead of a ~22-char
    re-fold per shingle.  Measured 2.4x faster than the string path,
    and the downstream distinct/join keys are two bigints instead of
    strings (fixed-width shuffle at 100 TB).  Collision risk of the
    pair key is ~n^2 / 2^60 — negligible; the oracle keeps hashing
    the joined strings, which this matches value-for-value.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+", -1)

    def tokfold(w: Column) -> Column:
        init = F.struct(
            F.lit(0).cast("bigint").alias("h1"),
            F.lit(0).cast("bigint").alias("h2"),
            F.lit(1).cast("bigint").alias("p1"),
            F.lit(1).cast("bigint").alias("p2"),
        )
        return F.aggregate(
            F.split(w, ""),
            init,
            lambda a, c: F.struct(
                ((a["h1"] * FP_CHAR_BASE + F.ascii(c)) % FP_MOD).alias("h1"),
                ((a["h2"] * FP_WORD_BASE + F.ascii(c)) % FP_MOD2).alias("h2"),
                ((a["p1"] * FP_CHAR_BASE) % FP_MOD).alias("p1"),
                ((a["p2"] * FP_WORD_BASE) % FP_MOD2).alias("p2"),
            ),
        )

    # per token: g = hash(' ' + w), pe = B^(len+1) — space is ascii 32
    th = F.transform(
        F.transform(toks, tokfold),
        lambda t: F.struct(
            t["h1"].alias("h1"),
            t["h2"].alias("h2"),
            ((F.lit(32).cast("bigint") * t["p1"] + t["h1"]) % FP_MOD).alias("g1"),
            ((F.lit(32).cast("bigint") * t["p2"] + t["h2"]) % FP_MOD2).alias("g2"),
            ((t["p1"] * FP_CHAR_BASE) % FP_MOD).alias("p1e"),
            ((t["p2"] * FP_WORD_BASE) % FP_MOD2).alias("p2e"),
        ),
    )

    def compose(i: Column) -> Column:
        t0 = F.element_at(F.col("_th"), i)
        s1, s2 = t0["h1"], t0["h2"]
        for k in range(1, n):
            tk = F.element_at(F.col("_th"), i + k)
            s1 = (s1 * tk["p1e"] + tk["g1"]) % FP_MOD
            s2 = (s2 * tk["p2e"] + tk["g2"]) % FP_MOD2
        return F.struct(s1.alias("h1"), s2.alias("h2"))

    nn = F.size(toks)
    idx = F.when(nn >= n, F.sequence(F.lit(1), nn - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    # explode(array(th)) materializes the token-hash array ONCE —
    # without the Generate barrier CollapseProject re-inlines the
    # fold into every element_at reference
    return (
        df.select(
            F.col(id_col),
            F.explode(F.array(th)).alias("_th"),
            idx.alias("_idx"),
        )
        .select(
            F.col(id_col),
            F.explode(F.transform(F.col("_idx"), compose)).alias("hh"),
        )
        .select(id_col, F.col("hh.h1").alias("h1"), F.col("hh.h2").alias("h2"))
        .distinct()
    )


def minhash_signature_from_pairs(
    pairs: DataFrame, id_col: str, num_hashes: int = 32
) -> DataFrame:
    """MinHash signature (Kirsch–Mitzenmacher double hashing,
    (h1 + i*h2) mod 1e9+7 — the mod-wrap is required for hash
    independence, see :func:`minhash_signature`) over precomputed
    portable hash-pair shingles (h1, h2) — same output as
    :func:`minhash_signature_portable` without re-hashing."""
    aggs = [
        F.min(
            F.pmod(F.col("h1") + F.lit(i) * F.col("h2"), F.lit(FP_MOD))
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return pairs.groupBy(id_col).agg(*aggs)
