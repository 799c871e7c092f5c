"""Function-surface sweep: higher-order array functions, list
aggregates, correlation/moment statistics, error-safe (try_)
arithmetic, edit-distance fuzzy matching, and mode/median — the
long tail of scalar/aggregate coverage.

Everything stays in whole-stage codegen (built-in expressions, no
Python); outputs are aliased identically in Spark and the DuckDB
oracle so the driver's column-sorted value hash lines up.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


# ---------------------------------------------------------------
# Higher-order functions over arrays: filter / exists / forall /
# transform+aggregate composition.
# ---------------------------------------------------------------
def hof_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    pos = F.filter(emb, lambda x: x > 0)
    return (
        e.where(F.col("vec_id") <= 500)
        .select(
            "vec_id",
            F.size(pos).alias("n_pos"),
            F.exists(emb, lambda x: x > F.lit(2.0)).alias("any_gt2"),
            F.forall(emb, lambda x: F.abs(x) < F.lit(10.0)).alias("all_lt10"),
            F.aggregate(
                F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("sumsq"),
        )
        .orderBy("vec_id")
    )


HOF_ARRAY_ORACLE = """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
       len(list_filter(embedding, x -> x > 2.0)) > 0 AS any_gt2,
       len(list_filter(embedding, x -> NOT (abs(x) < 10.0))) = 0 AS all_lt10,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (acc, v) -> acc + v) AS sumsq
FROM embeddings
WHERE vec_id <= 500
ORDER BY vec_id
"""


# ---------------------------------------------------------------
# List aggregates: collect_list / collect_set (sorted -> the
# nondeterministic accumulation order is canonicalized away).
# ---------------------------------------------------------------
def agg_collect_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            # comma-joined, sorted: canonical AND hashable as a flat
            # string for external row comparators
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.array_join(
                F.sort_array(F.collect_set("n_nationkey")).cast("array<string>"),
                ",",
            ).alias("keys"),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )


AGG_COLLECT_ORACLE = """
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations,
       array_to_string(list_sort(list(DISTINCT n_nationkey)), ',') AS keys,
       count(*) AS n
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


# ---------------------------------------------------------------
# Correlation / covariance / moments, DERIVED from exact integer
# power sums instead of the engines' native corr/skewness/kurtosis:
# l_quantity is integer-valued and prices/rates are 2dp-exact, so
# quantizing to ints is lossless, the decimal(38,0)/HUGEINT sums are
# bit-identical across engines, and the closing double arithmetic is
# the same IEEE sequence on both sides — no summation-order noise,
# no engine bias-convention mismatch, no quantize-boundary flips at
# other scale factors.  Conventions: corr is Pearson; covar is
# sample covariance; skew/kurt are population g1 / excess g2.
# ---------------------------------------------------------------
def agg_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    q = F.floor(F.col("l_quantity") + 0.5)
    p = F.floor(F.col("l_extendedprice") * 100 + 0.5)
    d = F.floor(F.col("l_discount") * 100 + 0.5)
    t = F.floor(F.col("l_tax") * 100 + 0.5)
    grouped = l.groupBy("l_returnflag").agg(
        F.sum(dec(q)).alias("_sq"),
        F.sum(dec(q) * q).alias("_sq2"),
        F.sum(dec(q) * q * q).alias("_sq3"),
        F.sum(dec(q) * q * q * q).alias("_sq4"),
        F.sum(dec(p)).alias("_sp"),
        F.sum(dec(p) * p).alias("_sp2"),
        F.sum(dec(q) * p).alias("_sqp"),
        F.sum(dec(d)).alias("_sd"),
        F.sum(dec(t)).alias("_st"),
        F.sum(dec(d) * t).alias("_sdt"),
        F.count("*").alias("n"),
    )
    c = lambda name: F.col(name).cast("double")  # noqa: E731
    nd = c("n")
    sq, sq2, sq3, sq4 = c("_sq"), c("_sq2"), c("_sq3"), c("_sq4")
    sp, sp2, sqp = c("_sp"), c("_sp2"), c("_sqp")
    sd_, st, sdt = c("_sd"), c("_st"), c("_sdt")
    corr_qp = (nd * sqp - sq * sp) / (
        F.sqrt(nd * sq2 - sq * sq) * F.sqrt(nd * sp2 - sp * sp)
    )
    covar_dt = (sdt - sd_ * st / nd) / (nd - 1) / 10000.0
    mean = sq / nd
    m2 = sq2 / nd - mean * mean
    m3 = sq3 / nd - 3 * mean * (sq2 / nd) + 2 * mean * mean * mean
    m4 = (
        sq4 / nd
        - 4 * mean * (sq3 / nd)
        + 6 * mean * mean * (sq2 / nd)
        - 3 * mean * mean * mean * mean
    )
    skew_q = m3 / F.sqrt(m2 * m2 * m2)
    kurt_q = m4 / (m2 * m2) - 3.0
    r4 = lambda col: (F.floor(col * 10000.0 + 0.5) / 10000.0)  # noqa: E731
    return (
        grouped.select(
            "l_returnflag",
            r4(corr_qp).alias("corr_qp"),
            r4(covar_dt).alias("covar_dt"),
            r4(skew_q).alias("skew_q"),
            r4(kurt_q).alias("kurt_q"),
            "n",
        )
        .orderBy("l_returnflag")
    )


AGG_CORR_ORACLE = """
WITH g AS (
  SELECT l_returnflag,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS HUGEINT)) AS DOUBLE) AS sq,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS HUGEINT)
                  * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) AS sq2,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS HUGEINT)
                  * CAST(floor(l_quantity + 0.5) AS BIGINT)
                  * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) AS sq3,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS HUGEINT)
                  * CAST(floor(l_quantity + 0.5) AS BIGINT)
                  * CAST(floor(l_quantity + 0.5) AS BIGINT)
                  * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) AS sq4,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)) AS DOUBLE) AS sp,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)
                  * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS sp2,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS HUGEINT)
                  * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS sqp,
         CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS HUGEINT)) AS DOUBLE) AS sd_,
         CAST(sum(CAST(floor(l_tax * 100 + 0.5) AS HUGEINT)) AS DOUBLE) AS st,
         CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS HUGEINT)
                  * CAST(floor(l_tax * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS sdt,
         count(*) AS n
  FROM lineitem
  GROUP BY l_returnflag
),
m AS (
  SELECT l_returnflag, n,
         (CAST(n AS DOUBLE) * sqp - sq * sp)
           / (sqrt(CAST(n AS DOUBLE) * sq2 - sq * sq)
              * sqrt(CAST(n AS DOUBLE) * sp2 - sp * sp)) AS corr_qp,
         (sdt - sd_ * st / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1) / 10000.0 AS covar_dt,
         sq / CAST(n AS DOUBLE) AS mean,
         sq2 / CAST(n AS DOUBLE) AS r2,
         sq3 / CAST(n AS DOUBLE) AS r3,
         sq4 / CAST(n AS DOUBLE) AS r4_
  FROM g
),
mm AS (
  SELECT l_returnflag, n, corr_qp, covar_dt,
         r2 - mean * mean AS m2,
         r3 - 3 * mean * r2 + 2 * mean * mean * mean AS m3,
         r4_ - 4 * mean * r3 + 6 * mean * mean * r2
             - 3 * mean * mean * mean * mean AS m4
  FROM m
)
SELECT l_returnflag,
       floor(corr_qp * 10000.0 + 0.5) / 10000.0 AS corr_qp,
       floor(covar_dt * 10000.0 + 0.5) / 10000.0 AS covar_dt,
       floor((m3 / sqrt(m2 * m2 * m2)) * 10000.0 + 0.5) / 10000.0 AS skew_q,
       floor((m4 / (m2 * m2) - 3.0) * 10000.0 + 0.5) / 10000.0 AS kurt_q,
       n
FROM mm
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------
# Error-safe arithmetic: try_divide / try_add and NULL on failure
# (the ANSI-mode-safe surface).
# ---------------------------------------------------------------
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_orderkey") <= 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
                "price_per_disc"
            ),
            F.try_divide(F.lit(1.0), F.col("l_discount") - F.col("l_discount"))
            .alias("div_zero_null"),
            F.try_to_number(F.lit("123.45"), F.lit("999.99")).cast("double")
            .alias("parsed"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


TRY_ARITH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = 0 THEN NULL
            ELSE l_extendedprice / l_discount END AS price_per_disc,
       CAST(NULL AS DOUBLE) AS div_zero_null,
       CAST(123.45 AS DOUBLE) AS parsed
FROM lineitem
WHERE l_orderkey <= 300
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------
# Edit-distance fuzzy matching, the scale-correct way: a
# candidate -> verify pipeline (the discipline every dedup path in
# this repo follows; cf. dedup_containment_lsh, dedup.py).
#
#   1. Collapse the corpus to DISTINCT strings first — at 100 TB a
#      key-level fuzzy self-join is quadratic in the hottest
#      duplicate group; the dictionary of distinct names is tiny by
#      comparison and the corpus itself never self-joins.
#   2. Length-band EQUI-join: ed(a,b) <= k implies
#      |len(a)-len(b)| <= k, so banding lengths into width-(k+1)
#      buckets and exploding the probe side to its 3 neighbor bands
#      finds every true pair (recall 1) while strings whose lengths
#      differ by > 2k+1 can never meet the join.
#   3. Shared-q-gram count prefilter (Gravano et al., VLDB 2001):
#      one edit destroys at most q q-grams, so ed(a,b) <= k implies
#      multiset-shared-grams >= max(len)-q+1-k*q.  Applied with the
#      bound clamped at 0 (vacuous for short strings, never lossy).
#   4. levenshtein verify on the surviving candidates only.
#
# All joins are equi-joins (band, then name); there is no
# crossJoin / BNLJ anywhere in the plan.
# ---------------------------------------------------------------

def _grams(name_col, q: int):
    """Multiset of character q-grams of a string column (empty for
    strings shorter than q)."""
    n = F.length(name_col)
    return F.when(
        n >= q,
        F.transform(
            F.sequence(F.lit(1), n - (q - 1)),
            lambda i: name_col.substr(i, F.lit(q)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def fuzzy_candidates_from(names: DataFrame, k: int, q: int) -> DataFrame:
    """Candidate pairs (na, nb, la, lb) of a 1-column `name`
    relation that survive the length-band equi-join and the
    q-gram count filter; na < nb.  Recall 1 for ed <= k."""
    prof = names.select(
        F.col("name"),
        F.length("name").alias("len"),
        _grams(F.col("name"), q).alias("grams"),
        (F.floor(F.length("name") / (k + 1))).cast("int").alias("band"),
    )
    build = prof.select(
        F.col("name").alias("na"),
        F.col("len").alias("la"),
        F.col("grams").alias("ga"),
        F.col("band").alias("jband"),
    )
    probe = prof.select(
        F.col("name").alias("nb"),
        F.col("len").alias("lb"),
        F.col("grams").alias("gb"),
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("jband"),
    )
    # multiset intersection: sum over distinct grams of
    # min(count_a, count_b) — built-ins only, stays in codegen
    common = F.aggregate(
        F.array_distinct(F.col("ga")),
        F.lit(0),
        lambda acc, g: acc
        + F.least(
            F.size(F.filter(F.col("ga"), lambda x: x == g)),
            F.size(F.filter(F.col("gb"), lambda x: x == g)),
        ),
    )
    gram_bound = F.greatest(
        F.greatest(F.col("la"), F.col("lb")) - (q - 1) - k * q, F.lit(0)
    )
    return (
        build.join(probe, "jband")
        .where(F.col("na") < F.col("nb"))
        .where(F.abs(F.col("la") - F.col("lb")) <= k)
        .where(common >= gram_bound)
        .select("na", "nb", "la", "lb")
    )


def fuzzy_name_pairs(names: DataFrame, k: int, q: int) -> DataFrame:
    """Verified distinct-name pairs within edit distance k:
    candidates -> levenshtein verify."""
    return (
        fuzzy_candidates_from(names, k, q)
        .withColumn("dist", F.levenshtein("na", "nb"))
        .where(F.col("dist") <= k)
        .select("na", "nb", F.col("dist").cast("int").alias("dist"))
    )


def fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-level fuzzy self-match of part names (dist <= 12 over
    p_partkey <= 200), rebuilt candidate-first: fuzzy-match the
    DISTINCT name dictionary, then map verified name pairs back to
    keys with two name equi-joins; same-name key pairs (dist 0)
    come from one name equi self-join.  Output identical to the
    brute-force oracle; plan has no BNLJ."""
    k = 12
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_partkey") <= 200)
        .select("p_partkey", "p_name")
    )
    names = p.select(F.col("p_name").alias("name")).distinct()
    verified = fuzzy_name_pairs(names, k=k, q=3)
    ka = p.select(F.col("p_partkey").alias("ka"), F.col("p_name").alias("na"))
    kb = p.select(F.col("p_partkey").alias("kb"), F.col("p_name").alias("nb"))
    cross_name = (
        verified.join(ka, "na")
        .join(kb, "nb")
        .select(
            F.least("ka", "kb").alias("pk_a"),
            F.greatest("ka", "kb").alias("pk_b"),
            "dist",
        )
    )
    same_name = (
        ka.join(kb, F.col("na") == F.col("nb"))
        .where(F.col("ka") < F.col("kb"))
        .select(
            F.col("ka").alias("pk_a"),
            F.col("kb").alias("pk_b"),
            F.lit(0).cast("int").alias("dist"),
        )
    )
    return cross_name.unionByName(same_name).orderBy("pk_a", "pk_b")


FUZZY_LEV_ORACLE = """
SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM part a, part b
WHERE a.p_partkey <= 200 AND b.p_partkey <= 200
  AND a.p_partkey < b.p_partkey
  AND levenshtein(a.p_name, b.p_name) <= 12
ORDER BY pk_a, pk_b
"""


def fuzzy_join_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-level fuzzy join at a DISCRIMINATING threshold
    (dist <= 2, q=2) over ALL parts — no key cap: the distinct-name
    dictionary bounds the work, so the corpus size only enters
    through the distinct + count aggregation.  Reports each fuzzy
    name pair with its occurrence counts."""
    p = load_table(spark, sf_dir, "part").select("p_name")
    names = p.groupBy(F.col("p_name").alias("name")).agg(
        F.count("*").alias("n_parts")
    )
    pairs = fuzzy_name_pairs(names.select("name"), k=2, q=2)
    ca = names.select(F.col("name").alias("na"), F.col("n_parts").alias("n_a"))
    cb = names.select(F.col("name").alias("nb"), F.col("n_parts").alias("n_b"))
    return (
        pairs.join(ca, "na")
        .join(cb, "nb")
        .select("na", "nb", "dist", "n_a", "n_b")
        .orderBy("na", "nb")
    )


FUZZY_JOIN_NAMES_ORACLE = """
WITH names AS (
  SELECT p_name AS name, count(*) AS n_parts FROM part GROUP BY p_name
)
SELECT a.name AS na, b.name AS nb,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist,
       a.n_parts AS n_a, b.n_parts AS n_b
FROM names a, names b
WHERE a.name < b.name AND levenshtein(a.name, b.name) <= 2
ORDER BY na, nb
"""


# ---------------------------------------------------------------
# Jaro-Winkler scoring of the fuzzy candidates — a SECOND string-
# similarity metric, cross-validated against an INDEPENDENT
# implementation: the Spark side is a from-scratch vectorized
# pandas UDF, the oracle is DuckDB's built-in
# jaro_winkler_similarity (differentially tested to exact 1e-6-
# quantized agreement on 5000 random pairs before wiring).  The
# candidate set is the recall-1 levenshtein pipeline (JW itself is
# not edit-bounded, so it rides as a SCORER on the lev<=3 pairs,
# never as the pruner).
# ---------------------------------------------------------------

def _jaro_winkler_py(a: str, b: str) -> float:
    """Standard Jaro-Winkler (match window floor(max/2)-1, half
    transpositions, prefix boost l<=4, p=0.1, boost threshold 0.7;
    empty-side similarity 0.0 — DuckDB's convention)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        for j in range(max(0, i - window), min(lb, i + window + 1)):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return jaro + l * 0.1 * (1.0 - jaro)


def fuzzy_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler similarity (quantized to 1e-6 so both engines'
    doubles hash identically) over the lev<=3 candidate pairs of
    the distinct part-name dictionary."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler_py(x, y) for x, y in zip(a, b)],
            dtype="float64",
        )

    names = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    pairs = fuzzy_name_pairs(names, k=3, q=2)
    return (
        pairs.select(
            "na",
            "nb",
            "dist",
            F.floor(jw("na", "nb") * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("jw_micro"),
        )
        .orderBy("na", "nb")
    )


FUZZY_JARO_WINKLER_ORACLE = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS na, b.name AS nb,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist,
       CAST(floor(jaro_winkler_similarity(a.name, b.name) * 1000000
                  + 0.5) AS BIGINT) AS jw_micro
FROM names a, names b
WHERE a.name < b.name AND levenshtein(a.name, b.name) <= 3
ORDER BY na, nb
"""


# ---------------------------------------------------------------
# mode() and median() aggregates.
# ---------------------------------------------------------------
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_linestatus")
        .agg(
            F.mode("l_quantity").alias("mode_qty"),
            F.median("l_quantity").alias("median_qty"),
            F.count("*").alias("n"),
        )
        .orderBy("l_linestatus")
    )


AGG_MODE_MEDIAN_ORACLE = """
SELECT l_linestatus,
       mode(l_quantity) AS mode_qty,
       median(l_quantity) AS median_qty,
       count(*) AS n
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


register("hof_array_funcs", hof_array_funcs, HOF_ARRAY_ORACLE)
register("agg_collect_lists", agg_collect_lists, AGG_COLLECT_ORACLE)
register("agg_corr_moments", agg_corr_moments, AGG_CORR_ORACLE)
register("try_arithmetic", try_arithmetic, TRY_ARITH_ORACLE)
register("fuzzy_levenshtein", fuzzy_levenshtein, FUZZY_LEV_ORACLE)
register("fuzzy_join_names", fuzzy_join_names, FUZZY_JOIN_NAMES_ORACLE)
register("fuzzy_jaro_winkler", fuzzy_jaro_winkler, FUZZY_JARO_WINKLER_ORACLE)
register("agg_mode_median", agg_mode_median, AGG_MODE_MEDIAN_ORACLE)
