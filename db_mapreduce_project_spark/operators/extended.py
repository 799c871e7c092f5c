"""Extended operator coverage: pivot/unpivot, regexp functions,
conditional functions, map functions, array set operations,
arg-max aggregates, percentiles, approximate distinct, sampling,
the spark.sql textual surface, and bitwise ops — the remaining
rows of SURVEY.md §2.2's category sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, register_temp_views
from ..registry import register


# ---------------------------------------------------------------
# PIVOT: long -> wide conditional aggregation.  Values enumerated
# explicitly so the plan needs no discovery pass over the data.
# ---------------------------------------------------------------
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
        .orderBy("o_orderpriority")
    )


PIVOT_STATUS_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------
# UNPIVOT (melt): wide -> long.
# ---------------------------------------------------------------
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return (
        wide.unpivot(
            "p_partkey", ["retailprice", "size"], "metric", "value"
        )
        .orderBy("p_partkey", "metric")
    )


UNPIVOT_PART_METRICS_ORACLE = """
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
UNION ALL
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
ORDER BY p_partkey, metric
"""


# ---------------------------------------------------------------
# Regexp scalar functions.
# ---------------------------------------------------------------
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.where(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
            F.regexp_count("p_name", F.lit(r"[aeiou]")).cast("int").alias(
                "n_vowels"
            ),
            F.col("p_type").rlike("BRUSHED").alias("is_brushed"),
            F.regexp_replace("p_name", r"\d", "#").alias("masked"),
        )
        .orderBy("p_partkey")
    )


REGEX_FUNCS_ORACLE = """
SELECT p_partkey,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels,
       regexp_matches(p_type, 'BRUSHED') AS is_brushed,
       regexp_replace(p_name, '\\d', '#', 'g') AS masked
FROM part
WHERE p_partkey <= 500
ORDER BY p_partkey
"""


# ---------------------------------------------------------------
# Conditional scalar functions.
# ---------------------------------------------------------------
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_orderkey") <= 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.greatest("l_discount", "l_tax").alias("max_rate"),
            F.least("l_discount", "l_tax").alias("min_rate"),
            F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
            F.coalesce(
                F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)
            ).alias("disc_or_neg1"),
            F.when(F.col("l_returnflag") == "N", None)
            .otherwise(F.col("l_returnflag"))
            .alias("flag_nulled"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


CONDITIONAL_FUNCS_ORACLE = """
SELECT l_orderkey, l_linenumber,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax)    AS min_rate,
       nullif(l_discount, 0.0)     AS disc_or_null,
       coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg1,
       CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END
           AS flag_nulled
FROM lineitem
WHERE l_orderkey <= 300
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------
# Map functions: build, introspect, extract (output kept scalar so
# the oracle stays engine-neutral).
# ---------------------------------------------------------------
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return (
        p.where(F.col("p_partkey") <= 300)
        .select(
            "p_partkey",
            F.element_at(m, "brand").alias("from_map_brand"),
            F.size(m).alias("map_size"),
            F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
            F.map_contains_key(m, "type").alias("has_type"),
        )
        .orderBy("p_partkey")
    )


MAP_FUNCS_ORACLE = """
SELECT p_partkey,
       p_brand AS from_map_brand,
       CAST(2 AS INTEGER) AS map_size,
       'brand,type' AS keys_sorted,
       true AS has_type
FROM part
WHERE p_partkey <= 300
ORDER BY p_partkey
"""


# ---------------------------------------------------------------
# Array set operations (outputs sorted -> order-independent).
# ---------------------------------------------------------------
def array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    # bigint arrays so driver-side value canon agrees with DuckDB's
    # int64 lists (F.sequence over int literals yields array<int>)
    a = F.sequence(F.lit(1), F.col("p_size") % 8 + 3).cast("array<bigint>")
    b = F.sequence(F.lit(2), F.lit(6)).cast("array<bigint>")
    # set-op results are serialized to comma-joined strings: flat
    # strings stay hashable for any external row comparator
    j = lambda c: F.array_join(c.cast("array<string>"), ",")  # noqa: E731
    return (
        p.where(F.col("p_partkey") <= 300)
        .select(
            "p_partkey",
            j(F.sort_array(F.array_intersect(a, b))).alias("inter"),
            j(F.sort_array(F.array_union(a, b))).alias("uni"),
            j(F.sort_array(F.array_except(a, b))).alias("exc"),
            F.array_contains(a, 5).alias("has5"),
            F.size(F.array_distinct(F.concat(a, b))).alias("n_distinct"),
        )
        .orderBy("p_partkey")
    )


ARRAY_SETOPS_ORACLE = """
WITH base AS (
  SELECT p_partkey,
         generate_series(1, p_size % 8 + 3) AS a,
         generate_series(2, 6) AS b
  FROM part WHERE p_partkey <= 300
)
SELECT p_partkey,
       array_to_string(list_sort(list_intersect(a, b)), ',') AS inter,
       array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS uni,
       array_to_string(
         list_sort(list_filter(list_distinct(a), x -> NOT list_contains(b, x))),
         ',') AS exc,
       list_contains(a, 5) AS has5,
       CAST(len(list_distinct(list_concat(a, b))) AS INTEGER) AS n_distinct
FROM base
ORDER BY p_partkey
"""


# ---------------------------------------------------------------
# arg-max/arg-min aggregates (deterministic: ranking key o_orderkey
# is unique).
# ---------------------------------------------------------------
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderpriority", "o_orderkey").alias("latest_prio"),
            F.min_by("o_orderpriority", "o_orderkey").alias("earliest_prio"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderstatus")
    )


AGG_ARGMAX_ORACLE = """
SELECT o_orderstatus,
       arg_max(o_orderpriority, o_orderkey) AS latest_prio,
       arg_min(o_orderpriority, o_orderkey) AS earliest_prio,
       max(o_orderkey) AS max_key
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------
# Percentiles (exact, interpolated).
# ---------------------------------------------------------------
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("p50"),
            F.percentile("o_totalprice", 0.9).alias("p90"),
            F.min("o_totalprice").alias("p0"),
            F.max("o_totalprice").alias("p100"),
        )
        .orderBy("o_orderstatus")
    )


AGG_PERCENTILES_ORACLE = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       min(o_totalprice) AS p0,
       max(o_totalprice) AS p100
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------
# Approximate distinct (HLL) — engine-specific estimate: rows-only
# driver check; tests assert <5% error vs exact.
# ---------------------------------------------------------------
def approx_distinct_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import words

    d = load_table(spark, sf_dir, "documents")
    w = words(d, "text")
    return w.agg(
        F.approx_count_distinct("word").alias("approx_words"),
        F.countDistinct("word").alias("exact_words"),
    )


# ---------------------------------------------------------------
# Exact distinct-count twin of the HLL sketch above: same shape
# (count-distinct tokens, grouped), fully oracle-checkable, so the
# capability has a value-hash-verified row next to the estimate.
# ---------------------------------------------------------------
def distinct_words_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+", -1)).alias("word"),
    ).where(F.col("word") != "")
    return (
        toks.groupBy("lang")
        .agg(
            F.countDistinct("word").alias("n_distinct_words"),
            F.count("*").alias("n_tokens"),
        )
        .orderBy("lang")
    )


DISTINCT_WORDS_BY_LANG_ORACLE = """
SELECT lang,
       count(DISTINCT word) AS n_distinct_words,
       count(*) AS n_tokens
FROM (
  SELECT lang,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
  FROM documents
) t
WHERE word <> ''
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------
# Deterministic sampling via a portable multiplicative hash of the
# row key: pmod(key-hash, 1000) < 100 is a reproducible 10% sample
# that ANY engine computes identically (no RNG, no seed drift), so
# the sample itself is oracle-checkable.  At scale this is a
# map-side filter — no shuffle, prunes before any downstream work —
# and the same predicate selects the same rows on re-runs,
# backfills, and other engines (the property that matters for
# training-data reproducibility).  Knuth multiplicative hashing;
# key reduced mod 1e9 first so the product stays under 2^63.
# ---------------------------------------------------------------
_KNUTH = 2654435761  # 2^32 * golden ratio conjugate


def _keyhash_spark(key, mixin):
    return F.pmod((key % 1_000_000_000) * F.lit(_KNUTH) + mixin, F.lit(1000))


def sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    bucket = _keyhash_spark(F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        l.where(bucket < 100)
        .agg(
            F.count("*").alias("n_sampled"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


SAMPLE_LINEITEM_ORACLE = f"""
SELECT count(*) AS n_sampled,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
WHERE ((l_orderkey % 1000000000) * {_KNUTH} + l_linenumber) % 1000 < 100
"""


# ---------------------------------------------------------------
# The textual SQL surface: same engine, spark.sql entry point
# (CTE + join + agg through the parser/analyzer).
# ---------------------------------------------------------------
def sql_api_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        WITH seg AS (
          SELECT c_custkey, c_mktsegment FROM customer
        )
        SELECT s.c_mktsegment AS segment,
               count(*) AS n_orders,
               (CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                     AS DOUBLE) / 100.0) AS revenue
        FROM orders o JOIN seg s ON o.o_custkey = s.c_custkey
        GROUP BY s.c_mktsegment
        ORDER BY segment
        """
    )


SQL_API_REVENUE_ORACLE = """
SELECT c_mktsegment AS segment,
       count(*) AS n_orders,
       (CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
             AS DOUBLE) / 100.0) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY segment
"""


# ---------------------------------------------------------------
# Bitwise operations.
# ---------------------------------------------------------------
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.where(F.col("event_id") < 500)
        .select(
            "event_id",
            (F.col("event_id").bitwiseAND(F.lit(255))).alias("low_byte"),
            (F.col("event_id").bitwiseXOR(F.col("user_id"))).alias("xored"),
            F.shiftleft("event_id", 2).alias("shl2"),
            F.shiftright("event_id", 3).alias("shr3"),
        )
        .orderBy("event_id")
    )


BITWISE_FUNCS_ORACLE = """
SELECT event_id,
       event_id & 255 AS low_byte,
       xor(event_id, user_id) AS xored,
       event_id << 2 AS shl2,
       event_id >> 3 AS shr3
FROM events
WHERE event_id < 500
ORDER BY event_id
"""


register("pivot_status", pivot_status, PIVOT_STATUS_ORACLE)
register("unpivot_part_metrics", unpivot_part_metrics, UNPIVOT_PART_METRICS_ORACLE)
register("regex_funcs", regex_funcs, REGEX_FUNCS_ORACLE)
register("conditional_funcs", conditional_funcs, CONDITIONAL_FUNCS_ORACLE)
register("map_funcs", map_funcs, MAP_FUNCS_ORACLE)
register("array_setops", array_setops, ARRAY_SETOPS_ORACLE)
register("agg_argmax", agg_argmax, AGG_ARGMAX_ORACLE)
register("agg_percentiles", agg_percentiles, AGG_PERCENTILES_ORACLE)
register("approx_distinct_words", approx_distinct_words)  # rows-only (HLL)
register(
    "distinct_words_by_lang", distinct_words_by_lang, DISTINCT_WORDS_BY_LANG_ORACLE
)
register("sample_lineitem", sample_lineitem, SAMPLE_LINEITEM_ORACLE)
register("sql_api_revenue", sql_api_revenue, SQL_API_REVENUE_ORACLE)
register("bitwise_funcs", bitwise_funcs, BITWISE_FUNCS_ORACLE)


# ---------------------------------------------------------------
# SQL subquery surface through the parser: EXISTS, IN, and a scalar
# subquery in one statement (Catalyst decorrelates all three).
# ---------------------------------------------------------------
def sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 300000.0
              )
          AND c_nationkey IN (
                SELECT n_nationkey FROM nation WHERE n_regionkey <= 2
              )
          AND c_acctbal > (SELECT avg(0.0) FROM region)
        ORDER BY c_custkey
        """
    )


SQL_SUBQUERIES_ORACLE = """
SELECT c_custkey, c_acctbal
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > 300000.0
      )
  AND c_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey <= 2
      )
  AND c_acctbal > (SELECT avg(0.0) FROM region)
ORDER BY c_custkey
"""


register("sql_subqueries", sql_subqueries, SQL_SUBQUERIES_ORACLE)


# ---------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): calendar densification —
# a month spine joined to PRE-AGGREGATED facts so empty months
# appear with zero counts.  Aggregate-then-join is the scale shape:
# the fact table reduces map-side to #months rows before any join
# (a raw spine LEFT JOIN fact would force broadcasting the FACT
# side, since an outer join can only broadcast its non-preserved
# side).
# ---------------------------------------------------------------
def sql_recursive_month_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT CAST('1992-01-01' AS DATE)
          UNION ALL
          SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
          WHERE m < CAST('1998-12-01' AS DATE)
        ),
        per_month AS (
          SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS m,
                 count(*) AS n
          FROM orders
          GROUP BY 1
        )
        SELECT CAST(m AS TIMESTAMP) AS month_start,
               CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        FROM months LEFT JOIN per_month USING (m)
        ORDER BY month_start
        """
    )


SQL_RECURSIVE_MONTH_SERIES_ORACLE = """
WITH RECURSIVE months(m) AS (
  SELECT CAST('1992-01-01' AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < CAST('1998-12-01' AS DATE)
),
per_month AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         count(*) AS n
  FROM orders
  GROUP BY 1
)
SELECT CAST(m AS TIMESTAMP) AS month_start,
       CAST(coalesce(n, 0) AS BIGINT) AS n_orders
FROM months LEFT JOIN per_month USING (m)
ORDER BY month_start
"""


# ---------------------------------------------------------------
# Correlated LATERAL subquery with ORDER BY + LIMIT: per-group
# top-n through the SQL parser (Catalyst decorrelates to a ranked
# join — same plan family as the window formulation).
# ---------------------------------------------------------------
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, l.c_custkey, l.c_name, l.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_custkey, c_name, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
        ORDER BY n.n_name, l.c_acctbal DESC, l.c_custkey
        """
    )


SQL_LATERAL_TOPN_ORACLE = """
SELECT n.n_name, l.c_custkey, l.c_name, l.c_acctbal
FROM nation n,
LATERAL (SELECT c_custkey, c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
ORDER BY n.n_name, l.c_acctbal DESC, l.c_custkey
"""


register(
    "sql_recursive_month_series",
    sql_recursive_month_series,
    SQL_RECURSIVE_MONTH_SERIES_ORACLE,
)
register("sql_lateral_topn", sql_lateral_topn, SQL_LATERAL_TOPN_ORACLE)


# ---------------------------------------------------------------
# EXACT distinct counting via bitmap aggregation — the warehouse
# scale pattern: each (group, bucket) partially aggregates into a
# fixed-size bitmap map-side, so the shuffle carries bitmaps (one
# per 32k-id bucket), never raw ids; bitmap_count + sum closes.
# Exact (unlike HLL), so a plain count(DISTINCT) oracle applies.
# ---------------------------------------------------------------
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_users FROM (
          SELECT event_type, bitmap_bucket_number(user_id) AS bucket,
                 bitmap_count(
                   bitmap_construct_agg(bitmap_bit_position(user_id))
                 ) AS cnt
          FROM events GROUP BY 1, 2
        ) t
        GROUP BY event_type
        ORDER BY event_type
        """
    )


BITMAP_DISTINCT_USERS_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


register(
    "bitmap_distinct_users", bitmap_distinct_users, BITMAP_DISTINCT_USERS_ORACLE
)


def sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-stratum fraction) sampling — the
    training-data rebalancing primitive (e.g. downsample 'click',
    keep all 'purchase') — via the portable key hash: each stratum
    gets its own bucket threshold (click 10%, view 50%, purchase
    100%).  Deterministic and engine-independent, so the stratified
    sample is oracle-checkable (unlike RNG sampleBy).  Scale: a
    per-row map-side filter — no shuffle until the tiny summary
    agg."""
    e = load_table(spark, sf_dir, "events")
    bucket = _keyhash_spark(F.col("event_id"), F.lit(0))
    threshold = (
        F.when(F.col("event_type") == "click", 100)
        .when(F.col("event_type") == "view", 500)
        .when(F.col("event_type") == "purchase", 1000)
        .otherwise(0)  # unlisted strata are dropped entirely
    )
    return (
        e.where(bucket < threshold)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


SAMPLE_STRATIFIED_EVENTS_ORACLE = f"""
SELECT event_type, count(*) AS n
FROM events
WHERE ((event_id % 1000000000) * {_KNUTH}) % 1000 <
      CASE event_type WHEN 'click' THEN 100
                      WHEN 'view' THEN 500
                      WHEN 'purchase' THEN 1000
                      ELSE 0 END
GROUP BY event_type
ORDER BY event_type
"""


register(
    "sample_stratified_events",
    sample_stratified_events,
    SAMPLE_STRATIFIED_EVENTS_ORACLE,
)


def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + HAVING surface (Spark 3.4+/DuckDB shared
    dialect): grouping keys inferred from the non-aggregate select
    list — the ergonomic form analysts actually write; compiles to
    the identical partial+final hash aggregate."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT lang, source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY ALL
        HAVING count(*) > 3
        ORDER BY lang, source
        """
    )


SQL_GROUP_BY_ALL_ORACLE = """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY ALL
HAVING count(*) > 3
ORDER BY lang, source
"""

register("sql_group_by_all", sql_group_by_all, SQL_GROUP_BY_ALL_ORACLE)


def sample_weighted_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED Bernoulli sample: P(keep row) =
    quantity / max_quantity — size-biased sampling (the PPS pattern
    behind weighted corpus subsampling and sketch-based joins),
    with the keyed hash ring standing in for randomness so both
    engines agree row-for-row.

    keep iff bucket(key) * max_q < qty * 1000 — exact integers
    (quantities are integral; bucket < 1000).  The 1-row max
    broadcasts; the scan is never shuffled.  The audit output
    reports the realized size bias: kept rows' mean quantity should
    exceed the population mean."""
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint")
    bucket = _keyhash_spark(F.col("l_orderkey"), F.col("l_linenumber"))
    mx = l.agg(F.max(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint")).alias("max_q"))
    return (
        l.crossJoin(F.broadcast(mx))
        .select(
            qty.alias("qty"),
            bucket.alias("bucket"),
            F.col("max_q"),
        )
        .agg(
            F.count("*").alias("n_total"),
            F.sum(
                F.when(F.col("bucket") * F.col("max_q") < F.col("qty") * 1000, 1)
                .otherwise(0)
            ).alias("n_kept"),
            F.sum("qty").alias("qty_total"),
            F.sum(
                F.when(
                    F.col("bucket") * F.col("max_q") < F.col("qty") * 1000,
                    F.col("qty"),
                ).otherwise(0)
            ).alias("qty_kept"),
        )
    )


SAMPLE_WEIGHTED_LINEITEM_ORACLE = f"""
WITH mx AS (
  SELECT max(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS max_q FROM lineitem
),
t AS (
  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
         ((l_orderkey % 1000000000) * {_KNUTH} + l_linenumber) % 1000 AS bucket,
         max_q
  FROM lineitem, mx
)
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN bucket * max_q < qty * 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(qty) AS BIGINT) AS qty_total,
       CAST(sum(CASE WHEN bucket * max_q < qty * 1000 THEN qty ELSE 0 END) AS BIGINT) AS qty_kept
FROM t
"""

register(
    "sample_weighted_lineitem",
    sample_weighted_lineitem,
    SAMPLE_WEIGHTED_LINEITEM_ORACLE,
)


RESERVOIR_K = 10  # docs kept per language
_RESERVOIR_MOD = 1_000_003  # prime ring: rank ties are ~impossible


def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-K-per-group sampling (the "give me 10 random docs per
    language" primitive behind per-source eval-set carving and
    balanced corpus subsampling): rank each group by a portable key
    hash and keep the K lowest — distributionally a reservoir sample,
    but deterministic, so both engines pick the identical rows.

    Scale shape: one shuffle keyed on the group column feeds a
    partitioned window; nothing global.  For groups so large the
    per-group sort dominates, pre-filter with a generous hash
    threshold (keep hash < c*K/|group| overshoot) before the exact
    window — same answer, sort input cut to ~c*K rows per group;
    at fixture scale the direct window is already the right plan.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    hkey = F.pmod(
        (F.col("doc_id") % 1_000_000_000) * F.lit(_KNUTH) + F.lit(7),
        F.lit(_RESERVOIR_MOD),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("hkey").asc(), F.col("doc_id").asc()
    )
    return (
        d.select("lang", "doc_id", hkey.alias("hkey"))
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= RESERVOIR_K)
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    )


SAMPLE_RESERVOIR_PER_GROUP_ORACLE = f"""
SELECT lang, doc_id, rk FROM (
  SELECT lang, doc_id,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY ((doc_id % 1000000000) * {_KNUTH} + 7) % {_RESERVOIR_MOD},
                    doc_id) AS INTEGER) AS rk
  FROM documents
) t
WHERE rk <= {RESERVOIR_K}
ORDER BY lang, rk
"""

register(
    "sample_reservoir_per_group",
    sample_reservoir_per_group,
    SAMPLE_RESERVOIR_PER_GROUP_ORACLE,
)


# ---------------------------------------------------------------
# SQL-DEFINED functions (Spark 4 CREATE FUNCTION ... RETURN):
# a scalar SQL UDF and a SQL table function (RETURNS TABLE),
# both resolved by the analyzer and INLINED into the plan — the
# declarative alternative to Python UDFs: zero serialization
# boundary, full codegen, the right way to package reusable
# expression logic at 100 TB.  The table function drives a LATERAL
# join over documents (the tokenizer as a SQL-defined UDTF).
# ---------------------------------------------------------------
def sql_defined_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE
        RETURN p * (1.0 - d)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION doc_tokens(s STRING)
        RETURNS TABLE(tok STRING)
        RETURN SELECT explode(filter(
                 split(lower(regexp_replace(s, '[^a-zA-Z ]', '')), ' '),
                 t -> t != ''))
        """
    )
    return spark.sql(
        """
        WITH rev AS (
          SELECT l_returnflag,
                 CAST(sum(CAST(floor(disc_price(l_extendedprice, l_discount)
                                     * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                     AS rev_cents,
                 count(*) AS n_items
          FROM lineitem
          GROUP BY l_returnflag
        ),
        toks AS (
          SELECT count(*) AS n_tokens, count(DISTINCT t.tok) AS n_distinct
          FROM documents d, LATERAL doc_tokens(d.text) t
          WHERE d.doc_id < 100
        )
        SELECT r.l_returnflag, r.rev_cents, r.n_items,
               t.n_tokens, t.n_distinct
        FROM rev r CROSS JOIN toks t
        ORDER BY r.l_returnflag
        """
    )


SQL_DEFINED_FUNCTIONS_ORACLE = """
WITH rev AS (
  SELECT l_returnflag,
         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                             * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS rev_cents,
         count(*) AS n_items
  FROM lineitem
  GROUP BY l_returnflag
),
toks AS (
  SELECT count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
  FROM (
    SELECT unnest(list_filter(
             string_split(lower(regexp_replace(text, '[^a-zA-Z ]', '', 'g')),
                          ' '),
             t -> t <> '')) AS tok
    FROM documents WHERE doc_id < 100
  )
)
SELECT r.l_returnflag, r.rev_cents, r.n_items, t.n_tokens, t.n_distinct
FROM rev r CROSS JOIN toks t
ORDER BY r.l_returnflag
"""

register(
    "sql_defined_functions", sql_defined_functions, SQL_DEFINED_FUNCTIONS_ORACLE
)
