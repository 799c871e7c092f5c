"""Relational operator surface over the TPC-H-ish fixtures
(SURVEY.md §2.2: filters, projections, joins of every flavor,
aggregations, sorts, top-k, set ops, scalar functions).

The reference has none of these (grep-confirmed, SURVEY §2.2); they
are the north-star generalization of its batch dataflow engine.

Scale notes applied throughout:
- dimension joins (region/nation/supplier/part) use F.broadcast —
  no shuffle of the fact side;
- fact-fact joins (orders x lineitem) shuffle on the join key and
  rely on AQE for skew handling;
- double aggregates use functions.stable (quantize-then-sum):
  order-independent exact integer sums, identical across engines
  and across any partitioning/AQE re-plan — per-row scalar float
  math is left raw (IEEE ops are deterministic and engine-
  identical);
- every DuckDB oracle casts integer sums to BIGINT (DuckDB widens
  to HUGEINT; Spark stays at LongType).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import duck_qavg, duck_qsum, qavg, qint, qsum
from ..io import load_table
from ..registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------
# Q1-style pricing summary: filter + groupBy + multi-agg + sort.
# Plan at scale: parquet scan with pushed l_shipdate filter ->
# partial HashAggregate (6 groups) -> tiny shuffle -> final agg.
# ---------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qsum("l_quantity", 2).alias("sum_qty"),
            qsum("l_extendedprice", 2).alias("sum_base_price"),
            qsum(disc_price, 4).alias("sum_disc_price"),
            qsum(charge, 4).alias("sum_charge"),
            qavg("l_quantity", 2).alias("avg_qty"),
            qavg("l_extendedprice", 2).alias("avg_price"),
            qavg("l_discount", 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"

Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {duck_qsum('l_quantity', 2)}      AS sum_qty,
       {duck_qsum('l_extendedprice', 2)} AS sum_base_price,
       {duck_qsum(_DISC_PRICE, 4)}       AS sum_disc_price,
       {duck_qsum(_CHARGE, 4)}           AS sum_charge,
       {duck_qavg('l_quantity', 2)}      AS avg_qty,
       {duck_qavg('l_extendedprice', 2)} AS avg_price,
       {duck_qavg('l_discount', 4)}      AS avg_disc,
       count(*)                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------
# Q3-style: 3-way join (customer x orders x lineitem) + agg + top-k.
# customer side is filtered then broadcast; orders x lineitem is the
# shuffled fact join.
# ---------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer is sf-proportional: no explicit broadcast hint —
        # the optimizer auto-broadcasts it below the threshold and
        # falls back to a shuffle join beyond (100x-safe); hints are
        # reserved for bounded-by-construction frames (nation/region/
        # tiny aggregates).  test_broadcast_fallback_equivalence pins
        # this degradation path.
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(qsum(disc_price, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_ORACLE = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {duck_qsum(_DISC_PRICE, 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------
# Q5-style: 6-table star join, revenue per nation within a region.
# region/nation hinted broadcast (bounded dims); supplier/customer
# hint-free (sf-proportional — auto-broadcast at small SF only);
# orders->lineitem shuffled.
# ---------------------------------------------------------------
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("n_name"))
        .agg(qsum(disc_price, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


Q5_ORACLE = f"""
SELECT n_name, {duck_qsum(_DISC_PRICE, 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# ---------------------------------------------------------------
# Filter + projection + math scalar functions (no shuffle at all:
# pure map-side pipeline; predicate pushed to parquet).  Scalar
# float math left raw — IEEE ops are engine-identical.
# ---------------------------------------------------------------
def filter_project_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_quantity") > 45)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_returnflag") != "N")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "net_price"
            ),
            F.sqrt(F.col("l_quantity")).alias("qty_sqrt"),
            F.abs(F.col("l_discount") - 0.05).cast("double").alias("disc_dev"),
            F.ceil(F.col("l_tax") * 100).cast("bigint").alias("tax_pct_ceil"),
            F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_decile"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


FILTER_PROJECT_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount)     AS net_price,
       sqrt(l_quantity)                       AS qty_sqrt,
       abs(l_discount - 0.05)                 AS disc_dev,
       CAST(ceil(l_tax * 100) AS BIGINT)      AS tax_pct_ceil,
       CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile
FROM lineitem
WHERE l_quantity > 45 AND l_discount >= 0.05 AND l_returnflag <> 'N'
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------
# Broadcast dim-chain join: customers per region (two broadcast
# hash joins, zero shuffle of the customer side until the 5-group
# aggregate).
# ---------------------------------------------------------------
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(r.r_name.alias("r_name"))
        .agg(
            F.count("*").alias("n_customers"),
            qsum("c_acctbal", 2).alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


JOIN_BROADCAST_DIMS_ORACLE = f"""
SELECT r_name, count(*) AS n_customers,
       {duck_qsum('c_acctbal', 2)} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


# ---------------------------------------------------------------
# Semi / anti joins (existence tests — no fact-side duplication).
# ---------------------------------------------------------------
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
ORDER BY c_custkey
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
ORDER BY c_custkey
"""


# ---------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
# match each other instead of vanishing — the semantic needed when
# joining on optional attributes.  Aggregate-then-join keeps the
# null bucket a single row (no null-key fan-out at scale).
# ---------------------------------------------------------------
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    ek = F.nullif(F.col("event_id") % 7, F.lit(0))
    ok = F.nullif(F.col("o_orderkey") % 7, F.lit(0))
    a = e.groupBy(ek.alias("k")).agg(F.count("*").alias("n_events"))
    b = o.groupBy(ok.alias("k")).agg(F.count("*").alias("n_orders"))
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(a["k"].alias("k"), "n_events", "n_orders")
        .orderBy(F.col("k").asc_nulls_first())
    )


JOIN_NULL_SAFE_ORACLE = """
WITH a AS (
  SELECT nullif(event_id % 7, 0) AS k, count(*) AS n_events
  FROM events GROUP BY 1
),
b AS (
  SELECT nullif(o_orderkey % 7, 0) AS k, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT a.k, n_events, n_orders
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
ORDER BY a.k ASC NULLS FIRST
"""


# ---------------------------------------------------------------
# Outer join with null-handling (parts never ordered get count 0).
# ---------------------------------------------------------------
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48)
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left")
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.count("l_orderkey").alias("n_bulk_lines"),
            (
                F.coalesce(F.sum(qint("l_quantity", 2)), F.lit(0))
                / F.lit(100.0)
            ).alias("bulk_qty"),
        )
        .orderBy("p_partkey")
    )


JOIN_OUTER_ORACLE = f"""
SELECT p_partkey, p_brand,
       count(l_orderkey) AS n_bulk_lines,
       (coalesce(CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
                      AS BIGINT), 0) / 100.0) AS bulk_qty
FROM part
LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 48) l
       ON p_partkey = l_partkey
GROUP BY p_partkey, p_brand
ORDER BY p_partkey
"""


# ---------------------------------------------------------------
# Equi + range (theta) join: lineitems shipped within 30 days of
# the order date.  The equi key keeps it a hash/sort-merge join;
# the range predicate is a post-join filter — NOT a nested-loop.
# ---------------------------------------------------------------
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (
                F.col("l_shipdate")
                < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            )
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("fast_lines"))
        .orderBy("o_orderpriority")
    )


JOIN_RANGE_ORACLE = """
SELECT o_orderpriority, count(*) AS fast_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <  o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------
# Top-k by sort (TakeOrderedAndProject: per-partition top-k, then
# single merge of k-element heaps — no global sort at scale).
# ---------------------------------------------------------------
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
    )


TOPK_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 15
"""


# ---------------------------------------------------------------
# Set operations.
# ---------------------------------------------------------------
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    hi_bal = c.where(F.col("c_acctbal") > 9000).select("c_custkey")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return hi_bal.unionByName(building).distinct().orderBy("c_custkey")


SETOP_UNION_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    y96 = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.where(F.year("o_orderdate") == 1997).select("o_custkey")
    return y96.intersect(y97).orderBy("o_custkey")


SETOP_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
ORDER BY o_custkey
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    ).select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o.distinct()).orderBy("c_custkey")


SETOP_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer
EXCEPT ALL
SELECT DISTINCT o_custkey AS c_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
ORDER BY c_custkey
"""


# ---------------------------------------------------------------
# Distinct + multi-column distinct aggregation.
# ---------------------------------------------------------------
def distinct_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select("p_brand", "p_type").distinct().orderBy("p_brand", "p_type")


DISTINCT_PART_TYPES_ORACLE = """
SELECT DISTINCT p_brand, p_type FROM part ORDER BY p_brand, p_type
"""


def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_lines"),
    ).orderBy("l_returnflag")


AGG_DISTINCT_COUNTS_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*)                  AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------
# Statistical aggregates (variance family).  min/max are exact;
# mean via stable sums; stddev is DERIVED from exact integer power
# sums (cents in decimal(38,0) / HUGEINT) instead of the engines'
# native stddev_samp: prices are 2dp-exact, so the sums are
# bit-identical across engines and the final double arithmetic is
# the same IEEE sequence — no summation-order noise, no quantize-
# boundary flakiness at any scale factor.
# ---------------------------------------------------------------
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("decimal(38,0)")
    grouped = o.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        qavg("o_totalprice", 2).alias("avg_price"),
        F.sum(cents).alias("_s1"),
        F.sum(cents * cents).alias("_s2"),
        F.count("*").alias("n"),
    )
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    nd = F.col("n").cast("double")
    sd_cents = F.sqrt((s2 - s1 * s1 / nd) / (nd - 1))
    return (
        grouped.select(
            "o_orderstatus",
            "min_price",
            "max_price",
            "avg_price",
            (F.floor(sd_cents / 100.0 * 100 + 0.5) / 100.0).alias("sd_price"),
            "n",
        )
        .orderBy("o_orderstatus")
    )


AGG_STATS_ORACLE = f"""
WITH g AS (
  SELECT o_orderstatus,
         min(o_totalprice) AS min_price,
         max(o_totalprice) AS max_price,
         {duck_qavg('o_totalprice', 2)} AS avg_price,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT)
                  * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS s2,
         count(*) AS n
  FROM orders
  GROUP BY o_orderstatus
)
SELECT o_orderstatus, min_price, max_price, avg_price,
       (floor(sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1)) / 100.0 * 100 + 0.5)
        / 100.0) AS sd_price,
       n
FROM g
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------
# String scalar functions.
# ---------------------------------------------------------------
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.where(F.col("p_size") <= 5)
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias(
                "type_snake"
            ),
            F.reverse(F.col("p_brand")).alias("brand_rev"),
            F.trim(F.col("p_name")).alias("name_trim"),
        )
        .orderBy("p_partkey")
    )


STRING_FUNCS_ORACLE = """
SELECT p_partkey,
       upper(p_name)                  AS name_upper,
       CAST(length(p_name) AS INTEGER) AS name_len,
       substring(p_name, 1, 8)        AS name_prefix,
       concat_ws('|', p_brand, p_type) AS brand_type,
       replace(p_type, ' ', '_')      AS type_snake,
       reverse(p_brand)               AS brand_rev,
       trim(p_name)                   AS name_trim
FROM part
WHERE p_size <= 5
ORDER BY p_partkey
"""


# ---------------------------------------------------------------
# Date/time scalar functions + monthly aggregation.
# ---------------------------------------------------------------
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            qsum("o_totalprice", 2).alias("month_total"),
        )
        .orderBy("yr", "mo")
    )


DATE_FUNCS_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       count(*) AS n_orders,
       {duck_qsum('o_totalprice', 2)} AS month_total
FROM orders
GROUP BY 1, 2
ORDER BY yr, mo
"""


def date_trunc_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc + date_diff arithmetic on timestamps."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.datediff(
                F.to_timestamp(F.lit("2002-01-01")), F.col("o_orderdate")
            ).cast("int").alias("days_to_2002"),
            F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        )
        .where(F.col("o_orderkey") <= 2000)
        .orderBy("o_orderkey")
    )


DATE_TRUNC_MONTH_ORACLE = """
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER)
           AS days_to_2002,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
FROM orders
WHERE o_orderkey <= 2000
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------
# CASE WHEN bucketing.
# ---------------------------------------------------------------
def case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count("*").alias("n"),
            qavg("o_totalprice", 2).alias("avg_price"),
        )
        .orderBy("price_bucket")
    )


CASE_BUCKETS_ORACLE = f"""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       count(*) AS n,
       {duck_qavg('o_totalprice', 2)} AS avg_price
FROM orders
GROUP BY 1
ORDER BY price_bucket
"""


# ---------------------------------------------------------------
# Correlated scalar subquery (decorrelated by Catalyst into a
# join).  The per-customer mean uses the stable pattern so the
# boundary comparison is engine-identical.
# ---------------------------------------------------------------
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cust_avg = o.groupBy("o_custkey").agg(
        qavg("o_totalprice", 2).alias("cust_avg")
    )
    return (
        o.join(cust_avg, "o_custkey")
        .where(F.col("o_totalprice") > F.col("cust_avg") * 1.5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


SUBQUERY_ABOVE_AVG_ORACLE = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o1
JOIN (SELECT o_custkey AS ck, {duck_qavg('o_totalprice', 2)} AS cust_avg
      FROM orders GROUP BY 1) a
  ON o1.o_custkey = a.ck
WHERE o_totalprice > cust_avg * 1.5
ORDER BY o_orderkey
"""


register("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE)
register("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE)
register("q5_regional_revenue", q5_regional_revenue, Q5_ORACLE)
register("filter_project_math", filter_project_math, FILTER_PROJECT_MATH_ORACLE)
register("join_broadcast_dims", join_broadcast_dims, JOIN_BROADCAST_DIMS_ORACLE)
register("join_semi", join_semi, JOIN_SEMI_ORACLE)
register("join_anti", join_anti, JOIN_ANTI_ORACLE)
register("join_null_safe", join_null_safe, JOIN_NULL_SAFE_ORACLE)
register("join_outer", join_outer, JOIN_OUTER_ORACLE)
register("join_range", join_range, JOIN_RANGE_ORACLE)
register("topk_orders", topk_orders, TOPK_ORDERS_ORACLE)
register("setop_union", setop_union, SETOP_UNION_ORACLE)
register("setop_intersect", setop_intersect, SETOP_INTERSECT_ORACLE)
register("setop_except", setop_except, SETOP_EXCEPT_ORACLE)
register("distinct_part_types", distinct_part_types, DISTINCT_PART_TYPES_ORACLE)
register("agg_distinct_counts", agg_distinct_counts, AGG_DISTINCT_COUNTS_ORACLE)
register("agg_stats", agg_stats, AGG_STATS_ORACLE)
register("string_funcs", string_funcs, STRING_FUNCS_ORACLE)
register("date_funcs", date_funcs, DATE_FUNCS_ORACLE)
register("date_trunc_month", date_trunc_month, DATE_TRUNC_MONTH_ORACLE)
register("case_buckets", case_buckets, CASE_BUCKETS_ORACLE)
register("subquery_above_avg", subquery_above_avg, SUBQUERY_ABOVE_AVG_ORACLE)
