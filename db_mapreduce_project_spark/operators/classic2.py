"""Second batch of classic analytic query shapes (TPC-H Q4/Q13/
Q15/Q17/Q22 adapted to the fixture schema) plus a scalable as-of
join — the canonical "latest record at or before time t" temporal
operator the reference's batch engine (maprdeuce.cpp, word count
only) has no analogue for.

Scale notes (100 TB discipline):

* q4 is a semi join — Spark's LeftSemi never materializes lineitem
  payload columns past the join, and the date filter on orders is
  pushed into the parquet scan.
* q13 keeps the left-outer join on (c_custkey = o_custkey) as a
  single shuffle; the second aggregation (distribution of counts)
  is tiny by construction.
* q15 computes the revenue aggregate ONCE and reuses it for both
  the max and the final join: the scalar max is a 1-row broadcast,
  not a re-scan (TPC-H's VIEW is expressed as a shared subplan).
* q17's per-part average is an aggregate + shuffle join on
  l_partkey, never a correlated re-scan per row; the Brand filter
  broadcasts the surviving part keys.
* q22 anti-joins on o_custkey (shuffle, payload-free) and
  broadcasts the 1-row global average.
* join_asof uses the union + last(ignorenulls) window trick: ONE
  shuffle on the join key, no range-explosion.  A naive
  (e.ts >= o.date) theta join is O(|events| x |orders per user|);
  the union form is O(|events| + |orders|) log-sorted within each
  key partition — this is the form that survives 1000 executors.

All money aggregates quantize before summing (functions.stable) so
partial/final aggregation order never changes the answer and the
DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import duck_qavg, duck_qsum, qavg, qsum
from ..io import load_table
from ..registry import register

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order count per priority for orders in a
    quarter having at least one returned lineitem (EXISTS -> left
    semi join; the fixture lacks commitdate/receiptdate, so the
    inner predicate is l_returnflag = 'R').  Reference analogue:
    none (maprdeuce.cpp has no joins, SURVEY.md S2.2)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    left outer join so zero-order customers appear in the c_count=0
    bucket (the filtered join arm drops urgent orders, standing in
    for Q13's NOT LIKE comment filter)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly
    revenue.  The revenue aggregate is computed once; the global max
    is a 1-row broadcast joined back (quantized revenue makes the
    equality comparison exact in both engines)."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = l.groupBy("l_suppkey").agg(
        qsum(disc_price, 4).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = f"""
WITH revenue AS (
    SELECT l_suppkey, {duck_qsum(_DISC_PRICE, 4)} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-
    quantity orders for one brand went unfilled.  The correlated
    `l_quantity < 0.2 * avg(l_quantity per part)` becomes an
    aggregate on l_partkey joined back — one extra shuffle, no
    per-row re-scan.  The threshold is derived from a quantized sum
    so both engines compare against identical doubles."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#4")
    per_part = l.groupBy("l_partkey").agg(
        (qavg("l_quantity", 2) * F.lit(0.2)).alias("qty_threshold")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(per_part, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((qsum("l_extendedprice", 2) / F.lit(7.0)).alias("avg_yearly"))
    )


Q17_ORACLE = f"""
SELECT ({duck_qsum('l_extendedprice', 2)} / 7.0) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
    SELECT l_partkey AS t_partkey,
           ({duck_qavg('l_quantity', 2)} * 0.2) AS qty_threshold
    FROM lineitem GROUP BY l_partkey) t
  ON t_partkey = l_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < qty_threshold
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count + total balance of
    above-average-balance customers with no urgent order (anti
    join; the fixture has no phone column, so nationkey stands in
    for the country code and 'no 1-URGENT order' for 'no order')."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        qavg("c_acctbal", 2).alias("avg_bal")
    )
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            qsum("c_acctbal", 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_ORACLE = f"""
SELECT c_nationkey,
       count(*) AS numcust,
       {duck_qsum('c_acctbal', 2)} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT {duck_qavg('c_acctbal', 2)}
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the most recent order by the
    same user at or before the event time.

    Implementation is the scalable union + last(ignorenulls) window
    form: tag deduplicated orders 0 and events 1, union on an
    aligned schema, sort within each user_id partition by
    (time, tag), and carry the last seen order forward.  One
    shuffle on user_id, cost O(n log n) per partition — no
    range-join row explosion.  Orders sharing (custkey, date) are
    first collapsed to the max orderkey (max_by payload) so the
    pick is deterministic in both engines; the DuckDB oracle uses
    its native ASOF JOIN against the same deduped orders."""
    return asof_join_events_orders(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "orders"),
    )


def asof_join_events_orders(e: DataFrame, orders: DataFrame) -> DataFrame:
    """DataFrame-level as-of join (see join_asof)."""
    o = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    o_side = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        "o_totalprice",
        F.lit(0).alias("tag"),
    )
    e_side = e.select(
        "user_id",
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(1).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o_side.unionByName(e_side)
        .select(
            "user_id",
            "t",
            "event_id",
            "tag",
            F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
            F.last("o_totalprice", ignorenulls=True).over(w).alias("asof_totalprice"),
        )
        .where((F.col("tag") == 1) & F.col("asof_orderkey").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("ts"),
            "asof_orderkey",
            "asof_totalprice",
        )
        .orderBy("event_id")
    )


JOIN_ASOF_ORACLE = """
WITH o AS (
    SELECT o_custkey, o_orderdate,
           max(o_orderkey) AS o_orderkey,
           max_by(o_totalprice, o_orderkey) AS o_totalprice
    FROM orders
    GROUP BY o_custkey, o_orderdate)
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderkey AS asof_orderkey,
       o.o_totalprice AS asof_totalprice
FROM events e
ASOF JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
"""


register("q4_order_priority", q4_order_priority, Q4_ORACLE)
register("q13_customer_distribution", q13_customer_distribution, Q13_ORACLE)
register("q15_top_supplier", q15_top_supplier, Q15_ORACLE)
register("q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_ORACLE)
register("q22_idle_customers", q22_idle_customers, Q22_ORACLE)
register("join_asof", join_asof, JOIN_ASOF_ORACLE)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan -> filter -> agg, the predicate-pushdown
    showcase — every filter reaches the parquet scan (row-group
    min/max pruning at scale), no shuffle except the 1-row final
    agg."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            qsum(
                F.col("l_extendedprice") * F.col("l_discount"), 4
            ).alias("revenue")
        )
    )


Q6_ORACLE = f"""
SELECT {duck_qsum('l_extendedprice * l_discount', 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


register("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE)


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY supplier with a
    returned lineitem on a multi-supplier order (fixture lacks
    commit/receipt dates, so 'failed' = l_returnflag = 'R').

    The EXISTS (another supplier on the order) / NOT EXISTS (another
    failing supplier) pair decorrelates into two per-order aggregate
    counts — n_supp > 1 and n_fail = 1 — computed in one pass over
    the distinct (orderkey, suppkey) sets and broadcast-free joined
    back on l_orderkey.  No correlated re-scans: cost is two
    shuffles on l_orderkey + one on l_suppkey, independent of how
    many suppliers an order has."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    pairs = l.select("l_orderkey", "l_suppkey").distinct()
    fail_pairs = (
        l.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    fails_per_order = fail_pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_fail")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        fail_pairs.join(per_order, "l_orderkey")
        .join(fails_per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_fail") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(20)
    )


Q21_ORACLE = """
WITH f AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    WHERE l_returnflag = 'R'),
a AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM f
JOIN supplier ON s_suppkey = f.l_suppkey
WHERE EXISTS (
        SELECT 1 FROM a
        WHERE a.l_orderkey = f.l_orderkey
          AND a.l_suppkey <> f.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM f f2
        WHERE f2.l_orderkey = f.l_orderkey
          AND f2.l_suppkey <> f.l_suppkey)
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 20
"""


register("q21_waiting_supplier", q21_waiting_supplier, Q21_ORACLE)
