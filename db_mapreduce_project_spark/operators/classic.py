"""Classic analytic query shapes the category sweep (SURVEY.md
S2.2) still lacked as named queries: a multi-join top-k revenue
report (TPC-H Q10 shape), a correlated scalar subquery, explicit
NULL-handling via the DataFrame NA API, and date/interval
arithmetic.

Scale notes: the Q10 shape is the canonical large-join pattern —
two fact shuffles (lineitem><orders on orderkey, then ><customer on
custkey) with the 25-row nation dim broadcast; top-k goes through
TakeOrderedAndProject, never a global sort.  The correlated
subquery is expressed as an aggregate + broadcast join back onto
customers (Catalyst's own decorrelation target shape) rather than a
per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import duck_qavg, duck_qsum, qavg, qsum
from ..io import load_table
from ..registry import register

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue lost to returned items
    (l_returnflag = 'R'), with their nation — TPC-H Q10 adapted to
    the fixture schema (no commitdate/phone columns)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-10-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(qsum(disc_price, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {duck_qsum(_DISC_PRICE, 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def corr_subquery_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose balance exceeds their nation's average — the
    correlated-scalar-subquery shape, expressed as agg + broadcast
    join (what Catalyst decorrelates EXISTS/scalar subqueries into).
    The per-nation average uses quantized summation so both engines
    compute bit-identical thresholds."""
    c = load_table(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(
        qavg("c_acctbal", 2).alias("nation_avg")
    )
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy("c_custkey")
    )


CORR_SUBQUERY_ORACLE = f"""
SELECT c_custkey, c_nationkey, c_acctbal
FROM customer c
WHERE c_acctbal > (
    SELECT {duck_qavg('c_acctbal', 2)}
    FROM customer c2
    WHERE c2.c_nationkey = c.c_nationkey
)
ORDER BY c_custkey
"""


def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL surface: nullif to introduce NULLs, the DataFrame NA API
    (na.fill) to repair them, plus isnull / null-aware bucketing."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 400)
    with_null = l.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_n"),
    )
    return (
        with_null.withColumn("was_null", F.isnull("disc_n"))
        .na.fill({"disc_n": 0.99})
        .withColumn(
            "bucket",
            F.when(F.col("was_null"), F.lit("zero")).otherwise(
                F.when(F.col("disc_n") >= 0.05, "high").otherwise("low")
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


NULL_HANDLING_ORACLE = """
SELECT l_orderkey, l_linenumber,
       coalesce(nullif(l_discount, 0.0), 0.99) AS disc_n,
       nullif(l_discount, 0.0) IS NULL AS was_null,
       CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 'zero'
            WHEN nullif(l_discount, 0.0) >= 0.05 THEN 'high'
            ELSE 'low' END AS bucket
FROM lineitem
WHERE l_orderkey <= 400
ORDER BY l_orderkey, l_linenumber
"""


def interval_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic: +days, quarter truncation,
    end-of-month, day distances, calendar parts."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    d = F.to_date("o_orderdate")
    return (
        o.select(
            "o_orderkey",
            # date-typed values surface as timestamps: pandas has no
            # date dtype, so both engines land on datetime64 cells
            d.cast("timestamp").alias("d"),
            F.date_add(d, 90).cast("timestamp").alias("plus90"),
            F.date_trunc("quarter", "o_orderdate").alias("qtr"),
            F.last_day(d).cast("timestamp").alias("eom"),
            F.datediff(F.lit("1998-12-31").cast("date"), d).cast("int").alias(
                "days_left"
            ),
            F.quarter(d).cast("int").alias("q"),
            F.weekofyear(d).cast("int").alias("woy"),
        )
        .orderBy("o_orderkey")
    )


INTERVAL_DATETIME_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS d,
       CAST(CAST(o_orderdate AS DATE) + 90 AS TIMESTAMP) AS plus90,
       date_trunc('quarter', o_orderdate) AS qtr,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
            AS INTEGER) AS days_left,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS woy
FROM orders
WHERE o_orderkey <= 1000
ORDER BY o_orderkey
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): aggregate the fact
    FIRST (groupBy + HAVING-style filter on the aggregate), then
    join the small surviving set to orders/customer.  At scale the
    HAVING filter collapses the fact table before any join touches
    it — the join input is the filtered aggregate, not 6B lineitems."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(qsum("l_quantity", 2).alias("sum_qty"))
        .where(F.col("sum_qty") > 150.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, {duck_qsum('l_quantity', 2)} AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING {duck_qsum('l_quantity', 2)} > 150.0
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between nation pairs (TPC-H Q7 shape): the
    two-role dimension pattern — nation joins in twice under
    different aliases (supplier's vs customer's nation), both
    broadcast; the fact chain shuffles once per fact key."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(qsum(disc_price, 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {duck_qsum(_DISC_PRICE, 4)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND n1.n_name < n2.n_name
) t
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotional revenue share (TPC-H Q14 shape): conditional
    aggregation over a fact><dim join — the numerator is a CASE
    inside the same aggregate pass, not a second scan."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01")))
    )
    p = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(
        F.col("p_type").startswith("PROMO"), disc_price
    ).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            qsum(promo, 4).alias("promo_revenue"),
            qsum(disc_price, 4).alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            (
                F.floor(
                    F.col("promo_revenue") / F.col("total_revenue") * 1e6
                    + 0.5
                )
                / 1e4
            ).alias("promo_pct"),
        )
    )


Q14_ORACLE = f"""
WITH agg AS (
  SELECT
    {duck_qsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)}
        AS promo_revenue,
    {duck_qsum(_DISC_PRICE, 4)} AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
    AND l_shipdate <  TIMESTAMP '1997-10-01'
)
SELECT promo_revenue, total_revenue,
       floor(promo_revenue / total_revenue * 1e6 + 0.5) / 1e4 AS promo_pct
FROM agg
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-clause predicate join (TPC-H Q19 shape):
    OR-of-ANDs across both join sides — the planner must keep the
    equi-join key extractable from the disjunction to avoid a
    nested-loop plan."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    clause1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 30)
    )
    clause2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 40)
    )
    clause3 = (
        (F.col("p_brand") == "Brand#15")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 50)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .where(clause1 | clause2 | clause3)
        .agg(
            qsum(disc_price, 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q19_ORACLE = f"""
SELECT {duck_qsum(_DISC_PRICE, 4)} AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 30)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 50)
"""


register("q10_returned_items", q10_returned_items, Q10_ORACLE)
register("q18_large_orders", q18_large_orders, Q18_ORACLE)
register("q7_volume_shipping", q7_volume_shipping, Q7_ORACLE)
register("q14_promo_revenue", q14_promo_revenue, Q14_ORACLE)
register(
    "q19_disjunctive_predicates", q19_disjunctive_predicates, Q19_ORACLE
)
register(
    "corr_subquery_nation_avg", corr_subquery_nation_avg, CORR_SUBQUERY_ORACLE
)
register("null_handling", null_handling, NULL_HANDLING_ORACLE)
register("interval_datetime", interval_datetime, INTERVAL_DATETIME_ORACLE)
