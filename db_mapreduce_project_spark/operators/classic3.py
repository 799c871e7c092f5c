"""The remaining classic TPC-H shapes (Q2, Q9, Q11, Q16, Q20 —
SURVEY.md §2.2), previously unreachable because the fixtures ship no
partsupp table.  `derived_partsupp` synthesizes one DETERMINISTICALLY
from data both engines already share — the distinct (l_partkey,
l_suppkey) pairs observed in lineitem (guaranteeing referential
consistency with the fact table, exactly like real TPC-H), with
hash-derived ps_availqty / ps_supplycost.  The identical derivation
runs in the DuckDB oracles, so all five shapes are fully
value-hash-checked.

Scale notes: every correlated subquery in the original SQL is
expressed as its decorrelated join (per-group min / per-pair sum
joined back) — the plan Catalyst would have to discover is written
directly; money aggregates quantize-then-sum (functions/stable.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import duck_qsum, qsum
from ..io import load_table
from ..registry import register

# Same derivation in both engines: availqty in [1, 9999], supplycost
# in [0.00, 999.99] with 2 decimals.
PARTSUPP_CTE = """
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         1 + (ps_partkey * 7 + ps_suppkey * 11) % 9999 AS ps_availqty,
         CAST((ps_partkey * 13 + ps_suppkey * 17) % 100000 AS DOUBLE) / 100.0
             AS ps_supplycost
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem) pairs
)"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    pairs = l.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (
            1 + (F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 11) % 9999
        ).alias("ps_availqty"),
        (
            ((F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 17) % 100000)
            .cast("double")
            / 100.0
        ).alias("ps_supplycost"),
    )


# ---------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part within a region.
# The correlated MIN subquery decorrelates to a per-part min joined
# back on (partkey, cost) — broadcastable dims, one partsupp shuffle.
# ---------------------------------------------------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sup_region = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = (
        ps.join(sup_region, ps.ps_suppkey == sup_region.s_suppkey)
        .join(p, ps.ps_partkey == p.p_partkey)
        .select(
            "p_partkey", "p_type", "s_suppkey", "s_name", "s_acctbal",
            "n_name", "ps_supplycost",
        )
    )
    min_cost = eligible.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eligible.join(
            min_cost,
            (eligible.p_partkey == min_cost.mc_partkey)
            & (eligible.ps_supplycost == min_cost.min_cost),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            "ps_supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
    )


Q2_ORACLE = f"""
WITH {PARTSUPP_CTE.strip()}
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
FROM part, partsupp, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_type = 'ECONOMY'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
        SELECT min(ps_supplycost)
        FROM partsupp ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = part.p_partkey
          AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE'
      )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


# ---------------------------------------------------------------
# Q9 shape: product-type profit by nation and year.
# amount = revenue - supply cost; quantized at 2dp BEFORE the sum so
# partial/final aggregation order cannot change the answer.
# ---------------------------------------------------------------
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(
            ps,
            (F.col("l_partkey") == ps.ps_partkey)
            & (F.col("l_suppkey") == ps.ps_suppkey),
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(qsum(amount, 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_ORACLE = f"""
WITH {PARTSUPP_CTE.strip()}
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {duck_qsum("l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity", 2)}
           AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------
# Q11 shape: important stock — per-part inventory value within one
# nation, kept when above a fraction of the global total.  The
# global scalar is a 1-row aggregate joined back (broadcast).
# ---------------------------------------------------------------
Q11_FRACTION = 0.001


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    scoped = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
        )
    )
    per_part = scoped.groupBy("ps_partkey").agg(qsum("v", 2).alias("value"))
    total = scoped.agg(
        (qsum("v", 2) * F.lit(Q11_FRACTION)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


Q11_ORACLE = f"""
WITH {PARTSUPP_CTE.strip()},
scoped AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT ps_partkey, value FROM (
  SELECT ps_partkey, {duck_qsum('v', 2)} AS value
  FROM scoped GROUP BY ps_partkey
) t
WHERE value > (SELECT {duck_qsum('v', 2)} * {Q11_FRACTION} FROM scoped)
ORDER BY value DESC, ps_partkey
"""


# ---------------------------------------------------------------
# Q16 shape: supplier count by part attributes, excluding flagged
# suppliers (NOT IN -> left-anti against a tiny broadcast list).
# ---------------------------------------------------------------
def q16_parts_supplier_relationship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#9")
        & (~F.col("p_type").like("ECONOMY%"))
        & (F.col("p_size").isin(1, 2, 3, 4, 5, 6, 7, 8))
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(bad, ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(p, ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


Q16_ORACLE = f"""
WITH {PARTSUPP_CTE.strip()}
SELECT p_brand, p_type, p_size,
       count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#9'
  AND p_type NOT LIKE 'ECONOMY%'
  AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
  AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------
# Q20 shape: suppliers holding excess stock of qualifying parts.
# The correlated half-of-shipped-quantity scalar decorrelates to a
# per-(part,supp) shipped-quantity aggregate joined to partsupp.
# ---------------------------------------------------------------
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    shipped = l.groupBy(
        F.col("l_partkey").alias("sh_partkey"),
        F.col("l_suppkey").alias("sh_suppkey"),
    ).agg(qsum("l_quantity", 2).alias("qty"))
    excess = (
        ps.join(p, ps.ps_partkey == p.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == shipped.sh_partkey)
            & (ps.ps_suppkey == shipped.sh_suppkey),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    return (
        s.join(excess, s.s_suppkey == excess.ps_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_ORACLE = f"""
WITH {PARTSUPP_CTE.strip()}
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'
          )
      AND ps_availqty > 0.5 * (
            SELECT {duck_qsum('l_quantity', 2)}
            FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
          )
  )
ORDER BY s_name
"""


register("q2_min_cost_supplier", q2_min_cost_supplier, Q2_ORACLE)
register("q9_product_profit", q9_product_profit, Q9_ORACLE)
register("q11_important_stock", q11_important_stock, Q11_ORACLE)
register(
    "q16_parts_supplier_relationship",
    q16_parts_supplier_relationship,
    Q16_ORACLE,
)
register("q20_excess_stock_suppliers", q20_excess_stock_suppliers, Q20_ORACLE)


# ---------------------------------------------------------------
# Q8 shape: national market share — the target nation's fraction of
# regional import volume per year.  Two roles of nation (customer's
# region scope, supplier's share target), conditional quantized sums,
# one fact shuffle.
# ---------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.stable import qint

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            qint(volume, 2).alias("vq"),
            (F.col("supp_nation") == "NATION_5").alias("is_target"),
        )
    )
    return (
        base.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("is_target"), F.col("vq")).otherwise(0))
                / F.sum("vq")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = """
WITH base AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5)
              AS BIGINT) AS vq,
         (n2.n_name = 'NATION_5') AS is_target
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n1.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE p_type = 'SMALL' AND r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       (CAST(sum(CASE WHEN is_target THEN vq ELSE 0 END) AS BIGINT)
        / CAST(sum(vq) AS DOUBLE)) AS mkt_share
FROM base
GROUP BY o_year
ORDER BY o_year
"""

register("q8_market_share", q8_market_share, Q8_ORACLE)


# ---------------------------------------------------------------
# Q12 shape: shipping-priority split (TPC-H Q12 without l_shipmode /
# commit/receipt dates, which the fixtures lack — l_linestatus plays
# the grouping role and the ship-date year plays the lateness
# window).  The plan shape is the point: fact-fact equi-join with
# the date filter pushed to the lineitem scan, conditional integer
# counts, single agg shuffle on a 2-value key (AQE coalesces).
# ---------------------------------------------------------------
def q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

register("q12_priority_split", q12_priority_split, Q12_ORACLE)
