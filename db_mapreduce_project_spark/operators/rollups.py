"""Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS
(SURVEY.md §2.2 "Grouping sets" — absent in reference; Spark
built-ins `df.rollup` / `df.cube` / SQL GROUPING SETS).

Subtotal rows carry NULL grouping keys; to keep the DuckDB
comparison unambiguous we label them 'ALL' via coalesce on both
sides (and grouping columns are never genuinely NULL in the
fixtures).

Scale: rollup/cube expand each input row into (levels) grouped
copies *inside* the partial aggregate (Expand operator) — shuffle
volume is (#groups x levels), still tiny relative to the fact scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import duck_qavg, duck_qsum, qavg, qsum
from ..io import load_table
from ..registry import register


def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            qsum("l_extendedprice", 2).alias("total_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "total_price",
        )
        .orderBy("returnflag", "linestatus")
    )


ROLLUP_SALES_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       (CAST(sum(CAST(floor((l_extendedprice) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0) AS total_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            qavg("o_totalprice", 2).alias("avg_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "avg_price",
        )
        .orderBy("status", "priority")
    )


CUBE_ORDERS_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       ((CAST(sum(CAST(floor((o_totalprice) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0) / count(*)) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via spark.sql — (status), (priority),
    and grand total, but NOT the cross product."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "gs_orders_tmp"
    )
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM gs_orders_tmp
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


GROUPING_SETS_MIXED_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY status, priority
"""


register("rollup_sales", rollup_sales, ROLLUP_SALES_ORACLE)
register("cube_orders", cube_orders, CUBE_ORDERS_ORACLE)
register("grouping_sets_mixed", grouping_sets_mixed, GROUPING_SETS_MIXED_ORACLE)
