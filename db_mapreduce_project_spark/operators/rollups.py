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


def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: minute, hour,
    and day buckets of the event stream computed in ONE pass using
    a ROLLUP over truncation levels (day ⊃ hour ⊃ minute, so the
    hierarchy is exactly a rollup: each coarser bucket is a prefix
    of the finer one).

    The Expand operator clones each row once per level inside the
    partial aggregate — shuffle volume is (#distinct buckets x
    levels), NOT (#events x levels), because map-side combine runs
    before the exchange.  This is how a 100 TB event table keeps
    minute/hour/day dashboards from triple-scanning: one scan, one
    shuffle.  `grain` labels the level via grouping().
    """
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("bucket_day")
    hour = F.date_trunc("hour", "ts").alias("bucket_hour")
    minute = F.date_trunc("minute", "ts").alias("bucket_minute")
    rolled = (
        e.select(day, hour, minute, "value")
        .rollup("bucket_day", "bucket_hour", "bucket_minute")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            qsum("value", 4).alias("sum_value"),
            # gid bits (day,hour,minute): 0=minute, 1=hour, 3=day, 7=total
            F.grouping_id().alias("gid"),
        )
        .withColumn(
            "grain",
            F.when(F.col("gid") == 7, "total")
            .when(F.col("gid") == 3, "day")
            .when(F.col("gid") == 1, "hour")
            .otherwise("minute"),
        )
    )
    return (
        rolled.where(F.col("grain") != "total")
        .select(
            "grain",
            F.coalesce("bucket_minute", "bucket_hour", "bucket_day").alias(
                "bucket"
            ),
            "n_events",
            "sum_value",
        )
        .orderBy("grain", "bucket")
    )


EVENTS_TIME_ROLLUP_ORACLE = f"""
WITH rolled AS (
    SELECT date_trunc('day', ts)    AS bucket_day,
           date_trunc('hour', ts)   AS bucket_hour,
           date_trunc('minute', ts) AS bucket_minute,
           CASE WHEN GROUPING(date_trunc('day', ts)) = 1 THEN 'total'
                WHEN GROUPING(date_trunc('hour', ts)) = 1 THEN 'day'
                WHEN GROUPING(date_trunc('minute', ts)) = 1 THEN 'hour'
                ELSE 'minute' END AS grain,
           count(*) AS n_events,
           {duck_qsum('value', 4)} AS sum_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts),
                     date_trunc('minute', ts))
)
SELECT grain,
       coalesce(bucket_minute, bucket_hour, bucket_day) AS bucket,
       n_events, sum_value
FROM rolled
WHERE grain <> 'total'
ORDER BY grain, bucket
"""


register("events_time_rollup", events_time_rollup, EVENTS_TIME_ROLLUP_ORACLE)
