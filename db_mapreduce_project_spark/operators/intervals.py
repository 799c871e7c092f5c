"""Interval analytics — the two scale-correct rewrites of unkeyed
temporal-range queries, which naive engines run as nested-loop
joins:

- `transit_inventory_sweepline`: "how many lineitems were in
  transit on each date" computed as a SWEEP LINE — every interval
  becomes a +1 delta at ship and a -1 delta at receipt, and the
  answer is a running prefix sum over dates.  O(2n) rows instead of
  the O(n * interval_days) explode or the O(n * dates) range join.
- `range_join_bucketed_transit`: month-start snapshot counts via a
  BUCKETIZED range join — each interval explodes to the months it
  covers (fan-out bounded by interval_length/bucket_width, here
  <= 2), the snapshot spine equi-joins on the month bucket, and the
  exact range predicate applies as a residual filter.  This is the
  general unkeyed-range-join rewrite (the equivalent of a range-
  join optimizer hint), with the oracle running the naive
  interval-containment join to certify it.

The fixture lineitem has no receiptdate, so the transit interval is
derived deterministically: receipt = ship + (orderkey % 30 + 1)
days — content-independent, identical in both engines.

Scale notes (100 TB):
- the sweep line's global prefix sum is computed as a DISTRIBUTED
  two-phase scan: within-month cumsum under a window PARTITIONED by
  month, plus a cross-month offset from the (tiny, months-cardinality)
  month-total cumsum — no single-partition window ever sees the
  daily stream.  Exact integer deltas make the two-phase sum equal
  the sequential one by associativity.
- the bucketized join's shuffle volume is rows x fan-out on one
  side and the spine on the other, both keyed by bucket — hot
  buckets are ordinary AQE-skew territory, never a driver problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import duck_qint, qint
from ..io import load_table
from ..registry import register

# derived transit duration: orderkey % 30 + 1 days
_RECEIPT_SPARK = "l_shipdate + INTERVAL '1' DAY * (l_orderkey % 30 + 1)"
_RECEIPT_DUCK = "l_shipdate + INTERVAL 1 DAY * (l_orderkey % 30 + 1)"


def _transit_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_shipdate").alias("ship"),
        F.expr(_RECEIPT_SPARK).alias("receipt"),
        qint("l_quantity", 0).alias("qty"),
    )


def transit_inventory_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily in-transit inventory: shipped count, received count,
    and end-of-day in-transit balance for every date that saw a
    shipment or receipt."""
    iv = _transit_intervals(spark, sf_dir)
    ships = iv.select(
        F.col("ship").alias("day"),
        F.lit(1).cast("bigint").alias("shipped"),
        F.lit(0).cast("bigint").alias("received"),
    )
    receipts = iv.select(
        F.col("receipt").alias("day"),
        F.lit(0).cast("bigint").alias("shipped"),
        F.lit(1).cast("bigint").alias("received"),
    )
    daily = (
        ships.unionByName(receipts)
        .groupBy("day")
        .agg(
            F.sum("shipped").alias("shipped"),
            F.sum("received").alias("received"),
        )
        .withColumn("net", F.col("shipped") - F.col("received"))
        .withColumn("month", F.date_trunc("MONTH", F.col("day")))
    )
    w_in_month = (
        Window.partitionBy("month")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    daily = daily.withColumn("cum_in_month", F.sum("net").over(w_in_month))
    month_totals = daily.groupBy("month").agg(F.sum("net").alias("mnet"))
    w_months = (
        Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = month_totals.withColumn(
        "offset", F.sum("mnet").over(w_months) - F.col("mnet")
    ).select("month", "offset")
    return (
        daily.join(F.broadcast(offsets), "month")
        .select(
            "day",
            "shipped",
            "received",
            (F.col("cum_in_month") + F.col("offset")).alias("in_transit"),
        )
        .orderBy("day")
    )


TRANSIT_INVENTORY_SWEEPLINE_ORACLE = f"""
WITH deltas AS (
  SELECT l_shipdate AS day, CAST(1 AS BIGINT) AS shipped,
         CAST(0 AS BIGINT) AS received
  FROM lineitem
  UNION ALL
  SELECT {_RECEIPT_DUCK} AS day, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
  FROM lineitem
),
daily AS (
  SELECT day, CAST(sum(shipped) AS BIGINT) AS shipped,
         CAST(sum(received) AS BIGINT) AS received
  FROM deltas GROUP BY day
)
SELECT day, shipped, received,
       CAST(sum(shipped - received) OVER
            (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS in_transit
FROM daily
ORDER BY day
"""


def range_join_bucketed_transit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-transit lineitem count and quantity at each month-start
    snapshot, as a bucketized range join: intervals explode to their
    covered month buckets (fan-out <= 2: transit <= 31 days), the
    snapshot spine equi-joins on the bucket, and the exact predicate
    ship <= snap < receipt filters residually.  No nested-loop join
    anywhere; the oracle runs the naive interval-containment join."""
    iv = _transit_intervals(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    spine = o.select(
        F.date_trunc("MONTH", F.col("o_orderdate")).alias("snap")
    ).distinct()
    covered = iv.select(
        "ship",
        "receipt",
        "qty",
        F.explode(
            F.sequence(
                F.date_trunc("MONTH", F.col("ship")),
                F.date_trunc("MONTH", F.col("receipt")),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("bucket"),
    )
    return (
        covered.join(spine, covered.bucket == spine.snap)
        .where((F.col("ship") <= F.col("snap")) & (F.col("receipt") > F.col("snap")))
        .groupBy("snap")
        .agg(
            F.count("*").alias("n_in_transit"),
            F.sum("qty").alias("qty_in_transit"),
        )
        .orderBy("snap")
    )


RANGE_JOIN_BUCKETED_TRANSIT_ORACLE = f"""
WITH iv AS (
  SELECT l_shipdate AS ship, {_RECEIPT_DUCK} AS receipt,
         {duck_qint("l_quantity", 0)} AS qty
  FROM lineitem
),
spine AS (
  SELECT DISTINCT date_trunc('month', o_orderdate) AS snap FROM orders
)
SELECT snap,
       count(*) AS n_in_transit,
       CAST(sum(qty) AS BIGINT) AS qty_in_transit
FROM spine
JOIN iv ON ship <= snap AND receipt > snap
GROUP BY snap
ORDER BY snap
"""


register(
    "transit_inventory_sweepline",
    transit_inventory_sweepline,
    TRANSIT_INVENTORY_SWEEPLINE_ORACLE,
)
register(
    "range_join_bucketed_transit",
    range_join_bucketed_transit,
    RANGE_JOIN_BUCKETED_TRANSIT_ORACLE,
)
