"""Distributed selection (k-th element) without a global sort.

`exact_median_twopass` finds the exact lower median of 600k (or
100 TB of) prices with two scans and zero full-data sorts — the
classic histogram-selection algorithm (Blum et al.'s selection
problem, engineered the way distributed engines do it: Munro &
Paterson 1980 multi-pass selection):

  pass 1: bucket histogram (groupBy floor(price/width), map-side
          combined), cumulative counts over the BUCKET table
          (cardinality = price_range/width, thousands — the only
          window runs there, never on the data);
  pass 2: re-scan filtered to the ONE bucket containing rank k and
          pick the (k - cum_before)-th element inside it (bucket-
          sized sort, bounded by width choice; a skewed bucket
          recurses with a narrower width at scale).

A naive engine computes the median by globally sorting the corpus;
this plan's widest shuffle is the bucket histogram.  The oracle
certifies via row_number over the full sort in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

MEDIAN_BUCKET_WIDTH = 50.0


def exact_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower median (rank k = (n+1) DIV 2) of
    lineitem.l_extendedprice via histogram selection."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("price")
    )
    bucketed = li.select(
        F.floor(F.col("price") / MEDIAN_BUCKET_WIDTH).alias("bucket"), "price"
    )
    hist = bucketed.groupBy("bucket").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hist = hist.withColumn("cum", F.sum("cnt").over(w))
    total = hist.agg(F.max("cum").alias("n_rows")).select(
        "n_rows", F.expr("(n_rows + 1) DIV 2").alias("k")
    )
    sel = (
        hist.crossJoin(F.broadcast(total))
        .where(F.col("cum") >= F.col("k"))
        .orderBy("bucket")
        .limit(1)
        .select(
            "bucket",
            (F.col("k") - (F.col("cum") - F.col("cnt"))).alias("k_in_bucket"),
            "n_rows",
            "k",
        )
    )
    in_bucket = bucketed.join(F.broadcast(sel), "bucket")
    w_b = Window.orderBy("price")
    return (
        in_bucket.withColumn("rn", F.row_number().over(w_b))
        .where(F.col("rn") == F.col("k_in_bucket"))
        .select(
            F.col("price").alias("median_price"), "n_rows", "k"
        )
    )


EXACT_MEDIAN_TWOPASS_ORACLE = """
WITH t AS (SELECT count(*) AS n_rows FROM lineitem),
k AS (SELECT n_rows, (n_rows + 1) // 2 AS k FROM t),
ranked AS (
  SELECT l_extendedprice AS price,
         row_number() OVER (ORDER BY l_extendedprice) AS rn
  FROM lineitem
)
SELECT r.price AS median_price, k.n_rows, k.k
FROM ranked r, k
WHERE r.rn = k.k
"""

register("exact_median_twopass", exact_median_twopass, EXACT_MEDIAN_TWOPASS_ORACLE)


PCTL_BUCKET_WIDTH = 2000.0


def exact_median_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower median of o_totalprice PER ORDER PRIORITY via the
    same histogram selection, fully partitioned: every window in the
    plan partitions by the group key, so the per-group selection
    parallelizes across groups — the grouped generalization that a
    1000-executor cluster actually runs (no SinglePartition stage
    anywhere, unlike the global variant's bucket-table window)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("price"),
    )
    bucketed = o.withColumn(
        "bucket", F.floor(F.col("price") / PCTL_BUCKET_WIDTH)
    )
    hist = bucketed.groupBy("grp", "bucket").agg(F.count("*").alias("cnt"))
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = hist.withColumn("cum", F.sum("cnt").over(w_cum))
    ks = hist.groupBy("grp").agg(F.max("cum").alias("n_rows")).select(
        "grp", "n_rows", F.expr("(n_rows + 1) DIV 2").alias("k")
    )
    w_first = Window.partitionBy("grp").orderBy("bucket")
    sel = (
        hist.join(F.broadcast(ks), "grp")
        .where(F.col("cum") >= F.col("k"))
        .withColumn("rn", F.row_number().over(w_first))
        .where(F.col("rn") == 1)
        .select(
            "grp",
            "bucket",
            (F.col("k") - (F.col("cum") - F.col("cnt"))).alias("k_in_bucket"),
            "n_rows",
        )
    )
    w_pick = Window.partitionBy("grp").orderBy("price")
    return (
        bucketed.join(F.broadcast(sel), ["grp", "bucket"])
        .withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == F.col("k_in_bucket"))
        .select(F.col("grp").alias("o_orderpriority"), F.col("price").alias("median_price"), "n_rows")
        .orderBy("o_orderpriority")
    )


EXACT_MEDIAN_PER_GROUP_ORACLE = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n_rows
  FROM orders
)
SELECT o_orderpriority, o_totalprice AS median_price, n_rows
FROM ranked
WHERE rn = (n_rows + 1) // 2
ORDER BY o_orderpriority
"""

register(
    "exact_median_per_group", exact_median_per_group, EXACT_MEDIAN_PER_GROUP_ORACLE
)
