"""Incremental-maintenance operators: MERGE-style upsert,
latest-per-key CDC compaction, and fixed-width histograms — the
table-maintenance verbs a training-data warehouse needs between
ingest batches.

Scale notes:
- the upsert is union + latest-wins window (ONE shuffle on the key,
  merge-on-read shape); with a bucketed base table the shuffle
  disappears entirely — this is how row-level MERGE engines compact;
- latest-per-key is the same single-shuffle window, the standard
  CDC snapshot compaction;
- the histogram is a map-side bucket assignment + tiny groupBy —
  no wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import duck_qavg, duck_qsum, qavg, qint
from ..io import load_table
from ..registry import register


def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 MERGE: apply an update batch to the customer table —
    updates overwrite matching keys, new keys insert.  The batch is
    derived deterministically from the table itself (every 7th
    customer gets +100.00 balance; every 97th spawns a new key
    +1e6) so the operation is oracle-checkable without extra
    fixtures.

    Implementation is the merge-on-read shape: union the batch over
    the base with a source priority, then latest-wins row_number
    per key — one shuffle; a bucketed base makes it shuffle-free.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    updates = c.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", "c_name", (F.col("c_acctbal") + 100.0).alias("c_acctbal")
    )
    inserts = c.where(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    batch = updates.unionByName(inserts).withColumn("_src", F.lit(1))
    merged = c.withColumn("_src", F.lit(0)).unionByName(batch)
    w = Window.partitionBy("c_custkey").orderBy(F.col("_src").desc())
    return (
        merged.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


MERGE_UPSERT_CUSTOMERS_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_name, c_acctbal, 0 AS _src FROM customer
),
batch AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal, 1 AS _src
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, concat('new-', c_name), 0.0, 1
  FROM customer WHERE c_custkey % 97 = 0
),
merged AS (
  SELECT * FROM base UNION ALL SELECT * FROM batch
)
SELECT c_custkey, c_name, c_acctbal FROM (
  SELECT c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_custkey ORDER BY _src DESC) AS _rk
  FROM merged
) t
WHERE _rk = 1
ORDER BY c_custkey
"""


def cdc_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot compaction: the latest event per user (ts then
    event_id as total order) — the dedup that turns an append-only
    change log into current state.  Single shuffle on the key."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("user_id", "event_id", "event_type", "ts")
        .orderBy("user_id")
    )


CDC_LATEST_PER_USER_ORACLE = """
SELECT user_id, event_id, event_type, ts FROM (
  SELECT user_id, event_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS _rk
  FROM events
) t
WHERE _rk = 1
ORDER BY user_id
"""


HIST_WIDTH = 50_000.0  # price-band width
HIST_MAX_BUCKET = 9


def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (10 bands of 50k, last
    band open-ended): bucket assignment is a map-side expression,
    the aggregate is a 10-row groupBy — the profiling primitive for
    choosing filter thresholds at scale."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / HIST_WIDTH), F.lit(HIST_MAX_BUCKET)
    ).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            qavg("o_totalprice", 2).alias("avg_price"),
        )
        .orderBy("bucket")
    )


HISTOGRAM_ORDER_PRICES_ORACLE = f"""
SELECT CAST(least(floor(o_totalprice / {HIST_WIDTH}), {HIST_MAX_BUCKET})
            AS INTEGER) AS bucket,
       count(*) AS n_orders,
       {duck_qavg('o_totalprice', 2)} AS avg_price
FROM orders
GROUP BY 1
ORDER BY bucket
"""


def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate MAINTENANCE: per-user event totals
    kept up to date by merging the stored base aggregate with the
    aggregate of an ingest delta — never rescanning the base fact.

    The fixture split is deterministic (event_id % 10: 80% base /
    20% delta) so the query is self-contained; in production the
    base partial rows ARE the materialized view and only the delta
    aggregates per batch.  Mergeability is exactly why the engine
    aggregates quantized INTEGERS (functions/stable.py): integer
    partial sums are associative, so base+delta merge equals the
    direct aggregate bit-for-bit under any split, partitioning, or
    AQE re-plan.  The oracle deliberately does NOT mirror the
    split — it runs the direct full aggregate — so the driver
    certifies the merge identity itself, not a reimplementation.

    Scale shape: both partials are map-side-combined groupBys keyed
    by user; the merge is a groupBy over (base + delta) PARTIAL
    rows — users-cardinality, not events-cardinality.  At 100 TB
    the delta batch is the only thing scanned per refresh."""
    e = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(qint("value", 4)).alias("qv"),
        )

    base = partial(e.where(F.col("event_id") % 10 < 8))
    delta = partial(e.where(F.col("event_id") % 10 >= 8))
    return (
        base.unionByName(delta)
        .groupBy("user_id")
        .agg(F.sum("n").alias("n_events"), F.sum("qv").alias("qv"))
        .select(
            "user_id",
            "n_events",
            (F.col("qv") / F.lit(10000.0)).alias("sum_value"),
        )
        .orderBy("user_id")
    )


INCREMENTAL_AGG_MERGE_ORACLE = f"""
SELECT user_id,
       count(*) AS n_events,
       {duck_qsum('value', 4)} AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


register(
    "merge_upsert_customers", merge_upsert_customers, MERGE_UPSERT_CUSTOMERS_ORACLE
)
register(
    "incremental_agg_merge", incremental_agg_merge, INCREMENTAL_AGG_MERGE_ORACLE
)
register("cdc_latest_per_user", cdc_latest_per_user, CDC_LATEST_PER_USER_ORACLE)
register(
    "histogram_order_prices", histogram_order_prices, HISTOGRAM_ORDER_PRICES_ORACLE
)


SCD2_USER_MOD = 25  # deterministic user subsample for bounded output


def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: turn the append-only
    event log into versioned rows with [valid_from, valid_to)
    intervals and an is_current flag — the warehouse-standard
    history table that point-in-time (as-of) joins read.

    One shuffle on the dimension key; valid_to is the next change's
    timestamp (lead), NULL while current.  At 100 TB the window
    partitions by key — no global sort — and the history table
    would be range-clustered on (key, valid_from) at write time so
    point-in-time probes prune to one file per key."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("user_id") % SCD2_USER_MOD == 0
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_id", "ts", "value")
        .withColumn("valid_to", F.lead("ts").over(w))
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            "valid_to",
            "value",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "value")
    )


SCD2_USER_VALUE_HISTORY_ORACLE = f"""
SELECT user_id, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       value,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
         AS is_current
FROM events
WHERE user_id % {SCD2_USER_MOD} = 0
ORDER BY user_id, valid_from, value
"""

register(
    "scd2_user_value_history",
    scd2_user_value_history,
    SCD2_USER_VALUE_HISTORY_ORACLE,
)


def equidepth_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of o_totalprice — the optimizer-
    statistics companion of the fixed-width `histogram_order_prices`:
    bucket boundaries are the exact interpolated deciles (computed in
    ONE tiny aggregate and broadcast back), bucket assignment is a
    map-side sum of nine comparisons, and the final count is a 10-row
    groupBy.  The corpus is scanned twice and shuffled never."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("price")
    )
    qs = [i / 10 for i in range(1, 10)]
    th = o.agg(
        *[F.percentile("price", q).alias(f"t{i}") for i, q in enumerate(qs, 1)]
    )
    bucket = sum(
        (F.col("price") > F.col(f"t{i}")).cast("int") for i in range(1, 10)
    )
    return (
        o.crossJoin(F.broadcast(th))
        .select(bucket.alias("bucket"), "price")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("price").alias("lo"),
            F.max("price").alias("hi"),
        )
        .orderBy("bucket")
    )


_EQD_TH = ", ".join(
    f"quantile_cont(price, {i / 10}) AS t{i}" for i in range(1, 10)
)
_EQD_BUCKET = " + ".join(
    f"CASE WHEN price > t{i} THEN 1 ELSE 0 END" for i in range(1, 10)
)
EQUIDEPTH_HISTOGRAM_PRICES_ORACLE = f"""
WITH o AS (SELECT o_totalprice AS price FROM orders),
th AS (SELECT {_EQD_TH} FROM o)
SELECT CAST(({_EQD_BUCKET}) AS INTEGER) AS bucket,
       count(*) AS n, min(price) AS lo, max(price) AS hi
FROM o, th
GROUP BY 1
ORDER BY bucket
"""

register(
    "equidepth_histogram_prices",
    equidepth_histogram_prices,
    EQUIDEPTH_HISTOGRAM_PRICES_ORACLE,
)


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table DIFF between two snapshots — the audit verb behind CDC
    validation, backfill verification, and "what did this batch
    change": classify every key as insert / update (with old and
    new values) across the base customer table and its upserted
    snapshot (the same deterministic batch merge_upsert_customers
    applies, so the query is self-contained and oracle-checkable).

    Shape: ONE full-outer equi-join on the key, row-local
    classification, unchanged rows dropped — at 100 TB both sides
    shuffle once on the key (or zero times if both snapshots are
    bucketed on it), and the diff output is change-cardinality,
    not table-cardinality."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    updated = merge_upsert_customers(spark, sf_dir).select(
        "c_custkey", "c_acctbal"
    )
    b = base.select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("old_bal")
    )
    u = updated.select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("new_bal")
    )
    joined = b.join(u, "key", "full_outer")
    change = (
        F.when(F.col("old_bal").isNull(), F.lit("insert"))
        .when(F.col("new_bal").isNull(), F.lit("delete"))
        .when(F.col("old_bal") != F.col("new_bal"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type") != "unchanged")
        .select("change_type", "key", "old_bal", "new_bal")
        .orderBy("change_type", "key")
    )


SNAPSHOT_DIFF_ORACLE = """
WITH base AS (
  SELECT c_custkey AS key, c_acctbal AS old_bal FROM customer
),
batch AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal, 1 AS _src
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, concat('new-', c_name), 0.0, 1
  FROM customer WHERE c_custkey % 97 = 0
),
merged AS (
  SELECT c_custkey, c_acctbal, 0 AS _src FROM customer
  UNION ALL
  SELECT c_custkey, c_acctbal, _src FROM batch
),
updated AS (
  SELECT c_custkey AS key, c_acctbal AS new_bal FROM (
    SELECT c_custkey, c_acctbal,
           row_number() OVER (PARTITION BY c_custkey ORDER BY _src DESC)
               AS _rk
    FROM merged
  ) t WHERE _rk = 1
),
joined AS (
  SELECT coalesce(b.key, u.key) AS key, b.old_bal, u.new_bal,
         CASE WHEN b.old_bal IS NULL THEN 'insert'
              WHEN u.new_bal IS NULL THEN 'delete'
              WHEN b.old_bal <> u.new_bal THEN 'update'
              ELSE 'unchanged' END AS change_type
  FROM base b FULL OUTER JOIN updated u ON b.key = u.key
)
SELECT change_type, key, old_bal, new_bal
FROM joined
WHERE change_type <> 'unchanged'
ORDER BY change_type, key
"""

register("snapshot_diff", snapshot_diff, SNAPSHOT_DIFF_ORACLE)
