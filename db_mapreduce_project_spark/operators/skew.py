"""Skew mitigation: salting patterns for hot keys.

AQE's skew-join splitting handles most runtime skew, but salting is
the explicit engine-level tool when one key dominates (the classic
power-law user/token distribution in event logs and web corpora):

- salted AGGREGATION: split each key into NUM_SALTS sub-keys, run
  the associative partial aggregate per (key, salt) — spreading one
  hot key over NUM_SALTS reducers — then combine per key.  Legal
  exactly because the engine's aggregates are associative (the same
  property the reference's combiner relies on, maprdeuce.cpp:706-711).
- salted JOIN: replicate the SMALL side NUM_SALTS times (salt 0..S-1)
  and give every big-side row a deterministic salt, joining on
  (key, salt) — each hot key's rows land on S different reducers.

Both are registered with a plain-SQL oracle: salting must be
invisible in the result, and the oracle proves it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import duck_qsum, qsum
from ..io import load_table
from ..registry import register

NUM_SALTS = 8


def salted_agg_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event stats via two-phase salted aggregation:
    groupBy(user_id, salt) -> partial (count, quantized sum) ->
    groupBy(user_id) -> combine.  Result is identical to a direct
    groupBy(user_id) — the oracle checks that."""
    e = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(NUM_SALTS))
    partial = (
        e.withColumn("salt", salt)
        .groupBy("user_id", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(
                F.floor(F.col("value") * F.lit(10000.0) + F.lit(0.5))
            ).alias("pq"),
        )
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            (F.sum("pq") / F.lit(10000.0)).alias("sum_value"),
        )
        .orderBy("user_id")
    )


SALTED_AGG_ORACLE = f"""
SELECT user_id,
       count(*) AS n_events,
       {duck_qsum('value', 4)} AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def salted_join_events_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events >< customer on user_id with an 8-way salted join:
    the customer side is replicated once per salt value, the events
    side gets a deterministic per-row salt, and the equi-join runs
    on (key, salt) so a hot user fans out over 8 reducers.  Output
    equals the plain inner join (oracle-checked)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    # map-side replication: explode a salt array per row — no join
    # operator at all (cleaner than crossJoin against a salts df)
    c_rep = c.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(NUM_SALTS - 1)))
    )
    e_salted = e.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(NUM_SALTS))
    )
    joined = e_salted.join(
        c_rep,
        (e_salted.user_id == c_rep.c_custkey)
        & (e_salted.salt == c_rep.salt),
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            qsum("value", 4).alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


SALTED_JOIN_ORACLE = f"""
SELECT c_mktsegment,
       count(*) AS n_events,
       {duck_qsum('value', 4)} AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


register("salted_agg_user_stats", salted_agg_user_stats, SALTED_AGG_ORACLE)
register(
    "salted_join_events_customer",
    salted_join_events_customer,
    SALTED_JOIN_ORACLE,
)
