"""Frequent-item mining at scale — exact heavy hitters via a
bounded-memory Misra–Gries candidate pass, and A-priori frequent
pair mining with broadcast support pruning.

Published sources: the Misra–Gries summary ("Finding repeated
elements", Sci. Comput. Program. 1982) and its mergeability
analysis (Agarwal et al., "Mergeable summaries", PODS 2012) — the
per-partition summaries here union into a candidate superset with
the same guarantee; A-priori candidate pruning is Agrawal & Srikant
(VLDB 1994).

Scale notes (100 TB):
- `heavy_hitters_users` is a TWO-PASS exact algorithm: pass 1 runs
  a capacity-bounded Misra–Gries sketch inside each Arrow batch
  stream (`mapInPandas`, O(capacity) state per partition, zero
  shuffle), guaranteeing every key with global frequency
  > N/(capacity+1) survives in some partition's summary; pass 2
  recounts ONLY the candidate keys (broadcast semi-join prunes the
  shuffle to candidate rows) and applies the exact integer
  threshold.  The final groupBy shuffles candidate rows, not the
  full keyspace — on a 1000-executor cluster the sketch pass is
  embarrassingly parallel and the recount shuffle is bounded by
  (candidates x partitions).
- `frequent_pairs_apriori` never builds the raw pair space: the
  monotonicity prefilter (a pair can only be frequent if both items
  are) broadcast-joins the frequent-item set against the fact rows
  BEFORE the pair self-join, so the quadratic-per-basket explosion
  runs on the pruned baskets only.  The self-join is an equi-join
  on the basket key (shuffle co-partitioned, never cartesian).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# Misra–Gries capacity: guarantees candidates cover every key with
# count > N/(MG_CAPACITY+1); the final filter uses the same bound.
MG_CAPACITY = 124
MG_DENOM = MG_CAPACITY + 1
# A-priori: item must appear in > AVG_MULT_BP/10000 x avg baskets;
# surviving pairs need >= PAIR_MIN_SUPPORT co-occurrences.
ITEM_AVG_MULT_BP = 12000
PAIR_MIN_SUPPORT = 3


def heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over events.user_id: every user with
    strictly more than 1/125th of all events.

    Pass 1 (candidate generation) is a per-partition Misra–Gries
    summary with MG_CAPACITY counters: batch-exact counts merge into
    the running summary, and when the summary exceeds capacity every
    counter drops by the (capacity+1)-th largest value (counters
    <= 0 evicted).  Each eviction removes >= (capacity+1) x cut of
    mass, so total decrement <= N_p/(capacity+1) — any key absent
    from every partition summary has global count <= N/(capacity+1),
    i.e. the union of summaries is a guaranteed superset of the
    heavy hitters.  Pass 2 recounts candidates exactly and keeps
    cnt * 125 > N (pure integer arithmetic — no float parity risk).
    The oracle is a plain SQL HAVING: it verifies the MG superset
    guarantee end-to-end, since a missed candidate would surface as
    a missing output row.
    """
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("bigint").alias("user_id")
    )

    def mg_candidates(batches):
        import pandas as pd

        counters: dict[int, int] = {}
        for pdf in batches:
            for key, cnt in pdf["user_id"].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > MG_CAPACITY:
                cut = sorted(counters.values(), reverse=True)[MG_CAPACITY]
                counters = {
                    k: v - cut for k, v in counters.items() if v > cut
                }
        yield pd.DataFrame({"user_id": list(counters.keys())}).astype("int64")

    candidates = events.mapInPandas(mg_candidates, "user_id bigint").distinct()
    total = events.agg(F.count("*").alias("n_total"))
    counts = (
        events.join(F.broadcast(candidates), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * MG_DENOM > F.col("n_total"))
        .select("user_id", "cnt", "n_total")
        .orderBy(F.col("cnt").desc(), "user_id")
    )


HEAVY_HITTERS_USERS_ORACLE = f"""
WITH counts AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
),
total AS (SELECT count(*) AS n_total FROM events)
SELECT CAST(user_id AS BIGINT) AS user_id, cnt, n_total
FROM counts, total
WHERE cnt * {MG_DENOM} > n_total
ORDER BY cnt DESC, user_id
"""


def frequent_pairs_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs co-ordered in the same order (market
    basket), mined A-priori style.

    Baskets are distinct (orderkey, partkey) rows.  Level 1 keeps
    parts whose basket count strictly exceeds 1.2x the mean basket
    count (a data-adaptive support floor — non-degenerate at every
    scale factor); the frequent-item set broadcasts back onto the
    baskets BEFORE any pair is formed, so the per-basket quadratic
    join runs on pruned baskets only.  Level 2 self-joins pruned
    baskets on orderkey with p1 < p2 and keeps pairs with support
    >= PAIR_MIN_SUPPORT.
    """
    # cache the deduped baskets: the frequency count and the pruned
    # self-join both read them; at bench scale the cache is a few MB
    # of bigint pairs (at 100 TB you would persist to DISK_ONLY or
    # recompute — the plan shape is unchanged either way)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
        )
        .distinct()
        .cache()
    )
    item_counts = li.groupBy("pkey").agg(F.count("*").alias("item_n"))
    # data-adaptive floor: avg basket count x 1.2, exact integer compare
    # (item_n * n_items * 10000 > total_baskets * 12000)
    totals = item_counts.agg(
        F.sum("item_n").alias("sum_n"), F.count("*").alias("n_items")
    )
    frequent_items = (
        item_counts.crossJoin(F.broadcast(totals))
        .where(
            F.col("item_n") * F.col("n_items") * 10000
            > F.col("sum_n") * ITEM_AVG_MULT_BP
        )
        .select("pkey")
    )
    pruned = li.join(F.broadcast(frequent_items), "pkey", "left_semi")
    a = pruned.select(F.col("okey"), F.col("pkey").alias("p1"))
    b = pruned.select(F.col("okey"), F.col("pkey").alias("p2"))
    pairs = a.join(b, "okey").where(F.col("p1") < F.col("p2"))
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= PAIR_MIN_SUPPORT)
        .orderBy(F.col("support").desc(), "p1", "p2")
    )


FREQUENT_PAIRS_APRIORI_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
),
item_counts AS (
  SELECT pkey, count(*) AS item_n FROM baskets GROUP BY pkey
),
totals AS (
  SELECT CAST(sum(item_n) AS BIGINT) AS sum_n, count(*) AS n_items
  FROM item_counts
),
frequent_items AS (
  SELECT pkey FROM item_counts, totals
  WHERE item_n * n_items * 10000 > sum_n * {ITEM_AVG_MULT_BP}
),
pruned AS (
  SELECT b.okey, b.pkey FROM baskets b
  WHERE b.pkey IN (SELECT pkey FROM frequent_items)
)
SELECT a.pkey AS p1, b.pkey AS p2, count(*) AS support
FROM pruned a JOIN pruned b ON a.okey = b.okey AND a.pkey < b.pkey
GROUP BY 1, 2
HAVING count(*) >= {PAIR_MIN_SUPPORT}
ORDER BY support DESC, p1, p2
"""


register("heavy_hitters_users", heavy_hitters_users, HEAVY_HITTERS_USERS_ORACLE)
register(
    "frequent_pairs_apriori", frequent_pairs_apriori, FREQUENT_PAIRS_APRIORI_ORACLE
)
