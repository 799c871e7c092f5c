"""Behavioral / product-analytics query shapes over the event
stream: ordered funnel conversion and day-N cohort retention.
Neither exists in the reference (maprdeuce.cpp is word count only);
both are core to any event-analytics engine and exercise the
conditional-aggregation + self-comparison patterns at scale.

Scale notes:
* funnel_conversion folds each user's history into three MIN(ts
  WHERE type=step) aggregates in ONE groupBy — no self-joins, no
  per-step passes.  Step ordering is then a row-local comparison.
  Cost: one shuffle on user_id regardless of funnel depth.
* cohort_retention derives each user's cohort (first-seen day) with
  the same single-shuffle min() aggregate, broadcast-joins it back
  onto the (already user_id-partitioned) activity set, and counts
  distinct users per (cohort, day-offset).  Two shuffles total; the
  cohort map is |users| rows — broadcastable far beyond fixture
  scale (1e8 users x 16B ≈ 1.6 GB would switch to a shuffle join,
  which AQE picks automatically when the size estimate crosses the
  threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import qint
from ..io import load_table
from ..registry import register


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase ordered funnel: per-user first
    timestamp of each step, counted when steps happen in order."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    did_view = F.col("t_view").isNotNull()
    did_click = did_view & F.col("t_click").isNotNull() & (
        F.col("t_click") > F.col("t_view")
    )
    did_purchase = did_click & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") > F.col("t_click")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(did_view.cast("bigint")).alias("step_view"),
        F.sum(did_click.cast("bigint")).alias("step_view_click"),
        F.sum(did_purchase.cast("bigint")).alias("step_view_click_purchase"),
    )


FUNNEL_ORACLE = """
WITH per_user AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS step_view,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS step_view_click,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS step_view_click_purchase
FROM per_user
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N retention: users grouped by first-seen day (cohort),
    distinct active users per (cohort, day offset)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    cohorts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(cohorts, "user_id")
        .withColumn("day_n", F.datediff("day", "cohort_day"))
        .groupBy("cohort_day", "day_n")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "day_n")
    )


COHORT_ORACLE = """
WITH activity AS (
    SELECT user_id, date_trunc('day', ts) AS day FROM events),
cohorts AS (
    SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_n,
       count(DISTINCT a.user_id) AS active_users
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY cohort_day, day_n
ORDER BY cohort_day, day_n
"""


WAU_WINDOW_DAYS = 7


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness for every active day.

    The textbook formulation is a range join (events within 7 days
    of each report day) + COUNT(DISTINCT) — a scale-killer, since
    range joins don't hash-partition.  The scale-correct rewrite
    used here: collapse events to distinct (user, day) FIRST, then
    fan each user-day out to the <=7 report days it contributes to
    (bounded map-side explode), dedup, and count — every step is an
    equi-shuffle with map-side combine, and the fan-out factor is
    the window length, not the data size.
    """
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    fan = ud.select(
        "user_id",
        F.explode(
            F.expr(
                f"sequence(d, d + interval {WAU_WINDOW_DAYS - 1} days,"
                " interval 1 day)"
            )
        ).alias("report_day"),
    ).distinct()
    wau = fan.groupBy("report_day").agg(
        F.count(F.lit(1)).alias("wau")
    )
    dau = ud.groupBy(F.col("d").alias("report_day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        dau.join(wau, "report_day")
        .select(
            F.col("report_day").cast("timestamp").alias("report_day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
        .orderBy("report_day")
    )


ROLLING_ACTIVE_USERS_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
),
fan AS (
  SELECT DISTINCT user_id,
         d + k * INTERVAL 1 DAY AS report_day
  FROM ud, unnest(generate_series(0, {WAU_WINDOW_DAYS - 1})) AS t(k)
),
wau AS (
  SELECT report_day, count(*) AS wau FROM fan GROUP BY report_day
),
dau AS (
  SELECT d AS report_day, count(*) AS dau FROM ud GROUP BY d
)
SELECT CAST(d.report_day AS TIMESTAMP) AS report_day,
       d.dau, w.wau,
       CAST(d.dau AS DOUBLE) / w.wau AS stickiness
FROM dau d JOIN wau w USING (report_day)
ORDER BY report_day
"""


register("funnel_conversion", funnel_conversion, FUNNEL_ORACLE)
register("cohort_retention", cohort_retention, COHORT_ORACLE)
register("rolling_active_users", rolling_active_users, ROLLING_ACTIVE_USERS_ORACLE)


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream:
    counts and probabilities of event_type -> next event_type within
    each user's timeline (ts, event_id total order).

    One shuffle: the lag window partitions by user_id; the
    transition count aggregates the (from, to) pairs (25 keys) with
    map-side combine.  The probability is a ratio of exact integer
    counts — the row-count denominator comes from a window over the
    25-row count table, not a re-scan."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return (
        trans.withColumn("n_from", F.sum("n").over(w_from))
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n") / F.col("n_from")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


EVENT_TRANSITION_MATRIX_ORACLE = """
WITH seq AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, count(*) AS n
  FROM seq WHERE from_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
FROM trans
ORDER BY from_type, to_type
"""


def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> first-purchase conversion delay, summarized per
    signup cohort month: converted-user count and the exact integer
    median delay in hours (histogram-free here: the per-cohort
    groups are small after the first-touch aggregate, so a
    partitioned window ranks them — the per-group selection pattern
    from operators/selection.py is the escalation when cohorts stay
    corpus-sized).

    ONE shuffle computes both first touches (conditional MIN in the
    same groupBy); the cohort summary aggregates the users-sized
    result."""
    e = load_table(spark, sf_dir, "events")
    first_touch = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "signup_ts"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "purchase_ts"
        ),
    )
    conv = first_touch.where(
        F.col("signup_ts").isNotNull()
        & (F.col("purchase_ts") > F.col("signup_ts"))
    ).select(
        F.date_trunc("MONTH", F.col("signup_ts")).alias("cohort_month"),
        (
            (
                F.unix_timestamp("purchase_ts")
                - F.unix_timestamp("signup_ts")
            )
            / 3600
        ).cast("bigint").alias("delay_hours"),
    )
    w = Window.partitionBy("cohort_month").orderBy("delay_hours")
    ranked = conv.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_conv", F.count("*").over(Window.partitionBy("cohort_month"))
    )
    return (
        ranked.where(F.col("rn") == F.expr("(n_conv + 1) DIV 2"))
        .select("cohort_month", "n_conv", F.col("delay_hours").alias("median_delay_hours"))
        .orderBy("cohort_month")
    )


TIME_TO_CONVERT_ORACLE = """
WITH first_touch AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS purchase_ts
  FROM events GROUP BY user_id
),
conv AS (
  SELECT date_trunc('month', signup_ts) AS cohort_month,
         CAST((CAST(floor(epoch(purchase_ts)) AS BIGINT)
               - CAST(floor(epoch(signup_ts)) AS BIGINT)) // 3600
              AS BIGINT) AS delay_hours
  FROM first_touch
  WHERE signup_ts IS NOT NULL AND purchase_ts > signup_ts
),
ranked AS (
  SELECT cohort_month, delay_hours,
         row_number() OVER (PARTITION BY cohort_month
                            ORDER BY delay_hours) AS rn,
         count(*) OVER (PARTITION BY cohort_month) AS n_conv
  FROM conv
)
SELECT cohort_month, n_conv, delay_hours AS median_delay_hours
FROM ranked
WHERE rn = (n_conv + 1) // 2
ORDER BY cohort_month
"""

register(
    "event_transition_matrix",
    event_transition_matrix,
    EVENT_TRANSITION_MATRIX_ORACLE,
)
register("time_to_convert", time_to_convert, TIME_TO_CONVERT_ORACLE)


def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive
    active days.  island_id = day_number - dense_rank (constant
    within a consecutive run — the classic integer trick), so runs
    fall out of a plain groupBy with no self-join or recursive pass.

    Two keyed shuffles (distinct user-days; the rank window), both
    partitioned by user_id — nothing global.  Output: per-streak-
    length user counts plus the longest streak (bounded rows)."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.datediff(
            F.date_trunc("DAY", F.col("ts")), F.lit("1970-01-01").cast("date")
        ).alias("dayn"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("dayn")
    islands = ud.withColumn(
        "island", F.col("dayn") - F.dense_rank().over(w)
    )
    streaks = (
        islands.groupBy("user_id", "island")
        .agg(F.count("*").alias("streak_days"))
        .groupBy("user_id")
        .agg(F.max("streak_days").alias("longest_streak"))
    )
    return (
        streaks.groupBy("longest_streak")
        .agg(F.count("*").alias("n_users"))
        .orderBy("longest_streak")
    )


ACTIVITY_STREAKS_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS dayn
  FROM events
),
islands AS (
  SELECT user_id, dayn,
         dayn - dense_rank() OVER (PARTITION BY user_id ORDER BY dayn)
           AS island
  FROM ud
),
streaks AS (
  SELECT user_id, max(cnt) AS longest_streak
  FROM (
    SELECT user_id, island, count(*) AS cnt
    FROM islands GROUP BY user_id, island
  ) s
  GROUP BY user_id
)
SELECT CAST(longest_streak AS BIGINT) AS longest_streak,
       count(*) AS n_users
FROM streaks
GROUP BY longest_streak
ORDER BY longest_streak
"""

register("activity_streaks", activity_streaks, ACTIVITY_STREAKS_ORACLE)


# EWMA smoothing factor alpha = EWMA_NUM / EWMA_DEN = 0.3
EWMA_NUM = 3
EWMA_DEN = 10


def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values — the inherently SEQUENTIAL
    per-key fold (each state depends on the previous), which no
    window frame or aggregate expresses: the designed escalation is
    applyInPandas, one Arrow-batched Python fold per user group.

    All arithmetic is integer: values quantize to 1e-4 ints
    (functions/stable.py) and the update is
    s_t = ((DEN-NUM)*s + NUM*q) DIV DEN with every term
    non-negative (events.value >= 0), so floor/truncate division
    agree and DuckDB's ordered list_reduce reproduces the fold
    bit-for-bit — a full value-hash oracle for a stateful Python
    operator.

    Scale shape: ONE shuffle (repartition on user_id) + an in-
    partition sort, then a mapInPandas STREAM per partition that
    carries the running (user, state, count) across Arrow batch
    boundaries — 32 partition streams instead of one pandas frame
    per user (measured ~2x vs applyInPandas per-group at sf0.1:
    per-group frame construction dominates when groups are small).
    Per-stream state is O(1); a hot user is AQE-skew territory, not
    a memory risk.  The streaming twin is applyInPandasWithState /
    transformWithState (streaming/stateful.py) with the same
    update rule."""
    import pandas as pd

    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", qint("value", 4).alias("q"))
        .repartition(F.col("user_id"))
        .sortWithinPartitions("user_id", "ts", "event_id")
    )

    def fold_stream(batches):
        cur = None
        s = 0
        n = 0
        out_u: list[int] = []
        out_n: list[int] = []
        out_e: list[float] = []
        for pdf in batches:
            # tolist(): folding native Python ints beats iterating
            # boxed numpy scalars, and Python ints cannot overflow
            # the (DEN-NUM)*s intermediate
            for u, q in zip(pdf["user_id"].tolist(), pdf["q"].tolist()):
                if u != cur:
                    if cur is not None:
                        out_u.append(cur)
                        out_n.append(n)
                        out_e.append(s / 10000.0)
                    cur, s, n = u, q, 1
                else:
                    s = ((EWMA_DEN - EWMA_NUM) * s + EWMA_NUM * q) // EWMA_DEN
                    n += 1
        if cur is not None:
            out_u.append(cur)
            out_n.append(n)
            out_e.append(s / 10000.0)
        yield pd.DataFrame(
            {"user_id": out_u, "n_events": out_n, "ewma": out_e}
        )

    return (
        e.mapInPandas(fold_stream, "user_id bigint, n_events bigint, ewma double")
        .orderBy("user_id")
    )


USER_VALUE_EWMA_ORACLE = f"""
SELECT user_id, count(*) AS n_events,
       CAST(list_reduce(
         list(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
              ORDER BY ts, event_id),
         (acc, q) -> ({EWMA_DEN - EWMA_NUM} * acc + {EWMA_NUM} * q)
                     // {EWMA_DEN}) AS BIGINT) / 10000.0 AS ewma
FROM events
GROUP BY user_id
ORDER BY user_id
"""

register("user_value_ewma", user_value_ewma, USER_VALUE_EWMA_ORACLE)
