"""Hypertable-style time-series rollups over the event stream —
the two downsampling operators every metrics/financial store ships
(cf. TimescaleDB's time_weighted_average and OHLC continuous
aggregates):

- `ohlc_bars`: per-hour open/high/low/close/volume candles per
  event type.  Open/close are argmin/argmax under the (ts,
  event_id) total order, computed as ONE lexicographic struct
  min/max per group — a single hash aggregate, no window sort.
- `time_weighted_avg_per_user`: per-user time-weighted average of
  `value` under last-observation-carried-forward semantics — the
  correct mean for irregularly-sampled series, where a plain AVG
  over-weights bursts.

Reference parity: the reference's only aggregate is a count
(SURVEY.md §2.1 #8); these extend the §2.2 aggregation/window
categories to the time-weighted forms.

Determinism: values quantize to 1e-4 integers before any
aggregation (stable.py discipline); interval lengths are exact
integer epoch-second differences (Spark `ts.cast(long)` truncates
toward zero like DuckDB's floor(epoch()), both sides mirrored);
the only division is one closing double divide per output row.

Scale shape (100 TB): OHLC is a pure map + one (bucket, type)-keyed
hash aggregate with map-side partials — output is bucket-cardinality.
The TWA's window keys on user_id (one shuffle); per-user state is a
single lead(), never a whole-series collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.stable import duck_qint, qint
from ..io import load_table
from ..registry import register

TS_VALUE_SCALE = 4  # value quantization (1e-4), matches events rollups


def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles per event type.

    open/close extract `vq` from the lexicographic min/max of the
    (ts, event_id, vq) struct — event_id is unique, so the total
    order makes both engines pick the identical row even with
    duplicate timestamps."""
    # explicit NULL-value filter: min/max over the (ts, event_id, vq)
    # STRUCT would still select a NULL-vq row (the struct is
    # non-NULL) while plain min/max(vq) skip it — open/close and
    # high/low must draw from the same row population
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.date_trunc("hour", "ts").alias("bucket_hour"),
            "event_type",
            "ts",
            "event_id",
            qint("value", TS_VALUE_SCALE).alias("vq"),
        )
    )
    scale = float(10**TS_VALUE_SCALE)
    return (
        e.groupBy("bucket_hour", "event_type")
        .agg(
            (F.min(F.struct("ts", "event_id", "vq"))["vq"] / scale).alias(
                "open"
            ),
            (F.max("vq") / scale).alias("high"),
            (F.min("vq") / scale).alias("low"),
            (F.max(F.struct("ts", "event_id", "vq"))["vq"] / scale).alias(
                "close"
            ),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("vq") / scale).alias("volume"),
        )
        .orderBy("bucket_hour", "event_type")
    )


_VQ = duck_qint("value", TS_VALUE_SCALE)
_VSCALE = f"{float(10**TS_VALUE_SCALE)!r}"

OHLC_BARS_ORACLE = f"""
WITH e AS (
  SELECT date_trunc('hour', ts) AS bucket_hour, event_type,
         ts, event_id, {_VQ} AS vq
  FROM events
  WHERE value IS NOT NULL
)
SELECT bucket_hour, event_type,
       (min(struct_pack(ts := ts, event_id := event_id, vq := vq))).vq
         / {_VSCALE} AS open,
       max(vq) / {_VSCALE} AS high,
       min(vq) / {_VSCALE} AS low,
       (max(struct_pack(ts := ts, event_id := event_id, vq := vq))).vq
         / {_VSCALE} AS close,
       count(*) AS n_events,
       CAST(sum(vq) AS BIGINT) / {_VSCALE} AS volume
FROM e
GROUP BY bucket_hour, event_type
ORDER BY bucket_hour, event_type
"""

register("ohlc_bars", ohlc_bars, OHLC_BARS_ORACLE)


def time_weighted_avg_per_user(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user time-weighted average of `value` (LOCF/left-Riemann:
    each observation holds until the next one), over users with at
    least two events:

        twa = Σ v_i · (t_{i+1} − t_i)  /  (t_n − t_1)

    The numerator sums exact integers (quantized value x integer
    epoch-second gap), so partial-agg order is irrelevant; one
    double divide closes it."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NULL observations carry nothing forward: drop them BEFORE the
    # lead so gaps bridge across them instead of producing NULL terms
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            qint("value", TS_VALUE_SCALE).alias("vq"),
        )
    )
    scale = float(10**TS_VALUE_SCALE)
    stepped = e.select(
        "user_id",
        "vq",
        (
            F.lead(F.col("ts").cast("long")).over(w)
            - F.col("ts").cast("long")
        ).alias("dt"),
    ).where(F.col("dt").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt").alias("span_sec"),
            F.sum(F.col("vq") * F.col("dt")).alias("wsum"),
        )
        # zero-span users (every event inside one epoch second) have
        # no defined TWA — and 0/0 diverges cross-engine (Spark NULL
        # vs DuckDB NaN), so the guard is a correctness requirement
        # of the parity gate, not just taste
        .where(F.col("span_sec") > 0)
        .select(
            "user_id",
            "n_intervals",
            "span_sec",
            (F.col("wsum") / (F.col("span_sec") * scale)).alias("twa"),
        )
        .orderBy("user_id")
    )


TIME_WEIGHTED_AVG_ORACLE = f"""
WITH e AS (
  SELECT user_id, ts, event_id, {_VQ} AS vq,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
  WHERE value IS NOT NULL
),
stepped AS (
  SELECT user_id, vq,
         lead(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - sec AS dt
  FROM e
)
SELECT user_id,
       count(*) AS n_intervals,
       CAST(sum(dt) AS BIGINT) AS span_sec,
       CAST(sum(vq * dt) AS DOUBLE)
         / (CAST(sum(dt) AS BIGINT) * {_VSCALE}) AS twa
FROM stepped
WHERE dt IS NOT NULL
GROUP BY user_id
HAVING CAST(sum(dt) AS BIGINT) > 0
ORDER BY user_id
"""

register(
    "time_weighted_avg_per_user",
    time_weighted_avg_per_user,
    TIME_WEIGHTED_AVG_ORACLE,
)
