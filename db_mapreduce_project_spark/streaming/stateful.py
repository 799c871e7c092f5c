"""Custom stateful streaming operator: per-user running totals via
``applyInPandasWithState`` — the pluggable-reduce analogue of the
reference's hardcoded `reduce` (maprdeuce.cpp:288-331), generalized
to arbitrary user state over an unbounded stream.

State design for scale:
- keyed by user_id -> state is partitioned exactly like the shuffle,
  one small fixed-size record per key (two bigints), no growth with
  event count;
- the running sum is kept QUANTIZED (bigint of value*10^4) so state
  merges are exact integer adds — associative, replay-safe, and
  bit-identical to the batch aggregate regardless of batch slicing;
- Arrow-batched (applyInPandas*, never row-at-a-time Python).

The batch query `events_user_totals` computes the same result
relationally with a DuckDB oracle; tests replay the stream with
availableNow and assert final state == batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import duck_qsum, qsum
from ..io import load_table
from ..registry import register

QSCALE = 4  # quantize value at 1e-4 — matches stable.qsum(value, 4)

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_value DOUBLE"
STATE_SCHEMA = "n BIGINT, qs BIGINT"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state,  # GroupState
) -> Iterator[pd.DataFrame]:
    """Fold a micro-batch of one user's events into (count,
    quantized-sum) state; emit the running totals."""
    n, qs = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        qs += int(
            np.floor(pdf["value"].to_numpy() * 10.0**QSCALE + 0.5).sum()
        )
    state.update((n, qs))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [qs / 10.0**QSCALE],
        }
    )


def stream_user_totals(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_user_totals"
):
    """Streaming runner: stateful per-user totals, update mode,
    availableNow replay, memory sink.  Returns the StreamingQuery."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .jobs import _stream_events

    ev = _stream_events(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def events_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of the stateful operator (same quantized
    arithmetic -> exact equality with the streaming final state)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            qsum("value", QSCALE).alias("sum_value"),
        )
        .orderBy("user_id")
    )


EVENTS_USER_TOTALS_ORACLE = f"""
SELECT user_id,
       count(*) AS n_events,
       {duck_qsum('value', QSCALE)} AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


register("events_user_totals", events_user_totals, EVENTS_USER_TOTALS_ORACLE)
