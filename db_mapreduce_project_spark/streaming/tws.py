"""Per-user running totals on Spark 4's `transformWithStateInPandas`
(StatefulProcessor API) — the successor surface to
``applyInPandasWithState`` (streaming/stateful.py implements the
same operator on the legacy API; keeping both documents the
migration path).

Same scale design as stateful.py: state is one fixed-size record
per key, partitioned by the shuffle key; the running sum is kept
quantized (bigint of value*10^4) so state folds are exact integer
adds — associative, replay-safe, and bit-identical to the batch
aggregate `events_user_totals` regardless of micro-batch slicing.
transformWithStateInPandas additionally gives the engine-managed
state store (RocksDB on a real cluster) typed per-key ValueState,
timers, and TTL — none of which this operator needs, but the
surface is what a production 100 TB pipeline would extend.

Reference analogue: the hardcoded streaming-free `reduce`
(maprdeuce.cpp:288-331) — here as user-pluggable keyed state over
an unbounded stream.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

QSCALE = 4  # matches stable.qsum(value, 4) and stateful.QSCALE

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_value DOUBLE"


class UserTotalsProcessor(StatefulProcessor):
    """ValueState (n: bigint, qs: bigint) per user_id."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", "n BIGINT, qs BIGINT")

    def handleInputRows(
        self,
        key: tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timerValues,
    ) -> Iterator[pd.DataFrame]:
        n, qs = self._state.get() if self._state.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            qs += int(
                np.floor(pdf["value"].to_numpy() * 10.0**QSCALE + 0.5).sum()
            )
        self._state.update((n, qs))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [qs / 10.0**QSCALE],
            }
        )

    def close(self) -> None:
        pass


def stream_user_totals_tws(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_user_totals_tws"
):
    """Streaming runner on the new API: update mode, availableNow
    replay, memory sink.  Returns the StreamingQuery."""
    from .jobs import _stream_events

    ev = _stream_events(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
