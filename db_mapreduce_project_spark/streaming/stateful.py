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


# ---------------------------------------------------------------
# Gap-based sessionization with EVENT-TIME TIMEOUT EVICTION — the
# custom stateful operator shape session stores are built on: state
# is the one open session per user; sessions close either
# intra-batch (a gap inside the arriving data) or via the watermark
# clock (GroupStateTimeout.EventTimeTimeout fires once the
# watermark passes session_end + gap, emitting and evicting the
# state).  Without timeout eviction an idle user's open session
# would pin state forever — eviction is what bounds state size at
# 100 TB, not the watermark alone.
#
# The batch twin is operators/windows.py::sessionize (oracled as
# sessionize_events); tests assert the streamed CLOSED sessions
# match the batch sessions that are closable under the final
# watermark, value-for-value (quantized sums — exact integers).
# ---------------------------------------------------------------

SESSION_GAP_S = 1800
SESSION_OUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events BIGINT, total_value DOUBLE"
)
SESSION_STATE_SCHEMA = "start_us BIGINT, end_us BIGINT, n BIGINT, qv BIGINT"


def _session_frame(user_id, segs):
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(segs),
            "session_start": [pd.Timestamp(s[0], unit="us") for s in segs],
            "session_end": [pd.Timestamp(s[1], unit="us") for s in segs],
            "n_events": [s[2] for s in segs],
            "total_value": [s[3] / 10.0**QSCALE for s in segs],
        }
    )


def _update_sessions(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state,  # GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch into the open-session state;
    emit every session closed by an intra-batch gap, and on
    watermark timeout emit + evict the final open session."""
    gap_us = SESSION_GAP_S * 1_000_000
    if state.hasTimedOut:
        st, en, n, qv = state.get
        state.remove()
        yield _session_frame(key[0], [(st, en, n, qv)])
        return

    ts_parts, val_parts = [], []
    for pdf in pdfs:
        # unit-explicit: Arrow->pandas may deliver datetime64[ns] or
        # [us] depending on conversion defaults; casting through
        # datetime64[us] is correct for both
        ts_parts.append(
            pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        )
        val_parts.append(
            np.floor(pdf["value"].to_numpy() * 10.0**QSCALE + 0.5).astype(
                "int64"
            )
        )
    ts = np.concatenate(ts_parts) if ts_parts else np.empty(0, dtype="int64")
    vals = (
        np.concatenate(val_parts) if val_parts else np.empty(0, dtype="int64")
    )
    if len(ts) == 0:
        # defensive: invoked with neither data nor timeout — keep the
        # open session and its timer as they were
        if state.exists:
            st, en, n, qv = state.get
            state.setTimeoutTimestamp(
                max(
                    en // 1000 + SESSION_GAP_S * 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        return
    order = np.argsort(ts, kind="stable")
    ts, vals = ts[order], vals[order]

    closed: list[tuple[int, int, int, int]] = []
    # vectorized gap split of the batch into session segments
    breaks = np.nonzero(np.diff(ts) > gap_us)[0]
    bounds = [0, *list(breaks + 1), len(ts)]
    segs = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        segs.append(
            (int(ts[lo]), int(ts[hi - 1]), hi - lo, int(vals[lo:hi].sum()))
        )
    if state.exists:
        st, en, n, qv = state.get
        if segs and segs[0][0] - en <= gap_us:
            s0 = segs[0]
            segs[0] = (min(st, s0[0]), max(en, s0[1]), n + s0[2], qv + s0[3])
        else:
            closed.append((st, en, n, qv))
    closed.extend(segs[:-1])
    st, en, n, qv = segs[-1]
    state.update((st, en, n, qv))
    # arm the event-time timer at session_end + gap; must stay ahead
    # of the current watermark or Spark rejects it (a session already
    # closable when processed times out on the next clock tick)
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(en // 1000 + SESSION_GAP_S * 1000, wm_ms + 1))
    if closed:
        yield _session_frame(key[0], closed)


def stream_sessionize(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_sessions"
):
    """Streaming runner: watermarked stream -> stateful gap
    sessionizer with event-time timeout eviction, append mode,
    availableNow replay, memory sink."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .jobs import _stream_events

    ev = (
        _stream_events(spark, sf_dir)
        .select("user_id", "ts", "value")
        .withWatermark("ts", "10 minutes")
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
