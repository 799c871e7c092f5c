"""Property-based test of the watermark-safe stateful sessionizer
(`streaming/stateful.py::_update_sessions`) WITHOUT Spark: the
handler is driven through a faked GroupState over randomized event
streams, arrival orders, and micro-batch slicings, with the
watermark advanced exactly as Spark does (ms-truncated max event
time minus the delay, applied one batch late).  The invariant under
test is the operator's whole contract:

    emitted sessions == microsecond-exact batch sessionization of
    the DELIVERED events, restricted to sessions whose
    end + gap the final watermark strictly passed

for EVERY slicing — including slicings where a later batch delivers
an event that bridges segments an earlier batch saw separated (the
round-6 ADVICE scenario), duplicate timestamps, and gaps exactly at
the 1800 s boundary.  The pure-Python reference model is
independent of the handler's merge code.

What this does NOT cover (Spark-side, covered by the streaming
tests): the late-row filter boundary, state encoding, timer
delivery.  Here timers are modeled as Spark documents them: a key's
timeout fires only in a batch where the key has no data and the
watermark has passed the set timestamp.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_mapreduce_project_spark.streaming.stateful import (
    QSCALE,
    SESSION_GAP_S,
    _update_sessions,
)

GAP_US = SESSION_GAP_S * 1_000_000
DELAY_MS = 600_000  # the pipeline's 10-minute watermark


class FakeGroupState:
    """The subset of pyspark's GroupState the handler touches."""

    def __init__(self):
        self._v = None
        self.timer_ms = None
        self.wm_ms = 0
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        assert self._v is not None
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None
        self.timer_ms = None

    def setTimeoutTimestamp(self, ms):
        # Spark rejects timers at or behind the watermark
        assert ms > self.wm_ms, (ms, self.wm_ms)
        self.timer_ms = ms

    def getCurrentWatermarkMs(self):
        return self.wm_ms


def _invoke(state, events_us_vals):
    """One handler invocation; returns emitted (start, end, n, qv)."""
    if events_us_vals:
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    [e[0] for e in events_us_vals], unit="us"
                ),
                "value": [e[1] for e in events_us_vals],
            }
        )
        pdfs = [pdf]
    else:
        pdfs = []
    out = []
    for frame in _update_sessions((1,), pdfs, state):
        for r in frame.itertuples(index=False):
            out.append(
                (
                    r.session_start.value // 1000,  # ns -> us
                    r.session_end.value // 1000,
                    int(r.n_events),
                    round(float(r.total_value), QSCALE),
                )
            )
    return out


def _reference_sessions(delivered):
    """Microsecond-exact batch sessionization (merge at diff <= gap)
    of the delivered (ts_us, value) events, with quantized sums."""
    if not delivered:
        return []
    evs = sorted(delivered, key=lambda e: e[0])
    sessions = []
    cur = None
    import math

    for ts, v in evs:
        qv = int(math.floor(v * 10.0**QSCALE + 0.5))
        if cur is None or ts - cur[1] > GAP_US:
            if cur is not None:
                sessions.append(tuple(cur))
            cur = [ts, ts, 1, qv]
        else:
            cur[1] = max(cur[1], ts)
            cur[2] += 1
            cur[3] += qv
    sessions.append(tuple(cur))
    return sessions


# timestamps on a grid that forces exact-gap boundaries and
# duplicates; values exact at the quantization step
EVENT = st.tuples(
    st.integers(min_value=0, max_value=12).map(
        lambda k: 1_000_000_000_000 + k * (GAP_US // 2)
    ),
    st.sampled_from([0.1, 0.25, 1.0, 2.5]),
)


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=0, max_size=12),
    order=st.randoms(use_true_random=False),
    n_batches=st.integers(min_value=1, max_value=5),
)
def test_sessionizer_equals_reference_for_every_slicing(
    events, order, n_batches
):
    arrival = list(events)
    order.shuffle(arrival)
    # random contiguous slicing of the arrival order into batches
    cuts = sorted(
        order.sample(range(len(arrival) + 1), min(n_batches - 1, len(arrival)))
    ) if arrival else []
    batches, prev = [], 0
    for c in [*cuts, len(arrival)]:
        batches.append(arrival[prev:c])
        prev = c

    state = FakeGroupState()
    emitted = []
    delivered = []
    max_ms_seen = None
    for batch in batches:
        # Spark's late filter: rows below the CURRENT watermark never
        # reach the operator
        live = [e for e in batch if e[0] >= state.wm_ms * 1000]
        delivered.extend(live)
        # a key's timer fires only in a batch without data for it
        if not live and state.exists and (
            state.timer_ms is not None and state.timer_ms < state.wm_ms
        ):
            state.hasTimedOut = True
            emitted.extend(_invoke(state, []))
            state.hasTimedOut = False
        elif live:
            emitted.extend(_invoke(state, live))
        for ts, _ in live:
            ms = ts // 1000
            max_ms_seen = ms if max_ms_seen is None else max(max_ms_seen, ms)
        # watermark advances AFTER the batch (used by the next one)
        if max_ms_seen is not None:
            state.wm_ms = max(state.wm_ms, max_ms_seen - DELAY_MS)

    # availableNow tail: expired timers fire in final empty batches
    for _ in range(3):
        if state.exists and (
            state.timer_ms is not None and state.timer_ms < state.wm_ms
        ):
            state.hasTimedOut = True
            emitted.extend(_invoke(state, []))
            state.hasTimedOut = False
        else:
            break

    wm_us = state.wm_ms * 1000
    want = [
        (s[0], s[1], s[2], round(s[3] / 10.0**QSCALE, QSCALE))
        for s in _reference_sessions(delivered)
        if s[1] + GAP_US < wm_us
    ]
    assert sorted(emitted) == sorted(want)
    # and the retained state is exactly the NOT-yet-closable sessions
    n_pending = len(_reference_sessions(delivered)) - len(want)
    if state.exists:
        assert len(state.get[0]) == n_pending
    else:
        assert n_pending == 0


def test_timer_fires_when_final_watermark_lands_exactly_on_boundary():
    """Round-7 ADVICE regression: a session is closable once
    wm_ms >= close_ms + 1 (close_ms = end_us//1000 + gap_ms), and
    Spark's event-time timers fire only when timer_ms < wm_ms
    STRICTLY.  Arming the timer at close_ms + 1 therefore strands the
    session forever when the FINAL watermark lands exactly on
    close_ms + 1 — the fixed handler arms at close_ms, which fires
    exactly at closability.  The 900 s grid of the property test can
    never produce this boundary, so it is pinned here explicitly."""
    base_us = 1_000_000_000_000  # multiple of 1000 -> exact ms
    gap_ms = SESSION_GAP_S * 1_000
    close_ms = base_us // 1000 + gap_ms
    # second segment chosen so the final watermark is EXACTLY
    # close_ms + 1: wm_ms = ts2_ms - DELAY_MS = close_ms + 1
    ts2_us = (close_ms + 1 + DELAY_MS) * 1000
    assert ts2_us - base_us > GAP_US  # really a separate segment

    state = FakeGroupState()
    emitted = list(_invoke(state, [(base_us, 1.0)]))
    state.wm_ms = base_us // 1000 - DELAY_MS
    emitted += _invoke(state, [(ts2_us, 1.0)])
    state.wm_ms = ts2_us // 1000 - DELAY_MS
    assert state.wm_ms == close_ms + 1  # the exact boundary
    assert emitted == []  # nothing closable yet at arming time
    # final empty batch: the timer MUST fire (timer_ms < wm_ms) and
    # emit the first segment, now closable per end + gap < wm
    assert state.timer_ms is not None and state.timer_ms < state.wm_ms
    state.hasTimedOut = True
    emitted += _invoke(state, [])
    state.hasTimedOut = False
    assert emitted == [(base_us, base_us, 1, 1.0)]
    # the second segment stays pending, timer re-armed ahead of wm
    assert state.exists and len(state.get[0]) == 1
    assert state.timer_ms > state.wm_ms
