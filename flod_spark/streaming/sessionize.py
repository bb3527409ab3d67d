"""Custom stateful streaming SESSIONIZER — applyInPandasWithState with
event-time timeouts (the second custom stateful operator next to
streaming/take.py, and the hand-rolled twin of session_window()).

Why build it when session_window exists: flod's stage-authoring model
(user struct with peek/consume methods, traits.d:64-92) maps to Spark's
arbitrary-stateful API, and a sessionizer exercises the parts take(n)
does not — event-time TIMEOUTS (watermark-driven state eviction) and
multi-field state merged across micro-batches.

Emission contract (what makes an exact oracle possible):
- a session CLOSED BY DATA (a later event of the same key beyond the
  gap) emits deterministically, independent of watermarks;
- a session still open at end-of-stream emits iff the final watermark
  passed its timeout: wm_ms > (last_us + gap_us) // 1000, with
  wm_ms = (max_event_us // 1000) - delay_ms — exactly Spark's
  millisecond watermark arithmetic (EventTimeWatermarkExec truncates
  event times to ms before the max/delay), replicated in the oracle;
  Spark's no-data micro-batch (on by default) guarantees the final
  timeout batch runs.

Scale: state is 3 longs per OPEN session per key, sharded by key hash;
the watermark bounds it to keys active in the last gap+delay window.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flod_spark.io import ts_micros
from flod_spark.streaming.windows import with_event_time

GAP_US = 30 * 60 * 1_000_000


def _fold_sessions(pdfs, start, last, n, gap_us):
    """Vectorized session fold over one key's micro-batch (round-10
    machinery diet — this replaced a per-event Python loop over the
    sorted timestamps): sessions are the maximal runs of the GLOBALLY
    sorted event times with consecutive gaps <= gap_us, found with one
    np.diff + flatnonzero; the carried open session either extends the
    first run (gap <= gap_us) or closes ahead of it. Returns
    (closed_starts, closed_ends, closed_ns, (start, last, n)) with the
    last run left OPEN as the new state; an empty batch returns the
    carry unchanged. One whole-batch sort (chunk-local sorts would let
    a later-chunk event with an earlier ts fold out of order — the
    _asof_enrich_fn lesson); tests/test_round10_props.py fuzzes this
    fold against the textbook per-event reference."""
    import numpy as np
    import pandas as pd

    chunks = list(pdfs)
    if not chunks:
        a = np.empty(0, dtype="int64")
    else:
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        a = np.sort(pdf["_us"].to_numpy("int64"))
    empty = np.empty(0, dtype="int64")
    if not a.size:
        return empty, empty, empty, (start, last, n)
    brk = np.flatnonzero(np.diff(a) > gap_us)
    s_idx = np.concatenate([np.zeros(1, dtype="int64"), brk + 1])
    e_idx = np.append(brk, a.size - 1)
    starts = a[s_idx]
    ends = a[e_idx]
    ns = (e_idx - s_idx + 1).astype("int64")
    carry_closed = start is not None and a[0] - last > gap_us
    if start is not None and not carry_closed:
        starts[0] = start
        ns[0] += n
    new_state = (int(starts[-1]), int(ends[-1]), int(ns[-1]))
    starts, ends, ns = starts[:-1], ends[:-1], ns[:-1]
    if carry_closed:
        starts = np.concatenate([np.array([start], dtype="int64"), starts])
        ends = np.concatenate([np.array([last], dtype="int64"), ends])
        ns = np.concatenate([np.array([n], dtype="int64"), ns])
    return starts, ends, ns, new_state


def streaming_sessionize(
    events: DataFrame,
    gap_us: int = GAP_US,
    watermark: str = "2 hours",
    key_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """(key, session_start_us, session_end_us, n_events) per closed
    session. Input is a streaming DF; rows of one key must arrive in
    event-time order ACROSS micro-batches (replay_stream guarantees it;
    within a batch we sort)."""
    src = (
        with_event_time(events, time_col)
        .withWatermark(time_col, watermark)
        .select(key_col, time_col, ts_micros(time_col).alias("_us"))
    )

    def sess_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "start_us": [start], "end_us": [last], "n_events": [n]}
            )
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        out_start, out_end, out_n, (start, last, n) = _fold_sessions(
            pdfs, start, last, n, gap_us
        )
        if start is None:  # defensively: invoked with no rows and no timeout
            return
        state.update((start, last, n))
        # event-time timeout: fires when the watermark passes the gap
        # after the last event (ms — Spark's watermark granularity)
        state.setTimeoutTimestamp((last + gap_us) // 1000)
        if len(out_start):
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out_start),
                    "start_us": out_start,
                    "end_us": out_end,
                    "n_events": out_n,
                }
            )

    return src.groupBy(key_col).applyInPandasWithState(
        sess_fn,
        outputStructType="key long, start_us long, end_us long, n_events long",
        stateStructType="start_us long, last_us long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    ).select(
        F.col("key").alias(key_col), "start_us", "end_us", "n_events"
    )


# ---- transformWithStateInPandas port (Spark 4 processor API) -----------
# Same sessionizer on the NEWER arbitrary-state surface: explicit
# StatefulProcessor object, named value state, first-class timers
# (registerTimer/handleExpiredTimer replaces GroupState's single
# setTimeoutTimestamp). The processor's Python worker requires
# google.protobuf at RUNTIME (state serialization protocol); this module
# stays importable without it — tws_available() gates execution, and the
# identical-output test (tests/test_streaming.py) lights up the day the
# environment gains protobuf. Semantics are kept field-for-field
# identical to streaming_sessionize's sess_fn so both surfaces share the
# same oracle.


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually RUN here (the
    processor worker imports google.protobuf)."""
    import importlib.util

    try:  # find_spec raises when the parent 'google' package is absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


class SessionizeProcessor(StatefulProcessor):
    """StatefulProcessor twin of sess_fn. The base class is importable
    without protobuf — only the RUNNING worker needs it, which
    tws_available() gates."""

    def __init__(self, gap_us: int = GAP_US):
        self.gap_us = gap_us

    def init(self, handle) -> None:
        self.handle = handle
        self.state = handle.getValueState("sess", "start_us long, last_us long, n long")

    def handleInputRows(self, key, rows, timerValues):
        if self.state.exists():
            start, last, n = self.state.get()
            # one live timer per key: drop the stale one before re-arming
            self.handle.deleteTimer((last + self.gap_us) // 1000)
        else:
            start, last, n = None, None, 0
        out_start, out_end, out_n, (start, last, n) = _fold_sessions(
            rows, start, last, n, self.gap_us
        )
        if start is None:
            return
        self.state.update((start, last, n))
        # event-time timer: fires when the watermark passes the gap
        # after the last event (ms — Spark's watermark granularity)
        self.handle.registerTimer((last + self.gap_us) // 1000)
        if len(out_start):
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out_start),
                    "start_us": out_start,
                    "end_us": out_end,
                    "n_events": out_n,
                }
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self.state.exists():
            start, last, n = self.state.get()
            self.state.clear()
            yield pd.DataFrame(
                {"key": [key[0]], "start_us": [start], "end_us": [last], "n_events": [n]}
            )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass  # no warm-start state in this pipeline

    def close(self) -> None:
        pass


def streaming_sessionize_tws(
    events: DataFrame,
    gap_us: int = GAP_US,
    watermark: str = "2 hours",
    key_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """transformWithStateInPandas form of streaming_sessionize — same
    inputs, same emission contract, same oracle. Raises ImportError
    with a clear message when the processor runtime is unavailable
    (tws_available() is the guard callers/tests use)."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf in the "
            "Python worker; use streaming_sessionize (applyInPandasWithState) "
            "in this environment"
        )
    src = (
        with_event_time(events, time_col)
        .withWatermark(time_col, watermark)
        .select(key_col, time_col, ts_micros(time_col).alias("_us"))
    )
    return src.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=SessionizeProcessor(gap_us),
        outputStructType="key long, start_us long, end_us long, n_events long",
        outputMode="append",
        timeMode="eventTime",
    ).select(F.col("key").alias(key_col), "start_us", "end_us", "n_events")
