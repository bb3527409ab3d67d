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


# Shard count for the packed-state form (r17): results are
# shard-count independent — a key's sessions never cross shards — so
# this is a machinery knob (Python invocations per trigger), not a
# semantics one. 8 matches the novelty/detector gates.
_SESS_SHARDS = 8


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
    within a batch we sort).

    r17 (guide §4): grouped by pmod(xxhash64(key), _SESS_SHARDS)
    instead of per key — one Python invocation + state round trip per
    SHARD per trigger, per-key session state packed inside the shard
    row (streaming/packfold.py), fold vectorized across keys. The
    per-key form registered one event-time timeout per key; the shard
    registers the MIN deadline of its open sessions and emits every
    session whose deadline the current watermark passed (wm_ms >
    (last_us + gap_us) // 1000 — the module's exact emission rule) on
    each invocation, re-arming with the next min. Equivalence of the
    eager per-invocation sweep: the watermark is monotone, so any
    session it emits would have emitted by per-key timeout in this or
    a later batch with the SAME (start, last, n) — any later event of
    that key passes the watermark filter (ts_ms >= wm > deadline),
    hence gap > gap_us, hence it could only have closed the carried
    session by data with identical values."""
    import numpy as np

    from flod_spark.streaming.packfold import (
        _gather,
        _lookup,
        _merge_packed,
        _packed_get,
        _segments,
    )

    src = (
        with_event_time(events, time_col)
        .withWatermark(time_col, watermark)
        .select(
            F.pmod(F.xxhash64(key_col), F.lit(_SESS_SHARDS)).alias("_shard"),
            F.col(key_col).alias("_k"),
            time_col,
            ts_micros(time_col).alias("_us"),
        )
    )

    def sess_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        su, sst, sla, sn = _packed_get(state, (1, 1, 1, 1))
        out = []  # (keys, starts, ends, ns) blocks to emit
        chunks = [] if state.hasTimedOut else list(pdfs)
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            uid = pdf["_k"].to_numpy("int64")
            us = pdf["_us"].to_numpy("int64")
            order = np.lexsort((us, uid))
            uid, us = uid.take(order), us.take(order)
            starts_m, seg, uu, inner, lens = _segments(uid)
            found, pos = _lookup(su, uu)
            st0 = _gather(sst, pos, found)
            la0 = _gather(sla, pos, found)
            n0 = _gather(sn, pos, found)
            # session runs: maximal per-key time runs with gaps <= gap
            prev = np.concatenate([[0], us[:-1]])
            brk = starts_m | ((us - prev) > gap_us)
            rs = np.flatnonzero(brk)
            re_ = np.append(rs[1:] - 1, len(us) - 1)
            r_start = us[rs].copy()
            r_end = us[re_]
            r_n = (re_ - rs + 1).astype("int64")
            r_seg = seg[rs]
            # each key's FIRST run extends its carried open session iff
            # the gap allows (the _fold_sessions carry rule, applied to
            # every key at once); otherwise the carry closes ahead
            fr = np.flatnonzero(starts_m[rs])  # one first-run per key
            ext = np.zeros(len(rs), dtype=bool)
            ext[fr] = found & ((r_start[fr] - la0) <= gap_us)
            r_n = r_n + np.where(ext, n0[r_seg], 0)
            r_start = np.where(ext, st0[r_seg], r_start)
            carry_closed = found & ~ext[fr]
            if carry_closed.any():
                out.append(
                    (
                        uu[carry_closed],
                        st0[carry_closed],
                        la0[carry_closed],
                        n0[carry_closed],
                    )
                )
            # every run but each key's last closes by data; the last
            # stays open as the key's new state
            lr = np.append(fr[1:] - 1, len(rs) - 1)
            open_m = np.zeros(len(rs), dtype=bool)
            open_m[lr] = True
            if (~open_m).any():
                c = ~open_m
                out.append((uu[r_seg[c]], r_start[c], r_end[c], r_n[c]))
            su, sst, sla, sn = _merge_packed(
                su,
                [sst, sla, sn],
                uu,
                found,
                pos,
                [r_start[lr], r_end[lr], r_n[lr]],
            )
        # watermark sweep: emit + evict every open session whose
        # event-time deadline the current watermark passed (ms — the
        # per-key timeout's exact firing rule), then re-arm with the
        # min remaining deadline (>= wm by construction, which
        # setTimeoutTimestamp requires)
        wm = state.getCurrentWatermarkMs()
        dl = (sla + gap_us) // 1000
        exp = dl < wm
        if exp.any():
            out.append((su[exp], sst[exp], sla[exp], sn[exp]))
            keep = ~exp
            su, sst, sla, sn = su[keep], sst[keep], sla[keep], sn[keep]
            dl = dl[keep]
        if len(su):
            state.update(
                (su.tobytes(), sst.tobytes(), sla.tobytes(), sn.tobytes())
            )
            state.setTimeoutTimestamp(int(dl.min()))
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(
                {
                    "key": np.concatenate([o[0] for o in out]),
                    "start_us": np.concatenate([o[1] for o in out]),
                    "end_us": np.concatenate([o[2] for o in out]),
                    "n_events": np.concatenate([o[3] for o in out]),
                }
            )

    return src.groupBy("_shard").applyInPandasWithState(
        sess_fn,
        outputStructType="key long, start_us long, end_us long, n_events long",
        stateStructType="users binary, start_us binary, last_us binary, n binary",
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
