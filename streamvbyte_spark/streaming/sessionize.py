"""Custom stateful streaming operator: continuous gap-based sessionization.

Batch twin: ``pipeline_sql.q_event_sessions`` — a session breaks after a
STRICTLY >30-minute gap per user (lag + running sum).  On a live stream the
open session's (session_no, start, last-seen, count) must survive between
micro-batches, so this is ``applyInPandasWithState`` with per-user state,
like the delta-chain encoder (stateful_delta.py).  A session is emitted
when a later event (or state timeout) proves it closed; the still-open
session stays in state.

Ordering contract (same loud-contract style as stateful_delta): events of
one user must arrive in non-decreasing event-time order ACROSS
micro-batches — the operator RAISES on a cross-batch time regression
(within a batch it sorts).  A real deployment would put a watermark-sized
buffer in front; silently mis-attributing an out-of-order event to the
wrong session is worse than failing.

End-of-stream: a caller that needs batch parity appends a far-future
sentinel event per user (see the test): every real session then closes and
the emitted rows equal the batch query's output exactly; the sentinel's
own one-event session stays open in state and is never emitted.

Group bodies are whole-batch numpy (segment reduction over the break
mask) — no per-event Python.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 1_800_000_000  # 30 min, strictly-greater breaks (batch twin)

OUT_SCHEMA = "user_id string, session_no int, events bigint, duration_sec bigint"
STATE_SCHEMA = "session_no int, start_ep long, last_ep long, events long"
_OUT_COLS = ["user_id", "session_no", "events", "duration_sec"]


def _make_sessionize(idle_flush: bool):
    def _sessionize_user(key: Tuple[str], pdf_iter: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
        return _sessionize_body(key, pdf_iter, state, idle_flush)
    return _sessionize_user


def _sessionize_body(key: Tuple[str], pdf_iter: Iterator[pd.DataFrame],
                     state: GroupState, idle_flush: bool) -> Iterator[pd.DataFrame]:
    user = key[0]
    if state.hasTimedOut:
        # idle flush: the open session is now provably closed (no event can
        # legally arrive inside its gap window any more).  KEEP the state
        # (events = 0 marks "no open session"): removing it would reset the
        # per-user session counter — a later event would re-emit session_no
        # values already delivered (colliding in update-mode sinks) — and
        # would drop the cross-batch ordering guard's l_ep
        sn, s_ep, l_ep, n = state.get
        state.update((sn, l_ep, l_ep, 0))
        if n > 0:
            yield pd.DataFrame([[user, sn, n, (l_ep - s_ep) // 1_000_000]],
                               columns=_OUT_COLS)
        else:
            yield pd.DataFrame(columns=_OUT_COLS)
        return

    frames = [p for p in pdf_iter if len(p)]
    if not frames:
        yield pd.DataFrame(columns=_OUT_COLS)
        return
    pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
    eps = pdf["ep"].to_numpy(np.int64)
    eids = pdf["event_id"].to_numpy()
    order = np.lexsort((eids, eps))
    eps = eps[order]

    if state.exists:
        sn, s_ep, l_ep, n = state.get
        if int(eps[0]) < l_ep:
            raise ValueError(
                f"user {user!r}: event time regressed across micro-batches "
                f"({int(eps[0])} < {l_ep}); buffer/ watermark upstream")
    else:
        sn, s_ep, l_ep, n = 0, 0, None, 0

    brk = np.empty(eps.size, dtype=bool)
    # n == 0: the previous open session was already flushed by a timeout —
    # nothing to merge or emit, the first event necessarily starts session
    # sn+1 (l_ep is retained only for the ordering guard above)
    brk[0] = l_ep is None or n == 0 or (int(eps[0]) - l_ep) > SESSION_GAP_US
    np.greater(eps[1:] - eps[:-1], SESSION_GAP_US, out=brk[1:])
    seg = np.cumsum(brk)  # 0 while continuing the open session
    starts = np.flatnonzero(brk)
    bounds = np.concatenate([[0], starts, [eps.size]])
    # per segment: [bounds[i], bounds[i+1]) — segment 0 may be empty (batch
    # opens with a break); merge segment 0 into the carried open session
    out = []
    if state.exists and brk[0] and n > 0:
        # the batch's first event broke the gap: the CARRIED open session
        # is now provably closed — emit it (dropping it silently loses one
        # session per user at every micro-batch seam that lands on a gap)
        out.append([user, sn, n, (l_ep - s_ep) // 1_000_000])
    n_segs = bounds.size - 1
    for i in range(n_segs):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if lo == hi:
            continue
        if i == 0 and not brk[0]:
            cur = (sn, s_ep, int(eps[hi - 1]), n + (hi - lo))
        else:
            sn += 1
            cur = (sn, int(eps[lo]), int(eps[hi - 1]), hi - lo)
        if hi < eps.size:  # a later event broke this session: emit closed
            out.append([user, cur[0], cur[3],
                        (cur[2] - cur[1]) // 1_000_000])
        else:
            sn, s_ep, l_ep, n = cur
    state.update((sn, s_ep, l_ep, n))
    if idle_flush:
        state.setTimeoutDuration(
            idle_flush if idle_flush is not True else 2 * SESSION_GAP_US // 1000)
    yield pd.DataFrame(out, columns=_OUT_COLS) if out else \
        pd.DataFrame(columns=_OUT_COLS)


def sessionize_stream(events: DataFrame,
                      idle_flush: bool | int = False) -> DataFrame:
    """events stream (user_id, event_id, ep μs) -> closed-session rows with
    the batch query's exact schema/values (q_event_sessions).

    idle_flush arms a processing-time timeout that emits a user's open
    session once no event can legally extend it — for continuous
    deployments (True = 2x the session gap; an int = that many ms, for
    tests).  Default off: a registered timeout keeps an availableNow drain
    generating empty batches forever (measured: 200+ epochs), so
    drain-style jobs close final sessions with an end-of-stream sentinel
    instead (module docstring)."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if idle_flush
               else GroupStateTimeout.NoTimeout)
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_sessionize(idle_flush), OUT_SCHEMA, STATE_SCHEMA,
                outputMode="update", timeoutConf=timeout))
