"""Custom stateful streaming operator: per-key sessionization with
applyInPandasWithState (SURVEY.md §2.11 extension; the task brief's
"custom stateful operators" slot).

Semantics: events (user_id, ts, value) arrive in micro-batches; a session
is a run of events per user with gaps < GAP seconds. When a user's gap
elapses (processing-time timeout), the operator EMITS one session row
(user_id, session_start, session_end, n_events, sum_value) and clears the
state. This is the streaming twin of the batch `sessionize` contract query
(relational.py) — same gap rule, incremental state instead of a window
over history.

Scale notes: state is per-key (user_id) and O(1) per key — five scalars,
no event buffering — so state store size is #active_keys, not #events.
The shuffle is the groupBy on user_id that co-locates a key's events with
its state (exactly the partitioning a keyed state store needs). Timeouts
are processing-time: at 10^9 keys, per-batch timeout sweeps only touch
keys whose timers expired (state store range scan), not the full key set.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, sum_value double"
)
STATE_SCHEMA = "start bigint, last bigint, n int, total double"
GAP_SECONDS = 30 * 60


def make_session_update(gap_seconds: int = GAP_SECONDS):
    """Build the per-key state transition: fold a batch's events into the
    open session; emit closed sessions (gap exceeded inside the batch, or
    the processing-time timeout fired with no new data). Exposed as a
    factory so the gap is a parameter and the inner function is directly
    unit-testable with a fake GroupState."""

    def session_update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state,  # pyspark.sql.streaming.state.GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple] = []

        if state.hasTimedOut:
            # idle key: close and emit whatever session is open
            if state.exists:
                start, last, n, total = state.get
                out.append((user_id, start, last, n, total))
            state.remove()
        else:
            if state.exists:
                start, last, n, total = state.get
            else:
                start = last = None
                n, total = 0, 0.0
            rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
            for ts, value in zip(rows["ts"], rows["value"]):
                ep = int(pd.Timestamp(ts).value // 1_000_000_000)
                if last is not None and ep - last >= gap_seconds:
                    out.append((user_id, start, last, n, total))
                    start, n, total = None, 0, 0.0
                if start is None:
                    start = ep
                last = ep
                n += 1
                total += float(value)
            state.update((start, last, n, total))
            state.setTimeoutDuration(gap_seconds * 1000)

        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "session_start": [pd.Timestamp(r[1], unit="s") for r in out],
                    "session_end": [pd.Timestamp(r[2], unit="s") for r in out],
                    "n_events": [r[3] for r in out],
                    "sum_value": [r[4] for r in out],
                }
            )

    return session_update


def sessionize_stream(events_stream, gap_seconds: int = GAP_SECONDS):
    """events readStream (user_id, ts, value) -> closed-session stream.

    One stateful shuffle on user_id; emits in update mode via
    applyInPandasWithState with processing-time timeouts.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            make_session_update(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
