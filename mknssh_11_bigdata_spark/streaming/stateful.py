"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where windows/watermarks (streaming/windows.py) cover the declarative
surface, this module is the escape hatch for semantics Spark's built-in
state operators can't express: arbitrary per-key state with explicit
timeout-driven emission. The pattern here — Arrow-batched pandas per
key-group, a single state tuple, event-time timeouts — is the shape any
custom 100 TB stateful op takes (state lives in the state store,
partitioned by key; only (key, state) pairs persist across batches, so
state size is O(distinct keys), never O(events)).

The concrete operator is a user-session tracker: sessions close after a
``gap`` of inactivity and are emitted exactly once, with event count,
value sum, and duration. Its semantics deliberately match
``F.session_window`` so the batch engine certifies the custom state
logic (tests/test_streaming_stateful.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

__all__ = ["sessionize_with_state", "SESSION_SCHEMA", "SESSION_STATE_SCHEMA"]

#: Emitted rows: one per CLOSED session.
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

#: Per-user state: open session boundaries + running aggregates.
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def sessionize_with_state(
    events: DataFrame,
    gap_seconds: int = 300,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    event_id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user sessionization with explicit state + event-time timeout.

    SCOPE: this is the STREAMING operator — explicit state is what an
    unbounded stream needs, and the Python fold pays for it (~100k
    rows/s measured at sf5). For BOUNDED data use the registered
    ``batch_sessionization`` (queries_events.py): identical output from
    a pure JVM window plan, certified against the same oracle, ~3×
    faster and scale-proportional. Don't benchmark this fold as "the"
    sessionization.

    Streaming: groups by user; each micro-batch folds that user's events
    into the open-session state; a session is emitted when a new event
    arrives more than ``gap_seconds`` after the last one (half-open, like
    ``F.session_window``: an event at exactly last+gap starts a NEW
    session) or when the event-time timeout fires after the watermark
    passes the open session's deadline. Exactly-once emission per closed
    session.

    Also callable on a static DataFrame (``isStreaming == False``): the
    same fold runs once per user and every session including the final
    open one is emitted — which is precisely the batch semantics, so the
    two modes are mutually checkable.
    """
    us_gap = gap_seconds * 1_000_000

    def _fold(
        rows: "pd.DataFrame", state: tuple[Any, ...] | None
    ) -> tuple[list[tuple], tuple[Any, ...] | None]:
        """Fold sorted event (us, value) rows into (closed_sessions, state).

        Vectorized: session breaks via np.diff, per-session aggregates
        via reduceat — no per-event Python. NOTE the value sums run
        left-to-right within a session either way, so results match the
        scalar fold bit-for-bit.
        """
        import numpy as np

        if len(rows) == 0:
            return [], state
        # (__us, __eid) is a total order: with duplicate timestamps at a
        # session boundary the within-session float-sum order (and the
        # oracle's numbered window) would otherwise be nondeterministic.
        rows = rows.sort_values(["__us", "__eid"])
        us = rows["__us"].to_numpy(dtype=np.int64)
        vals = rows["__val"].to_numpy(dtype=np.float64)
        breaks = np.empty(len(us), dtype=bool)
        breaks[0] = state is None or us[0] - state[1] >= us_gap
        breaks[1:] = np.diff(us) >= us_gap
        starts = np.flatnonzero(breaks)  # first-row index per new session
        # Aggregate each [start, next_start) slice.
        bounds = np.append(starts, len(us))
        seg_first = us[bounds[:-1]]
        seg_last = us[bounds[1:] - 1]
        seg_n = np.diff(bounds)
        seg_sum = np.add.reduceat(vals, bounds[:-1])
        sessions = [
            (int(a), int(b), int(n), float(s))
            for a, b, n, s in zip(seg_first, seg_last, seg_n, seg_sum)
        ]
        if state is not None:
            if breaks[0]:
                sessions.insert(0, state)  # old open session closes as-is
            else:
                # first slice continues the carried-over session
                a, b, n, s = sessions[0]
                sessions[0] = (
                    state[0], b, state[2] + n, state[3] + s
                )
        return sessions[:-1], sessions[-1]

    def _emit(user_id: int, sessions: list[tuple]) -> "pd.DataFrame":
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [
                    pd.Timestamp(s[0], unit="us") for s in sessions
                ],
                "session_end": [
                    pd.Timestamp(s[1], unit="us") for s in sessions
                ],
                "n_events": [s[2] for s in sessions],
                "total_value": [s[3] for s in sessions],
            }
        )

    # __eid breaks ties between duplicate timestamps (total order). Inputs
    # without an id column fall back to a constant — their within-tie order
    # is inherently arbitrary, but the fold still runs.
    eid_expr = (
        f"{event_id_col} AS __eid"
        if event_id_col is not None and event_id_col in events.columns
        else "CAST(0 AS BIGINT) AS __eid"
    )
    prepped = events.selectExpr(
        f"{user_col} AS user_id",
        f"CAST({ts_col} AS TIMESTAMP) AS __ts",
        f"unix_micros(CAST({ts_col} AS TIMESTAMP)) AS __us",
        f"CAST({value_col} AS DOUBLE) AS __val",
        eid_expr,
    )

    def update(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            # Watermark passed the open session's deadline: close & emit.
            if state.exists:
                yield _emit(user_id, [tuple(state.get)])
                state.remove()
            return
        cur = tuple(state.get) if state.exists else None
        closed: list[tuple] = []
        for pdf in pdfs:
            got, cur = _fold(pdf, cur)
            closed.extend(got)
        if cur is not None:
            state.update(cur)
            # Close the session once event-time (watermark) passes
            # last_event + gap (state in µs; the timeout API takes ms —
            # ceil so the timeout never fires a hair early).
            state.setTimeoutTimestamp(-(-(cur[1] + us_gap) // 1000))
        if closed:
            yield _emit(user_id, closed)

    if events.isStreaming:
        return (
            prepped.withWatermark("__ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=SESSION_SCHEMA,
                stateStructType=SESSION_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )

    # Batch path: same fold per user via applyInPandas; the trailing open
    # session is emitted too (batch input is finite).
    def batch_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        user_id = int(pdf["user_id"].iloc[0])
        closed, cur = _fold(pdf, None)
        if cur is not None:
            closed.append(cur)
        return _emit(user_id, closed)

    return prepped.groupBy("user_id").applyInPandas(
        batch_fn, schema=SESSION_SCHEMA
    )
