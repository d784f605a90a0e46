"""Custom stateful streaming operator: session windows via
applyInPandasWithState (SURVEY.md §2.10 extension surface).

The batch twin is queries.q_sessionize_events (lag-window
sessionization); this operator maintains per-user open-session state
across micro-batches with bounded memory — the Structured Streaming
pattern for operators the built-in windowed aggs can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("n_events", LongType(), True),
    ]
)


def sessionize_stream(
    events: DataFrame, *, gap_minutes: int = 30
) -> DataFrame:
    """Emit CLOSED sessions per user: a session closes when a later
    event arrives more than ``gap_minutes`` after its last event.

    State per user is one open session (3 longs) — O(users) state,
    bounded regardless of stream length. The trailing open session
    stays in state (it would close on timeout in a continuous run).

    Ordering caveat: events are processed in micro-batch arrival order
    (sorted within each batch). Late events that cross a batch boundary
    out of order can split sessions; a production hardening would buffer
    per-user events until the watermark passes (event-time timeout) —
    the state plumbing is identical, only the flush trigger changes.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n_events = state.get
        else:
            start_us, last_us, n_events = None, None, 0

        closed: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            # Arrow hands timestamps to pandas as datetime64[ns];
            # normalize to microseconds explicitly (a bare
            # astype(int64) would yield ns and shrink the gap 1000x).
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").sort_values()
            for t in ts_us:
                t = int(t)
                if last_us is None:
                    start_us, last_us, n_events = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n_events))
                    start_us, last_us, n_events = t, t, 1
                else:
                    last_us = t
                    n_events += 1
        state.update((start_us, last_us, n_events))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
