"""Stateful streaming anomaly detection — the continuous twin of
queries.hourly_event_anomalies (trailing-24-bucket z-score per event
type), built on applyInPandasWithState.

State per event type is bounded: the trailing 24 CLOSED hourly buckets
(two parallel long arrays) plus the one open bucket — O(keys * 25)
regardless of stream length. An hour closes when a later hour's first
event arrives; at close the z-score is computed from the buckets
buffered BEFORE it (same exclusive frame as the batch query's ROWS
BETWEEN 24 PRECEDING AND 1 PRECEDING, same >= 12-bucket warm-up and
zero-variance guards) and emitted once.

Ordering caveat (same contract as stateful.sessionize_stream): events
are processed in micro-batch arrival order, sorted within each batch.
A late event whose hour already closed is merged into that bucket's
count if it is still inside the trailing window (its z was already
emitted from the older count) and dropped from state otherwise; a
production hardening buffers per-key events until the watermark passes
— the state plumbing is identical, only the flush trigger changes.

Timestamps cross into the UDF as unix_micros int64, never as a
timestamp column (the stateful-UDF Arrow path can mislabel raw
integer units — see stateful.py).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HOUR_US = 3_600 * 1_000_000

ANOMALY_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), True),
        StructField("hour_us", LongType(), True),
        StructField("cnt", LongType(), True),
        StructField("zscore", DoubleType(), True),
    ]
)

ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("hours", ArrayType(LongType()), True),
        StructField("cnts", ArrayType(LongType()), True),
        StructField("open_hour", LongType(), True),
        StructField("open_cnt", LongType(), True),
    ]
)


def _zscore(prev_cnts: list[int], cnt: int, min_history: int) -> float | None:
    n = len(prev_cnts)
    if n < min_history:
        return None
    s = sum(prev_cnts)
    ss = sum(c * c for c in prev_cnts)
    if n * ss <= s * s:
        return None
    var = (n * ss - s * s) / (n * (n - 1))
    return round((cnt - s / n) / math.sqrt(var), 6)


def anomaly_stream(
    events: DataFrame,
    *,
    window_buckets: int = 24,
    min_history: int = 12,
) -> DataFrame:
    """Per-event-type hourly count z-scores, emitted as each hour
    closes. Output (event_type, hour_us, cnt, zscore) matches the
    batch twin row-for-row on in-order data, minus each key's final
    (still-open) hour."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            hours, cnts, open_hour, open_cnt = state.get
            hours, cnts = list(hours), list(cnts)
        else:
            hours, cnts, open_hour, open_cnt = [], [], None, None

        out: list[tuple[int, int, float | None]] = []

        def close_open() -> None:
            nonlocal hours, cnts
            out.append(
                (open_hour, open_cnt, _zscore(cnts[-window_buckets:], open_cnt, min_history))
            )
            hours.append(open_hour)
            cnts.append(open_cnt)
            if len(hours) > window_buckets:
                hours, cnts = hours[-window_buckets:], cnts[-window_buckets:]

        for pdf in pdfs:
            for t in pdf["ts_us"].sort_values():
                h = (int(t) // HOUR_US) * HOUR_US
                if open_hour is None:
                    open_hour, open_cnt = h, 1
                elif h == open_hour:
                    open_cnt += 1
                elif h > open_hour:
                    close_open()
                    open_hour, open_cnt = h, 1
                else:  # late: merge into a closed bucket if still held
                    for i, hh in enumerate(hours):
                        if hh == h:
                            cnts[i] += 1
                            break
        state.update((hours, cnts, open_hour, open_cnt))
        if out:
            yield pd.DataFrame(
                {
                    "event_type": [event_type] * len(out),
                    "hour_us": [h for h, _, _ in out],
                    "cnt": [c for _, c, _ in out],
                    "zscore": [z for _, _, z in out],
                }
            )

    src = events.select("event_type", F.unix_micros("ts").alias("ts_us"))
    return src.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
