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
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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
            ts_us = pdf["ts_us"].sort_values()
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

    # Timestamps cross the JVM->Arrow->pandas boundary as plain int64
    # epoch-microseconds (unix_micros), never as a timestamp column:
    # the stateful-UDF Arrow path can mislabel the raw integer's unit
    # depending on the source file's timestamp encoding (observed:
    # ms-encoded input arriving as 1970-era datetime64[ns] values).
    events = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BUFFER_STATE_SCHEMA = StructType(
    [StructField("ts_us", ArrayType(LongType()), True)]
)


def sessionize_stream_eventtime(
    events: DataFrame, *, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Disorder-robust sessionizer: per-user events buffer in state and
    sessions are emitted in EVENT-TIME order once the watermark proves
    them final — the production hardening the arrival-order variant's
    docstring promises.

    A session [start, last] is final when ``watermark > last + gap``:
    any not-yet-seen event admitted by the watermark has
    ``ts >= watermark > last + gap`` and therefore starts a LATER
    session — it can never extend or merge a finalized one. So late
    events that cross micro-batch boundaries out of order reorder
    inside the buffer instead of splitting sessions.

    State per user = the open tail of the event stream (events not yet
    in a finalized session): bounded by the watermark horizon, the
    knob that trades completeness for memory at 100 TB/day rates.
    Event-time timeout flushes users whose stream goes quiet without
    needing another event to arrive for that user.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        buf: list[int] = list(state.get[0]) if state.exists else []
        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(int(t) for t in pdf["ts_us"])
        buf.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000

        # split the buffer into gap-delimited sessions, oldest first
        sessions: list[tuple[int, int, int]] = []  # (start, last, n)
        for t in buf:
            if sessions and t - sessions[-1][1] <= gap_us:
                s, _, n = sessions[-1]
                sessions[-1] = (s, t, n + 1)
            else:
                sessions.append((t, t, 1))
        final = [s for s in sessions if s[1] + gap_us < wm_us]
        keep = [t for t in buf if not final or t > final[-1][1]]

        if keep:
            state.update((keep,))
            # wake this user at the earliest instant the watermark can
            # finalize its FIRST open session, so quiet users still
            # flush without another event of their own arriving
            first_open_end = sessions[len(final)][1]
            state.setTimeoutTimestamp(
                max(first_open_end + gap_us, wm_us) // 1000 + 1
            )
        else:
            state.remove()

        if final:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(final),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in final],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in final],
                    "n_events": [n for _, _, n in final],
                }
            )

    # ts stays for the watermark; the UDF reads the JVM-computed
    # int64 ts_us (see sessionize_stream for the unit-mislabel rationale)
    return (
        events.select(
            "user_id", "ts", F.unix_micros("ts").alias("ts_us")
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=BUFFER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


NEAR_DUP_PAIR_SCHEMA = StructType(
    [
        StructField("a_id", LongType(), True),
        StructField("b_id", LongType(), True),
    ]
)

BUCKET_STATE_SCHEMA = StructType(
    [StructField("ids", ArrayType(LongType()), True)]
)


def streaming_near_dup_candidates(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    bucket_cap: int = 4096,
) -> DataFrame:
    """TRUE streaming near-dup candidate generation: MinHash-LSH over
    an unbounded document stream, candidate pairs emitted the moment
    the colliding document ARRIVES — the streaming twin of the batch
    scale path (operators/dedup.minhash_lsh_pairs; round-5 §2.10
    extension).

    Plan shape: the signature and banding stages are the SAME pure
    expressions as the batch path (stateless maps, valid on a
    streaming DataFrame — xxhash64 family, identical band keys), so
    every bucket key matches its batch twin bit for bit. The stateful
    stage groups by (band, band_hash) and keeps the ids previously
    seen in that bucket; each arriving doc emits one (a_id, b_id)
    candidate (a < b) per already-seen member, then joins the bucket.

    Semantics and bounds:
    - The cumulative emitted SET equals the batch candidate set over
      the same documents (asserted in tests/test_streaming.py) — a
      pair may be emitted more than once when it collides in several
      bands (the batch path's final ``distinct``); dedup downstream
      (batch distinct on the sink, or dropDuplicatesWithinWatermark).
    - State per bucket = its member-id list — exactly the LSH bucket
      occupancy, so the 100 TB levers are the batch ones: band width
      (num_hashes/bands) controls expected occupancy, and
      ``bucket_cap`` hard-bounds degenerate buckets (boilerplate
      shingles): beyond the cap a bucket stops ADMITTING new members
      (arrivals still pair against the capped membership), trading
      recall inside a pathological bucket for bounded state — the
      same accept-bounded-membership call as SKEW.md's hot-cell
      salting, and capped buckets are near-useless for
      discrimination anyway.
    - Replay from a fresh checkpoint re-emits the identical set
      (deterministic hashing, no wall-clock anywhere) — including
      capped buckets: each micro-batch's arrivals are sorted by id
      before admission, so capped MEMBERSHIP is a pure function of the
      micro-batch content, not of row order across shuffle partitions.
    """
    from firmable_aus_etl_spark.functions.similarity import normalize_name
    from firmable_aus_etl_spark.operators.dedup import (
        minhash_signature_from,
        shingles_from_tokens,
    )

    # token array materialized BEFORE the shingle lambda (no subexpr
    # elimination inside HOFs — the shingle_frame discipline); the
    # expressions are the batch path's bit for bit, just staged
    toks = docs.select(
        F.col(id_col).cast("long").alias("__id"),
        F.split(normalize_name(F.col(text_col)), " ").alias("__w"),
    )
    sig = toks.select(
        "__id",
        minhash_signature_from(
            F.array_distinct(shingles_from_tokens(F.col("__w"), shingle_n)),
            num_hashes=num_hashes,
        ).alias("__sig"),
    )
    rows_per_band = num_hashes // bands

    def band_key(b: int):
        elems = [
            F.col("__sig")[i]
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        return F.xxhash64(*elems).cast("string")

    banded = sig.select(
        "__id",
        F.posexplode(
            F.array(*[band_key(b) for b in range(bands)])
        ).alias("band", "band_hash"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: list[int] = list(state.get[0]) if state.exists else []
        out_a: list[int] = []
        out_b: list[int] = []
        # Row order WITHIN a micro-batch group is not guaranteed across
        # shuffle partitions/replays; when bucket_cap triggers, WHICH
        # members are admitted would otherwise depend on that order.
        # Sorting the batch's ids makes capped membership (and thus the
        # replayed pair set) a pure function of the micro-batch CONTENT.
        batch_ids = sorted(
            {int(raw) for pdf in pdfs for raw in pdf["__id"]}
        )
        for did in batch_ids:
            if did in seen:
                continue  # at-least-once redelivery of a member
            for s in seen:
                a, b = (s, did) if s < did else (did, s)
                out_a.append(a)
                out_b.append(b)
            if len(seen) < bucket_cap:
                seen.append(did)
        state.update((seen,))
        yield pd.DataFrame({"a_id": out_a, "b_id": out_b})

    return banded.groupBy("band", "band_hash").applyInPandasWithState(
        fn,
        outputStructType=NEAR_DUP_PAIR_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
