"""Bounded-state streaming sketches: Misra-Gries heavy hitters.

The streaming counterpart of groupBy(item).count() when the item
domain is unbounded (URLs, doc fingerprints, user agents at 100 TB/day
rates): exact streaming counts need O(distinct items) state; the
Misra-Gries summary keeps a FIXED ``capacity`` counters per shard and
still guarantees every item with frequency > N/(capacity+1) is
present, with per-item undercount at most N_shard/(capacity+1)
(J. Misra, D. Gries, "Finding repeated elements", 1982).

Distribution shape: items hash-shard across ``shards`` state groups
(same item always lands in the same shard, so per-item truth never
splits); each shard's summary is an independent MG instance whose
error bound applies to the shard's own stream slice. Summaries are
mergeable downstream (sum counts, keep top) — the property that lets
1000 executors sketch independently.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HH_SCHEMA = StructType(
    [
        StructField("shard", LongType(), True),
        StructField("item", StringType(), True),
        StructField("est_count", LongType(), True),
        StructField("shard_total", LongType(), True),
    ]
)

HH_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("total", LongType(), True),
    ]
)


def streaming_heavy_hitters(
    items: DataFrame,
    item_col: str,
    *,
    capacity: int = 16,
    shards: int = 8,
) -> DataFrame:
    """Maintain a Misra-Gries summary per shard over a stream of items.

    Emits the full current summary each micro-batch (update semantics:
    downstream keeps the latest row per (shard, item)). State per
    shard is exactly ``capacity`` counters + one total — fixed memory
    for an unbounded stream. Guarantee (per shard): any item with
    true count > shard_total/(capacity+1) is present, and
    true_count - est_count <= shard_total/(capacity+1).
    """
    src = items.select(
        F.col(item_col).cast("string").alias("item"),
        (F.crc32(F.col(item_col).cast("string")) % shards).cast("long").alias(
            "shard"
        ),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            its, cnts, total = state.get
            summary = dict(zip(its, (int(c) for c in cnts)))
            total = int(total)
        else:
            summary, total = {}, 0

        for pdf in pdfs:
            # pre-reduce the batch: one dict op per DISTINCT item
            for item, n in pdf["item"].value_counts().items():
                n = int(n)
                total += n
                while n > 0:
                    if item in summary:
                        summary[item] += n
                        n = 0
                    elif len(summary) < capacity:
                        summary[item] = n
                        n = 0
                    else:
                        # batch form of MG's evict: one decrement-all
                        # round consumes one arrival of the incoming
                        # item per unit — dec rounds at once
                        dec = min(min(summary.values()), n)
                        summary = {
                            i: c - dec for i, c in summary.items() if c > dec
                        }
                        n -= dec

        items_sorted = sorted(
            summary.items(), key=lambda kv: (-kv[1], kv[0])
        )
        state.update(
            (
                [i for i, _ in items_sorted],
                [c for _, c in items_sorted],
                total,
            )
        )
        yield pd.DataFrame(
            {
                "shard": [shard] * len(items_sorted),
                "item": [i for i, _ in items_sorted],
                "est_count": [c for _, c in items_sorted],
                "shard_total": [total] * len(items_sorted),
            }
        )

    return src.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=HH_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_quantile_histogram(
    stream,
    value_col: str,
    state_dir: str,
    *,
    lo: float,
    hi: float,
    bins: int = 256,
    checkpoint: str,
):
    """Streaming quantile estimation as a mergeable fixed-memory
    histogram: bucket each value into ``bins`` equal cells over the
    known [lo, hi) domain and maintain per-bucket counts with the
    SAME batch-id-versioned additive merge as incremental_agg_stream —
    so the sketch inherits its replay idempotence and _SUCCESS-gated
    reads for free. Out-of-domain values clamp to the edge buckets
    (their mass is right, their position saturates — disclose lo/hi
    from domain knowledge or a first-pass min/max).

    State is O(bins) regardless of stream length; merge is additive so
    shards/executors combine exactly (unlike a percentile over raw
    retained values). Max quantile error = one bin width.
    """
    from pyspark.sql import functions as F

    from firmable_aus_etl_spark.streaming.incremental import (
        incremental_agg_stream,
    )

    width = (hi - lo) / bins
    bucketed = stream.select(
        F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col).cast("double") - lo) / width).cast("int"),
            ),
        ).alias("bucket"),
        F.col(value_col).cast("double").alias("v"),
    )
    return incremental_agg_stream(
        bucketed, state_dir, keys=["bucket"], value_col="v",
        checkpoint=checkpoint,
    )


def read_quantile_estimate(
    spark,
    state_dir: str,
    qs: list[float],
    *,
    lo: float,
    hi: float,
    bins: int = 256,
) -> dict[float, float]:
    """Invert the streamed histogram's CDF: for each q, find the bucket
    where the cumulative count crosses q*N and linearly interpolate
    inside it. Reads the latest COMPLETE version (O(bins) rows)."""
    from firmable_aus_etl_spark.streaming.incremental import read_agg_view

    width = (hi - lo) / bins
    rows = sorted(
        (r.bucket, r.cnt) for r in read_agg_view(spark, state_dir).collect()
    )
    total = sum(c for _, c in rows)
    out = {}
    for q in qs:
        target = q * total
        run = 0
        est = hi
        for b, c in rows:
            if run + c >= target and c > 0:
                frac = (target - run) / c
                est = lo + (b + frac) * width
                break
            run += c
        out[q] = est
    return out
