"""Portable Count-Min frequency sketch (Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch and its
applications", J. Algorithms 2005) — frequency estimation under the
oracle gate, completing the sketch family next to the HLL
(cardinality.py, distinct counts) and the Bloom filter
(bloomfilter.py, membership).

Why a pipeline wants it: "how often does this token / url / template
occur?" asked of a 100 TB corpus is a full groupBy over the value
domain; the CMS answers from d x w INTEGER counters (d*w rows of
state, thousands not billions), always OVER-estimating — never under
— by at most e/w * N with probability 1 - e^-d. Counter frames are
addition-mergeable across partitions, days, and streaming
micro-batches (integer sums — the same mergeability story as the HLL
register max).

Portability: row-r's bucket for a value is the r-th non-overlapping
12-bit slice of md5(value) (w is fixed at 4096 so hex windows tile the
digest; d <= 10 fits 128 bits... d <= 8 keeps a safety margin and two
spare windows). Counters are integer SUMS of row counts — partial-agg-
order independent — and the estimate is an integer MIN across d
counters: every number in the pipeline is exact in both engines, so
the ESTIMATES (over-counts included) hash-match the SQL twin
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Fixed counter width: 4096 buckets = 3 hex chars per row window.
W_BUCKETS = 1 << 12
_HEX_PER_ROW = 3
DEFAULT_D = 4


def cms_bucket_columns(col: Column, *, d: int = DEFAULT_D) -> list[Column]:
    """The d row-bucket indices of one value: d non-overlapping 12-bit
    md5 slices, identically computable in DuckDB."""
    if not (1 <= d <= 8):
        raise ValueError(f"d must be in [1, 8], got {d}")
    h = F.md5(col.cast("string"))
    return [
        F.conv(
            F.substring(h, 1 + r * _HEX_PER_ROW, _HEX_PER_ROW), 16, 10
        ).cast("int")
        for r in range(d)
    ]


def cms_build(
    df: DataFrame, value_col: str, *, d: int = DEFAULT_D
) -> DataFrame:
    """The counter frame (``row`` int, ``bucket`` int, ``cnt`` long) —
    <= d * 4096 rows regardless of input size. One explode (d rows per
    input row) + one integer-sum aggregation whose map-side combine
    collapses each partition to the sketch size before the shuffle.
    Merge two sketches by unioning frames and summing ``cnt``
    (cms_merge)."""
    buckets = cms_bucket_columns(F.col(value_col), d=d)
    pairs = df.select(
        F.posexplode(F.array(*buckets)).alias("row", "bucket")
    )
    return pairs.groupBy("row", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Addition-merge two counter frames: the merged sketch equals the
    sketch of the concatenated inputs exactly (integer sums)."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    values: DataFrame,
    value_col: str,
    counters: DataFrame,
    *,
    d: int = DEFAULT_D,
    est_col: str = "est_count",
) -> DataFrame:
    """Point estimates for a relation of values: join each value's d
    (row, bucket) coordinates against the (broadcast) counter frame
    and take the integer MIN — the classic CMS query. Values absent
    from the build see whatever their buckets collected (the
    overestimate guarantee: est >= true, never below; a value whose
    buckets were never touched simply finds no counter row and drops —
    semantically count 0)."""
    buckets = cms_bucket_columns(F.col(value_col), d=d)
    probe = values.select(
        value_col, F.posexplode(F.array(*buckets)).alias("row", "bucket")
    )
    return (
        probe.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy(value_col)
        .agg(F.count("*").alias("__rows"), F.min("cnt").alias(est_col))
        # a genuine estimate needs all d rows present; missing rows
        # mean an untouched counter == 0, and min(present) would
        # overstate past the CMS guarantee
        .filter(F.col("__rows") == d)
        .drop("__rows")
    )


def cms_buckets_sql(value_expr: str, *, d: int = DEFAULT_D) -> str:
    """DuckDB twin of cms_bucket_columns as a SQL list literal."""
    if not (1 <= d <= 8):
        raise ValueError(f"d must be in [1, 8], got {d}")
    parts = ", ".join(
        f"CAST(('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), "
        f"{1 + r * _HEX_PER_ROW}, {_HEX_PER_ROW})) AS INTEGER)"
        for r in range(d)
    )
    return f"[{parts}]"
