"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional min/max pruning.

SURVEY.md §2 notes the reference's post-load B-tree indexes
(loadingcsv_topostgre_optimized.py:68-98) map to partition/bucket/
Z-ORDER layout in a lakehouse engine. Partitioning and bucketing ship
in partitioning.py; this adds the third lever: interleaved-bit
ordering over 2+ columns so parquet row-group min/max stats prune
MULTI-dimensional predicates.

Why it matters at 100 TB: a sort by column A gives perfect pruning on
A and none on B; Z-ordering bounds BOTH — a range predicate on any
single dimension of a d-dim Z-curve touches ~N^((d-1)/d) of the row
groups instead of all of them, and a conjunctive box predicate
touches ~the box's volume fraction. tests/test_layout.py measures
actual parquet row-group stats: the straddle count under a 2-D box
predicate collapses vs a 1-D sort.

All pure integer expressions (codegen, no UDF): per-column bucket =
(x - min) * 2^bits / span from a 1-row min/max aggregate (the
bounded-planner-state pattern of orderkey_gaps), then bit
interleaving via shifts/ors. Write path: repartitionByRange on the
z-value (range partitioner = contiguous curve segments per file) +
sortWithinPartitions so row groups inside a file stay curve-local.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Value -> integer bucket in [0, 2^bits): deterministic affine
    scaling from driver-collected min/max (value-derived, so every job
    sees identical buckets)."""
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    n = float(1 << bits)
    raw = F.floor((col.cast("double") - F.lit(float(lo))) * F.lit(n) / F.lit(span + 1e-9))
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), raw)).cast("long")


def zorder_value(
    cols: Sequence[Column],
    ranges: Sequence[tuple[float, float]],
    *,
    bits: int = 8,
) -> Column:
    """Morton z-value: interleave ``bits`` bucket bits of each column
    (column j contributes bit i at position i*d + j). Pure shifts/ors
    — one codegen expression, no UDF."""
    d = len(cols)
    bkts = [_bucket(c, lo, hi, bits) for c, (lo, hi) in zip(cols, ranges)]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bkts):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 8,
    partitions: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``:
    one bounded min/max collect, repartitionByRange on the z-value
    (contiguous curve segments per output file), sortWithinPartitions
    for curve-local row groups. Readers need no special support —
    ordinary parquet min/max row-group stats do the pruning."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]  # 1-row bounded planner state
    ranges = [
        (float(row[f"__lo_{c}"]), float(row[f"__hi_{c}"])) for c in cols
    ]
    z = zorder_value([F.col(c) for c in cols], ranges, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
