"""Portable Bloom-filter membership (Bloom, CACM 1970) — the
broadcast semi-join reducer, under the oracle gate.

The decontamination / URL-blocklist / seen-before checks of a
training-data pipeline are semi-joins of a huge corpus against a
smallish reference set. The exact join shuffles the corpus's join
keys; the Bloom form broadcasts a CONSTANT-SIZE summary of the
reference set and filters the corpus map-side — zero corpus shuffle,
at the price of false positives at a chosen, computable rate. For
decontamination FPs err CONSERVATIVE (a clean doc gets flagged, never
the reverse), which is the safe direction to be wrong in.

Spark ships runtime bloom injection (and tests/test_plans.py pins it),
but — like approx_count_distinct vs the portable HLL — its filter is
engine-private. This bloom derives every bit position from md5 slices
(k non-overlapping 16-bit windows), so the POSITIVE SET — false
positives included — is a deterministic function of the data that
DuckDB reproduces bit-for-bit: the oracle checks the FP behavior
itself, not just the happy path.

Representation: the filter is carried as the DISTINCT-POSITIONS frame
(<= k * |reference| ints), broadcast to the probe join. A dense
executor-side bitmap is an optimization detail the plan can adopt
later; the sparse frame keeps every engine's view identical and is
small by construction (the reference set is the SMALL side — that is
the operator's applicability condition).

reference scope: scale path of the decontamination family
(q_decontaminate_documents' exact-join twin); SURVEY §4 governance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 16-bit positions (4 hex chars) — m is fixed at 65536 bits so the
#: position windows tile the md5 digest exactly; k <= 8 fits 128 bits.
M_BITS = 1 << 16
_HEX_PER_POS = 4
DEFAULT_K = 3


def bloom_position_columns(col: Column, *, k: int = DEFAULT_K) -> list[Column]:
    """The k bit positions of one value: k non-overlapping 16-bit
    slices of md5(value) — independent by the hash's design, and
    identically computable in DuckDB ('0x' || substr(...) casts)."""
    if not (1 <= k <= 8):
        raise ValueError(f"k must be in [1, 8] (md5 has 8 16-bit windows), got {k}")
    h = F.md5(col.cast("string"))
    return [
        F.conv(
            F.substring(h, 1 + i * _HEX_PER_POS, _HEX_PER_POS), 16, 10
        ).cast("int")
        for i in range(k)
    ]


def bloom_build(
    ref: DataFrame, value_col: str, *, k: int = DEFAULT_K
) -> DataFrame:
    """The filter: distinct bit positions set by the reference values —
    a 1-column frame (``pos`` int), <= k * |ref| rows, broadcastable.
    One distinct over the (tiny) reference side; the corpus is never
    touched."""
    pos = bloom_position_columns(F.col(value_col), k=k)
    return (
        ref.select(F.explode(F.array(*pos)).alias("pos")).distinct()
    )


def bloom_contains(
    values: DataFrame,
    value_col: str,
    positions: DataFrame,
    *,
    k: int = DEFAULT_K,
) -> DataFrame:
    """The bloom-POSITIVE subset of a distinct value relation: a value
    passes iff ALL k of its positions are set. Plan: explode the k
    positions per value, broadcast-hash join the position frame, keep
    values with k hits — the corpus side never shuffles; the only wide
    operator is the per-value hit count, which runs on rows already
    reduced to (value, hit) by the broadcast join."""
    pos = bloom_position_columns(F.col(value_col), k=k)
    probed = values.select(
        value_col, F.explode(F.array(*pos)).alias("pos")
    )
    hits = (
        probed.join(F.broadcast(positions), "pos")
        .groupBy(value_col)
        .agg(F.count("*").alias("__hits"))
        .filter(F.col("__hits") == k)
        .drop("__hits")
    )
    return hits


def bloom_positions_sql(value_expr: str, *, k: int = DEFAULT_K) -> str:
    """DuckDB twin of bloom_position_columns as a SQL list literal:
    ``[pos_0, ..., pos_{k-1}]`` over the same md5 windows."""
    if not (1 <= k <= 8):
        raise ValueError(f"k must be in [1, 8], got {k}")
    parts = ", ".join(
        f"CAST(('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), "
        f"{1 + i * _HEX_PER_POS}, {_HEX_PER_POS})) AS INTEGER)"
        for i in range(k)
    )
    return f"[{parts}]"
