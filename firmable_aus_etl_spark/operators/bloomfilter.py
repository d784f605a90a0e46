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

#: default 16-bit positions (4 hex chars, m = 65536 bits) — right for
#: reference sets up to ~1.4k values at the 1/16 load target and kept
#: as the DEFAULT so small-corpus results are unchanged. m is NOT
#: fixed anymore: round-10's decade-3 run caught the fixed 2^16 filter
#: SATURATING (syn30: ~1.4M eval grams set every bit, FP -> 1, the
#: "scale path" silently degraded into a worse exact join — 378 s vs
#: the 43.9 s syn10 point, tail 1.96; the round-8 constant-clamp class
#: verbatim). Size with auto_bloom_hex for data-dependent reference
#: sets.
_HEX_PER_POS = 4
DEFAULT_K = 3
#: md5 is 32 hex chars: k windows of h hex chars need k*h <= 32.
_MD5_HEX = 32
#: load-factor target: k*n_ref <= m/16 => per-probe hit rate
#: 1 - e^(-1/16) ~ 0.061, FP ~ 0.061^k (2.2e-4 at k=3).
_LOAD_SHIFT = 4


def auto_bloom_hex(n_ref: int, *, k: int = DEFAULT_K) -> int:
    """Position-window width in HEX CHARS (m = 2^(4h) bits) for a
    reference set of ``n_ref`` values: the smallest h >= 4 with
    k * n_ref * 16 <= 2^(4h) — pure integer arithmetic, replayable in
    SQL as a CASE over integer thresholds (the simhash width-CASE
    pattern). The positions frame stays SPARSE (<= k * n_ref rows), so
    a wider m costs nothing in broadcast size — the only cap is the
    md5 digest: k windows of h hex chars need k*h <= 32, and past that
    this RAISES instead of clamping (the round-8 lesson: a silent
    clamp on a size-derived rule is a future cliff — at k=3 the
    capacity is h=10, m=2^40, ~22.9e9 reference values)."""
    h_max = _MD5_HEX // k
    h = 4
    while (k * int(n_ref)) << _LOAD_SHIFT > (1 << (4 * h)):
        h += 1
        if h > h_max:
            raise RuntimeError(
                f"bloom reference set of {n_ref} values needs a "
                f"position window wider than md5 allows at k={k} "
                f"(h <= {h_max}); use a wider hash family — do NOT "
                "clamp (round-8 lesson)"
            )
    return h


def bloom_position_columns(
    col: Column, *, k: int = DEFAULT_K, hex_per_pos: int = _HEX_PER_POS
) -> list[Column]:
    """The k bit positions of one value: k non-overlapping
    ``hex_per_pos``-char slices of md5(value) — independent by the
    hash's design, and identically computable in DuckDB
    ('0x' || substr(...) casts). Positions are BIGINT once
    hex_per_pos > 7 (2^28 < positions <= 2^40); long on both sides
    keeps every width portable."""
    if not (1 <= k <= 8):
        raise ValueError(f"k must be in [1, 8], got {k}")
    if k * hex_per_pos > _MD5_HEX:
        raise ValueError(
            f"k={k} windows of {hex_per_pos} hex chars exceed the md5 "
            f"digest ({_MD5_HEX} hex chars)"
        )
    h = F.md5(col.cast("string"))
    return [
        F.conv(
            F.substring(h, 1 + i * hex_per_pos, hex_per_pos), 16, 10
        ).cast("long")
        for i in range(k)
    ]


def bloom_build(
    ref: DataFrame,
    value_col: str,
    *,
    k: int = DEFAULT_K,
    hex_per_pos: int = _HEX_PER_POS,
) -> DataFrame:
    """The filter: distinct bit positions set by the reference values —
    a 1-column frame (``pos`` long), <= k * |ref| rows, broadcastable.
    One distinct over the (tiny) reference side; the corpus is never
    touched. ``hex_per_pos`` must match the probe side
    (bloom_contains) — size it with auto_bloom_hex(ref count) when the
    reference set is data-dependent."""
    pos = bloom_position_columns(F.col(value_col), k=k, hex_per_pos=hex_per_pos)
    return (
        ref.select(F.explode(F.array(*pos)).alias("pos")).distinct()
    )


def bloom_contains(
    values: DataFrame,
    value_col: str,
    positions: DataFrame,
    *,
    k: int = DEFAULT_K,
    hex_per_pos: int = _HEX_PER_POS,
) -> DataFrame:
    """The bloom-POSITIVE subset of a distinct value relation: a value
    passes iff ALL k of its positions are set. Plan: explode the k
    positions per value, broadcast-hash join the position frame, keep
    values with k hits — the corpus side never shuffles; the only wide
    operator is the per-value hit count, which runs on rows already
    reduced to (value, hit) by the broadcast join."""
    pos = bloom_position_columns(F.col(value_col), k=k, hex_per_pos=hex_per_pos)
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


def auto_bloom_hex_case_sql(*, k: int = DEFAULT_K) -> str:
    """SQL CASE replaying auto_bloom_hex EXACTLY with integer
    thresholds (h is the smallest width with 16*k*n <= 2^(4h), i.e.
    h <= H iff n <= floor(2^(4H) / (16k)) — no floats). ELSE NULL past
    the md5 capacity; the Spark side raises LOUD there first, so the
    NULL branch is unreachable in a green run."""
    h_max = _MD5_HEX // k
    whens = " ".join(
        f"WHEN n <= {(1 << (4 * h)) // (16 * k)} THEN {h}"
        for h in range(4, h_max + 1)
    )
    return f"CASE {whens} ELSE NULL END"


def bloom_positions_sql(
    value_expr: str,
    *,
    k: int = DEFAULT_K,
    hex_per_pos: int | str = _HEX_PER_POS,
) -> str:
    """DuckDB twin of bloom_position_columns as a SQL list literal:
    ``[pos_0, ..., pos_{k-1}]`` over the same md5 windows. BIGINT on
    both sides so every window width is portable. ``hex_per_pos`` may
    be an SQL expression string (e.g. a scalar-subquery reference) —
    the auto-sized twin passes the CASE-derived width so the SIZING
    DECISION itself replays relationally."""
    if not (1 <= k <= 8):
        raise ValueError(f"k must be in [1, 8], got {k}")
    if isinstance(hex_per_pos, int) and k * hex_per_pos > _MD5_HEX:
        raise ValueError(
            f"k={k} windows of {hex_per_pos} hex chars exceed md5"
        )
    hp = str(hex_per_pos)
    parts = ", ".join(
        f"CAST(('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), "
        f"1 + {i} * ({hp}), ({hp}))) AS BIGINT)"
        for i in range(k)
    )
    return f"[{parts}]"
