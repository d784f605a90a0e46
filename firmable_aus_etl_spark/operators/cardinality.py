"""Portable HyperLogLog distinct-count sketch (Flajolet, Fusy,
Gandouet & Meunier, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007) — cardinality estimation
under the oracle gate.

Why this exists next to ``count(distinct ...)``: the exact count
shuffles every distinct value once — at 100 TB the corpus-governance
questions ("how many distinct tokens / urls / ngrams per source?")
each cost a full wide shuffle of the value domain. The HLL sketch
answers them with BOUNDED state: m = 2^b registers per group, built by
one partial-aggregating groupBy whose map-side combine collapses each
partition to <= m rows per group before anything crosses the network.
Registers are max-mergeable, so the same frames roll up across
partitions, days, or streaming micro-batches without rescanning
(the streaming/sketches.py Misra-Gries discipline, applied to
cardinality).

Spark ships approx_count_distinct (also HLL) — but its register
layout is engine-private, so its output can never be hash-checked
against another engine. This implementation derives every register
from the PORTABLE md5 hash (the dedup.md5_base_hash discipline):
bucket = first b/4 hex chars, rho = leading-zero count of the next 32
hash bits + 1, computed with string/bit primitives that exist
identically in Spark and DuckDB — so the ESTIMATE ITSELF is
oracle-checkable bit-for-bit, corrections and all. Estimator follows
the original paper: raw = alpha_m * m^2 / sum(2^-M_j) with
linear-counting small-range correction (m * ln(m/zeros)) and the
32-bit large-range correction (-2^32 * ln(1 - raw/2^32)).

Engine-portable determinism: the harmonic sum accumulates INTEGER
units of 2^-33 (each register contributes the exact long
2^(33 - M_j), absent registers 2^33), so partial-aggregation order
cannot perturb it; the alpha_m * m^2 * 2^33 numerator is pre-folded in
Python and interpolated as the same decimal literal into both engines;
ln/division happen once per GROUP on identical operands.

reference scope: beyond-reference corpus governance (SURVEY §4); the
reference's profiling step (data_quality_checks.py) counts distincts
exactly in pandas — viable at its scale, not at this engine's.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Register-index width in BITS; must be a multiple of 4 so the bucket
#: is a whole-hex-char slice in both engines.
DEFAULT_B = 8

#: rho is computed over a fixed 32-bit window of the hash, so register
#: values live in [1, 33] and 2^(33-rho) always fits a BIGINT.
_RHO_BITS = 32
_POW2_33 = 1 << 33
_POW2_32F = float(1 << 32)


def _m(b: int) -> int:
    if b % 4 != 0 or not (4 <= b <= 16):
        raise ValueError(f"b must be a multiple of 4 in [4, 16], got {b}")
    return 1 << b


def hll_alpha(b: int = DEFAULT_B) -> float:
    """alpha_m from the HLL paper (m >= 128 closed form for b >= 7;
    the small-m constants below it)."""
    m = _m(b)
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_register_columns(col: Column, *, b: int = DEFAULT_B) -> tuple[Column, Column]:
    """(bucket, rho) register coordinates for one value — the portable
    per-row kernel. bucket = first b bits of md5 (whole hex chars);
    rho = leading zeros of the NEXT 32 hash bits + 1 (in [1, 33]),
    computed on the lpad'ed binary string so the same expression runs
    in DuckDB."""
    m_chars = _m(b).bit_length() // 4  # b/4 hex chars
    h = F.md5(col.cast("string"))
    bucket = F.conv(F.substring(h, 1, m_chars), 16, 10).cast("int")
    rem = F.conv(F.substring(h, m_chars + 1, _RHO_BITS // 4), 16, 10).cast(
        "long"
    )
    rho = (
        F.length(
            F.regexp_extract(
                F.lpad(F.bin(rem), _RHO_BITS, "0"), "^(0*)", 1
            )
        )
        + F.lit(1)
    ).cast("int")
    return bucket, rho


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    b: int = DEFAULT_B,
    est_col: str = "est_distinct",
) -> DataFrame:
    """Per-group HLL distinct estimate of ``value_col``. Returns
    (group_cols..., est_col double rounded to 4, buckets_used long).

    Plan shape: groupBy(group, bucket).max(rho) — map-side combine
    bounds every partition's contribution at m rows per group — then
    one <=m-row-per-group aggregation applies the estimator. Nothing
    driver-side; registers stay mergeable frames (hll_registers /
    hll_merge_registers expose that seam for incremental and
    streaming rollups).
    """
    regs = hll_registers(df, group_cols, value_col, b=b)
    return hll_estimate_from_registers(
        regs, group_cols, b=b, est_col=est_col
    )


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    b: int = DEFAULT_B,
) -> DataFrame:
    """The register frame (group_cols..., __bkt, __m) — the sketch
    STATE. <= 2^b rows per group regardless of input size, and
    max-mergeable: registers of a union == per-bucket max of the
    parts' registers (test-proven), which is what makes incremental /
    streaming cardinality a plain unionByName + max instead of a
    rescan."""
    groups = list(group_cols)
    bucket, rho = hll_register_columns(F.col(value_col), b=b)
    return (
        df.select(*groups, bucket.alias("__bkt"), rho.alias("__rho"))
        .groupBy(*groups, "__bkt")
        .agg(F.max("__rho").alias("__m"))
    )


def hll_merge_registers(
    state: DataFrame, batch: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """MAX-merge two register frames (the HLL union operation): the
    merged sketch is EXACTLY the sketch of the concatenated inputs —
    no approximation stacks up across merges, so a register frame
    maintained over N micro-batches equals the from-scratch recompute
    frame row-for-row (the streaming/incremental.py recompute-equality
    discipline, applied to sketch state)."""
    groups = list(group_cols)
    return (
        state.unionByName(batch)
        .groupBy(*groups, "__bkt")
        .agg(F.max("__m").alias("__m"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: Sequence[str],
    *,
    b: int = DEFAULT_B,
    est_col: str = "est_distinct",
) -> DataFrame:
    """Estimator tail over a register frame — shared by the one-shot
    hll_distinct and the incremental path, so a merged state frame
    yields the identical estimate expression (same folded literals as
    the SQL twin)."""
    m = _m(b)
    alpha = hll_alpha(b)
    # pre-folded numerator: alpha_m * m^2 * 2^33 (same decimal literal
    # lands in the SQL twin via hll_estimator_sql)
    c_num = alpha * m * m * float(_POW2_33)
    groups = list(group_cols)
    per_group = regs.groupBy(*groups).agg(
        F.count("*").cast("long").alias("__present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 33 - __m)")).alias(
            "__sum_present"
        ),
    )
    zeros = (F.lit(m).cast("long") - F.col("__present")).alias("__zeros")
    with_sum = per_group.select(
        *groups,
        "__present",
        zeros,
        (
            F.col("__sum_present")
            + (F.lit(m) - F.col("__present")) * F.lit(_POW2_33).cast("long")
        ).alias("__sum_int"),
    )
    raw = F.lit(c_num) / F.col("__sum_int").cast("double")
    est = (
        F.when(
            (raw <= F.lit(2.5 * m)) & (F.col("__zeros") > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("__zeros")),
        )
        .when(
            raw > F.lit(_POW2_32F / 30.0),
            # clamp raw strictly below 2^32: the 32-bit correction's
            # domain is raw < 2^32 (ln of a non-positive otherwise);
            # alpha*m^2*2^33/min_sum can exceed it in principle, and a
            # silent NaN would replay in BOTH engines — same least()
            # literal in the SQL twin (round-8 ADVICE)
            -F.lit(_POW2_32F)
            * F.log(
                F.lit(1.0)
                - F.least(raw, F.lit(_POW2_32F - 1.0)) / F.lit(_POW2_32F)
            ),
        )
        .otherwise(raw)
    )
    return with_sum.select(
        *groups,
        F.round(est, 4).alias(est_col),
        F.col("__present").alias("buckets_used"),
    )


def hll_estimator_sql(
    rows_cte: str,
    group_cols: Sequence[str],
    value_expr: str,
    *,
    b: int = DEFAULT_B,
    est_col: str = "est_distinct",
) -> str:
    """The DuckDB twin of hll_distinct as a SQL text fragment: given a
    CTE name exposing (group_cols..., the value expression), emit the
    chain of CTEs ending in ``hll_out`` (group_cols..., est_col,
    buckets_used) with IDENTICAL register construction, integer
    harmonic sum, and correction branches — decimal literals
    interpolated from the SAME Python floats the Spark plan uses, so
    the two engines execute the same arithmetic. Callers append their
    own final SELECT over hll_out. Used by the oracle registrations
    (and tests) so the estimator logic cannot drift between engines."""
    m = _m(b)
    m_chars = m.bit_length() // 4
    c_num = repr(hll_alpha(b) * m * m * float(_POW2_33))
    g = ", ".join(group_cols)
    lin_gate = repr(2.5 * m)
    large_gate = repr(_POW2_32F / 30.0)
    mf = repr(float(m))
    p32 = repr(_POW2_32F)
    return f"""
hashed AS (
  SELECT {g}, md5(CAST({value_expr} AS VARCHAR)) AS h FROM {rows_cte}
),
regs AS (
  SELECT {g},
         CAST(('0x' || substr(h, 1, {m_chars})) AS INTEGER) AS bkt,
         length(regexp_extract(
           lpad(bin(CAST(('0x' || substr(h, {m_chars + 1}, 8)) AS BIGINT)),
                32, '0'), '^(0*)', 1)) + 1 AS rho
  FROM hashed
),
reg_max AS (
  SELECT {g}, bkt, max(rho) AS mreg FROM regs GROUP BY {g}, bkt
),
per_group AS (
  SELECT {g}, CAST(count(*) AS BIGINT) AS present,
         CAST(sum(CAST(1 AS BIGINT) << (33 - mreg)) AS BIGINT) AS sum_present
  FROM reg_max GROUP BY {g}
),
summed AS (
  SELECT {g}, present, ({m} - present) AS zeros,
         sum_present + ({m} - present) * CAST({_POW2_33} AS BIGINT) AS sum_int
  FROM per_group
),
est AS (
  SELECT {g}, present, zeros,
         {c_num} / CAST(sum_int AS DOUBLE) AS raw
  FROM summed
),
hll_out AS (
  SELECT {g},
         round(CASE
           WHEN raw <= {lin_gate} AND zeros > 0
             THEN {mf} * ln({mf} / zeros)
           WHEN raw > {large_gate}
             THEN -{p32} * ln(1.0 - least(raw, {repr(_POW2_32F - 1.0)}) / {p32})
           ELSE raw
         END, 4) AS {est_col},
         present AS buckets_used
  FROM est
)"""
