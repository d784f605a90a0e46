"""Deterministic distributed sampling.

Spark's native ``df.sample``/``sampleBy`` are seed- AND
partitioning-dependent: the same seed yields a different sample when
the file layout or parallelism changes, which makes runs
irreproducible across clusters (and un-oracle-able). Every sampler
here instead derives its randomness from a key hash, so the sample is
a pure function of the data — stable under repartitioning, engine
changes, and incremental re-runs (the same property
train_test_split_hash relies on for leakage-proof splits).

Scale shape: hash + rank are map-side narrow; the only shuffle is the
top-k window (planned as WindowGroupLimit, k survivors per partition
cross the wire) or a single global TakeOrderedAndProject for the
unstratified forms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^12: the key hash uses the first 12 hex digits of md5 -> a 48-bit
# integer, exactly representable in a double (and in DuckDB's SQL), so
# u = (h+1)/2^48 is bit-identical across engines.
_HASH_SPACE = float(1 << 48)


def _uniform_from_key(key: Column) -> Column:
    """Deterministic uniform u in (0, 1] from a key column: the first
    48 bits of md5(key) scaled into the unit interval. Never 0, so
    ln(u) is finite."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 12), 16, 10).cast("long")
    return (h + F.lit(1).cast("long")) / F.lit(_HASH_SPACE)


def bernoulli_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep each row iff its key-hash uniform falls below ``fraction``
    — the reproducible Bernoulli sample (same rows on any cluster
    layout; appends never resample old rows)."""
    return df.filter(_uniform_from_key(F.col(key_col)) <= F.lit(fraction))


def weighted_sample_ares(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata: Sequence[str] = (),
) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis
    A-Res: each row gets priority ``ln(u) / w`` (u = key-hash uniform,
    w > 0 weight) and the k LARGEST priorities win — inclusion
    probability proportional to weight, deterministic given the data.

    With ``strata``, k rows are kept per stratum (the weighted form of
    stratified sampling). Adds a ``__priority`` column (rounded to 9
    for cross-engine display; ranking uses the unrounded value).

    Scale: priorities are map-side; selection is one top-k — a
    TakeOrderedAndProject (global) or WindowGroupLimit (stratified),
    never a full sort.
    """
    pri = F.log(_uniform_from_key(F.col(key_col))) / F.col(weight_col)
    scored = df.withColumn("__pri", pri)
    if strata:
        from firmable_aus_etl_spark.operators.windows import topk_per_group

        picked = topk_per_group(
            scored,
            list(strata),
            [F.col("__pri").desc(), F.col(key_col).asc()],
            k=k,
        )
    else:
        picked = scored.orderBy(F.col("__pri").desc(), F.col(key_col).asc()).limit(k)
    return picked.withColumn("__priority", F.round("__pri", 9)).drop("__pri")


def temperature_mixture_rates(
    df: DataFrame,
    group_col: str,
    size_col: str,
    *,
    budget: int,
) -> DataFrame:
    """Temperature-scaled (alpha = 0.5) mixture-sampling rates per
    group — the multilingual/domain-mixing recipe (sample group g at
    weight n_g^alpha / sum n^alpha, so small domains are up-weighted
    relative to proportional sampling but large ones still dominate;
    alpha=0.5 is the sqrt temperature used by multilingual LM data
    mixes). Returns one row per group: (group, n_rows, n_units,
    weight, rate) where rate = min(1, budget * weight / n_units) is
    the per-row keep probability that hits the unit budget in
    expectation.

    alpha is fixed at 0.5 because sqrt is a correctly-rounded IEEE
    primitive on every engine — pow(x, a) for general a is libm- and
    engine-specific, which would break oracle bit-equality. weight
    and rate round at 6 dp on both engines (the weight sum crosses an
    engine-specific aggregation order).

    Scale shape: one partial-aggregated groupBy + a 1-row scalar
    attachment; downstream application is a map-side hash filter
    (bernoulli_sample per group rate) — no shuffle of the corpus.
    """
    g = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(size_col).cast("long").alias("n_units"),
    )
    w = g.withColumn("__w", F.sqrt(F.col("n_units").cast("double")))
    tot = w.agg(F.sum("__w").alias("__tw"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n_rows",
            "n_units",
            F.round(F.col("__w") / F.col("__tw"), 6).alias("weight"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(budget)) * F.col("__w") / F.col("__tw")
                    / F.col("n_units").cast("double"),
                ),
                6,
            ).alias("rate"),
        )
    )
