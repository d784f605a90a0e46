"""Deterministic sampling (operators/sampling.py): layout-invariance,
weighted inclusion bias, stratified k, and k-anonymity audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators.aggregates import k_anonymity_violations
from firmable_aus_etl_spark.operators.sampling import (
    bernoulli_sample,
    weighted_sample_ares,
)


def _ids(df, col="k"):
    return sorted(r[col] for r in df.collect())


def test_bernoulli_layout_invariant(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    s1 = _ids(bernoulli_sample(df, "k", 0.3))
    s2 = _ids(bernoulli_sample(df.repartition(7), "k", 0.3))
    assert s1 == s2
    # rate lands near the target (hash uniformity)
    assert 0.25 < len(s1) / 2000 < 0.35


def test_bernoulli_nested_fractions(spark):
    # a 10% sample is a subset of the 30% sample: same hash, same
    # threshold direction — the property that makes rates tunable
    # without resampling history
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    small = set(_ids(bernoulli_sample(df, "k", 0.1)))
    big = set(_ids(bernoulli_sample(df, "k", 0.3)))
    assert small <= big


def test_weighted_sample_biases_toward_heavy_rows(spark):
    # weights 1 vs 100: heavy rows should dominate the sample
    rows = [(i, 100 if i < 200 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, w long")
    picked = weighted_sample_ares(df, "k", "w", k=100)
    got = picked.collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r.w == 100)
    assert heavy > 70  # ~200x total weight on the heavy block
    # deterministic under repartition
    again = weighted_sample_ares(df.repartition(13), "k", "w", k=100)
    assert _ids(picked) == _ids(again)


def test_weighted_sample_stratified_k_per_group(spark):
    rows = [(i, 1 + i % 5, f"g{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "k long, w long, g string")
    picked = weighted_sample_ares(df, "k", "w", k=10, strata=["g"])
    per = {r.g: r.n for r in picked.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per == {"g0": 10, "g1": 10, "g2": 10}


def test_k_anonymity_flags_small_groups_only(spark):
    rows = [("NSW", "A")] * 10 + [("VIC", "B")] * 2 + [("QLD", "B")] * 1
    df = spark.createDataFrame(rows, "state string, seg string")
    out = {
        (r.state, r.seg): r.group_size
        for r in k_anonymity_violations(df, ["state", "seg"], k=5).collect()
    }
    assert out == {("VIC", "B"): 2, ("QLD", "B"): 1}


def test_temperature_mixture_rates_properties(spark):
    """sqrt-temperature mixing: weights sum to ~1, small groups get
    MORE than proportional share, big groups less; expected kept
    units land near the budget when no group saturates rate=1."""
    from firmable_aus_etl_spark.operators.sampling import temperature_mixture_rates

    rows = [("big", i, 100) for i in range(900)] + [
        ("small", 10_000 + i, 100) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "grp string, doc_id long, n_tok int")
    out = {r.grp: r for r in
           temperature_mixture_rates(df, "grp", "n_tok", budget=20_000).collect()}
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-5
    # proportional share of 'small' is 10%; sqrt temperature gives 25%
    assert out["small"].weight > 0.2
    assert out["big"].weight < 0.8
    expected = sum(out[g].rate * out[g].n_units for g in out)
    assert abs(expected - 20_000) < 200
    # rates are keep-probabilities
    assert all(0.0 < out[g].rate <= 1.0 for g in out)


def test_temperature_mixture_saturates_at_one(spark):
    from firmable_aus_etl_spark.operators.sampling import temperature_mixture_rates

    df = spark.createDataFrame(
        [("only", i, 10) for i in range(50)], "grp string, doc_id long, n_tok int"
    )
    out = temperature_mixture_rates(df, "grp", "n_tok", budget=10**9).collect()[0]
    assert out.rate == 1.0 and out.weight == 1.0
