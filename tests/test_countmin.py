"""Portable Count-Min sketch (operators/countmin.py): bucket kernel
ground truth, over-estimate-only guarantee, reference replay,
addition-merge, plan shape."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators.countmin import (
    DEFAULT_D,
    W_BUCKETS,
    cms_bucket_columns,
    cms_build,
    cms_estimate,
    cms_merge,
)


def _frame(spark, values):
    return spark.createDataFrame([(str(v),) for v in values], "v string")


def _py_buckets(v, d=DEFAULT_D):
    h = hashlib.md5(str(v).encode()).hexdigest()
    return [int(h[r * 3: r * 3 + 3], 16) for r in range(d)]


def _py_cms(values, d=DEFAULT_D):
    counters = Counter()
    for v in values:
        for r, b in enumerate(_py_buckets(v, d)):
            counters[(r, b)] += 1
    return counters


def _py_estimate(v, counters, d=DEFAULT_D):
    return min(counters[(r, b)] for r, b in enumerate(_py_buckets(v, d)))


def test_bucket_kernel_matches_hand_md5(spark):
    df = _frame(spark, ["alpha", "beta"])
    cols = cms_bucket_columns(F.col("v"))
    rows = {
        r["v"]: [r[f"b{i}"] for i in range(DEFAULT_D)]
        for r in df.select(
            "v", *[c.alias(f"b{i}") for i, c in enumerate(cols)]
        ).collect()
    }
    for v in ("alpha", "beta"):
        assert rows[v] == _py_buckets(v)
        assert all(0 <= b < W_BUCKETS for b in rows[v])


def test_counters_match_reference_implementation(spark):
    vals = [f"x{i % 700}" for i in range(3000)]  # repeats: real counts
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(_frame(spark, vals), "v").collect()
    }
    assert got == dict(_py_cms(vals))


def test_estimates_never_underestimate_and_replay(spark):
    vals = [f"v{i % 500}" for i in range(5000)]  # 500 distinct, count 10
    exact = Counter(vals)
    counters = cms_build(_frame(spark, vals), "v")
    est = {
        r["v"]: r["est_count"]
        for r in cms_estimate(
            _frame(spark, sorted(exact)), "v", counters
        ).collect()
    }
    py_counters = _py_cms(vals)
    assert set(est) == set(exact)
    for v, true_count in exact.items():
        assert est[v] >= true_count, (v, est[v], true_count)
        assert est[v] == _py_estimate(v, py_counters)


def test_merge_equals_concat_build(spark):
    a = [f"a{i % 100}" for i in range(1000)]
    b = [f"b{i % 100}" for i in range(800)] + [f"a{i % 50}" for i in range(200)]
    merged = cms_merge(
        cms_build(_frame(spark, a), "v"), cms_build(_frame(spark, b), "v")
    )
    full = cms_build(_frame(spark, a + b), "v")
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in full.collect()
    )


def test_absent_value_with_untouched_bucket_drops(spark):
    # one built value cannot touch all d buckets of an unrelated probe
    counters = cms_build(_frame(spark, ["only"]), "v")
    out = cms_estimate(
        _frame(spark, ["never-seen-value"]), "v", counters
    ).collect()
    assert out == []  # semantically estimate 0


def test_invalid_d_rejected():
    with pytest.raises(ValueError):
        cms_bucket_columns(F.lit("x"), d=9)


def test_plan_broadcasts_counters_no_python(spark):
    vals = _frame(spark, [f"p{i}" for i in range(200)])
    counters = cms_build(vals, "v")
    plan = (
        cms_estimate(vals, "v", counters)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
