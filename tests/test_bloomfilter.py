"""Portable Bloom filter (operators/bloomfilter.py): position kernel
ground truth, no-false-negative guarantee, measured FP rate vs the
design formula, duplicate-position edge, plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators.bloomfilter import (
    DEFAULT_K,
    auto_bloom_hex,
    auto_bloom_hex_case_sql,
    bloom_build,
    bloom_contains,
    bloom_position_columns,
)

# default window: 4 hex chars -> m = 2^16 bits (the auto rule's floor)
M_BITS = 1 << 16


def _frame(spark, values):
    return spark.createDataFrame([(str(v),) for v in values], "v string")


def _py_positions(v, k=DEFAULT_K):
    h = hashlib.md5(str(v).encode()).hexdigest()
    return [int(h[i * 4: i * 4 + 4], 16) for i in range(k)]


def test_position_kernel_matches_hand_md5(spark):
    df = _frame(spark, ["alpha", "beta"])
    cols = bloom_position_columns(F.col("v"))
    rows = {r["v"]: [r[f"p{i}"] for i in range(3)] for r in df.select(
        "v", *[c.alias(f"p{i}") for i, c in enumerate(cols)]
    ).collect()}
    for v in ("alpha", "beta"):
        assert rows[v] == _py_positions(v)


def test_no_false_negatives(spark):
    ref_vals = [f"ref{i}" for i in range(500)]
    ref = _frame(spark, ref_vals)
    positions = bloom_build(ref, "v")
    out = {r["v"] for r in bloom_contains(ref, "v", positions).collect()}
    assert out == set(ref_vals)


def test_fp_rate_matches_design_formula(spark):
    n, probes = 2000, 20000
    ref = _frame(spark, [f"ref{i}" for i in range(n)])
    positions = bloom_build(ref, "v")
    probe = _frame(spark, [f"other{i}" for i in range(probes)])
    fp = bloom_contains(probe, "v", positions).count()
    # distinct positions actually set (collisions make it < k*n)
    m_set = positions.count()
    expect = (m_set / M_BITS) ** DEFAULT_K * probes
    # binomial noise: allow 3 sigma + slack
    sigma = math.sqrt(expect)
    assert abs(fp - expect) < 3 * sigma + 10, (fp, expect)


def test_fp_set_is_deterministic_python_replay(spark):
    # the exact FP SET (not just the rate) must equal the hash-replay —
    # the property the oracle gate relies on
    ref_vals = [f"r{i}" for i in range(300)]
    probe_vals = [f"p{i}" for i in range(5000)]
    positions = bloom_build(_frame(spark, ref_vals), "v")
    got = {
        r["v"]
        for r in bloom_contains(
            _frame(spark, probe_vals), "v", positions
        ).collect()
    }
    pos_set = set()
    for v in ref_vals:
        pos_set.update(_py_positions(v))
    want = {
        v for v in probe_vals
        if all(p in pos_set for p in _py_positions(v))
    }
    assert got == want


def test_value_with_duplicate_positions_passes(spark):
    # find a value whose k windows collide on a position: a true
    # bitmap bloom must still pass it when its (fewer distinct)
    # positions are all set — the count(*)==k form handles it because
    # each exploded duplicate row joins the position set independently
    dup = None
    for i in range(200000):
        p = _py_positions(f"cand{i}")
        if len(set(p)) < len(p):
            dup = f"cand{i}"
            break
    assert dup is not None, "no duplicate-window value in 200k tries"
    positions = bloom_build(_frame(spark, [dup]), "v")
    out = [r["v"] for r in bloom_contains(
        _frame(spark, [dup]), "v", positions
    ).collect()]
    assert out == [dup]


def test_invalid_k_rejected():
    with pytest.raises(ValueError):
        bloom_position_columns(F.lit("x"), k=9)


def test_plan_broadcasts_positions_no_python(spark):
    ref = _frame(spark, [f"r{i}" for i in range(100)])
    probe = _frame(spark, [f"p{i}" for i in range(100)])
    out = bloom_contains(probe, "v", bloom_build(ref, "v"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_auto_bloom_hex_boundaries_and_raise():
    """The sizing rule's integer thresholds, pinned at the exact
    boundaries the SQL CASE bakes (round-10: the fixed 2^16 filter
    saturated at syn30 — the sizing must be LOUD past capacity, never
    clamped)."""
    assert auto_bloom_hex(1) == 4
    assert auto_bloom_hex(1365) == 4       # 16*3*1365 <= 2^16
    assert auto_bloom_hex(1366) == 5
    assert auto_bloom_hex(21845) == 5
    assert auto_bloom_hex(21846) == 6
    assert auto_bloom_hex(1_400_000) == 7  # the syn30 regime
    assert auto_bloom_hex(22906492245) == 10
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        auto_bloom_hex(22906492246)


def test_auto_bloom_case_sql_matches_python_rule():
    """Every CASE threshold agrees with auto_bloom_hex on both sides
    of the boundary — the same duality discipline as the simhash
    width CASE."""
    import re

    case = auto_bloom_hex_case_sql()
    pairs = re.findall(r"WHEN n <= (\d+) THEN (\d+)", case)
    assert pairs, case
    for thresh, h in pairs:
        assert auto_bloom_hex(int(thresh)) == int(h)
        if int(h) > 4:
            prev = int(pairs[int(h) - 5][0])  # previous threshold
            assert auto_bloom_hex(prev + 1) == int(h)


def test_wide_windows_no_false_negatives_and_fewer_fps(spark):
    """h=6 windows (m = 2^24): still no false negatives, and the FP
    count on a fixed probe set drops versus the saturating default —
    the property the auto-sizing buys at scale."""
    n = 3000
    ref = _frame(spark, [f"ref{i}" for i in range(n)])
    probe = _frame(spark, [f"other{i}" for i in range(20000)])
    pos4 = bloom_build(ref, "v", hex_per_pos=4)
    pos6 = bloom_build(ref, "v", hex_per_pos=6)
    got6 = {
        r["v"]
        for r in bloom_contains(ref, "v", pos6, hex_per_pos=6).collect()
    }
    assert len(got6) == n  # no false negatives at the wide width
    fp4 = bloom_contains(probe, "v", pos4, hex_per_pos=4).count()
    fp6 = bloom_contains(probe, "v", pos6, hex_per_pos=6).count()
    assert fp6 < fp4 and fp6 <= 2, (fp4, fp6)
