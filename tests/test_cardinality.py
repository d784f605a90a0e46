"""Portable HyperLogLog sketch (operators/cardinality.py): register
kernel ground truth, accuracy on known cardinalities, both correction
branches, mergeability, layout invariance, plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators.cardinality import (
    hll_alpha,
    hll_distinct,
    hll_register_columns,
)


def _vals(spark, values, group="g"):
    return spark.createDataFrame(
        [(group, str(v)) for v in values], "g string, v string"
    )


def _py_registers(values, b=8):
    """Reference register construction straight from the definition."""
    chars = b // 4
    regs = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        bkt = int(h[:chars], 16)
        rem = int(h[chars:chars + 8], 16)
        rho = (32 - rem.bit_length()) + 1  # leading zeros of 32-bit + 1
        regs[bkt] = max(regs.get(bkt, 0), rho)
    return regs


def _py_estimate(values, b=8):
    m = 1 << b
    regs = _py_registers(values, b)
    zeros = m - len(regs)
    s = sum(2.0 ** -r for r in regs.values()) + zeros
    raw = hll_alpha(b) * m * m / s
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    if raw > 2.0 ** 32 / 30.0:
        return -(2.0 ** 32) * math.log(1.0 - raw / 2.0 ** 32)
    return raw


def test_register_kernel_matches_hand_md5(spark):
    df = spark.createDataFrame([("abc",), ("xyz",)], "v string")
    bkt, rho = hll_register_columns(F.col("v"))
    got = {
        r["v"]: (r["b"], r["r"])
        for r in df.select("v", bkt.alias("b"), rho.alias("r")).collect()
    }
    for v in ("abc", "xyz"):
        h = hashlib.md5(v.encode()).hexdigest()
        want_b = int(h[:2], 16)
        rem = int(h[2:10], 16)
        want_r = (32 - rem.bit_length()) + 1
        assert got[v] == (want_b, want_r)


def test_estimate_matches_reference_implementation_exactly(spark):
    # the engine must reproduce the from-the-paper Python estimator to
    # rounding precision on BOTH branches
    for n in (25, 5000):  # linear-counting branch / raw branch
        vals = [f"item-{i}" for i in range(n)]
        out = hll_distinct(_vals(spark, vals), ["g"], "v").collect()[0]
        assert out["est_distinct"] == pytest.approx(
            _py_estimate(vals), abs=1e-3
        )
        assert out["buckets_used"] == len(_py_registers(vals))


def test_accuracy_within_hll_error_bound(spark):
    # sigma = 1.04/sqrt(256) = 6.5%; assert 3 sigma
    n = 5000
    out = hll_distinct(
        _vals(spark, [f"x{i}" for i in range(n)]), ["g"], "v"
    ).collect()[0]
    assert abs(out["est_distinct"] - n) / n < 3 * 1.04 / 16


def test_small_range_uses_linear_counting_and_is_tight(spark):
    n = 30
    out = hll_distinct(
        _vals(spark, [f"tok{i}" for i in range(n)]), ["g"], "v"
    ).collect()[0]
    # linear counting at 30/256 load: well inside 15%
    assert abs(out["est_distinct"] - n) / n < 0.15
    assert out["buckets_used"] <= n


def test_duplicates_do_not_move_the_estimate(spark):
    base = [f"d{i}" for i in range(100)]
    once = hll_distinct(_vals(spark, base), ["g"], "v").collect()[0]
    tenx = hll_distinct(_vals(spark, base * 10), ["g"], "v").collect()[0]
    assert once["est_distinct"] == tenx["est_distinct"]
    assert once["buckets_used"] == tenx["buckets_used"]


def test_registers_merge_by_max(spark):
    # sketch(A ∪ B) register frame == per-bucket max of sketch(A), sketch(B)
    a = [f"a{i}" for i in range(500)]
    b = [f"b{i}" for i in range(500)]
    ra, rb, rboth = _py_registers(a), _py_registers(b), _py_registers(a + b)
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert merged == rboth
    # and the engine estimate over the union matches the reference on
    # the merged registers
    out = hll_distinct(_vals(spark, a + b), ["g"], "v").collect()[0]
    assert out["est_distinct"] == pytest.approx(
        _py_estimate(a + b), abs=1e-3
    )


def test_layout_invariance(spark):
    vals = [f"k{i}" for i in range(2000)]
    df = _vals(spark, vals)
    one = hll_distinct(df.repartition(1), ["g"], "v").collect()[0]
    many = hll_distinct(df.repartition(16, "v"), ["g"], "v").collect()[0]
    assert one.asDict() == many.asDict()


def test_groups_are_independent(spark):
    rows = [("g1", f"v{i}") for i in range(50)] + [
        ("g2", f"v{i}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r["g"]: r for r in hll_distinct(df, ["g"], "v").collect()}
    assert out["g1"]["est_distinct"] == pytest.approx(
        _py_estimate([f"v{i}" for i in range(50)]), abs=1e-3
    )
    assert out["g2"]["est_distinct"] == pytest.approx(
        _py_estimate([f"v{i}" for i in range(500)]), abs=1e-3
    )


def test_invalid_b_rejected(spark):
    with pytest.raises(ValueError):
        hll_distinct(_vals(spark, ["x"]), ["g"], "v", b=10)


def test_plan_is_two_aggregations_no_python(spark):
    df = _vals(spark, [f"p{i}" for i in range(64)])
    plan = (
        hll_distinct(df, ["g"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_register_merge_equals_recompute(spark):
    # maintain registers across 3 "micro-batches"; the merged state
    # must equal the from-scratch register frame ROW-FOR-ROW, and the
    # estimate over it must equal the one-shot estimate exactly
    from firmable_aus_etl_spark.operators.cardinality import (
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers,
    )

    batches = [
        [f"a{i}" for i in range(300)],
        [f"b{i}" for i in range(300)] + [f"a{i}" for i in range(50)],
        [f"c{i}" for i in range(200)],
    ]
    state = hll_registers(_vals(spark, batches[0]), ["g"], "v")
    for batch in batches[1:]:
        state = hll_merge_registers(
            state, hll_registers(_vals(spark, batch), ["g"], "v"), ["g"]
        )
    full = hll_registers(
        _vals(spark, [v for b in batches for v in b]), ["g"], "v"
    )
    assert sorted(tuple(r) for r in state.collect()) == sorted(
        tuple(r) for r in full.collect()
    )
    est_inc = hll_estimate_from_registers(state, ["g"]).collect()[0]
    est_full = hll_distinct(
        _vals(spark, [v for b in batches for v in b]), ["g"], "v"
    ).collect()[0]
    assert est_inc.asDict() == est_full.asDict()


def test_merge_is_idempotent_and_commutative(spark):
    from firmable_aus_etl_spark.operators.cardinality import (
        hll_merge_registers,
        hll_registers,
    )

    ra = hll_registers(_vals(spark, [f"a{i}" for i in range(100)]), ["g"], "v")
    rb = hll_registers(_vals(spark, [f"b{i}" for i in range(100)]), ["g"], "v")
    ab = sorted(tuple(r) for r in hll_merge_registers(ra, rb, ["g"]).collect())
    ba = sorted(tuple(r) for r in hll_merge_registers(rb, ra, ["g"]).collect())
    aa = sorted(
        tuple(r)
        for r in hll_merge_registers(
            hll_merge_registers(ra, rb, ["g"]), ra, ["g"]
        ).collect()
    )
    assert ab == ba == aa


def test_large_range_correction_domain_is_clamped(spark):
    # adversarial register state: every bucket present at the maximum
    # rho (33), so sum_int collapses to m and raw = alpha*m^2*2^33/m
    # >> 2^32 — outside the 32-bit correction's ln(1 - raw/2^32)
    # domain. Before the round-8 ADVICE clamp this produced ln of a
    # negative number (NaN) in BOTH engines identically, which the
    # oracle gate can never catch; the least(raw, 2^32-1) clamp keeps
    # the estimate finite. Expected value recomputed with the same
    # double arithmetic here.
    from firmable_aus_etl_spark.operators.cardinality import (
        hll_alpha,
        hll_estimate_from_registers,
        hll_estimator_sql,
    )

    m = 1 << 8  # DEFAULT_B = 8
    regs = spark.createDataFrame(
        [("a", i, 33) for i in range(m)], "g string, __bkt int, __m int"
    )
    row = hll_estimate_from_registers(regs, ["g"]).collect()[0]
    est = row["est_distinct"]
    assert est is not None and not math.isnan(est) and est > 0
    p32 = float(1 << 32)
    raw = hll_alpha(8) * m * m * float(1 << 33) / m
    assert raw > p32  # the fixture really is outside the domain
    want = -p32 * math.log(1.0 - min(raw, p32 - 1.0) / p32)
    assert est == pytest.approx(round(want, 4), rel=1e-9)
    # the SQL twin carries the identical clamp literal
    assert "least(raw, 4294967295.0)" in hll_estimator_sql("r", ["g"], "v")
