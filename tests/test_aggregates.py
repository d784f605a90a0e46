"""Audit/aggregate tests — dbt semantics asserted both ways (pass on
clean fixtures, fail on planted dirt), per SURVEY.md §5 strategy #3."""

from __future__ import annotations

from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators import aggregates as agg


def test_uniqueness_violations_pass_and_fail(spark):
    clean = spark.createDataFrame([("1",), ("2",)], ["abn"])
    dirty = spark.createDataFrame([("1",), ("1",), ("2",)], ["abn"])
    assert agg.uniqueness_violations(clean, "abn").count() == 0
    viol = agg.uniqueness_violations(dirty, "abn").collect()
    assert len(viol) == 1 and viol[0].abn == "1" and viol[0].cnt == 2


def test_notnull_violation_counts(spark):
    df = spark.createDataFrame(
        [("1", "a"), (None, "b"), (None, None)], "abn string, name string"
    )
    out = {r.column_name: r.null_count for r in agg.notnull_violation_counts(df, ["abn", "name"]).collect()}
    assert out == {"abn": 2, "name": 1}


def test_quality_metrics_pass_fail_status(spark):
    df = spark.createDataFrame(
        [("1", "a"), ("2", None), ("2", "c")], "abn string, name string"
    )
    out = agg.quality_metrics(
        df,
        run_id="run1",
        required_cols=["name"],
        unique_key="abn",
        thresholds={"completeness_name": 90.0, "uniqueness_abn": 90.0},
    )
    rows = {r.metric_name: (float(r.metric_value), r.status) for r in out.collect()}
    assert rows["row_count"][0] == 3.0
    assert rows["completeness_name"] == (66.67, "fail")
    assert rows["uniqueness_abn"] == (66.67, "fail")
    assert all(r.pipeline_run_id == "run1" for r in out.collect())


def test_argmax_per_group_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "a"), (1, 5.0, "b"), (2, 3.0, "c")], "g int, v double, tag string"
    )
    out = {r.g: (r.max_v, r.argmax_tag) for r in agg.argmax_per_group(df, ["g"], "v", "tag").collect()}
    assert out[1] == (5.0, "b")  # struct max: ties broken by arg column max
    assert out[2] == (3.0, "c")


def test_distinct_key_union(spark):
    a = spark.createDataFrame([("x",), ("y",)], ["k1"])
    b = spark.createDataFrame([("y",), ("z",)], ["k2"])
    out = [r.key for r in agg.distinct_key_union(a, "k1", b, "k2").collect()]
    assert out == ["x", "y", "z"]


def test_union_frames_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, a string")
    b = spark.createDataFrame([(2,)], "id long")
    out = agg.union_frames([a, b])
    assert out.count() == 2
    assert set(out.columns) == {"id", "a"}


def test_audit_suite_single_pass(spark):
    from firmable_aus_etl_spark.operators.audit_suite import assert_audits, run_audits

    df = spark.createDataFrame(
        [
            ("12345678901", "Acme", "Active", 5.0),
            ("12345678901", "Beta", "Active", -1.0),   # dup abn, negative
            (None, None, "Weird", 2.0),                # null abn+name, bad status
        ],
        "abn string, name string, status string, score double",
    )
    spec = {
        "abn": ["unique", "not_null", "matches_regex:^[0-9]{11}$"],
        "name": ["not_null"],
        "status": ["accepted_values:Active|Cancelled"],
        "score": ["non_negative"],
    }
    report = {(r.column_name, r.test_name): (r.violations, r.status) for r in run_audits(df, spec).collect()}
    assert report[("abn", "unique")] == (1, "fail")
    assert report[("abn", "not_null")] == (1, "fail")
    assert report[("abn", "matches_regex:^[0-9]{11}$")] == (0, "pass")
    assert report[("name", "not_null")] == (1, "fail")
    assert report[("status", "accepted_values:Active|Cancelled")] == (1, "fail")
    assert report[("score", "non_negative")] == (1, "fail")

    import pytest as _pytest
    with _pytest.raises(AssertionError, match="audit failures"):
        assert_audits(df, spec)

    clean = spark.createDataFrame([("12345678901", "A", "Active", 1.0)],
                                  "abn string, name string, status string, score double")
    assert_audits(clean, spec)  # no raise


def test_approx_stats_error_bounds(spark):
    from firmable_aus_etl_spark.queries import PIPELINE_QUERIES

    sf_dir = "/root/testdata/sf0.001"
    approx = {
        r.event_type: r
        for r in PIPELINE_QUERIES["approx_stats_events"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) <= max(2, 0.05 * e.users)
        # percentile_approx returns a real data value near the quantile
        assert abs(a.p50 - e.p50) <= 0.1 * (abs(e.p95) + 1)
        assert a.p95 <= e.p95 * 1.2 + 1
