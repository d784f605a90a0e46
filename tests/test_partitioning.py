"""Partitioning/skew utility tests: salted join correctness, bucketed
shuffle-free joins, repartition reuse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark import plans
from firmable_aus_etl_spark.operators import partitioning


def test_salted_join_matches_plain_join(spark):
    # skewed big side: one hot key holds most rows
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(10)], "key int, v int"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "key int, name string")
    plain = big.join(small, "key").groupBy("key").count()
    salted = partitioning.salted_join(big, small, "key").groupBy("key").count()
    assert {(r.key, r["count"]) for r in salted.collect()} == {
        (r.key, r["count"]) for r in plain.collect()
    }


def test_salted_join_deterministic(spark):
    big = spark.createDataFrame([(1, i) for i in range(50)], "key int, v int")
    small = spark.createDataFrame([(1, "x")], "key int, name string")
    a = sorted(map(tuple, partitioning.salted_join(big, small, "key").collect()))
    b = sorted(map(tuple, partitioning.salted_join(big, small, "key").collect()))
    assert a == b


def test_bucketed_join_no_exchange(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets_db")
    spark.catalog.setCurrentDatabase("buckets_db")
    left = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    right = spark.range(0, 1000).withColumn("w", F.col("id") * 3)
    partitioning.write_bucketed(
        left, "bl", ["id"], buckets=4, sort_by=["id"], path=str(tmp_path / "bl")
    )
    partitioning.write_bucketed(
        right, "br", ["id"], buckets=4, sort_by=["id"], path=str(tmp_path / "br")
    )
    joined = partitioning.read_bucketed(spark, "bl").join(
        partitioning.read_bucketed(spark, "br"), "id"
    )
    # co-bucketed join: zero shuffle exchanges in the plan
    assert plans.count_exchanges(joined) == 0, plans.physical_plan(joined)
    assert joined.count() == 1000
    spark.sql("DROP TABLE IF EXISTS bl")
    spark.sql("DROP TABLE IF EXISTS br")


def test_repartition_for_reuses_exchange(spark):
    df = spark.createDataFrame([(i % 10, i) for i in range(100)], "k int, v int")
    pre = partitioning.repartition_for(df, "k", partitions=8)
    agg = pre.groupBy("k").count()
    # groupBy reuses the repartition's hash distribution: exactly one
    # exchange (the explicit one), not two
    assert plans.count_exchanges(agg) == 1, plans.physical_plan(agg)


def test_ensure_parallelism_widens_narrow_input(spark, tmp_path):
    p = str(tmp_path / "one_file")
    spark.range(1000).coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)
    assert narrow.rdd.getNumPartitions() == 1
    widened = partitioning.ensure_parallelism(narrow)
    assert (
        widened.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert widened.count() == 1000


def test_ensure_parallelism_noop_when_already_wide(spark):
    wide = spark.range(1000, numPartitions=64)
    out = partitioning.ensure_parallelism(wide, min_partitions=32)
    # already wider than the floor -> same plan, NO repartition shuffle
    assert out.rdd.getNumPartitions() == 64
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
