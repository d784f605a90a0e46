from __future__ import annotations

from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators import windows


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (1, 5.0, "c"), (2, 1.0, "d")],
        "g int, score double, tag string",
    )
    out = windows.topk_per_group(df, ["g"], [F.col("score").desc(), F.col("tag")], k=2)
    got = {(r.g, r.tag) for r in out.collect()}
    assert got == {(1, "b"), (1, "a"), (2, "d")}


def test_topk_keep_rank(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 1.0)], "g int, v double")
    out = windows.topk_per_group(
        df, ["g"], [F.col("v").desc()], k=2, keep_rank=True, rank_col="rank"
    )
    assert {(r.v, r.rank) for r in out.collect()} == {(2.0, 1), (1.0, 2)}


def test_serial_id_dense_and_deterministic(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], ["v"])
    out = {r.v: r.id for r in windows.serial_id(df, ["v"]).collect()}
    assert out == {"a": 1, "b": 2, "c": 3}


def test_monotonic_id_unique(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["v"]).repartition(4)
    out = windows.monotonic_id(df)
    assert out.select("id").distinct().count() == 100
