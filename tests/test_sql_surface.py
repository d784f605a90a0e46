"""The engine via spark.sql: views + SQL-defined functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from firmable_aus_etl_spark import plans
from firmable_aus_etl_spark.functions.similarity import token_sort_ratio_expr
from firmable_aus_etl_spark.sql_surface import (
    register_sql_functions,
    register_testdata_views,
)

SF = "/root/testdata/sf0.001"


def test_views_and_sql_query(spark):
    register_testdata_views(spark, SF)
    out = spark.sql(
        """
        SELECT c_mktsegment, count(*) AS cnt
        FROM customer GROUP BY c_mktsegment ORDER BY cnt DESC
        """
    ).collect()
    assert sum(r.cnt for r in out) == 150


def test_sql_function_matches_column_api(spark):
    register_sql_functions(spark)
    df = spark.createDataFrame(
        [("Pty Ltd Acme", "Acme Pty Ltd"), ("Acme", "Zebra")], "a string, b string"
    )
    df.createOrReplaceTempView("pairs_v")
    via_sql = [r.s for r in spark.sql(
        "SELECT token_sort_ratio(a, b) AS s FROM pairs_v"
    ).collect()]
    via_api = [r.s for r in df.select(
        token_sort_ratio_expr(F.col("a"), F.col("b")).alias("s")
    ).collect()]
    assert via_sql == via_api
    assert via_sql[0] == 100.0


def test_sql_function_stays_jvm_side(spark):
    register_sql_functions(spark)
    register_testdata_views(spark, SF)
    df = spark.sql(
        "SELECT c_name, token_sort_ratio(c_name, c_name) AS s FROM customer"
    )
    plan = plans.physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vec_sql_functions_match_column_api(spark):
    import math

    register_sql_functions(spark)
    row = spark.sql(
        "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, "
        "vec_cosine(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS c"
    ).first()
    assert row.d == 11.0
    assert abs(row.c - 11.0 / (math.sqrt(5) * math.sqrt(25))) < 1e-12
    # and against the column API on real embeddings
    register_testdata_views(spark, SF)
    from firmable_aus_etl_spark.functions import vectors as V

    got = spark.sql(
        """
        SELECT vec_id,
               vec_cosine(CAST(embedding AS ARRAY<DOUBLE>),
                          CAST(embedding AS ARRAY<DOUBLE>)) AS c
        FROM embeddings ORDER BY vec_id LIMIT 5
        """
    ).collect()
    assert all(abs(r.c - 1.0) < 1e-9 for r in got)


def test_sample_uniform_matches_sampling_operator(spark):
    from firmable_aus_etl_spark.operators.sampling import bernoulli_sample
    from firmable_aus_etl_spark.sql_surface import register_sql_functions

    register_sql_functions(spark)
    df = spark.range(0, 500).selectExpr("CAST(id AS LONG) AS k")
    df.createOrReplaceTempView("samp_src")
    via_sql = {
        r.k
        for r in spark.sql(
            "SELECT k FROM samp_src WHERE sample_uniform(CAST(k AS STRING)) <= 0.25"
        ).collect()
    }
    via_op = {r.k for r in bernoulli_sample(df, "k", 0.25).collect()}
    assert via_sql == via_op and 50 < len(via_op) < 200


def test_query_views_reachable_from_sql(spark):
    from firmable_aus_etl_spark.sql_surface import register_query_views

    names = register_query_views(
        spark,
        "/root/testdata/sf0.001",
        ["pricing_summary", "group_counts_mktsegment"],
    )
    assert names == ["q_pricing_summary", "q_group_counts_mktsegment"]
    rows = spark.sql(
        "SELECT count(*) AS n FROM q_group_counts_mktsegment"
    ).collect()
    assert rows[0].n == 5
    joined = spark.sql(
        "SELECT p.l_returnflag, g.c_mktsegment FROM q_pricing_summary p "
        "CROSS JOIN q_group_counts_mktsegment g LIMIT 3"
    )
    assert len(joined.collect()) == 3
