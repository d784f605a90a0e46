"""SQL surface: register the testdata tables as temp views plus the
engine's scalar helpers as SQL functions, so the capability set is
reachable from ``spark.sql`` — the second half of the "DataFrame / SQL"
API promise.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from firmable_aus_etl_spark.datasets import TABLE_NAMES, load_table


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Create/replace one temp view per testdata table."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# SQL-defined (not Python) functions: these compile to the same JVM
# expressions as the column-API versions — calling the engine from SQL
# costs nothing.
_SQL_FUNCTIONS = [
    """
    CREATE OR REPLACE TEMPORARY FUNCTION norm_name(s STRING)
    RETURNS STRING
    RETURN regexp_replace(lower(trim(s)), ' +', ' ')
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION token_sort(s STRING)
    RETURNS STRING
    RETURN concat_ws(' ', sort_array(split(regexp_replace(lower(trim(s)), ' +', ' '), ' ')))
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION token_sort_ratio(a STRING, b STRING)
    RETURNS DOUBLE
    RETURN 100.0 * (1.0 - CAST(levenshtein(token_sort(a), token_sort(b)) AS DOUBLE)
                    / CAST(greatest(length(token_sort(a)), length(token_sort(b)), 1) AS DOUBLE))
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION vec_dot(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
    RETURNS DOUBLE
    RETURN aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION vec_cosine(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
    RETURNS DOUBLE
    RETURN vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))
    """,
    # deterministic key-hash uniform in (0, 1] — the operators/sampling
    # primitive from SQL: WHERE sample_uniform(id) <= 0.1 is the
    # layout-invariant Bernoulli sample, identical rows on any engine
    """
    CREATE OR REPLACE TEMPORARY FUNCTION sample_uniform(k STRING)
    RETURNS DOUBLE
    RETURN (conv(substring(md5(k), 1, 12), 16, 10) + 1) / 281474976710656.0
    """,
]


def register_sql_functions(spark: SparkSession) -> None:
    """Register engine scalars as SQL UDFs (Spark 4 SQL-defined
    functions — pure expressions, no Python eval in the plan)."""
    for ddl in _SQL_FUNCTIONS:
        spark.sql(ddl)


def register_query_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Expose registry queries as temp views (``q_<name>``), so every
    operator is reachable from plain ``spark.sql`` — the full "switch
    from the reference and keep your SQL client" surface. Views are
    lazy: registering all ~150 costs plan construction only; nothing
    executes until a view is queried.
    """
    from firmable_aus_etl_spark.queries import QUERIES

    registered = []
    for name in names or sorted(QUERIES):
        QUERIES[name](spark, sf_dir).createOrReplaceTempView(f"q_{name}")
        registered.append(f"q_{name}")
    return registered
