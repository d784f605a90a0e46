"""Declarative data-quality audit suite — the reference's dbt schema
tests as a config-driven operator.

reference: firmable_dbt/models/abr_companies_quality.yml:6-13 declares
`unique` / `not_null` per column; dbt compiles them to SQL. Here the
same declaration compiles to ONE aggregation pass per table (not one
query per test) and returns a report frame:

    (column_name, test_name, violations, status)

Supported tests: not_null, unique, accepted_values:<v1|v2|...>,
matches_regex:<pattern>, non_negative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation_expr(col: str, test: str) -> Column:
    """Count of rows violating the test (0 == pass)."""
    c = F.col(col)
    if test == "not_null":
        return F.sum(c.isNull().cast("long"))
    if test == "non_negative":
        return F.sum((c < 0).cast("long"))
    if test.startswith("accepted_values:"):
        values = test.split(":", 1)[1].split("|")
        return F.sum((~c.isin(values) & c.isNotNull()).cast("long"))
    if test.startswith("matches_regex:"):
        pattern = test.split(":", 1)[1]
        return F.sum((~c.rlike(pattern) & c.isNotNull()).cast("long"))
    if test == "unique":
        # duplicates = rows - distinct keys (nulls collapse to one)
        return F.count(c) - F.count_distinct(c)
    raise ValueError(f"unknown audit test: {test}")


def run_audits(df: DataFrame, spec: dict[str, list[str]]) -> DataFrame:
    """Compile the spec to a single aggregation + unpivot.

    spec: {column: [test, ...]}. One job regardless of test count —
    at 100 TB an audit suite must not scan the table per assertion
    (dbt's one-query-per-test model does).
    """
    aggs = []
    names = []
    for col, tests in spec.items():
        for test in tests:
            alias = f"{col}__{test.split(':', 1)[0]}"
            aggs.append(_violation_expr(col, test).cast("long").alias(alias))
            names.append((alias, col, test))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{col}', '{test}', coalesce(`{alias}`, 0L)" for alias, col, test in names
    )
    long = wide.selectExpr(
        f"stack({len(names)}, {stack}) as (column_name, test_name, violations)"
    )
    return long.select(
        "column_name",
        "test_name",
        "violations",
        F.when(F.col("violations") == 0, "pass").otherwise("fail").alias("status"),
    )


def assert_audits(df: DataFrame, spec: dict[str, list[str]]) -> None:
    """Raise with the failing rows if any audit fails (CI gate form)."""
    failures = run_audits(df, spec).filter(F.col("status") == "fail").collect()
    if failures:
        detail = ", ".join(
            f"{r.column_name}/{r.test_name}={r.violations}" for r in failures
        )
        raise AssertionError(f"data-quality audit failures: {detail}")
