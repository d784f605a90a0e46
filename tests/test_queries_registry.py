"""Registry-wide invariants: every query executes at sf0.001, every
oracle key has a query, column names stay driver-compatible."""

from __future__ import annotations

import pytest

from firmable_aus_etl_spark.queries import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"


def test_every_oracle_has_a_query():
    assert not set(ORACLE) - set(QUERIES)


def test_registry_size_monotone():
    # guard against accidental decorator removal wiping registrations
    assert len(QUERIES) >= 49
    assert len(ORACLE) >= 45


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_executes_and_has_sane_schema(spark, name):
    df = QUERIES[name](spark, SF)
    cols = df.columns
    assert cols, name
    assert len(set(cols)) == len(cols), f"{name}: duplicate column names {cols}"
    assert all(not c.startswith("__") for c in cols), f"{name}: internal cols leak {cols}"
    # must execute (limit keeps heavy queries cheap at sf0.001)
    df.limit(5).collect()
