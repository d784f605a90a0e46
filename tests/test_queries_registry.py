"""Registry-wide invariants: every query executes at sf0.001, every
oracle key has a query, column names stay driver-compatible."""

from __future__ import annotations

import pytest

from firmable_aus_etl_spark.queries import ORACLE, PIPELINE_QUERIES, QUERIES

SF = "/root/testdata/sf0.001"


def test_every_oracle_has_a_query():
    assert not set(ORACLE) - set(QUERIES)


def test_driver_sampleable_surface_is_fully_oracle_bearing():
    """Round-5 verdict item #1: the driver samples uniformly from
    queries(), so EVERY name it can sample must carry an oracle —
    rows-only physical twins / non-SQL-expressible ops live in
    PIPELINE_QUERIES instead. This pins the invariant so the class of
    `err: no_oracle` scoreboard rows (r2, r3, r4) cannot recur."""
    assert set(QUERIES) == set(ORACLE), (
        "driver-sampleable queries without an oracle: "
        f"{sorted(set(QUERIES) - set(ORACLE))}"
    )
    assert not set(PIPELINE_QUERIES) & set(QUERIES), "name collision across surfaces"
    assert not set(PIPELINE_QUERIES) & set(ORACLE)


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


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_query_executes_and_has_sane_schema(spark, name):
    df = PIPELINE_QUERIES[name](spark, SF)
    cols = df.columns
    assert cols, name
    assert len(set(cols)) == len(cols), f"{name}: duplicate column names {cols}"
    assert all(not c.startswith("__") for c in cols), f"{name}: internal cols leak {cols}"
    df.limit(5).collect()
