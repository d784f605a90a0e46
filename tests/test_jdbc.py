"""Live JDBC round-trip against embedded Derby (bundled in Spark's own
jars — no install): write, read back, and keyed-upsert semantics must
match the in-engine merge_upsert operator.

reference parity: loadcsv_topostgres.py:32 (append load),
loadingcsv_topostgre_fast.py:56-92 (staging bulk load),
entity_matching_tfidf.py:121-140 (ON CONFLICT upsert) — same flows
through a real database instead of builder-only unit checks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark.datasets import load_table
from firmable_aus_etl_spark.operators.joins import merge_upsert
from firmable_aus_etl_spark.sources.files import (
    jdbc_upsert,
    jdbc_writer,
    read_jdbc,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def derby_url(tmp_path):
    # one embedded database per test; ;create=true makes it on first use
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _orders(spark, lo, hi):
    return (
        load_table(spark, SF, "orders")
        .filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


def _collect(df):
    return sorted(
        (r.o_orderkey, r.o_custkey, r.o_orderstatus, round(r.o_totalprice, 2))
        for r in df.collect()
    )


def test_jdbc_write_read_round_trip(spark, derby_url):
    base = _orders(spark, 0, 2000)
    jdbc_writer(base, derby_url, "orders_t", mode="overwrite").save()
    back = read_jdbc(spark, derby_url, "orders_t")
    assert _collect(back) == _collect(base)
    assert back.count() > 0


def test_jdbc_upsert_matches_engine_merge(spark, derby_url):
    """Staging + MERGE through the database == operators.joins
    merge_upsert on the same inputs (update collisions AND inserts)."""
    base = _orders(spark, 0, 2000)
    # updates: mutate totalprice for an overlapping key range, plus
    # brand-new keys from a disjoint range
    overlap = base.filter(F.col("o_orderkey") < 1000).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    fresh = _orders(spark, 2000, 3000)
    updates = overlap.unionByName(fresh)

    jdbc_writer(base, derby_url, "orders_t", mode="overwrite").save()
    jdbc_upsert(updates, derby_url, "orders_t", keys=["o_orderkey"])
    back = read_jdbc(spark, derby_url, "orders_t")

    want = merge_upsert(base, updates, keys=["o_orderkey"])
    assert _collect(back) == _collect(want)
    # spot semantics: updated row carries the new price, fresh rows exist
    assert back.count() == base.count() + fresh.count()


def test_jdbc_upsert_is_idempotent(spark, derby_url):
    """Re-applying the same update batch (retry semantics) leaves the
    table unchanged — the at-least-once-safe property the reference's
    ON CONFLICT upsert provides."""
    base = _orders(spark, 0, 1000)
    updates = base.withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
    jdbc_writer(base, derby_url, "orders_t", mode="overwrite").save()
    jdbc_upsert(updates, derby_url, "orders_t", keys=["o_orderkey"])
    once = _collect(read_jdbc(spark, derby_url, "orders_t"))
    jdbc_upsert(updates, derby_url, "orders_t", keys=["o_orderkey"])
    twice = _collect(read_jdbc(spark, derby_url, "orders_t"))
    assert once == twice
