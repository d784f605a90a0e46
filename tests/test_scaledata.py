"""scripts/gen_scaledata.py stays loadable by the engine's strict
schema loaders and keeps the fixture's statistical contract — the
guard that SCALING.md's synthetic decade remains a fair surface."""

from __future__ import annotations

import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark.datasets import load_table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scaledata") / "sf0.002")
    subprocess.run(
        [sys.executable, "/root/repo/scripts/gen_scaledata.py", "0.002", d],
        check=True, capture_output=True,
    )
    return d


def test_generated_tables_load_with_strict_schemas(spark, gen_dir):
    real = "/root/testdata/sf0.001"
    for t in TABLES:
        syn = load_table(spark, gen_dir, t)
        ref = load_table(spark, real, t)
        assert [f.name for f in syn.schema.fields] == [
            f.name for f in ref.schema.fields
        ], t
        assert syn.count() > 0, t


def test_generated_distribution_contract(spark, gen_dir):
    docs = load_table(spark, gen_dir, "documents")
    n = docs.count()
    assert n == 100  # 50_000 * 0.002
    # near-dup plants: ~5% docs carry the 'dup' mutation token
    dups = docs.filter(F.col("text").like("%dup%")).count()
    assert 0 < dups < 0.2 * n
    emb = load_table(spark, gen_dir, "embeddings")
    norms = emb.select(
        F.sqrt(F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x),
            F.lit(0.0), lambda a, b: a + b,
        )).alias("n")
    ).agg(F.min("n"), F.max("n")).collect()[0]
    assert abs(norms[0] - 1.0) < 1e-5 and abs(norms[1] - 1.0) < 1e-5
    li = load_table(spark, gen_dir, "lineitem")
    orders = load_table(spark, gen_dir, "orders")
    ratio = li.count() / orders.count()
    assert 3.0 < ratio < 5.0  # zero-truncated Poisson(4)
