"""Sequence-packing proofs: exactly-once coverage, budget respected,
FFD efficiency bound, layout-independent determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators.packing import pack_chunks
from firmable_aus_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
BUDGET = 512


def _chunks(spark):
    return QUERIES["doc_chunks_overlap"](spark, SF).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_id"),
        F.col("chunk_len").alias("n_tokens"),
    )


def test_every_chunk_packed_exactly_once(spark):
    chunks = _chunks(spark)
    packed = pack_chunks(
        chunks, id_col="chunk_id", tokens_col="n_tokens", budget=BUDGET, groups=8
    )
    ids = packed.select(F.explode("chunk_ids").alias("cid"))
    n_chunks = chunks.count()
    assert ids.count() == n_chunks
    assert ids.distinct().count() == n_chunks


def test_budget_respected_and_totals_exact(spark):
    chunks = _chunks(spark)
    packed = pack_chunks(
        chunks, id_col="chunk_id", tokens_col="n_tokens", budget=BUDGET, groups=8
    ).collect()
    sums = {r.chunk_id: r.n_tokens for r in chunks.collect()}
    for r in packed:
        assert r.total_tokens == sum(sums[c] for c in r.chunk_ids)
        assert r.n_chunks == len(r.chunk_ids)
        if r.n_chunks > 1:
            assert r.total_tokens <= BUDGET


def test_oversize_chunks_become_singletons(spark):
    rows = [(1, 600), (2, 513), (3, 100), (4, 100)]
    df = spark.createDataFrame(rows, "chunk_id long, n_tokens long")
    packed = pack_chunks(
        df, id_col="chunk_id", tokens_col="n_tokens", budget=512, groups=1
    ).collect()
    by_ids = {tuple(sorted(r.chunk_ids)): r for r in packed}
    assert (1,) in by_ids and by_ids[(1,)].total_tokens == 600
    assert (2,) in by_ids
    assert (3, 4) in by_ids  # small chunks pack together


def test_ffd_efficiency_bound(spark):
    chunks = _chunks(spark)
    groups = 8
    packed = pack_chunks(
        chunks, id_col="chunk_id", tokens_col="n_tokens", budget=BUDGET, groups=groups
    )
    n_examples = packed.count()
    total_tokens = chunks.agg(F.sum("n_tokens")).first()[0]
    lower_bound = math.ceil(total_tokens / BUDGET)
    # FFD <= 11/9 * OPT + 1 per group; sharding adds at most one
    # underfull bin per group
    assert n_examples <= math.ceil(11 / 9 * lower_bound) + groups, (
        n_examples,
        lower_bound,
    )


def test_packing_is_layout_independent(spark):
    chunks = _chunks(spark)
    a = pack_chunks(
        chunks.repartition(13), id_col="chunk_id", tokens_col="n_tokens",
        budget=BUDGET, groups=8,
    )
    b = pack_chunks(
        chunks.coalesce(1), id_col="chunk_id", tokens_col="n_tokens",
        budget=BUDGET, groups=8,
    )
    ka = sorted(
        (r.pack_group, r.example_id, tuple(r.chunk_ids)) for r in a.collect()
    )
    kb = sorted(
        (r.pack_group, r.example_id, tuple(r.chunk_ids)) for r in b.collect()
    )
    assert ka == kb
