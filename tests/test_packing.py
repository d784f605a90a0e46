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


def test_zero_token_chunk_matches_cte_twin_semantics(spark):
    """Round-7 ADVICE #4: the recursive-CTE twin models an oversize
    singleton as rem=0, so a degenerate zero-token chunk JOINS that bin
    (0 <= 0). The Python packer used remaining=-1 for oversize bins,
    which would open a fresh bin instead — a latent hash-gate
    divergence. Both policies must now pack the zero-token chunk into
    the preceding full/oversize bin."""
    rows = [(1, 600), (2, 0), (3, 512)]
    df = spark.createDataFrame(rows, "chunk_id long, n_tokens long")
    for policy in ("nextfit", "ffd"):
        packed = pack_chunks(
            df, id_col="chunk_id", tokens_col="n_tokens", budget=512,
            groups=1, policy=policy,
        ).collect()
        by_ids = {tuple(sorted(r.chunk_ids)): r for r in packed}
        # order within the group: 600, 512, 0 (tokens desc). nextfit:
        # 600 opens bin rem=0; 512 doesn't fit -> new bin rem=0; 0 fits
        # the LATEST bin (rem=0). ffd: 0 fits the FIRST rem>=0 bin.
        if policy == "nextfit":
            assert (2, 3) in by_ids, by_ids.keys()
        else:
            assert (1, 2) in by_ids, by_ids.keys()
        assert len(packed) == 2


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
