"""Spark ML matcher variants vs the expression-level implementations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators import dedup, ml_matching


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_minhash_lsh_ml_finds_planted_dups(spark, docs):
    exact = {
        (r.a_id, r.b_id)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=1, threshold=0.7
        ).collect()
    }
    ml = {
        (r.a_id, r.b_id)
        for r in ml_matching.minhash_lsh_join(
            docs, "doc_id", "text", jaccard_threshold=0.7, num_hash_tables=8
        ).collect()
    }
    assert exact, "fixture has planted near-dups at token level"
    recall = len(exact & ml) / len(exact)
    assert recall >= 0.8, f"ML MinHashLSH recall {recall} vs exact token jaccard"


def test_tfidf_cosine_ml_top1_self_match(spark, docs):
    sample = docs.limit(30).select("doc_id", "text")
    out = ml_matching.tfidf_cosine_ml_top1(
        sample, sample, "doc_id", "text", "doc_id", "text", threshold=0.99
    )
    got = {r.a_id: r.b_id for r in out.collect()}
    # every doc's top-1 >=0.99 match must be itself (or an exact dup)
    for a, b in got.items():
        if a != b:
            texts = {r.doc_id: r.text for r in sample.collect()}
            assert texts[a].lower().split() == texts[b].lower().split()
    assert len(got) >= 25  # nearly all docs self-match at 0.99
