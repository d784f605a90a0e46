"""Python UDTF surface: SQL table-function calls, LATERAL joins, and
parity with the expression-level twins (the two surfaces must never
drift)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark.functions.udtfs import (
    Bigrams,
    ChunkText,
    UnpivotRecord,
    register_udtfs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_udtfs(spark)


def test_chunk_text_direct_call(spark):
    out = spark.sql(
        "SELECT * FROM chunk_text('a b c d e f g', 4, 2) ORDER BY chunk_idx"
    ).collect()
    assert [(r.chunk_idx, r.start_tok, r.chunk) for r in out] == [
        (0, 0, "a b c d"),
        (1, 2, "c d e f"),
        (2, 4, "e f g"),
        (3, 6, "g"),
    ]
    assert spark.sql("SELECT * FROM chunk_text('', 4, 2)").count() == 0


def test_chunk_text_lateral_parity_with_expression_twin(spark):
    """The UDTF chunker over documents must produce the identical
    chunk set as the sequence+explode+slice expression plan of
    doc_chunks_overlap (50-token windows, stride 25)."""
    from firmable_aus_etl_spark.datasets import load_table
    from firmable_aus_etl_spark.queries import QUERIES

    docs = load_table(spark, SF, "documents").filter(F.col("lang") == "en")
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM udtf_docs d, LATERAL chunk_text(d.text, 50, 25) c
        """
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.md5("chunk").alias("chunk_md5"),
    )
    expr = QUERIES["doc_chunks_overlap"](spark, SF).select(
        "doc_id", "chunk_idx", "chunk_md5"
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, expr.collect()))
    assert a == b and len(a) > 0


def test_bigrams_udtf(spark):
    out = spark.sql("SELECT * FROM bigrams('x y z') ORDER BY pos").collect()
    assert [(r.pos, r.bigram) for r in out] == [(0, "x y"), (1, "y z")]
    assert spark.sql("SELECT * FROM bigrams('solo')").count() == 0


def test_unpivot_record_udtf(spark):
    out = spark.sql(
        "SELECT * FROM unpivot_record('abn=123;name= Acme ;;broken;=x') ORDER BY field"
    ).collect()
    assert [(r.field, r.value) for r in out] == [("abn", "123"), ("name", "Acme")]


def test_udtf_dataframe_api_call(spark):
    out = ChunkText(F.lit("p q r s"), F.lit(2), F.lit(0)).collect()
    assert [r.chunk for r in out] == ["p q", "r s"]
    assert Bigrams(F.lit("a b c")).count() == 2
    assert UnpivotRecord(F.lit("k=v")).count() == 1
