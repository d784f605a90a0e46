"""Empty-input hardening: operators must degrade to empty results, not
errors — at scale a filtered-to-empty partition/branch is routine."""

from __future__ import annotations

from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators import dedup, joins
from firmable_aus_etl_spark.operators.audit_suite import run_audits


def _empty(spark, schema: str):
    return spark.createDataFrame([], schema)


def test_merge_upsert_empty_sides(spark):
    full = spark.createDataFrame([(1, "a")], "k long, v string")
    empty = _empty(spark, "k long, v string")
    assert joins.merge_upsert(full, empty, ["k"]).count() == 1
    assert joins.merge_upsert(empty, full, ["k"]).count() == 1
    assert joins.merge_upsert(empty, empty, ["k"]).count() == 0


def test_similarity_join_empty_sides(spark):
    # column names must be distinct across sides (both sides' columns
    # are carried into the output)
    names = spark.createDataFrame([(1, "acme")], "lid long, lname string")
    rnames = spark.createDataFrame([(1, "acme")], "rid long, rname string")
    lempty = _empty(spark, "lid long, lname string")
    rempty = _empty(spark, "rid long, rname string")
    out = joins.similarity_join(
        lempty, rnames, "lname", "rname", block=None, threshold=0.0, k=1,
        left_id="lid", right_tiebreak="rid",
    )
    assert out.count() == 0
    out2 = joins.similarity_join(
        names, rempty, "lname", "rname", block=None, threshold=0.0, k=1,
        left_id="lid", right_tiebreak="rid",
    )
    assert out2.count() == 0


def test_dedup_family_empty(spark):
    empty = _empty(spark, "doc_id long, text string")
    assert dedup.dedup_keyed(empty, ["doc_id"], [F.col("doc_id")]).count() == 0
    assert dedup.minhash_lsh_pairs(empty, "doc_id", "text").count() == 0
    assert dedup.ngram_jaccard_pairs(empty, "doc_id", "text").count() == 0
    assert dedup.verified_near_dup_pairs(empty, "doc_id", "text").count() == 0
    assert dedup.simhash_candidate_pairs(empty, "doc_id", "text").count() == 0


def test_audit_suite_empty(spark):
    empty = _empty(spark, "abn string")
    report = {r.test_name: r.status for r in run_audits(empty, {"abn": ["unique", "not_null"]}).collect()}
    # empty table: no rows -> no violations -> pass
    assert set(report.values()) == {"pass"}


def test_whitespace_only_and_null_text_rows(spark):
    df = spark.createDataFrame(
        [(1, "   "), (2, None), (3, "real text here")], "doc_id long, text string"
    )
    from firmable_aus_etl_spark.functions import text as T

    rows = {r.doc_id: r for r in df.select(
        "doc_id",
        T.token_count("text").alias("n"),
        T.language_id("text").alias("lang"),
        T.fingerprint_rolling("text").alias("fp"),
    ).collect()}
    assert rows[3].n == 3
    assert rows[1].lang == "und"
    # nulls propagate as nulls, not crashes
    assert rows[2].fp is None or rows[2].fp == 0


def test_graph_ops_empty_edges(spark):
    from firmable_aus_etl_spark.operators.graph import pagerank, triangle_count

    e = spark.createDataFrame([], "a long, b long")
    assert pagerank(e).count() == 0
    assert triangle_count(e).collect()[0].n_triangles == 0


def test_sampling_empty_frame(spark):
    from firmable_aus_etl_spark.operators.sampling import (
        bernoulli_sample,
        weighted_sample_ares,
    )

    df = spark.createDataFrame([], "k long, w long")
    assert bernoulli_sample(df, "k", 0.5).count() == 0
    assert weighted_sample_ares(df, "k", "w", k=5).count() == 0


def test_mixture_rates_empty_frame(spark):
    from firmable_aus_etl_spark.operators.sampling import temperature_mixture_rates

    df = spark.createDataFrame([], "grp string, doc_id long, n_tok int")
    assert temperature_mixture_rates(df, "grp", "n_tok", budget=1000).count() == 0


def test_video_frames_empty_frame(spark):
    from firmable_aus_etl_spark.multimodal.ops import video_frames

    df = spark.createDataFrame([], "media_id long, content binary")
    assert video_frames(df).count() == 0


def test_graph_summary_empty_pairs(spark):
    from firmable_aus_etl_spark.operators.graph import graph_summary

    e = spark.createDataFrame([], "a long, b long")
    row = graph_summary(e).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (0, 0, 0, 0)
    assert row.clustering_coeff == 0.0


def test_ivf_cell_cap_empty_corpus(spark):
    from firmable_aus_etl_spark.functions import vectors as V

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(1, [1.0] * 4)], "vec_id long, embedding array<double>")
    assert V.ivf_topk(q, empty, dim=4, k=3, n_cells=2, nprobe=1, cell_cap=10).count() == 0
