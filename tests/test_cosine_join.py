"""Persisted TF-IDF index: build-once/query-many matching parity."""

from __future__ import annotations

from pyspark.sql import functions as F



def _term_frame(spark, rows):
    """(id, token, tf) from {id: text} word lists."""
    out = []
    for i, words in rows:
        from collections import Counter

        for w, n in Counter(words.split()).items():
            out.append((i, w, float(n)))
    return spark.createDataFrame(out, "doc_id long, t string, tf double")


def test_tfidf_index_build_query_roundtrip(spark, tmp_path):
    from firmable_aus_etl_spark.operators.cosine_join import (
        build_tfidf_index,
        tfidf_index_topk,
    )

    corpus = [
        (1, "acme steel supply co"),
        (2, "acme steel trading"),
        (3, "blue ocean shipping line"),
        (4, "green valley farms produce"),
    ]
    terms = _term_frame(spark, corpus)
    df_rel = terms.groupBy("t").agg(F.count("*").cast("double").alias("df"))
    wt = terms.join(df_rel, "t").select(
        "doc_id", "t", (F.col("tf") * (F.lit(1.0) / F.col("df"))).alias("wt")
    )
    path = str(tmp_path / "tfidf_idx")
    build_tfidf_index(wt, path)

    # perturbed queries: each should hit its source doc as top-1
    queries = [
        (101, "acme steel supply"),        # -> 1
        (103, "blue ocean shipping"),      # -> 3
        (104, "green valley produce"),     # -> 4
    ]
    q_terms = _term_frame(spark, queries).withColumnRenamed("doc_id", "q_id")
    out = tfidf_index_topk(q_terms, path, k=1, threshold=0.1)
    best = {r.q_id: (r.doc_id, r.cosine) for r in out.collect()}
    assert best[101][0] == 1 and best[103][0] == 3 and best[104][0] == 4
    assert all(c > 0.5 for _, c in best.values())


def test_tfidf_index_unseen_tokens_drop(spark, tmp_path):
    from firmable_aus_etl_spark.operators.cosine_join import (
        build_tfidf_index,
        tfidf_index_topk,
    )

    corpus = [(1, "alpha beta gamma"), (2, "delta epsilon zeta")]
    terms = _term_frame(spark, corpus)
    wt = terms.select("doc_id", "t", F.col("tf").alias("wt"))
    path = str(tmp_path / "idx2")
    build_tfidf_index(wt, path)

    # query entirely OUT of vocabulary -> no rows, no error
    q1 = _term_frame(spark, [(201, "neverseen words only")]).withColumnRenamed(
        "doc_id", "q_id"
    )
    assert tfidf_index_topk(q1, path).count() == 0
    # mixed: unseen tokens do not dilute the cosine (index-space norm)
    q2 = _term_frame(spark, [(202, "alpha beta gamma neverseen")]).withColumnRenamed(
        "doc_id", "q_id"
    )
    row = tfidf_index_topk(q2, path, k=1).first()
    assert row.doc_id == 1 and abs(row.cosine - 1.0) < 1e-9


def test_tfidf_index_matches_inline_join(spark, tmp_path):
    """Index-mediated matching must equal the same computation done
    inline (no persistence) — store round-trip loses nothing."""
    from firmable_aus_etl_spark.operators.cosine_join import (
        build_tfidf_index,
        tfidf_index_topk,
    )
    from firmable_aus_etl_spark.datasets import load_table
    from firmable_aus_etl_spark.functions.similarity import normalize_name

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    terms = docs.select(
        "doc_id",
        F.explode(F.split(normalize_name(F.col("text")), " ")).alias("t"),
    ).groupBy("doc_id", "t").agg(F.count("*").cast("double").alias("tf"))
    df_rel = terms.groupBy("t").agg(F.count("*").cast("double").alias("df"))
    wt = terms.join(df_rel, "t").select(
        "doc_id", "t", (F.col("tf") * (F.lit(1.0) / F.col("df"))).alias("wt")
    )
    path = str(tmp_path / "idx3")
    build_tfidf_index(wt, path)

    q_terms = terms.filter(F.col("doc_id") % 50 == 0).withColumnRenamed(
        "doc_id", "q_id"
    )
    via_index = tfidf_index_topk(q_terms, path, k=2, threshold=0.2)

    # inline reference: identical weighting and join, no store
    qw = q_terms.join(df_rel, "t").select(
        "q_id", "t", (F.col("tf") * (F.lit(1.0) / F.col("df"))).alias("qw")
    )
    qn = qw.groupBy("q_id").agg(F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qn"))
    dn = wt.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("dn"))
    dots = (
        qw.join(wt, "t").groupBy("q_id", "doc_id").agg(F.sum(F.col("qw") * F.col("wt")).alias("dp"))
    )
    from firmable_aus_etl_spark.operators.windows import topk_per_group

    inline = topk_per_group(
        dots.join(qn, "q_id").join(dn, "doc_id")
        .select("q_id", "doc_id", (F.col("dp") / (F.col("qn") * F.col("dn"))).alias("cosine"))
        .filter(F.col("cosine") >= 0.2),
        ["q_id"],
        [F.col("cosine").desc(), F.col("doc_id").asc()],
        k=2,
        keep_rank=True,
        rank_col="rank",
    )
    a = {(r.q_id, r.doc_id, r.rank, round(r.cosine, 9)) for r in via_index.collect()}
    b = {(r.q_id, r.doc_id, r.rank, round(r.cosine, 9)) for r in inline.collect()}
    assert a == b and len(a) > 0
