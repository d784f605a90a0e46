"""BM25 top-k retrieval (operators/retrieval.py): hand-computed
scores, missing-term and duplicate-term semantics, deterministic
tie-breaks, plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators.retrieval import (
    bm25_corpus_stats,
    bm25_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id string, qtext string")


def _bm25_ref(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    """Straight-from-the-paper single-term reference score."""
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_corpus_stats_relations(spark):
    docs = _docs(spark, [(1, "a b a"), (2, "b c")])
    tf, dl, dfreq, stats = bm25_corpus_stats(docs)
    assert sorted(tuple(r) for r in tf.collect()) == [
        (1, "a", 2), (1, "b", 1), (2, "b", 1), (2, "c", 1)]
    assert sorted(tuple(r) for r in dl.collect()) == [(1, 3), (2, 2)]
    assert sorted(tuple(r) for r in dfreq.collect()) == [
        ("a", 1), ("b", 2), ("c", 1)]
    assert stats.collect()[0].asDict() == {"n_docs": 2, "total_dl": 5}


def test_scores_match_hand_computed_bm25(spark):
    # corpus: doc 1 has 'cat' twice in 4 tokens, doc 2 once in 2,
    # doc 3 none; avgdl = (4 + 2 + 2) / 3
    docs = _docs(spark, [
        (1, "cat cat dog bird"), (2, "cat fish"), (3, "dog fish")])
    out = bm25_topk(docs, _queries(spark, [("q", "cat")]), k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    avgdl = 8.0 / 3.0
    for doc, tf_, dl_ in [(1, 2, 4), (2, 1, 2)]:
        want = _bm25_ref(tf_, df=2, n_docs=3, dl=dl_, avgdl=avgdl)
        # engine floors each contribution to 1e-6 units
        assert abs(rows[doc]["score"] - want) <= 1e-6
    # longer doc with higher tf: ranking is a genuine comparison,
    # assert BOTH docs' ranks under whichever score order holds
    if rows[1]["score"] > rows[2]["score"]:
        assert rows[1]["rank"] == 1 and rows[2]["rank"] == 2
    else:
        assert rows[2]["rank"] == 1 and rows[1]["rank"] == 2


def test_multi_term_scores_sum_per_term(spark):
    docs = _docs(spark, [(1, "cat dog"), (2, "cat cat"), (3, "dog dog")])
    single_cat = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, _queries(spark, [("q", "cat")])).collect()
    }
    single_dog = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, _queries(spark, [("q", "dog")])).collect()
    }
    both = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, _queries(spark, [("q", "cat dog")])).collect()
    }
    for doc in (1, 2, 3):
        want = single_cat.get(doc, 0.0) + single_dog.get(doc, 0.0)
        assert abs(both[doc] - want) < 1e-9  # integer units add exactly


def test_unknown_terms_drop_and_all_unknown_query_is_empty(spark):
    docs = _docs(spark, [(1, "cat dog"), (2, "cat")])
    out = bm25_topk(
        docs,
        _queries(spark, [("known", "cat zzz"), ("ghost", "zzz yyy")]),
    )
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {"known"}
    # 'zzz' contributes nothing: score equals the cat-only score
    cat_only = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, _queries(spark, [("q", "cat")])).collect()
    }
    for r in rows:
        assert abs(r["score"] - cat_only[r["doc_id"]]) < 1e-12


def test_repeated_query_terms_count_once(spark):
    docs = _docs(spark, [(1, "cat dog"), (2, "cat")])
    once = bm25_topk(docs, _queries(spark, [("q", "cat")])).collect()
    thrice = bm25_topk(docs, _queries(spark, [("q", "cat cat cat")])).collect()
    assert sorted(tuple(r) for r in once) == sorted(tuple(r) for r in thrice)


def test_k_cap_and_doc_id_tie_break(spark):
    # ten identical docs: every score ties, ranks must follow doc_id
    docs = _docs(spark, [(i, "cat dog") for i in range(10)])
    out = bm25_topk(docs, _queries(spark, [("q", "cat")]), k=4).collect()
    assert [(r["rank"], r["doc_id"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (1, 0), (2, 1), (3, 2), (4, 3)]


def test_normalization_matches_engine_tokenizer(spark):
    # mixed case / extra spaces normalize identically on both sides
    docs = _docs(spark, [(1, "  CaT   dOg "), (2, "cat")])
    out = bm25_topk(docs, _queries(spark, [("q", " CAT ")])).collect()
    assert {r["doc_id"] for r in out} == {1, 2}


def test_plan_shape_query_side_broadcast_no_python(spark):
    docs = _docs(spark, [(i, "cat dog fish") for i in range(8)])
    out = bm25_topk(docs, _queries(spark, [("q", "cat fish")]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    # the posting probe is a broadcast-hash join (query side broadcast)
    assert "BroadcastHashJoin" in plan
    # top-k limit pushed into the window
    assert "WindowGroupLimit" in plan
