"""Property-based tests (hypothesis) for the merge/dedup/similarity
invariants — the class of tests SURVEY §5 notes the reference lacks.

Strategy sizes are small (Spark job per example is expensive); the
properties, not the volume, carry the value:
- merge idempotence: applying the same update batch twice == once
- merge key conservation: output keys == existing ∪ update keys
- keyed dedup: exactly one survivor per key, and it's the tiebreak min
- token_sort_ratio symmetry + identity + bounds
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from firmable_aus_etl_spark.functions.similarity import _py_indel_ratio, _token_sort_py
from firmable_aus_etl_spark.operators import dedup, joins

KEYS = st.integers(min_value=0, max_value=6)
VALS = st.text(alphabet="abcxyz ", min_size=0, max_size=8)

ROWS = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string") if rows else (
        spark.createDataFrame([], "k long, v string")
    )


@given(existing=ROWS, updates=ROWS)
@_SETTINGS
def test_merge_upsert_idempotent_and_key_conserving(spark, existing, updates):
    # merge needs unique keys per side (table semantics)
    e = {k: v for k, v in existing}
    u = {k: v for k, v in updates}
    edf = _df(spark, list(e.items()))
    udf = _df(spark, list(u.items()))

    once = joins.merge_upsert(edf, udf, ["k"])
    twice = joins.merge_upsert(once, udf, ["k"])
    got_once = {(r.k, r.v) for r in once.collect()}
    got_twice = {(r.k, r.v) for r in twice.collect()}
    assert got_once == got_twice, "merge must be idempotent"
    assert {k for k, _ in got_once} == set(e) | set(u), "keys conserved"
    # update wins wherever present
    for k, v in u.items():
        assert (k, v) in got_once


@given(rows=ROWS)
@_SETTINGS
def test_dedup_keyed_one_min_survivor_per_key(spark, rows):
    df = _df(spark, rows)
    out = dedup.dedup_keyed(df, ["k"], [F.col("v").asc_nulls_first()])
    got = {r.k: r.v for r in out.collect()}
    expect = {}
    for k, v in rows:
        if k not in expect or v < expect[k]:
            expect[k] = v
    assert got == expect


@given(a=st.text(max_size=12), b=st.text(max_size=12))
@_SETTINGS
def test_indel_ratio_properties(a, b):
    ra = _py_indel_ratio(_token_sort_py(a), _token_sort_py(b))
    rb = _py_indel_ratio(_token_sort_py(b), _token_sort_py(a))
    assert ra == pytest.approx(rb), "symmetry"
    assert 0.0 <= ra <= 100.0, "bounds"
    assert _py_indel_ratio(_token_sort_py(a), _token_sort_py(a)) == 100.0, "identity"


WORDS = st.sampled_from(["spark", "table", "row", "key", "scan", "fast", "the"])
DOCS = st.lists(
    st.lists(WORDS, min_size=0, max_size=10).map(" ".join),
    min_size=0,
    max_size=10,
)


@given(texts=DOCS, t=st.sampled_from([0.3, 0.5, 0.8]))
@_SETTINGS
def test_prefix_jaccard_exact_property(spark, texts, t):
    """Prefix filtering (both global orders) must reproduce the naive
    exact Jaccard join on arbitrary small corpora — including empty
    texts, whole-corpus duplicates, and sub-n-gram-length docs."""
    rows = [(i, s) for i, s in enumerate(texts)]
    docs = (
        spark.createDataFrame(rows, "doc_id long, text string")
        if rows
        else spark.createDataFrame([], "doc_id long, text string")
    )
    naive = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=2, threshold=t
        ).collect()
    }
    for order in ("hash", "df"):
        pref = {
            (r.a_id, r.b_id): round(r.jaccard, 9)
            for r in dedup.ngram_jaccard_pairs_prefix(
                docs, "doc_id", "text", shingle_n=2, threshold=t, order=order
            ).collect()
        }
        assert pref == naive, (order, t)
