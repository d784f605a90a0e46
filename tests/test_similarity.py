"""Golden micro-fixture for the similarity scorers (FIXTURES.md §B5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark.functions import similarity as sim


PAIRS = [
    # (left, right, expect_expr_100, expect_udf_100)
    ("Acme Pty Ltd", "Acme Pty Ltd", True, True),       # identical
    ("Pty Ltd Acme", "Acme Pty Ltd", True, True),       # token reorder -> 100
    ("Acme Pty Ltd", "Acme Pty Limited", False, False),  # suffix variant
    ("Acme Pty Ltd", "Zebra Holdings", False, False),    # unrelated
]


def _scores(spark, scorer_col):
    df = spark.createDataFrame([(a, b) for a, b, _, _ in PAIRS], "a string, b string")
    return [r.s for r in df.select(scorer_col.alias("s")).collect()]


def test_token_sort_ratio_expr_golden(spark):
    scores = _scores(spark, sim.token_sort_ratio_expr(F.col("a"), F.col("b")))
    assert scores[0] == 100.0
    assert scores[1] == 100.0  # token-sorted equality — THE token_sort property
    assert 70.0 < scores[2] < 100.0
    assert scores[3] < 50.0


def test_token_sort_ratio_udf_golden(spark):
    scores = _scores(spark, sim.token_sort_ratio_udf(F.col("a"), F.col("b")))
    assert scores[0] == 100.0
    assert scores[1] == 100.0
    assert 70.0 < scores[2] < 100.0
    assert scores[3] < 50.0


def test_expr_and_udf_agree_on_ordering(spark):
    e = _scores(spark, sim.token_sort_ratio_expr(F.col("a"), F.col("b")))
    u = _scores(spark, sim.token_sort_ratio_udf(F.col("a"), F.col("b")))
    # Different formulas (levenshtein/maxlen vs indel/sumlen) but the
    # induced ranking must agree for threshold semantics to transfer.
    assert sorted(range(4), key=lambda i: e[i]) == sorted(range(4), key=lambda i: u[i])


def test_empty_and_null_inputs(spark):
    df = spark.createDataFrame([("", ""), (None, "x"), ("x", "x")], "a string, b string")
    rows = df.select(
        sim.token_sort_ratio_expr(F.col("a"), F.col("b")).alias("e"),
        sim.token_sort_ratio_udf(F.col("a"), F.col("b")).alias("u"),
    ).collect()
    assert rows[0].e == 100.0 and rows[0].u == 100.0  # both empty => identical
    assert rows[2].e == 100.0 and rows[2].u == 100.0


def test_py_indel_ratio_matches_rapidfuzz_formula():
    # rapidfuzz ratio("abcd","bcde") = (4+4-2*?) ; lcs("abcd","bcde")=3
    # indel = 8-6=2 -> 100*(1-2/8)=75
    assert sim._py_indel_ratio("abcd", "bcde") == pytest.approx(75.0)
    assert sim._py_indel_ratio("", "") == 100.0
    assert sim._py_indel_ratio("a", "") == 0.0


def test_jaccard_tokens(spark):
    df = spark.createDataFrame([("a b c", "b c d"), ("a b", "a b"), ("x", "y")], "a string, b string")
    vals = [r.j for r in df.select(sim.jaccard_tokens("a", "b").alias("j")).collect()]
    assert vals[0] == pytest.approx(0.5)  # {b,c} / {a,b,c,d}
    assert vals[1] == 1.0
    assert vals[2] == 0.0


def test_cosine_prefix_join_equals_naive_at_low_threshold(spark):
    """Losslessness at a PERMISSIVE threshold (0.35): short prefixes
    prune hardest when t is high, so a low t stresses the bound where
    heads are long and the candidate superset is widest."""
    from firmable_aus_etl_spark.operators.cosine_join import cosine_prefix_join
    from firmable_aus_etl_spark.queries import _tfidf_weight_frame

    wt = _tfidf_weight_frame(spark, "/root/testdata/sf0.001")
    t = 0.35
    got = {
        (r.a_id, r.b_id)
        for r in cosine_prefix_join(
            wt, id_col="doc_id", token_col="t", weight_col="wt",
            threshold=t, block_cols=["source", "lang"],
        ).collect()
    }
    from pyspark.sql import functions as F

    a = wt.select(
        F.col("doc_id").alias("a_id"), "source", "lang",
        F.col("t").alias("tok"), F.col("wt").alias("wa"),
    )
    b = wt.select(
        F.col("doc_id").alias("b_id"), "source", "lang",
        F.col("t").alias("tok"), F.col("wt").alias("wb"),
    )
    dots = (
        a.join(b, ["source", "lang", "tok"])
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dp"))
    )
    nrm = wt.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")
    )
    want = {
        (r.a_id, r.b_id)
        for r in dots.join(
            nrm.select(F.col("doc_id").alias("a_id"), F.col("nrm").alias("na")), "a_id"
        )
        .join(nrm.select(F.col("doc_id").alias("b_id"), F.col("nrm").alias("nb")), "b_id")
        .filter(F.col("dp") / (F.col("na") * F.col("nb")) >= t)
        .collect()
    }
    assert got == want and want, (len(got), len(want))


import pytest


@pytest.mark.parametrize("seed,thresh", [(1, 0.5), (2, 0.8), (3, 0.95)])
def test_cosine_prefix_join_random_corpora(spark, seed, thresh):
    """Prefix-filter losslessness on randomized weighted corpora
    (mixed weight skew, shared + unique tokens) across thresholds."""
    import random

    from firmable_aus_etl_spark.operators.cosine_join import cosine_prefix_join
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for doc in range(60):
        for tok in rng.sample(vocab, rng.randint(3, 12)):
            rows.append((doc, tok, rng.choice([0.05, 0.3, 1.0, 3.0])))
    # planted identical pair: cosine exactly 1.0 keeps every threshold
    # case non-vacuous
    clone = [(tok, w) for d, tok, w in rows if d == 0]
    rows += [(100, tok, w) for tok, w in clone]
    rows += [(101, tok, w) for tok, w in clone]
    wt = spark.createDataFrame(rows, "id long, tok string, w double")

    got = {
        (r.a_id, r.b_id)
        for r in cosine_prefix_join(
            wt, id_col="id", token_col="tok", weight_col="w", threshold=thresh
        ).collect()
    }

    a = wt.select(F.col("id").alias("a_id"), "tok", F.col("w").alias("wa"))
    b = wt.select(F.col("id").alias("b_id"), "tok", F.col("w").alias("wb"))
    dots = (
        a.join(b, "tok")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dp"))
    )
    nrm = wt.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("n"))
    want = {
        (r.a_id, r.b_id)
        for r in dots.join(nrm.select(F.col("id").alias("a_id"), F.col("n").alias("na")), "a_id")
        .join(nrm.select(F.col("id").alias("b_id"), F.col("n").alias("nb")), "b_id")
        .filter(F.col("dp") / (F.col("na") * F.col("nb")) >= thresh)
        .collect()
    }
    assert got == want, (len(got), len(want))
    assert want  # thresholds chosen so each case has real pairs
