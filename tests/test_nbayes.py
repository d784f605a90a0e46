"""Multinomial Naive Bayes (operators/nbayes.py): reference-formula
replay on the integer units, real learning on separable classes,
prior fallback, layout invariance, plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators.nbayes import nb_predict, nb_train


def _tok_rows(docs):
    """[(doc_id, class, text)] -> occurrence rows (doc_id, cls, t)."""
    out = []
    for doc_id, cls, text in docs:
        for t in text.split():
            out.append((doc_id, cls, t))
    return out


def _frame(spark, docs):
    return spark.createDataFrame(
        _tok_rows(docs), "doc_id long, lang string, t string"
    )


def _unit(x):
    return math.floor(x * 1000000.0 + 0.5)


def _py_scores(train_docs, test_docs):
    """Straight-from-the-docstring reference: integer-unit NB scores."""
    from collections import Counter, defaultdict

    cnt = Counter()
    totals = Counter()
    class_docs = defaultdict(set)
    vocab = set()
    all_docs = set()
    for doc_id, cls, t in _tok_rows(train_docs):
        cnt[(cls, t)] += 1
        totals[cls] += 1
        class_docs[cls].add(doc_id)
        vocab.add(t)
        all_docs.add(doc_id)
    v, docs_total = len(vocab), len(all_docs)
    u_tok = {k: _unit(math.log(c + 1.0)) for k, c in cnt.items()}
    u_prior = {
        c: _unit(math.log(len(class_docs[c]) / docs_total))
        for c in class_docs
    }
    u_den = {c: _unit(math.log(float(totals[c] + v))) for c in totals}
    scores = {}
    for doc_id, _cls, text in test_docs:
        tf = Counter(text.split())
        n = sum(tf.values())
        for c in class_docs:
            part = sum(
                f * u_tok.get((c, t), 0) for t, f in tf.items()
            )
            scores[(doc_id, c)] = part - n * u_den[c] + u_prior[c]
    return scores


TRAIN = [
    (1, "en", "the cat sat on the mat"),
    (2, "en", "a dog and a cat"),
    (3, "en", "the dog barks"),
    (4, "de", "der hund und die katze"),
    (5, "de", "die katze sitzt"),
    (6, "de", "der hund bellt laut"),
]
TEST = [
    (10, "en", "the cat and the dog"),
    (11, "de", "die katze und der hund"),
]


def test_scores_match_reference_units_exactly(spark):
    model, classes = nb_train(
        _frame(spark, TRAIN), class_col="lang", token_col="t"
    )
    te = _frame(spark, TEST).select("doc_id", "t")
    pred = nb_predict(
        te, model, classes,
        doc_col="doc_id", token_col="t", class_col="lang",
    )
    want = _py_scores(TRAIN, TEST)
    got = {r["doc_id"]: r for r in pred.collect()}
    for doc_id, _cls, _text in TEST:
        best = max(
            (c for (d, c) in want if d == doc_id),
            key=lambda c: (want[(doc_id, c)], ),
        )
        # tie-break asc on class only matters on exact unit ties
        assert got[doc_id]["predicted"] == best
        assert got[doc_id]["score_units"] == want[(doc_id, best)]


def test_learns_separable_classes_perfectly(spark):
    model, classes = nb_train(
        _frame(spark, TRAIN), class_col="lang", token_col="t"
    )
    te = _frame(spark, TEST).select("doc_id", "t")
    pred = {
        r["doc_id"]: r["predicted"]
        for r in nb_predict(
            te, model, classes,
            doc_col="doc_id", token_col="t", class_col="lang",
        ).collect()
    }
    assert pred == {10: "en", 11: "de"}


def test_no_overlap_doc_falls_back_to_prior(spark):
    # 3 en train docs vs 1 fr: unseen-vocab test doc gets the
    # prior-dominated argmax (en), not a crash or a dropped row
    train = TRAIN[:3] + [(7, "fr", "le chat")]
    test = [(20, "??", "zzz yyy xxx")]
    model, classes = nb_train(
        _frame(spark, train), class_col="lang", token_col="t"
    )
    out = nb_predict(
        _frame(spark, test).select("doc_id", "t"),
        model, classes,
        doc_col="doc_id", token_col="t", class_col="lang",
    ).collect()
    assert len(out) == 1
    want = _py_scores(train, test)
    best = max(("en", "fr"), key=lambda c: (want[(20, c)], ))
    assert out[0]["predicted"] == best


def test_layout_invariance(spark):
    df = _frame(spark, TRAIN)
    model1, classes1 = nb_train(
        df.repartition(1), class_col="lang", token_col="t"
    )
    model8, classes8 = nb_train(
        df.repartition(8, "t"), class_col="lang", token_col="t"
    )
    assert sorted(tuple(r) for r in model1.collect()) == sorted(
        tuple(r) for r in model8.collect()
    )
    assert sorted(tuple(r) for r in classes1.collect()) == sorted(
        tuple(r) for r in classes8.collect()
    )


def test_plan_broadcasts_model_no_python(spark):
    model, classes = nb_train(
        _frame(spark, TRAIN), class_col="lang", token_col="t"
    )
    out = nb_predict(
        _frame(spark, TEST).select("doc_id", "t"),
        model, classes,
        doc_col="doc_id", token_col="t", class_col="lang",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
