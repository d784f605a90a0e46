"""Distributed multinomial Naive Bayes — a TRAINED model under the
oracle gate (McCallum & Nigam, "A Comparison of Event Models for
Naive Bayes Text Classification", AAAI-98 workshop).

The reference pipeline's classification needs (language ID, quality
gating, source attribution) are served elsewhere by heuristics
(functions/text.py) and by an injectable LLM stage (pipelines.py).
This module adds the classical middle option: a model LEARNED from
the corpus — and because multinomial NB training is nothing but
counting, BOTH training and scoring are plain relational algebra that
a SQL twin replays exactly. That makes it the engine's existence
proof that "ML in the pipeline" does not have to leave the
correctness gate: the trained parameters, the per-class scores, and
the argmax decisions all hash-match DuckDB.

Scale shape: training is one groupBy over (class, token) plus three
tiny aggregates — one linear pass, partial-aggregated map-side. The
model is <= |vocab| x |classes| rows (sparse: only SEEN pairs
materialize; unseen pairs contribute exactly 0 via the ln(cnt+1)
formulation below) and broadcasts to the scoring join, so the corpus
being scored never shuffles for the model — the BM25/Bloom/CMS
broadcast discipline. Scoring is one broadcast join + one
(doc, class) aggregation + an argmax window.

Engine-portable determinism: with Laplace smoothing,

    score(d, c) = ln P(c) + sum_t tf_dt * ln((cnt_ct + 1)/(T_c + V))
                = ln P(c) - n_d * ln(T_c + V)
                + sum_t tf_dt * ln(cnt_ct + 1)

The second form needs only the SEEN (class, token) rows (absent rows
contribute ln(0+1) = 0), splits the class-level terms out of the
per-token sum, and lets every ln be floor-scaled to INTEGER 1e-6
units BEFORE any aggregation (the entropy/PMI/BM25 precedent):
per-token units multiply by integer tf and sum exactly; the argmax
orders on integer units with a class-name tie-break, so no FP
boundary can flip a prediction between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators.windows import topk_per_group

_SCALE = 1000000.0


def nb_train(
    tokens: DataFrame, *, class_col: str, token_col: str
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB from a token-occurrence relation (one row
    per token OCCURRENCE, carrying its class). Returns two frames:

      model   (class, token, u_tok)  — u_tok = unit(ln(cnt + 1)) for
              SEEN pairs only (sparse)
      classes (class, u_prior, u_den, n_docs) — u_prior =
              unit(ln(docs_c / docs_total)); u_den = unit(ln(T_c + V))

    where unit(x) = floor(x * 1e6 + 0.5) as a long. ``tokens`` must
    also carry a ``doc_id`` column for the document priors.
    """
    cnt = tokens.groupBy(class_col, token_col).agg(
        F.count("*").alias("__cnt")
    )
    model = cnt.select(
        class_col,
        token_col,
        F.floor(
            F.log(F.col("__cnt").cast("double") + 1.0) * F.lit(_SCALE) + 0.5
        )
        .cast("long")
        .alias("u_tok"),
    )
    totals = tokens.groupBy(class_col).agg(
        F.count("*").alias("__T"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    vocab = tokens.agg(
        F.count_distinct(token_col).alias("__V"),
        F.count_distinct("doc_id").alias("__docs_total"),
    )
    classes = totals.crossJoin(F.broadcast(vocab)).select(
        class_col,
        F.floor(
            F.log(
                F.col("n_docs").cast("double") / F.col("__docs_total")
            )
            * F.lit(_SCALE)
            + 0.5
        )
        .cast("long")
        .alias("u_prior"),
        F.floor(
            F.log((F.col("__T") + F.col("__V")).cast("double"))
            * F.lit(_SCALE)
            + 0.5
        )
        .cast("long")
        .alias("u_den"),
        "n_docs",
    )
    return model, classes


def nb_predict(
    tokens: DataFrame,
    model: DataFrame,
    classes: DataFrame,
    *,
    doc_col: str,
    token_col: str,
    class_col: str,
    pred_col: str = "predicted",
) -> DataFrame:
    """Score a token-occurrence relation (doc_col, token_col — one row
    per occurrence) against a trained model and return
    (doc_col, pred_col, score_units): the argmax class per document,
    deterministic by (integer units desc, class asc).

    Plan: per-doc token tf aggregation; broadcast model join on token
    (docs never shuffle for the model); (doc, class) integer-unit sum;
    the class-level prior/denominator terms attach on the (doc x
    classes) grid so classes sharing no token with a doc still
    compete; argmax window."""
    tf = tokens.groupBy(doc_col, token_col).agg(
        F.count("*").alias("__tf")
    )
    ntok = tf.groupBy(doc_col).agg(F.sum("__tf").alias("__n"))
    partial = (
        tf.join(F.broadcast(model), token_col)
        .groupBy(doc_col, class_col)
        .agg(F.sum(F.col("__tf") * F.col("u_tok")).alias("__u_part"))
    )
    grid = ntok.crossJoin(
        F.broadcast(classes.select(class_col, "u_prior", "u_den"))
    )
    scored = grid.join(partial, [doc_col, class_col], "left").select(
        doc_col,
        class_col,
        (
            F.coalesce(F.col("__u_part"), F.lit(0).cast("long"))
            - F.col("__n") * F.col("u_den")
            + F.col("u_prior")
        ).alias("score_units"),
    )
    top = topk_per_group(
        scored,
        [doc_col],
        [F.col("score_units").desc(), F.col(class_col).asc()],
        k=1,
    )
    return top.select(
        doc_col, F.col(class_col).alias(pred_col), "score_units"
    )
