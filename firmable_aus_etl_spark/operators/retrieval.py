"""BM25 top-k text retrieval — the query-serving shape of the tf-idf
family (Robertson & Zaragoza, "The Probabilistic Relevance Framework:
BM25 and Beyond", FnTIR 2009; the Okapi BM25 scoring function).

The tf-idf cosine joins (operators/cosine_join.py) answer "which
corpus docs match EACH OTHER"; this module answers "which corpus docs
match THIS QUERY" — the retrieval primitive a training-data pipeline
uses for RAG-style corpus search, targeted decontamination probes,
and topic-conditioned sampling.

Scale shape (the reason this is not a crossJoin):
  * the corpus side is the standard inverted index — one tokenize +
    one (doc, term) tf aggregation, linear in corpus size; at cluster
    scale it is built once and persisted (see build_tfidf_index for
    the layout; a BM25 index stores (doc, term, tf) + (doc, dl) +
    (term, df), exactly the frames produced here);
  * the query side is tiny (queries x terms rows) and is BROADCAST
    after document frequencies are attached, so scoring is a
    broadcast-hash join against the posting list — the corpus never
    shuffles for the probe, only for the per-(query, doc) partial
    aggregation, and terms absent from the query never leave the scan
    (the join prunes postings before any wide operator);
  * top-k per query is a rank<=k window — WindowGroupLimit pushes the
    limit into the shuffle, so only ~k rows per query per partition
    survive the exchange.

Engine-portable determinism (the oracle discipline of PERF.md):
per-(term, doc) score contributions are floor-scaled to INTEGER
1e-6 units BEFORE the per-(query, doc) sum — integer sums are
partial-aggregation-order independent where double sums are not (the
entropy/PMI precedent in queries.py). Ranking orders on the integer
units, so no rounding boundary can flip a rank between engines.

reference scope: serving extension of the reference's tf-idf matcher
(entity_matching_tfidf.py:121-140 scores incoming rows against a
loaded corpus in-memory); SURVEY §4 beyond-reference similarity
search, text sibling of vectors.ann_cosine_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firmable_aus_etl_spark.functions.similarity import normalize_name
from firmable_aus_etl_spark.operators.windows import topk_per_group

#: Integer score grain: contributions are floored to units of 1e-6.
_SCALE = 1000000.0


def bm25_corpus_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The three relations of a BM25 inverted index plus the 1-row
    corpus stats frame:

      tf     (id, t, tf)        — postings
      dl     (id, dl)           — document lengths in tokens
      dfreq  (t, df)            — document frequencies
      stats  (n_docs, total_dl) — corpus scalars (avgdl = total/n)

    Tokenization is the engine-wide normalize_name + single-space
    split (identical to the tf-idf cosine family, so one persisted
    index can serve both)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_name(F.col(text_col)), " ")).alias("t"),
    )
    tf = toks.groupBy("id", "t").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("t").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    return tf, dl, dfreq, stats


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Okapi BM25 top-k retrieval: for every query row, the ``k``
    highest-scoring documents with

        score(q, d) = sum over distinct terms t of q present in d of
            ln(1 + (N - df + 0.5) / (df + 0.5))          [idf]
          * (tf * (k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))

    (the Lucene non-negative idf variant). Repeated query terms count
    once — distinct-term scoring, the common serving convention.

    Returns (query_id, rank, doc_id, score): rank is 1-based dense by
    (integer score units desc, doc_id asc) — deterministic across
    engines, layouts and runs; score is units/1e6.

    Per-row double arithmetic is written in one fixed operation order
    (mirrored token-for-token by the SQL oracle twin): dl/avgdl is
    computed as (dl * N) / total_dl — one integer multiply (exact) and
    ONE double division — and the k1+1 / 1-b constants are pre-folded
    literals so both engines parse the same decimal.
    """
    tf, dl, dfreq, stats = bm25_corpus_stats(
        docs, id_col=id_col, text_col=text_col
    )
    qterms = queries.select(
        F.col(qid_col).alias("query_id"),
        F.explode(
            F.array_distinct(
                F.split(normalize_name(F.col(qtext_col)), " ")
            )
        ).alias("t"),
    )
    # attach df + corpus scalars to the query-term frame FIRST: the
    # result is (queries x terms) rows — broadcastable — and carries
    # everything the per-posting score needs except (tf, dl)
    qt = (
        qterms.join(dfreq, "t")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "t",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ).alias("idf"),
            "n_docs",
            "total_dl",
        )
    )
    k1p1 = float(k1) + 1.0
    one_minus_b = 1.0 - float(b)
    posts = tf.join(dl, "id").join(F.broadcast(qt), "t")
    contrib = posts.select(
        "query_id",
        "id",
        F.floor(
            F.col("idf")
            * (F.col("tf") * F.lit(k1p1))
            / (
                F.col("tf")
                + F.lit(float(k1))
                * (
                    F.lit(one_minus_b)
                    + F.lit(float(b))
                    * (
                        (F.col("dl") * F.col("n_docs")).cast("double")
                        / F.col("total_dl")
                    )
                )
            )
            * F.lit(_SCALE)
            + 0.5
        )
        .cast("long")
        .alias("units"),
    )
    scored = contrib.groupBy("query_id", "id").agg(
        F.sum("units").alias("units")
    )
    top = topk_per_group(
        scored,
        ["query_id"],
        [F.col("units").desc(), F.col("id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    )
    return top.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("id").alias(id_col),
        (F.col("units") / F.lit(_SCALE)).alias("score"),
    )
