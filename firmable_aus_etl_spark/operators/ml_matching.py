"""Spark ML variants of the similarity matcher (SURVEY op22 scale
alternatives): the official MLlib pipeline for TF-IDF vectors and
MinHashLSH approxSimilarityJoin.

These exist alongside the expression-level implementations
(queries.q_tfidf_cosine_top1, dedup.minhash_lsh_pairs) because they are
the API a Spark-ML-versed user reaches for; the expression variants
remain the oracle-checked/benchmarked paths (ML models are not
SQL-replayable). reference: entity_matching_optimized.py:122-191
(TfidfVectorizer max_features=10000, ngram(1,2)); SURVEY §4 custom
work #4 (LSH for 100TB-scale matching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firmable_aus_etl_spark.functions.similarity import normalize_name


def _tfidf_features(
    df: DataFrame,
    text_col: str,
    *,
    num_features: int = 10000,
    min_token_len: int = 1,
):
    """norm -> tokenize -> HashingTF -> IDF -> L2 normalize.

    Mirrors the reference's TfidfVectorizer knobs: the 10k feature cap
    becomes HashingTF numFeatures (fixed-width sparse vectors — no
    vocabulary broadcast, which is what makes this shippable at 100 TB).
    """
    from pyspark.ml.feature import IDF, HashingTF, Normalizer, Tokenizer

    prepped = df.withColumn("__text", normalize_name(F.col(text_col)))
    tok = Tokenizer(inputCol="__text", outputCol="__tokens")
    tf = HashingTF(inputCol="__tokens", outputCol="__tf", numFeatures=num_features)
    idf = IDF(inputCol="__tf", outputCol="__tfidf")
    norm = Normalizer(inputCol="__tfidf", outputCol="features", p=2.0)

    t = tok.transform(prepped)
    h = tf.transform(t)
    model = idf.fit(h)
    out = norm.transform(model.transform(h))
    return out.drop("__text", "__tokens", "__tf", "__tfidf")


def minhash_lsh_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    jaccard_threshold: float = 0.5,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH.approxSimilarityJoin over
    binarized token vectors. Returns (a_id, b_id, jaccard_distance).

    The hand-rolled expression pipeline (dedup.minhash_lsh_pairs) and
    this produce comparable candidate sets; this one carries model
    state (fitted hash tables) and MLlib's own banding internals.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    prepped = df.select(
        F.col(id_col).alias("__mid"), normalize_name(F.col(text_col)).alias("__text")
    )
    tok = Tokenizer(inputCol="__text", outputCol="__tokens")
    # binary=True: MinHash needs set-membership vectors, not counts
    tf = HashingTF(
        inputCol="__tokens", outputCol="features", numFeatures=num_features, binary=True
    )
    tokens = tok.transform(prepped).filter(F.size("__tokens") > 0)
    feats = tf.transform(tokens).select("__mid", "features")

    mh = MinHashLSH(inputCol="features", outputCol="__hashes", numHashTables=num_hash_tables)
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_distance"
    )
    return (
        joined.filter(F.col("datasetA.__mid") < F.col("datasetB.__mid"))
        .select(
            F.col("datasetA.__mid").alias("a_id"),
            F.col("datasetB.__mid").alias("b_id"),
            F.col("jaccard_distance"),
        )
    )


def tfidf_cosine_ml_top1(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    *,
    threshold: float = 0.7,
    num_features: int = 10000,
) -> DataFrame:
    """op22 via MLlib: TF-IDF + L2-normalized vectors, cosine = dot of
    normalized vectors via BucketedRandomProjectionLSH-free exact join
    (small right side) — returns (left_id, right_id, cosine) top-1.

    For large rights, swap the crossJoin for
    BucketedRandomProjectionLSH.approxSimilarityJoin on the same
    feature column — identical upstream pipeline.
    """
    from pyspark.ml.functions import vector_to_array

    lf = _tfidf_features(left.select(F.col(left_id).alias("a_id"), F.col(left_text).alias("__t")), "__t", num_features=num_features)
    rf = _tfidf_features(right.select(F.col(right_id).alias("b_id"), F.col(right_text).alias("__t")), "__t", num_features=num_features)

    la = lf.select("a_id", vector_to_array(F.col("features")).alias("__va"))
    rb = rf.select("b_id", vector_to_array(F.col("features")).alias("__vb"))
    pairs = la.crossJoin(F.broadcast(rb)).withColumn(
        "cosine",
        F.aggregate(
            F.zip_with(F.col("__va"), F.col("__vb"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    from firmable_aus_etl_spark.operators.windows import topk_per_group

    out = topk_per_group(
        pairs.filter(F.col("cosine") >= threshold),
        ["a_id"],
        [F.col("cosine").desc(), F.col("b_id").asc()],
        k=1,
    )
    return out.select("a_id", "b_id", "cosine")
