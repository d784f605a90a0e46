"""Prefix-filtered exact cosine similarity join (AllPairs / Bayardo,
Roberto J. Bayardo, Yiming Ma, Ramakrishnan Srikant: "Scaling Up All
Pairs Similarity Search", WWW 2007) — the weighted-vector counterpart
of the Jaccard prefix filter in dedup.ngram_jaccard_pairs_prefix.

Why it scales: the naive sparse cosine join pairs every co-token
posting (|posting|^2 fan-out per token). The L2 suffix bound prunes
the index side to each vector's few HEAVY dimensions: for a unit
vector x split into head H and tail T (by descending weight),

    dot(x, y) <= dot_H(x, y) + ||x_T|| * ||y|| = dot_H(x, y) + ||x_T||

so if y shares no head token of x and ||x_T|| < t, then cos(x, y) < t
— any qualifying pair MUST collide on a head token. Candidates =
heavy(x) equi-join all(y) (both roles, union) is therefore lossless:
the oracle-checked query reuses the naive join's oracle verbatim as
its exactness proof. Fan-out drops from |posting|^2 to
|heavy_posting| * |posting| per token, and heavy postings shrink as
weights concentrate — the more skewed the corpus vocabulary, the
bigger the win (cf. SKEW.md for the Jaccard analog at 100 TB).

reference scope: op22 scale path (SURVEY §4 custom work #4);
entity_matching_optimized.py:122-191 is the single-node TF-IDF
original this replaces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_prefix_join(
    wt: DataFrame,
    *,
    id_col: str,
    token_col: str,
    weight_col: str,
    threshold: float,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact cosine-threshold self-join of a sparse weighted term
    relation ``wt`` = (id, [blocks...], token, weight).

    Returns (a_id, b_id, dp, nrm_a, nrm_b) for every pair a_id < b_id
    (same block) with cosine = dp/(nrm_a*nrm_b) >= threshold. The dp
    is computed from the RAW weights over shared tokens — same
    accumulation the naive join does — so downstream rounding/tie
    logic is unchanged; the prefix bound only prunes candidates.
    """
    blocks = list(block_cols)
    ids = [id_col, *blocks]

    nrm = wt.groupBy(*ids).agg(
        F.sqrt(F.sum(F.col(weight_col) * F.col(weight_col))).alias("nrm")
    )
    # suffix L2^2 from each token's position (desc weight, token
    # tie-break): head = rows whose suffix still reaches the threshold.
    # Compared on RAW weights (sfx >= t^2 * total <=> unit-space
    # rev_cum >= t^2), so no per-token normalization join is needed —
    # one shuffle+sort produces both window sums.
    w2 = F.col(weight_col) * F.col(weight_col)
    w_suffix = (
        Window.partitionBy(*ids)
        .orderBy(F.col(weight_col).desc(), F.col(token_col).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_all = Window.partitionBy(*ids)
    flagged = wt.withColumn("__sfx", F.sum(w2).over(w_suffix)).withColumn(
        "__tot", F.sum(w2).over(w_all)
    )
    heavy = flagged.filter(
        F.col("__sfx") >= threshold * threshold * F.col("__tot")
    )

    a_all = wt.select(
        F.col(id_col).alias("a_id"),
        *[F.col(c) for c in blocks],
        F.col(token_col).alias("t"),
        F.col(weight_col).alias("wa"),
    )
    b_all = wt.select(
        F.col(id_col).alias("b_id"),
        *[F.col(c) for c in blocks],
        F.col(token_col).alias("t"),
        F.col(weight_col).alias("wb"),
    )
    h = heavy.select(
        F.col(id_col).alias("h_id"),
        *[F.col(c) for c in blocks],
        F.col(token_col).alias("t"),
    )
    # heavy side in either role: a collision with x heavy OR y heavy
    # covers every qualifying pair (bound above); normalize to a<b
    cand = (
        h.join(b_all.select("b_id", *blocks, "t"), [*blocks, "t"])
        .filter(F.col("h_id") != F.col("b_id"))
        .select(
            F.least("h_id", "b_id").alias("a_id"),
            F.greatest("h_id", "b_id").alias("b_id"),
            *blocks,
        )
        .distinct()
    )
    # exact dot over shared tokens, restricted to candidates
    dots = (
        cand.join(a_all, ["a_id", *blocks])
        .join(b_all, ["b_id", *blocks, "t"])
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dp"))
    )
    na = nrm.select(F.col(id_col).alias("a_id"), F.col("nrm").alias("nrm_a"))
    nb = nrm.select(F.col(id_col).alias("b_id"), F.col("nrm").alias("nrm_b"))
    return (
        dots.join(na, "a_id")
        .join(nb, "b_id")
        .filter(F.col("dp") / (F.col("nrm_a") * F.col("nrm_b")) >= threshold)
    )


def build_tfidf_index(
    wt: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    token_col: str = "t",
    weight_col: str = "wt",
    block_cols: Sequence[str] = (),
) -> None:
    """Persist a TF-IDF matching index — the build-once/query-many
    serving shape of op22 (text sibling of vectors.build_ivf_index;
    reference analog: the incremental "match new rows against the
    loaded corpus" flow around entity_matching_tfidf.py:121-140).

    Three relations land under ``path``:
      wt/     (id, [blocks...], token, weight) — the inverted index
      norms/  (id, nrm) — corpus-side L2 norms
      df/     (token, df) — document frequencies, so query batches are
              weighted with the SAME idf the corpus was built with
              (tokens unseen at build time are dropped on both sides,
              matching a fixed-vocabulary vectorizer).

    wt/ is laid out hive-partitioned-free but sorted by token within
    files so token-range row-group skipping applies; at cluster scale
    register it as a token-bucketed table (partitioning.write_bucketed)
    and the query join reads shuffle-free on the index side.
    """
    blocks = list(block_cols)
    wt_out = wt.select(
        F.col(id_col).alias("id"), *blocks,
        F.col(token_col).alias("token"), F.col(weight_col).alias("weight"),
    )
    wt_out.repartition("token").sortWithinPartitions("token").write.mode(
        "overwrite"
    ).parquet(f"{path}/wt")
    nrm = wt_out.groupBy("id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("nrm")
    )
    nrm.write.mode("overwrite").parquet(f"{path}/norms")
    df_rel = wt_out.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    df_rel.write.mode("overwrite").parquet(f"{path}/df")


def tfidf_index_topk(
    query_terms: DataFrame,
    path: str,
    *,
    query_id: str = "q_id",
    token_col: str = "t",
    tf_col: str = "tf",
    block_cols: Sequence[str] = (),
    threshold: float = 0.0,
    k: int = 1,
) -> DataFrame:
    """Match a batch of NEW documents against a build_tfidf_index store
    without touching the corpus text: weight the batch's term counts
    with the STORED document frequencies, inverted-index join on
    (blocks, token), exact cosine, per-query top-k.

    Returns (q_id, doc_id, cosine, rank). Scale shape: the query batch
    is typically small (a daily increment) — its weighted terms hash
    to the index's token partitioning, the dot-product groupBy touches
    only co-token pairs, and norms join at id granularity. Unseen
    tokens drop out (fixed-vocabulary semantics), so query norms use
    indexed tokens only — cosine is computed in the index's space.
    """
    spark = query_terms.sparkSession
    blocks = list(block_cols)
    wt_idx = spark.read.parquet(f"{path}/wt")
    nrm_idx = spark.read.parquet(f"{path}/norms")
    df_rel = spark.read.parquet(f"{path}/df")

    q = (
        query_terms.select(
            F.col(query_id).alias("q_id"), *blocks,
            F.col(token_col).alias("token"), F.col(tf_col).cast("double").alias("tf"),
        )
        .join(df_rel, "token")  # unseen tokens drop here
        .select(
            "q_id", *blocks, "token",
            (F.col("tf") * (F.lit(1.0) / F.col("df"))).alias("q_weight"),
        )
    )
    q_nrm = q.groupBy("q_id").agg(
        F.sqrt(F.sum(F.col("q_weight") * F.col("q_weight"))).alias("q_nrm")
    )
    dots = (
        q.join(wt_idx, on=["token", *blocks])
        .groupBy("q_id", "id")
        .agg(F.sum(F.col("q_weight") * F.col("weight")).alias("dp"))
    )
    scored = (
        dots.join(q_nrm, "q_id")
        .join(nrm_idx, "id")
        .select(
            "q_id",
            F.col("id").alias("doc_id"),
            (F.col("dp") / (F.col("q_nrm") * F.col("nrm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    from firmable_aus_etl_spark.operators.windows import topk_per_group

    return topk_per_group(
        scored,
        ["q_id"],
        [F.col("cosine").desc(), F.col("doc_id").asc()],
        k=k,
        keep_rank=True,
        rank_col="rank",
    )
