"""End-to-end LLM training-data pipeline demo over the testdata corpus:

    ingest -> PII redaction -> language ID + quality + repetition
    filters -> exact + near-duplicate dedup (MinHash-LSH + verified
    Jaccard) -> fingerprinted clean corpus -> parquet
    plus: embedding ANN neighbors for the surviving docs' vectors.

Every stage is a lazy DataFrame transform from the operator library —
one lineage, no driver-side loops; the same program scales from the
sf0.001 fixture here to a 100 TB corpus by partition count alone.

    python examples/run_llm_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from firmable_aus_etl_spark.datasets import load_table
from firmable_aus_etl_spark.functions import text as T
from firmable_aus_etl_spark.functions import vectors as V
from firmable_aus_etl_spark.operators import dedup
from firmable_aus_etl_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/llm_pipeline_demo"
    spark = get_session("llm-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. hygiene: redact PII, score quality/repetition, identify language
    scored = docs.select(
        "doc_id",
        "source",
        "lang",
        T.redact_pii("text").alias("text"),
        T.quality_score("text").alias("quality"),
        T.dup_ngram_ratio("text", 2).alias("dup_ratio"),
        T.language_id("text").alias("lang_detected"),
        T.token_count("text").alias("n_tokens"),
    )

    # 2. filter: keep identifiable-language, low-repetition, quality docs
    kept = scored.filter(
        (F.col("lang_detected") != "und")
        & (F.col("dup_ratio") < 0.8)
        & (F.col("quality") >= 0.25)
        & (F.col("n_tokens") >= 5)
    )

    # 3. exact dedup, then near-dup dedup: LSH candidates + verified
    #    Jaccard >= 0.5 -> connected components -> keep one
    #    representative (min doc_id) per transitive near-dup cluster
    exact = dedup.dedup_exact_text(kept, "text", "doc_id")
    near = dedup.verified_near_dup_pairs(exact, "doc_id", "text", threshold=0.5)
    clusters = dedup.connected_components(
        near.select("a_id", "b_id"),
        nodes=exact.select(F.col("doc_id")),
        node_id="doc_id",
    )
    reps = clusters.filter(F.col("doc_id") == F.col("cluster")).select("doc_id")
    clean = exact.join(reps, "doc_id", "left_semi")

    # 4. fingerprint the surviving corpus and write
    final = dedup.with_text_fingerprint(clean, "text")
    final.write.mode("overwrite").parquet(f"{out_dir}/clean_documents")

    # 5. ANN neighbors for surviving docs' embeddings (by matching ids)
    emb = load_table(spark, sf_dir, "embeddings")
    surviving = emb.join(
        final.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    queries = surviving.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id", "embedding"
    )
    neighbors = V.brute_force_topk(
        queries, surviving.select("vec_id", "embedding"), k=3
    )
    neighbors.write.mode("overwrite").parquet(f"{out_dir}/ann_neighbors")

    n_kept, n_clean = kept.count(), final.count()
    print("=== corpus funnel ===")
    print(f"ingested:          {n0}")
    print(f"after filters:     {n_kept}")
    print(f"after dedup:       {n_clean}")
    print("=== per-language survivors ===")
    final.groupBy("lang_detected").count().orderBy("lang_detected").show()
    print(f"ann neighbor rows: {neighbors.count()}")
    print(f"outputs written under {out_dir}")


if __name__ == "__main__":
    main()
