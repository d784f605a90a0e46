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

    # 1. hygiene: redact PII, then strip cross-doc boilerplate SPANS
    #    (sliding 8-grams shared by >= 3 docs, caught at ANY offset) so
    #    the quality scores below judge real content, not site chrome —
    #    the C4 ordering
    redacted = docs.select(
        "doc_id", "source", "lang", T.redact_pii("text").alias("text")
    )
    despanned = redacted.drop("text").join(
        dedup.remove_repeated_spans(
            redacted, "doc_id", "text", n=8, min_docs=3
        ).select("doc_id", F.col("cleaned").alias("text"), "n_removed"),
        "doc_id",
    )

    # 1a. score quality/repetition, identify language (post-boilerplate)
    scored = despanned.select(
        "doc_id",
        "source",
        "lang",
        "text",
        "n_removed",
        T.quality_score("text").alias("quality"),
        T.dup_ngram_ratio("text", 2).alias("dup_ratio"),
        T.language_id("text").alias("lang_detected"),
        T.token_count("text").alias("n_tokens"),
    )

    # 1b. rule audit: the Gopher rule-set with per-rule reason flags —
    #     the "why would this doc be dropped" view a curation run keeps
    from firmable_aus_etl_spark.queries import QUERIES

    rules = QUERIES["gopher_rules_documents"](spark, sf_dir)
    rule_fails = rules.agg(
        *[
            F.sum((~F.col(c)).cast("long")).alias(c)
            for c in ("r_wordcount", "r_avg_word_len", "r_stopwords", "r_low_repetition")
        ],
        F.sum((~F.col("keep")).cast("long")).alias("dropped"),
    ).first()

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

    # 6. trainer-facing: chunk the clean corpus into 50-token windows
    #    (50% overlap), pack chunks into 512-token examples, and assign
    #    a leakage-proof hash split — all map-only or group-local
    from firmable_aus_etl_spark.operators.packing import pack_chunks

    toks = final.select("doc_id", F.split("text", " ").alias("toks"))
    chunks = (
        toks.select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), F.size("toks") - 1, F.lit(25))
            ).alias("start"),
        )
        .select(
            (F.col("doc_id") * 1000 + (F.col("start") / 25).cast("long")).alias(
                "chunk_id"
            ),
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("start") + 1, 50)).alias(
                "chunk_text"
            ),
            F.size(F.slice(F.col("toks"), F.col("start") + 1, 50)).alias("n_tokens"),
        )
    )
    packed = pack_chunks(
        chunks, id_col="chunk_id", tokens_col="n_tokens", budget=512, groups=16
    )
    bucket = F.conv(
        F.substring(F.md5((F.col("pack_group") * 1_000_000 + F.col("example_id")).cast("string")), 1, 2),
        16,
        10,
    ).cast("int")
    examples = packed.withColumn(
        "split",
        F.when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test"),
    )
    examples.write.mode("overwrite").parquet(f"{out_dir}/packed_examples")

    # 6b. train a BPE tokenizer on the CLEAN corpus (merges learned
    #     after dedup/filtering so boilerplate can't dominate pair
    #     counts) and persist merges + per-lang token budget
    from firmable_aus_etl_spark.operators.bpe import encode_bpe, train_bpe_merges

    merges = train_bpe_merges(final, n_merges=16)
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)], "rank int, a string, b string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/bpe_merges")
    enc = encode_bpe(final, merges)
    token_budget = (
        enc.join(
            final.select(F.col("doc_id").alias("__id"), "lang"), "__id"
        )
        .groupBy("lang")
        .agg(F.sum("n_tokens").cast("long").alias("total_tokens"))
    )
    token_budget.write.mode("overwrite").parquet(f"{out_dir}/token_budget")

    # 7. int8-quantize the surviving embeddings for serving
    scale = (
        V.linf_norm("embedding").cast("double") / 127.0
    )
    quant = surviving.select(
        "vec_id",
        scale.alias("scale"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") / F.col("scale") + 0.5).cast("int"),
        ).alias("q"),
    )
    quant.write.mode("overwrite").parquet(f"{out_dir}/embeddings_int8")

    n_kept, n_clean = kept.count(), final.count()
    n_chunks, n_examples = chunks.count(), examples.count()
    print("=== gopher rule audit (fail counts) ===")
    print({k: rule_fails[k] for k in rule_fails.asDict()})
    print("=== corpus funnel ===")
    print(f"ingested:          {n0}")
    print(f"after filters:     {n_kept}")
    print(f"after dedup:       {n_clean}")
    print(f"chunks:            {n_chunks}")
    print(f"packed examples:   {n_examples}")
    print("=== per-language survivors ===")
    final.groupBy("lang_detected").count().orderBy("lang_detected").show()
    print("=== split sizes ===")
    examples.groupBy("split").count().orderBy("split").show()
    print(f"ann neighbor rows: {neighbors.count()}")
    print(f"outputs written under {out_dir}")


if __name__ == "__main__":
    main()
