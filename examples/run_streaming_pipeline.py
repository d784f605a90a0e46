"""Streaming-pipeline demo: the engine's incremental surface driven
end-to-end over a simulated arrival sequence.

    batch 1..3 of documents  -> incremental near-dup ingest
                                (survivor corpus + all-seen signatures)
    batch 1..3 of events     -> replay-idempotent materialized aggregate
                                (per user/event_type count+sum view)
                             -> Misra-Gries heavy hitters
                                (bounded-state top event types)
    batch 1..3 of embeddings -> incremental vector dedup: batches 2-3
                                are contaminated with int8-round-tripped
                                re-encodes of earlier vectors, which the
                                sign-LSH store + cosine verify drops

Every stage is a tested operator from the library; arrival batching is
simulated with a file-source stream (maxFilesPerTrigger=1) exactly as
the tests do. The same program runs against a Kafka source by swapping
readStream options.

    python examples/run_streaming_pipeline.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from firmable_aus_etl_spark.datasets import load_table
from firmable_aus_etl_spark.session import get_session
from firmable_aus_etl_spark.streaming import (
    incremental_agg_stream,
    ingest_embeddings_stream,
    ingest_stream,
    read_agg_view,
    read_vector_corpus,
    streaming_heavy_hitters,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="stream_demo_")
    spark = get_session("streaming-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(work, ignore_errors=True)

    # --- simulate arrivals: three timestamped file drops per source ---
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    doc_rows, ev_rows, emb_rows = docs.collect(), ev.collect(), emb.collect()
    for i in range(3):
        spark.createDataFrame(
            doc_rows[i::3], docs.schema
        ).coalesce(1).write.mode("append").parquet(f"{work}/docs_in")
        spark.createDataFrame(
            ev_rows[i::3], ev.schema
        ).coalesce(1).write.mode("append").parquet(f"{work}/events_in")
        import math

        def _requant(v):
            scale = max(abs(x) for x in v) / 127.0
            return [math.floor(x / scale + 0.5) * scale for x in v]

        chunk = [(r.vec_id, list(r.embedding)) for r in emb_rows[i::3]]
        if i > 0:  # re-encoded copies of the PREVIOUS batch's vectors
            chunk += [
                (vid + 100000, _requant(v))
                for vid, v in ((r.vec_id, list(r.embedding))
                               for r in emb_rows[i - 1 :: 3])
            ]
        spark.createDataFrame(
            chunk, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("append").parquet(f"{work}/emb_in")
        time.sleep(1.1)  # file source orders micro-batches by mod time

    # --- incremental near-dup ingest over the document arrivals ---
    doc_stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/docs_in")
    )
    q1 = ingest_stream(
        doc_stream, f"{work}/corpus_state",
        checkpoint=f"{work}/ckpt_ingest", threshold=0.5,
    )

    # --- materialized per-user aggregate over the event arrivals ---
    ev_stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/events_in")
    )
    q2 = incremental_agg_stream(
        ev_stream, f"{work}/agg_state",
        keys=["user_id", "event_type"], value_col="value",
        checkpoint=f"{work}/ckpt_agg",
    )

    # --- incremental vector dedup over the embedding arrivals ---
    emb_stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/emb_in")
    )
    q4 = ingest_embeddings_stream(
        emb_stream, f"{work}/vec_state",
        checkpoint=f"{work}/ckpt_vec", dim=64, threshold=0.99,
    )

    # --- bounded-state heavy hitters over the same event stream ---
    hh = streaming_heavy_hitters(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/events_in"),
        "event_type",
        capacity=8,
        shards=2,
    )
    q3 = (
        hh.writeStream.format("memory").queryName("demo_hh")
        .outputMode("update").trigger(availableNow=True).start()
    )

    for q in (q1, q2, q3, q4):
        q.awaitTermination(180)

    n_seen = spark.read.parquet(f"{work}/corpus_state/sig_store").select(
        "doc_id"
    ).distinct().count()
    n_kept = spark.read.parquet(f"{work}/corpus_state/corpus").count()
    print("=== incremental ingest ===")
    print(f"docs seen:      {n_seen}")
    print(f"survivors kept: {n_kept}  (near-dups dropped: {n_seen - n_kept})")

    view = read_agg_view(spark, f"{work}/agg_state")
    batch_truth = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt"), F.sum("value").alias("total")
    )

    # compare at 6 decimals: double sums accumulate in different
    # orders between the incremental merge and the one-shot groupBy
    def normal(df):
        return {
            (r.user_id, r.event_type): (r.cnt, round(r.total, 6))
            for r in df.collect()
        }

    match = normal(view) == normal(batch_truth)
    print("=== materialized aggregate view ===")
    print(f"keys maintained: {view.count()}; equals batch recompute: {match}")

    v_seen = spark.read.parquet(f"{work}/vec_state/vec_sigs").select(
        "vec_id"
    ).distinct().count()
    v_kept = read_vector_corpus(spark, f"{work}/vec_state").count()
    print("=== incremental vector dedup ===")
    print(f"vectors seen:   {v_seen}")
    print(f"survivors kept: {v_kept}  (near-dups dropped: {v_seen - v_kept})")

    # --- TRUE streaming near-dup candidates (round 5): the stateful
    # MinHash-LSH operator over the same doc drops — pairs emit the
    # moment the colliding doc arrives, and the cumulative set equals
    # the batch candidate set
    from firmable_aus_etl_spark.streaming.stateful import (
        streaming_near_dup_candidates,
    )

    nd_stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/docs_in")
    )
    q = (
        streaming_near_dup_candidates(nd_stream, num_hashes=32, bands=16)
        .writeStream.format("memory").queryName("demo_nd_pairs")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    n_pairs = spark.sql(
        "SELECT count(DISTINCT a_id, b_id) AS n FROM demo_nd_pairs"
    ).collect()[0].n
    from firmable_aus_etl_spark.operators.dedup import minhash_lsh_pairs

    n_batch = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=32, bands=16).count()
    print("=== streaming near-dup candidates ===")
    print(f"streamed candidate pairs: {n_pairs}; batch twin: {n_batch}; "
          f"equal: {n_pairs == n_batch}")

    print("=== streaming heavy hitters (final summaries) ===")
    spark.sql(
        """
        select item, sum(est_count) est from demo_hh h
        where shard_total = (select max(shard_total) from demo_hh
                             where shard = h.shard)
        group by item order by est desc
        """
    ).show()
    print(f"work dir: {work}")


if __name__ == "__main__":
    main()
