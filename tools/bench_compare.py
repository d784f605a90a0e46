"""Engine-vs-engine timing: the same query executed by this engine
(Spark, local[32]) and by DuckDB running the oracle SQL, at sf0.1.

DuckDB is an aggressively optimized single-node OLAP engine — a strong
stand-in for "the reference's single-node throughput ceiling". Spark
carries JVM/task overheads at this tiny scale and wins by scaling out;
the point of this table is honesty about the crossover, not a victory
lap. Writes BENCH_COMPARE.md.

Usage: python tools/bench_compare.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from firmable_aus_etl_spark.datasets import TABLE_NAMES  # noqa: E402
from firmable_aus_etl_spark.queries import ORACLE, QUERIES  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

COMPARE = [
    "pricing_summary",
    "revenue_by_nation",
    "similarity_join_blocked_top1",
    "topk_lineitems_per_order",
    "merge_upsert_orders",
    "events_json_agg",
    "tumbling_window_events",
    "sessionize_events",
    "quality_score_documents",
    "fingerprint_documents",
    "tfidf_cosine_top1",
    "ngram_jaccard_near_dups",
    "ngram_jaccard_prefix_near_dups",
    "ann_cosine_top3_per_label",
    "moving_avg_order_totals",
    "pivot_event_counts",
    "asof_error_last_purchase",
    "errors_within_hour_after_purchase",
    "time_rollup_events",
    "doc_chunks_overlap",
    "interval_islands_events",
    "forward_fill_events",
    "zscore_order_value",
    "feature_hash_documents",
    "loo_avg_order_value",
    "quantize_embeddings_int8",
    "tfidf_cosine_top1_blocked",
    "near_dup_clusters",
    "near_dup_clusters_star",
    "decontaminate_documents",
    "remove_repeated_segments",
    "remove_repeated_spans",
    "doc_bigram_perplexity",
    "embedding_cosine_near_dups",
    "suppliers_kept_waiting",
    "shipping_priority_top10",
    "product_profit_by_nation_year",
    "custdist_order_counts",
    "forecast_revenue_change",
    "min_cost_supplier_per_part",
    "excess_volume_suppliers",
    "semantic_dedup_cell_blocked",
    "gopher_rules_documents",
    "overlapping_activity_windows",
    "interpolate_daily_revenue",
    "minhash_jaccard_estimates",
    "user_event_profiles",
    "copurchase_graph_summary",
    "bigram_pmi_documents",
    "weighted_sample_documents",
    "hourly_event_anomalies",
    "customer_value_deciles",
    "golden_records_documents",
    "source_vocab_overlap",
    "k_anonymity_audit_customers",
    "reference_pipeline_matches",
    # round-7 headlines (verdict Wrong #2: regen on plan-affecting change)
    "similarity_join_salted_top1",
    "ngram_jaccard_pruned_near_dups",
    "minhash_dedup_clusters",
    "pack_chunks_512",
    # round-8: the designated cosine scale route
    "tfidf_cosine_simhash_top1",
    # round-9: tau-0.7 routing (exact branch on this corpus)
    "tfidf_cosine_tau_routed",
    # round-8: BM25 top-k retrieval serving join
    "bm25_search_top10",
    # round-8b: portable-HLL cardinality sketches
    "hll_distinct_tokens_by_source",
    "hll_distinct_bigrams_by_source",
    # round-8b: broadcast-bloom decontamination (scale twin of the
    # exact-join decontaminate)
    "bloom_decontaminate_documents",
    # round-8b: count-min frequency sketch
    "cms_gram_counts_top50",
    # round-8b: trained multinomial NB under the oracle gate
    "nb_language_confusion",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("bench_compare")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # warm both engines once
    QUERIES[COMPARE[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    con.execute(ORACLE[COMPARE[0]]).fetchall()

    lines = [
        "# BENCH_COMPARE — Spark engine vs DuckDB oracle, same query, same data\n",
        f"sf_dir: {sf_dir}; Spark local[32] noop sink vs DuckDB fetchall;",
        "min of 3 runs per engine (same methodology as bench.py — reads",
        "through codegen/JIT ramp and scheduler noise).",
        "Single-node comparison only — Spark's architecture pays fixed",
        "task/JVM overheads here and returns them as horizontal scaling;",
        "see PERF.md for the plan properties that carry to 100 TB.\n",
        "| query | spark_sec | duckdb_sec | ratio |",
        "|---|---|---|---|",
    ]
    for name in COMPARE:
        if name not in ORACLE:
            continue
        s_runs, d_runs = [], []
        for _ in range(3):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            s_runs.append(time.time() - t0)
            t0 = time.time()
            con.execute(ORACLE[name]).fetchall()
            d_runs.append(time.time() - t0)
        s, d = min(s_runs), min(d_runs)
        ratio = s / d if d > 0 else float("inf")
        lines.append(f"| {name} | {s:.2f} | {d:.2f} | {ratio:.1f}x |")
        print(f"{name}: spark={s:.2f}s duckdb={d:.2f}s")

    with open("/root/repo/BENCH_COMPARE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCH_COMPARE.md")


if __name__ == "__main__":
    main()
