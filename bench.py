"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full computation, no driver
collect) so timings measure the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from firmable_aus_etl_spark.queries import QUERIES  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

# Headline set: one per operator family that matters at scale.
HEADLINE = [
    "pricing_summary",            # scan + group agg
    "revenue_by_nation",          # fact joins + broadcast dims
    "similarity_join_blocked_top1",  # blocked similarity join + window
    "topk_lineitems_per_order",   # window top-k
    "merge_upsert_orders",        # full-outer merge
    "dedup_documents_keyed",      # keyed dedup window
    "events_json_agg",            # JSON extraction + agg
    "argmax_order_per_customer",  # map-side argmax agg
    "tumbling_window_events",     # event-time window agg
    "minhash_verified_near_dups",  # near-dup scale path: LSH + verify
    "ann_cosine_top3_per_label",  # vector similarity top-k
    "tfidf_cosine_top1",          # sparse TF-IDF cosine join
    "quality_score_documents",    # text-quality scoring scan
    "ngram_jaccard_prefix_near_dups",  # exact set-similarity, prefix-filtered
    "asof_error_last_purchase",   # as-of join (union+window merge)
    "errors_within_hour_after_purchase",  # range join (binned equi-join)
    "time_rollup_events",         # multi-resolution rollup, one pass
    "doc_chunks_overlap",         # LLM chunking: sequence+explode+slice
    "interval_islands_events",    # gaps-and-islands window merge
    "near_dup_clusters",          # connected-components dedup clustering
    "decontaminate_documents",    # eval-set 8-gram overlap flagging
    "remove_repeated_segments",   # C4-style cross-doc segment removal
    "embedding_cosine_near_dups",  # LSH-banded vector dedup + verify
    "suppliers_kept_waiting",     # decorrelated EXISTS/NOT-EXISTS depth join
    "semantic_dedup_cell_blocked",  # cluster-blocked (SemDeDup) vector dedup
    "gopher_rules_documents",     # composed quality rule-set scan
    "overlapping_activity_windows",  # two-sided binned interval-overlap join
    "copurchase_graph_summary",   # triangle counting (oriented two-join)
    "bigram_pmi_documents",       # collocation PMI (corpus-total stats)
    "hourly_event_anomalies",     # trailing-window anomaly scoring
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]

    # Methodology: each query runs RUNS times; the headline number is
    # the per-query MIN (all runs reported alongside). The first one or
    # two executions of a plan in a fresh JVM are dominated by
    # whole-stage-codegen compilation + tiered JIT (measured: up to ~8x
    # steady state, and full ramp takes ~3 executions), a fixed cost
    # that vanishes on any long-lived cluster and says nothing about
    # plan efficiency at scale. Min-of-N is the standard way to read
    # through both that ramp and single-machine scheduling noise.
    runs_n = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    all_runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs_n):
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            all_runs[name].append(round(time.time() - t0, 3))

    timings = {name: min(r) for name, r in all_runs.items()}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "all_runs": all_runs,
                "methodology": f"each query executed {runs_n}x in one JVM; reported time is the min (codegen/JIT ramp and scheduler noise excluded); all runs disclosed",
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
