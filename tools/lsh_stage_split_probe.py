"""Per-stage split of lsh_multiprobe_ann_top3's exact configuration —
round-10 verdict item 2: attribute the residual super-linear exponent
(payload and heap hypotheses both eliminated by earlier probes).

Stages, timed same-JVM with the noop sink, min-of-N each:
  corpus_sigs   — corpus plane dots + signatures (posexploded)
  query_probes  — query dots + sigs + PROBE RANKING (the 137-struct
                  array_sort suspect) + explode
  join_raw      — the (table, sig) equi-join, NO dedup
  pairs         — join + distinct (k=None registered shape)
  full          — the whole query (k=3: dedup + late fetch + score + topk)

Usage:
    python tools/lsh_stage_split_probe.py <sf_dir> [runs]
Prints one JSON line per stage plus a summary.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firmable_aus_etl_spark.functions import vectors as V  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_session("lsh-stage-split")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    corpus = emb.select("vec_id", "embedding")
    n = corpus.count()
    n_planes = V.auto_n_planes(n, target_occupancy=16, min_planes=6, max_planes=16)
    print(json.dumps({"n": n, "n_planes": n_planes}), flush=True)

    def run(stage: str | None, k):
        df = V.lsh_multiprobe_topk(
            queries, corpus, dim=64, query_id="vec_id", corpus_id="vec_id",
            vec_col="embedding", k=k, n_planes=n_planes, n_tables=6,
            probes=10, seed=42, _stage=stage,
        )
        ts = []
        for _ in range(runs):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 2))
        return ts

    out = {}
    for label, stage, k in [
        ("corpus_sigs", "corpus_sigs", 3),
        ("query_probes", "query_probes", 3),
        ("join_raw", "join_raw", 3),
        ("pairs", None, None),
        ("full", None, 3),
    ]:
        spark.sparkContext.setJobDescription(f"lsh-split: {label}")
        ts = run(stage, k)
        out[label] = ts
        print(json.dumps({label: ts, "min": min(ts)}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "stages_min": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
