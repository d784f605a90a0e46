"""Measured cost-crossover probe for the simhash banding sizing rule
(round-10 verdict Next #2).

Round-9 disclosed the mid-scale constant: the occupancy rule sizes
width from the GLOBAL doc count, but candidate buckets live inside
(source, lang) blocks — the true bucket population is the largest
block (~2.1% of n on the zipf corpus), so the global rule overshoots
width by ~log2(n / max_block) bits and pays the chunk-amplification
premium for occupancy that was never going to materialize (140 planes
at zipf3 where fixed-32 ran 26% faster).

This probe times the full simhash pipeline (signatures -> banded
candidates -> exact verify -> top-1, identical to
tfidf_cosine_simhash_top1) at EXPLICIT (width, chunks) configs on the
zipf corpora:

  * global  — auto_simhash_bands(n_total): the round-9 rule
  * block   — auto_simhash_bands(max block count): the round-10
              candidate rule (occupancy measured where buckets live)
  * fixed   — the retired 4x8 constant banding (zipf3's winner, the
              round-8 cliff at zipf10) as the mid-scale floor

Output: one JSON line per (scale, config) with wall seconds (min of
RUNS), plane count, candidate-pair count, and result rows — the
evidence the sizing-rule change cites.

Usage: python tools/simhash_crossover_probe.py [runs] [--scales=zipf1,zipf3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firmable_aus_etl_spark.operators.cosine_join import (  # noqa: E402
    auto_simhash_bands,
    weighted_simhash_candidates,
)
from firmable_aus_etl_spark.queries.llm_text import (  # noqa: E402
    _cosine_verify_top1,
    _tfidf_portable_weight_frame,
)
from firmable_aus_etl_spark.session import get_session  # noqa: E402

SCALES = {
    "zipf0.3": "/tmp/zipfdocs/sf0.3",
    "zipf1": "/tmp/zipfdocs/sf1",
    "zipf3": "/tmp/zipfdocs/sf3",
    "zipf10": "/tmp/zipfdocs/sf10",
    "zipf30": "/tmp/zipfdocs/sf30",
}


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            only = a.split("=", 1)[1].split(",")
    spark = get_session("simhash-crossover-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for label, d in SCALES.items():
        if only and label not in only:
            continue
        if not os.path.isdir(d):
            print(f"## {label}: missing {d}, skipped", file=sys.stderr)
            continue
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n = docs.count()
        max_block = (
            docs.groupBy("source", "lang").count().agg({"count": "max"})
        ).collect()[0][0]
        configs = {
            "global": auto_simhash_bands(n),
            "block": auto_simhash_bands(max_block),
            "fixed": (8, 4),
        }
        out[label] = {"n": n, "max_block": max_block, "configs": {}}
        for cname, (w, c) in configs.items():
            wt = _tfidf_portable_weight_frame(spark, d)
            cand = weighted_simhash_candidates(
                wt,
                id_col="doc_id",
                token_col="t",
                weight_col="wi",
                block_cols=["source", "lang"],
                width=w,
                chunks=c,
            )
            times = []
            rows = cands = None
            for r in range(runs):
                t0 = time.monotonic()
                res = _cosine_verify_top1(wt, cand, cand_has_blocks=True)
                rows = res.count()
                times.append(time.monotonic() - t0)
            cands = cand.count()
            rec = {
                "w": w,
                "c": c,
                "planes": w * c,
                "t_s": round(min(times), 3),
                "candidates": cands,
                "rows": rows,
            }
            out[label]["configs"][cname] = rec
            print(
                f"## {label} {cname}: w={w} c={c} planes={w*c} "
                f"t={min(times):.2f}s cand={cands} rows={rows}",
                file=sys.stderr,
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
