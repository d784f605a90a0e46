"""Mechanism probe for the tau-routed arm's decade-3 tail (round-10:
zipf30 345 s vs zipf10 65 s, tail 1.52 — the capped-amplification
banding holds c=24 at both scales and w only grows 15 -> 17, so the
signature law alone predicts ~1.1; this probe splits the pipeline to
find where the excess lives).

Per corpus: n, (w, c) as the router sizes them, banded candidate-pair
count, verified-output row count, and the wall time of (a) candidates
only and (b) the full pipeline — candidate mass vs verify mass
separates "the banding emits superlinearly more pairs" from "the
verify join pays more per pair".

Usage: python tools/tau_depth_probe.py [zipf_dirs...]
Prints one JSON line for SCALING_r10.json.
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
    _TAU_CHUNK_BUDGET,
    _cosine_verify_top1,
    _tfidf_portable_weight_frame,
)
from firmable_aus_etl_spark.session import get_session  # noqa: E402

DEFAULT = ["/tmp/zipfdocs/sf10", "/tmp/zipfdocs/sf30"]


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT
    spark = get_session("tau-depth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for d in dirs:
        if not os.path.isdir(d):
            print(f"SKIP {d}", file=sys.stderr)
            continue
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n = docs.count()
        w, c = auto_simhash_bands(
            n, design_cosine=0.7, max_chunks=_TAU_CHUNK_BUDGET
        )
        wt = _tfidf_portable_weight_frame(spark, d)
        cand = weighted_simhash_candidates(
            wt, id_col="doc_id", token_col="t", weight_col="wi",
            block_cols=["source", "lang"], width=w, chunks=c,
        )
        t0 = time.monotonic()
        n_cand = cand.count()
        t_cand = time.monotonic() - t0
        t0 = time.monotonic()
        n_rows = _cosine_verify_top1(wt, cand, cand_has_blocks=True).count()
        t_full = time.monotonic() - t0
        out[d] = {
            "n_docs": n,
            "w": w,
            "c": c,
            "candidates": n_cand,
            "t_candidates_s": round(t_cand, 2),
            "rows": n_rows,
            "t_full_s": round(t_full, 2),
            "cand_per_doc": round(n_cand / max(1, n), 2),
        }
        print(d, out[d], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
