"""A/B probe for the minhash auto-banding repair (round-10 decade-3
cliff: the dedup DAG's FIXED 2-row bands collide background pairs at
~E[J_bg^2], so candidate mass is Theta(n^2) and the syn30 tail hit
2.42; dedup.auto_minhash_bands sizes rows-per-band from log2(n)).

Cross-session before/after walls are NOT evidence (the round-10
crossover probe showed a 26% cross-session artifact on simhash), so
this probe runs both configurations PAIRED in one JVM, ABBA order,
min-of-2 per arm, at each given corpus dir:

  fixed : num_hashes=16, bands=8  (the pre-repair DAG constants)
  auto  : dedup.oracle_minhash_bands(n) (the shipped sizing rule)

Both arms run the full designated DAG (portable signatures -> banding
-> candidate join -> exact verify -> connected components), i.e. the
registered `minhash_dedup_clusters` shape. Candidate and verified-pair
counts are reported per arm: the arms are DIFFERENT recall points by
design (fixed r=2 recall at J=0.5 is 1-(1-0.25)^8 = 0.90; auto holds
~0.9 by construction), so wall alone would under-tell the story — the
candidate mass is the mechanism being sized away.

Usage: python tools/minhash_banding_ab_probe.py [sf_dirs...]
Prints one JSON line for SCALING_r10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firmable_aus_etl_spark.operators import dedup  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

DEFAULT = ["/tmp/scaledata/sf10", "/tmp/scaledata/sf30"]


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT
    spark = get_session("minhash-banding-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for d in dirs:
        pq = os.path.join(d, "documents.parquet")
        if not os.path.exists(pq):
            print(f"SKIP {d}", file=sys.stderr)
            continue
        docs = spark.read.parquet(pq)
        n = docs.count()
        arms = {
            "fixed": (2, 8),
            "auto": dedup.oracle_minhash_bands(n),
        }

        def run(arm: str) -> tuple[float, int]:
            rows, bands = arms[arm]
            t0 = time.monotonic()
            pairs = dedup.verified_near_dup_pairs(
                docs, "doc_id", "text",
                threshold=0.5, shingle_n=3,
                num_hashes=rows * bands, bands=bands, portable=True,
            )
            labels = dedup.connected_components(
                pairs.select("a_id", "b_id"),
                nodes=docs.select("doc_id"), node_id="doc_id",
            )
            n_rows = labels.count()
            return time.monotonic() - t0, n_rows

        # candidate mass per arm: ONE extra count each, outside the
        # timed walls — the mechanism evidence
        cand = {}
        for arm, (rows, bands) in arms.items():
            cand[arm] = dedup.minhash_lsh_pairs(
                docs, "doc_id", "text",
                num_hashes=rows * bands, bands=bands,
                shingle_n=3, portable=True,
            ).count()

        walls: dict[str, list[float]] = {"fixed": [], "auto": []}
        rows_out: dict[str, int] = {}
        for arm in ("fixed", "auto", "auto", "fixed"):  # ABBA
            w, nr = run(arm)
            walls[arm].append(w)
            rows_out[arm] = nr
            print(f"  {d} {arm}: {w:.1f}s labels={nr}", file=sys.stderr)
        out[d] = {
            "n_docs": n,
            "auto_rows_bands": list(arms["auto"]),
            "candidates": cand,
            "labels": rows_out,
            "fixed_s": round(min(walls["fixed"]), 2),
            "auto_s": round(min(walls["auto"]), 2),
            "fixed_runs": [round(w, 2) for w in walls["fixed"]],
            "auto_runs": [round(w, 2) for w in walls["auto"]],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
