"""Measured recall of the tau-router's capped-amplification banding
arm against exact ground truth (round-9; substantiates the disclosed
recall curve with numbers on the corpus shape the arm is routed for).

On zipf corpora small enough that the exact join is still feasible,
run BOTH:
  * truth  = q_tfidf_cosine_top1 (exact adaptive join, recall 1)
  * banded = the capped banding pipeline exactly as
    q_tfidf_cosine_tau_routed's second arm runs it
and report, at the output's own semantics (top-1 per a_id, cosine
>= 0.7):
  * coverage — fraction of truth a_ids that appear at all,
  * agreement — fraction whose top-1 b_id matches exactly,
  * coverage/agreement restricted to truth rows with cosine >= 0.9
    (where the amplification formula predicts high recall).

Usage: python tools/tau_recall_probe.py [zipf_dirs...]
Prints one JSON line; the record lands in SCALING_r9.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firmable_aus_etl_spark import queries as Q  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

DEFAULT_DIRS = ["/tmp/zipfdocs/sf0.3", "/tmp/zipfdocs/sf1"]


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT_DIRS
    spark = get_session("tau-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for sf_dir in dirs:
        if not os.path.isdir(sf_dir):
            print(f"SKIP {sf_dir}", file=sys.stderr)
            continue
        stats = Q._tfidf_route_stats(spark, sf_dir)
        routed_banded = (
            stats["cand_mass"] > Q._COSINE_ROUTE_CAP * stats["n_docs"]
        )
        truth = {
            r["a_id"]: (r["b_id"], r["cosine"])
            for r in Q.QUERIES["tfidf_cosine_top1"](spark, sf_dir).collect()
        }
        banded = {
            r["a_id"]: r["b_id"]
            for r in Q.QUERIES["tfidf_cosine_tau_routed"](
                spark, sf_dir
            ).collect()
        }
        hi = {a for a, (_b, c) in truth.items() if c >= 0.9}
        cov = sum(1 for a in truth if a in banded)
        agree = sum(1 for a, (b, _c) in truth.items() if banded.get(a) == b)
        cov_hi = sum(1 for a in hi if a in banded)
        agree_hi = sum(1 for a in hi if banded.get(a) == truth[a][0])
        out[sf_dir] = {
            "n_docs": stats["n_docs"],
            "routed_to_banded_arm": routed_banded,
            "truth_top1_rows": len(truth),
            "truth_rows_cos_ge_0.9": len(hi),
            "coverage": round(cov / max(1, len(truth)), 4),
            "top1_agreement": round(agree / max(1, len(truth)), 4),
            "coverage_cos_ge_0.9": round(cov_hi / max(1, len(hi)), 4),
            "top1_agreement_cos_ge_0.9": round(agree_hi / max(1, len(hi)), 4),
        }
        print(sf_dir, out[sf_dir], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
