"""Assemble SCALING_r8.json from the round-8 measurement passes.

Three runs feed the record (see NOTES_r8 for the incident):

1. the full first pass (/tmp/scaling_r8_mainrun.out) — its syn-scale
   blocks were POLLUTED by concurrent verify/pytest JVMs (builder
   error, disclosed), but its ZIPF block ran on an idle box;
2. the clean syn re-run (/tmp/scaling_r8_syn.out) — real0.1 + syn0.1
   ... syn3 for the full QUERY_SET including tfidf_cosine_routed, no
   concurrent work;
3. the zipf routed patch (/tmp/scaling_r8_zipfrouted.out) —
   tfidf_cosine_routed at the zipf scales.

Merged rule: syn family from (2); zipf family from (1) + routed rows
from (3); tfidf dispatch decisions unioned. Alphas are recomputed by
the harness inside each pass, so they are taken from the pass that
owns the rows.

Usage: python scripts/merge_scaling_r8.py > SCALING_r8.json
"""

from __future__ import annotations

import json


def last_json(path: str) -> dict:
    return json.loads(open(path).read().strip().split("\n")[-1])


def main() -> None:
    mainrun = last_json("/tmp/scaling_r8_mainrun.out")
    syn = last_json("/tmp/scaling_r8_syn.out")
    zipf_routed = last_json("/tmp/scaling_r8_zipfrouted.out")

    zipf = dict(mainrun["zipf"])
    zipf.update(zipf_routed["zipf"])  # adds tfidf_cosine_routed rows

    decisions = dict(mainrun["tfidf_decisions"])
    decisions.update(syn["tfidf_decisions"])
    decisions.update(zipf_routed["tfidf_decisions"])

    out = {
        "runs": syn["runs"],
        "runs_once_at": syn["runs_once_at"],
        "note": (
            "round-8: syn family re-measured on an idle box after the "
            "first pass's syn blocks were polluted by concurrent "
            "verify/pytest JVMs (first pass kept for its clean zipf "
            "block; polluted pass preserved in git history only as "
            "this note). tfidf_cosine_routed routes EXACT at "
            "real0.1/syn0.1 (<=1024 cand/doc) and LSH above — its "
            "curve bends where the route flips. The uniform-vocab "
            "fixture is adversarial for EVERY similarity method at "
            "syn3 (true pair density itself grows ~n^2 when all docs "
            "share one 30-word vocabulary), so even the LSH route's "
            "candidates are output-bound there; the zipf corpus is "
            "where routes separate (content df = O(1), boilerplate "
            "df = 0.3n): exact cosine 8.2 -> 52.6 s for 3x data vs "
            "simhash 3.3 -> 12.1 s, and the routed query follows the "
            "winning branch at every scale."
        ),
        "results": syn["results"],
        "zipf": zipf,
        "tfidf_decisions": decisions,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
