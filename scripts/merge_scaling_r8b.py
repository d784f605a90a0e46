"""Assemble SCALING_r8b.json: the round-8 record (SCALING_r8.json)
extended with the round-8b second-decade points.

Inputs (idle-box passes, run in sequence — no concurrent JVMs):

1. /tmp/scaling_r8b_syn10.out  — syn10 (sf10 = 100x the smallest syn
   point) for SYN10_SET: the designated sub-linear routes only;
2. /tmp/scaling_r8b_zipf10.out — zipf10 for ZIPF10_SET: the scale
   routes on the realistic corpus shape;
3. /tmp/scaling_r8b_bm25.out   — the new bm25_search_top10 at every
   pre-existing scale (it was added to the registry in round 8b);
4. /tmp/scaling_r8b_lsh16.out  — lsh_multiprobe_ann_top3 at syn10
   RE-MEASURED after the max_planes clamp was raised 12 -> 16 (the
   first syn10 pass caught the 12-plane clamp saturating: occupancy
   ~122 vs target 16, 287.7 s — that number is preserved in the note
   below as the counterfactual; this pass's row replaces it);
5. /tmp/scaling_r8b_sketches.out — the round-8b sketch family
   (bloom decontamination, count-min, portable HLL) across the full
   syn decade pair;
6. /tmp/scaling_r8b_nb.out — the trained NB confusion query across
   the same scales.

Merge rule: start from SCALING_r8.json rows verbatim (those points
were measured on the SAME box this round — the corpora are
regenerated deterministically); overlay the new per-scale times; then
RE-FIT alpha per query over the union of its syn (resp. zipf) points
with the harness's least-squares-on-logs rule, and recompute the tail
slope over the last two points of each curve.

Usage: python scripts/merge_scaling_r8b.py > SCALING_r8b.json
"""

from __future__ import annotations

import json
import math

SYN_SF = {"syn0.1": 0.1, "syn0.3": 0.3, "syn1": 1.0, "syn3": 3.0, "syn10": 10.0}
ZIPF_SF = {
    "zipf0.1": 0.1,
    "zipf0.3": 0.3,
    "zipf1": 1.0,
    "zipf3": 3.0,
    "zipf10": 10.0,
}


def last_json(path: str) -> dict:
    return json.loads(open(path).read().strip().split("\n")[-1])


def fit(rows: dict, sf_map: dict) -> float | None:
    pts = [
        (math.log(sf_map[lbl]), math.log(max(t, 1e-3)))
        for lbl, t in rows.items()
        if lbl in sf_map
    ]
    if len(pts) < 2:
        return None
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    denom = sum((x - mx) ** 2 for x, _ in pts)
    return round(sum((x - mx) * (y - my) for x, y in pts) / denom, 3)


def tail(rows: dict, sf_map: dict) -> float | None:
    pts = sorted(
        (sf_map[lbl], max(t, 1e-3))
        for lbl, t in rows.items()
        if lbl in sf_map
    )
    if len(pts) < 2:
        return None
    (x0, y0), (x1, y1) = pts[-2], pts[-1]
    return round(math.log(y1 / y0) / math.log(x1 / x0), 3)


def overlay(base: dict, extra: dict, sf_map: dict) -> dict:
    out = {}
    names = set(base) | set(extra)
    for name in names:
        rows = {
            k: v
            for k, v in {**base.get(name, {}), **extra.get(name, {})}.items()
            if k != "alpha"
        }
        rec = dict(rows)
        rec["alpha"] = fit(rows, sf_map)
        t = tail(rows, sf_map)
        if t is not None:
            rec["tail"] = t
        out[name] = rec
    return out


def main() -> None:
    r8 = json.load(open("SCALING_r8.json"))
    syn10 = last_json("/tmp/scaling_r8b_syn10.out")
    zipf10 = last_json("/tmp/scaling_r8b_zipf10.out")
    bm25 = last_json("/tmp/scaling_r8b_bm25.out")
    lsh16 = last_json("/tmp/scaling_r8b_lsh16.out")
    sketches = last_json("/tmp/scaling_r8b_sketches.out")
    nb = last_json("/tmp/scaling_r8b_nb.out")

    syn_extra: dict = {}
    for src in (syn10, bm25, lsh16, sketches, nb):
        for name, rows in src.get("results", {}).items():
            syn_extra.setdefault(name, {}).update(
                {k: v for k, v in rows.items() if k != "alpha"}
            )
    zipf_extra: dict = {}
    for src in (zipf10, bm25):
        for name, rows in src.get("zipf", {}).items():
            zipf_extra.setdefault(name, {}).update(
                {k: v for k, v in rows.items() if k != "alpha"}
            )

    decisions = dict(r8.get("tfidf_decisions", {}))
    for src in (syn10, zipf10, bm25):
        decisions.update(src.get("tfidf_decisions", {}))

    print(
        json.dumps(
            {
                "runs": 3,
                "note": (
                    "round-8b: second-decade extension. syn10/zipf10 = 100x "
                    "the smallest synthetic point, designated scale routes "
                    "only (the exact-join family's quadratic walls are "
                    "measured through syn3/zipf3 in SCALING_r8.json and "
                    "excluded by design — a sf10 point would re-prove a "
                    "disclosed cliff for ~an hour). Base rows carried from "
                    "SCALING_r8.json (same box, deterministic regenerated "
                    "corpora); alphas re-fit over the union; 'tail' = slope "
                    "over each curve's last two points. Two findings the "
                    "second decade surfaced: (1) lsh_multiprobe_ann_top3's "
                    "oracle-motivated max_planes=12 clamp SATURATED at "
                    "syn10 (occupancy ~122 vs target 16 -> 287.7 s, tail "
                    "2.5); raised to 16 and re-measured — the recorded row "
                    "is the 16-plane run. (2) tfidf_cosine_simhash_top1's "
                    "fixed 4x8-bit banding is a constant-factor (2^8 per "
                    "band) candidate reducer, not asymptotic: zipf10 tail "
                    "1.87. Disclosed in SCALING.md round-8b with the "
                    "parameter law and the deep-scale routing consequence."
                ),
                "results": overlay(
                    r8.get("results", {}), syn_extra, SYN_SF
                ),
                "zipf": overlay(r8.get("zipf", {}), zipf_extra, ZIPF_SF),
                "tfidf_decisions": decisions,
            }
        )
    )


if __name__ == "__main__":
    main()
