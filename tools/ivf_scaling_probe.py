"""IVF deep-scale: validate the corollary-#8 law cheaply, then retire
(round-8 verdict Next #5).

SCALING.md round-8b corollary #8 states fixed-k IVF's candidate mass is
nprobe/k_cells of the corpus per query (quadratic overall when queries
scale with the corpus), and that the occupancy fix is k_cells ∝ n. This
probe measures the OTHER half of that trade, which is what makes flat
IVF structurally non-viable at deep scale: assignment (and k-means
training) cost Θ(n · k_cells) dot products, so holding occupancy
constant (k ∝ n) makes the assignment stage itself Θ(n²) — there is no
(k, nprobe) setting of single-level IVF in which BOTH the candidate
mass and the assignment stay sub-quadratic at constant occupancy.
(Real systems escape via hierarchy — IVF-over-IVF / HNSW-assigned
centroids — which is out of scope; the engine's measured deep-scale ANN
route is the occupancy-sized multi-probe LSH, syn10 tail 0.66, whose
signature cost is n · n_planes with n_planes ~ log n.)

Method: time the k∝n-scaled IVF (train via kmeans_centroids + query
via ivf_topk) across syn0.1 / syn0.3 / syn1 (2k/6k/20k vectors,
k = max(4, n/512) cells) — one in-JVM decade, minutes not hours — and
fit alpha for t ~ n^alpha. The law predicts alpha -> ~2 (n · k with
k ∝ n); measuring it at the small decade validates the structural
claim without burning a syn10 hour on a disclosed cliff. The fixed
k=16 contrast row shows assignment staying ~linear while candidates
go quadratic — the two failure modes bracket flat IVF.

Usage: python tools/ivf_scaling_probe.py [runs]   (default min-of-2)
Writes one JSON line; record lands in SCALING_r9.json / SCALING.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firmable_aus_etl_spark.functions import vectors as V  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

SCALES = [
    ("syn0.1", "/tmp/scaledata/sf0.1", 0.1),
    ("syn0.3", "/tmp/scaledata/sf0.3", 0.3),
    ("syn1", "/tmp/scaledata/sf1", 1.0),
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_session("ivf-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict = {"scaled_k": {}, "fixed_k16": {}, "k_cells": {}, "n": {}}
    for label, sf_dir, _sf in SCALES:
        if not os.path.isdir(sf_dir):
            print(f"SKIP {label}: {sf_dir} missing", file=sys.stderr)
            continue
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        queries = emb.filter(F.col("vec_id") % 10 == 0)
        k_cells = max(4, n // 512)
        rec["n"][label] = n
        rec["k_cells"][label] = k_cells

        def timed(n_cells: int, train: bool) -> float:
            best = math.inf
            for _ in range(runs):
                t0 = time.time()
                cents = (
                    V.kmeans_centroids(emb, dim=64, k=n_cells, iters=3)
                    if train
                    else None
                )
                V.ivf_topk(
                    queries, emb, dim=64, k=3, n_cells=n_cells,
                    nprobe=4, centroids=cents,
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            return round(best, 3)

        rec["scaled_k"][label] = timed(k_cells, train=True)
        rec["fixed_k16"][label] = timed(16, train=False)
        print(
            f"  {label:8s} n={n:6d} k={k_cells:3d} "
            f"scaled={rec['scaled_k'][label]:7.3f}s "
            f"fixed16={rec['fixed_k16'][label]:7.3f}s",
            file=sys.stderr,
        )

    def fit(series: dict[str, float]) -> float | None:
        pts = [
            (math.log(rec["n"][lb]), math.log(t))
            for lb, t in series.items()
            if lb in rec["n"] and t > 0
        ]
        if len(pts) < 2:
            return None
        mx = sum(x for x, _ in pts) / len(pts)
        my = sum(y for _, y in pts) / len(pts)
        num = sum((x - mx) * (y - my) for x, y in pts)
        den = sum((x - mx) ** 2 for x, _ in pts)
        return round(num / den, 3) if den else None

    rec["alpha_scaled_k"] = fit(rec["scaled_k"])
    rec["alpha_fixed_k16"] = fit(rec["fixed_k16"])
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
