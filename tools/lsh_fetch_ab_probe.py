"""A/B probe for the multiprobe-LSH candidate-payload repair
(round-10 decade-3 cliff: syn30 tail 2.78 with the occupancy law
measured INTACT — sum occ^2 sub-linear — so the suspect was the
~1 KB/row vector payload riding the probe-exploded join and the
6-column distinct; tools/lsh_depth_probe.py carries that evidence).

Runs the EXACT registered-query configuration
(lsh_multiprobe_topk_auto, max_planes=16, 6 tables, 10 probes) twice
per corpus: fetch="early" (legacy: both 64-dim vectors carried
through the exploded join) vs fetch="late" (id-only join + distinct,
vectors fetched once per distinct candidate) — ABBA order within one
JVM, min-of-2 per arm, identical row counts asserted (the two plans
are results-identical by construction; this asserts it anyway).

Usage: python tools/lsh_fetch_ab_probe.py [syn_dirs...]
Prints one JSON line for SCALING_r10.json.
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

DEFAULT = ["/tmp/scaledata/sf10", "/tmp/scaledata/sf30"]


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT
    spark = get_session("lsh-fetch-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for d in dirs:
        pq = os.path.join(d, "embeddings.parquet")
        if not os.path.exists(pq):
            print(f"SKIP {d}", file=sys.stderr)
            continue
        emb = spark.read.parquet(pq)
        queries = emb.filter(F.col("vec_id") % 10 == 0).select(
            "vec_id", "embedding"
        )
        corpus = emb.select("vec_id", "embedding")

        def run(fetch: str) -> tuple[float, int]:
            t0 = time.monotonic()
            res = V.lsh_multiprobe_topk_auto(
                queries, corpus, dim=64, k=3, n_tables=6, probes=10,
                seed=42, max_planes=16, fetch=fetch,
            )
            n = res.count()
            return time.monotonic() - t0, n

        walls: dict[str, list[float]] = {"early": [], "late": []}
        rows: dict[str, int] = {}
        for arm in ("early", "late", "late", "early"):  # ABBA
            w, n = run(arm)
            walls[arm].append(w)
            rows[arm] = n
            print(f"  {d} {arm}: {w:.1f}s rows={n}", file=sys.stderr)
        assert rows["early"] == rows["late"], rows
        out[d] = {
            "rows": rows["late"],
            "early_s": round(min(walls["early"]), 2),
            "late_s": round(min(walls["late"]), 2),
            "early_runs": [round(w, 2) for w in walls["early"]],
            "late_runs": [round(w, 2) for w in walls["late"]],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
