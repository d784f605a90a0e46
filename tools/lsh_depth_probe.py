"""Mechanism probe for the multiprobe-LSH decade-3 tail (round-10:
syn30 669.6 s vs syn10 31.7 s, tail 2.78 — the designated deep-scale
ANN route cliffing in its third decade).

Splits the pipeline at syn10/syn30 (and the corpus occupancy law
itself) to locate the blowup:

  * corpus signature stage only (count of (vec, table) rows),
  * bucket-occupancy distribution per (table, signature): max, p99,
    sum(occ^2) — the candidate-mass driver (a probed bucket of size m
    contributes m rows per probing query),
  * probe-join candidate count + wall,
  * full top-3 wall.

Usage: python tools/lsh_depth_probe.py [syn_dirs...]
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
    spark = get_session("lsh-depth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for d in dirs:
        pq = os.path.join(d, "embeddings.parquet")
        if not os.path.exists(pq):
            print(f"SKIP {d}", file=sys.stderr)
            continue
        emb = spark.read.parquet(pq)
        n = emb.count()
        np_ = V.auto_n_planes(n, target_occupancy=16, min_planes=6, max_planes=16)
        queries = emb.filter(F.col("vec_id") % 10 == 0).select(
            "vec_id", "embedding"
        )
        nq = queries.count()
        corpus = emb.select("vec_id", "embedding")

        # occupancy law: per-table signature histogram (table 0 is
        # representative; all tables are i.i.d. plane draws)
        planes = V.make_planes(64, np_, seed=42)
        planes_sql = ", ".join(
            "array(" + ", ".join(f"{float(x)!r}D" for x in p) + ")"
            for p in planes
        )
        sig = corpus.select(
            F.expr(
                f"aggregate(sequence(0, {np_ - 1}), CAST(0 AS BIGINT), "
                f"(acc, i) -> acc + CAST(aggregate(zip_with(embedding, "
                f"element_at(array({planes_sql}), i + 1), "
                f"(a, b) -> CAST(a AS DOUBLE) * b), 0.0D, "
                f"(acc2, v) -> acc2 + v) >= 0 AS BIGINT) "
                f"* CAST(pow(2.0D, i) AS BIGINT))"
            ).alias("sig")
        )
        occ = sig.groupBy("sig").count()
        stats = occ.agg(
            F.count("*").alias("buckets"),
            F.max("count").alias("max_occ"),
            F.expr("percentile(count, 0.99)").alias("p99_occ"),
            F.sum(F.col("count") * F.col("count")).alias("sum_occ_sq"),
        ).collect()[0]

        if os.environ.get("LSH_PROBE_SKIP_FULL"):
            rows, t_full = None, None
        else:
            t0 = time.monotonic()
            res = V.lsh_multiprobe_topk(
                queries, corpus, dim=64, k=3, n_tables=6, probes=10,
                n_planes=np_, seed=42,
            )
            rows = res.count()
            t_full = time.monotonic() - t0

        out[d] = {
            "n": n,
            "n_queries": nq,
            "n_planes": np_,
            "buckets_used_t0": stats["buckets"],
            "max_occ_t0": stats["max_occ"],
            "p99_occ_t0": float(stats["p99_occ"]),
            "sum_occ_sq_t0": int(stats["sum_occ_sq"]),
            "expected_uniform_occ": round(n / (1 << np_), 2),
            "rows": rows,
            "t_full_s": round(t_full, 2) if t_full is not None else None,
        }
        print(d, out[d], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
