"""Heap-pressure attribution for the decade-3 residual tails.

Round-10 continuation finding: the paired fetch A/B fixed a 1.4-1.6x
payload constant in the multiprobe-LSH route, yet its 10->30 tail
stayed ~2.5 WITHIN the paired probe — while every per-stage quantity
(candidate mass, signature rows, shuffle width) is designed-linear and
the syn30 logs fill with GCLocker retry warnings. The suspect is the
ENVIRONMENT, not the plan: local[32] shares one 8 GB JVM heap
(session.py SPARK_GRAFT_DRIVER_MEM default) across 32 executor
threads — 256 MB/thread — and the syn30 working set is the first point
that crosses it, so the "tail" partially measures GC thrash.

This probe runs one query at one scale under TWO heap sizes (8g vs
32g), separate JVMs (heap is fixed at JVM start), min-of-N within each
JVM so JIT ramp is amortized identically, and reports the walls plus
the JVM-reported total GC time per arm (sum over executor threads via
the status API is not exposed in local mode, so we read
/proc-independent java.lang GC MXBean totals through py4j — coarse but
same-JVM-consistent).

If the 32g wall collapses toward ~3x the syn10 wall, the residual tail
is heap-bound: an artifact of the 8 GB test harness, not of the plan —
on a provisioned cluster memory-per-core scales out with executors.
If it does NOT move, the plan genuinely super-scales and needs real
work. Either answer is recorded.

Usage: python tools/heap_bound_probe.py <query> <sf_dir> [runs]
Spawns itself once per heap size via SPARK_GRAFT_DRIVER_MEM.
Prints one JSON line for SCALING_r10.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAPS = ["8g", "32g"]


def child(query: str, sf_dir: str, runs: int) -> None:
    from firmable_aus_etl_spark.queries import PIPELINE_QUERIES, QUERIES
    from firmable_aus_etl_spark.session import get_session

    spark = get_session("heap-bound-probe")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm

    def gc_ms() -> int:
        total = 0
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        for i in range(beans.size()):
            total += beans.get(i).getCollectionTime()
        return total

    q = {**QUERIES, **PIPELINE_QUERIES}[query]
    walls, gcs = [], []
    for _ in range(runs):
        g0, t0 = gc_ms(), time.monotonic()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 2))
        gcs.append(gc_ms() - g0)
    print(json.dumps({
        "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "walls": walls, "wall_s": min(walls),
        "gc_ms_per_run": gcs,
        "gc_frac_of_best": round(
            gcs[walls.index(min(walls))] / 1000.0 / min(walls), 3),
    }))


def main() -> None:
    if os.environ.get("_HEAP_PROBE_CHILD"):
        child(sys.argv[1], sys.argv[2], int(sys.argv[3]))
        return
    query, sf_dir = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    out = {"query": query, "sf_dir": sf_dir, "runs": runs, "arms": {}}
    for heap in HEAPS:
        env = dict(os.environ,
                   _HEAP_PROBE_CHILD="1", SPARK_GRAFT_DRIVER_MEM=heap)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             query, sf_dir, str(runs)],
            env=env, capture_output=True, text=True,
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
        try:
            out["arms"][heap] = json.loads(line)
        except json.JSONDecodeError:
            out["arms"][heap] = {"error": r.stderr[-2000:]}
        print(f"  {heap}: {line}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
