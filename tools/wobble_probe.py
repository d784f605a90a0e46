"""near_dup_clusters in-bench wobble attribution (round-7 verdict
Next #3): is the gap between the in-bench time (~2.9 s) and the
isolated plateau (~1.73 s) plan work or JVM state?

Protocol, one JVM, idle box:

  1. sentinel; N runs of near_dup_clusters           -> plateau_fresh
  2. ONE pass of every bench headline (the same warm/dirty JVM state
     a real bench run accumulates: shuffle files, codegen cache,
     broadcast cleanup backlog, residual localCheckpoint blocks)
  3. N runs of near_dup_clusters again               -> plateau_dirty
  4. gc.collect + cleaner settle; N more runs        -> plateau_gc
  5. sentinel

Readout: if plateau_dirty ~= the in-bench number >> plateau_fresh,
the floor is JVM-state-structural (the shared-JVM tax every query
pays, amplified by this query's many small stages); if plateau_dirty
~= plateau_fresh, the in-bench elevation is transient interleave
contention and would vanish on any dedicated-driver deployment.
plateau_gc isolates how much of the dirty-state tax the reference
cleaner can claw back.

Usage: python tools/wobble_probe.py [N]   (default 6)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, SENTINEL_REF, _sentinel  # noqa: E402
from firmable_aus_etl_spark.queries import PIPELINE_QUERIES, QUERIES  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

ALL = {**QUERIES, **PIPELINE_QUERIES}
TARGET = "near_dup_clusters"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("wobble_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run_target() -> float:
        t0 = time.time()
        ALL[TARGET](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    s_pre = _sentinel()
    fresh = [run_target() for _ in range(n)]

    t0 = time.time()
    for name in HEADLINE:
        if name in ALL:
            ALL[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    sweep_sec = round(time.time() - t0, 1)

    dirty = [run_target() for _ in range(n)]

    gc.collect()
    time.sleep(5)  # ContextCleaner drains asynchronously
    gced = [run_target() for _ in range(n)]
    s_post = _sentinel()

    rec = {
        "target": TARGET,
        "sf_dir": sf_dir,
        "runs_each": n,
        "plateau_fresh": min(fresh),
        "plateau_dirty": min(dirty),
        "plateau_gc": min(gced),
        "fresh": fresh,
        "dirty": dirty,
        "gc": gced,
        "headline_sweep_sec": sweep_sec,
        "sentinel": [s_pre, s_post, SENTINEL_REF],
        "persistent_rdds_end": spark.sparkContext._jsc.sc()
        .getPersistentRDDs()
        .size(),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
