"""Scale stress pass: execute EVERY registered query at a given sf_dir
(default sf0.1 — 10x the oracle gate's scale) with a noop sink, report
failures and the slowest runners. The oracle gate proves correctness
at sf0.01; this catches queries whose plans degenerate with scale
(quadratic fan-outs, driver-side collects, OOM-prone windows).

Usage: python tools/stress_all.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from firmable_aus_etl_spark.queries import PIPELINE_QUERIES, QUERIES  # noqa: E402

ALL_QUERIES = {**QUERIES, **PIPELINE_QUERIES}
from firmable_aus_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("stress_all")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float | str] = {}
    for name, fn in sorted(ALL_QUERIES.items()):
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 1)
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            times[name] = f"FAIL {str(e)[:120]}"
    fails = [(k, v) for k, v in times.items() if isinstance(v, str)]
    print(f"{len(times)} queries at {sf_dir}: {len(fails)} failures")
    for k, v in fails:
        print(f"  FAIL {k}: {v}")
    slow = sorted(
        ((v, k) for k, v in times.items() if isinstance(v, float)), reverse=True
    )
    print("slowest 10 (single cold run, includes JIT ramp):")
    for v, k in slow[:10]:
        print(f"  {v:7.1f}s  {k}")
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
