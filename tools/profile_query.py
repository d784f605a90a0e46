"""Profile one registered query: run it N times in a single JVM and
print per-run wall times. Usage:

    python tools/profile_query.py <query_name> [N] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firmable_aus_etl_spark.queries import PIPELINE_QUERIES, QUERIES  # noqa: E402

ALL_QUERIES = {**QUERIES, **PIPELINE_QUERIES}
from firmable_aus_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_session("profile")
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    for i in range(n):
        t0 = time.time()
        ALL_QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    print({"query": name, "runs": times, "min": min(times)})


if __name__ == "__main__":
    main()
