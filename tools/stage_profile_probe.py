"""Run ONE registered query in one JVM and dump per-stage task-time
distributions from the live UI REST API — the guide §2.5 straggler
diagnostic (max/median task time per stage, shuffle bytes, task count)
without needing a persistent history server.

Usage:
    python tools/stage_profile_probe.py <query_name> <sf_dir> [out_json]

Prints (and optionally writes) one JSON object:
    {query, sf_dir, wall_sec, stages: [{stage_id, name, num_tasks,
     executor_run_time_ms, input_mb, shuffle_read_mb, shuffle_write_mb,
     task_time_quantiles_ms: [min, p25, p50, p75, max]}...]}
sorted by stage executorRunTime descending.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firmable_aus_etl_spark.queries import PIPELINE_QUERIES, QUERIES  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

ALL_QUERIES = {**QUERIES, **PIPELINE_QUERIES}


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    spark = get_session("stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("Spark UI disabled; cannot profile stages")
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    spark.sparkContext.setJobDescription(f"profile: {name}")
    t0 = time.time()
    ALL_QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = round(time.time() - t0, 3)

    stages = _get(f"{base}/stages?status=complete")
    rows = []
    for st in stages:
        sid, att = st["stageId"], st["attemptId"]
        rec = {
            "stage_id": sid,
            "name": (st.get("name") or "")[:120],
            "num_tasks": st.get("numCompleteTasks"),
            "executor_run_time_ms": st.get("executorRunTime"),
            "input_mb": round((st.get("inputBytes") or 0) / 1e6, 1),
            "shuffle_read_mb": round((st.get("shuffleReadBytes") or 0) / 1e6, 1),
            "shuffle_write_mb": round((st.get("shuffleWriteBytes") or 0) / 1e6, 1),
            "spill_disk_mb": round((st.get("diskBytesSpilled") or 0) / 1e6, 1),
        }
        try:
            q = _get(
                f"{base}/stages/{sid}/{att}/taskSummary"
                f"?quantiles=0.0,0.25,0.5,0.75,1.0"
            )
            rec["task_time_quantiles_ms"] = [
                round(x) for x in q.get("executorRunTime", [])
            ]
        except Exception:
            rec["task_time_quantiles_ms"] = None
        rows.append(rec)
    rows.sort(key=lambda r: -(r["executor_run_time_ms"] or 0))
    out = {"query": name, "sf_dir": sf_dir, "wall_sec": wall, "stages": rows}
    print(json.dumps(out, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
