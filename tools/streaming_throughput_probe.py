"""Streaming THROUGHPUT evidence (round-10 verdict Next #6): the
stateful paths are parity-tested but were never measured. This probe
times the two headline stateful pipelines across three micro-batch
sizes and reports rows/sec plus state size, so PERF.md carries numbers
and a stated bottleneck instead of "tested, unmeasured".

1. incremental.ingest_increment — the incremental minhash-dedup corpus
   ingest (foreachBatch body): sf0.1 documents split into B batches,
   each processed against the accumulated signature state. Reported:
   docs/sec end-to-end, per-batch latency curve (state grows with
   every batch), final state size on disk.

2. stateful.sessionize_stream — applyInPandasWithState sessionizer:
   sf0.1 events written as B parquet chunk files, consumed with
   maxFilesPerTrigger=1 + Trigger.AvailableNow (one file = one
   micro-batch). Reported: events/sec end-to-end and the state-store
   rows/memory from the query's own progress metrics.

Usage: python tools/streaming_throughput_probe.py [sf_dir]
Prints one JSON line (PERF.md #33 cites it). Run on an idle box.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from firmable_aus_etl_spark.session import get_session  # noqa: E402
from firmable_aus_etl_spark.streaming.incremental import (  # noqa: E402
    ingest_increment,
    read_corpus,
)
from firmable_aus_etl_spark.streaming.stateful import (  # noqa: E402
    sessionize_stream,
)

BATCH_COUNTS = [4, 16, 64]


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def probe_ingest(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    out = {}
    for n_batches in BATCH_COUNTS:
        state = tempfile.mkdtemp(prefix=f"ingest_probe_{n_batches}_")
        shutil.rmtree(state, ignore_errors=True)
        batches = [
            docs.filter(F.pmod(F.col("doc_id"), F.lit(n_batches)) == i)
            for i in range(n_batches)
        ]
        per_batch = []
        t0 = time.monotonic()
        for b in batches:
            tb = time.monotonic()
            ingest_increment(spark, b, state)
            per_batch.append(time.monotonic() - tb)
        wall = time.monotonic() - t0
        kept = read_corpus(spark, state).count()
        out[str(n_batches)] = {
            "batches": n_batches,
            "docs": n,
            "wall_s": round(wall, 2),
            "docs_per_sec": round(n / wall, 1),
            "batch_s_first": round(per_batch[0], 3),
            "batch_s_last": round(per_batch[-1], 3),
            "kept": kept,
            "state_bytes": _du(state),
        }
        print(f"## ingest {n_batches} batches: {out[str(n_batches)]}",
              file=sys.stderr)
        shutil.rmtree(state, ignore_errors=True)
    return out


def probe_sessionize(spark, sf_dir: str) -> dict:
    # ts arrives TIMESTAMP_NTZ from some testdata generations (the
    # documented encoding wobble) — pin it to TIMESTAMP for the
    # sessionizer's unix_micros
    events = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    n = events.count()
    out = {}
    for n_files in BATCH_COUNTS:
        src = tempfile.mkdtemp(prefix=f"sess_src_{n_files}_")
        ckpt = tempfile.mkdtemp(prefix=f"sess_ckpt_{n_files}_")
        sink = tempfile.mkdtemp(prefix=f"sess_sink_{n_files}_")
        # one file per micro-batch, time-ordered file names so arrival
        # order matches event order across batches
        (
            events.withColumn(
                "bucket",
                F.ntile(n_files).over(
                    __import__(
                        "pyspark.sql.window", fromlist=["Window"]
                    ).Window.orderBy("ts")
                ),
            )
            .repartition(1)
            .sortWithinPartitions("bucket", "ts")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(src)
        )
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/bucket=*")
        )
        sessions = sessionize_stream(stream, gap_minutes=30)
        t0 = time.monotonic()
        q = (
            sessions.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.monotonic() - t0
        state_rows = state_mem = batches_run = 0
        for p in q.recentProgress:
            batches_run += 1
            for s in p.get("stateOperators", []):
                state_rows = max(state_rows, s.get("numRowsTotal", 0))
                state_mem = max(
                    state_mem, s.get("stateMemory",
                                     s.get("memoryUsedBytes", 0))
                )
        closed = spark.read.parquet(sink).count()
        out[str(n_files)] = {
            "micro_batches": batches_run,
            "events": n,
            "wall_s": round(wall, 2),
            "events_per_sec": round(n / wall, 1),
            "closed_sessions": closed,
            "state_rows": state_rows,
            "state_bytes": state_mem,
        }
        print(f"## sessionize {n_files} files: {out[str(n_files)]}",
              file=sys.stderr)
        for d in (src, ckpt, sink):
            shutil.rmtree(d, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("streaming-throughput-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rec = {
        "sf_dir": sf_dir,
        "ingest_increment": probe_ingest(spark, sf_dir),
        "sessionize_stream": probe_sessionize(spark, sf_dir),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
