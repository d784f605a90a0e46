"""Training-loader handoff demo: lakehouse-side DataFrame -> WebDataset
tar shards -> a loader-shaped consumer (round-8 verdict Next #8, the
handoff story's last mile).

Stage 1 (the engine's job) writes the documents table as committed
tar shards with sources.webdataset.write_webdataset — deterministic
shard assignment, temp-file + rename task commit, _SUCCESS marker.

Stage 2 plays the TRAINING side: a minimal WebDataset-style loader
that never touches Spark — it streams each committed tar
sequentially (the reason the format exists: object-store range reads,
no per-sample round trips), groups adjacent members into samples,
decodes, and yields fixed-size shuffledless batches, exactly the
shape torchdata/webdataset pipelines consume. The loader reads ONLY
shards listed in _SUCCESS, so an in-flight or failed write is
invisible to training.

Stage 3 closes the loop with the engine's own reader
(read_webdataset) and asserts both consumers observed the identical
sample set.

    python examples/run_webdataset_loader.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import io
import json
import os
import sys
import tarfile
from collections.abc import Iterator

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from firmable_aus_etl_spark.session import get_session
from firmable_aus_etl_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)

MEMBERS = {"text": "txt", "meta": "json"}


def stream_samples(shard_path: str) -> Iterator[dict]:
    """The loader primitive: one sequential pass over one tar,
    yielding {"__key__": ..., "txt": bytes, "json": bytes} dicts —
    the webdataset sample convention. Pure stdlib; this is what runs
    inside a dataloader worker, not inside Spark."""
    sample: dict = {}
    with tarfile.open(shard_path) as tar:
        for info in tar:
            if not info.isfile() or "." not in info.name:
                continue
            key, ext = info.name.rsplit(".", 1)
            if sample.get("__key__") not in (None, key):
                yield sample
                sample = {}
            sample["__key__"] = key
            sample[ext] = tar.extractfile(info).read()
    if sample:
        yield sample


def loader(path: str, *, batch_size: int = 32) -> Iterator[list[dict]]:
    """Shard-sequential batching loader over a committed WebDataset
    directory: shards come from _SUCCESS (the job-level commit
    marker), samples stream in tar order, batches are fixed-size
    lists of decoded samples. A real training loader adds worker
    sharding + shuffle buffers on top of exactly this iterator."""
    with open(os.path.join(path, "_SUCCESS")) as f:
        shards = [line for line in f.read().splitlines() if line]
    batch: list[dict] = []
    for shard in shards:
        for sample in stream_samples(os.path.join(path, shard)):
            # null columns produce ABSENT members (the webdataset
            # sparse-field convention the writer follows) — decode
            # defensively, as a real loader must
            batch.append(
                {
                    "key": sample["__key__"],
                    "text": sample.get("txt", b"").decode("utf-8"),
                    "meta": json.loads(sample["json"]) if "json" in sample else {},
                }
            )
            if len(batch) == batch_size:
                yield batch
                batch = []
    if batch:
        yield batch


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wds_demo"
    spark = get_session("webdataset-loader-demo")
    out = os.path.join(work, "documents_wds")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    staged = docs.select(
        "doc_id",
        "text",
        F.to_json(F.struct("lang", "source", "n_chars")).alias("meta"),
    )
    names = write_webdataset(
        staged, out, key_col="doc_id", members=MEMBERS, n_shards=4
    )
    print(f"wrote {len(names)} shards -> {out}")

    n_samples = 0
    n_batches = 0
    langs: dict[str, int] = {}
    for batch in loader(out, batch_size=64):
        n_batches += 1
        n_samples += len(batch)
        for s in batch:
            lang = s["meta"].get("lang", "??")
            langs[lang] = langs.get(lang, 0) + 1
    print(f"loader consumed {n_samples} samples in {n_batches} batches")
    print(f"lang histogram: {dict(sorted(langs.items()))}")

    spark_count = read_webdataset(spark, out, members=MEMBERS).count()
    assert spark_count == n_samples == docs.count(), (
        spark_count,
        n_samples,
    )
    print("spark reader and loader agree:", spark_count, "samples")


if __name__ == "__main__":
    main()
