"""Sequence packing: assemble variable-length chunks into fixed-budget
training examples (the "packing" stage of an LLM data pipeline, between
chunking/dedup and the trainer).

Reference scope note: the reference ETL has no packing stage; this is
part of the training-data operator family the engine adds (BASELINE.md
"LLM-data-pipeline operator family"). Packing is a bin-packing problem,
inherently sequential within a bin — so the distributed shape is:
hash-partition chunks into independent groups, pack each group with a
deterministic greedy first-fit-decreasing (FFD) pass inside
applyInPandas, emit (example_id, chunk list, fill). Groups never
exchange chunks, so the result is reproducible regardless of cluster
layout, and per-group working state is O(open bins) — bounded by
group_token_sum / budget.

FFD quality: per group, bins used <= 11/9 * OPT + 1 (classic FFD
bound); sharding adds at most one underfull bin per group, so the
whole-corpus overhead over the token-sum lower bound stays small and
testable (tests/test_packing.py asserts it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

PACKED_SCHEMA = StructType(
    [
        StructField("pack_group", LongType(), True),
        StructField("example_id", LongType(), True),
        StructField("n_chunks", LongType(), True),
        StructField("total_tokens", LongType(), True),
        StructField("chunk_ids", ArrayType(LongType()), True),
    ]
)


def pack_chunks(
    chunks: DataFrame,
    *,
    id_col: str,
    tokens_col: str,
    budget: int,
    groups: int = 64,
) -> DataFrame:
    """Pack rows of ``chunks`` into examples of at most ``budget``
    tokens each.

    Chunks with ``tokens >= budget`` are emitted as singletons
    (truncation is the tokenizer's job, not the packer's). Determinism:
    group = crc32(id) % groups; within a group FFD orders by
    (tokens desc, id) and first-fit scans open bins in creation order —
    no dependence on partitioning or arrival order.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")

    src = chunks.select(
        F.col(id_col).cast("long").alias("cid"),
        F.col(tokens_col).cast("long").alias("toks"),
        (F.crc32(F.col(id_col).cast("string")) % groups).cast("long").alias(
            "pack_group"
        ),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(pdf["pack_group"].iloc[0])
        ordered = pdf.sort_values(
            ["toks", "cid"], ascending=[False, True]
        ).itertuples(index=False)
        # (remaining_capacity, exact_token_sum, ids); oversize
        # singletons carry remaining = -1 so first-fit skips them
        bins: list[tuple[int, int, list[int]]] = []
        for row in ordered:
            toks, cid = int(row.toks), int(row.cid)
            placed = False
            if toks < budget:
                for i, (rem, tot, ids) in enumerate(bins):
                    if toks <= rem:
                        bins[i] = (rem - toks, tot + toks, ids + [cid])
                        placed = True
                        break
            if not placed:
                bins.append((budget - toks if toks < budget else -1, toks, [cid]))
        return pd.DataFrame(
            {
                "pack_group": [g] * len(bins),
                "example_id": list(range(len(bins))),
                "n_chunks": [len(ids) for _, _, ids in bins],
                "total_tokens": [tot for _, tot, _ in bins],
                "chunk_ids": [ids for _, _, ids in bins],
            }
        )

    return src.groupBy("pack_group").applyInPandas(pack, PACKED_SCHEMA)
