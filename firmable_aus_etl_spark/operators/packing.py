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
    policy: str = "ffd",
    group_mode: str = "crc32",
) -> DataFrame:
    """Pack rows of ``chunks`` into examples of at most ``budget``
    tokens each.

    Chunks with ``tokens >= budget`` are emitted as singletons
    (truncation is the tokenizer's job, not the packer's). Determinism:
    within a group the packer orders by (tokens desc, id) — no
    dependence on partitioning or arrival order.

    ``policy``:

    - ``"ffd"`` (default): first-fit-decreasing — first-fit scans open
      bins in creation order; bins used <= 11/9 * OPT + 1 per group.
      Best fill, but the open-bin scan is stateful in a way no SQL twin
      can replay, so FFD results are property-tested, not oracle-gated.
    - ``"nextfit"`` (round-7): next-fit-decreasing — only the LATEST
      bin is open; a chunk that does not fit closes it and opens a new
      one. Slightly worse fill (NFD <= 2 * OPT per group), but the
      state is one (bin, remaining) pair folded over the ranked rows —
      exactly a recursive CTE (cumsum-with-reset), so the tokenize →
      chunk → pack pipeline sits under the DuckDB hash gate
      (q_pack_chunks_512).

    ``group_mode``: ``"crc32"`` hashes ids into groups (default;
    best spread for clustered id spaces); ``"mod"`` uses ``id %
    groups`` — weaker spread but replayable in ANSI SQL, used by the
    oracle-gated query.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if policy not in ("ffd", "nextfit"):
        raise ValueError(f"policy must be 'ffd' or 'nextfit', got {policy!r}")

    if group_mode == "crc32":
        group = (F.crc32(F.col(id_col).cast("string")) % groups).cast("long")
    elif group_mode == "mod":
        group = F.pmod(F.col(id_col).cast("long"), F.lit(groups)).cast("long")
    else:
        raise ValueError(f"group_mode must be 'crc32' or 'mod', got {group_mode!r}")
    src = chunks.select(
        F.col(id_col).cast("long").alias("cid"),
        F.col(tokens_col).cast("long").alias("toks"),
        group.alias("pack_group"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(pdf["pack_group"].iloc[0])
        ordered = pdf.sort_values(
            ["toks", "cid"], ascending=[False, True]
        ).itertuples(index=False)
        # (remaining_capacity, exact_token_sum, ids); oversize
        # singletons carry remaining = 0 — closed to every toks >= 1
        # chunk, and IDENTICAL to the recursive-CTE twin's rem=0, so a
        # degenerate toks == 0 chunk lands in the same bin in both
        # engines (round-7 ADVICE #4: remaining=-1 here would open a
        # new bin for a zero-token chunk that the SQL twin packs into
        # the oversize bin — a latent hash-gate divergence)
        bins: list[tuple[int, int, list[int]]] = []
        for row in ordered:
            toks, cid = int(row.toks), int(row.cid)
            placed = False
            if toks < budget:
                if policy == "ffd":
                    scan = enumerate(bins)
                else:  # nextfit: only the latest bin is open
                    scan = (
                        [(len(bins) - 1, bins[-1])] if bins else []
                    )
                for i, (rem, tot, ids) in scan:
                    if toks <= rem:
                        bins[i] = (rem - toks, tot + toks, ids + [cid])
                        placed = True
                        break
            if not placed:
                bins.append((budget - toks if toks < budget else 0, toks, [cid]))
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
