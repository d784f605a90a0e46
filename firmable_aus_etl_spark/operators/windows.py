"""Window-family operators (SURVEY.md §2.6: op33, op34).

The reference's per-group-best / top-k logic is imperative argmax
(extractOne at entity_matching_tfidf.py:170, process.extract(limit=5)
at entity_matching_optimized.py:100-105). Here they canonicalize to one
window family with explicit tie-breaks so output is deterministic and
oracle-hashable (SURVEY.md §7.4 nondeterminism note).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    *,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """op33 — top-k rows per partition with deterministic ordering.

    ``order_by`` must be a total order within each partition (callers
    append a unique key as the final tie-break). The partial shuffle is
    on ``partition_by`` only; at scale, skewed partitions are handled by
    AQE, and k<<n means the post-window filter drops data early.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def serial_id(
    df: DataFrame,
    order_by: Sequence[str],
    *,
    id_col: str = "id",
) -> DataFrame:
    """op34 — deterministic SERIAL-style id (reference: schema_postgres.sql:23).

    Deterministic variant: row_number over a global order. This forces a
    single-partition window — correct for tests/small dims, WRONG for a
    100 TB fact table. Use ``monotonic_id`` there.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(id_col, F.row_number().over(w))


def monotonic_id(df: DataFrame, *, id_col: str = "id") -> DataFrame:
    """op34 (scale variant) — unique-but-not-dense ids, no shuffle."""
    return df.withColumn(id_col, F.monotonically_increasing_id())
