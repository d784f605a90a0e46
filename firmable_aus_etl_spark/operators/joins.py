"""Join-family operators (SURVEY.md §2.4: op19-op25).

The reference's computational heart is fuzzy matching between two
company tables; every variant reduces here to one builder:

    similarity_join(left, right, block -> equi-join, score, θ, top-k)

Blocking turns the O(n·m) θ-join into a hash-partitioned equi-join —
exactly what the reference does manually with a thread pool
(entity_matching_tfidf.py:192-206), but expressed declaratively so
Catalyst picks the physical join and AQE handles block skew.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from firmable_aus_etl_spark.functions.similarity import (
    ratio_on_prepared,
    token_sort,
)
from firmable_aus_etl_spark.operators.windows import topk_per_group

Scorer = Callable[[Column, Column], Column]


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    block: Callable[[Column], Column] | None = None,
    scorer: Scorer | None = None,
    prepare: Callable[[Column], Column] | None = None,
    threshold: float = 85.0,
    k: int = 1,
    left_id: str | None = None,
    right_tiebreak: str | None = None,
    score_col: str = "score",
    broadcast_right: bool = False,
    max_rows: int | None = 10_000,
    block_cap: int | None = None,
) -> DataFrame:
    """op20 — blocked similarity join, top-k per left row.

    reference: entity_matching_tfidf.py:163-206 (blocked fuzzy match,
    θ>=85 at :171, top-1 via extractOne at :170).

    - ``block``: expression mapping a key column to its blocking key.
      None -> cross join (op19 semantics) — HARD-GATED: the unblocked
      plan evaluates |left|*|right| scorers and is only shippable when
      at least ONE side is tiny (the broadcast side of the
      nested-loop; a big fact against a 20-row sample is linear, two
      big sides are quadratic). If BOTH sides exceed ``max_rows`` this
      raises instead of silently shipping the quadratic plan — the
      same guard pattern as ngram_jaccard_pairs. Pass
      ``max_rows=None`` to override deliberately. The gate costs two
      LIMIT-bounded counts, and only on the unblocked path.
    - ``prepare``/``scorer``: key normalization runs ONCE PER INPUT ROW
      (default: token_sort) and the pairwise scorer (default:
      levenshtein ratio) sees only prepped strings — O(n+m) string
      machinery instead of O(n*m). At 100 TB the per-pair expression is
      the hot loop of the whole pipeline; keep it to one levenshtein.
    - top-k per left row by (score desc, right_tiebreak asc) — explicit
      tie-break keeps output deterministic/oracle-hashable.
    - ``broadcast_right=True`` hints the dim side; at 100 TB a blocked
      join against a small reference table must not shuffle the fact.
    - both sides' columns are carried into the output, so column names
      must be distinct across the two inputs (rename before joining).
    - ``block_cap``: HOT-BLOCK SALTING (SURVEY §7.4 — the reference's
      production matcher blocks on raw 2-char name prefixes, which are
      Zipf on real names, and its known failure mode is one "TH" block
      holding a huge share of the corpus; AQE can split that block's
      shuffle PARTITION but cannot reduce its O(n_block²) candidate
      fan-out landing on one task). When a block exceeds ``block_cap``
      rows on either side, the pair space is tiled into a
      ceil(n_l/cap) x ceil(n_r/cap) grid (Okcan & Riedewald's
      1-bucket-theta decomposition restricted to hot blocks): each
      left row takes a deterministic row-hash tile coordinate and
      replicates across the right tiles, and vice versa, so every
      in-block pair is scored in EXACTLY ONE tile and per-task
      candidates are bounded by block_cap². Results are bit-identical
      to the unsalted join (same pair set, same scorer; the top-k
      window re-ranks over the union of tiles — left ids are never
      split across partitions of the window, which keys on left id,
      not on the tile). Costs one counts-aggregate job per side plus a
      broadcast of the hot-block directory (≤ rows/cap entries by
      construction). Replication factor for a hot block is the
      OTHER side's tile count — linear in the hot side's size divided
      by cap, the inherent price of spreading an O(n²) block. Rows
      whose hash keys collide on one exact value still co-locate
      (tile = hash of the JOIN KEY); pathological single-value keys
      need a coarser prepare/block, not a smaller cap.
    """
    if prepare is None:
        prepare = token_sort
    if scorer is None:
        scorer = ratio_on_prepared

    lcols = [F.col(f"l.{c}") for c in left.columns]
    rcols = [F.col(f"r.{c}") for c in right.columns]

    l = left.withColumn("__prep", prepare(F.col(left_key))).alias("l")
    r = right.withColumn("__prep", prepare(F.col(right_key))).alias("r")
    if broadcast_right:
        r = F.broadcast(r)

    if block is not None and block_cap is not None:
        joined = _salted_block_join(
            left, right, left_key, right_key, prepare, block, block_cap
        )
    elif block is not None:
        cond = block(F.col(f"l.{left_key}")) == block(F.col(f"r.{right_key}"))
        joined = l.join(r, on=cond, how="inner")
    else:
        if max_rows is not None and all(
            df_.limit(max_rows + 1).count() > max_rows for df_ in (left, right)
        ):
            raise ValueError(
                f"similarity_join(block=None) is the O(n*m) cross join "
                f"and BOTH sides exceed max_rows={max_rows}; pass a "
                f"block= expression (the scale path), shrink one side, "
                f"or pass max_rows=None deliberately"
            )
        joined = l.crossJoin(r)

    scored = joined.select(
        *lcols, *rcols, scorer(F.col("l.__prep"), F.col("r.__prep")).alias(score_col)
    ).filter(F.col(score_col) >= threshold)

    if k <= 0:
        return scored
    part = [left_id] if left_id else [left_key]
    order: list[Column] = [F.col(score_col).desc()]
    if right_tiebreak:
        order.append(F.col(right_tiebreak).asc())
    return topk_per_group(scored, part, order, k=k)


def _salted_block_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    prepare: Callable[[Column], Column],
    block: Callable[[Column], Column],
    block_cap: int,
) -> DataFrame:
    """Hot-block-salted equi-join on the blocking key (see
    similarity_join's ``block_cap`` doc for semantics and the
    exactly-once-per-pair argument). Emits the same ``l.*``/``r.*``
    aliased row shape as the unsalted path so the scoring select is
    shared."""
    if block_cap < 1:
        raise ValueError(f"block_cap must be >= 1, got {block_cap}")
    from firmable_aus_etl_spark.operators.partitioning import (
        ensure_parallelism,
    )

    # the scorer downstream is heavy per-row work; a single-file input
    # arrives as ONE partition, and if Spark then broadcasts the other
    # side the whole hot block's pair scoring runs on one core no
    # matter how the tiles spread the keys (measured: 150k x 10k
    # degenerate block ground a single task for 10+ minutes). The
    # conditional repartition is a no-op on already-parallel scans.
    l = (
        ensure_parallelism(left, left_key)
        .withColumn("__prep", prepare(F.col(left_key)))
        .withColumn("__blk", block(F.col(left_key)))
        .filter(F.col("__blk").isNotNull())
    )
    r = (
        ensure_parallelism(right, right_key)
        .withColumn("__prep", prepare(F.col(right_key)))
        .withColumn("__blk", block(F.col(right_key)))
        .filter(F.col("__blk").isNotNull())
    )
    cap = F.lit(int(block_cap))
    # hot-block directory: tile counts per side, only for blocks over
    # the cap on EITHER side. Bounded by (|L|+|R|)/cap entries, so it
    # broadcasts; two count aggregates is the whole planning cost.
    lc = l.groupBy("__blk").agg(F.count("*").alias("__nl"))
    rc = r.groupBy("__blk").agg(F.count("*").alias("__nr"))
    hot = (
        lc.join(rc, "__blk")  # blocks on one side only never join anyway
        .filter((F.col("__nl") > cap) | (F.col("__nr") > cap))
        .select(
            "__blk",
            F.ceil(F.col("__nl") / cap).cast("int").alias("__sl"),
            F.ceil(F.col("__nr") / cap).cast("int").alias("__sr"),
        )
    )
    l2 = (
        l.join(F.broadcast(hot), "__blk", "left")
        .withColumn(
            "__tile_l",
            F.when(
                F.col("__sl").isNull(), F.lit(0)
            ).otherwise(F.pmod(F.xxhash64(F.col(left_key)), F.col("__sl"))),
        )
        .withColumn(
            "__tile_r",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("__sr"), F.lit(1)) - 1)
            ),
        )
        .drop("__sl", "__sr")
        .alias("l")
    )
    r2 = (
        r.join(F.broadcast(hot), "__blk", "left")
        .withColumn(
            "__tile_r2",
            F.when(
                F.col("__sr").isNull(), F.lit(0)
            ).otherwise(F.pmod(F.xxhash64(F.col(right_key)), F.col("__sr"))),
        )
        .withColumn(
            "__tile_l2",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("__sl"), F.lit(1)) - 1)
            ),
        )
        .drop("__sl", "__sr")
        .alias("r")
    )
    return l2.join(
        r2,
        on=(
            (F.col("l.__blk") == F.col("r.__blk"))
            & (F.col("l.__tile_l") == F.col("r.__tile_l2"))
            & (F.col("l.__tile_r") == F.col("r.__tile_r2"))
        ),
        how="inner",
    )


def nl_similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    **kwargs,
) -> DataFrame:
    """op19 — unblocked (cross-join) fuzzy θ-join, top-1 per left row.

    reference: entity_matching.py:28-43. Kept for parity and for tiny
    right sides; the blocked builder is the scale path.

    BREAKING since round 6: when BOTH sides exceed ``max_rows``
    (default 10_000) this raises instead of silently shipping the
    O(n*m) plan — callers who previously (slowly) ran two large sides
    must either pass a ``block=`` via :func:`similarity_join` or opt
    back in deliberately with ``max_rows=None``. The gate costs two
    LIMIT-bounded count jobs per call, only on this unblocked path.
    """
    return similarity_join(left, right, left_key, right_key, block=None, **kwargs)


def neighbor_blocked_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    block_size: int = 2,
    **kwargs,
) -> DataFrame:
    """op21 — prefix-neighborhood blocking.

    reference: entity_matching_optimized.py:84-105 — candidate blocks
    include those where one block key prefixes the other. Expressed as a
    coarser 1-char block (superset of the reference's candidate set,
    same θ-filter downstream so the final answer only gains recall).
    """
    coarse = kwargs.pop("block", None) or (
        lambda c: F.substring(F.lower(F.trim(c)), 1, max(1, block_size - 1))
    )
    return similarity_join(left, right, left_key, right_key, block=coarse, **kwargs)


def sampled_similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    sample_n: int = 1000,
    threshold: float = 70.0,
    **kwargs,
) -> DataFrame:
    """op23 — sampled best-match join (reference: entity_matching_spark.py:28-58).

    The reference limits the ABR side to 1000 rows then collects to the
    driver; here the limit stays distributed and the match runs as a
    broadcast cross join (the sample is small by construction).
    """
    sampled = right.limit(sample_n)
    return similarity_join(
        left,
        F.broadcast(sampled),
        left_key,
        right_key,
        block=None,
        threshold=threshold,
        **kwargs,
    )


def fk_star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, str | Column] | tuple[DataFrame, str | Column, bool]],
    *,
    broadcast_dims: bool = True,
) -> DataFrame:
    """op25 — FK resolution joins (reference: sql/schema_postgres.sql:71-73).

    Chains inner equi-joins from a fact table through dimension tables.
    Each dim entry is (df, on) or (df, on, broadcast). Broadcast TRUE
    dims never shuffle the fact — at 100 TB that's mandatory for small
    reference tables (region/nation) and WRONG for fact-fact hops
    (lineitem⋈orders must hash-shuffle; AQE may still choose broadcast
    at small scale, which is exactly the right adaptive behavior).
    """
    out = fact
    for entry in dims:
        dim, on = entry[0], entry[1]
        bcast = entry[2] if len(entry) > 2 else broadcast_dims
        d = F.broadcast(dim) if bcast else dim
        out = out.join(d, on=on, how="inner")
    return out


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    *,
    tracked: Sequence[str] | None = None,
    prefer_update_when: Column | None = None,
) -> DataFrame:
    """op24/op5 — batch MERGE: Postgres ``INSERT ... ON CONFLICT DO
    UPDATE ... WHERE changed`` semantics as a full-outer join.

    reference: loadingcsv_topostgre_fast.py:62-76 (CC), :160-183 (ABR);
    greater-confidence-wins variant entity_matching_tfidf.py:117-140
    (predicate at :134) via ``prefer_update_when``.

    Semantics per key:
      - only in existing -> keep existing row
      - only in updates  -> insert update row
      - in both          -> take the update iff any tracked column
        differs null-safely (IS DISTINCT FROM == !(a <=> b)); with
        ``prefer_update_when`` the update must also satisfy it
        (e.g. updates.confidence > existing.confidence).

    One full-outer hash join on the key — the minimum shuffle for merge.
    In production this compiles to Delta/Iceberg MERGE INTO; the
    DataFrame form is the engine-native equivalent.
    """
    cols = existing.columns
    tracked = list(tracked if tracked is not None else [c for c in cols if c not in keys])

    e = existing.alias("e")
    u = updates.alias("u")
    cond = [F.col(f"e.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys]
    joined = e.join(u, on=cond, how="full_outer")

    in_update = F.col(f"u.{keys[0]}").isNotNull()
    in_existing = F.col(f"e.{keys[0]}").isNotNull()
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(f"e.{c}").eqNullSafe(F.col(f"u.{c}"))
    take_update = in_update & (~in_existing | changed)
    if prefer_update_when is not None:
        take_update = in_update & (~in_existing | (changed & prefer_update_when))

    out_cols = [
        F.when(take_update, F.col(f"u.{c}")).otherwise(F.col(f"e.{c}")).alias(c)
        for c in cols
    ]
    return joined.select(*out_cols)


def insert_only_rows(
    existing: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """op24 insert side as an anti-join (SURVEY §2.4 coverage note)."""
    return updates.join(existing, on=list(keys), how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    right_on: str | None = None,
    by: Sequence[str] = (),
    right_by: Sequence[str] | None = None,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: Column | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single temporally nearest
    right row per ``by`` group (pandas ``merge_asof`` semantics;
    engine analog: the reference has no time-series ops, this is part
    of the engine-widening surface alongside windows/sessionization).

    Implementation is the union+window merge, NOT a range join: tag
    both inputs, union them, and run ``last(value, ignorenulls)`` over
    a window partitioned by ``by`` and ordered by event time. One
    shuffle + sort over |L|+|R| rows — no per-row candidate fan-out, so
    the plan survives dense right sides where a range join explodes
    quadratically. Skew bound = rows per ``by`` group, same as any
    window; 100 TB guidance: salt or sub-bucket pathological groups.

    - ``direction="backward"``: nearest right row at-or-before the left
      timestamp ("forward": at-or-after; both respect
      ``allow_exact_matches=False`` by excluding equal timestamps).
    - ``tolerance``: optional max |left_t - right_t| as an INTERVAL
      column (e.g. ``F.expr("INTERVAL 7 DAYS")``); farther matches
      return null, like pandas.
    - Ties (several right rows at one timestamp): greatest ``tiebreak``
      (default: last ``value_cols`` entry) wins — explicit so results
      stay deterministic/oracle-hashable.

    Unmatched left rows keep null value columns (left-join semantics).
    """
    right_on = right_on or on
    right_by = list(right_by or by)
    by = list(by)
    value_cols = list(value_cols or [c for c in right.columns if c not in (*right_by, right_on)])
    tiebreak = tiebreak or value_cols[-1]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lt = F.col(on)
    # right rows must sort before left rows at equal timestamps iff
    # exact matches are allowed (the window frame ends at CURRENT ROW,
    # so "before" == "visible").
    # null right timestamps would sort to the frame edge and leak into
    # matches; they can never be "nearest", so drop them up front.
    r_tagged = right.filter(F.col(right_on).isNotNull()).select(
        *[F.col(c).alias(b) for c, b in zip(right_by, by)],
        F.col(right_on).alias("__t"),
        F.lit(0 if allow_exact_matches else 1).alias("__is_left"),
        F.struct(
            F.col(right_on).alias("__rt"), *[F.col(c) for c in value_cols]
        ).alias("__val"),
    )
    l_tagged = left.select(
        *by,
        lt.alias("__t"),
        F.lit(1 if allow_exact_matches else 0).alias("__is_left"),
        F.lit(None).cast(r_tagged.schema["__val"].dataType).alias("__val"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    r_tagged = r_tagged.withColumn("__row", F.lit(None).cast(l_tagged.schema["__row"].dataType))

    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__is_left").asc(), F.col(f"__val.{tiebreak}").asc_nulls_first()]
    else:
        order = [F.col("__t").desc(), F.col("__is_left").asc(), F.col(f"__val.{tiebreak}").asc_nulls_first()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__m", F.last("__val", ignorenulls=True).over(w)).filter(
        F.col("__row").isNotNull()
    )
    if tolerance is not None:
        gap = (
            (F.col("__t") - F.col("__m.__rt")) if direction == "backward"
            else (F.col("__m.__rt") - F.col("__t"))
        )
        matched = matched.withColumn(
            "__m", F.when(F.col("__m").isNotNull() & (gap <= tolerance), F.col("__m"))
        )
    return matched.select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c) for c in value_cols],
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: Sequence[str] = (),
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Range join (point ∈ [start, end]) as a binned equi-join.

    A naive inequality join forces Spark into BroadcastNestedLoopJoin —
    O(|P|·|I|) and undistributable when neither side fits in memory.
    Binning restores hash partitioning: each interval explodes into the
    time buckets it covers (``sequence`` — ceil(len/bucket)+1 rows),
    points map to exactly one bucket, and the join becomes an equi-join
    on (by..., bucket) followed by the exact containment filter. Shuffle
    volume is |P| + |I|·avg_buckets; pick ``bucket_seconds`` near the
    typical interval length so avg_buckets stays ~2. Same trick as the
    blocking rewrite of the fuzzy join (SURVEY §4 item 1), applied to
    the time axis.

    Both inputs keep all their columns (caller projects); ``how`` other
    than inner is not supported (range semantics of outer rows are
    ambiguous — filter-join then recover unmatched with an anti join).
    """
    if how != "inner":
        raise ValueError("point_in_interval_join supports inner joins only")
    by = list(by)
    w = F.lit(int(bucket_seconds))
    p_bucket = F.floor(F.unix_timestamp(F.col(point_ts)) / w)
    i_buckets = F.sequence(
        F.floor(F.unix_timestamp(F.col(start_ts)) / w),
        F.floor(F.unix_timestamp(F.col(end_ts)) / w),
    )
    p = points.withColumn("__bucket", p_bucket).alias("p")
    i = intervals.withColumn("__bucket", F.explode(i_buckets)).alias("i")
    cond = [F.col(f"p.{b}") == F.col(f"i.{b}") for b in by]
    cond.append(F.col("p.__bucket") == F.col("i.__bucket"))
    out = p.join(i, on=cond).filter(
        (F.col(f"p.{point_ts}") >= F.col(f"i.{start_ts}"))
        & (F.col(f"p.{point_ts}") <= F.col(f"i.{end_ts}"))
    )
    keep = [F.col(f"p.{c}") for c in points.columns] + [
        F.col(f"i.{c}") for c in intervals.columns if c not in (*by, "__bucket")
    ]
    return out.select(*keep)


def apply_cdc(
    existing: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    *,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC batch (op column: 'I'nsert / 'U'pdate / 'D'elete)
    to a snapshot — the Debezium/binlog-apply shape that extends
    merge_upsert with tombstones.

    Semantics per key (one change row per key per batch; feed the
    LATEST change per key — dedup_best on an ordering column — when
    batches can contain several):
      - D in changes                 -> row absent from the result
      - I/U in changes               -> change row wins (upsert)
      - key untouched by the batch   -> existing row kept

    One full-outer hash join on the key, same minimum-shuffle shape as
    merge_upsert; Delta/Iceberg MERGE WHEN MATCHED DELETE in
    production.
    """
    cols = existing.columns
    e = existing.alias("e")
    c = changes.alias("c")
    joined = e.join(c, on=list(keys), how="full_outer")
    touched = F.col(f"c.{op_col}").isNotNull()
    deleted = touched & (F.col(f"c.{op_col}") == "D")
    out_cols = []
    for col in cols:
        if col in keys:
            out_cols.append(F.col(col))
        else:
            out_cols.append(
                F.when(touched, F.col(f"c.{col}"))
                .otherwise(F.col(f"e.{col}"))
                .alias(col)
            )
    return joined.filter(~deleted).select(*out_cols)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: Sequence[str] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-overlap join ([ls,le] ∩ [rs,re] ≠ ∅) as a binned
    equi-join — the two-sided generalization of point_in_interval_join.

    Both sides explode into the time buckets they cover; the join is an
    equi-join on (by..., bucket) + the exact overlap predicate. A pair
    whose intervals share SEVERAL buckets would duplicate, so each pair
    is emitted only in its FIRST shared bucket — the bucket containing
    max(ls, rs) — which dedups with a plain filter instead of a
    distinct (no second shuffle; the same trick MapReduce spatial joins
    use for grid-cell dedup). Shuffle volume is |L|·avg_buckets +
    |R|·avg_buckets; pick bucket_seconds near the typical interval
    length so avg_buckets stays ~2.
    """
    by = list(by)
    w = F.lit(int(bucket_seconds))

    def bucketed(df: DataFrame, s: str, e: str, alias: str) -> DataFrame:
        bks = F.sequence(
            F.floor(F.unix_timestamp(F.col(s)) / w),
            F.floor(F.unix_timestamp(F.col(e)) / w),
        )
        return df.withColumn("__bucket", F.explode(bks)).alias(alias)

    l = bucketed(left, left_start, left_end, "l")
    r = bucketed(right, right_start, right_end, "r")
    cond = [F.col(f"l.{b}") == F.col(f"r.{b}") for b in by]
    cond.append(F.col("l.__bucket") == F.col("r.__bucket"))
    ls, le = F.col(f"l.{left_start}"), F.col(f"l.{left_end}")
    rs, re_ = F.col(f"r.{right_start}"), F.col(f"r.{right_end}")
    first_shared = F.floor(
        F.unix_timestamp(F.greatest(ls, rs)) / w
    )
    out = l.join(r, on=cond).filter(
        (ls <= re_) & (rs <= le) & (F.col("l.__bucket") == first_shared)
    )
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c not in (*by, "__bucket")
    ]
    return out.select(*keep)
