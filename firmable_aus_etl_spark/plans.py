"""Physical-plan introspection helpers.

Scale properties (pushdown, pruning, broadcast, codegen, shuffle
count) are TESTED here, not assumed: tests/test_plans.py asserts them
on the real query plans so a regression that silently de-optimizes a
scan or flips a broadcast into a shuffle fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan as a string (post-Catalyst, pre-AQE)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema (pruned column set) per scan."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", physical_plan(df))


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes broadcasts)."""
    plan = physical_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def has_dynamic_partition_pruning(df: DataFrame) -> bool:
    """True when a scan carries a dynamicpruningexpression — the
    partitions to read are resolved at runtime from the other join
    side instead of being enumerated statically."""
    return "dynamicpruning" in physical_plan(df).lower()


def has_runtime_bloom_filter(df: DataFrame) -> bool:
    """True when the optimizer injected a bloom_filter_agg /
    might_contain pair: probe-side rows are dropped by a sketch of the
    selective build side before reaching the join's shuffle."""
    plan = physical_plan(df)
    return "bloom_filter_agg" in plan and "might_contain" in plan.lower()


def wholestage_codegen_ids(df: DataFrame) -> set[int]:
    """Distinct WholeStageCodegen span ids — wider spans = more of the
    plan fused into generated JVM loops."""
    plan = physical_plan(df)
    ids = re.findall(r"codegen id : (\d+)", plan)
    ids += re.findall(r"WholeStageCodegen \((\d+)\)", plan)
    return {int(m) for m in ids}


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and PERF notes."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "exchanges": count_exchanges(df),
        "broadcast_join": has_broadcast_join(df),
        "sort_merge_join": has_sort_merge_join(df),
        "codegen_spans": len(wholestage_codegen_ids(df)),
    }


def final_adaptive_plan(df: DataFrame) -> str:
    """Execute ``df`` and return the FINAL adaptive plan string.

    ``executedPlan`` before an action prints the INITIAL AQE plan —
    runtime decisions (exchange reuse, skew splits, join demotion) only
    appear after execution finalizes the plan, so asserting on the
    pre-action string understates the real plan (it shows zero
    ReusedExchange on plans that do reuse). Collects the result:
    test-scale inputs only.
    """
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def count_reused_exchanges_final(df: DataFrame) -> int:
    return final_adaptive_plan(df).count("ReusedExchange")


def _top_level_bracket_groups(s: str) -> list[str]:
    """Split ``[a, b], [c], [d]`` into its top-level ``[...]`` groups
    (nested brackets stay inside their group)."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                groups.append(s[start + 1 : i])
                start = -1
    return groups


def unbounded_windows(df: DataFrame) -> list[str]:
    """Window operators with NO partition spec — the precise form of
    the 100 TB scale-killer the generic SinglePartition heuristic
    over-approximates (1-row scalar aggregates and broadcast
    attachments also print SinglePartition but carry bounded rows).

    Reads the optimized logical plan: a ``Window`` node prints
    ``Window [functions], [partitionSpec], [orderSpec]``; when the
    window is unpartitioned the partition group is omitted, leaving
    TWO top-level groups whose second is an ordering (contains a sort
    direction). Returns the offending Window lines (empty = clean).
    """
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    out = []
    for line in opt.splitlines():
        stripped = line.strip().lstrip("+-: ").strip()
        if not stripped.startswith("Window "):
            continue
        groups = _top_level_bracket_groups(stripped)
        if len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1]):
            out.append(stripped[:200])
    return out


def scale_lint(df: DataFrame) -> list[str]:
    """Static plan lint for the 100 TB red flags this engine's own
    plan tests enforce, packaged as an API users can run on THEIR
    queries before submitting them to a large cluster:

    - ``cartesian-product``: CartesianProduct — O(|L|*|R|) pair
      enumeration; only ever acceptable between provably tiny inputs.
    - ``nested-loop-join``: BroadcastNestedLoopJoin — a non-equi join
      condition scanning the full broadcast side per row; rewrite to a
      binned/blocked equi-join (see operators/joins.py range joins).
    - ``single-partition``: a SinglePartition exchange — the whole
      dataset funneling through ONE task (global window / global sort
      without partition keys upstream of more work).

    Returns human-readable findings (empty list = clean). Heuristic on
    the initial physical plan; TakeOrderedAndProject (global top-k)
    and broadcast-side 1-row scalar crossJoins commonly pair with a
    SinglePartition exchange that is NOT flagged here because the row
    volume is bounded by k — callers can filter the findings list."""
    plan = physical_plan(df)
    findings = []
    for w in unbounded_windows(df):
        findings.append(
            f"unbounded-window: every row moves through ONE task "
            f"(window has ORDER BY but no PARTITION BY): {w[:120]}"
        )
    if "CartesianProduct" in plan:
        findings.append(
            "cartesian-product: O(|L|*|R|) join; bound both sides or "
            "rewrite as a blocked equi-join"
        )
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            "nested-loop-join: non-equi condition scans the broadcast "
            "side per row; bin/bucket the condition into an equi-join"
        )
    if "SinglePartition" in plan and "TakeOrderedAndProject" not in plan:
        # a global window / global sort / unkeyed aggregate funnels
        # every row through ONE task. The tolerated exception is the
        # bounded global top-k (TakeOrderedAndProject carries only k
        # rows per partition to the driver); 1-row scalar aggregates
        # also hit this branch — callers with a known-1-row input can
        # filter the finding.
        findings.append(
            "single-partition: all rows funnel through one task "
            "(global window/sort without partition keys); add "
            "PARTITION BY or pre-aggregate"
        )
    return findings
