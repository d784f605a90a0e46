"""Hot-block skew demonstration for the blocked similarity join.

The reference's production matcher blocks on raw 2-char name prefixes
(entity_matching_tfidf.py:159-160); real company names are Zipf over
prefixes, so one "TH"-like block holds a huge share of the corpus.
AQE splits that block's shuffle PARTITION, but the O(n_block²)
candidate fan-out still lands on a single task.  ``block_cap``
grid-salting (round-7; joins._salted_block_join) tiles a hot block's
pair space into ceil(n_l/cap) x ceil(n_r/cap) cells, bounding per-task
candidates at ~cap² while keeping the result bit-identical.

This script builds a deterministic Zipf-prefix name fixture (the hot
prefix holds ~40% of the rows — NOT dodged, unlike the uniform last-2
blocking of the flagship query), then measures:

- wall time of the unsalted vs salted join (min of ``reps``);
- the max per-join-task candidate count: per-block pair counts for
  the unsalted plan vs per-(block, tile_l, tile_r) cell counts for
  the salted plan;
- asserts the two outputs are identical.

Appends/updates the round-7 section of SKEW.md. Usage:

    python tools/skew_join_demo.py [n_per_side] [block_cap]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from firmable_aus_etl_spark.operators import joins  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

# Zipf-ish prefix popularity: rank r gets weight ~ 1/r over 8 prefixes;
# the head prefix ('th') carries ~40% of rows, like real-name corpora.
PREFIXES = ["th", "sm", "jo", "br", "wi", "ha", "cl", "mo"]
CUM = [40, 60, 73, 83, 91, 96, 99, 100]  # cumulative % per rank


def names(spark, n: int, side: str):
    """Deterministic Zipf-prefix names: row i picks its prefix from the
    cumulative table via (i * 37 + side_salt) % 100 — no RNG, stable
    across runs and engines."""
    salt = 0 if side == "l" else 17
    pick = "+".join(
        f"IF(pmod(id * 37 + {salt}, 100) >= {c}, 1, 0)" for c in CUM[:-1]
    )
    prefix_arr = "array(" + ",".join(f"'{p}'" for p in PREFIXES) + ")"
    return spark.range(n).selectExpr(
        f"id AS {side}_id",
        f"concat(element_at({prefix_arr}, CAST({pick} AS INT) + 1), "
        f"'corp ', CAST(pmod(id * 7919, {n}) AS STRING)) AS {side}_name",
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    reps = 2
    spark = get_session(app_name="skew-join-demo")
    spark.sparkContext.setLogLevel("ERROR")
    # Emulate the big-big regime this lever exists for: at 100 TB
    # NEITHER side of the matcher fits in a broadcast, so the blocked
    # join is a shuffle join keyed on the block — the hot block is one
    # shuffle partition. Locally a 40k-row side slips under the
    # broadcast threshold and the skew never materializes (every left
    # partition streams against the broadcast map in parallel), which
    # would make this demo measure nothing. AQE stays ON — the claim
    # under test is that grid salting beats AQE-alone, not AQE-off.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    left = names(spark, n, "l").localCheckpoint()
    right = names(spark, n, "r").localCheckpoint()
    blk = lambda c: F.substring(c, 1, 2)  # noqa: E731
    # threshold high enough that few pairs survive into the top-1
    # window — the measurement isolates the JOIN+SCORER stage, which is
    # where hot-block skew lands (the window's cost is identical in
    # both plans and would otherwise mask the difference)
    kw = dict(
        block=blk, threshold=85.0, k=1, left_id="l_id", right_tiebreak="r_id"
    )

    # candidate fan-out diagnostics (pairs per join task)
    lb = left.withColumn("__blk", blk(F.col("l_name")))
    rb = right.withColumn("__blk", blk(F.col("r_name")))
    per_block = (
        lb.groupBy("__blk").count().withColumnRenamed("count", "nl")
        .join(rb.groupBy("__blk").count().withColumnRenamed("count", "nr"), "__blk")
        .selectExpr("__blk", "nl", "nr", "nl * nr AS pairs")
        .orderBy(F.desc("pairs"))
        .collect()
    )
    unsalted_max = per_block[0]["pairs"]
    cells = joins._salted_block_join(
        left, right, "l_name", "r_name",
        prepare=lambda c: c, block=blk, block_cap=cap,
    )
    per_cell = (
        cells.groupBy("l.__blk", "l.__tile_l", "l.__tile_r").count().collect()
    )
    salted_max = max(r["count"] for r in per_cell)
    assert sum(r["count"] for r in per_cell) == sum(r["pairs"] for r in per_block)

    def run(block_cap):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = joins.similarity_join(
                left, right, "l_name", "r_name", block_cap=block_cap, **kw
            )
            rows = sorted(map(tuple, out.collect()))
            best = min(best, time.time() - t0)
        return best, rows

    t_plain, rows_plain = run(None)
    t_salt, rows_salt = run(cap)
    assert rows_plain == rows_salt, "salting changed the result"

    hot = per_block[0]
    lines = [
        "",
        "## Hot-block salting for the blocked similarity join (round-7)",
        "",
        f"Zipf-prefix name fixture, {n} x {n} rows, 8 two-char blocks, the",
        f"head block ('{hot['__blk']}') holds {hot['nl']}x{hot['nr']} rows "
        f"-> {unsalted_max:,} candidate pairs on ONE task unsalted.",
        f"`block_cap={cap}` tiles it into a "
        f"ceil({hot['nl']}/{cap}) x ceil({hot['nr']}/{cap}) grid "
        "(joins._salted_block_join); outputs asserted identical.",
        "",
        "| plan | max candidates per join task | total sec (min of "
        f"{reps}, local[32]) |",
        "|---|---|---|",
        f"| unsalted blocked join | {unsalted_max:,} | {t_plain:.2f} |",
        f"| block_cap={cap} grid salting | {salted_max:,} | {t_salt:.2f} |",
        "",
        "Both plans run with auto-broadcast OFF (emulating the 100 TB",
        "regime where neither side fits a broadcast; a broadcast join has",
        "no block skew by construction) and AQE ON: AQE's skew-join splits",
        "skewed PARTITIONS, but one hot KEY is atomic to a shuffle join —",
        "its rows must colocate — so the hot block's O(n_block^2) scorer",
        "fan-out stays on one task until the key itself is extended, which",
        "is what the grid salt does. The per-task bound is what survives",
        "100 TB: candidate volume per task stays ~cap^2 no matter how hot",
        "the head block gets, while the unsalted hot task grows",
        "quadratically with the block.",
    ]
    marker = "## Hot-block salting for the blocked similarity join (round-7)"
    with open("/root/repo/SKEW.md") as fh:
        doc = fh.read()
    if marker in doc:
        doc = doc[: doc.index(marker)].rstrip() + "\n"
    with open("/root/repo/SKEW.md", "w") as fh:
        fh.write(doc.rstrip() + "\n" + "\n".join(lines) + "\n")
    print(f"unsalted: {t_plain:.2f}s max/task {unsalted_max:,}")
    print(f"salted:   {t_salt:.2f}s max/task {salted_max:,}")
    spark.stop()


if __name__ == "__main__":
    main()
