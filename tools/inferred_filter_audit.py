"""Audit every headline query's plan for the round-11 zipf30 pathology:
a Filter whose condition re-evaluates an EXPENSIVE derived expression
(tokenize regex / shingle construction / hash transforms / aggregate
folds) — the shape InferFiltersFromGenerate synthesizes for inner
generates and filter-pushdown then moves below the parse's repartition
exchange onto the raw scan's few row-group-bearing tasks.

Usage: python tools/inferred_filter_audit.py [sf_dir]
Prints one line per headline query: OK or FLAG with the offending
operator ids and which expensive tokens appear in filter conditions.
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from firmable_aus_etl_spark.queries import PIPELINE_QUERIES, QUERIES  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

import bench  # noqa: E402

ALL_QUERIES = {**QUERIES, **PIPELINE_QUERIES}

EXPENSIVE = ("regexp_replace", "concat_ws", "xxhash64(", "aggregate(", "md5(")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("filter-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    for name in bench.HEADLINE:
        try:
            df = ALL_QUERIES[name](spark, sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover
            print(f"{name}: ERROR {e}")
            continue
        hits = []
        # formatted plans put each operator's details in "(n) Filter\n
        # Input ...\nCondition : ..." blocks
        for m in re.finditer(r"\((\d+)\) Filter[^\n]*\nInput[^\n]*\nCondition : ([^\n]*)", txt):
            cond = m.group(2)
            toks = [t for t in EXPENSIVE if t in cond]
            if toks:
                hits.append((int(m.group(1)), toks))
        if hits:
            flagged += 1
            print(f"{name}: FLAG {hits}")
        else:
            print(f"{name}: ok")
    print(f"flagged {flagged}/{len(bench.HEADLINE)}")
    spark.stop()


if __name__ == "__main__":
    main()
