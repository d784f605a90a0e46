"""Determinism gate: run every oracle-bearing query TWICE in one
session and require identical sorted row sets — catches plans whose
output depends on partial-aggregation order, window ties without a
full tie-break, or sampling that isn't key-hash based. (The DuckDB
oracle gate catches cross-engine drift; this catches run-to-run drift
the oracle could miss if both runs happened to land the same way.)

Usage: python tools/determinism_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from firmable_aus_etl_spark.queries import ORACLE, QUERIES  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_session("determinism_check")
    spark.sparkContext.setLogLevel("ERROR")
    bad = []
    for name in sorted(ORACLE):
        if only and name not in only:
            continue
        fn = QUERIES[name]
        # None-tolerant canonical order (NULLable columns break tuple <)
        key = lambda row: tuple((x is None, str(x)) for x in row)  # noqa: E731
        a = sorted(map(tuple, fn(spark, sf_dir).collect()), key=key)
        b = sorted(map(tuple, fn(spark, sf_dir).collect()), key=key)
        if a != b:
            bad.append(name)
            print(f"  X {name}: {len(a)} vs {len(b)} rows, first diff "
                  f"{next((x for x, y in zip(a, b) if x != y), None)}")
        else:
            print(f"  = {name}: {len(a)} rows stable")
    if bad:
        print(f"NONDETERMINISTIC: {bad}")
        return 1
    print("all oracle queries deterministic")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
