"""Rotating independent oracle verification at sf0.1 (round-7 verdict
item #7): every run checks the NEXT ``k`` registry names (sorted
order, cursor persisted in .oracle_rotation at the repo root) against
their DuckDB twins at a scale factor the driver never samples — so
scale-dependent nondeterminism (FP accumulation order, tie-breaks that
only collide at larger row counts) cannot hide between rounds.

The cursor file is committed: rounds advance the rotation instead of
re-checking the same head names. A full cycle covers the registry in
ceil(N/k) runs (~15 rounds at k=12, N~177).

Usage: python tools/rotate_oracle.py [sf_dir] [k]
Exits non-zero if any checked name mismatches. Prints the ledger line
to append to the round notes.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CURSOR = os.path.join(REPO, ".oracle_rotation")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from firmable_aus_etl_spark.queries import QUERIES

    names = sorted(QUERIES)
    start = 0
    if os.path.exists(CURSOR):
        with open(CURSOR) as fh:
            start = int(fh.read().strip()) % len(names)
    batch = [names[(start + i) % len(names)] for i in range(k)]

    print(f"rotation cursor {start} -> {(start + k) % len(names)}; "
          f"checking at {sf_dir}:")
    for n in batch:
        print(f"  {n}")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         sf_dir, *batch],
        cwd=REPO,
    )
    if proc.returncode != 0:
        sys.exit(proc.returncode)
    with open(CURSOR, "w") as fh:
        fh.write(str((start + k) % len(names)))
    print(f"LEDGER: rotate_oracle sf_dir={sf_dir} names={','.join(batch)}")


if __name__ == "__main__":
    main()
