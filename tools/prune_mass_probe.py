"""Candidate-mass integral for the df-prune bound (round-10: the
decade-3 cliff hunt caught ngram_jaccard_pruned_near_dups at zipf30 —
531 s vs 53 s at zipf10, tail 2.09, 66 GB shuffle spill).

The round-7 rule auto_prune_df = max(8, isqrt(n)) bounds each
shingle's contribution (C(isqrt(n), 2) ~ n/2) but not the SUM: on a
zipf(1.6) vocabulary the number of shingles with df near the bound
grows with n, so the kept-pair mass Sum_{df <= b} C(df, 2) grows
superlinearly for b = sqrt(n). This probe computes that mass — the
upper bound on candidate join rows keyed by kept shingles — under
candidate growth laws at every zipf scale, using the SAME shingle
construction as the query (normalize -> 3-gram word shingles,
distinct per doc):

    b = max(8, isqrt(n))            the round-7 rule
    b = max(8, icbrt(n))            cube root (not SQL-replayable
                                    exactly: pow() is not correctly
                                    rounded — included for the curve)
    b = max(8, isqrt(isqrt(n)))     n^(1/4) (exactly replayable:
                                    nested correctly-rounded sqrt)

plus the boilerplate df and the true near-dup payload's df range, so
the recall argument (content df << any candidate bound) is on record.

Usage: python tools/prune_mass_probe.py [zipf_dirs...]
Prints one JSON line. Pure DuckDB — no Spark JVM.
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb

DEFAULT = [
    "/tmp/zipfdocs/sf1",
    "/tmp/zipfdocs/sf3",
    "/tmp/zipfdocs/sf10",
    "/tmp/zipfdocs/sf30",
]

# mirror of functions.similarity.normalize_name + 3-gram shingles as
# _JACCARD oracles build them (lower, strip non-alnum, squeeze spaces)
SHINGLE_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS ts
  FROM read_parquet(?)
),
idx AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
  FROM toks WHERE len(ts) >= 3
),
sh AS (
  SELECT DISTINCT doc_id,
         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM idx
),
dfs AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
SELECT df, count(*) AS n_shingles FROM dfs GROUP BY df
"""


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT
    out: dict = {}
    for d in dirs:
        pq = os.path.join(d, "documents.parquet")
        if not os.path.exists(pq):
            print(f"SKIP {d}", file=sys.stderr)
            continue
        con = duckdb.connect()
        n = con.execute(
            "SELECT count(*) FROM read_parquet(?)", [pq]
        ).fetchone()[0]
        hist = con.execute(SHINGLE_SQL, [pq]).fetchall()
        bounds = {
            "isqrt": max(8, math.isqrt(n)),
            "icbrt": max(8, round(n ** (1 / 3) - 1e-9)),
            "iisqrt": max(8, math.isqrt(math.isqrt(n))),
        }
        rec = {"n_docs": n, "bounds": bounds, "mass": {}, "kept_shingles": {}}
        for name, b in bounds.items():
            mass = sum(
                c * (df * (df - 1) // 2) for df, c in hist if 8 < df <= b
            )
            kept = sum(c for df, c in hist if df <= b)
            rec["mass"][name] = mass
            rec["kept_shingles"][name] = kept
        rec["mass"]["df_le_8"] = sum(
            c * (df * (df - 1) // 2) for df, c in hist if df <= 8
        )
        rec["total_shingles"] = sum(c for _df, c in hist)
        rec["max_df"] = max(df for df, _c in hist)
        out[d] = rec
        print(d, {k: rec["mass"][k] for k in rec["mass"]}, file=sys.stderr)
        con.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
