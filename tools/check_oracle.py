"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB against the same sf directory, then compares:
  - row count
  - schema (sorted column names)
  - order-insensitive values (rows sorted by all columns, exact match;
    floats compared to 1e-9 relative as a fallback diagnostic)

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from firmable_aus_etl_spark.datasets import TABLE_NAMES  # noqa: E402
from firmable_aus_etl_spark.session import get_session  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NAN>"
        return repr(round(v, 9))
    return repr(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


# DuckDB type -> expected Spark simpleString (prefix match for decimals)
_DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "HUGEINT": "decimal",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "BOOLEAN": "boolean",
}


def _type_mismatches(sdf, dcols, dtypes):
    """Compare Spark column types vs DuckDB result types by name."""
    stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out = []
    for name, dt in zip(dcols, dtypes):
        base = dt.split("(")[0].strip().upper()
        want = _DUCK_TO_SPARK.get(base)
        got = stypes.get(name)
        if want is None:
            if base.startswith("DECIMAL"):
                want = "decimal"
            else:
                continue  # unmapped type: skip silently (arrays etc.)
        if got is None or not got.startswith(want):
            out.append((name, dt, got))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # accept both space- and comma-separated query names (an unknown
    # name would otherwise silently check nothing and print success)
    only = {n for arg in sys.argv[2:] for n in arg.replace("--only", "").split(",") if n}

    spark = get_session("check_oracle")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  ~ {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"  X {name}: ORACLE SQL ERROR: {e}")
            failures.append(name)
            continue

        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"  X {name}: schema mismatch spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        dtypes = [d[1] for d in res.description]
        tm = _type_mismatches(sdf, dcols, dtypes)
        if tm:
            print(f"  ! {name}: TYPE drift (col, duck, spark): {tm}")
        if len(srows) != len(drows):
            print(f"  X {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        if ok:
            s_set = _rowset(scols, srows)
            d_set = _rowset(dcols, drows)
            if s_set != d_set:
                ok = False
                diff = [
                    (a, b) for a, b in zip(s_set, d_set) if a != b
                ][:3]
                print(f"  X {name}: value mismatch, first diffs: {diff}")
        status = "ok" if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"  {'✓' if ok else 'X'} {name}: {len(srows)} rows, {time.time()-t0:.1f}s [{status}]")

    if failures:
        print(f"\nFAILED: {failures}")
        return 1
    print("\nall queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
