"""Z-order layout (operators/layout.py): Morton-value correctness,
curve locality, and the MEASURED pruning claim — parquet row-group
min/max stats prune on EVERY interleaved dimension of a Z-ordered
layout, where a 1-D sort prunes only its own column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators import layout as L


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 5)], "a long, b long")
    # ranges chosen so bucket == value (span 2^bits with the epsilon)
    z = df.select(
        L.zorder_value(
            [F.col("a"), F.col("b")], [(0, 7), (0, 7)], bits=3
        ).alias("z")
    ).collect()[0].z
    # a=3 (011), b=5 (101) -> interleave a at even positions, b at odd:
    # bit i of a -> 2i, bit i of b -> 2i+1:
    # a bits: 1@0,1@1,0@2 -> 1@0, 1@2 ; b bits: 1@0,0@1,1@2 -> 1@1, 1@5
    assert z == (1 << 0) | (1 << 2) | (1 << 1) | (1 << 5)


def test_zorder_locality_beats_linear_sort(spark):
    """Monotone locality sanity: points close in BOTH dimensions get
    close z-values, and a quadrant maps to a contiguous-ish z range
    (the property row-group pruning exploits)."""
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select(
        "a", "b",
        L.zorder_value([F.col("a"), F.col("b")], [(0, 15), (0, 15)], bits=4).alias("z"),
    ).collect()
    zmap = {(r.a, r.b): r.z for r in out}
    # the low quadrant occupies exactly the lowest quarter of z-space
    low_quad = {zmap[(x, y)] for x in range(8) for y in range(8)}
    assert max(low_quad) < min(
        zmap[(x, y)] for x in range(16) for y in range(16) if x >= 8 or y >= 8
    )


def _straddling_row_groups(path: str, col: str, rng) -> tuple[int, int]:
    """(matching_row_groups, total_row_groups) whose [min,max] stats on
    ``col`` intersect the range — what a parquet reader must scan."""
    match = total = 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ic = names.index(col)
        for rg in range(md.num_row_groups):
            total += 1
            st = md.row_group(rg).column(ic).statistics
            if st.min <= rng[1] and st.max >= rng[0]:
                match += 1
    return match, total


def test_zordered_write_bounds_pruning_on_every_dimension(spark, tmp_path):
    """The measured layout claim (SURVEY's index analog): a 1-D sort
    prunes perfectly on ITS column and not at all on any other; the
    Z-order prunes meaningfully on EVERY interleaved column. Measured
    on real parquet row-group min/max stats (the mechanism any reader
    uses). Representative numbers (8 files x ~2-3 groups, 10%-range
    predicates): linear a 3/17, b 17/17 (zero pruning); z-order
    a 8/18, b 5/18 — the per-dimension-optimality trade Z-order makes
    to bound the worst dimension."""
    state, rows = 9, []
    for i in range(40_000):
        state = (state * 1103515245 + 12345) % (1 << 31)
        a = (state >> 7) % 1000
        state = (state * 1103515245 + 12345) % (1 << 31)
        b = (state >> 7) % 1000
        rows.append((a, b, i))
    df = spark.createDataFrame(rows, "a long, b long, payload long")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "2500")

    lin = str(tmp_path / "linear")
    (
        df.repartitionByRange(8, "a").sortWithinPartitions("a")
        .write.mode("overwrite").parquet(lin)
    )
    zo = str(tmp_path / "zordered")
    L.write_zordered(df, zo, ["a", "b"], bits=8, partitions=8)

    rng = (100, 199)  # 10% of each dimension
    lin_b, lin_total = _straddling_row_groups(lin, "b", rng)
    zo_b, zo_total = _straddling_row_groups(zo, "b", rng)
    zo_a, _ = _straddling_row_groups(zo, "a", rng)
    assert lin_total >= 8 and zo_total >= 8
    # the 1-D sort cannot prune b AT ALL
    assert lin_b == lin_total
    # the z-order prunes b by a real multiple...
    assert zo_b * 3 <= zo_total, (zo_b, zo_total)
    # ...and still prunes a (bounded, though below a pure a-sort)
    assert zo_a < zo_total, (zo_a, zo_total)

    # and the data itself round-trips identically
    back = spark.read.parquet(zo)
    assert back.count() == 40_000
    got = back.filter(F.col("a").between(*rng) & F.col("b").between(*rng)).count()
    expect = df.filter(F.col("a").between(*rng) & F.col("b").between(*rng)).count()
    assert got == expect
