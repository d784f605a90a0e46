"""Join-family tests: blocked similarity matching on reference-shaped
company fixtures (FIXTURES.md §B1/B2), merge/upsert semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators import joins


def abr(spark):
    rows = [
        (1, "Acme Pty Ltd"),
        (2, "Beta Industries Pty Ltd"),
        (3, "Gamma Holdings"),
        (4, "Acme Pty Limited"),
    ]
    return spark.createDataFrame(rows, "abr_id long, abr_name string")


def cc(spark):
    rows = [
        (10, "acme pty ltd"),        # exact after normalization
        (11, "Beta Industries"),     # partial
        (12, "Unrelated Webshop"),
    ]
    return spark.createDataFrame(rows, "cc_id long, cc_name string")


def test_blocked_similarity_join_top1(spark):
    out = joins.similarity_join(
        cc(spark), abr(spark), "cc_name", "abr_name",
        block=lambda c: F.substring(F.lower(F.trim(c)), 1, 2),
        threshold=85.0, k=1, left_id="cc_id", right_tiebreak="abr_id",
    )
    got = {(r.cc_id, r.abr_id) for r in out.collect()}
    assert (10, 1) in got            # acme matches Acme Pty Ltd
    assert all(c != 12 for c, _ in got)  # unrelated stays unmatched


def test_nl_similarity_join_no_blocking(spark):
    out = joins.nl_similarity_join(
        cc(spark), abr(spark), "cc_name", "abr_name",
        threshold=60.0, k=1, left_id="cc_id", right_tiebreak="abr_id",
    )
    got = {r.cc_id: r.abr_id for r in out.collect()}
    assert got[10] == 1
    assert got[11] == 2              # Beta Industries -> Beta Industries Pty Ltd


def test_similarity_join_deterministic_tiebreak(spark):
    # two right rows with identical names -> equal scores; lowest id wins
    right = spark.createDataFrame([(1, "Acme"), (2, "Acme")], "rid long, rname string")
    left = spark.createDataFrame([(10, "Acme")], "lid long, lname string")
    out = joins.nl_similarity_join(
        left, right, "lname", "rname", threshold=99.0, k=1,
        left_id="lid", right_tiebreak="rid",
    )
    assert [r.rid for r in out.collect()] == [1]


def test_fk_star_join(spark):
    fact = spark.createDataFrame([(1, 100), (2, 200)], "k long, dim_id long")
    dim = spark.createDataFrame([(100, "x")], "dim_id long, name string")
    out = joins.fk_star_join(fact, [(dim, "dim_id")])
    assert out.count() == 1


def test_merge_upsert_semantics(spark):
    existing = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k long, v string, conf double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 2.5),   # changed -> update
         (3, "c", 3.0),    # unchanged -> keep existing
         (4, "d", 4.0)],   # new -> insert
        "k long, v string, conf double",
    )
    out = joins.merge_upsert(existing, updates, ["k"])
    got = {r.k: (r.v, r.conf) for r in out.collect()}
    assert got == {1: ("a", 1.0), 2: ("b2", 2.5), 3: ("c", 3.0), 4: ("d", 4.0)}


def test_merge_upsert_greater_confidence_wins(spark):
    # reference: entity_matching_tfidf.py:134 — update only if higher conf
    existing = spark.createDataFrame([(1, "old", 0.9)], "k long, v string, conf double")
    lower = spark.createDataFrame([(1, "low", 0.5)], "k long, v string, conf double")
    higher = spark.createDataFrame([(1, "high", 0.95)], "k long, v string, conf double")
    keep = joins.merge_upsert(
        existing, lower, ["k"], prefer_update_when=F.col("u.conf") > F.col("e.conf")
    )
    take = joins.merge_upsert(
        existing, higher, ["k"], prefer_update_when=F.col("u.conf") > F.col("e.conf")
    )
    assert keep.first().v == "old"
    assert take.first().v == "high"


def test_merge_upsert_null_safe_change_detection(spark):
    # NULL -> value and value -> NULL must both count as "changed"
    existing = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    updates = spark.createDataFrame([(1, "now"), (2, None)], "k long, v string")
    out = joins.merge_upsert(existing, updates, ["k"])
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "now", 2: None}


def test_insert_only_rows_anti_join(spark):
    existing = spark.createDataFrame([(1,)], "k long")
    updates = spark.createDataFrame([(1,), (2,)], "k long")
    assert [r.k for r in joins.insert_only_rows(existing, updates, ["k"]).collect()] == [2]


def test_sampled_similarity_join(spark):
    out = joins.sampled_similarity_join(
        cc(spark), abr(spark), "cc_name", "abr_name",
        sample_n=2, threshold=70.0, k=1, left_id="cc_id", right_tiebreak="abr_id",
    )
    # right side limited to 2 rows -> matches only against abr_id 1,2
    assert {r.abr_id for r in out.collect()} <= {1, 2}


# --- asof_join ------------------------------------------------------------

def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 205), (3, "u2", 50), (4, "u3", 10)],
        "lid long, u string, t long",
    )
    right = spark.createDataFrame(
        [("u1", 100, 11, 1.0), ("u1", 200, 12, 2.0), ("u2", 49, 13, 3.0),
         ("u2", 60, 14, 4.0)],
        "u string, t long, rid long, rv double",
    )
    return left, right


def test_asof_backward_basic(spark):
    left, right = _asof_frames(spark)
    out = joins.asof_join(
        left, right, on="t", by=["u"], value_cols=["rid", "rv"], tiebreak="rid"
    )
    got = {r.lid: r.rid for r in out.collect()}
    # lid=1: exact match at t=100 allowed; lid=2: latest <=205 is t=200;
    # lid=3: t=49 <= 50; lid=4 (u3): no right rows -> null
    assert got == {1: 11, 2: 12, 3: 13, 4: None}


def test_asof_backward_excludes_exact_when_disallowed(spark):
    left, right = _asof_frames(spark)
    out = joins.asof_join(
        left, right, on="t", by=["u"], value_cols=["rid"],
        tiebreak="rid", allow_exact_matches=False,
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got[1] is None  # t=100 exact excluded, no earlier u1 row


def test_asof_forward(spark):
    left, right = _asof_frames(spark)
    out = joins.asof_join(
        left, right, on="t", by=["u"], value_cols=["rid"],
        tiebreak="rid", direction="forward",
    )
    got = {r.lid: r.rid for r in out.collect()}
    # lid=1: t=100 exact; lid=2: nothing >=205; lid=3: t=60 >= 50 is
    # nearest forward (t=49 is behind); lid=4: nothing for u3
    assert got == {1: 11, 2: None, 3: 14, 4: None}


def test_asof_tie_takes_greatest_tiebreak(spark):
    left = spark.createDataFrame([(1, "u", 100)], "lid long, u string, t long")
    right = spark.createDataFrame(
        [("u", 90, 7), ("u", 90, 9)], "u string, t long, rid long"
    )
    out = joins.asof_join(left, right, on="t", by=["u"], value_cols=["rid"], tiebreak="rid")
    assert out.collect()[0].rid == 9


def test_asof_null_right_timestamps_dropped(spark):
    left = spark.createDataFrame([(1, "u", 100)], "lid long, u string, t long")
    right = spark.createDataFrame(
        [("u", None, 7)], "u string, t long, rid long"
    )
    out = joins.asof_join(left, right, on="t", by=["u"], value_cols=["rid"], tiebreak="rid")
    assert out.collect()[0].rid is None


def test_asof_tolerance(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, "u", "2024-01-10 00:00:00"), (2, "u", "2024-01-30 00:00:00")],
        "lid long, u string, ts string",
    ).select("lid", "u", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("u", "2024-01-08 00:00:00", 5)], "u string, ts string, rid long"
    ).select("u", F.col("ts").cast("timestamp").alias("ts"), F.col("rid"))
    out = joins.asof_join(
        left, right, on="ts", by=["u"], value_cols=["rid"], tiebreak="rid",
        tolerance=F.expr("INTERVAL 7 DAYS"),
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == {1: 5, 2: None}  # 2 days in range; 22 days beyond tolerance


# --- point_in_interval_join ----------------------------------------------

def _range_frames(spark):
    from pyspark.sql import functions as F

    points = spark.createDataFrame(
        [(1, "u", "2024-01-01 10:30:00"), (2, "u", "2024-01-01 12:00:00"),
         (3, "v", "2024-01-01 10:30:00")],
        "pid long, u string, ts string",
    ).select("pid", "u", F.col("ts").cast("timestamp").alias("ts"))
    intervals = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", "2024-01-01 11:00:00", 100),
         ("u", "2024-01-01 10:30:00", "2024-01-01 10:30:00", 200),
         ("w", "2024-01-01 10:00:00", "2024-01-01 11:00:00", 300)],
        "u string, s string, e string, iid long",
    ).select("u", F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"), "iid")
    return points, intervals


def test_range_join_containment_and_bounds(spark):
    points, intervals = _range_frames(spark)
    out = joins.point_in_interval_join(
        points, intervals, point_ts="ts", start_ts="s", end_ts="e",
        by=["u"], bucket_seconds=3600,
    )
    got = sorted((r.pid, r.iid) for r in out.collect())
    # pid=1 in both u intervals (zero-length one matches exactly at bound);
    # pid=2 outside; pid=3 is user v (no intervals)
    assert got == [(1, 100), (1, 200)]


def test_range_join_interval_spanning_buckets(spark):
    from pyspark.sql import functions as F

    points = spark.createDataFrame(
        [(1, "2024-01-01 13:59:00")], "pid long, ts string"
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    intervals = spark.createDataFrame(
        [("2024-01-01 09:30:00", "2024-01-01 14:30:00", 1)],
        "s string, e string, iid long",
    ).select(F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"), "iid")
    # 5-hour interval with a 1-hour bucket: the point's bucket (13:00)
    # is in the middle of the covered bucket sequence
    out = joins.point_in_interval_join(
        points, intervals, point_ts="ts", start_ts="s", end_ts="e",
        bucket_seconds=3600,
    )
    assert [(r.pid, r.iid) for r in out.collect()] == [(1, 1)]


def test_range_join_no_duplicate_pairs(spark):
    points, intervals = _range_frames(spark)
    out = joins.point_in_interval_join(
        points, intervals, point_ts="ts", start_ts="s", end_ts="e",
        by=["u"], bucket_seconds=60,  # tiny buckets: intervals span many
    )
    rows = [(r.pid, r.iid) for r in out.collect()]
    assert sorted(rows) == [(1, 100), (1, 200)]
    assert len(rows) == len(set(rows))  # one output row per (point, interval)


def test_apply_cdc_semantics(spark):
    from firmable_aus_etl_spark.operators.joins import apply_cdc

    existing = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    changes = spark.createDataFrame(
        [(2, "U", "b2", 21.0), (3, "D", None, None), (4, "I", "d", 40.0)],
        "id long, op string, name string, v double",
    )
    got = {
        r.id: (r.name, r.v)
        for r in apply_cdc(existing, changes, ["id"]).collect()
    }
    assert got == {
        1: ("a", 10.0),     # untouched
        2: ("b2", 21.0),    # updated
        4: ("d", 40.0),     # inserted
    }                       # 3 deleted


def test_interval_overlap_join_matches_brute_force(spark):
    from firmable_aus_etl_spark.operators.joins import interval_overlap_join

    # intervals engineered to span MANY buckets (width 10s, bucket 3s)
    # so the first-shared-bucket dedup is exercised hard
    lrows = [(i, i * 4, i * 4 + 10) for i in range(40)]
    rrows = [(100 + i, i * 5 + 2, i * 5 + 9) for i in range(40)]
    mk = lambda rows, a, s, e: spark.createDataFrame(
        rows, f"{a} long, __s long, __e long"
    ).select(
        F.col(a),
        F.timestamp_seconds(F.col("__s")).alias(s),
        F.timestamp_seconds(F.col("__e")).alias(e),
    )
    left = mk(lrows, "a_id", "ls", "le")
    right = mk(rrows, "b_id", "rs", "re")
    got = {
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            left, right,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_seconds=3,
        ).collect()
    }
    want = {
        (a, bid)
        for a, als, ale in lrows
        for bid, brs, bre in rrows
        if als <= bre and brs <= ale
    }
    assert got == want and len(got) > 0
    # no duplicate pairs despite multi-bucket spans
    rows = interval_overlap_join(
        left, right,
        left_start="ls", left_end="le",
        right_start="rs", right_end="re",
        bucket_seconds=3,
    ).collect()
    assert len(rows) == len({(r.a_id, r.b_id) for r in rows})


def test_interval_overlap_join_no_nested_loop(spark):
    from firmable_aus_etl_spark import plans
    from firmable_aus_etl_spark.queries import QUERIES

    plan = plans.physical_plan(
        QUERIES["overlapping_activity_windows"](spark, "/root/testdata/sf0.001")
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_unblocked_similarity_join_gated_when_both_sides_big(spark):
    """Round-6 verdict #9: the block=None cross join raises when BOTH
    sides exceed max_rows (quadratic plan); one tiny side (the
    broadcast nested-loop case) stays allowed."""
    import pytest

    big_l = spark.range(50).selectExpr("CAST(id AS STRING) AS lname")
    big_r = spark.range(50).selectExpr("CAST(id AS STRING) AS rname")
    with pytest.raises(ValueError, match="BOTH sides exceed"):
        joins.similarity_join(
            big_l, big_r, "lname", "rname", block=None, max_rows=10
        )
    # one side tiny -> allowed (linear in the big side)
    small_r = big_r.limit(3)
    out = joins.similarity_join(
        big_l, small_r, "lname", "rname",
        block=None, max_rows=10, threshold=0.0, k=1,
    )
    assert out.count() == 50
    # explicit override runs the deliberate quadratic twin
    out2 = joins.similarity_join(
        big_l.limit(12), big_r.limit(12), "lname", "rname",
        block=None, max_rows=None, threshold=0.0, k=1,
    )
    assert out2.count() == 12


def test_salted_block_join_matches_unsalted(spark):
    """Round-7 verdict #2: block_cap grid-salting must be invisible in
    the result — same pair set, same scores, same top-1 winners — on a
    DEGENERATE one-hot-block fixture (every name shares the block key,
    the SURVEY §7.4 'TH'-prefix failure mode)."""
    left = spark.range(40).selectExpr(
        "id AS lid", "concat('co ', CAST(id AS STRING)) AS lname"
    )
    right = spark.range(60).selectExpr(
        "id AS rid", "concat('co ', CAST(id * 2 AS STRING)) AS rname"
    )
    kw = dict(
        block=lambda c: F.substring(c, 1, 2),  # 'co' for every row
        threshold=50.0, k=1, left_id="lid", right_tiebreak="rid",
    )
    plain = joins.similarity_join(left, right, "lname", "rname", **kw)
    salted = joins.similarity_join(
        left, right, "lname", "rname", block_cap=8, **kw
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_block_join_tiles_bound_candidates(spark):
    """Each (tile_l, tile_r) cell of a hot block holds at most
    ~cap x cap candidate pairs: tile counts are ceil(n/cap) and the
    row hash spreads rows across tiles."""
    left = spark.range(100).selectExpr(
        "id AS lid", "concat('co ', CAST(id AS STRING)) AS lname"
    )
    right = spark.range(100).selectExpr(
        "id AS rid", "concat('co ', CAST(id AS STRING)) AS rname"
    )
    cells = joins._salted_block_join(
        left, right, "lname", "rname",
        prepare=lambda c: c,
        block=lambda c: F.substring(c, 1, 2),
        block_cap=25,
    )
    per_cell = (
        cells.groupBy("l.__blk", "l.__tile_l", "l.__tile_r")
        .count()
        .collect()
    )
    # 4x4 grid; every cell well under the unsalted 100*100 fan-out,
    # bounded by (hash-balance slack) * cap^2
    assert len(per_cell) == 16
    assert max(r["count"] for r in per_cell) < 4 * 25 * 25
    total = sum(r["count"] for r in per_cell)
    assert total == 100 * 100  # every pair exactly once


def test_salted_block_join_null_blocks_dropped(spark):
    """NULL block keys never match in the unsalted equality join; the
    salted path must agree (explicit filter)."""
    left = spark.createDataFrame(
        [(1, "co x"), (2, None)], "lid long, lname string"
    )
    right = spark.createDataFrame(
        [(10, "co x"), (11, None)], "rid long, rname string"
    )
    out = joins.similarity_join(
        left, right, "lname", "rname",
        block=lambda c: F.substring(c, 1, 2),
        block_cap=1, threshold=0.0, k=1, left_id="lid", right_tiebreak="rid",
    )
    got = {(r.lid, r.rid) for r in out.collect()}
    assert got == {(1, 10)}
