"""Behavioral edge tests for the feature-engineering / time-series
query batch (split, LOO, chunking, redaction, islands, forward fill,
mode) beyond the registry execution + oracle-hash gates."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from firmable_aus_etl_spark.datasets import load_table
from firmable_aus_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_split_is_exhaustive_and_roughly_proportioned(spark):
    rows = QUERIES["train_test_split_hash"](spark, SF).collect()
    by = {r.split: r.n_docs for r in rows}
    total = load_table(spark, SF, "documents").count()
    assert sum(by.values()) == total
    # md5 buckets are uniform; at n=500 allow generous slack around
    # the 204/26/26-in-256 design fractions
    assert 0.70 <= by["train"] / total <= 0.88
    assert by.get("val", 0) > 0 and by.get("test", 0) > 0


def test_split_is_stable_across_runs(spark):
    a = {(r.split, r.n_docs) for r in QUERIES["train_test_split_hash"](spark, SF).collect()}
    b = {(r.split, r.n_docs) for r in QUERIES["train_test_split_hash"](spark, SF).collect()}
    assert a == b


def test_loo_excludes_own_row(spark):
    out = {r.o_orderkey: r for r in QUERIES["loo_avg_order_value"](spark, SF).collect()}
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).collect()
    from collections import defaultdict

    per_cust = defaultdict(list)
    for r in orders:
        per_cust[r.o_custkey].append((r.o_orderkey, round(r.o_totalprice * 100) ))
    checked = 0
    for cust, rows in per_cust.items():
        if len(rows) < 2:
            # single-order customers must be absent (n-1 division)
            assert all(k not in out for k, _ in rows)
            continue
        total = sum(c for _, c in rows)
        for k, cents in rows:
            want = (total - cents) / (len(rows) - 1) / 100.0
            assert abs(out[k].loo_avg - want) < 1e-9
            checked += 1
        if checked > 200:
            break
    assert checked > 0


def test_chunks_match_manual_slices(spark):
    docs = load_table(spark, SF, "documents").filter(F.col("lang") == "en")
    one = docs.orderBy("doc_id").first()
    toks = one.text.split(" ")
    got = {
        (r.chunk_idx, r.chunk_len, r.chunk_md5)
        for r in QUERIES["doc_chunks_overlap"](spark, SF)
        .filter(F.col("doc_id") == one.doc_id)
        .collect()
    }
    want = set()
    for idx, start in enumerate(range(0, len(toks), 25)):
        chunk = toks[start : start + 50]
        want.add(
            (idx, len(chunk), hashlib.md5(" ".join(chunk).encode()).hexdigest())
        )
    assert got == want and got
    # 50% overlap: consecutive full chunks share 25 tokens
    lens = sorted(r[1] for r in got)
    assert lens[-1] <= 50


def test_redaction_leaves_no_contact_patterns(spark):
    import re

    rows = QUERIES["pii_redact_documents"](spark, SF).collect()
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\+?[0-9][0-9 ]{7,14}[0-9]")
    assert rows
    for r in rows[:200]:
        assert "[EMAIL]" in r.redacted
        assert "[PHONE]" in r.redacted
        assert not email.search(r.redacted)
        assert not phone.search(r.redacted)


def test_islands_bounds(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    spans = {
        r.user_id: (r.n, r.lo, r.hi)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.min("us").alias("lo"), F.max("us").alias("hi"))
        .collect()
    }
    FIVE_MIN = 300_000_000
    for r in QUERIES["interval_islands_events"](spark, SF).collect():
        n, lo, hi = spans[r.user_id]
        assert 1 <= r.n_islands <= n
        # every island covers at least one 5-min interval; total
        # coverage fits in the stretched span
        assert r.covered_us >= FIVE_MIN
        assert r.covered_us <= (hi - lo) + FIVE_MIN


def test_forward_fill_carries_last_reading(spark):
    out = QUERIES["forward_fill_events"](spark, SF)
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    one_user = ev.groupBy("user_id").count().orderBy(F.desc("count")).first().user_id
    rows = sorted(
        ev.filter(F.col("user_id") == one_user).collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    got = {r.event_id: r.filled for r in out.filter(F.col("user_id") == one_user).collect()}
    carried = None
    for r in rows:
        if r.event_type != "error":
            carried = r.value
        assert got[r.event_id] == carried  # None before any reading
    assert any(r.event_type == "error" for r in rows)


def test_mode_tie_break_is_alphabetical(spark):
    rows = QUERIES["mode_event_type_per_user"](spark, SF).collect()
    counts = {
        (r.user_id, r.event_type): r.n
        for r in load_table(spark, SF, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        best = max(
            (n, t) for (u, t), n in counts.items() if u == r.user_id
        )[0]
        assert r.n_occurrences == best
        tied = sorted(
            t for (u, t), n in counts.items() if u == r.user_id and n == best
        )
        assert r.mode_event_type == tied[0]


def test_cluster_aware_split_no_straddling(spark):
    """Leakage proof: no near-dup cluster may have members in more
    than one split — the property the cluster-keyed hash guarantees
    by construction and a doc-keyed split cannot."""
    from pyspark.sql import functions as F

    from firmable_aus_etl_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    clusters = QUERIES["near_dup_clusters"](spark, sf)
    bucket = F.conv(
        F.substring(F.md5(F.col("cluster").cast("string")), 1, 2), 16, 10
    ).cast("int")
    split = F.when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
    straddling = (
        clusters.select("cluster", split.alias("split"))
        .groupBy("cluster")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddling == 0
