"""Graph analytics: edge canonicalization, wedge/triangle counting,
summary profile (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators import graph
from firmable_aus_etl_spark.operators.graph import (
    graph_summary,
    triangle_count,
    undirected_simple_edges,
    wedge_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_canonicalize_drops_loops_merges_directions(spark):
    raw = _edges(spark, [(1, 2), (2, 1), (3, 3), (2, 3), (2, 3)])
    rows = sorted(tuple(r) for r in undirected_simple_edges(raw).collect())
    assert rows == [(1, 2), (2, 3)]


def test_triangle_count_k4(spark):
    # complete graph on 4 vertices: C(4,3) = 4 triangles, 12 wedges
    k4 = _edges(
        spark, [(a, b) for a in range(4) for b in range(a + 1, 4)]
    )
    assert triangle_count(k4).collect()[0].n_triangles == 4
    assert wedge_count(k4).collect()[0].n_wedges == 12


def test_triangle_count_path_graph_zero(spark):
    path = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert triangle_count(path).collect()[0].n_triangles == 0
    assert wedge_count(path).collect()[0].n_wedges == 2


def test_summary_single_triangle(spark):
    # messy input: duplicates, reversed, self-loop — one triangle
    raw = _edges(spark, [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (2, 2)])
    row = graph_summary(raw).collect()[0]
    assert (
        row.n_nodes,
        row.n_edges,
        row.n_wedges,
        row.n_triangles,
        row.clustering_coeff,
    ) == (3, 3, 3, 1, 1.0)


def test_summary_empty_graph(spark):
    row = graph_summary(_edges(spark, [])).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        0, 0, 0, 0,
    )
    assert row.clustering_coeff == 0.0


def test_orientations_agree_on_random_graph(spark):
    # pseudo-random graph: same triangle count under id- and
    # degree-ranked wedge enumeration
    state, pairs = 7, set()
    for _ in range(300):
        state = (state * 1103515245 + 12345) % (1 << 31)
        x = (state >> 7) % 40
        state = (state * 1103515245 + 12345) % (1 << 31)
        y = (state >> 7) % 40
        if x != y:
            pairs.add((min(x, y), max(x, y)))
    e = _edges(spark, sorted(pairs))
    t_deg = triangle_count(e, orient="degree").collect()[0].n_triangles
    t_id = triangle_count(e, orient="id").collect()[0].n_triangles
    assert t_deg == t_id > 0


def test_degree_orientation_bounds_hub_wedges(spark):
    # star graph with the hub at the LOWEST id — the adversarial case
    # for id-ranked orientation: the hub enumerates C(n,2) wedges.
    # Degree ranking points every edge AT the hub, so no vertex has
    # two out-neighbors: zero wedge rows, same (zero) triangle count.
    from pyspark.sql import functions as F

    from firmable_aus_etl_spark.operators.graph import _degree_directed

    n = 200
    star = _edges(spark, [(0, i) for i in range(1, n + 1)])

    def wedge_rows(d):
        e1 = d.select("u", F.col("v").alias("y"), F.col("__r").alias("__ry"))
        e2 = d.select("u", F.col("v").alias("z"), F.col("__r").alias("__rz"))
        return e1.join(e2, "u").filter(F.col("__ry") < F.col("__rz")).count()

    d_id = star.select(
        F.col("a").alias("u"), F.col("b").alias("v"), F.col("b").alias("__r")
    )
    dd = _degree_directed(star)
    d_deg = dd.select("u", "v", F.struct("dv", "v").alias("__r"))
    assert wedge_rows(d_id) == n * (n - 1) // 2  # hub fan-out blowup
    assert wedge_rows(d_deg) == 0                # bounded out-degrees
    assert triangle_count(star, orient="degree").collect()[0].n_triangles == 0
    assert triangle_count(star, orient="id").collect()[0].n_triangles == 0


def test_zipf_graph_degree_orientation_bounds_wedges(spark):
    """Round-5 verdict #7: power-law (Zipf-degree) co-purchase-shaped
    graph — hubs draw LOW ids (the adversarial alignment for id-ranked
    orientation, and the natural one: popular parts get created
    early/often). Degree orientation must shrink BOTH the total wedge
    rows and the worst per-root fan-out by a large factor while
    counting identical triangles. Measured numbers recorded in
    SKEW.md."""
    from pyspark.sql import functions as F

    from firmable_aus_etl_spark.operators.graph import _degree_directed

    # deterministic Zipf-ish multigraph: node i targets j < i with
    # preferential attachment via an LCG — low ids accumulate high
    # degree (deg ~ 1/rank), like co-purchase part popularity
    state, pairs = 99, set()
    n = 400
    for i in range(1, n):
        state = (state * 1103515245 + 12345) % (1 << 31)
        for _ in range(1 + (state >> 9) % 3):
            state = (state * 1103515245 + 12345) % (1 << 31)
            # preferential: square the unit draw so low ids dominate
            frac = ((state >> 7) % 10_000) / 10_000.0
            j = int(i * frac * frac)
            if j != i:
                pairs.add((min(i, j), max(i, j)))
    e = _edges(spark, sorted(pairs))

    def wedge_stats(d):
        e1 = d.select("u", F.col("v").alias("y"), F.col("__r").alias("__ry"))
        e2 = d.select("u", F.col("v").alias("z"), F.col("__r").alias("__rz"))
        w = e1.join(e2, "u").filter(F.col("__ry") < F.col("__rz"))
        per_root = w.groupBy("u").count()
        row = per_root.agg(
            F.coalesce(F.sum("count"), F.lit(0)).alias("total"),
            F.coalesce(F.max("count"), F.lit(0)).alias("max_root"),
        ).collect()[0]
        return int(row.total), int(row.max_root)

    d_id = e.select(
        F.col("a").alias("u"), F.col("b").alias("v"), F.col("b").alias("__r")
    )
    dd = _degree_directed(e)
    d_deg = dd.select("u", "v", F.struct("dv", "v").alias("__r"))
    tot_id, max_id = wedge_stats(d_id)
    tot_deg, max_deg = wedge_stats(d_deg)
    m = e.count()
    # degree orientation: a large reduction in total wedge rows and
    # the hot-root bound every task-time argument rests on
    assert tot_deg * 3 < tot_id, (tot_deg, tot_id)
    assert max_deg * 10 < max_id, (max_deg, max_id)
    # sqrt(2m) out-degree bound => per-root wedges <= C(sqrt(2m), 2)
    bound = 2 * m
    assert max_deg <= bound, (max_deg, bound)
    # identical triangle counts
    t_deg = triangle_count(e, orient="degree").collect()[0].n_triangles
    t_id = triangle_count(e, orient="id").collect()[0].n_triangles
    assert t_deg == t_id > 0
    print(f"ZIPF-WEDGES m={m} id=(total {tot_id}, max {max_id}) "
          f"degree=(total {tot_deg}, max {max_deg}) triangles={t_deg}")


def test_pagerank_hub_dominates_and_mass_bounded(spark):
    from firmable_aus_etl_spark.operators.graph import pagerank

    # star + tail: hub 0 must out-rank everything; total mass stays
    # <= 1.0 (floor division only ever drops mass) and > 0.9
    star = _edges(spark, [(0, i) for i in range(1, 30)] + [(30, 31)])
    rows = {r.node: r.rank_e12 for r in pagerank(star, iters=5).collect()}
    assert max(rows, key=rows.get) == 0
    total = sum(rows.values()) / 1e12
    assert 0.9 < total <= 1.0


def test_pagerank_deterministic_under_repartition(spark):
    from firmable_aus_etl_spark.operators.graph import pagerank

    e = _edges(spark, [(i, (i * 7 + 3) % 50) for i in range(50) if i != (i * 7 + 3) % 50])
    canon = undirected_simple_edges(e)
    a = sorted(map(tuple, pagerank(canon, iters=4).collect()))
    b = sorted(map(tuple, pagerank(canon.repartition(7), iters=4).collect()))
    assert a == b


def test_cooccurrence_pairs_matches_self_join(spark):
    """Round-6 perf rewrite: one-groupBy in-array pair expansion must
    produce exactly the self-join's weighted pair set; the group-size
    cap drops viral groups deliberately."""
    df = spark.createDataFrame(
        [
            (1, 10), (1, 20), (1, 30), (1, 20),   # dup item in group
            (2, 20), (2, 30),
            (3, 30), (3, 20),
            (4, 99),                               # singleton group
        ],
        "grp long, item long",
    )
    got = sorted(
        tuple(r)
        for r in graph.cooccurrence_pairs(df, "grp", "item").collect()
    )
    d = df.distinct()
    a, b = d.alias("x"), d.alias("y")
    ref = sorted(
        tuple(r)
        for r in a.join(
            b,
            (F.col("x.grp") == F.col("y.grp"))
            & (F.col("x.item") < F.col("y.item")),
        )
        .groupBy(F.col("x.item").alias("a"), F.col("y.item").alias("b"))
        .agg(F.count("*").alias("w"))
        .collect()
    )
    assert got == ref
    # min_count filter
    got2 = sorted(
        tuple(r)
        for r in graph.cooccurrence_pairs(df, "grp", "item", min_count=2).collect()
    )
    assert got2 == [t for t in ref if t[2] >= 2]
    # cap drops the size-3 group entirely
    got3 = {
        (r.a, r.b)
        for r in graph.cooccurrence_pairs(
            df, "grp", "item", max_items_per_group=2
        ).collect()
    }
    assert got3 == {(20, 30)}
