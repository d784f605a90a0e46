"""Graph analytics: edge canonicalization, wedge/triangle counting,
summary profile (operators/graph.py)."""

from __future__ import annotations

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
