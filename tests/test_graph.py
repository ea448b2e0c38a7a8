"""Graph analytics unit tests: triangle census on graphs with known
closed-form answers (the oracle gate covers the fixture-data path;
these pin the combinatorics)."""

from __future__ import annotations

from pandas_etl_framework_spark.graph import triangle_count


def _census(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    return triangle_count(df).collect()[0]


def test_triangle_count_complete_k4(spark):
    # K4: C(4,3)=4 triangles, wedges = 4*C(3,2)=12, coefficient exactly 1
    k4 = [(u, v) for u in range(4) for v in range(u + 1, 4)]
    r = _census(spark, k4)
    assert r["n_edges"] == 6
    assert r["n_triangles"] == 4
    assert r["n_wedges"] == 12
    assert r["clustering_coeff"] == 1.0


def test_triangle_count_path_has_none(spark):
    # a path graph has wedges but no triangles
    r = _census(spark, [(0, 1), (1, 2), (2, 3)])
    assert r["n_triangles"] == 0
    assert r["n_wedges"] == 2
    assert r["clustering_coeff"] == 0.0


def test_triangle_count_hub_with_one_closure(spark):
    # star on 0 (hub degree 5) + one rim edge closing exactly one triangle;
    # exercises the degree-ordered orientation on a skewed-degree graph
    star = [(0, v) for v in range(1, 6)]
    r = _census(spark, star + [(1, 2)])
    assert r["n_edges"] == 6
    assert r["n_triangles"] == 1
    # hub wedges C(5,2)=10, plus one wedge at node 1 and one at node 2
    assert r["n_wedges"] == 12


def test_triangle_count_empty_graph(spark):
    df = _census(spark, [(1, 2)])  # single edge: no wedges at all
    assert df["n_triangles"] == 0
    assert df["n_wedges"] == 0
    assert df["clustering_coeff"] == 0.0
