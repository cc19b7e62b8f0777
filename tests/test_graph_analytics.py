"""KG graph analytics: k-hop BFS ego-network and triangle counting
(operators/graph.py) against hand-enumerated fixtures. The DuckDB value
oracles (kg_khop / kg_triangles in __spark_entry__.py) cover the
customer-digraph replay; these tests pin semantics on graphs small enough
to verify by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.graph import (
    khop_neighbors,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "src long, dst long")


def _seeds(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def test_khop_shortest_hop_distances(spark):
    # 0→1→2→3→4→5 chain plus shortcut 0→4: BFS must label 4 at dist 1
    # (first discovery), 5 at dist 2, and exclude 3 (dist 3) at k=2.
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 4)])
    got = {r["id"]: r["dist"] for r in khop_neighbors(e, _seeds(spark, [0]), k=2).collect()}
    assert got == {0: 0, 1: 1, 4: 1, 2: 2, 5: 2}


def test_khop_early_exit_and_multi_seed(spark):
    # chain exhausts before k; a second seed adds its own ball; seed vertices
    # already visited never re-enter at a later dist.
    e = _edges(spark, [(0, 1), (1, 2), (10, 0)])
    got = {r["id"]: r["dist"] for r in khop_neighbors(e, _seeds(spark, [0, 10]), k=8).collect()}
    assert got == {0: 0, 10: 0, 1: 1, 2: 2}


def test_khop_cycle_terminates(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    got = {r["id"]: r["dist"] for r in khop_neighbors(e, _seeds(spark, [0]), k=5).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_triangle_count_two_triangles(spark):
    # {0,1,2} and {2,3,4}; 4–5 dangles; {1,2,3} is NOT closed (no 1–3 edge).
    e = _edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5)])
    assert triangle_count(e).collect()[0]["n_triangles"] == 2


def test_triangle_count_direction_and_dup_invariant(spark):
    # duplicated and reversed edges collapse before the wedge join
    e = _edges(spark, [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (0, 0)])
    assert triangle_count(e).collect()[0]["n_triangles"] == 1


def test_triangle_count_triangle_free(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    assert triangle_count(e).collect()[0]["n_triangles"] == 0
