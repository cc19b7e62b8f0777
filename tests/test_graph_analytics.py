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


def test_label_propagation_splits_bridged_cliques(spark):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.graph import (
        label_propagation,
    )

    # two 4-cliques {0..3} and {10..13} joined by one thin bridge 3–10:
    # connected components would merge everything; LPA keeps two communities.
    clique = lambda ids: [(a, b) for a in ids for b in ids if a < b]  # noqa: E731
    e = _edges(spark, clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)])
    got = {r["id"]: r["label"] for r in label_propagation(e, iters=6).collect()}
    left = {got[i] for i in (0, 1, 2)}
    right = {got[i] for i in (11, 12, 13)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_label_propagation_deterministic_tiebreak(spark):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.graph import (
        label_propagation,
    )

    # vertex 2 sees labels {0, 1} with equal weight → adopts the smaller (0);
    # one round, synchronous: 0 and 1 swap-adopt each other's via 2? no —
    # 0's only neighbor is 2 (label 2), 1's only neighbor is 2 (label 2).
    e = _edges(spark, [(0, 2), (1, 2)])
    got = {r["id"]: r["label"] for r in label_propagation(e, iters=1).collect()}
    assert got == {0: 2, 1: 2, 2: 0}


def test_label_propagation_weight_beats_count(spark):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.graph import (
        label_propagation,
    )

    # vertex 0: two unit-weight neighbors with label 1,2 vs one weight-5
    # neighbor with label 9 → weighted LPA adopts 9.
    e = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0), (0, 9, 5.0)], "src long, dst long, w double"
    )
    got = {r["id"]: r["label"] for r in label_propagation(e, iters=1, weight="w").collect()}
    assert got[0] == 9
