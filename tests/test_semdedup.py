"""SemDeDup (simsearch.semdedup): the upper-triangular within-cluster rule
— lowest-id cluster member always kept, removal compares against ALL
lower-id cluster-mates (not just survivors), cross-cluster near-identical
vectors never pair, and the plan's only join is cluster-keyed (no
cartesian)."""

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.simsearch import (
    semdedup,
)

AXIS_X = [1.0, 0.0, 0.0, 0.0]
AXIS_X2 = [0.99, 0.01, 0.0, 0.0]  # near-dup of AXIS_X
AXIS_X3 = [0.98, 0.02, 0.0, 0.0]  # near-dup of both
AXIS_Y = [0.0, 1.0, 0.0, 0.0]
AXIS_Y2 = [0.01, 0.99, 0.0, 0.0]  # near-dup of AXIS_Y


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _run(spark, vecs, threshold=0.9, k=2, iters=2):
    out = semdedup(_emb(spark, vecs), threshold=threshold, k=k, iters=iters, dim=4)
    return {int(r["vec_id"]): r.asDict() for r in out.collect()}


def test_keeps_lowest_id_removes_later_dups(spark):
    # ids 0(X) 1(Y) 2(X') 3(X'') 4(Y'): two crisp clusters; within each the
    # lowest id survives and every later near-dup is removed
    by_id = _run(spark, [AXIS_X, AXIS_Y, AXIS_X2, AXIS_X3, AXIS_Y2])
    assert [by_id[i]["removed"] for i in range(5)] == [0, 0, 1, 1, 1]
    assert by_id[0]["max_prior_cos"] == -1.0  # lowest id of its cluster
    assert by_id[1]["max_prior_cos"] == -1.0
    assert by_id[2]["max_prior_cos"] > 0.9
    # removal is against ALL lower-id cluster-mates: id 3's max must exceed
    # its cosine to the kept id 0 alone — the already-removed id 2 is closer
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        n = (sum(x * x for x in a) * sum(y * y for y in b)) ** 0.5
        return d / n

    assert cos(AXIS_X3, AXIS_X2) > cos(AXIS_X3, AXIS_X)
    assert by_id[3]["max_prior_cos"] > round(cos(AXIS_X3, AXIS_X), 5)
    # the two clusters stayed separate
    assert by_id[0]["cluster"] != by_id[1]["cluster"]
    assert by_id[2]["cluster"] == by_id[0]["cluster"]
    assert by_id[4]["cluster"] == by_id[1]["cluster"]


def test_threshold_boundary_is_strict(spark):
    # cos(X, Y) = 0 exactly; with threshold 0.0 a strictly-greater rule
    # keeps the orthogonal pair (0 > 0 is false) when both land in one cluster
    by_id = _run(spark, [AXIS_X, AXIS_Y], threshold=0.0, k=1, iters=1)
    assert by_id[0]["removed"] == 0
    assert by_id[1]["removed"] == 0
    assert by_id[1]["max_prior_cos"] == 0.0


def test_plan_join_is_cluster_keyed(spark):
    out = semdedup(_emb(spark, [AXIS_X, AXIS_Y, AXIS_X2, AXIS_Y2]), k=2, iters=1, dim=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
