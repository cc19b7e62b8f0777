"""Fixed-iteration Lloyd k-means (simsearch.kmeans_fit): convergence to
cluster means on a separable fixture, lowest-cid tie rule, empty-cluster
fallback to the previous centroid, and the bounded long-format output."""

import math

import numpy as np

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.simsearch import (
    kmeans_centroid_table,
    kmeans_fit,
)

# two crisp cosine clusters in 4-d: axis-0-ish and axis-2-ish
CLUSTER_A = [[1.0, 0.1, 0.0, 0.0], [0.9, 0.2, 0.0, 0.1], [1.0, 0.0, 0.1, 0.0]]
CLUSTER_B = [[0.0, 0.1, 1.0, 0.2], [0.1, 0.0, 0.9, 0.1], [0.0, 0.0, 1.0, 0.0]]


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_converges_to_cluster_means(spark):
    # ids 0 (cluster A) and 1 (cluster B's first vector placed at id 1)
    vecs = [CLUSTER_A[0], CLUSTER_B[0], CLUSTER_A[1], CLUSTER_A[2], CLUSTER_B[1], CLUSTER_B[2]]
    fitted = kmeans_fit(_emb(spark, vecs), k=2, iters=3, dim=4)
    assert [cid for cid, _, _ in fitted] == [0, 1]
    by_cid = {cid: (cv, n) for cid, cv, n in fitted}
    assert by_cid[0][1] == 3 and by_cid[1][1] == 3
    mean_a = [sum(col) / 3 for col in zip(*CLUSTER_A)]
    mean_b = [sum(col) / 3 for col in zip(*CLUSTER_B)]
    for got, want in ((by_cid[0][0], mean_a), (by_cid[1][0], mean_b)):
        assert all(math.isclose(g, w, abs_tol=1e-8) for g, w in zip(got, want))


def test_empty_cluster_keeps_previous_centroid(spark):
    # vec 2 duplicates vec 0: centroid 2 ties centroid 0 on every A-point in
    # the FIRST assignment and loses (lowest cid wins), so the update leaves
    # cluster 2 empty and its centroid must stay at the bit-exact init vector
    # while centroid 0 moves to the (rounded) A-mean. The final census then
    # flips the two exact-duplicate points back to the untouched centroid 2
    # (cosine exactly 1.0 beats the moved mean) — asserting that too pins the
    # argmax tie/ordering semantics.
    vecs = [CLUSTER_A[0], CLUSTER_B[0], CLUSTER_A[0], CLUSTER_A[1], CLUSTER_B[1]]
    fitted = kmeans_fit(_emb(spark, vecs), k=3, iters=1, dim=4)
    by_cid = {cid: (cv, n) for cid, cv, n in fitted}
    assert by_cid[2][0] == [float(np.float32(x)) for x in CLUSTER_A[0]]  # untouched init (float32-cast)
    mean_a = [round(sum(float(np.float32(x)) for x in col) / 3, 9)
              for col in zip(*[CLUSTER_A[0]] * 2 + [CLUSTER_A[1]])]
    assert all(math.isclose(g, w, abs_tol=1e-9) for g, w in zip(by_cid[0][0], mean_a))
    assert by_cid[2][1] == 2  # the duplicates return to the exact centroid
    assert by_cid[0][1] + by_cid[1][1] + by_cid[2][1] == 5


def test_centroid_table_shape_and_determinism(spark):
    vecs = CLUSTER_A + CLUSTER_B
    df = kmeans_centroid_table(_emb(spark, vecs), k=2, iters=2, dim=4)
    rows = sorted(map(tuple, df.collect()))
    assert len(rows) == 2 * 4  # k x dim long format, bounded by construction
    assert rows == sorted(
        map(tuple, kmeans_centroid_table(_emb(spark, vecs), k=2, iters=2, dim=4).collect())
    )
    assert df.schema.simpleString() == (
        "struct<cid:int,dim_idx:int,c_val:double,n_points:bigint>"
    )
