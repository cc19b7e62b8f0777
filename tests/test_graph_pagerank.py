"""PageRank over the person graph (operators/graph.py:pagerank) vs an
independent NumPy power iteration with identical conventions (uniform start,
dangling-mass redistribution, damping 0.85)."""

from __future__ import annotations

import numpy as np
import pytest

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.graph import (
    pagerank,
)

# (src, dst, weight): a cycle, a dangling sink (3), and a source-only node (4)
EDGES = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 3, 2.0), (4, 0, 1.0)]
N = 5


def numpy_pagerank(n, edges, damping=0.85, iters=30):
    out = np.zeros(n)
    for s, _, w in edges:
        out[s] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.zeros(n)
        for s, d, w in edges:
            new[d] += r[s] * w / out[s]
        dang = r[out == 0].sum()
        r = (1 - damping) / n + damping * (new + dang / n)
    return r


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long, w double")


def test_pagerank_matches_numpy(spark, edge_df):
    got = {
        r["id"]: r["rank"]
        for r in pagerank(
            edge_df, max_iter=30, tol=0.0, check_every=10, weight="w"
        ).collect()
    }
    want = numpy_pagerank(N, EDGES)
    assert set(got) == set(range(N))
    for i in range(N):
        assert got[i] == pytest.approx(want[i], abs=1e-6), i
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_unweighted_converges_early(spark, edge_df):
    """tol-based early stop returns the fixed point (same as 60 iterations)."""
    early = {
        r["id"]: r["rank"]
        for r in pagerank(edge_df, max_iter=60, tol=1e-10, check_every=5).collect()
    }
    want = numpy_pagerank(N, [(s, d, 1.0) for s, d, _ in EDGES], iters=80)
    for i in range(N):
        assert early[i] == pytest.approx(want[i], abs=1e-6), i


def test_pagerank_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e).count() == 0
