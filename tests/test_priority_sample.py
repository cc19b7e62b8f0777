"""Priority sampling (operators/training.py:priority_sample) semantics:
the sample is exactly the k highest-priority rows of a plain-Python replay,
est_w = max(w, tau) with tau the (k+1)-th priority, the estimator is exact
on the replayed tau, and the n<=k degenerate path returns everything with
est_w = w."""

import hashlib

import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.training import (
    priority_sample,
)


def _thr(key, w, seed="31"):
    h = int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:8], 16)
    return ((h + 1.0) / 4294967296.0) / w


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, float(10 + (i * 37) % 90)) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, wt double"), dict(rows)


def test_topk_matches_python_replay(spark, docs):
    df, weights = docs
    k = 12
    got = priority_sample(df, F.col("wt"), key="doc_id", k=k, seed="31").collect()
    order = sorted(weights, key=lambda i: (_thr(i, weights[i]), i))
    expect_ids = order[:k]
    tau = 1.0 / _thr(order[k], weights[order[k]])
    assert [r["doc_id"] for r in sorted(got, key=lambda r: _thr(r["doc_id"], r["w"]))] == expect_ids
    for r in got:
        assert r["w"] == weights[r["doc_id"]]
        assert r["est_w"] == max(r["w"], tau)


def test_estimator_unbiased_shape(spark, docs):
    # est_w >= w always, and the estimated total is within a factor the
    # DLT bound comfortably allows at k near n
    df, weights = docs
    got = priority_sample(df, F.col("wt"), key="doc_id", k=40, seed="31").collect()
    est_total = sum(r["est_w"] for r in got)
    true_total = sum(weights.values())
    assert all(r["est_w"] >= r["w"] for r in got)
    assert 0.5 * true_total < est_total < 2.0 * true_total


def test_degenerate_small_input(spark, docs):
    df, weights = docs
    got = priority_sample(df, F.col("wt"), key="doc_id", k=100, seed="31").collect()
    assert len(got) == len(weights)
    assert all(r["est_w"] == r["w"] for r in got)


def test_char_weight_non_ascii(spark):
    """r5 verdict nit: the weighted_sample query must weigh by CHARACTERS
    (F.length), matching the oracle's strlen, on non-ASCII text too — a
    byte-length weight (octet_length) would diverge on any Chinese doc."""
    rows = [(i, "中文字" * (i + 1) + "x") for i in range(30)]  # 3·(i+1)+1 chars
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k = 8
    got = priority_sample(df, F.length("text"), key="doc_id", k=k, seed="31").collect()
    weights = {i: float(len(t)) for i, t in rows}  # Python len == characters
    order = sorted(weights, key=lambda i: (_thr(i, weights[i]), i))
    tau = 1.0 / _thr(order[k], weights[order[k]])
    assert sorted(r["doc_id"] for r in got) == sorted(order[:k])
    for r in got:
        assert r["w"] == weights[r["doc_id"]]  # chars, not bytes (3× here)
        assert r["est_w"] == max(r["w"], tau)


def test_null_and_nonpositive_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (None, 7.0), (3, 0.0), (4, -2.0), (5, 1.0)],
        "doc_id long, wt double",
    )
    got = priority_sample(df, F.col("wt"), key="doc_id", k=10)
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 5]
