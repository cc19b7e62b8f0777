"""BM25 ranking (operators/ranking.py): hand-computed scores on a tiny
fixture, tie/order rules, zero-hit exclusion, and the shuffle-free scoring
plan (TakeOrdered, no Exchange before the top-k)."""

import math

import pytest

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.ranking import (
    bm25_topk,
)

TEXTS = [
    "spark join join fast",        # doc 0: tf(join)=2, tf(spark)=1, dl=4
    "hash table scan",             # doc 1: no query terms
    "join once only here",         # doc 2: tf(join)=1, dl=4
    "spark spark spark go",        # doc 3: tf(spark)=3, dl=4
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def _expected_scores(k1=1.2, b=0.75):
    # N=4, avgdl=(4+3+4+4)/4=3.75; df(join)=2, df(spark)=2
    n, avgdl = 4, 15.0 / 4
    idf = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))

    def term(tf, dl):
        return idf * tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))

    return {
        0: round(0.0 + term(2.0, 4) + term(1.0, 4), 6),
        2: round(0.0 + term(1.0, 4), 6),
        3: round(0.0 + term(3.0, 4), 6),
    }


def test_hand_computed_scores_and_exclusion(spark):
    rows = {r["doc_id"]: r for r in bm25_topk(_docs(spark), ["join", "spark"], k=10).collect()}
    want = _expected_scores()
    assert set(rows) == {0, 2, 3}  # doc 1 hits no term and is excluded
    for did, score in want.items():
        assert rows[did]["bm25"] == pytest.approx(score, abs=1e-6)
    assert rows[0]["n_terms_hit"] == 2
    assert rows[2]["n_terms_hit"] == 1
    # two-term doc outranks each single-term doc here
    assert rows[0]["bm25"] > rows[3]["bm25"] > rows[2]["bm25"]


def test_k_limit_and_tie_order(spark):
    # docs 2 and 2' identical → equal scores, doc_id ascending breaks the tie
    docs = spark.createDataFrame(
        [(5, TEXTS[2]), (1, TEXTS[2]), (9, TEXTS[0])], "doc_id long, text string"
    )
    got = [r["doc_id"] for r in bm25_topk(docs, ["join", "spark"], k=2).collect()]
    assert got == [9, 1]


def test_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark), [], k=3)


def test_scoring_plan_is_map_only_takeordered(spark):
    plan = (
        bm25_topk(_docs(spark), ["join", "spark"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no shuffle anywhere in the scoring scan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
