"""Char-bigram LM perplexity (operators/lm.py): hand-computed probabilities
on a tiny corpus, OOV/unseen-context backoff, the in-domain < out-of-domain
separation CCNet bucketing relies on, the model-size guard, and the
map-only scoring plan."""

import math

import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.lm import (
    lm_perplexity,
    train_char_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_hand_computed_model(spark):
    # reference "abab": bigrams ab, ba, ab → c(ab)=2, c(ba)=1
    # vocab {a, b} + OOV → V=3; ctx: c(a·)=2, c(b·)=1
    ref = _docs(spark, [(0, "x", "abab")])
    lnp, lnden, lnv = train_char_bigram_lm(ref)
    assert lnp == {
        "ab": math.log(3 / 5),   # (2+1)/(2+3)
        "ba": math.log(2 / 4),   # (1+1)/(1+3)
    }
    assert lnden == {"a": math.log(5), "b": math.log(4)}
    assert lnv == math.log(3)


def test_scoring_with_backoff(spark):
    ref = _docs(spark, [(0, "x", "abab")])
    # "aba": ab + ba (both seen); "aq": unseen bigram, seen context a →
    # 1/(2+3); "qq": unseen context → 1/3
    docs = _docs(spark, [(1, "x", "aba"), (2, "x", "aq"), (3, "x", "qq"), (4, "x", "z")])
    rows = {r["doc_id"]: r for r in lm_perplexity(docs, ref).collect()}
    assert 4 not in rows  # single char → no bigram → excluded
    s1 = math.log(3 / 5) + math.log(2 / 4)
    assert rows[1]["ppl"] == round(math.exp(-s1 / 2), 4)
    assert rows[2]["ppl"] == round(math.exp(math.log(5)), 4)  # 1/(2+3)
    assert rows[3]["ppl"] == round(math.exp(math.log(3)), 4)  # 1/V
    assert rows[1]["n_bigrams"] == 2 and rows[2]["n_bigrams"] == 1


def test_in_domain_scores_lower(spark):
    ref = _docs(spark, [(0, "zh", "陳先生與林小姐在台北見面談合作案") ])
    docs = _docs(
        spark,
        [(1, "zh", "林小姐與陳先生在台北見面"), (2, "xx", "qwzqwzqwzqwz")],
    )
    rows = {r["doc_id"]: r["ppl"] for r in lm_perplexity(docs, ref).collect()}
    assert rows[1] < rows[2]


def test_model_size_guard(spark):
    ref = _docs(spark, [(0, "x", "abcdefgh")])
    with pytest.raises(ValueError, match="max_model_size"):
        lm_perplexity(_docs(spark, [(1, "x", "ab")]), ref, max_model_size=3)


def test_scoring_plan_is_map_only(spark):
    ref = _docs(spark, [(0, "x", "abab")])
    out = lm_perplexity(_docs(spark, [(1, "x", "aba")]), ref)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scoring never shuffles
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
