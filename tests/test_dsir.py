"""DSIR importance-resampling selection (operators/dsir.py): the Spark
scores must match an independent pure-Python recomputation (hashlib md5,
math.log, in-order summation), the keep verdict must separate target-like
from raw-like docs, and the scoring stage must stay a shuffle-free
projection."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dsir import (
    dsir_scores,
    feature_buckets,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "machine learning models need clean english training data", "en"),
    (2, "zzz qqq xxyzzy glorp blarf zzz qqq glorp", "xx"),
    (3, "blarf glorp zzz mixed with the english dog", "xx"),
    (4, "", "xx"),
    (5, "the english data dog over the lazy fox", "xx"),
]
N_BUCKETS = 64


def _py_features(text):
    ws = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 1000000007 % N_BUCKETS
        for g in grams
    ]


def _py_scores():
    feats = {d: _py_features(t) for d, t, _ in DOCS}
    raw, tgt = {}, {}
    for d, _, lang in DOCS:
        for b in feats[d]:
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    rt, tt = float(sum(raw.values())), float(sum(tgt.values()))
    wts = [
        math.log((tgt.get(b, 0) + 1.0) / (tt + N_BUCKETS))
        - math.log((raw.get(b, 0) + 1.0) / (rt + N_BUCKETS))
        for b in range(N_BUCKETS)
    ]
    out = {}
    for d, _, _ in DOCS:
        s = 0.0
        for b in feats[d]:
            s += wts[b]
        out[d] = (len(feats[d]), s)
    return out


def test_dsir_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r
        for r in dsir_scores(
            df, F.col("lang") == "en", n_buckets=N_BUCKETS
        ).collect()
    }
    want = _py_scores()
    assert set(got) == set(want)
    for d, (n, s) in want.items():
        assert got[d]["n_feats"] == n
        # spark value is the 6-dp rounding of the same in-order double sum
        assert got[d]["dsir_score"] == pytest.approx(s, abs=5.1e-7)
        assert got[d]["kept"] == int(got[d]["dsir_score"] > 0)


def test_dsir_separates_target_from_raw(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r
        for r in dsir_scores(
            df, F.col("lang") == "en", n_buckets=N_BUCKETS
        ).collect()
    }
    assert got[1]["kept"] == 1  # distinctively in-target vocabulary kept
    assert got[2]["kept"] == 0  # pure out-of-target vocabulary dropped
    assert got[4]["kept"] == 0  # empty doc: score 0.0, not kept
    # score ordering tracks target-likeness: pure en > shared en > pure xx
    assert got[1]["dsir_score"] > got[0]["dsir_score"] > got[2]["dsir_score"]
    assert got[5]["dsir_score"] > got[2]["dsir_score"]  # en words help a raw doc


def test_dsir_feature_order_and_multiplicity(spark):
    # unigrams first then bigrams, repeats kept (DSIR counts multiplicity)
    df = spark.createDataFrame([("a b a",)], "text string")
    fb = df.select(feature_buckets(F.col("text"), N_BUCKETS).alias("fb")).head()["fb"]
    assert fb == _py_features("a b a")
    assert len(fb) == 5  # a b a + "a b" "b a"


def test_dsir_scoring_is_shuffle_free(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    out = dsir_scores(df, F.col("lang") == "en", n_buckets=N_BUCKETS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scoring is a pure projection
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
