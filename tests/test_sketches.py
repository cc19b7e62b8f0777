"""Count-Min sketch (operators/sketches.py): never-undercount guarantee,
bounded sketch size, exact recovery when width ≥ vocabulary, and the audit
output contract."""

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.sketches import (
    countmin_audit,
    countmin_estimate,
    countmin_sketch,
    _tokens,
)


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


TEXTS = [
    "alpha beta beta gamma",
    "alpha alpha delta",
    "beta gamma gamma gamma epsilon",
]
# exact: gamma=4, alpha=3, beta=3, delta=1, epsilon=1 (12 tokens, 5 distinct)


def test_sketch_is_bounded_and_total_preserving(spark):
    toks = _tokens(_docs(spark, TEXTS))
    sk = countmin_sketch(toks, d=3, width=4).collect()
    assert len(sk) <= 3 * 4
    # every row of the sketch holds the full stream count
    by_j = {}
    for r in sk:
        by_j.setdefault(r["j"], 0)
        by_j[r["j"]] += r["cnt"]
    assert by_j == {0: 12, 1: 12, 2: 12}


def test_estimate_never_undercounts(spark):
    docs = _docs(spark, TEXTS)
    toks = _tokens(docs)
    exact = {r["token"]: r["n"] for r in toks.groupBy("token").agg(F.count("*").alias("n")).collect()}
    # width=2 forces heavy collisions among 5 distinct tokens
    sk = countmin_sketch(toks, d=2, width=2)
    cands = docs.sparkSession.createDataFrame([(t,) for t in exact], "token string")
    est = {r["token"]: r["est_count"] for r in countmin_estimate(cands, sk, d=2, width=2).collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    assert sum(est.values()) > sum(exact.values())  # collisions visible


def test_exact_when_width_exceeds_vocab(spark):
    docs = _docs(spark, TEXTS)
    out = {r["token"]: r for r in countmin_audit(docs, d=4, width=4096, k=10).collect()}
    assert all(r["overcount"] == 0 for r in out.values())
    assert out["gamma"]["exact_count"] == 4 and out["gamma"]["est_count"] == 4


def test_audit_topk_order_and_ties(spark):
    docs = _docs(spark, TEXTS)
    rows = countmin_audit(docs, d=2, width=2, k=3).collect()
    # top-3 by exact desc, token asc: gamma(4), alpha(3), beta(3)
    assert sorted(r["token"] for r in rows) == ["alpha", "beta", "gamma"]
    assert all(r["est_count"] >= r["exact_count"] for r in rows)
