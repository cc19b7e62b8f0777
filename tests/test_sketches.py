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


# --- HyperLogLog ----------------------------------------------------------

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.sketches import (  # noqa: E402
    hll_distinct_audit,
    hll_estimate,
    hll_registers,
)


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_registers_bounded_and_duplicate_invariant(spark):
    uniq = [f"k{i}" for i in range(200)]
    r1 = {(r["bucket"], r["rho"]) for r in hll_registers(_keys(spark, uniq), p=4).collect()}
    # duplicating the stream 3x cannot change any register (max is idempotent)
    r2 = {(r["bucket"], r["rho"]) for r in hll_registers(_keys(spark, uniq * 3), p=4).collect()}
    assert r1 == r2
    assert len(r1) <= 16
    assert all(1 <= rho <= 57 for _, rho in r1)


def test_shard_merge_by_max_equals_global(spark):
    a = [f"a{i}" for i in range(150)]
    b = [f"b{i}" for i in range(150)]
    ra = hll_registers(_keys(spark, a), p=5)
    rb = hll_registers(_keys(spark, b), p=5)
    from pyspark.sql import functions as F
    merged = ra.unionAll(rb).groupBy("bucket").agg(F.max("rho").alias("rho"))
    direct = hll_registers(_keys(spark, a + b), p=5)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    # and the estimate is a pure function of the registers
    e1 = hll_estimate(merged, p=5).collect()[0]["hll_estimate"]
    e2 = hll_estimate(direct, p=5).collect()[0]["hll_estimate"]
    assert e1 == e2


def test_small_range_correction_is_tight(spark):
    # 10 keys in 256 registers → linear-counting branch, near-exact
    est = hll_estimate(hll_registers(_keys(spark, [f"x{i}" for i in range(10)]), p=8), p=8)
    got = est.collect()[0]["hll_estimate"]
    assert abs(got - 10) <= 1


def test_estimate_within_hll_error_bounds(spark):
    n = 3000
    est = hll_estimate(hll_registers(_keys(spark, [f"y{i}" for i in range(n)]), p=8), p=8)
    got = est.collect()[0]["hll_estimate"]
    # 1.04/sqrt(256) ≈ 6.5% std error; allow 4 sigma
    assert abs(got - n) / n < 0.26


def test_audit_columns(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y z")], "doc_id long, text string"
    )
    row = hll_distinct_audit(docs, n=3, p=8).collect()[0]
    assert row["n_exact"] == 6  # 3 + 4 grams, "a b c" shared
    assert row["n_registers"] <= 7
    assert abs(row["hll_estimate"] - row["n_exact"]) <= 2  # linear-counting regime
