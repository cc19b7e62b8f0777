"""Bloom-gated decontamination (curation.py:bloom_decontaminate): no false
negatives vs the exact operator, n_maybe upper-bounds true overlap, tiny
filters expose false positives, and the train-side probe pass is map-only
(no Exchange before the flagged-candidate join)."""

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.curation import (
    bloom_bits,
    bloom_decontaminate,
    decontaminate,
    word_ngrams,
)

EVAL = ["the quick brown fox jumps", "pack my box with five dozen jugs"]
TRAIN = [
    (0, "the quick brown fox jumps over it"),   # 3 shared 3-grams
    (1, "pack my box with nothing else"),        # 2 shared
    (2, "totally clean text about spark plans"), # 0 shared
    (3, "my box with five dozen jugs arrived"),  # 4 shared
    (4, "xy"),                                   # shorter than n → no grams
]


def _dfs(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ev = spark.createDataFrame([(100 + i, t) for i, t in enumerate(EVAL)], "doc_id long, text string")
    return train, ev


def test_matches_exact_decontaminate_verdicts(spark):
    train, ev = _dfs(spark)
    bloom = {r["doc_id"]: r for r in bloom_decontaminate(train, ev, m_bits=4096, h=3, min_hits=2).collect()}
    exact = {r["doc_id"]: r for r in decontaminate(train, ev, n=3, min_hits=2).collect()}
    assert set(bloom) == set(exact) == {0, 1, 2, 3, 4}
    for did in exact:
        # superset property: every truly contaminated doc is flagged, and
        # with a roomy filter the verdicts coincide outright
        assert bloom[did]["contaminated"] == exact[did]["contaminated"]
        if bloom[did]["bloom_flagged"]:
            assert bloom[did]["n_overlap"] == exact[did]["n_overlap"]
        assert bloom[did]["n_maybe"] >= exact[did]["n_overlap"]
    assert bloom[3]["n_overlap"] == 4 and bloom[3]["contaminated"] == 1
    assert bloom[2]["bloom_flagged"] == 0 and bloom[4]["n_maybe"] == 0


def test_tiny_filter_shows_false_positives_never_negatives(spark):
    train, ev = _dfs(spark)
    # 8 bits / 1 hash: nearly everything collides
    rows = {r["doc_id"]: r for r in bloom_decontaminate(train, ev, m_bits=8, h=1, min_hits=2).collect()}
    exact = {r["doc_id"]: r for r in decontaminate(train, ev, n=3, min_hits=2).collect()}
    for did, e in exact.items():
        assert rows[did]["n_maybe"] >= e["n_overlap"]
        if e["contaminated"]:
            assert rows[did]["bloom_flagged"] == 1  # no false negatives
        assert rows[did]["contaminated"] == e["contaminated"]  # exact verify rescues FPs
    # the clean doc is now (very likely) a visible false positive
    assert rows[2]["n_maybe"] > 0


def test_bits_bounded_and_deterministic(spark):
    _, ev = _dfs(spark)
    grams = ev.select(F.explode(word_ngrams(F.col("text"), 3)).alias("gram")).distinct()
    b1 = bloom_bits(grams, "gram", 512, 3)
    b2 = bloom_bits(grams, "gram", 512, 3)
    assert b1 == b2 and len(b1) == 512
    n_grams = grams.count()
    assert 0 < sum(b1) <= 3 * n_grams


def test_probe_pass_is_map_only(spark):
    train, ev = _dfs(spark)
    out = bloom_decontaminate(train, ev, m_bits=4096, h=3, min_hits=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the train scan feeds the bloom probe with no Python and no cartesian;
    # the only joins are the flagged-candidate exact verify + merge-back
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
