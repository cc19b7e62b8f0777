"""Intra-document coreference kernel (operators/coref.py).

Hand-computed expectations, independent of the kernel: title-strip
(one trailing 博士/教授/先生/老師, never to empty), unique-surname
attachment, ambiguity-keep, no-candidate bare surname, sorted dedup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.coref import (
    canonical_mentions,
    coref_stage,
)

CASES = [
    # alias attaches to the unique full name sharing the surname
    (["林志玲", "林先生"], ["林志玲"]),
    # two fulls share 林 → the bare mention stays separate (no guessing)
    (["林志玲", "林大同", "林先生"], ["林", "林大同", "林志玲"]),
    # title-suffixed full name collapses onto the plain form
    (["陳家豪", "陳家豪博士"], ["陳家豪"]),
    # bare surname with NO full-name candidate stays bare
    (["陳家豪博士", "陳先生", "王老師"], ["王", "陳家豪"]),
    # a mention that IS a title is kept verbatim (strip_title twin rule)
    (["先生", "張文明"], ["先生", "張文明"]),
    # only ONE trailing title stripped
    (["張文明先生", "張老師"], ["張文明"]),
    ([], []),
]


def test_kernel_hand_cases(spark):
    df = spark.createDataFrame(
        [(i, ms) for i, (ms, _) in enumerate(CASES)], "i int, ms array<string>"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_mentions(F.col("ms")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]} != {want}"


def test_kernel_matches_python_strip_title(spark):
    """The strip step must be the exact twin of scorers.rules.strip_title."""
    from research_on_document_level_person_relation_extraction_in_chinese_spark.scorers.rules import (
        strip_title,
    )

    names = ["林志玲先生", "林志玲", "先生", "博士", "王老師", "吳文君教授", "李"]
    df = spark.createDataFrame([(n, [n]) for n in names], "n string, ms array<string>")
    rows = df.select("n", canonical_mentions(F.col("ms")).alias("c")).collect()
    for r in rows:
        assert r["c"] == [strip_title(r["n"])], r["n"]


def test_coref_stage_shrinks_pair_blowup(spark):
    """Applied before pair generation, aliases stop multiplying candidates:
    3 surface forms of 2 persons → 1 canonical pair, not 3."""
    exp = spark.createDataFrame(
        [("u1", ["林志玲", "林先生", "陳家豪"])],
        "url string, ckip_entity array<string>",
    )
    out = coref_stage(exp).collect()[0]["ckip_entity"]
    assert out == ["林志玲", "陳家豪"]
    n = len(out)
    assert n * (n - 1) // 2 == 1


def test_stage_plan_is_jvm_only(spark):
    """No Python worker in the coref plan — pure codegen'd array expressions."""
    exp = spark.createDataFrame(
        [("u1", ["林志玲", "林先生"])], "url string, ckip_entity array<string>"
    )
    plan = coref_stage(exp)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
