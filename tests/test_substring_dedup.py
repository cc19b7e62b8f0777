"""Exact-substring dedup audit (Lee et al. 2022 ExactSubstr, shingle-grid
variant): min-owner aggregate semantics, anchor subsampling recall, and the
no-pair-join plan shape."""

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (
    substring_dup_docs,
)

SHARED = "the five boxing wizards jump quickly over the frozen riverbank"  # 62 chars


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_min_owner_semantics(spark):
    docs = _docs(
        spark,
        [
            (1, "completely original text with nothing shared anywhere at all ok"),
            (2, "prefix junk " + SHARED + " suffix junk"),
            (5, "other words " + SHARED + " more words here"),
            (9, SHARED),
            (3, "short"),
        ],
    )
    out = {r["doc_id"]: r for r in substring_dup_docs(docs, k=30).collect()}
    assert len(out) == 5
    # doc 2 is the earliest holder of every SHARED shingle -> owner, clean
    assert out[2]["has_dup_substring"] == 0 and out[2]["dup_owner"] is None
    # later holders flag against the min owner
    assert out[5]["has_dup_substring"] == 1 and out[5]["dup_owner"] == 2
    assert out[9]["has_dup_substring"] == 1 and out[9]["dup_owner"] == 2
    # both docs embed " SHARED " (space-padded): shared region is 64 chars
    assert out[5]["n_dup_anchors"] == len(" " + SHARED + " ") - 29
    assert out[5]["dup_example"] in " " + SHARED + " "
    # originals and sub-k docs never flag
    assert out[1]["has_dup_substring"] == 0
    assert out[3]["has_dup_substring"] == 0 and out[3]["n_dup_anchors"] == 0


def test_internal_repeat_not_flagged(spark):
    # a doc repeating its own phrase is its own min-owner: no dup
    docs = _docs(spark, [(4, SHARED + " filler then again " + SHARED)])
    row = substring_dup_docs(docs, k=30).collect()[0]
    assert row["has_dup_substring"] == 0 and row["n_dup_anchors"] == 0


def test_anchor_subsampling_recall_and_monotonicity(spark):
    # 62-char shared region = 33 shingles; md5-anchored mod-2 keeps ~half,
    # deterministically > 0 for this fixture, and strictly fewer than exact.
    docs = _docs(
        spark,
        [
            (1, "aa " + SHARED + " bb"),
            (2, "cc " + SHARED + " dd"),
        ],
    )
    exact = {r["doc_id"]: r for r in substring_dup_docs(docs, k=30, anchor_mod=1).collect()}
    sub = {r["doc_id"]: r for r in substring_dup_docs(docs, k=30, anchor_mod=2).collect()}
    assert exact[2]["has_dup_substring"] == 1
    assert sub[2]["has_dup_substring"] == 1  # still caught with half the grid
    assert 0 < sub[2]["n_dup_anchors"] < exact[2]["n_dup_anchors"]
    # subsampled anchor set is a subset of the exact one
    assert sub[2]["dup_example"] in " " + SHARED + " "


def test_plan_has_no_pair_join(spark):
    docs = _docs(spark, [(1, SHARED), (2, SHARED)])
    plan = substring_dup_docs(docs, k=30, anchor_mod=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # min-owner is a single-pass window over the substring key: exactly ONE
    # materialization of the k-times shingle grid, no grid self-join
    assert "Window" in plan
    assert plan.count("Generate explode") == 1
