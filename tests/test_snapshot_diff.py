"""Snapshot diff (operators/snapshot.py): all four statuses, null-safe
compare semantics (NULL == NULL is 'same', NULL vs value is 'changed'),
multi-column keys, and the empty-compare key-presence mode."""

import pytest

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.snapshot import (
    snapshot_diff,
)

SCHEMA = "k long, g string, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_four_statuses_and_null_safety(spark):
    old = _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "a", None), (4, "a", 4.0), (5, "a", None)])
    new = _df(spark, [(1, "a", 1.0), (2, "a", 9.0), (3, "a", None), (5, "a", 5.0), (6, "a", 6.0)])
    rows = {r["k"]: r for r in snapshot_diff(old, new, ["k", "g"], ["v"]).collect()}
    assert rows[1]["status"] == "same"
    assert rows[2]["status"] == "changed" and rows[2]["v_old"] == 2.0 and rows[2]["v_new"] == 9.0
    assert rows[3]["status"] == "same"          # NULL <=> NULL
    assert rows[4]["status"] == "removed" and rows[4]["v_new"] is None
    assert rows[5]["status"] == "changed"        # NULL vs 5.0
    assert rows[6]["status"] == "added" and rows[6]["v_old"] is None
    assert len(rows) == 6


def test_multi_key_separates_groups(spark):
    old = _df(spark, [(1, "a", 1.0)])
    new = _df(spark, [(1, "b", 1.0)])
    rows = {(r["k"], r["g"]): r["status"] for r in snapshot_diff(old, new, ["k", "g"], ["v"]).collect()}
    assert rows == {(1, "a"): "removed", (1, "b"): "added"}


def test_empty_compare_is_presence_diff(spark):
    old = _df(spark, [(1, "a", 1.0), (2, "a", 2.0)])
    new = _df(spark, [(2, "a", 99.0), (3, "a", 3.0)])
    rows = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"], []).collect()}
    assert rows == {1: "removed", 2: "same", 3: "added"}


def test_requires_keys(spark):
    df = _df(spark, [(1, "a", 1.0)])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [], ["v"])
