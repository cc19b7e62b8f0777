"""Exact order statistics via histogram narrowing (operators/quantiles.py):
odd/even medians, duplicate-heavy and all-equal columns, k bounds, and
agreement with a Python sort on a fuzz fixture — all with the histogram
rounds forced on (tiny take_threshold)."""

import random

import pytest

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.quantiles import (
    exact_median,
    kth_smallest,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x double")


def test_kth_matches_sorted_fuzz(spark):
    rng = random.Random(7)
    xs = [rng.uniform(-1000, 1000) for _ in range(500)] + [42.0] * 37
    df = _vals(spark, xs)
    want = sorted(xs)
    for k in (1, 2, 269, len(xs) // 2, len(xs)):
        got = kth_smallest(df, k, buckets=16, take_threshold=8)
        assert got == want[k - 1], k


def test_median_odd_even_and_duplicates(spark):
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])], "i long, v double")
    assert exact_median(df, "v", buckets=4, take_threshold=2).collect()[0]["median"] == 5.0
    df2 = spark.createDataFrame([(i, float(v)) for i, v in enumerate([4, 1, 3, 2])], "i long, v double")
    assert exact_median(df2, "v", buckets=4, take_threshold=2).collect()[0]["median"] == 2.5
    # duplicate plateau spanning the middle
    df3 = _vals(spark, [1, 2, 2, 2, 2, 9]).withColumnRenamed("x", "v")
    assert exact_median(df3, "v", buckets=4, take_threshold=2).collect()[0]["median"] == 2.0


def test_all_equal_short_circuits(spark):
    df = _vals(spark, [3.5] * 1000).withColumnRenamed("x", "v")
    row = exact_median(df, "v", buckets=8, take_threshold=4).collect()[0]
    assert (row["n"], row["median"]) == (1000, 3.5)


def test_k_bounds(spark):
    df = _vals(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        kth_smallest(df, 0)
    with pytest.raises(ValueError):
        kth_smallest(df, 4)
    with pytest.raises(ValueError):
        exact_median(_vals(spark, []), "x")
