"""Adaptive scan spreading (operators/spread.py): a single-row-group
parquet file reads as ONE task regardless of cores, serializing CPU-heavy
map work; ``spread_scan`` repartitions round-robin ONLY below the session's
default parallelism, so at production scale (inputs already split) it is a
no-op and adds no exchange."""

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.spread import (
    spread_scan,
)


def test_spreads_underpartitioned_frame(spark):
    df = spark.range(1000).coalesce(1)
    out = spread_scan(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # values untouched
    assert out.agg(F.sum("id")).first()[0] == 499500


def test_noop_when_already_parallel(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 3)
    out = spread_scan(df)
    # no extra repartition node: the frame is returned as-is
    assert out is df


def test_explicit_partition_override(spark):
    df = spark.range(100).coalesce(1)
    assert spread_scan(df, partitions=5).rdd.getNumPartitions() == 5
