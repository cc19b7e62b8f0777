"""Salted join correctness under skew, watermarked streaming windows vs the
batch oracle, and k-fold evaluation."""

import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.evaluate import (
    kfold_prf,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.skew import (
    salted_join,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.streaming.events import (
    stream_windowed_counts,
    windowed_event_counts,
)


def test_salted_join_matches_plain_join(spark):
    # 90% of rows share one hot key — the adversarial case
    big = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, "陳").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("key"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("陳", 1), ("k0", 2), ("k3", 3), ("absent", 4)], "key string, w int"
    )
    plain = big.join(small, "key").groupBy("key").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    salted = salted_join(big, small, "key", n_salt=8).groupBy("key").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # salt genuinely spreads the hot key
    spread = (
        big.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)))
        .where(F.col("key") == "陳")
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread == 8


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    import time as _time

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # time-ordered arrival: the file stream source orders pickup by file
    # MODIFICATION time, and parallel range-partition writes finish in
    # nondeterministic order (a later-range file picked up first advances
    # the watermark and silently truncates earlier windows — observed as a
    # flake). Write the ts-range slices SEQUENTIALLY so mod-time order ==
    # event-time order deterministically.
    bounds = list(
        events.selectExpr(
            "percentile(unix_timestamp(ts), array(1/6, 2/6, 3/6, 4/6, 5/6))"
        ).collect()[0][0]
    )
    lo = None
    for i, hi in enumerate(list(bounds) + [None]):
        sl = events
        if lo is not None:
            sl = sl.where(F.unix_timestamp("ts") >= lo)
        if hi is not None:
            sl = sl.where(F.unix_timestamp("ts") < hi)
        sl.coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(0.05)  # distinct mtimes at fs resolution
        lo = hi

    stream_windowed_counts(spark, in_dir, out_dir, ckpt)
    streamed = spark.read.parquet(out_dir)

    batch = windowed_event_counts(events)
    batch_set = set(map(tuple, batch.collect()))
    got = set(map(tuple, streamed.collect()))
    # every emitted window is exactly right (count + sum match batch): the
    # watermark may drop late rows / hold trailing windows depending on the
    # (unordered) file pickup sequence, but it must never emit a wrong value
    assert got <= batch_set
    assert len(got) >= 0.5 * len(batch_set)  # and it does emit the bulk

    # exactly-once: draining again with the same checkpoint adds nothing
    stream_windowed_counts(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == len(got)


def test_kfold_prf(spark):
    pred = spark.createDataFrame(
        [(f"u{i}", "a", "b", "r") for i in range(40)] + [("u0", "x", "y", "r")],
        "url string, subj string, obj string, rel string",
    )
    gold = spark.createDataFrame(
        [(f"u{i}", "a", "b", "r") for i in range(50)],
        "url string, subj string, obj string, rel string",
    )
    res = kfold_prf(pred, gold, k=5)
    assert len(res["folds"]) == 5
    assert 0.7 <= res["recall"]["mean"] <= 0.9
    assert res["precision"]["sem"] >= 0.0
