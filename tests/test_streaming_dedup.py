"""Streaming exact dedup (streaming/dedup.py): cross-batch digest dedup
within the watermark horizon, state EVICTION past the horizon (the bounded-
state contract — a duplicate arriving after eviction is re-emitted and left
to the batch dedup layer), and batch/stream agreement when arrival order
matches event time."""

import time as _time
from datetime import datetime

from research_on_document_level_person_relation_extraction_in_chinese_spark.streaming.dedup import (
    DOCS_STREAM_SCHEMA,
    dedup_docs,
    stream_dedup_docs,
)


def _doc(i, ts, text):
    return (i, datetime.fromisoformat(f"2024-05-01T{ts}"), text, "crawl")


def _write_chunk(spark, rows, in_dir):
    spark.createDataFrame(rows, DOCS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    _time.sleep(0.05)  # distinct mtimes: pickup order == arrival order


def _ids(spark, out_dir):
    return sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())


def test_cross_batch_dedup_and_horizon_eviction(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # batch 1: A, B, and an intra-batch duplicate of A
    _write_chunk(
        spark,
        [_doc(1, "10:00:00", "alpha"), _doc(2, "10:01:00", "beta"),
         _doc(3, "10:02:00", "alpha")],
        in_dir,
    )
    # batch 2, still inside the 30 min horizon: duplicate of B dropped,
    # fresh text kept
    _write_chunk(
        spark,
        [_doc(4, "10:10:00", "beta"), _doc(5, "10:12:00", "gamma")],
        in_dir,
    )
    # batch 3: advance event time far past 10:02 + 30 min so digest state
    # for 'alpha' becomes evictable...
    _write_chunk(spark, [_doc(6, "12:00:00", "delta")], in_dir)
    # ...batch 4: spacer — eviction is LAZY (measured: a batch matches
    # against state evicted with the watermark from two batches back, so a
    # duplicate landing in the very batch after the advance is still
    # deduped — benign extra dedup, not a state leak)...
    _write_chunk(spark, [_doc(8, "12:01:00", "epsilon")], in_dir)
    # ...batch 5: a re-arriving 'alpha' is now OUTSIDE the horizon →
    # re-emitted (bounded-state contract; the batch dedup layer owns
    # far-apart dups)
    _write_chunk(spark, [_doc(7, "12:05:00", "alpha")], in_dir)

    stream_dedup_docs(spark, in_dir, out_dir, ckpt, watermark="30 minutes")
    assert _ids(spark, out_dir) == [1, 2, 5, 6, 7, 8]


def test_batch_mode_first_occurrence(spark):
    df = spark.createDataFrame(
        [_doc(1, "10:00:00", "x"), _doc(2, "09:00:00", "x"),
         _doc(3, "11:00:00", "y")],
        DOCS_STREAM_SCHEMA,
    )
    out = dedup_docs(df)
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]  # min event time wins
    assert "digest" in out.columns


def test_restart_resumes_exactly_once(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_chunk(spark, [_doc(1, "10:00:00", "a"), _doc(2, "10:01:00", "b")], in_dir)
    stream_dedup_docs(spark, in_dir, out_dir, ckpt, watermark="30 minutes")
    # second run over the same checkpoint with one new file: only the new
    # rows process; the duplicate of 'a' (within horizon, state restored
    # from checkpoint) is dropped
    _write_chunk(spark, [_doc(3, "10:05:00", "a"), _doc(4, "10:06:00", "c")], in_dir)
    stream_dedup_docs(spark, in_dir, out_dir, ckpt, watermark="30 minutes")
    assert _ids(spark, out_dir) == [1, 2, 4]
