"""Stream-stream interval join (streaming/joins.py): the streaming drain
equals the batch run of the same function, pairs cross micro-batch
boundaries (a click in a later file joins a view buffered from an earlier
one), out-of-window clicks never pair, and a restart resumes exactly-once."""

import time as _time
from datetime import datetime

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.streaming.joins import (
    attribute_clicks,
    stream_click_attribution,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(i, ts, user, etype, value=1.0):
    return (i, datetime.fromisoformat(f"2024-05-01T{ts}"), user, etype, value, "{}")


EVENTS = [
    _ev(1, "10:00:00", 7, "view"),
    _ev(2, "10:05:00", 7, "click", 3.5),    # joins view 1 (300 s)
    _ev(3, "10:07:00", 8, "view"),
    _ev(4, "10:20:00", 7, "click", 2.0),    # joins view 1 (1200 s)
    _ev(5, "10:50:00", 7, "click"),          # > 30 min after view 1 → no pair
    _ev(6, "10:10:00", 8, "click", 9.0),    # joins view 3, OTHER user isolated
    _ev(7, "11:00:00", 9, "click"),          # click with no view → no pair
    _ev(8, "11:30:00", 8, "view"),           # view with no later click → no pair
]


def _write_chunks(spark, in_dir, chunks):
    for rows in chunks:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(0.05)


def _pairs(spark, out_dir):
    return sorted(
        tuple(r) for r in spark.read.parquet(out_dir).collect()
    )


def test_stream_equals_batch_across_microbatches(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # one event per file + maxFilesPerTrigger=2 → pairs 1↔4 and 3↔6 span
    # micro-batch boundaries (the click arrives batches after its view)
    _write_chunks(spark, in_dir, [[e] for e in EVENTS])
    stream_click_attribution(spark, in_dir, out_dir, ckpt)

    events = spark.createDataFrame(EVENTS, SCHEMA)
    batch = attribute_clicks(
        events.where(F.col("event_type") == "view"),
        events.where(F.col("event_type") == "click"),
    )
    got = _pairs(spark, out_dir)
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want
    assert len(got) == 3
    by_click = {r[2]: r for r in got}
    assert by_click[2][3] == 300 and by_click[4][3] == 1200
    assert by_click[6][0] == 8  # user isolation
    assert 5 not in by_click and 7 not in by_click


def test_midstream_stop_recovers_join_state(spark, tmp_path):
    """Interrupt the RUNNING continuous query mid-stream — after it has
    emitted one pair but while unmatched views (view 1 with a click still
    to come, view 3 with no click seen at all) sit in the join's buffered
    state — then restart from the checkpoint. The restarted drain must
    (a) not re-emit the committed attribution (no duplicates), and
    (b) pair post-restart clicks with the PRE-stop views, which only works
    if the interval-join state survived the interruption."""
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    from research_on_document_level_person_relation_extraction_in_chinese_spark.streaming.events import (
        EVENTS_SCHEMA,
    )

    # phase 1: view 1, its first click, and the never-yet-clicked view 3
    _write_chunks(spark, in_dir, [[EVENTS[0]], [EVENTS[1]], [EVENTS[2]]])
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    pairs = attribute_clicks(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "click"),
    )
    query = (
        pairs.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="100 milliseconds")
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    try:
        # wait for the first attribution to commit, then interrupt while
        # views 1 and 3 are still live in the join state
        deadline = _time.monotonic() + 60
        while _time.monotonic() < deadline:
            try:
                if spark.read.parquet(out_dir).count() >= 1:
                    break
            except Exception:
                pass
            _time.sleep(0.2)
    finally:
        query.stop()
    interrupted = _pairs(spark, out_dir)
    assert {r[2] for r in interrupted} >= {2}

    # phase 2: the remaining events arrive only AFTER the restart; click 4
    # must join pre-stop view 1, click 6 must join pre-stop view 3
    _write_chunks(spark, in_dir, [EVENTS[3:]])
    stream_click_attribution(spark, in_dir, out_dir, ckpt)
    final = _pairs(spark, out_dir)
    assert len(final) == len(set(final)) == 3
    assert {r[2] for r in final} == {2, 4, 6}
    by_click = {r[2]: r for r in final}
    assert by_click[4][1] == 1 and by_click[6][1] == 3  # pre-stop views


def test_restart_resumes_exactly_once(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_chunks(spark, in_dir, [EVENTS[:4]])
    stream_click_attribution(spark, in_dir, out_dir, ckpt)
    first = _pairs(spark, out_dir)
    assert {r[2] for r in first} == {2, 4}
    # new files arrive; the SAME checkpoint resumes without re-emitting
    _write_chunks(spark, in_dir, [EVENTS[4:]])
    stream_click_attribution(spark, in_dir, out_dir, ckpt)
    second = _pairs(spark, out_dir)
    assert len(second) == 3 and len(set(second)) == 3
    assert {r[2] for r in second} == {2, 4, 6}
