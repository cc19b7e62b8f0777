"""Stream-stream interval join: view→click attribution.

The reference is batch-only; this is the engine's streaming join face
(SURVEY §2.8 depth): attribute every click to each view the SAME USER made
within ``max_delay`` beforehand — the canonical ad-attribution /
funnel-analysis shape. The join condition carries BOTH an equality key
(user_id — the shuffle/state key) and an event-time interval
(``view_ts ≤ click_ts ≤ view_ts + max_delay``), which is exactly what lets
Structured Streaming bound the join state: with watermarks on both sides,
a buffered view can be evicted once the click watermark passes
``view_ts + max_delay``, so per-key state is O(events in the delay window),
never the full history.

The SAME function runs on batch frames (the condition is identical; the
watermark step is skipped) — that batch run IS the correctness oracle,
both in ``tests/test_stream_join.py`` (streaming drain == batch) and in the
driver's ``click_attribution`` query (batch vs DuckDB interval join).

Scale shape: one shuffle per side on user_id; skewed hot users are a
watermark-state concern, not a shuffle concern, and are bounded by the
delay window; output is append-mode (each pair emitted once, exactly-once
into the file sink through the checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import EVENTS_SCHEMA


def attribute_clicks(
    views: DataFrame,
    clicks: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """(view, click) pairs per user with ``0 ≤ click_ts − view_ts ≤
    max_delay`` → ``(user_id, view_id, click_id, delay_sec, click_value)``.

    Works on both batch and streaming inputs; streaming inputs get
    watermarks on both sides so the interval join's buffered state is
    evictable (append mode, no retraction)."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.col("user_id").alias("v_user"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "user_id",
        F.col("value").alias("click_value"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (v["v_user"] == c["user_id"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {max_delay}"))
    )
    return v.join(c, cond).select(
        "user_id",
        "view_id",
        "click_id",
        (F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")).alias("delay_sec"),
        "click_value",
    )


def stream_click_attribution(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
):
    """Drain ``input_dir`` (parquet event files, mixed types) through the
    interval join into a parquet sink, exactly-once. Both sides read the
    same file stream and filter by event_type — one source, two logical
    streams (the common single-firehose topology)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    pairs = attribute_clicks(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "click"),
        max_delay,
        watermark,
    )
    query = (
        pairs.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_dir)
        .start()
    )
    query.awaitTermination()
    return query
